"""Classifier-based quality filtering (the GPT-3/WebText pipeline
stage): train a multinomial Naive Bayes text classifier on seed labels
and score every document with its log-odds.

Brown et al. 2020 §A trained a logistic classifier on WebText-vs-
CommonCrawl to filter CommonCrawl; the distributable, exactly-
replayable equivalent is multinomial NB — training is ONE word×class
count aggregation (map-side combined, shuffle ∝ vocabulary), and
scoring is an equi-join + position-ordered log fold, both pure
dataflow. No SGD, no iteration, no pinned model state: the DuckDB
oracle retrains and rescores the whole thing in SQL
(`oracles.nb_quality_scores_sql`), the same no-literals contract as
the CCNet trigram LM.

Determinism rules (see the trigram LM): everything before the ln() is
exact integer arithmetic; each doc's per-word log-ratios fold in
POSITION order on both engines; the final log-odds rounds to 6 dp and
the predicted label thresholds the ROUNDED value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectordbindexing_spark.functions.text import words

BROADCAST_VOCAB_GATE = 1_000_000


def nb_train_score(
    df: DataFrame,
    labels: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 0.5,
) -> DataFrame:
    """Train multinomial NB with add-k smoothing on ``labels``
    (id_col, label ∈ {0,1}) and score every labeled document.

    log_odds(d) = Σ_pos [ln((c1(w)+k)/(T1+kV)) − ln((c0(w)+k)/(T0+kV))]
                + ln((D1+k)/(D0+k))

    Output: (doc_id, n_tokens, log_odds, pred) — pred thresholds the
    rounded log-odds at 0. Docs with no tokens score the prior alone.

    Scale: the model is the (word, c1, c0) table — shuffle ∝ vocabulary,
    broadcast to the scoring join under BROADCAST_VOCAB_GATE, left
    distributed above it (CJK charsets can push vocab past broadcast).
    """
    lab = df.join(labels.select(id_col, "label"), id_col)
    occ = (
        lab.select(
            F.col(id_col),
            F.col("label"),
            F.posexplode(words(F.coalesce(F.col(text_col), F.lit("")))).alias(
                "pos", "w"
            ),
        )
    )
    wc = occ.groupBy("w").agg(
        F.sum(F.col("label")).cast("long").alias("c1"),
        F.sum(1 - F.col("label")).cast("long").alias("c0"),
    )
    tot = wc.agg(
        F.sum("c1").cast("long").alias("t1"),
        F.sum("c0").cast("long").alias("t0"),
        F.count(F.lit(1)).cast("long").alias("v"),
    ).collect()[0]
    t1, t0, v = int(tot["t1"] or 0), int(tot["t0"] or 0), int(tot["v"])
    dc = lab.agg(
        F.sum("label").cast("long").alias("d1"),
        F.sum(1 - F.col("label")).cast("long").alias("d0"),
    ).collect()[0]
    prior = F.log(
        (F.lit(float(dc["d1"])) + F.lit(k)) / (F.lit(float(dc["d0"])) + F.lit(k))
    )
    wc_b = F.broadcast(wc) if v <= BROADCAST_VOCAB_GATE else wc
    lw = occ.join(wc_b, "w").withColumn(
        "lw",
        F.log((F.col("c1") + F.lit(k)) / F.lit(float(t1 + k * v)))
        - F.log((F.col("c0") + F.lit(k)) / F.lit(float(t0 + k * v))),
    )
    sums = lw.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("pos", "lw"))),
            F.lit(0.0),
            lambda acc, x: acc + x["lw"],
        ).alias("_sum"),
    )
    out = lab.select(id_col).join(sums, id_col, "left")
    lo = F.round(F.coalesce(F.col("_sum"), F.lit(0.0)) + prior, 6)
    return out.select(
        F.col(id_col),
        F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
        lo.alias("log_odds"),
        (lo >= 0).cast("long").alias("pred"),
    )


def quality_classifier_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 50,
    k: float = 0.5,
) -> DataFrame:
    """Self-seeded quality classifier: seed labels from a deterministic
    length heuristic (label 1 ⇔ ≥ min_tokens whitespace tokens — stand
    in any curated seed set here), then NB-train and score the corpus.
    The interesting part is the classifier dataflow; the seed rule is
    pluggable by passing labels to :func:`nb_train_score` directly."""
    toks = words(F.coalesce(F.col(text_col), F.lit("")))
    labels = df.select(
        F.col(id_col), (F.size(toks) >= min_tokens).cast("long").alias("label")
    )
    return nb_train_score(df, labels, text_col, id_col, k)
