"""Keyword relevance (BM25) and hybrid rank fusion (RRF) — the lexical
half of a vector-search deployment.

The reference engine serves dense ANN (`hnsw_cosine_norm.py`,
`roargraph/`); every production deployment of such an engine pairs it
with a keyword ranker and fuses the two lists (hybrid search). BM25
(Robertson-Walker 1994) and reciprocal rank fusion (Cormack 2009,
`1/(k+rank)` — the fusion Elasticsearch/Vespa/Qdrant all default to)
are the standard pair, so they are first-class operators here.

Spark-first shape:

* **Query-term pre-filter.** Only tokens appearing in some query ever
  leave the scan: the explode is filtered by a broadcast literal set
  BEFORE the tf groupBy, so the shuffle is ∝ matched occurrences, not
  corpus tokens. At 100 TB this is the difference between building a
  full inverted index and scoring a handful of posting lists.
* **df via a window, not a second branch.** Document frequency is
  ``count() OVER (PARTITION BY term)`` on the tf rows (distinct
  (doc, term) ⇒ the count IS df). A separate ``tf.groupBy(term)``
  branch gets rewritten by Catalyst into a distinct-pushdown subplan
  that no longer structurally matches the tf side, so ReuseExchange
  can't kick in and the corpus explode runs twice — measured 35 s vs
  6.9 s at 200k docs × 50 queries for the two shapes. The window
  re-shuffles only the matched tf rows.
* **Corpus stats stay distributed.** N and Σdl come from one scan-local
  aggregate crossJoin-broadcast back (1 row) — no driver round-trip in
  the dataflow.
* **Pure JVM expressions** end-to-end: tokenize/explode/groupBy/window,
  no Python in the hot path.

Cross-engine determinism (the DuckDB oracle replays everything in SQL,
no pinned state — `oracles.bm25_topk_sql` / `rrf_hybrid_sql`):

* all counts (tf, df, dl, N, Σdl) are exact integers;
* per-(query, doc) term contributions fold in TERM order on both
  engines (`F.aggregate` over `array_sort(collect_list(struct))` ==
  `list_sum(list(x ORDER BY term))`);
* float constants embed as python-repr literals cast ``::DOUBLE`` on
  the DuckDB side (bare literals there are DECIMAL);
* the identical expression tree computes the length norm
  (((b·dl)·N)/Σdl) so the doubles agree bit-for-bit; the single
  ``ln`` in idf differs by ≤1 ulp, absorbed by round(·, 6);
* ranks break ties by lowest doc id on the ROUNDED score.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from vectordbindexing_spark.plans.partitioning import local_rows_df

from vectordbindexing_spark.functions.text import words

# lexical-stats table reserved keys (tokens from the whitespace
# tokenizer cannot start with NUL unless the raw text contains it —
# lexical_stats drops such tokens defensively)
RESERVED_PREFIX = "\x00"
TERM_CORPUS = "\x00corpus"


def lexical_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Lexical index statistics of a document set: one row per term
    (term, df, tf) plus the ``TERM_CORPUS`` row carrying
    (n_docs → df, sum_dl → tf). This is the additive summary a
    streaming maintainer can merge batch-by-batch
    (``streaming.lexical``): df/tf/N/Σdl all sum across disjoint
    document batches, so stats(∪ batches) = Σ stats(batch) as long as
    each document arrives exactly once (the append-only corpus
    contract; put ``streaming.filter_gate`` upstream for at-least-once
    sources). ``bm25_topk(..., stats=...)`` serves from it."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        words(F.lower(F.coalesce(F.col(text_col), F.lit("")))).alias("toks"),
    )
    per_term = (
        toks.select("doc_id", F.explode("toks").alias("term"))
        .where(~F.col("term").startswith(RESERVED_PREFIX))
        .groupBy("term")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("df"),
            F.count(F.lit(1)).cast("long").alias("tf"),
        )
    )
    corpus = toks.agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.coalesce(F.sum(F.size("toks")), F.lit(0)).cast("long").alias("tf"),
    ).select(F.lit(TERM_CORPUS).alias("term"), "df", "tf")
    return per_term.unionByName(corpus)


def _query_terms(queries: list[tuple[int, str]]) -> list[tuple[int, str]]:
    """(query_id, term) pairs — lowercased, whitespace-split, deduped
    per query (classic BM25 scores distinct query terms)."""
    out = []
    for qid, text in queries:
        seen = set()
        for t in (text or "").lower().split():
            if t and t not in seen:
                seen.add(t)
                out.append((int(qid), t))
    if not out:
        raise ValueError("queries produced no terms")
    return out


#: auto exact_fold: estimated matched (query,doc,term) contributions
#: above this switch to plain sum() — measured 29M folded structs cost
#: 118 s vs 31.5 s plain at 200k docs x 2000 full-vocab queries
FOLD_CONTRIB_LIMIT = 2_000_000
#: auto exact_fold without a stats table (no df available pre-scan):
#: switch on the (query,term) pair count instead — contract/ad-hoc
#: queries carry a handful, batch mining carries vocabulary-scale
FOLD_QT_LIMIT = 10_000


def bm25_topk(
    docs: DataFrame,
    queries: "list[tuple[int, str]] | DataFrame",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    exact_fold: bool | None = None,
    stats: DataFrame | None = None,
) -> DataFrame:
    """Top-k documents per query under BM25.

    ``stats`` (optional): a lexical-stats table in the
    :func:`lexical_stats` layout — per-term (term, df, tf) plus the
    ``TERM_CORPUS`` row carrying (n_docs, sum_dl). When given, df/N/Σdl
    come from it instead of being recomputed from ``docs``: the
    incremental-index serving shape (score a batch, a slice, or the
    full corpus against stats a stream maintains —
    ``streaming.lexical``). Terms absent from ``stats`` are skipped
    (the stats table is authoritative for the corpus).

    ``queries`` is either a small driver-side list of
    (query_id, query_text) — the ad-hoc search shape, filtered with an
    INSET literal inside the scan — or a DataFrame
    (query_id, text) for batch retrieval (thousands of queries, e.g.
    mining hard negatives for embedding training), where the term
    filter becomes a broadcast LEFT SEMI join instead: same plan shape,
    no driver round-trip, query count bounded only by broadcast size.

    ``exact_fold=True`` sums each doc's term contributions in TERM
    order via a collect_list fold — bit-identical to the DuckDB
    oracle, required for the hash gate, cheap when queries are few.
    ``exact_fold=False`` uses a plain ``sum()`` (partition-order float
    accumulation, can drift in the last ulp): at 2000 queries × 200k
    docs the query terms cover the vocabulary, the fold materializes
    ~29M structs and costs 127 s vs 22 s for the sum. The default
    (``None``) picks automatically: with ``stats`` it estimates the
    matched contributions as Σ df over the (query,term) pairs and
    folds below FOLD_CONTRIB_LIMIT; without stats it folds while the
    (query,term) pair count stays under FOLD_QT_LIMIT (bounded probe,
    no corpus scan either way). Callers that need the deterministic
    fold regardless of scale pass True explicitly.

    Output: (query_id, rank, doc_id, score) with
    score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    idf(t) = ln(1 + (N−df+0.5)/(df+0.5)) — non-negative for all df.
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        words(F.lower(F.coalesce(F.col(text_col), F.lit("")))).alias("toks"),
    )
    if isinstance(queries, DataFrame):
        qt = queries.select(
            F.col("query_id").cast("long").alias("query_id"),
            F.explode(
                F.array_distinct(
                    words(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
                )
            ).alias("term"),
        )

        def term_filter(occ: DataFrame) -> DataFrame:
            return occ.join(
                F.broadcast(qt.select("term").distinct()), "term", "leftsemi"
            )
    else:
        qterms = _query_terms(queries)
        terms = sorted({t for _, t in qterms})
        qt = local_rows_df(
            docs.sparkSession, qterms, "query_id long, term string"
        )

        def term_filter(occ: DataFrame) -> DataFrame:
            return occ.where(F.col("term").isin(terms))

    if stats is None:
        # corpus stats: one scan-local aggregate, broadcast back as 1 row
        corpus = base.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.size("toks")).cast("long").alias("sum_dl"),
        )
    else:
        corpus = stats.where(F.col("term") == TERM_CORPUS).select(
            F.col("df").alias("n_docs"), F.col("tf").alias("sum_dl")
        )
    # tf over query terms only — the filter runs before the groupBy
    tf = (
        term_filter(
            base.select(
                "doc_id",
                F.size("toks").cast("long").alias("dl"),
                F.explode("toks").alias("term"),
            )
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"), F.max("dl").alias("dl"))
    )
    if stats is None:
        tf = tf.withColumn(
            "df",
            F.count(F.lit(1)).over(Window.partitionBy("term")).cast("long"),
        )
    else:
        term_df = stats.where(
            (F.col("term") != TERM_CORPUS)
            & ~F.col("term").startswith(RESERVED_PREFIX)
        ).select("term", F.col("df").cast("long").alias("df"))
        tf = tf.join(F.broadcast(term_df), "term")
    if exact_fold is None:
        # auto: fold only while the contribution stream stays small.
        # Driver-list queries know their pair count for free; DataFrame
        # queries probe it with a bounded count (stops at the limit, no
        # corpus scan). With a stats table the matched contributions
        # are exactly sum(df) over the (query,term) pairs — a join of
        # two broadcast-sized tables.
        if isinstance(queries, DataFrame):
            n_qt = qt.limit(FOLD_QT_LIMIT + 1).count()
        else:
            n_qt = len(qterms)
        if stats is not None and n_qt <= FOLD_QT_LIMIT:
            est = (
                qt.join(F.broadcast(term_df), "term")
                .agg(F.sum("df"))
                .first()[0]
            )
            exact_fold = (est or 0) <= FOLD_CONTRIB_LIMIT
        else:
            exact_fold = n_qt <= FOLD_QT_LIMIT
    qt = F.broadcast(qt)
    contrib = (
        tf.join(qt, "term")
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs").cast("double") - F.col("df") + F.lit(0.5))
                / (F.col("df").cast("double") + F.lit(0.5))
            ),
        )
        .withColumn(
            "c",
            F.col("idf")
            * (F.col("tf").cast("double") * F.lit(k1 + 1.0))
            / (
                F.col("tf").cast("double")
                + F.lit(k1)
                * (
                    F.lit(1.0)
                    - F.lit(b)
                    + F.lit(b)
                    * F.col("dl").cast("double")
                    * F.col("n_docs").cast("double")
                    / F.col("sum_dl").cast("double")
                )
            ),
        )
    )
    if exact_fold:
        score = F.aggregate(
            F.array_sort(F.collect_list(F.struct("term", "c"))),
            F.lit(0.0),
            lambda acc, x: acc + x["c"],
        )
    else:
        score = F.sum("c")
    scored = contrib.groupBy("query_id", "doc_id").agg(
        F.round(score, 6).alias("score"),
        F.count(F.lit(1)).cast("long").alias("n_terms"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score", "n_terms")
    )


def rrf_fuse(
    ranklists: DataFrame,
    k_rrf: int = 60,
    topk: int = 10,
) -> DataFrame:
    """Reciprocal rank fusion over ``ranklists`` (query_id, src, rank,
    doc_id) — one row per (query, source, candidate), ranks 1-based.

    score(q, d) = Σ_sources 1/(k_rrf + rank_src(d)); a doc absent from
    a source contributes nothing (the standard convention). Output:
    (query_id, rank, doc_id, rrf_score, n_sources), fused rank breaking
    ties on the rounded score by lowest doc id.

    Scale: input is already top-k-per-source (|q|·|src|·k rows); one
    (query, doc) shuffle + one per-query window. The float fold is
    ordered by source name on both engines.
    """
    contrib = ranklists.withColumn(
        "c", F.lit(1.0) / (F.lit(float(k_rrf)) + F.col("rank").cast("double"))
    )
    fused = contrib.groupBy("query_id", "doc_id").agg(
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("src", "c"))),
                F.lit(0.0),
                lambda acc, x: acc + x["c"],
            ),
            6,
        ).alias("rrf_score"),
        F.count(F.lit(1)).cast("long").alias("n_sources"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("doc_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= topk)
        .select("query_id", "rank", "doc_id", "rrf_score", "n_sources")
    )


def hybrid_search(
    docs: DataFrame,
    queries: "list[tuple[int, str]] | DataFrame",
    vec_ranks: DataFrame,
    k: int = 10,
    fetch_k: int = 20,
    k_rrf: int = 60,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Hybrid retrieval: BM25 top-``fetch_k`` fused with a vector
    ranklist via RRF — the deployment shape of every hybrid vector-DB
    query path (keyword recall ⊕ semantic recall).

    ``vec_ranks`` is the output of ANY dense route — ``exact_knn``,
    ``lsh_knn``, ``ivfpq_knn`` or the planner — in their shared
    (qid, nbr_rank, neighbor_id, …) contract, with qid matching the
    BM25 query ids. Keeping the dense side an input (rather than
    computing it here) lets the caller pick the index the corpus size
    demands; fusion only ever sees |q|·2·fetch_k rank rows.
    """
    kw = bm25_topk(
        docs, queries, k=fetch_k, k1=k1, b=b,
        text_col=text_col, id_col=id_col,
    )
    ranks = kw.select(
        "query_id", F.lit("kw").alias("src"), "rank", "doc_id"
    ).unionByName(
        vec_ranks.select(
            F.col("qid").cast("long").alias("query_id"),
            F.lit("vec").alias("src"),
            F.col("nbr_rank").cast("long").alias("rank"),
            F.col("neighbor_id").cast("long").alias("doc_id"),
        ).where(F.col("rank") <= fetch_k)
    )
    return rrf_fuse(ranks, k_rrf=k_rrf, topk=k)


def maxsim_topk(
    doc_tokens: DataFrame,
    query_tokens: DataFrame,
    k: int = 10,
    doc_id_col: str = "doc_id",
    doc_vec_col: str = "vec",
    q_id_col: str = "query_id",
    q_pos_col: str = "qpos",
    q_vec_col: str = "vec",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """ColBERT-style late-interaction retrieval (Khattab & Zaharia,
    SIGIR'20): score(q, d) = Σ_{query tokens i} max_{doc tokens j}
    ⟨qᵢ, dⱼ⟩ — the MaxSim operator a multi-vector index serves.

    ``doc_tokens``: one row per document token (doc_id, vec);
    ``query_tokens``: one row per query token (query_id, qpos, vec).
    Returns (query_id, rank, doc_id, score), top-``k`` docs per query,
    rank on the rounded score descending with lowest-doc-id ties.

    Spark-first shape: the query-token table is broadcast (queries are
    the small side by construction), the (doc token × query token) dot
    stream is never materialized — it flows into a map-side-combinable
    groupBy (query, qpos, doc) MAX, then the per-query-token maxima
    fold in qpos order. At corpus scale pass ``candidates`` (query_id,
    doc_id — e.g. an ANN shortlist from the planner) to restrict
    scoring to a candidate set BEFORE any dot product is computed:
    retrieve-then-rerank, the deployment shape of every late-
    interaction system (PLAID, ColBERTv2).

    Cross-engine exactness: each dot product is the sequential
    position-ordered fold (`functions.vector.dot` ==
    DuckDB `list_sum(list_transform(qv, (x,i) -> x*dv[i]))`), MAX is
    order-free selection, the qpos fold is explicitly ordered, and
    rounding happens once after the fold (`oracles.maxsim_topk_sql`).
    """
    from vectordbindexing_spark.functions.vector import dot as dot_seq

    dt = doc_tokens.select(
        F.col(doc_id_col).cast("long").alias("doc_id"),
        F.col(doc_vec_col).cast("array<double>").alias("dv"),
    )
    qt = F.broadcast(
        query_tokens.select(
            F.col(q_id_col).cast("long").alias("query_id"),
            F.col(q_pos_col).cast("long").alias("qpos"),
            F.col(q_vec_col).cast("array<double>").alias("qv"),
        )
    )
    if candidates is not None:
        cand = candidates.select(
            F.col("query_id").cast("long").alias("query_id"),
            F.col("doc_id").cast("long").alias("doc_id"),
        ).distinct()
        dt = dt.join(cand, "doc_id")  # (doc token × its candidate queries)
        pairs = dt.join(qt, "query_id")
    else:
        pairs = dt.crossJoin(qt)
    dots = pairs.select(
        "query_id", "qpos", "doc_id",
        dot_seq(F.col("qv"), F.col("dv")).alias("dp"),
    )
    mx = dots.groupBy("query_id", "qpos", "doc_id").agg(
        F.max("dp").alias("m")
    )
    score = F.aggregate(
        F.array_sort(F.collect_list(F.struct("qpos", "m"))),
        F.lit(0.0),
        lambda acc, x: acc + x["m"],
    )
    scored = mx.groupBy("query_id", "doc_id").agg(
        F.round(score, 6).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document — the classic keyphrase /
    topic-signature extraction (the per-document twin of BM25's
    corpus-level ranking; used in pipelines for doc tagging and
    centroid labeling). Returns (doc_id, rank, term, score, tf, df),
    rank on the rounded score descending, ties to the lexicographically
    smallest term.

    One corpus scan: tf is the (doc, term) count; df is
    ``count() OVER (PARTITION BY term)`` on the tf rows — distinct
    (doc, term) rows make that count exactly df, and keeping it a
    window on the SAME lineage (not a second groupBy branch) preserves
    exchange reuse (the measured 5× BM25 lesson, SCALE.md). N
    broadcast; score = tf · ln(1 + N/df) — integers everywhere until
    the one ln, absorbed by round(·, 6) on both engines
    (`oracles.tfidf_top_terms_sql`).
    """
    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        words(F.lower(F.coalesce(F.col(text_col), F.lit("")))).alias("toks"),
    )
    n_b = F.broadcast(
        toks.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    occ = toks.select("doc_id", F.explode("toks").alias("term"))
    tf = occ.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    tfdf = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term")).cast("long")
    )
    scored = tfdf.crossJoin(n_b).select(
        "doc_id", "term", "tf", "df",
        F.round(
            F.col("tf").cast("double")
            * F.log(
                F.lit(1.0)
                + F.col("n_docs").cast("double") / F.col("df").cast("double")
            ),
            6,
        ).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("doc_id", "rank", "term", "score", "tf", "df")
    )
