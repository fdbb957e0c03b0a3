"""Deterministic corpus sampling for training-data mixing.

Curation pipelines don't take uniform random samples — they BALANCE: cap
each source/domain/language at a document quota, or fill a per-source
token budget, so no stratum dominates the mix. Both samplers here order
documents by a content-independent md5 hash of the id (an unseeded,
engine-independent shuffle: the same corpus always yields the same
sample, across runs and across engines — required for reproducible data
recipes and for the DuckDB oracles) and take a prefix per stratum.

Physical plan: one shuffle on the stratum key + one window — the same
shape as every windowed top-k in the repo. Skew note: a hot stratum
(one domain = half the corpus) skews its window partition; at that
point cap the input first (the rank window only needs the first
``quota`` rows per stratum, so a pre-filter on a coarse hash range
bounds the sort input) or let AQE split the partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vectordbindexing_spark.functions.hashing import det_hash64


def _hash_window(strata_col: str, id_col: str) -> Window:
    # md5-hash order with id tiebreak: deterministic, content-independent
    return Window.partitionBy(strata_col).orderBy(
        det_hash64(F.col(id_col).cast("string")), F.col(id_col)
    )


def quota_sample(
    df: DataFrame,
    strata_col: str = "source",
    quota: int = 100,
    id_col: str = "doc_id",
) -> DataFrame:
    """At most ``quota`` documents per stratum, chosen by deterministic
    hash order. Output: (id, stratum, sample_rank) — rank is 1-based
    within the stratum, stable for incremental re-draws (raising the
    quota extends the sample; it never reshuffles it)."""
    return (
        df.select(F.col(id_col), F.col(strata_col))
        .withColumn("sample_rank", F.row_number().over(
            _hash_window(strata_col, id_col)
        ))
        .filter(F.col("sample_rank") <= quota)
        .select(
            F.col(id_col),
            F.col(strata_col),
            F.col("sample_rank").cast("long").alias("sample_rank"),
        )
    )


def token_budget_sample(
    df: DataFrame,
    strata_col: str = "source",
    budget_tokens: int = 10_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fill each stratum up to ``budget_tokens`` whitespace tokens, in
    deterministic hash order: keep every document whose cumulative token
    count (inclusive) stays within budget. The first document of a
    stratum is kept even if it alone exceeds the budget (a data mix
    never silently drops an entire source). Output:
    (id, stratum, n_tokens, cum_tokens)."""
    from vectordbindexing_spark.functions.text import words

    w = _hash_window(strata_col, id_col)
    # null-safe: a missing text counts as 0 tokens (size(null) is -1 and
    # would corrupt the running sum)
    toks = F.size(
        words(F.coalesce(F.col(text_col).cast("string"), F.lit("")))
    ).cast("long")
    return (
        df.select(F.col(id_col), F.col(strata_col), toks.alias("n_tokens"))
        .withColumn(
            "cum_tokens",
            F.sum("n_tokens").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(
            (F.col("cum_tokens") <= budget_tokens) | (F.col("_rn") == 1)
        )
        .select(id_col, strata_col, "n_tokens", "cum_tokens")
    )
