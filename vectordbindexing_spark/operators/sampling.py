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

from vectordbindexing_spark.functions.hashing import det_hash60, det_hash64


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


def weighted_sample(
    df: DataFrame,
    n: int,
    weight_col: str,
    id_col: str = "doc_id",
    temperature: float = 1.0,
    strata_col: str | None = None,
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis-Vieweg A-ES): the temperature-mixing stage of a
    training-data recipe ("sample ∝ quality^(1/T)").

    Each row draws the pseudo-uniform u = (md5₆₀(id)+1)/2⁶⁰ — the same
    content-independent, engine-independent source the other samplers
    use. A-ES ranks by u^(1/w') (w' = w^(1/T)) descending; this module
    ranks by the DOUBLE-LOG equivalent
    ``sample_key = ln(−ln u) − (1/T)·ln w`` ASCENDING — the same total
    order, but the key stays O(±40) for ANY weight/temperature, so the
    repo's round-to-6dp cross-engine guard keeps full discrimination.
    (The single-log form ln(u)/w^(1/T) underflows the rounding at
    extreme temperatures: at T = 0.05 every key rounds to −0.000000
    and the id tie-break silently takes over — caught by the
    temperature-limit test.) T → 0 degenerates to "take the
    highest-weight documents", T = 1 is ∝ w, T → ∞ approaches uniform.
    Rows with weight ≤ 0 or NULL are excluded (no sampling mass).

    Keys round to 6 dp BEFORE ranking (lowest-id tie-break) —
    `oracles.weighted_sample_sql` replays the identical expression.

    Output: (id, [stratum,] weight, sample_key, sample_rank), rank
    1-based per stratum (or global). Global top-n runs as
    sort-and-limit (TakeOrdered — per-partition partial top-n, no
    single-partition window); the stratified path is the usual
    windowed top-k per stratum key.
    """
    if n < 1:
        raise ValueError("need n >= 1")
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    inv_t = 1.0 / temperature
    u = (det_hash60(F.col(id_col).cast("string")) + F.lit(1)).cast(
        "double"
    ) / F.lit(2.0**60)
    key = F.round(
        F.log(-F.log(u)) - F.lit(inv_t) * F.log(F.col(weight_col).cast("double")),
        6,
    )
    cols = [F.col(id_col), F.col(weight_col).cast("double").alias("weight")]
    if strata_col is not None:
        cols.insert(1, F.col(strata_col))
    scored = (
        df.where(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .select(*cols, key.alias("sample_key"))
    )
    if strata_col is None:
        top = scored.orderBy("sample_key", id_col).limit(n)
        rank_w = Window.orderBy("sample_key", id_col)
    else:
        rank_w = Window.partitionBy(strata_col).orderBy(
            "sample_key", id_col
        )
        top = scored
    out = top.withColumn(
        "sample_rank", F.row_number().over(rank_w).cast("long")
    )
    if strata_col is not None:
        out = out.filter(F.col("sample_rank") <= n)
    return out
