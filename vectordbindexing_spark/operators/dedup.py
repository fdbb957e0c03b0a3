"""Deduplication operators for LLM-training-data pipelines.

Beyond-reference capability (north star in SURVEY §0/§7 Phase 6): exact,
MinHash-LSH, SimHash, n-gram Jaccard and embedding-cosine near-dup. All are
shuffle-lean: exact dedup is one hash groupBy; the approximate variants
generate candidate pairs via equi-joins on bucket keys (never all-pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectordbindexing_spark.functions.hashing import det_hash64, minhash_signature
from vectordbindexing_spark.functions.text import word_ngrams, words


def exact_dedup_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Group identical texts; report canonical keeper + multiplicity.

    One map-side-combined hash aggregation — the cheapest possible dedup at
    100 TB (no shuffle of the text payload if you pre-hash; we group on
    md5 so only the 32-byte digest + id shuffle).
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Return df with exact-duplicate rows removed (keep min-id row)."""
    keep = exact_dedup_stats(df, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keep, id_col, "semi")


def jaccard_ngram_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Pairwise word-n-gram Jaccard similarity ≥ threshold.

    All-pairs formulation (theta join) — use only on candidate sets already
    pruned by :func:`minhash_dedup_pairs`; exposed standalone for small
    tables and as the oracle-checkable exact variant.
    """
    g = df.select(
        F.col(id_col).alias("did"),
        F.array_distinct(word_ngrams(F.col(text_col), n)).alias("grams"),
    )
    a = g.select(F.col("did").alias("id_a"), F.col("grams").alias("grams_a"))
    b = g.select(F.col("did").alias("id_b"), F.col("grams").alias("grams_b"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect("grams_a", "grams_b")).cast("double")
    union = (
        F.size("grams_a").cast("double") + F.size("grams_b").cast("double") - inter
    )
    return (
        pairs.select(
            "id_a",
            "id_b",
            F.round(inter / union, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash + LSH banding near-dup candidates, verified by exact Jaccard.

    shingle → minhash signature (num_hashes deterministic affine hashes of a
    cross-engine md5-based shingle hash) → band → equi-join on
    (band_idx, band_key) → exact Jaccard verify. The equi-join on band keys
    is the 100 TB scale trick: candidate volume ∝ collisions, not n².
    """
    rows_per_band = num_hashes // bands
    g = df.select(
        F.col(id_col).alias("did"),
        F.col(text_col).alias("txt"),
        F.array_distinct(word_ngrams(F.col(text_col), n)).alias("grams"),
    ).withColumn("sig", minhash_signature(F.col("grams"), num_hashes))
    banded = g.select(
        "did",
        "grams",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.struct(
                    i.alias("band_idx"),
                    F.concat_ws(
                        "_",
                        F.slice(
                            "sig", i * rows_per_band + 1, rows_per_band
                        ).cast("array<string>"),
                    ).alias("band_key"),
                ),
            )
        ).alias("band"),
    ).select("did", "grams", "band.band_idx", "band.band_key")
    a = banded.select(
        F.col("did").alias("id_a"), F.col("grams").alias("grams_a"),
        "band_idx", "band_key",
    )
    b = banded.select(
        F.col("did").alias("id_b"), F.col("grams").alias("grams_b"),
        "band_idx", "band_key",
    )
    cand = (
        a.join(b, ["band_idx", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "grams_a", "grams_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("grams_a", "grams_b")).cast("double")
    union = (
        F.size("grams_a").cast("double") + F.size("grams_b").cast("double") - inter
    )
    return (
        cand.select("id_a", "id_b", F.round(inter / union, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """Pairs with cosine similarity ≥ threshold (embedding near-dup).

    Declarative all-pairs over ids with i < j; at scale, pre-bucket with
    SimHash (operators.lsh) and feed the bucketed candidates here.
    """
    from vectordbindexing_spark.functions.vector import dot, l2_norm, to_double_array

    g = df.select(
        F.col(id_col).alias("vid"), to_double_array(vec_col).alias("v")
    )
    a = g.select(F.col("vid").alias("id_a"), F.col("v").alias("va"))
    b = g.select(F.col("vid").alias("id_b"), F.col("v").alias("vb"))
    sim = dot("va", "vb") / (l2_norm("va") * l2_norm("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(sim, 6).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )
