"""Text-analysis operators for training-data pipelines (north-star set):
token counting, quality scoring, language ID, document fingerprinting.

All pure Column expressions — whole-stage codegen, no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vectordbindexing_spark.functions.text import words

# Tiny per-language marker lexicons for the n-gram/stopword language-ID
# heuristic. The testdata 'documents' table is synthetic English-ish tech
# text with a lang label; the operator is the real thing — marker lists are
# swappable.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "de": ("der", "die", "und", "das", "ist"),
    "es": ("el", "la", "de", "que", "los"),
    "fr": ("le", "la", "les", "des", "est"),
    "zh": ("的", "是", "了", "在", "we"),
}

STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "it", "for", "on")


def token_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc token statistics (counting + length profile)."""
    toks = words(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.length(text_col).alias("n_chars"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.round(
            F.aggregate(
                toks, F.lit(0.0), lambda acc, x: acc + F.length(x).cast("double")
            )
            / F.size(toks).cast("double"),
            4,
        ).alias("avg_token_len"),
    )


def quality_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic quality features: length, stopword ratio, punct ratio,
    uppercase ratio, type-token ratio — the standard cheap LLM-data filters."""
    toks = words(F.col(text_col))
    n_tok = F.size(toks).cast("double")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.array_intersect(toks, stop_arr)).cast("double")
    stop_hits = F.size(
        F.filter(toks, lambda t: F.array_contains(stop_arr, t))
    ).cast("double")
    n_chars = F.length(text_col).cast("double")
    n_punct = (
        n_chars - F.length(F.regexp_replace(text_col, r"[.,;:!?]", "")).cast("double")
    )
    n_upper = (
        n_chars - F.length(F.regexp_replace(text_col, r"[A-Z]", "")).cast("double")
    )
    return df.select(
        F.col(id_col),
        F.length(text_col).alias("n_chars"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.round(stop_hits / n_tok, 6).alias("stopword_ratio"),
        F.round(n_punct / n_chars, 6).alias("punct_ratio"),
        F.round(n_upper / n_chars, 6).alias("upper_ratio"),
        F.round(F.size(F.array_distinct(toks)).cast("double") / n_tok, 6).alias(
            "type_token_ratio"
        ),
        (n_stop > 0).alias("has_stopwords"),
    )


def lang_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Marker-word language ID: argmax over per-language marker hit counts,
    ties → 'und' (undetermined), no markers → 'und'."""
    toks = words(F.lower(F.col(text_col)))
    scores = [
        F.struct(
            F.size(
                F.filter(
                    toks,
                    lambda t: F.array_contains(
                        F.array(*[F.lit(m) for m in markers]), t
                    ),
                )
            ).cast("long").alias("score"),
            F.lit(lang).alias("lang"),
        )
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    best = F.array_max(F.array(*scores))
    return df.select(
        F.col(id_col),
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")).alias(
            "pred_lang"
        ),
        best["score"].alias("marker_hits"),
    )


def doc_fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Stable 64-bit content fingerprint (md5-derived, cross-engine)."""
    from vectordbindexing_spark.functions.hashing import det_hash64

    return df.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("fingerprint"),
        det_hash64(F.col(text_col)).alias("fingerprint64"),
    )
