"""Text primitives: tokenization, n-grams — shared by dedup + text analysis.

Tokenization is deliberately the simplest cross-engine-reproducible form
(split on single space, drop empties) so DuckDB oracles agree byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def words(text: Column | str) -> Column:
    """Whitespace tokens, empties dropped. DuckDB:
    ``list_filter(string_split(text, ' '), x -> length(x) > 0)``."""
    return F.filter(F.split(text, " "), lambda x: F.length(x) > 0)


WORDS_SQL = "list_filter(string_split({t}, ' '), x -> length(x) > 0)"


def word_ngrams(text: Column | str, n: int) -> Column:
    """Space-joined word n-grams (shingles). Docs shorter than n words give
    a single shingle of the whole doc (so no doc maps to the empty set)."""
    toks = words(text)
    cnt = F.size(toks)
    return F.when(
        cnt >= n,
        F.transform(
            F.sequence(F.lit(1), cnt - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))


def word_ngrams_sql(text_sql: str, n: int) -> str:
    toks = WORDS_SQL.format(t=text_sql)
    return f"""
    CASE WHEN len({toks}) >= {n}
         THEN list_transform(range(1, len({toks}) - {n - 2}),
                             i -> array_to_string(list_slice({toks}, i, i + {n - 1}), ' '))
         ELSE [array_to_string({toks}, ' ')]
    END
    """
