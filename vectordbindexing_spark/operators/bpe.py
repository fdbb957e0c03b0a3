"""BPE tokenizer training + encoding over a distributed corpus.

The classic LLM-pipeline capability (Sennrich et al. 2016; the GPT-2 /
SentencePiece training shape): tokenizers are trained on corpus
samples, then applied corpus-wide. Spark-first decomposition:

  1. word counting — the only corpus-scale stage: explode whitespace
     words, one map-side-combined groupBy(word), deterministic top-V
     selection via TakeOrderedAndProject (per-partition top-V, driver
     merge — never a full sort). Shuffle volume ∝ distinct words.
  2. merge loop — pure Python over the BOUNDED (top-V) word-frequency
     table; this is trained state exactly like k-means centroids, so
     the driver-side loop is the correct placement, not a compromise.
     Deterministic: ties on pair frequency break to the
     lexicographically smallest (lhs, rhs).
  3. encoding — Arrow-batched kernel with the merge ranks embedded in
     the task closure (~num_merges entries); per-distinct-word memo so
     each word is encoded once per batch. No row-at-a-time Python UDF.

The fit canonicalizes its input to (count desc, word asc) order so a
DuckDB-read word table produces the identical merge sequence — the
oracle pins the merges with the SAME `bpe_merge_loop` function
(`oracles.bpe_train_merges_sql`).
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectordbindexing_spark.functions.text import words
from vectordbindexing_spark.plans.partitioning import local_rows_df

END = "</w>"


def corpus_word_counts(
    df: DataFrame,
    text_col: str = "text",
    top_v: int = 10_000,
    min_count: int = 1,
) -> DataFrame:
    """Top-V (word, cnt) by (cnt desc, word asc) — the bounded training
    table. NULL text counts as empty."""
    w = df.select(
        F.explode(words(F.coalesce(F.col(text_col), F.lit("")))).alias("word")
    )
    counts = (
        w.groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )
    return counts.orderBy(F.desc("cnt"), F.asc("word")).limit(top_v)


def bpe_merge_loop(
    word_counts: Iterable[tuple[str, int]], num_merges: int = 200
) -> list[tuple[int, str, str, int]]:
    """Pure-Python BPE fit over a word-frequency table (shared by the
    Spark operator and the DuckDB oracle generator — identical input
    order gives an identical merge sequence).

    Returns [(merge_rank, lhs, rhs, freq)]; stops early when the best
    pair occurs < 2 times. Symbols start as characters plus a terminal
    ``</w>`` marker so merges never cross word boundaries.
    """
    vocab: list[tuple[list[str], int]] = [
        (list(w) + [END], int(c)) for w, c in word_counts
    ]
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, cnt in vocab:
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + cnt
        if not pairs:
            break
        best_freq = max(pairs.values())
        if best_freq < 2:
            break
        lhs, rhs = min(p for p, c in pairs.items() if c == best_freq)
        merged = lhs + rhs
        for syms, _ in vocab:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == lhs and syms[i + 1] == rhs:
                    syms[i : i + 2] = [merged]
                else:
                    i += 1
        merges.append((rank, lhs, rhs, best_freq))
    return merges


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    top_v: int = 10_000,
    min_count: int = 1,
    num_merges: int = 200,
) -> DataFrame:
    """Train BPE merges on the corpus; returns a DataFrame
    (merge_rank, lhs, rhs, freq). The collect is the bounded trained
    state (top_v rows), the same contract as k-means centroids."""
    wc = [
        (r["word"], r["cnt"])
        for r in corpus_word_counts(df, text_col, top_v, min_count).collect()
    ]
    merges = bpe_merge_loop(wc, num_merges)
    spark = df.sparkSession
    schema = "merge_rank long, lhs string, rhs string, freq long"
    return local_rows_df(spark, merges or [], schema)


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word, lowest-rank pair first (standard BPE
    encode). Shared by the Arrow kernel and the oracle generator."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode_stats(
    df: DataFrame,
    merges: DataFrame | list[tuple[int, str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc BPE statistics: n_words, n_bpe_tokens, and a 60-bit hash
    of the space-joined token stream (JVM-side det_hash60 over the
    kernel's joined string, so the hash arithmetic never runs in
    Python). Arrow-batched; per-distinct-word memo inside each batch."""
    import pandas as pd

    from vectordbindexing_spark.functions.hashing import det_hash60

    if isinstance(merges, DataFrame):
        merges = [
            (r["merge_rank"], r["lhs"], r["rhs"], r["freq"])
            for r in merges.collect()
        ]
    ranks = {(l, r): int(k) for k, l, r, _ in merges}

    out_schema = f"{id_col} long, n_words long, n_bpe_tokens long, _joined string"

    def kernel(batches):
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            ids, nw, nt, joined = [], [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks = [t for t in (text or "").split(" ") if t]
                enc: list[str] = []
                for w in toks:
                    got = memo.get(w)
                    if got is None:
                        got = memo[w] = bpe_encode_word(w, ranks)
                    enc.extend(got)
                ids.append(did)
                nw.append(len(toks))
                nt.append(len(enc))
                joined.append(" ".join(enc))
            yield pd.DataFrame(
                {id_col: ids, "n_words": nw, "n_bpe_tokens": nt, "_joined": joined}
            )

    enc = df.select(id_col, text_col).mapInPandas(kernel, schema=out_schema)
    return enc.select(
        F.col(id_col),
        F.col("n_words"),
        F.col("n_bpe_tokens"),
        det_hash60(F.col("_joined")).alias("tok_hash"),
    )
