"""Measure the streaming near-dup maintainer at scale (SCALE.md log).

Synthesizes a corpus of Zipf-ish word documents with planted
near-duplicates (every 10th doc is a one-word mutation of its
predecessor), bulk-inits the banded-LSH artifact, then times
micro-batch upserts and a replay no-op. Prints one JSON line per step.

Usage:
    python scripts/measure_neardup.py [--n 100000] [--words 60]
        [--batches 100,1000] [--buckets 256] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def synth_docs(spark, n: int, words: int, start_id: int = 0,
               vocab: int = 997):
    """Deterministic documents: ``vocab``-word vocabulary with per-doc
    hash-mixed selection; every 10th doc mutates one word of its
    predecessor's text (a guaranteed near-dup pair).

    ``vocab`` controls the storage regime: a ~1k vocabulary keeps the
    distinct-gram set tiny, so parquet dictionary-encodes the raw
    strings nearly as small as 60-bit hashes (measured ratio 0.98 at
    100k docs) — the DICT-FRIENDLY regime. A vocabulary ≫ corpus gram
    count (e.g. 5M) makes nearly every gram distinct, the dictionary
    page caps out, strings fall back to plain encoding and the hashed
    layout wins by the gram-length/8 ratio — the REAL-CORPUS regime
    (natural-language word-3-grams are ~25-30 chars and mostly
    unique)."""
    base = spark.range(start_id, start_id + n).select(
        F.col("id").alias("doc_id")
    )
    # word j of doc d: vocab index from a cheap integer hash; docs
    # d % 10 == 1 copy doc d-1 with word 7 swapped
    src = F.when(F.col("doc_id") % 10 == 1, F.col("doc_id") - 1).otherwise(
        F.col("doc_id")
    )
    toks = F.transform(
        F.sequence(F.lit(0), F.lit(words - 1)),
        lambda j: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(src * F.lit(words) + j), F.lit(vocab)).cast(
                "string"
            ),
        ),
    )
    mutated = F.when(
        F.col("doc_id") % 10 == 1,
        F.concat(
            F.slice(toks, 1, 7),
            F.array(F.lit("zulu")),
            F.slice(toks, 9, words - 8),
        ),
    ).otherwise(toks)
    return base.select(
        "doc_id", F.array_join(mutated, " ").alias("text")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--words", type=int, default=60)
    ap.add_argument("--batches", default="100,1000")
    ap.add_argument("--buckets", type=int, default=256)
    ap.add_argument("--vocab", type=int, default=997)
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--workdir", default=None)
    ap.add_argument(
        "--compare-strings", action="store_true",
        help="also write the pre-r11 raw-string signatures layout and "
             "report its bytes (the storage-ratio measurement)",
    )
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("measure_neardup")
        .config("spark.sql.shuffle.partitions", args.cpus)
        .config("spark.driver.memory", "32g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from vectordbindexing_spark.operators.dedup import minhash_signatures
    from vectordbindexing_spark.streaming.atomic import du_parquet
    from vectordbindexing_spark.streaming.neardup import (
        init_neardup_artifact,
        upsert_neardup_artifact,
    )

    work = args.workdir or tempfile.mkdtemp(prefix="neardup_bench_")
    idx = f"{work}/nd_idx"

    def emit(step: str, sec: float, **kw) -> None:
        print(json.dumps({"step": step, "sec": round(sec, 1), **kw}),
              flush=True)

    base = synth_docs(spark, args.n, args.words, vocab=args.vocab)
    t0 = time.time()
    init_neardup_artifact(base, idx, buckets=args.buckets)
    sig_bytes = du_parquet(f"{idx}/signatures")
    emit(
        "init", time.time() - t0, n=args.n, buckets=args.buckets,
        vocab=args.vocab,
        sig_bytes=sig_bytes, band_bytes=du_parquet(f"{idx}/bands"),
        sig_bytes_per_doc=round(sig_bytes / args.n, 1),
    )
    if args.compare_strings:
        # the pre-r11 layout (raw gram strings) for the storage ratio
        t0 = time.time()
        gs = minhash_signatures(base)
        gs.write.mode("overwrite").parquet(f"{work}/sig_strings")
        sb = du_parquet(f"{work}/sig_strings")
        emit(
            "sig_strings_layout", time.time() - t0, sig_bytes=sb,
            sig_bytes_per_doc=round(sb / args.n, 1),
            ratio_vs_hashed=round(sb / max(sig_bytes, 1), 2),
        )

    next_id = args.n
    last = None
    for bs in [int(b) for b in args.batches.split(",")]:
        batch = synth_docs(spark, bs, args.words, start_id=next_id,
                           vocab=args.vocab)
        next_id += bs
        d0 = du_parquet(f"{idx}/bands_delta") if os.path.isdir(
            f"{idx}/bands_delta") else 0
        t0 = time.time()
        pairs = upsert_neardup_artifact(batch, idx)
        npairs = pairs.count()
        emit(
            f"batch_{bs}", time.time() - t0, pairs=npairs,
            band_delta_appended=du_parquet(f"{idx}/bands_delta") - d0,
            band_base_bytes=du_parquet(f"{idx}/bands"),
        )
        last = batch

    t0 = time.time()
    n_replay = upsert_neardup_artifact(last, idx).count()
    emit("replay_noop", time.time() - t0, pairs=n_replay)

    if args.workdir is None:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
