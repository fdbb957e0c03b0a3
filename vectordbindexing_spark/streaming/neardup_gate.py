"""Streaming MinHash near-dup gate — continuous-ingestion twin of
operators.dedup.minhash_dedup_pairs for pipelines that must flag
near-duplicates AS DOCUMENTS ARRIVE (crawl ingestion, live corpus
feeds) instead of in a batch pass.

Shape: each arriving doc shingles → MinHash signature (the SAME shared
kernel functions as the batch op: det_hash64_py + minhash_signature_np,
so stream and batch signatures are bit-identical) → explodes to its
``bands`` band-key buckets → one ``applyInPandasWithState`` keyed by
(band_idx, band_key). Per-bucket state holds up to ``bucket_cap``
(doc_id, full signature) entries; a new doc compares against the bucket
residents with the true MinHash estimate (matching components /
num_hashes — not mere band collision) and emits a match row per
resident above ``threshold``. Consumers reduce the match stream to a
keep/drop verdict with a dropDuplicates or any-match aggregate.

Ordering contract (same as the streaming filter gate): within a
micro-batch each bucket processes docs in ascending doc_id, so a
single-batch run emits exactly the earlier-id→later-id matches a batch
pass would; across batches the earlier ARRIVAL is the resident.

State bounds, stated: ``bucket_cap`` FIFO-evicts the oldest resident
(a duplicate arriving after its original was evicted is missed — the
cap is the memory/recall dial), and an idle-bucket processing-time
timeout drops buckets untouched for ``ttl_ms`` (the watermark-style
bound every streaming dedup needs). State size ≈ live buckets ×
occupancy × (8 + 8·num_hashes) bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from vectordbindexing_spark.functions.text import word_ngrams

_OUT_SCHEMA = "doc_id long, dup_of long, band_idx long, est_jaccard double"
_STATE_SCHEMA = "ids array<long>, sigs array<array<long>>"


def _band_keys(sig: list[int], bands: int, rows_per_band: int) -> list[str]:
    """Band key = underscore-joined band slice of the signature — the
    IDENTICAL key string the batch op's band_key expression builds
    (dedup.minhash_dedup_pairs), so stream and batch bucket the same."""
    return [
        "_".join(
            str(sig[b * rows_per_band + j]) for j in range(rows_per_band)
        )
        for b in range(bands)
    ]


def neardup_match_stream(
    docs_stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.5,
    bucket_cap: int = 256,
    ttl_ms: int = 3_600_000,
) -> DataFrame:
    """documents stream → (doc_id, dup_of, band_idx, est_jaccard) match
    stream: one row per (arriving doc, earlier resident, band) whose
    full-signature MinHash estimate ≥ threshold. A doc colliding with
    the same resident in several bands emits several rows — reduce with
    dropDuplicates([doc_id, dup_of]) or an any-match aggregate."""
    import numpy as np

    from vectordbindexing_spark.functions.hashing import (
        det_hash64_py,
        minhash_signature_np,
    )

    rows_per_band = num_hashes // bands

    def explode_to_bands(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        cache: dict[str, int] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_id, out_band, out_key, out_sig = [], [], [], []
            for did, grams in zip(pdf["did"], pdf["grams"]):
                hs = np.empty(len(grams), dtype=np.int64)
                for i, s in enumerate(grams):
                    v = cache.get(s)
                    if v is None:
                        if len(cache) >= 2_000_000:
                            cache.clear()
                        v = cache[s] = det_hash64_py(s)
                    hs[i] = v
                sig = minhash_signature_np(hs, num_hashes).tolist()
                for b, key in enumerate(_band_keys(sig, bands, rows_per_band)):
                    out_id.append(did)
                    out_band.append(b)
                    out_key.append(key)
                    out_sig.append(sig)
            yield pd.DataFrame(
                {
                    "did": out_id,
                    "band_idx": out_band,
                    "band_key": out_key,
                    "sig": out_sig,
                }
            )

    banded = (
        docs_stream.select(
            F.col(id_col).cast("long").alias("did"),
            word_ngrams(F.coalesce(F.col(text_col), F.lit("")), n).alias(
                "grams"
            ),
        )
        .mapInPandas(
            explode_to_bands,
            schema="did long, band_idx long, band_key string, sig array<long>",
        )
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        band_idx, _band_key = key
        if state.hasTimedOut:
            state.remove()
            return
        ids: list[int]
        sigs: list[list[int]]
        if state.exists:
            ids, sigs = state.get
            ids, sigs = list(ids), [list(s) for s in sigs]
        else:
            ids, sigs = [], []
        rows = []
        arrivals = []
        for pdf in pdfs:
            arrivals.extend(zip(pdf["did"], pdf["sig"]))
        arrivals.sort(key=lambda t: t[0])  # min-id-first == batch order
        for did, sig in arrivals:
            # plain-int everything that enters state: numpy scalars do
            # not survive the state (un)pickler
            sig = [int(x) for x in sig]
            for rid, rsig in zip(ids, sigs):
                est = sum(a == b for a, b in zip(sig, rsig)) / num_hashes
                if est >= threshold:
                    rows.append((int(did), int(rid), int(band_idx), est))
            ids.append(int(did))
            sigs.append(sig)
            if len(ids) > bucket_cap:
                ids, sigs = ids[-bucket_cap:], sigs[-bucket_cap:]
        state.update((ids, sigs))
        state.setTimeoutDuration(ttl_ms)
        if rows:
            yield pd.DataFrame(
                {
                    "doc_id": [r[0] for r in rows],
                    "dup_of": [r[1] for r in rows],
                    "band_idx": [r[2] for r in rows],
                    "est_jaccard": [r[3] for r in rows],
                }
            )

    return banded.groupBy("band_idx", "band_key").applyInPandasWithState(
        update,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
