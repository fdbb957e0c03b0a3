"""Streaming corpus filter gate — continuous-ingestion twin of
operators.textops.corpus_filter_gate for training-data pipelines that
filter documents as they arrive instead of in a batch pass.

The stateless rules (language ID, token bounds, punctuation ratio,
stopword presence, reason priority) are the SAME Column expressions,
shared via textops.gate_with_keeper, so the two gates cannot drift. Only
the exact-dup keeper changes shape: a batch can pick min-id-wins with a
window, but a stream has no window over the future — the streaming
keeper is FIRST ARRIVAL per content fingerprint, held in per-key state
(``applyInPandasWithState`` keyed by md5(text)). A processing-time
timeout evicts fingerprints idle longer than ``dedup_ttl_ms``, bounding
state like any watermark-bounded streaming dedup: a duplicate arriving
after the TTL is treated as new. At corpus scale the state is one
(md5, flag) entry per distinct in-TTL document — the same footprint as
Structured Streaming's own dropDuplicates, but emitting BOTH copies with
the keeper flag so dropped rows keep their audit reason.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_DEDUP_SCHEMA = "doc_id long, text string, is_keeper long"
_STATE_SCHEMA = "seen long"


def corpus_gate_stream(
    docs_stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang: str = "en",
    min_tokens: int = 5,
    max_tokens: int = 10_000,
    max_punct_ratio: float = 0.2,
    dedup_ttl_ms: int = 3_600_000,
) -> DataFrame:
    """documents stream → per-doc verdict stream with the batch gate's
    schema (doc_id, pred_lang, n_tokens, punct_ratio, is_keeper, keep,
    reason). Within a micro-batch, rows of the same fingerprint are
    processed in ascending doc_id order, so a single-batch run agrees
    exactly with the batch gate's min-id-wins keeper (pinned by test);
    across batches the earlier arrival wins."""
    keyed = docs_stream.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).cast("string").alias("text"),
        F.md5(F.col(text_col)).alias("_fp"),
    )

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        seen = int(state.get[0]) if state.exists else 0
        rows = []
        pairs = []
        for pdf in pdfs:
            pairs.extend(zip(pdf["doc_id"], pdf["text"]))
        pairs.sort(key=lambda p: int(p[0]))  # min id keeps within batch
        for did, txt in pairs:
            rows.append((int(did), txt, 0 if seen else 1))
            seen = 1
        state.update((1,))
        state.setTimeoutDuration(dedup_ttl_ms)
        if rows:
            yield pd.DataFrame(rows, columns=["doc_id", "text", "is_keeper"])

    deduped = keyed.groupBy("_fp").applyInPandasWithState(
        update,
        outputStructType=_DEDUP_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
    from vectordbindexing_spark.operators.textops import gate_with_keeper

    return gate_with_keeper(
        deduped, F.col("is_keeper") == 1, "text", "doc_id", lang,
        min_tokens, max_tokens, max_punct_ratio,
    )
