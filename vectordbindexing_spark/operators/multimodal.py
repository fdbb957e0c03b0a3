"""Multimodal column operators — opaque binary media columns with typed
metadata, processed via Arrow-batched kernels.

Mirrors the reference's CLIP ingestion path (flickr30k_clip.ipynb cell 6:
image files + captions → 512-d embeddings, batch inference with a broadcast
model) in Spark-native form: binary column + ``mapInPandas`` decode /
feature-extract / embed stages. The image/audio decode libraries are NOT in
this container, so the decode step is STUBBED — ``decoder="fake"`` gives a
deterministic bytes-derived decode so the Spark-side plumbing (schema,
batching, partitioning, UDF signatures) is real and tested;
``decoder="pil"`` raises NotImplementedError unless PIL is importable.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, content binary, mime string, n_bytes long"
)


def attach_media_metadata(
    df: DataFrame, content_col: str = "content"
) -> DataFrame:
    """Typed metadata columns for an opaque binary column (size, sha-ish
    fingerprint) — pure expressions, no decode."""
    return df.withColumn("n_bytes", F.length(content_col).cast("long")).withColumn(
        "content_md5", F.md5(F.col(content_col))
    )


def _fake_decode(buf: bytes) -> np.ndarray:
    """Deterministic stand-in for an image decoder: bytes → pseudo-pixel
    grid derived from the content (stable across runs/engines)."""
    arr = np.frombuffer(buf, dtype=np.uint8)
    side = max(1, int(len(arr) ** 0.5))
    need = side * side
    tiled = np.resize(arr, need).reshape(side, side)
    return tiled


def decode_image_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    decoder: str = "fake",
) -> DataFrame:
    """binary → (media_id, width, height, mean_intensity, features[8]).

    ``decoder='pil'`` uses a real image decoder when available (not in this
    container — clearly-marked stub); ``'fake'`` exercises the identical
    dataflow with the deterministic decode above.
    """
    if decoder == "pil":
        try:
            from PIL import Image  # noqa: F401
        except ImportError as e:  # pragma: no cover - lib absent by design
            raise NotImplementedError(
                "PIL not available in this environment; use decoder='fake' "
                "(deterministic stub) — plumbing is identical"
            ) from e

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, means, feats = [], [], [], [], []
            for mid, buf in zip(pdf[id_col], pdf[content_col]):
                img = _fake_decode(bytes(buf))
                ids.append(mid)
                hs.append(img.shape[0])
                ws.append(img.shape[1])
                means.append(float(img.mean()))
                # 8-bin intensity histogram as the stand-in feature vector
                hist, _ = np.histogram(img, bins=8, range=(0, 256))
                feats.append((hist / max(1, img.size)).astype("float32").tolist())
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "width": ws,
                    "height": hs,
                    "mean_intensity": means,
                    "features": feats,
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        extract,
        schema=(
            "media_id long, width int, height int, "
            "mean_intensity double, features array<float>"
        ),
    )


def embed_media(
    df: DataFrame,
    feature_col: str = "features",
    id_col: str = "media_id",
    out_dim: int = 16,
) -> DataFrame:
    """Features → embedding via a broadcast projection matrix — the batch
    shape of CLIP encode_images (flickr30k_clip.ipynb cell 6): broadcast
    model weights once per executor, Arrow batches through it. The 'model'
    is a deterministic LCG projection (container has no torch); swap
    ``W`` for real weights and the plumbing is unchanged."""
    from vectordbindexing_spark.functions.hashing import lcg_planes_np

    spark = df.sparkSession
    first = df.select(F.size(feature_col).alias("d")).limit(1).collect()
    d_in = int(first[0]["d"]) if first else 0
    W = lcg_planes_np(out_dim, max(d_in, 1))
    bc = spark.sparkContext.broadcast(W)

    def embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Wb = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[feature_col]])
            E = X @ Wb.T
            n = np.linalg.norm(E, axis=1, keepdims=True)
            E = E / np.maximum(n, 1e-12)
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].to_numpy(),
                    "embedding": [row.astype("float32").tolist() for row in E],
                }
            )

    return df.select(id_col, feature_col).mapInPandas(
        embed, schema="media_id long, embedding array<float>"
    )
