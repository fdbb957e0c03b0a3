"""Multimodal column operators — opaque binary media columns with typed
metadata, processed via Arrow-batched kernels.

Mirrors the reference's CLIP ingestion path (flickr30k_clip.ipynb cell 6:
image files + captions → 512-d embeddings, batch inference with a broadcast
model) in Spark-native form: binary column + ``mapInPandas`` decode /
feature-extract / embed stages. Decoders:

- ``decoder="ppm"`` — REAL decode of binary P6 PPM images (vendored
  pure-python parser, no external libs; runs in CI).
- ``decoder="jpeg"`` — REAL decode of baseline JPEG (vendored pure-numpy
  ITU-T T.81 sequential-DCT decoder, ``io/jpeg.py``; round-trip-tested
  against its paired encoder). Progressive/arithmetic JPEG and other
  compressed formats (PNG/WebP) still need a native lib — register
  another ``_DECODERS`` entry at deployment; the dataflow (schema,
  batching, partitioning, UDF signature) is unchanged.
- ``decoder="fake"`` — deterministic bytes-derived pseudo-decode for
  plumbing tests on arbitrary binary payloads.
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


def _decode_ppm(buf: bytes) -> np.ndarray:
    """Real decoder for binary P6 PPM: ASCII header (magic, width, height,
    maxval — '#' comments allowed) then raw RGB triplets. Returns the
    luminance grid (channel mean) as float64 in [0, 255]."""
    toks: list[bytes] = []
    i = 0
    while len(toks) < 4 and i < len(buf):
        while i < len(buf) and buf[i : i + 1].isspace():
            i += 1
        if buf[i : i + 1] == b"#":
            while i < len(buf) and buf[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(buf) and not buf[j : j + 1].isspace():
            j += 1
        toks.append(buf[i:j])
        i = j
    if len(toks) < 4 or toks[0] != b"P6":
        raise ValueError("not a binary (P6) PPM image")
    w, h, maxval = int(toks[1]), int(toks[2]), int(toks[3])
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    data = np.frombuffer(buf, dtype=np.uint8, count=w * h * 3, offset=i + 1)
    rgb = data.reshape(h, w, 3).astype(np.float64)
    return rgb.mean(axis=2)


def _decode_jpeg_luma(buf: bytes) -> np.ndarray:
    """Huffman DCT JPEG (baseline SOF0 or progressive SOF2) → luminance
    grid (channel mean, like the PPM decoder) as float64 in [0, 255].
    Vendored pure-numpy T.81 decoder — see io/jpeg.py."""
    from vectordbindexing_spark.io.jpeg import decode_jpeg

    img = decode_jpeg(buf).astype(np.float64)
    return img.mean(axis=2) if img.ndim == 3 else img


_DECODERS = {"fake": _fake_decode, "ppm": _decode_ppm, "jpeg": _decode_jpeg_luma}


def register_decoder(name: str, fn) -> None:
    """Deployment hook for codecs the container lacks (arithmetic/12-bit
    JPEG, PNG/WebP via PIL, MP3/AAC via ffmpeg): ``fn(buf: bytes) ->
    np.ndarray`` (2-D luma/sample grid). The registered decoder rides
    the same mapInPandas dataflow — schema, Arrow batching,
    partitioning are decoder-agnostic, and the function is
    cloudpickled to executors with the kernel closure, so a plain
    module-level or locally-defined callable works. Overwriting an
    existing name is allowed (deployments shadow the vendored
    pure-python decoders with native ones)."""
    if not callable(fn):
        raise TypeError(f"decoder {name!r} must be callable")
    _DECODERS[name] = fn


def decode_image_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    decoder: str = "fake",
) -> DataFrame:
    """binary → (media_id, width, height, mean_intensity, features[8]).

    ``decoder='ppm'`` really decodes P6 PPM bytes; ``'fake'`` exercises the
    identical dataflow on arbitrary binary payloads. Compressed formats:
    add a ``_DECODERS`` entry backed by PIL/ffmpeg at deployment — the
    dataflow is decoder-agnostic.
    """
    if decoder not in _DECODERS:
        raise ValueError(
            f"unknown decoder {decoder!r}; available: {sorted(_DECODERS)}"
        )
    decode = _DECODERS[decoder]

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, means, feats = [], [], [], [], []
            for mid, buf in zip(pdf[id_col], pdf[content_col]):
                img = decode(bytes(buf))
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

    # null payloads are excluded (same contract as NULL vectors in the
    # KNN family — nothing to decode), and the filter pushes to the scan
    return df.filter(F.col(content_col).isNotNull()).select(
        id_col, content_col
    ).mapInPandas(
        extract,
        schema=(
            "media_id long, width int, height int, "
            "mean_intensity double, features array<float>"
        ),
    )


def load_projection_weights(
    weights: "str | np.ndarray",
) -> tuple[np.ndarray, np.ndarray | None]:
    """Resolve ``embed_media`` weights: an ndarray passes through; a path
    loads driver-side — ``.npy`` (the matrix alone) or ``.npz`` with key
    ``W`` and optional bias ``b``. This is the deployment drop-in for a
    real encoder head: export the trained projection (e.g. CLIP's
    ``visual.proj``) with ``np.savez(path, W=W, b=b)`` and pass the
    path; no torch needed at serving time for the matmul head."""
    if isinstance(weights, str):
        loaded = np.load(weights)
        if hasattr(loaded, "files"):  # npz archive
            W = np.asarray(loaded["W"], dtype=np.float64)
            b = (
                np.asarray(loaded["b"], dtype=np.float64)
                if "b" in loaded.files
                else None
            )
            return W, b
        return np.asarray(loaded, dtype=np.float64), None
    return np.asarray(weights, dtype=np.float64), None


def embed_media(
    df: DataFrame,
    feature_col: str = "features",
    id_col: str = "media_id",
    out_dim: int = 16,
    weights: "str | np.ndarray | None" = None,
) -> DataFrame:
    """Features → embedding via a broadcast projection matrix — the batch
    shape of CLIP encode_images (flickr30k_clip.ipynb cell 6): broadcast
    model weights once per executor, Arrow batches through it.

    ``weights`` swaps in real model weights: an (out_dim × d_in) ndarray,
    or a ``.npy``/``.npz`` file path (:func:`load_projection_weights` —
    npz key ``W``, optional bias ``b``); ``out_dim`` is then taken from
    the matrix. Default (None) is the deterministic LCG projection (the
    container has no torch) — the dataflow is identical either way,
    which is the point: deploying the real encoder head is a file drop,
    not a code change (pinned by test_embed_media_file_weights)."""
    from vectordbindexing_spark.functions.hashing import lcg_planes_np

    spark = df.sparkSession
    first = df.select(F.size(feature_col).alias("d")).limit(1).collect()
    d_in = int(first[0]["d"]) if first else 0
    if weights is None:
        W, b = lcg_planes_np(out_dim, max(d_in, 1)), None
    else:
        W, b = load_projection_weights(weights)
        if d_in and W.shape[1] != d_in:
            raise ValueError(
                f"weights are ({W.shape[0]}×{W.shape[1]}) but "
                f"{feature_col!r} has {d_in} features"
            )
    bc = spark.sparkContext.broadcast((W, b))

    def embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Wb, bb = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[feature_col]])
            E = X @ Wb.T
            if bb is not None:
                E = E + bb
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


def audio_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """binary WAV → (media_id, sample_rate, n_samples, duration_s, rms,
    zero_cross_rate, spectral_centroid_hz) — the audio leg of the
    multimodal ingest path, REAL through PCM (vendored io/wav.py, like
    the image leg's PPM/JPEG). Compressed audio (MP3/AAC/Opus) is
    triaged by :func:`media_kind` to a deployment decoder. Null
    payloads are excluded (same contract as the image path)."""
    from vectordbindexing_spark.io.wav import audio_features_np, decode_wav

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, buf in zip(pdf[id_col], pdf[content_col]):
                rate, x = decode_wav(bytes(buf))
                rows.append({"media_id": mid, **audio_features_np(rate, x)})
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sample_rate", "n_samples", "duration_s",
                    "rms", "zero_cross_rate", "spectral_centroid_hz",
                ],
            )

    return (
        df.filter(F.col(content_col).isNotNull())
        .select(id_col, content_col)
        .mapInPandas(
            extract,
            schema=(
                "media_id long, sample_rate long, n_samples long, "
                "duration_s double, rms double, zero_cross_rate double, "
                "spectral_centroid_hz double"
            ),
        )
    )


def video_feature_row(mid: int, buf: bytes, frame_stride: int = 1) -> dict:
    """Per-clip body of :func:`video_features` (container walk + JPEG
    frame decode → frame/motion stats). Factored out so the media
    oracle can precompute expected rows driver-side with the exact
    code the executors run."""
    from vectordbindexing_spark.io.avi import decode_avi_mjpeg
    from vectordbindexing_spark.io.jpeg import decode_jpeg

    fps, _, _, frames = decode_avi_mjpeg(buf)
    sampled = []
    for fb in frames[:: max(1, frame_stride)]:
        img = decode_jpeg(fb).astype(np.float64)
        sampled.append(img.mean(axis=2) if img.ndim == 3 else img)
    diffs = [
        float(np.abs(b - a).mean())
        for a, b in zip(sampled, sampled[1:])
    ]
    return {
        "media_id": int(mid),
        "n_frames": len(frames),
        "fps": round(fps, 3),
        "duration_s": round(len(frames) / fps if fps else 0.0, 6),
        "width": sampled[0].shape[1],
        "height": sampled[0].shape[0],
        "mean_luma": round(
            float(np.mean([s.mean() for s in sampled])), 4
        ),
        "motion": round(float(np.mean(diffs)) if diffs else 0.0, 4),
    }


def video_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    frame_stride: int = 1,
) -> DataFrame:
    """binary MJPEG-AVI → (media_id, n_frames, fps, duration_s, width,
    height, mean_luma, motion) — the video leg of the multimodal path,
    REAL through the RIFF container (io/avi.py) and the vendored JPEG
    frame decode. ``motion`` is the mean absolute luma difference
    between consecutive SAMPLED frames (stride ``frame_stride``) — the
    cheap static-vs-moving triage signal; width/height/mean_luma come
    from the decoded samples. Inter-coded video routes to a deployment
    decoder via :func:`media_kind`."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                video_feature_row(int(mid), bytes(buf), frame_stride)
                for mid, buf in zip(pdf[id_col], pdf[content_col])
            ]
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_frames", "fps", "duration_s",
                    "width", "height", "mean_luma", "motion",
                ],
            )

    return (
        df.filter(F.col(content_col).isNotNull())
        .select(id_col, content_col)
        .mapInPandas(
            extract,
            schema=(
                "media_id long, n_frames long, fps double, "
                "duration_s double, width int, height int, "
                "mean_luma double, motion double"
            ),
        )
    )


def media_kind(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """Triage column for media routing: (media_id, kind, n_bytes) where
    ``kind`` is 'ppm', 'wav' (RIFF/WAVE), a JPEG coding process from
    :func:`io.jpeg.scan_jpeg_kind` ('baseline', 'progressive',
    'arith_sequential', ...), or 'not_jpeg'. Header-bytes-only sniff (no
    decode), so a corpus pass costs one scan of marker prefixes; the
    canonical use is ``filter(kind.isin('baseline', 'progressive'))``
    (both decode via the vendored codec) before decode_image_features
    and shipping the rest — arithmetic-coded, lossless, 12-bit — to the
    deployment decoder instead of erroring mid-job."""
    from vectordbindexing_spark.io.jpeg import scan_jpeg_kind

    def sniff(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            kinds, sizes = [], []
            for buf in pdf[content_col]:
                if buf is None:
                    # triage runs FIRST on messy corpora — a missing
                    # payload is a routable kind, not a crash
                    kinds.append("missing")
                    sizes.append(0)
                    continue
                b = bytes(buf)
                if b[:2] == b"P6":
                    kinds.append("ppm")
                elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                    kinds.append("wav")
                elif b[:4] == b"RIFF" and b[8:12] == b"AVI ":
                    kinds.append("avi")
                else:
                    kinds.append(scan_jpeg_kind(b))
                sizes.append(len(b))
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "kind": kinds,
                    "n_bytes": sizes,
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        sniff, schema="media_id long, kind string, n_bytes long"
    )
