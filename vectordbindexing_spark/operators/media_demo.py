"""Deterministic per-id media fixtures shared by the media entry
queries and their pinned-literal DuckDB oracles.

The media contract queries synthesize a clip per ``doc_id`` (seeded by
the id alone), push it through the real vendored codecs (io/jpeg.py,
io/wav.py, io/avi.py), and reduce to typed stats. Because every output
row is a pure function of the id, the oracle can precompute the
expected row for each id driver-side — by running the SAME code — and
embed the results as SQL literals joined to the documents table (the
trained-state pinning technique the k-means/PQ oracles use via
EMB_DISCRIMINATOR_SQL). That upgrades the three media queries from
rows-only checks to full row+schema+hash gates.

Both the Spark kernels (executor Python) and the oracle precompute
(driver Python) call these functions, so the values agree bit-exactly:
same numpy, same codec, same machine — no cross-engine float drift to
absorb.

Reference parity: the fixtures stand in for the JPEG/audio files the
reference's flickr30k_clip.ipynb ingests (cell 6: image files → batch
decode → features); the decode stage here is real, the CLIP model
itself remains a deployment drop-in (no torch in this container).
"""

from __future__ import annotations

import numpy as np


def jpeg_demo_stats(did: int) -> dict:
    """Synthesize the per-id 24×24 gradient frame, JPEG-encode it
    (baseline for even ids, progressive SOF2 for odd), decode with the
    vendored codec, and return the stats row the jpeg contract query
    emits."""
    from vectordbindexing_spark.io.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    did = int(did)
    yy, xx = np.mgrid[0:24, 0:24]
    img = (
        (128 + 80 * np.sin(xx / 18.0 + did) + 40 * np.cos(yy / 11.0))
        .clip(0, 255)
        .astype(np.uint8)
    )
    enc = encode_jpeg if did % 2 == 0 else encode_jpeg_progressive
    buf = enc(img, quality=90)
    dec = decode_jpeg(buf)
    return {
        "doc_id": did,
        "width": int(dec.shape[1]),
        "height": int(dec.shape[0]),
        "mean_intensity": round(float(dec.mean()), 4),
        "jpeg_bytes": len(buf),
    }


def wav_demo_clip(mid: int) -> bytes:
    """Per-id 0.25 s mono tone (seeded frequency/amplitude), encoded as
    RIFF PCM — 16-bit for even ids, 8-bit for odd."""
    from vectordbindexing_spark.io.wav import encode_wav

    mid = int(mid)
    rate = 8000
    t = np.arange(int(rate * 0.25)) / rate
    f = 200.0 + 40.0 * (mid % 32)
    a = 0.2 + 0.7 * ((mid % 7) / 7.0)
    wave = a * np.sin(2 * np.pi * f * t)
    return encode_wav(wave, rate, bits=16 if mid % 2 == 0 else 8)


def wav_demo_stats(mid: int) -> dict:
    """Expected audio_features row for :func:`wav_demo_clip` — the
    decode + feature path of operators.multimodal.audio_features."""
    from vectordbindexing_spark.io.wav import audio_features_np, decode_wav

    rate, x = decode_wav(wav_demo_clip(mid))
    return {"media_id": int(mid), **audio_features_np(rate, x)}


def video_demo_clip(mid: int) -> bytes:
    """Per-id short MJPEG-AVI clip (3-5 drifting-gradient 16×16
    frames, JPEG-encoded, RIFF AVI container)."""
    from vectordbindexing_spark.io.avi import encode_avi_mjpeg
    from vectordbindexing_spark.io.jpeg import encode_jpeg

    m = int(mid)
    yy, xx = np.mgrid[0:16, 0:16]
    frames = []
    for fi in range(3 + m % 3):
        img = (
            (128 + 70 * np.sin(xx / 5.0 + m + fi * (m % 4))
             + 40 * np.cos(yy / 7.0))
            .clip(0, 255)
            .astype(np.uint8)
        )
        frames.append(encode_jpeg(img, quality=90))
    return encode_avi_mjpeg(frames, fps=10, width=16, height=16)


def video_demo_stats(mid: int) -> dict:
    """Expected video_features row for :func:`video_demo_clip`."""
    from vectordbindexing_spark.operators.multimodal import (
        video_feature_row,
    )

    return video_feature_row(int(mid), video_demo_clip(mid))
