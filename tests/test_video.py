"""MJPEG-AVI container + video-features contract: frame round-trips
through the RIFF tree, static-vs-moving motion signal, triage, and the
Spark end-to-end path."""

from __future__ import annotations

import numpy as np
import pytest

from vectordbindexing_spark.io.avi import decode_avi_mjpeg, encode_avi_mjpeg
from vectordbindexing_spark.io.jpeg import decode_jpeg, encode_jpeg


def _frame(seed, shift=0):
    yy, xx = np.mgrid[0:16, 0:16]
    return (
        (128 + 70 * np.sin(xx / 5.0 + seed + shift) + 40 * np.cos(yy / 7.0))
        .clip(0, 255)
        .astype(np.uint8)
    )


def test_container_roundtrip_bytes_exact():
    frames = [encode_jpeg(_frame(0, s), quality=85) for s in range(4)]
    buf = encode_avi_mjpeg(frames, fps=12, width=16, height=16)
    fps, w, h, got = decode_avi_mjpeg(buf)
    assert (fps, w, h) == (pytest.approx(12, rel=1e-3), 16, 16)
    assert got == frames  # container is lossless on frame payloads
    # odd-length frame payloads must round-trip (RIFF even padding)
    odd = [b"\xff\xd8" + b"x" * 7 + b"\xff\xd9"]
    assert decode_avi_mjpeg(
        encode_avi_mjpeg(odd, fps=1, width=1, height=1)
    )[3] == odd


def test_rejects_non_avi():
    with pytest.raises(ValueError, match="RIFF/AVI"):
        decode_avi_mjpeg(b"not a container")
    from vectordbindexing_spark.io.wav import encode_wav

    with pytest.raises(ValueError, match="RIFF/AVI"):
        decode_avi_mjpeg(encode_wav(np.zeros(16), 8000))


def test_motion_separates_static_from_moving(spark):
    from vectordbindexing_spark.operators.multimodal import video_features

    static = [encode_jpeg(_frame(1, 0), quality=90)] * 4
    moving = [encode_jpeg(_frame(1, s), quality=90) for s in range(4)]
    rows = [
        (1, bytearray(encode_avi_mjpeg(static, 10, 16, 16))),
        (2, bytearray(encode_avi_mjpeg(moving, 10, 16, 16))),
        (3, None),
    ]
    df = spark.createDataFrame(rows, schema="media_id long, content binary")
    out = {r["media_id"]: r for r in video_features(df).collect()}
    assert set(out) == {1, 2}  # null excluded
    assert out[1]["motion"] == 0.0  # identical frames decode identically
    assert out[2]["motion"] > 1.0
    assert out[1]["n_frames"] == 4 and out[1]["width"] == 16
    assert out[1]["duration_s"] == pytest.approx(0.4, abs=1e-6)


def test_media_kind_sniffs_avi(spark):
    from vectordbindexing_spark.operators.multimodal import media_kind

    clip = encode_avi_mjpeg(
        [encode_jpeg(_frame(2), quality=80)], 10, 16, 16
    )
    df = spark.createDataFrame(
        [(1, bytearray(clip))], schema="media_id long, content binary"
    )
    assert media_kind(df).collect()[0]["kind"] == "avi"


def test_entry_query_runs_deterministic(spark):
    import __spark_entry__ as entry

    fn = entry.queries()["media_video_stats"]
    a = sorted(map(tuple, fn(spark, "/root/testdata/sf0.001").collect()))
    assert len(a) == 32
    assert all(r[1] in (3, 4, 5) for r in a)  # n_frames = 3 + id%3
    b = sorted(map(tuple, fn(spark, "/root/testdata/sf0.001").collect()))
    assert a == b
    # moving clips (id%4 != 0 shifts the gradient) show motion; the
    # id%4==0 clips repeat one frame and must sit at exactly zero
    static_ids = {r[0] for r in a if r[0] % 4 == 0}
    for r in a:
        if r[0] in static_ids:
            assert r[7] == 0.0
        else:
            assert r[7] > 0.0
