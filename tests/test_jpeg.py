"""Vendored baseline-JPEG codec (io/jpeg.py): encode→decode round-trips,
spec-edge behavior (odd dims, restart markers, flat blocks, unsupported
modes), and the Spark multimodal path over real JPEG bytes."""

import numpy as np
import pytest

from vectordbindexing_spark.io.jpeg import decode_jpeg, encode_jpeg


def _smooth(h, w, seed=0):
    yy, xx = np.mgrid[0:h, 0:w]
    return (
        (128 + 80 * np.sin(xx / 18.0 + seed) + 40 * np.cos(yy / 11.0))
        .clip(0, 255)
        .astype(np.uint8)
    )


def test_gray_roundtrip_low_loss():
    img = _smooth(40, 56)
    dec = decode_jpeg(encode_jpeg(img, quality=95))
    assert dec.shape == img.shape and dec.dtype == np.uint8
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 3 and err.mean() < 1.0


def test_rgb_roundtrip_low_loss():
    g = _smooth(40, 56)
    rgb = np.stack([g, np.roll(g, 5, 0), 255 - g], axis=2)
    dec = decode_jpeg(encode_jpeg(rgb, quality=95))
    assert dec.shape == rgb.shape
    err = np.abs(dec.astype(int) - rgb.astype(int))
    assert err.max() <= 8 and err.mean() < 1.5


def test_flat_image_exact():
    flat = np.full((16, 24), 77, dtype=np.uint8)
    assert (decode_jpeg(encode_jpeg(flat, quality=90)) == 77).all()


def test_odd_dimensions_cropped():
    # 13x21: MCU grid pads to 16x24; decode must crop back
    img = _smooth(13, 21, seed=2)
    dec = decode_jpeg(encode_jpeg(img, quality=95))
    assert dec.shape == (13, 21)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 3


def test_restart_markers_roundtrip():
    img = _smooth(32, 48, seed=1)
    buf = encode_jpeg(img, quality=95, restart_interval=3)
    assert b"\xff\xdd" in buf  # DRI segment present
    assert any(bytes([0xFF, 0xD0 + n]) in buf for n in range(8))
    dec = decode_jpeg(buf)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 3


def test_quality_monotone():
    img = _smooth(40, 40, seed=3)
    hi = decode_jpeg(encode_jpeg(img, quality=95)).astype(int)
    lo = decode_jpeg(encode_jpeg(img, quality=20)).astype(int)
    e_hi = np.abs(hi - img.astype(int)).mean()
    e_lo = np.abs(lo - img.astype(int)).mean()
    assert e_hi < e_lo
    assert len(encode_jpeg(img, quality=20)) < len(encode_jpeg(img, quality=95))


def test_rejects_non_jpeg_and_arithmetic():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"P6 1 1 255 abc")
    # fake a SOF9 (arithmetic sequential) frame header — still rejected
    buf = bytearray(encode_jpeg(np.zeros((8, 8), dtype=np.uint8)))
    idx = buf.find(b"\xff\xc0")
    buf[idx + 1] = 0xC9
    with pytest.raises(ValueError, match="SOF9"):
        decode_jpeg(bytes(buf))
    # a SOF2 marker glued onto a baseline (full-band) scan is now parsed
    # as progressive and must fail script validation, not desync
    buf[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive scan"):
        decode_jpeg(bytes(buf))


def test_spark_decode_image_features_jpeg(spark):
    from vectordbindexing_spark.operators.multimodal import (
        decode_image_features,
        embed_media,
    )

    rows = [
        (i, "image", encode_jpeg(_smooth(24, 24, seed=i), quality=90),
         "image/jpeg")
        for i in range(12)
    ]
    df = spark.createDataFrame(
        rows, schema="media_id long, kind string, content binary, mime string"
    )
    feats = decode_image_features(df, decoder="jpeg")
    fr = feats.collect()
    assert len(fr) == 12
    assert all(r["width"] == 24 and r["height"] == 24 for r in fr)
    assert all(abs(sum(r["features"]) - 1.0) < 1e-5 for r in fr)
    # luminance means must track the (decoded) source images
    for r in fr:
        src = decode_jpeg(bytes(rows[r["media_id"]][2])).astype(np.float64)
        assert abs(r["mean_intensity"] - src.mean()) < 1e-9
    emb = embed_media(feats).collect()
    assert len(emb) == 12 and all(len(r["embedding"]) == 16 for r in emb)


def test_420_subsampling_roundtrip():
    """4:2:0 exercises interleaved multi-block MCUs (2x2 Y + Cb + Cr) and
    the decoder's chroma upsampling; chroma is box-averaged so tolerance
    is wider than 4:4:4 but luma must stay tight."""
    g = _smooth(37, 45, seed=4)  # odd dims: MCU grid pads to 48x48
    rgb = np.stack([g, np.roll(g, 5, 0), 255 - g], axis=2)
    buf = encode_jpeg(rgb, quality=95, subsample="420")
    dec = decode_jpeg(buf)
    assert dec.shape == rgb.shape
    # smaller than 4:4:4 at the same quality (half the chroma blocks)
    assert len(buf) < len(encode_jpeg(rgb, quality=95, subsample="444"))
    y = lambda a: (0.299 * a[..., 0] + 0.587 * a[..., 1]  # noqa: E731
                   + 0.114 * a[..., 2])
    assert np.abs(y(dec.astype(float)) - y(rgb.astype(float))).mean() < 2.0
    assert np.abs(dec.astype(int) - rgb.astype(int)).mean() < 12
    with pytest.raises(ValueError, match="subsample"):
        encode_jpeg(rgb, subsample="422")


def test_stuffed_ff_before_restart_marker_decodes():
    """If the final padded entropy byte before an RSTn is 0xFF the writer
    emits it as a stuffed FF 00 pair; the decoder's RST scan must step
    over stuffed pairs rather than stopping at the first 0xFF (the old
    scan then re-consumed the stuffed byte as entropy data and desynced).
    Constructed deterministically: splice a stuffed pair directly before
    a real RST marker — byte-identical to the pad-byte-was-FF case from
    the decoder's point of view — and require identical pixels."""
    img = _smooth(32, 48, seed=1)
    buf = encode_jpeg(img, quality=95, restart_interval=3)
    sos = buf.find(b"\xff\xda")
    rst = -1
    for n in range(8):
        p = buf.find(bytes([0xFF, 0xD0 + n]), sos)
        if p != -1 and (rst == -1 or p < rst):
            rst = p
    assert rst != -1
    spliced = buf[:rst] + b"\xff\x00" + buf[rst:]
    np.testing.assert_array_equal(decode_jpeg(spliced), decode_jpeg(buf))


def test_align_and_skip_rst_steps_over_stuffed_pairs():
    """Unit pin of the marker scan: entropy byte, stuffed FF 00 pair,
    then RST3 — the scan must land past the marker, not on the stuffed
    pair."""
    from vectordbindexing_spark.io.jpeg import _BitReader

    data = b"\x12\x34\xff\x00\xff\xd3\xab"
    r = _BitReader(data, 0)
    r.read_bits(4)  # consumes byte 0, pos -> 1
    r.align_and_skip_rst()
    assert r.pos == 6  # past 0x34, the stuffed pair, and FF D3
    assert r.read_bits(8) == 0xAB


def test_unexpected_restart_marker_is_value_error():
    """RSTn mid-entropy-data with no DRI declared = malformed stream; the
    decoder must surface ValueError, not leak the internal _RestartMarker
    control-flow exception."""
    img = _smooth(32, 48, seed=1)
    buf = encode_jpeg(img, quality=95, restart_interval=3)
    dri = buf.find(b"\xff\xdd")
    assert dri != -1
    stripped = buf[:dri] + buf[dri + 6:]  # drop the DRI segment
    with pytest.raises(ValueError):
        decode_jpeg(stripped)


def test_scan_jpeg_kind_triage():
    """Marker sniff must classify baseline vs progressive vs arithmetic
    vs non-JPEG without decoding — the routing column that keeps
    unsupported coding processes out of decode_jpeg."""
    from vectordbindexing_spark.io.jpeg import scan_jpeg_kind

    img = _smooth(16, 16)
    base = encode_jpeg(img, quality=90)
    assert scan_jpeg_kind(base) == "baseline"

    prog = bytearray(base)
    idx = prog.find(b"\xff\xc0")
    prog[idx + 1] = 0xC2
    assert scan_jpeg_kind(bytes(prog)) == "progressive"
    arith = bytearray(base)
    arith[idx + 1] = 0xC9
    assert scan_jpeg_kind(bytes(arith)) == "arith_sequential"

    assert scan_jpeg_kind(b"P6 1 1 255 xxx") == "not_jpeg"
    assert scan_jpeg_kind(b"") == "not_jpeg"
    # SOI but truncated before any SOF
    assert scan_jpeg_kind(base[:4]) == "unknown"
    # sniff must agree with the decoder's accept/reject behavior:
    # arithmetic-coded processes stay rejected
    with pytest.raises(ValueError, match="SOF9"):
        decode_jpeg(bytes(arith))


def test_media_kind_routes_decode(spark):
    """media_kind over a mixed binary column: progressive rows are
    triaged out, the baseline remainder decodes without error."""
    from vectordbindexing_spark.operators.multimodal import (
        decode_image_features,
        media_kind,
    )

    img = _smooth(16, 16, seed=4)
    base = encode_jpeg(img, quality=90)
    prog = bytearray(base)
    idx = prog.find(b"\xff\xc0")
    prog[idx + 1] = 0xC2
    rows = [
        (1, bytearray(base)),
        (2, bytearray(bytes(prog))),
        (3, bytearray(b"garbage-bytes")),
    ]
    df = spark.createDataFrame(rows, schema="media_id long, content binary")
    kinds = {r["media_id"]: r["kind"] for r in media_kind(df).collect()}
    assert kinds == {1: "baseline", 2: "progressive", 3: "not_jpeg"}
    from pyspark.sql import functions as F

    triaged = df.join(
        media_kind(df).filter(F.col("kind") == "baseline").select("media_id"),
        "media_id",
    )
    out = decode_image_features(triaged, decoder="jpeg").collect()
    assert [r["media_id"] for r in out] == [1]
    assert out[0]["width"] == 16 and out[0]["height"] == 16
