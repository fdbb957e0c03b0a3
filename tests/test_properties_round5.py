"""Hypothesis property tests for the round-5 numeric kernels: blocked
probe selection, blocked centroid assignment, JPEG triage robustness,
and codec round-trips under randomized shapes/qualities/restart
intervals. All driver-side numpy — no SparkSession."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(
    n_q=st.integers(1, 40),
    nlist=st.integers(1, 17),
    nprobe=st.integers(1, 6),
    seed=st.integers(0, 2**31 - 1),
)
def test_probe_selection_matches_bruteforce(n_q, nlist, nprobe, seed):
    from vectordbindexing_spark.operators.ivfpq import _probes_and_luts

    rng = np.random.default_rng(seed)
    d, m, ks = 8, 2, 4
    Q = rng.normal(size=(n_q, d))
    cents = rng.normal(size=(nlist, d))
    if nlist >= 3:  # exercise exact ties
        cents[nlist - 1] = cents[0]
    books = rng.normal(size=(m, ks, d // m))
    probes_of, luts = _probes_and_luts(Q, cents, books, nprobe)
    npb = min(nprobe, nlist)
    d2 = (
        np.sum(Q * Q, axis=1)[:, None]
        - 2 * Q @ cents.T
        + np.sum(cents * cents, axis=1)[None, :]
    )
    for qi in range(n_q):
        want = set(np.lexsort((np.arange(nlist), d2[qi]))[:npb].tolist())
        got = {c for c, qs in probes_of.items() if qi in qs}
        assert got == want
    # every probing query appears exactly npb times across all cells
    total = sum(len(v) for v in probes_of.values())
    assert total == n_q * npb


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 200),
    k=st.integers(1, 30),
    seed=st.integers(0, 2**31 - 1),
)
def test_blocked_argmin_matches_dense(n, k, seed):
    from vectordbindexing_spark.operators.ivf import _argmin_d2_blocked

    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, 6))
    C = rng.normal(size=(k, 6))
    dense = np.argmin(
        np.sum(X * X, axis=1)[:, None] - 2 * X @ C.T
        + np.sum(C * C, axis=1)[None, :],
        axis=1,
    )
    np.testing.assert_array_equal(_argmin_d2_blocked(X, C), dense)


_KNOWN_KINDS = {
    "not_jpeg", "unknown", "baseline", "extended_sequential", "progressive",
    "lossless", "diff_sequential", "diff_progressive", "diff_lossless",
    "arith_sequential", "arith_progressive", "arith_lossless",
    "arith_diff_sequential", "arith_diff_progressive", "arith_diff_lossless",
}


@settings(max_examples=200, deadline=None)
@given(buf=st.binary(max_size=300))
def test_scan_jpeg_kind_total_on_arbitrary_bytes(buf):
    """The triage sniff must be TOTAL: any byte string classifies without
    raising (it runs before validation in corpus pipelines)."""
    from vectordbindexing_spark.io.jpeg import scan_jpeg_kind

    assert scan_jpeg_kind(buf) in _KNOWN_KINDS


@settings(max_examples=200, deadline=None)
@given(buf=st.binary(max_size=300))
def test_scan_jpeg_kind_total_with_soi_prefix(buf):
    from vectordbindexing_spark.io.jpeg import scan_jpeg_kind

    assert scan_jpeg_kind(b"\xff\xd8" + buf) in _KNOWN_KINDS


@settings(max_examples=10, deadline=None)
@given(
    h=st.integers(8, 24),
    w=st.integers(8, 24),
    quality=st.integers(30, 95),
    restart=st.integers(0, 4),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_roundtrip_property(h, w, quality, restart, seed):
    """decode(encode(img)) preserves shape/dtype and stays within the
    quantization error envelope for smooth images, across random dims
    (incl. non-multiple-of-8), qualities, and restart intervals."""
    from vectordbindexing_spark.io.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = (
        128.0
        + 60 * np.sin(xx / (3.0 + rng.uniform(0, 20)))
        + 50 * np.cos(yy / (3.0 + rng.uniform(0, 20)))
    ).clip(0, 255).astype(np.uint8)
    buf = encode_jpeg(img, quality=quality, restart_interval=restart)
    dec = decode_jpeg(buf)
    assert dec.shape == img.shape and dec.dtype == np.uint8
    err = np.abs(dec.astype(int) - img.astype(int)).mean()
    assert err < 30.0  # smooth content stays in the quant-error envelope
    from vectordbindexing_spark.io.jpeg import scan_jpeg_kind

    assert scan_jpeg_kind(buf) == "baseline"


@settings(max_examples=15, deadline=None)
@given(
    h=st.integers(8, 24),
    w=st.integers(8, 24),
    quality=st.integers(30, 95),
    gray=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_progressive_equals_sequential_property(h, w, quality, gray, seed):
    """The structural pin of the progressive codec, under randomized
    shapes/qualities/content: progressive and sequential encodes carry
    identical quantized coefficients, so decodes must be bit-identical
    — including high-entropy images where every AC band is active."""
    from vectordbindexing_spark.io.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    seq = decode_jpeg(encode_jpeg(img, quality=quality))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=quality))
    np.testing.assert_array_equal(prog, seq)


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 60),
    d=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
)
def test_sq8_decode_error_envelope_property(n, d, seed):
    """SQ8 encode/decode: codes in [0,255], reconstruction within half a
    quantization step per dim, constant dims exact — for arbitrary
    scales per dimension (incl. tiny and huge spans)."""
    from vectordbindexing_spark.operators.sq import (
        _sq8_params,
        sq8_decode_np,
        sq8_encode_np,
    )

    rng = np.random.default_rng(seed)
    scale = 10.0 ** rng.uniform(-6, 6, size=d)
    X = rng.normal(size=(n, d)) * scale
    X[:, 0] = X[0, 0]  # force one constant dim
    mins, maxs = X.min(axis=0), X.max(axis=0)
    scales, invs = _sq8_params(mins, maxs)
    codes = sq8_encode_np(X, mins, scales)
    assert codes.min() >= 0 and codes.max() <= 255
    dec = sq8_decode_np(codes, mins, invs)
    step = (maxs - mins) / 255.0
    assert (np.abs(dec - X) <= step / 2 + 1e-9 * np.abs(X).max()).all()
    np.testing.assert_array_equal(dec[:, 0], X[:, 0])


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 50),
    d=st.integers(1, 100),
    seed=st.integers(0, 2**31 - 1),
)
def test_bq_hamming_metric_properties(n, d, seed):
    """Packed-word Hamming distance is a metric on the bit codes:
    symmetric, zero iff codes equal, triangle inequality — and equals
    the unpacked sign-disagreement count for arbitrary d (incl. partial
    last words)."""
    from vectordbindexing_spark.operators.bq import _popcount, bq_encode_np

    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d))
    thr = rng.normal(size=d)
    W = bq_encode_np(X, thr)

    def ham(a, b):
        return int(_popcount(a ^ b).sum())

    bits = X >= thr
    for _ in range(min(10, n * n)):
        i, j, l = rng.integers(0, n, size=3)
        dij = ham(W[i], W[j])
        assert dij == int((bits[i] != bits[j]).sum())
        assert dij == ham(W[j], W[i])
        assert (dij == 0) == bool((bits[i] == bits[j]).all())
        assert dij <= ham(W[i], W[l]) + ham(W[l], W[j])


@settings(max_examples=20, deadline=None)
@given(
    n_docs=st.integers(0, 40),
    seq_len=st.integers(1, 64),
    n_shards=st.integers(1, 6),
    seed=st.integers(0, 2**31 - 1),
)
def test_packing_invariants_property(n_docs, seq_len, n_shards, seed):
    """Packing coordinates replayed in pure python: per-shard intervals
    are gapless and ordered, window indices consistent, totals
    conserved — for arbitrary token counts including zeros."""
    import hashlib

    rng = np.random.default_rng(seed)
    toks = {i: int(rng.integers(0, 30)) for i in range(n_docs)}

    def h64(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)

    shards: dict[int, list[int]] = {}
    for i in toks:
        shards.setdefault(h64(i) % n_shards, []).append(i)
    for shard, ids in shards.items():
        ids.sort(key=lambda i: (h64(i), i))
        pos = 0
        for i in ids:
            start, end = pos, pos + toks[i]
            seq_first = start // seq_len
            seq_last = (end - 1) // seq_len if toks[i] else start // seq_len
            assert seq_last >= seq_first >= 0
            # a doc spans at most ceil(n/L)+1 windows
            assert seq_last - seq_first <= toks[i] // seq_len + 1
            pos = end
        assert pos == sum(toks[i] for i in ids)
