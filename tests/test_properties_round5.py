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
