"""Funnel steps ordering semantics + snapshot diff classification."""

from __future__ import annotations

import datetime as dt

import pytest

from vectordbindexing_spark.operators.diff import snapshot_diff
from vectordbindexing_spark.operators.events import funnel_steps


def _t(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, u, ty, ts) for i, (u, ty, ts) in enumerate(rows)],
        "event_id long, user_id long, event_type string, ts timestamp",
    )


def test_funnel_requires_order(spark):
    # user 1: click BEFORE view -> step 2 never fires
    # user 2: proper view -> click -> purchase
    ev = _ev(spark, [
        (1, "click", _t(1)), (1, "view", _t(5)),
        (2, "view", _t(1)), (2, "click", _t(3)), (2, "purchase", _t(9)),
    ])
    out = {r["user_id"]: r for r in
           funnel_steps(ev, ["view", "click", "purchase"]).collect()}
    assert out[1]["step_2_ts"] is None and out[1]["completed"] == 0
    assert out[2]["step_3_ts"] == _t(9) and out[2]["completed"] == 1


def test_funnel_equal_timestamp_counts(spark):
    ev = _ev(spark, [(1, "view", _t(4)), (1, "click", _t(4))])
    row = funnel_steps(ev, ["view", "click"]).collect()[0]
    assert row["step_2_ts"] == _t(4)


def test_funnel_first_touch_min(spark):
    # two views; the EARLIEST opens the click window
    ev = _ev(spark, [
        (1, "view", _t(8)), (1, "view", _t(2)), (1, "click", _t(5)),
    ])
    row = funnel_steps(ev, ["view", "click"]).collect()[0]
    assert row["step_1_ts"] == _t(2)
    assert row["step_2_ts"] == _t(5)


def test_funnel_no_step1_user_absent(spark):
    ev = _ev(spark, [(1, "click", _t(1))])
    assert funnel_steps(ev, ["view", "click"]).count() == 0


def test_funnel_needs_two_steps(spark):
    with pytest.raises(ValueError):
        funnel_steps(None, ["view"])


# ---------------- snapshot diff ----------------


def _tbl(spark, rows):
    return spark.createDataFrame(rows, "k long, a string, b double")


def test_diff_classification(spark):
    old = _tbl(spark, [(1, "x", 1.0), (2, "y", 2.0), (3, "z", 3.0)])
    new = _tbl(spark, [(2, "y", 2.0), (3, "Z", 3.0), (4, "w", 4.0)])
    got = {r["k"]: r["change"] for r in
           snapshot_diff(old, new, ["k"]).collect()}
    assert got == {1: "removed", 3: "changed", 4: "added"}


def test_diff_include_unchanged(spark):
    old = _tbl(spark, [(1, "x", 1.0)])
    new = _tbl(spark, [(1, "x", 1.0)])
    assert snapshot_diff(old, new, ["k"]).count() == 0
    got = snapshot_diff(old, new, ["k"], include_unchanged=True).collect()
    assert got[0]["change"] == "unchanged"


def test_diff_null_transitions_are_changes(spark):
    old = _tbl(spark, [(1, None, 1.0), (2, "y", None)])
    new = _tbl(spark, [(1, "x", 1.0), (2, "y", None)])
    got = {r["k"]: r["change"] for r in
           snapshot_diff(old, new, ["k"], include_unchanged=True).collect()}
    assert got == {1: "changed", 2: "unchanged"}  # NULL==NULL unchanged


def test_diff_restricted_compare_cols(spark):
    old = _tbl(spark, [(1, "x", 1.0)])
    new = _tbl(spark, [(1, "x", 99.0)])
    got = snapshot_diff(old, new, ["k"], compare_cols=["a"],
                        include_unchanged=True).collect()
    assert got[0]["change"] == "unchanged"  # b ignored


def test_diff_null_keys_match_nullsafe(spark):
    old = _tbl(spark, [(None, "x", 1.0), (1, "y", 2.0)])
    new = _tbl(spark, [(None, "x", 1.0), (1, "y", 9.0)])
    got = {r["k"]: r["change"] for r in
           snapshot_diff(old, new, ["k"], include_unchanged=True).collect()}
    # the NULL-keyed row matches itself (no phantom removed+added pair)
    assert got == {None: "unchanged", 1: "changed"}
