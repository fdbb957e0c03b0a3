"""Staged-for-r08 relational queries (TPC-H-style q4/q13/q22 + cohort
retention): full driver-style DuckDB replays on the real tables, plus
semantic pins the SQL comparison alone can't see."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from vectordbindexing_spark import oracles
from vectordbindexing_spark.io.tables import load_table
from vectordbindexing_spark.operators.events import cohort_retention

STAGED = {
    "tpch_q4_late_orders": (
        entrymod._tpch_q4_late_orders, oracles.TPCH_Q4_SQL),
    "tpch_q13_order_distribution": (
        entrymod._tpch_q13_order_distribution, oracles.TPCH_Q13_SQL),
    "tpch_q22_idle_balances": (
        entrymod._tpch_q22_idle_balances, oracles.TPCH_Q22_SQL),
    "events_cohort_retention": (
        entrymod._events_cohort_retention, oracles.COHORT_RETENTION_SQL),
}


def _replay(spark, sf_dir, fn, sql):
    sdf = fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = [c.lower() for c in sdf.columns]
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem", "events"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    res = con.sql(sql)
    drows = res.fetchall()
    dcols = [c.lower() for c in res.columns]
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows)

    def norm(rows, cols):
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        out = []
        for r in rows:
            vals = []
            for i in order:
                v = r[i]
                if isinstance(v, float):
                    v = round(v, 6)
                    if v == -0.0:
                        v = 0.0
                vals.append(v)
            out.append(tuple(vals))
        out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
        return out

    assert norm(srows, scols) == norm(drows, dcols)
    return srows, scols


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_relational_matches_oracle(spark, sf_dir, name):
    fn, sql = STAGED[name]
    srows, _ = _replay(spark, sf_dir, fn, sql)
    assert len(srows) > 0


def test_q13_keeps_zero_order_customers(spark, sf_dir):
    """The LEFT join must not drop customers with no qualifying orders:
    the c_count = 0 bucket exists and the histogram covers every
    customer exactly once."""
    df = entrymod._tpch_q13_order_distribution(spark, sf_dir)
    rows = {r["c_count"]: r["custdist"] for r in df.collect()}
    n_cust = load_table(spark, sf_dir, "customer").count()
    assert sum(rows.values()) == n_cust
    assert 0 in rows and rows[0] > 0


def test_q22_excludes_customers_with_orders(spark, sf_dir):
    """Anti-join semantics: no counted customer may appear in orders."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    with_orders = {
        r["o_custkey"] for r in orders.select("o_custkey").distinct().collect()
    }
    thr_row = (
        cust.where(F.col("c_acctbal") > 0.0)
        .agg(F.round(F.sum("c_acctbal") / F.count(F.lit(1)), 6).alias("t"))
        .collect()[0]
    )
    survivors = cust.where(F.col("c_acctbal") > thr_row["t"]).where(
        ~F.col("c_custkey").isin(list(with_orders))
    )
    total = entrymod._tpch_q22_idle_balances(spark, sf_dir).agg(
        F.sum("numcust")
    ).collect()[0][0]
    assert total == survivors.count()


def test_cohort_day_zero_counts_every_user(spark, sf_dir):
    """Every user appears in their own cohort at offset 0, so the
    offset-0 diagonal sums to the distinct-user count; offsets are
    never negative."""
    ev = load_table(spark, sf_dir, "events")
    ret = cohort_retention(ev)
    diag = (
        ret.where(F.col("offset_days") == 0).agg(F.sum("n_users")).collect()
    )[0][0]
    n_users = ev.select("user_id").distinct().count()
    assert diag == n_users
    assert ret.where(F.col("offset_days") < 0).count() == 0
    # retention can only shrink cohort coverage: every (cohort, off>0)
    # bucket is <= its cohort size
    sizes = ret.where(F.col("offset_days") == 0).select(
        "cohort_day", F.col("n_users").alias("c0")
    )
    bad = (
        ret.join(sizes, "cohort_day")
        .where(F.col("n_users") > F.col("c0"))
        .count()
    )
    assert bad == 0


def test_rollup_revenue_matches_oracle(spark, sf_dir):
    sdf = entrymod._tpch_rollup_revenue(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = [c.lower() for c in sdf.columns]
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "orders", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    res = con.sql(oracles.TPCH_ROLLUP_SQL)
    drows = res.fetchall()
    assert sorted(scols) == sorted([c.lower() for c in res.columns])
    assert sorted(map(str, srows)) == sorted(map(str, drows))
    # structure: 1 grand total + one subtotal per region + leaf rows
    lvls = [r[scols.index("lvl")] for r in srows]
    assert lvls.count(3) == 1 and lvls.count(1) == 5
    # subtotal consistency: region subtotal == sum of its nation leaves
    leaves = {}
    subs = {}
    for r in srows:
        d = dict(zip(scols, r))
        if d["lvl"] == 0:
            leaves.setdefault(d["r_name"], 0)
            leaves[d["r_name"]] += d["n_lineitems"]
        elif d["lvl"] == 1:
            subs[d["r_name"]] = d["n_lineitems"]
    assert leaves == subs


def test_transition_counts_rows_sum_and_probs(spark, sf_dir):
    """Per-prev-type probabilities sum to exactly 1 (integer counts,
    one division) and pair counts sum to n_events − n_users (one lag
    pair per event after each user's first)."""
    df = entrymod._events_transition_counts(spark, sf_dir)
    rows = df.collect()
    ev = load_table(spark, sf_dir, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r["n"] for r in rows) == n_events - n_users
    by_prev = {}
    for r in rows:
        by_prev.setdefault(r["prev_type"], []).append(r)
    for prev, grp in by_prev.items():
        assert abs(sum(r["p"] for r in grp) - 1.0) < 1e-4, prev
        assert all(r["row_total"] == sum(g["n"] for g in grp) for r in grp)
