"""Driver-hasher type gate: every oracle_sql() must produce only column
types the driver's cross-engine hasher demonstrably serializes the same
way as Spark — {BIGINT, DOUBLE, VARCHAR, TIMESTAMP, BOOLEAN}.

Why: DuckDB promotes sum(BIGINT) (incl. windowed sums) to HUGEINT
(INT128) and literal-decimal arithmetic to DECIMAL; both serialize
differently from Spark LONG/DOUBLE in the driver's value hasher, turning
hash-green queries red with rows/schema still matching. The fetchall
based replay in test_entry_contract can't see this (Python converts both
to int), which is exactly how the two r06 red rows (text_pack_windows,
mix_token_budget_sample) slipped through. This gate catches the failure
class at commit time.
"""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

ORACLES = entrymod.oracle_sql()

# Types proved driver-safe: BIGINT/DOUBLE/VARCHAR everywhere since r01;
# TIMESTAMP passed r06 (events_hourly_stats etc.); INTEGER passed r05/r06
# (modality_stats, knn_graph_degree_stats, media_* — all hash-green with
# int32 columns); BOOLEAN is hashed as Python bool on both engines.
# HUGEINT and DECIMAL are explicitly banned (the r06 failure class).
SAFE_TYPES = {"BIGINT", "INTEGER", "DOUBLE", "VARCHAR", "TIMESTAMP", "BOOLEAN"}


def _duck(sf_dir):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_output_types_driver_safe(sf_dir, name):
    con = _duck(sf_dir)
    rel = con.sql(ORACLES[name])
    bad = [
        f"{c}:{t}"
        for c, t in zip(rel.columns, [str(t) for t in rel.types])
        if str(t).upper() not in SAFE_TYPES
    ]
    assert not bad, (
        f"{name}: oracle emits driver-unsafe column types {bad}; "
        "cast integer sums ::BIGINT and decimal arithmetic ::DOUBLE "
        "(DuckDB promotes sum(BIGINT)->HUGEINT, int*decimal->DECIMAL)"
    )


STAGED = entrymod.staged_oracle_sql()


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_oracle_output_types_driver_safe(sf_dir, name):
    """Same gate for the r08-staged oracles — they skip the registered
    gate until registration, which is exactly when a HUGEINT would
    surface at the driver."""
    con = _duck(sf_dir)
    rel = con.sql(STAGED[name])
    bad = [
        f"{c}:{t}"
        for c, t in zip(rel.columns, [str(t) for t in rel.types])
        if str(t).upper() not in SAFE_TYPES
    ]
    assert not bad, f"{name}: staged oracle emits driver-unsafe types {bad}"


def test_staged_queries_and_oracles_share_keys():
    assert set(entrymod.staged_queries()) == set(STAGED)
