"""The t2 gate for the r08-STAGED queries: every staged_queries()
entry must hash-match its staged_oracle_sql() twin in DuckDB — the
identical comparison the driver will run once they are registered
(same normalize as tests/test_entry_contract.py)."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

STAGED_Q = entrymod.staged_queries()
STAGED_O = entrymod.staged_oracle_sql()


def _duck(sf_dir):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
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
    return [tuple(colnames[i] for i in order)] + out


@pytest.mark.parametrize("name", sorted(STAGED_Q))
def test_staged_query_matches_oracle(spark, sf_dir, name):
    sdf = STAGED_Q[name](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = [c.lower() for c in sdf.columns]
    con = _duck(sf_dir)
    res = con.sql(STAGED_O[name])
    drows = res.fetchall()
    dcols = [c.lower() for c in res.columns]
    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), (
        f"{name}: row count {len(srows)} vs {len(drows)}"
    )
    ns, nd = _normalize(srows, scols), _normalize(drows, dcols)
    for i, (a, b) in enumerate(zip(ns, nd)):
        assert a == b, f"{name}: first mismatch at sorted row {i}: {a} vs {b}"
