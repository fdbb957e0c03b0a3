"""benchmark_contamination broadcast gating: the hint must only apply
when a bounded probe proves the benchmark shingle side small; results
must not depend on the gate's decision."""

import contextlib
import io

from pyspark.sql import functions as F

from vectordbindexing_spark.io.tables import load_table
from vectordbindexing_spark.operators.textops import benchmark_contamination


def _split(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    train = docs.filter(F.col("doc_id") % 20 != 0)
    return train, bench


def _plan(df):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_small_benchmark_broadcasts(spark, sf_dir):
    train, bench = _split(spark, sf_dir)
    out = benchmark_contamination(train, bench)
    assert "BroadcastHashJoin" in _plan(out)


def test_oversize_benchmark_skips_hint_same_result(spark, sf_dir):
    train, bench = _split(spark, sf_dir)
    hinted = benchmark_contamination(train, bench).toPandas()
    unhinted_df = benchmark_contamination(train, bench, broadcast_limit=0)
    unhinted = unhinted_df.toPandas()
    key = ["doc_id"]
    hinted = hinted.sort_values(key).reset_index(drop=True)
    unhinted = unhinted.sort_values(key).reset_index(drop=True)
    assert hinted.equals(unhinted)
