"""Events operators must be timestamp-representation-agnostic.

The driver's events parquet has shipped as TIMESTAMP(NANOS) (read as
long + normalized), TIMESTAMP_NTZ, and plain TIMESTAMP across rounds —
a representation shift once broke sessionize with zero code change
(Spark 4 refuses TIMESTAMP_NTZ → BIGINT casts). This locks in that the
batch event operators produce identical results for every
representation."""

from pyspark.sql import functions as F

from vectordbindexing_spark.io.tables import load_table
from vectordbindexing_spark.operators.events import hourly_stats, sessionize


def _variants(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    base_type = dict(ev.dtypes)["ts"]
    out = {base_type: ev}
    for t in ("timestamp", "timestamp_ntz"):
        if t != base_type:
            out[t] = ev.withColumn("ts", F.col("ts").cast(t))
    return out


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_sessionize_identical_across_ts_types(spark, sf_dir):
    got = {
        t: _rows(sessionize(ev)) for t, ev in _variants(spark, sf_dir).items()
    }
    vals = list(got.values())
    assert all(v == vals[0] for v in vals[1:]), sorted(got)
    assert len(vals[0]) > 0


def test_hourly_stats_identical_across_ts_types(spark, sf_dir):
    # the hour column's TYPE follows the input; compare value content
    def norm(df):
        return _rows(
            df.withColumn("hour", F.date_format("hour", "yyyy-MM-dd HH"))
        )

    got = {
        t: norm(hourly_stats(ev))
        for t, ev in _variants(spark, sf_dir).items()
    }
    vals = list(got.values())
    assert all(v == vals[0] for v in vals[1:]), sorted(got)
    assert len(vals[0]) > 0
