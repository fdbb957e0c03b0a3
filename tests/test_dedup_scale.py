"""Scale-path embedding near-dup: LSH-bucketed candidates + exact verify
must agree with the broadcast all-pairs kernel wherever they overlap, and
the broadcast operator must auto-route (not raise) past its limit."""

from pyspark.sql import functions as F


def _pairs(df):
    return {
        (r["id_a"], r["id_b"]): r["cos_sim"] for r in df.collect()
    }


def test_embedding_neardup_lsh_precision_and_subset(spark, tables):
    from vectordbindexing_spark.operators.dedup import (
        embedding_neardup_lsh,
        embedding_neardup_pairs,
    )

    emb = tables["embeddings"]
    full = _pairs(embedding_neardup_pairs(emb, threshold=0.4))
    lsh = _pairs(
        embedding_neardup_lsh(emb, threshold=0.4, num_bits=6, num_tables=8)
    )
    # precision 1.0: every LSH pair is a true pair with the identical sim
    assert set(lsh) <= set(full)
    for k, v in lsh.items():
        assert abs(v - full[k]) < 1e-9, (k, v, full[k])
    # recall floor from the SimHash angle math: cos 0.4 → P(bit agree)
    # ≈ 0.63, so 6-bit buckets collide ≈ 0.063/table; 8 tables → ≈ 0.41
    # expected recall. Floor set loosely at 0.2.
    assert len(lsh) >= 0.2 * max(len(full), 1), (len(lsh), len(full))
    # recall is monotone in the number of tables (more probes, same verify)
    more = _pairs(
        embedding_neardup_lsh(emb, threshold=0.4, num_bits=6, num_tables=16)
    )
    assert set(lsh) <= set(more) <= set(full)


def test_embedding_neardup_autoroutes_past_broadcast_limit(spark, tables):
    from vectordbindexing_spark.operators.dedup import (
        embedding_neardup_lsh,
        embedding_neardup_pairs,
    )

    emb = tables["embeddings"]
    routed = _pairs(
        embedding_neardup_pairs(
            emb, threshold=0.4, broadcast_limit=50, num_bits=8
        )
    )
    direct = _pairs(
        embedding_neardup_lsh(emb, threshold=0.4, num_bits=8, num_tables=8)
    )
    assert routed == direct


def test_embedding_neardup_lsh_candidate_volume_bounded(spark, tables):
    """The whole point of the bucketed path: candidates ≪ n²/2."""
    from vectordbindexing_spark.operators.lsh import simhash_buckets

    emb = tables["embeddings"]
    n = emb.count()
    bt = simhash_buckets(
        emb.select(
            F.col("vec_id").cast("long").alias("vid"), F.col("embedding").alias("v")
        ),
        "vid", "v", num_bits=8, num_tables=8, bucket_cap=None,
    )
    a = bt.select(F.col("id").alias("id_a"), "bucket")
    b = bt.select(F.col("id").alias("id_b"), "bucket")
    n_cand = (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
        .count()
    )
    assert n_cand < 0.5 * n * (n - 1) / 2, (n_cand, n)


def test_scaled_num_bits_monotone_and_clamped():
    from vectordbindexing_spark.operators.lsh import scaled_num_bits

    assert scaled_num_bits(500) == 6          # small corpus → floor
    assert scaled_num_bits(1_000_000) == 10   # ~1k per bucket
    assert scaled_num_bits(1_000_000_000) == 20
    assert scaled_num_bits(10**15) == 24      # ceiling
    prev = 0
    for n in (10**3, 10**5, 10**7, 10**9, 10**11):
        bits = scaled_num_bits(n)
        assert bits >= prev
        prev = bits


def test_lsh_bucket_cap_bounds_candidates(spark, tables):
    """With a cap, per-query candidates stay ≤ tables·(1+bits)·cap no
    matter the corpus size — the invariant that makes the entry config
    scale-safe."""
    from pyspark.sql import functions as F

    from vectordbindexing_spark.operators.lsh import probe_buckets, simhash_buckets

    emb = tables["embeddings"]
    q = emb.filter(F.col("vec_id") % 10 == 0)
    b = emb.filter(F.col("vec_id") % 10 != 0)
    num_bits, num_tables, cap = 6, 8, 5
    bt = simhash_buckets(
        b.select(F.col("vec_id").alias("i"), F.col("embedding").alias("v")),
        "i", "v", num_bits, num_tables, bucket_cap=cap,
    )
    # cap respected per bucket
    over = bt.groupBy("bucket").count().filter(F.col("count") > cap).count()
    assert over == 0
    qb = simhash_buckets(
        q.select(F.col("vec_id").alias("i"), F.col("embedding").alias("v")),
        "i", "v", num_bits, num_tables, bucket_cap=None,
    ).withColumnRenamed("id", "qid")
    probes = qb.select(
        "qid", F.explode(probe_buckets(F.col("bucket"), num_bits)).alias("bucket")
    )
    per_q = (
        probes.join(bt, "bucket")
        .select("qid", "id").dropDuplicates(["qid", "id"])
        .groupBy("qid").count()
    )
    bound = num_tables * (1 + num_bits) * cap
    assert per_q.filter(F.col("count") > bound).count() == 0


def test_simhash_fingerprints_jvm_matches_arrow(spark, tables):
    from vectordbindexing_spark.operators.dedup import simhash_text_fingerprints

    docs = tables["documents"]
    a = {
        r["did"]: r["fingerprint"]
        for r in simhash_text_fingerprints(docs, impl="arrow").collect()
    }
    j = {
        r["did"]: r["fingerprint"]
        for r in simhash_text_fingerprints(docs, impl="jvm").collect()
    }
    assert a == j
    # empty/token-less docs must hit the all-bits-set convention in BOTH
    empty = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "one two")], "doc_id long, text string"
    )
    ae = {r["did"]: r["fingerprint"]
          for r in simhash_text_fingerprints(empty, impl="arrow").collect()}
    je = {r["did"]: r["fingerprint"]
          for r in simhash_text_fingerprints(empty, impl="jvm").collect()}
    assert ae == je
    assert ae[1] == ae[2] == (1 << 32) - 1


def test_minhash_pairs_jvm_matches_arrow(spark, tables):
    from vectordbindexing_spark.operators.dedup import minhash_dedup_pairs

    docs = tables["documents"]
    key = lambda r: (r["id_a"], r["id_b"], r["jaccard"])  # noqa: E731
    a = sorted(map(key, minhash_dedup_pairs(docs, impl="arrow").collect()))
    j = sorted(map(key, minhash_dedup_pairs(docs, impl="jvm").collect()))
    assert a == j and len(a) > 0


def test_dedup_ops_tolerate_null_text(spark):
    """A corpus row with NULL text must not crash any dedup kernel; the
    SimHash fingerprint treats it as an empty doc (all bits set, same on
    the Arrow and JVM paths)."""
    from pyspark.sql import functions as F

    from vectordbindexing_spark.operators import dedup

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "a b c d e f g"), (4, "a b c d e f g")],
        "doc_id long, text string",
    )
    assert dedup.exact_dedup_stats(df).count() >= 1
    assert dedup.minhash_dedup_pairs(
        df, n=3, num_hashes=8, bands=4, threshold=0.5
    ).count() >= 1
    a = {r["did"]: r["fingerprint"]
         for r in dedup.simhash_text_fingerprints(df).collect()}
    j = {r["did"]: r["fingerprint"]
         for r in dedup.simhash_text_fingerprints(df, impl="jvm").collect()}
    assert a == j and len(a) == 4
    assert a[1] == a[2]  # null ≡ empty doc


def test_simhash_wide_fingerprint_paths_agree(spark, sf_dir):
    """num_bits > 32 draws bits 32+ from the second derived hash; the
    Arrow and JVM fingerprint kernels must still agree bit-for-bit, and
    the high bits must actually vary (no mega-bucket collapse)."""
    from pyspark.sql import functions as F

    from vectordbindexing_spark.io.tables import load_table
    from vectordbindexing_spark.operators.dedup import (
        simhash_text_fingerprints,
    )

    docs = load_table(spark, sf_dir, "documents").limit(200)
    a = {r["did"]: r["fingerprint"] for r in
         simhash_text_fingerprints(docs, num_bits=40, impl="arrow").collect()}
    j = {r["did"]: r["fingerprint"] for r in
         simhash_text_fingerprints(docs, num_bits=40, impl="jvm").collect()}
    assert a == j
    highs = {fp >> 32 for fp in a.values()}
    assert len(highs) > 1


def test_simhash_bucket_cap_bounds_degenerate_corpora(spark):
    """A corpus whose fingerprints collapse onto one band key must not
    explode the candidate join: the cap keeps the cap-smallest ids per
    bucket, so pair volume is bounded and capped results equal the
    uncapped join restricted to the kept ids."""
    from pyspark.sql import functions as F

    from vectordbindexing_spark.operators.dedup import simhash_text_neardup

    # 60 identical docs → identical fingerprints → one bucket per band
    docs = spark.range(60).select(
        F.col("id").alias("doc_id"),
        F.lit("same boilerplate template text here").alias("text"),
    )
    capped = simhash_text_neardup(docs, num_bits=32, bucket_cap=10)
    # cap 10 → only ids 0..9 survive banding → C(10,2) pairs
    assert capped.count() == 45
    assert capped.agg(F.max("id_b")).first()[0] == 9
    uncapped = simhash_text_neardup(docs, num_bits=32, bucket_cap=None)
    assert uncapped.count() == 60 * 59 // 2


def test_scaled_simhash_bits_occupancy():
    from vectordbindexing_spark.operators.dedup import scaled_simhash_bits

    assert scaled_simhash_bits(200) == 32          # floor: 8 bits/band
    assert scaled_simhash_bits(5_000) == 52        # 13 bits/band
    assert scaled_simhash_bits(100_000) == 60      # clamped at 15/band
    assert scaled_simhash_bits(10**9) == 60        # clamped at 15/band


def test_simhash_width_guard_and_auto_total():
    # r07: >60-bit fingerprints must be rejected (they'd silently
    # recreate the collapsed-band mega-bucket), and the auto rule must
    # keep bands * bits_per_band <= 60 for EVERY band count
    import pytest

    from vectordbindexing_spark.operators.dedup import (
        scaled_simhash_bits,
        simhash_text_fingerprints,
    )

    for bands in range(1, 12):
        assert scaled_simhash_bits(10**9, bands) <= 60, bands
        assert scaled_simhash_bits(100, bands) <= 60, bands
    with pytest.raises(ValueError, match="60"):
        simhash_text_fingerprints(None, num_bits=61)
