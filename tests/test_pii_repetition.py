"""Unit tests for textops.pii_redact and textops.repetition_stats
(training-pipeline scrub + Gopher-style repetition quality signals)."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vectordbindexing_spark.operators.textops import (  # noqa: E402
    pii_redact,
    repetition_stats,
)


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


def test_pii_redact_all_types(spark):
    df = spark.createDataFrame(
        [(0, "mail a@b.org and c.d+x@sub.example.co from 10.0.37.7 "
             "call 555-123-0042 end")],
        "doc_id long, text string",
    )
    r = _one(pii_redact(df))
    assert (r["n_email"], r["n_ip"], r["n_phone"]) == (2, 1, 1)
    assert r["redacted"] == (
        "mail <EMAIL> and <EMAIL> from <IP> call <PHONE> end"
    )


def test_pii_redact_clean_text_unchanged(spark):
    txt = "no pii here, just v1.2.3 and 12345-678-9012 and a at b dot com"
    df = spark.createDataFrame([(0, txt)], "doc_id long, text string")
    r = _one(pii_redact(df))
    assert (r["n_email"], r["n_ip"], r["n_phone"]) == (0, 0, 0)
    assert r["redacted"] == txt


def test_pii_counts_are_progressive(spark):
    # the IP inside the email's local part is consumed by the email rule
    # first, so it must NOT also count as an IP
    df = spark.createDataFrame(
        [(0, "x 10.0.0.1@example.com y")], "doc_id long, text string"
    )
    r = _one(pii_redact(df))
    assert (r["n_email"], r["n_ip"]) == (1, 0)
    assert r["redacted"] == "x <EMAIL> y"


def test_repetition_stats_known_fractions(spark):
    # 2-grams of "p q p q p q": [p q, q p, p q, q p, p q] → top 3/5,
    # distinct 2 → dup 1 - 2/5; 3-grams: [p q p, q p q, p q p, q p q]
    # → top 2/4, dup 1 - 2/4
    df = spark.createDataFrame(
        [(7, "p q p q p q")], "doc_id long, text string"
    )
    r = _one(repetition_stats(df, ns=(2, 3)))
    assert r["n_lines"] == 1 and r["dup_line_frac"] == 0.0
    assert r["top_2gram_frac"] == 0.6
    assert r["dup_2gram_frac"] == 0.6
    assert r["top_3gram_frac"] == 0.5
    assert r["dup_3gram_frac"] == 0.5


def test_repetition_stats_duplicate_lines(spark):
    df = spark.createDataFrame(
        [(1, "x y\nx y\nz w")], "doc_id long, text string"
    )
    r = _one(repetition_stats(df, ns=(2,)))
    assert r["n_lines"] == 3
    assert r["dup_line_frac"] == round(1 - 2 / 3, 6)


def test_repetition_stats_bounds_on_corpus(spark, tables):
    out = repetition_stats(
        tables["documents"].limit(50), ns=(2, 3)
    ).collect()
    assert len(out) == 50
    for r in out:
        for c in ("dup_line_frac", "top_2gram_frac", "dup_2gram_frac",
                  "top_3gram_frac", "dup_3gram_frac"):
            assert 0.0 <= r[c] <= 1.0, (c, r)
        # the top gram accounts for at least one occurrence
        assert r["top_2gram_frac"] > 0.0


def test_short_doc_single_shingle(spark):
    # fewer words than n → word_ngrams yields one whole-doc shingle:
    # top frac 1, dup frac 0
    df = spark.createDataFrame([(3, "q")], "doc_id long, text string")
    r = _one(repetition_stats(df, ns=(3,)))
    assert r["top_3gram_frac"] == 1.0 and r["dup_3gram_frac"] == 0.0


def test_chunk_documents_windows_and_overlap(spark):
    from vectordbindexing_spark.operators.textops import chunk_documents

    txt = " ".join(f"w{i}" for i in range(10))  # w0..w9
    df = spark.createDataFrame([(1, txt)], "doc_id long, text string")
    out = chunk_documents(df, window=4, stride=3).collect()
    chunks = {r["chunk_id"]: r["chunk_text"] for r in out}
    # starts 1,4,7,10 -> 4 chunks; final one short
    assert chunks == {
        0: "w0 w1 w2 w3",
        1: "w3 w4 w5 w6",
        2: "w6 w7 w8 w9",
        3: "w9",
    }
    assert {r["chunk_id"]: r["n_chunk_tokens"] for r in out} == {
        0: 4, 1: 4, 2: 4, 3: 1,
    }


def test_chunk_documents_short_and_empty(spark):
    from vectordbindexing_spark.operators.textops import chunk_documents

    df = spark.createDataFrame(
        [(1, "just three words"), (2, "")], "doc_id long, text string"
    )
    out = chunk_documents(df, window=64, stride=48).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == 1 and by_doc[1][0]["chunk_text"] == "just three words"
    assert len(by_doc[2]) == 1 and by_doc[2][0]["n_chunk_tokens"] == 0


def test_chunk_coverage_reconstructs_document(spark, tables):
    # stride == window (no overlap): concatenating chunks rebuilds the doc
    from vectordbindexing_spark.operators.textops import chunk_documents
    from pyspark.sql import functions as F

    docs = tables["documents"].limit(20)
    out = (
        chunk_documents(docs, window=16, stride=16)
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ", F.array_sort(F.collect_list(F.struct("chunk_id", "chunk_text")))
                .getField("chunk_text")
            ).alias("rebuilt")
        )
    )
    joined = docs.join(out, "doc_id").select(
        (F.col("rebuilt") == F.concat_ws(" ",
            F.filter(F.split("text", " "), lambda x: F.length(x) > 0))).alias("ok")
    )
    assert all(r["ok"] for r in joined.collect())


def test_extract_urls_and_domains(spark):
    from vectordbindexing_spark.operators.textops import extract_urls

    df = spark.createDataFrame(
        [(1, "see https://sub.example.com/a/b?x=1 and http://foo.org, "
             "plus https://foo.org/z. none here")],
        "doc_id long, text string",
    )
    rows = sorted(
        (r["url"], r["domain"]) for r in extract_urls(df).collect()
    )
    assert rows == [
        ("http://foo.org", "foo.org"),
        ("https://foo.org/z", "foo.org"),
        ("https://sub.example.com/a/b?x=1", "sub.example.com"),
    ]


def test_domain_stats_counts(spark):
    from vectordbindexing_spark.operators.textops import domain_stats

    df = spark.createDataFrame(
        [
            (1, "x https://a.com/1 y https://a.com/2 z http://b.io/"),
            (2, "only https://a.com/3 here"),
            (3, "no urls at all"),
        ],
        "doc_id long, text string",
    )
    out = {r["domain"]: (r["n_urls"], r["n_docs"])
           for r in domain_stats(df).collect()}
    assert out == {"a.com": (3, 2), "b.io": (1, 1)}


def test_text_ops_null_safe(spark):
    """A corpus row with NULL text must yield defined zero-ish stats, not
    Spark's size(null) = -1 (real corpora have missing text)."""
    from vectordbindexing_spark.operators.sampling import token_budget_sample
    from vectordbindexing_spark.operators.textops import (
        bpe_token_stats,
        chunk_documents,
        pii_redact,
        repetition_stats,
        token_stats,
    )

    df = spark.createDataFrame(
        [(1, None), (2, "two words")],
        "doc_id long, text string",
    )
    ts = {r["doc_id"]: r for r in token_stats(df).collect()}
    assert ts[1]["n_tokens"] == 0 and ts[1]["n_chars"] == 0
    bp = {r["doc_id"]: r for r in bpe_token_stats(df).collect()}
    assert bp[1]["n_bpe_tokens"] == 0
    pr = {r["doc_id"]: r for r in pii_redact(df).collect()}
    assert pr[1]["n_email"] == 0 and pr[1]["redacted"] == ""
    ck = [r for r in chunk_documents(df).collect() if r["doc_id"] == 1]
    assert len(ck) == 1 and ck[0]["n_chunk_tokens"] == 0
    rp = {r["doc_id"]: r for r in repetition_stats(df, ns=(2,)).collect()}
    assert rp[1]["n_lines"] == 1 and rp[1]["dup_line_frac"] == 0.0
    sdf = spark.createDataFrame(
        [(1, "s", None), (2, "s", "a b c")],
        "doc_id long, source string, text string",
    )
    tb = {r["doc_id"]: r for r in token_budget_sample(
        sdf, strata_col="source", budget_tokens=100
    ).collect()}
    assert tb[1]["n_tokens"] == 0 and tb[2]["n_tokens"] == 3


def test_remove_boilerplate_drops_repeated_lines(spark):
    from vectordbindexing_spark.operators.textops import (
        boilerplate_lines,
        remove_boilerplate,
    )

    docs = [(i, f"unique content {i}\nCopyright Corp\nmore {i}")
            for i in range(5)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    bp = {r["line"] for r in boilerplate_lines(df, min_df=3).collect()}
    assert bp == {"Copyright Corp"}
    out = {r["doc_id"]: r for r in remove_boilerplate(df, min_df=3).collect()}
    for i in range(5):
        assert out[i]["clean_text"] == f"unique content {i}\nmore {i}"
        assert out[i]["n_kept"] == 2 and out[i]["n_dropped"] == 1


def test_remove_boilerplate_fully_boilerplate_doc_survives(spark):
    from vectordbindexing_spark.operators.textops import remove_boilerplate

    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, "same"), (4, "other\nsame")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in remove_boilerplate(df, min_df=3).collect()}
    assert out[1]["clean_text"] == "" and out[1]["n_kept"] == 0
    assert out[1]["n_dropped"] == 1
    assert out[4]["clean_text"] == "other"
