"""lang_id lexicon parameterization: the broadcast-table path must match
the literal-expression path exactly, and a swapped-in lexicon must drive
predictions."""

from pyspark.sql import functions as F

from vectordbindexing_spark.io.tables import load_table
from vectordbindexing_spark.operators.textops import LANG_MARKERS, lang_id


def _lex_df(spark, markers_by_lang):
    rows = [
        (lang, m)
        for lang, markers in markers_by_lang.items()
        for m in markers
    ]
    return spark.createDataFrame(rows, schema="lang string, marker string")


def test_table_path_matches_literal_path(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    lit = lang_id(docs).toPandas().sort_values("doc_id").reset_index(drop=True)
    tab = (
        lang_id(docs, lexicon=_lex_df(spark, LANG_MARKERS))
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert lit.equals(tab)


def test_duplicate_lexicon_rows_do_not_double_count(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    dup = _lex_df(spark, LANG_MARKERS)
    doubled = dup.union(dup)
    a = lang_id(docs, lexicon=dup).toPandas().sort_values("doc_id")
    b = lang_id(docs, lexicon=doubled).toPandas().sort_values("doc_id")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_swapped_lexicon_drives_predictions(spark):
    docs = spark.createDataFrame(
        [(1, "klingon words qapla batlh today"), (2, "nothing matches here")],
        schema="doc_id long, text string",
    )
    lex = {"tlh": ("qapla", "batlh"), "en": ("the", "and")}
    # dict path
    got = {r["doc_id"]: r["pred_lang"] for r in lang_id(docs, lexicon=lex).collect()}
    assert got == {1: "tlh", 2: "und"}
    # table path
    got2 = {
        r["doc_id"]: r["pred_lang"]
        for r in lang_id(docs, lexicon=_lex_df(docs.sparkSession, lex)).collect()
    }
    assert got2 == got


def test_lexicon_broadcasts(spark, sf_dir):
    import contextlib, io
    docs = load_table(spark, sf_dir, "documents")
    out = lang_id(docs, lexicon=_lex_df(spark, LANG_MARKERS))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    assert "BroadcastHashJoin" in buf.getvalue()
