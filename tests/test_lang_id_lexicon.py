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


def test_full_lexicon_identifies_non_latin_scripts(spark):
    """The 24-language LANG_MARKERS_FULL table must drive correct
    predictions over real non-Latin-script text on BOTH scoring paths
    (literal expressions and broadcast table), with identical results."""
    from vectordbindexing_spark.operators.textops import LANG_MARKERS_FULL

    docs = spark.createDataFrame(
        [
            (1, "это не то что я думал и в итоге"),          # ru
            (2, "και δεν ξέρω αν είναι το σωστό να πω"),     # el
            (3, "هذا من أفضل ما قرأت في حياتي على الإطلاق"),  # ar
            (4, "यह है एक अच्छा दिन और हम नहीं जानते"),         # hi
            (5, "我 是 在 这里 的 不 知道"),                    # zh (segmented)
            (6, "これ は 本 です の に を"),                    # ja (segmented)
            (7, "der hund ist nicht in das haus und die tür"),  # de
            (8, "xyzzy plugh 12345"),                        # no markers
        ],
        schema="doc_id long, text string",
    )
    expect = {1: "ru", 2: "el", 3: "ar", 4: "hi", 5: "zh", 6: "ja",
              7: "de", 8: "und"}
    lit = {
        r["doc_id"]: r["pred_lang"]
        for r in lang_id(docs, lexicon=LANG_MARKERS_FULL).collect()
    }
    assert lit == expect
    tab = {
        r["doc_id"]: r["pred_lang"]
        for r in lang_id(
            docs, lexicon=_lex_df(spark, LANG_MARKERS_FULL)
        ).collect()
    }
    assert tab == expect


def test_full_lexicon_paths_agree_on_corpus(spark, sf_dir):
    """Literal vs broadcast-table parity must hold for the full
    24-language lexicon too (ties across 24 candidate languages are a
    stricter exercise of the argmax convention than 5)."""
    from vectordbindexing_spark.operators.textops import LANG_MARKERS_FULL

    docs = load_table(spark, sf_dir, "documents")
    lit = (
        lang_id(docs, lexicon=LANG_MARKERS_FULL)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    tab = (
        lang_id(docs, lexicon=_lex_df(spark, LANG_MARKERS_FULL))
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert lit.equals(tab)
