"""x127 — HTML/boilerplate main-text extraction (operators/html.py).

Planted-markup tests: the block classifier's decisions are derived by
hand (link-dense navs/footers dropped, short blocks dropped, real
paragraphs kept), script/style bodies never leak into segmentation,
and the Spark extractor agrees bit-for-bit with the DuckDB replay on
an adversarial fixture that the x127 oracle's synthesized corpus does
not cover (nested tags inside anchors, NULL/empty html, markup-free
text, attribute-soup tags).
"""

from __future__ import annotations

import re

import pytest

from video_stream_processing_spark.operators.html import (
    extract_sql,
    html_extract,
    synth_markup_col,
)


def _rows(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, html string")
    return {r["doc_id"]: r for r in html_extract(df).collect()}


def test_planted_blocks_classified_by_hand(spark):
    html = (
        '<html><body><nav><a href="/">Home</a> <a href="/x">Links here</a></nav>'
        "<p>alpha beta gamma delta epsilon zeta</p>"
        '<div><a href="/l">click</a> now</div>'
        "<p>short one</p></body></html>"
    )
    out = _rows(spark, [(1, html)])[1]
    # by hand: 4 non-empty blocks —
    #   'Home Links here'  (3 words, link 14/15)        -> boilerplate
    #   'alpha beta ... zeta' (6 words, no links)       -> CONTENT
    #   'click now'        (2 words, link 5/9)          -> boilerplate
    #   'short one'        (2 words)                    -> boilerplate
    assert out["main_text"] == "alpha beta gamma delta epsilon zeta"
    assert out["n_blocks"] == 4 and out["n_kept"] == 1
    assert out["kept_share"] == 0.25
    # doc link density: link chars 14+0+5+0 = 19, text chars 15+35+9+9 = 68
    assert out["link_density"] == round(19 / 68, 4)
    # tag fraction vs an independent Python-re second implementation
    text_chars = len(re.sub(r"<[^>]*>", "", html))
    assert out["tag_fraction"] == round((len(html) - text_chars) / len(html), 4)


def test_script_and_style_bodies_never_leak(spark):
    # the script body embeds closing block tags and fake content — it
    # must be stripped BEFORE segmentation, contributing nothing
    html = (
        "<html><script>var x=1;</p><p>fake boiler text here now</p></script>"
        "<style>p{color:red}</style>"
        "<p>real content words one two three</p></html>"
    )
    out = _rows(spark, [(1, html)])[1]
    assert out["main_text"] == "real content words one two three"
    assert out["n_blocks"] == 1 and out["n_kept"] == 1
    assert out["kept_share"] == 1.0 and out["link_density"] == 0.0


def test_null_empty_and_markup_free(spark):
    rows = [
        (1, None),
        (2, ""),
        (3, "just plain words with no markup at all"),
    ]
    out = _rows(spark, rows)
    for d in (1, 2):
        r = out[d]
        assert r["main_text"] == "" and r["n_blocks"] == 0 and r["n_kept"] == 0
        assert r["tag_fraction"] == 0.0 and r["kept_share"] == 0.0
    r3 = out[3]
    # no separators -> one block, 8 words, no links -> kept whole
    assert r3["main_text"] == "just plain words with no markup at all"
    assert r3["tag_fraction"] == 0.0 and r3["kept_share"] == 1.0


def test_thresholds_are_parameters(spark):
    from video_stream_processing_spark.operators.html import html_extract as hx

    df = spark.createDataFrame(
        [(1, "<p>one two three</p>")], "doc_id long, html string"
    )
    strict = hx(df).collect()[0]          # min_words=5 -> dropped
    loose = hx(df, min_words=3).collect()[0]
    assert strict["n_kept"] == 0 and loose["n_kept"] == 1
    df2 = spark.createDataFrame(
        [(1, '<p><a href="/">linked text of six words</a> z</p>')],
        "doc_id long, html string",
    )
    # link 24/26 chars: dropped at 0.35, kept at 0.95
    assert hx(df2).collect()[0]["n_kept"] == 0
    assert hx(df2, max_link_density=0.95).collect()[0]["n_kept"] == 1


ADVERSARIAL = [
    (1, '<div><a class="btn" href="#"><b>Nested</b> tag link</a> trailing words here</div>'),
    (2, "<P>UPPER case tags and words enough to keep</P><BR><p>tail</p>"),
    (3, "<p>multi   space\t and\nnewline   collapse test words</p>"),
    (4, '<td>cell one words</td><td>cell two has five whole words</td>'),
    (5, None),
    (6, ""),
    (7, "<ul><li>item</li><li>another</li></ul><p>six words make this block count</p>"),
    (8, '<h2>Heading</h2><blockquote>quoted wisdom of at least five words</blockquote>'),
    (9, "plain text no tags but plenty of words to keep around"),
    (10, '<p>a &amp; b entities stay verbatim in this extractor design</p>'),
]


def test_spark_matches_duckdb_on_adversarial_fixture(spark):
    """Direct cross-engine parity on handwritten markup the synthesized
    x127 corpus cannot produce."""
    import duckdb
    import pandas as pd

    df = spark.createDataFrame(ADVERSARIAL, "doc_id long, html string")
    got = (
        html_extract(df)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype(str)
    )
    con = duckdb.connect()
    con.register(
        "fixture", pd.DataFrame(ADVERSARIAL, columns=["doc_id", "html"])
    )
    want = (
        con.execute(extract_sql("SELECT doc_id, html FROM fixture"))
        .fetchdf()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype(str)
    )
    assert list(got.columns) == list(want.columns)
    pd_testing = pytest.importorskip("pandas.testing")
    pd_testing.assert_frame_equal(got, want)


def test_synth_markup_wraps_text_deterministically(spark):
    df = spark.createDataFrame(
        [(6, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    row = df.select(synth_markup_col().alias("html")).collect()[0]
    h = row["html"]
    assert h.startswith("<html><head><title>Doc 6</title>")
    assert "<script" in h       # 6 % 3 == 0
    assert "<style" not in h    # 6 % 4 != 0
    assert '<div class="promo">' in h  # even
    assert "<p>the quick brown fox jumps over the lazy dog</p>" in h
    out = _rows(spark, [(6, h)])[6]
    assert out["main_text"] == "the quick brown fox jumps over the lazy dog"
    # nav + h1('Post 6') + content + promo + footer blocks survive as
    # non-empty; title block 'Doc 6' too
    assert out["n_kept"] == 1 and out["n_blocks"] >= 5
