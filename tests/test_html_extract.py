"""HTML -> text extraction (input_hint: byte-identical extracted text per
url). Pandas kernel unit cases + the generator invariant + the Spark
operator + build_index(html_col=...) end-to-end."""

import pandas as pd
import pytest

from infidex_spark.pipeline.html import (
    extract_text,
    extract_text_series,
    html_to_text,
    wrap_html_text,
)


def test_tag_strip_and_fold():
    assert extract_text(b"<p>hello <b>world</b></p>") == "hello world"
    assert extract_text("<div>a</div><div>b</div>") == "a b"


def test_script_style_head_comment_dropped():
    html = (
        "<html><head><title>skip me</title><style>p{}</style></head>"
        "<body><!-- note --><script>var x = '<p>no</p>';</script>"
        "<p>keep</p></body></html>"
    )
    assert extract_text(html) == "keep"


def test_entities_unescaped():
    assert extract_text("<p>a &amp; b &lt;c&gt; &quot;d&quot; &#39;e&#39;&nbsp;f</p>") == "a & b <c> \"d\" 'e' f"
    # &amp; last: double-escaped stays single-unescaped
    assert extract_text("<p>&amp;lt;</p>") == "&lt;"


def test_whitespace_folding_and_bytes():
    assert extract_text(b"<p>a\n\t b\r\nc</p>") == "a b c"
    assert extract_text(None) == ""
    # invalid utf-8 decodes deterministically
    assert extract_text(b"<p>ok\xff</p>") == "ok�"


def test_wrap_roundtrip_byte_identical():
    texts = [
        "the quick brown fox jumps over the lazy dog again and again today",
        " ".join(f"w{i}" for i in range(60)),
        "short text",
        "a b",
    ]
    for t in texts:
        assert extract_text(wrap_html_text(t)) == t


def test_series_vectorized_matches_scalar():
    htmls = [wrap_html_text(f"doc {i} body words here") for i in range(50)]
    got = extract_text_series(pd.Series(htmls)).tolist()
    assert got == [extract_text(h) for h in htmls]


def test_spark_operator_and_generator_invariant(spark):
    from infidex_spark.webtext import generate_webtext

    wt = generate_webtext(spark, 200, seed=7)
    extracted = html_to_text(wt.withColumnRenamed("text", "text_orig"), text_col="text")
    rows = extracted.select("url", "text_orig", "text").collect()
    assert len(rows) == 200
    for r in rows:
        assert r.text == r.text_orig, r.url  # byte-identical per url


def test_build_index_from_html(spark, tmp_path):
    from infidex_spark.build.indexer import build_index
    from infidex_spark.query.executor import IndexReader, QueryExecutor
    from infidex_spark.webtext import generate_webtext, with_doc_ids

    wt = generate_webtext(spark, 100, seed=11)
    docs = with_doc_ids(wt).select("doc_id", "html")
    out = str(tmp_path / "htmlidx")
    manifest = build_index(
        spark, docs, out, n_buckets=4, salts=2, html_col="html", aux=False
    )
    assert manifest["html_col"] == "html"
    assert manifest["total_docs"] == 100
    ex = QueryExecutor(IndexReader(out))
    assert ex.search("the", 5) or ex.search("internet", 5)
