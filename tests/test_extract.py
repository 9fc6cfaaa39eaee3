"""Byte-identity extraction gate (north rule: byte-identical text per
url vs the reference extractor; destor analogue: restore byte-equality,
/root/reference/src/do_restore.c:110-186)."""

from __future__ import annotations

import hashlib

from destor_spark.operators.extract import extract_text, with_extracted_text
from destor_spark.synth import make_corpus, render_html

TRICKY = [
    "",
    "   ",
    "plain words here",
    "with <angle> & ampersand &amp; pre-escaped",
    "unicode ✓ é 中文 𝄞",
    "a&lt;b literal entity-looking text",
    "tabs\tand\nnewlines\r\npreserved",
]


def test_roundtrip_pure():
    for t in TRICKY:
        assert extract_text(render_html(t)) == t
        assert extract_text(render_html(t, invalid_utf8=True)) == t


def test_extract_none_cases():
    assert extract_text(None) is None
    assert extract_text(b"<html>no markers</html>") is None
    assert extract_text(b"<!--TEXT-->unclosed") is None


def test_generic_html_extractor():
    from destor_spark.operators.extract import extract_generic_html

    html = (
        b"<html><head><style>p{color:red}</style>"
        b"<script>var x = '<p>not text</p>';</script></head>"
        b"<body><!-- comment --><h1>Title</h1>\n"
        b"<p>Hello &amp; welcome to   the &lt;real&gt; web.</p>"
        b"<div>&amp;lt; stays entity</div></body></html>"
    )
    got = extract_generic_html(html)
    # v2: block elements (h1/p/div) are line breaks, not spaces
    assert got == "Title\nHello & welcome to the <real> web.\n&lt; stays entity"
    assert extract_generic_html(None) is None
    assert extract_generic_html(b"<p>  </p>") is None
    # deterministic
    assert extract_generic_html(html) == extract_generic_html(html)


def test_fallback_udf_routes_both_paths(spark):
    from destor_spark.operators.extract import with_extracted_text

    df = spark.createDataFrame(
        [
            ("marked", render_html("inside markers")),
            ("plain", b"<html><body><p>real web page</p></body></html>"),
        ],
        "url string, html binary",
    )
    out = {
        r["url"]: r["text"]
        for r in with_extracted_text(df, generic_fallback=True).collect()
    }
    assert out["marked"] == "inside markers"
    assert out["plain"] == "real web page"


def test_spark_extraction_byte_identical(spark, smoke_corpus):
    pages, _ = smoke_corpus
    sdf = spark.createDataFrame(pages)
    out = with_extracted_text(sdf, out_col="text2").select("url", "text", "text2")
    for r in out.collect():
        a = hashlib.sha256(r["text"].encode("utf-8")).hexdigest()
        b = hashlib.sha256(r["text2"].encode("utf-8")).hexdigest()
        assert a == b, r["url"]


def test_corpus_determinism():
    p1, t1 = make_corpus(seed=5, n_docs=120)
    p2, t2 = make_corpus(seed=5, n_docs=120)
    assert p1.equals(p2)
    assert t1.equals(t2)
    p3, _ = make_corpus(seed=6, n_docs=120)
    assert not p1["text"].equals(p3["text"])
