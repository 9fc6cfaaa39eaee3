"""Golden + property tests for the generic (real-crawl) HTML extractor.

The fixture pages under tests/fixtures/html/ are committed, realistic
page shapes: an article page (head/meta/ld+json/style/script, nav,
entities named + decimal + hex, figure), a mirror-index listing (table,
form/select, noscript, comments, NBSP, mailto with &amp;), a tag-soup
legacy page (unclosed <p>/<li>, stray '<' and '&' in text, quoted '>'
inside an attribute, markup-like strings inside <script>, unknown and
truncated entities), and a JS-app empty shell (no extractable text).
Goldens were produced by GENERIC_EXTRACTOR_VERSION=2 and hand-audited;
any semantic change must update BOTH the goldens and the version.

destor analogue: restore byte-equality is the reference's whole
correctness story (/root/reference/src/do_restore.c:110-186); for a
crawl pipeline the extractor IS the restore path.
"""

from __future__ import annotations

import pathlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from destor_spark.operators.extract import (
    GENERIC_EXTRACTOR_VERSION,
    extract_generic_html,
)

FIXTURES = pathlib.Path(__file__).parent / "fixtures" / "html"
PAGES = sorted(p.name for p in FIXTURES.glob("*.html"))


def test_version_matches_goldens():
    """Goldens were audited at v2 and re-checked at v3 (the v3 change
    — self-closed skip tags enter skip mode — does not alter any
    committed fixture's output): regenerate + re-audit on any bump."""
    assert GENERIC_EXTRACTOR_VERSION == 3
    assert len(PAGES) >= 4


@pytest.mark.parametrize("name", PAGES)
def test_golden_byte_identity(name):
    html = (FIXTURES / name).read_bytes()
    want = (
        (FIXTURES / name).with_suffix(".golden.txt").read_text("utf-8")
    )
    got = extract_generic_html(html)
    assert (got or "") == want


@pytest.mark.parametrize("name", PAGES)
def test_idempotent_on_extracted_text(name):
    """Extraction converges in one re-application: re-extracting the
    output may only fold the block line breaks into spaces (raw '\\n'
    in character data IS whitespace under the browser rule — the rule
    that makes differently-wrapped mirrors of the same page extract
    identically), after which the text is a true fixed point."""
    got = extract_generic_html((FIXTURES / name).read_bytes())
    if got is None:
        return
    once = extract_generic_html(got.encode("utf-8"))
    if "&" not in got:
        # entity-free text: one re-application only folds line breaks
        assert once == got.replace("\n", " ")
    # ... and ALWAYS converges (text with literal entity-looking
    # sequences, e.g. the torture page's visible '&amp;', decodes one
    # more level per pass until stable)
    for _ in range(4):
        nxt = extract_generic_html(once.encode("utf-8"))
        if nxt == once:
            break
        once = nxt
    assert extract_generic_html(once.encode("utf-8")) == once


@pytest.mark.parametrize("name", PAGES)
def test_deterministic(name):
    html = (FIXTURES / name).read_bytes()
    assert extract_generic_html(html) == extract_generic_html(html)


def test_block_vs_inline_semantics():
    assert extract_generic_html(b"<p>a</p><p>b</p>") == "a\nb"
    assert extract_generic_html(b"x<br>y") == "x\ny"
    assert extract_generic_html(b"<b>a</b> <i>b</i>") == "a b"
    # source newline inside a paragraph is a SPACE (browser rule)
    assert extract_generic_html(b"<p>a\nb</p>") == "a b"


def test_entity_decode():
    assert extract_generic_html(b"&#x27;&#160;&eacute;&amp;lt;") == (
        "'\xa0\xe9&lt;"
    )


@settings(max_examples=200, deadline=None)
@given(
    st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_characters="<>&"
        ),
        max_size=120,
    )
)
def test_plain_text_roundtrip_property(t):
    """Markup-free text wrapped in a page survives modulo the
    documented whitespace normalization (hypothesis property)."""
    import re

    html = f"<html><body><p>{t}</p></body></html>".encode()
    got = extract_generic_html(html) or ""
    want = re.sub(r" {2,}", " ", re.sub(r"[ \t\r\n\f\v]+", " ", t)).strip()
    # block boundaries strip edge whitespace; interior survives
    assert got == want


def test_self_closed_script_never_leaks(spark=None):
    """HTML5 ignores the self-closing slash on non-void elements: a
    browser treats <script/> as an OPEN script tag, so its source
    must contribute NO text (v3 fix; pre-v3 it leaked)."""
    from destor_spark.operators.extract import extract_generic_html

    got = extract_generic_html(b"<p>real</p><script/>var x=1;</script><p>more</p>")
    assert got == "real\nmore"
    got2 = extract_generic_html(b"<p>a</p><style/>.x{color:red}</style>")
    assert got2 == "a"
    # unclosed self-closed script skips the rest, like a browser
    got3 = extract_generic_html(b"<p>a</p><script/>trailing junk")
    assert got3 == "a"
