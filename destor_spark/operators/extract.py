"""html -> text extraction with a byte-identity invariant.

The north rule requires byte-identical extracted text per url versus
the reference extractor.  ``extract_text`` is that reference extractor:
a pure, versioned function over raw bytes (html may contain invalid
UTF-8 outside the text markers).  destor analogue: restore must
reproduce files byte-identically (/root/reference/src/do_restore.c:110-186);
here extraction(render(text)) == text is the equivalent invariant,
golden-tested in tests/test_extract.py.

Spark surface: an Arrow-vectorized pandas UDF (no per-row Python UDF).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

EXTRACTOR_VERSION = 1
GENERIC_EXTRACTOR_VERSION = 3  # v3: <script/> et al. skip like open tags

_OPEN = b"<!--TEXT-->"
_CLOSE = b"<!--/TEXT-->"


def extract_text(html: bytes | None) -> str | None:
    """Pure reference extractor. Returns None when no text region exists."""
    if html is None:
        return None
    i = html.find(_OPEN)
    if i < 0:
        return None
    j = html.find(_CLOSE, i)
    if j < 0:
        return None
    body = html[i + len(_OPEN) : j]
    # errors='replace' keeps the function total on corrupt payloads;
    # the synth renderer always emits valid UTF-8 inside the markers.
    s = body.decode("utf-8", errors="replace")
    return s.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")


# v2 semantics (the versioned contract — bump GENERIC_EXTRACTOR_VERSION
# on ANY observable change):
#   * parsed with html.parser.HTMLParser (lenient, never raises), so
#     quoted '>' inside attributes, unclosed tags, and stray '<' in
#     text are handled the way browsers handle them — the v1 regex
#     tag-stripper broke on all three;
#   * script/style/noscript/template subtrees contribute NO text;
#   * ALL named + numeric character references decode (&#x27; &#160;
#     &eacute; ... — convert_charrefs), not just the 6 basic ones;
#   * block elements (p, div, li, tr, br, headings, ...) contribute a
#     line break; inline elements don't — '<p>a</p><p>b</p>' is
#     'a\nb', not 'a b';
#   * whitespace: raw whitespace in character data (including source
#     newlines inside a paragraph) collapses to a single space, the
#     browser rule; ONLY block boundaries produce '\n'.  Spaces around
#     line breaks are dropped, line-break runs collapse to one '\n',
#     ends are stripped.  NBSP (\xa0) is a real rendered character
#     and is preserved, never collapsed.  (<pre> content is normalized
#     like everything else — acceptable for dedup/quality features,
#     documented here.)
_SKIP_TAGS = frozenset({"script", "style", "noscript", "template"})
_BLOCK_TAGS = frozenset({
    "address", "article", "aside", "blockquote", "br", "caption", "dd",
    "div", "dl", "dt", "fieldset", "figcaption", "figure", "footer",
    "form", "h1", "h2", "h3", "h4", "h5", "h6", "header", "hr", "li",
    "main", "nav", "ol", "option", "p", "pre", "section", "select",
    "table", "tbody", "td", "tfoot", "th", "thead", "tr", "ul",
})
# ASCII whitespace only: \xa0 and other Unicode spaces are rendered
# characters and must survive (re's \s would eat them)
_WS_RE = re.compile(r"[ \t\r\n\f\v]+")
_NL_RE = re.compile(r" ?\n[ \n]*")


class _TextCollector(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self._skip = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip += 1
        elif tag in _BLOCK_TAGS:
            self.parts.append("\n")

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self._skip = max(0, self._skip - 1)
        elif tag in _BLOCK_TAGS:
            self.parts.append("\n")

    def handle_startendtag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            # HTML5 ignores the self-closing slash on non-void
            # elements: a browser treats <script/> as an OPEN script
            # tag and renders nothing until </script> — without this,
            # XHTML-style <script/> leaked the script source into the
            # extracted text (v3)
            self._skip += 1
        elif tag in _BLOCK_TAGS:
            self.parts.append("\n")

    def handle_data(self, data):
        if not self._skip:
            # the browser rule: raw whitespace (incl. source newlines
            # inside a paragraph) collapses to a space; only the '\n'
            # markers pushed by block tags become line breaks
            self.parts.append(_WS_RE.sub(" ", data))


def extract_generic_html(html: bytes | None) -> str | None:
    """Deterministic general-HTML extractor (no markers required); see
    the v2 semantics block above.

    Pure and versioned (GENERIC_EXTRACTOR_VERSION) like extract_text —
    byte-identity regressions are detectable the same way.  This is
    the path REAL crawl input takes (golden-tested against committed
    page fixtures in tests/test_extract_generic.py, including an
    idempotence property); the marker extractor stays the frozen v1
    invariant for the synth corpus (its round-trip
    extraction(render(text)) == text is exact, which general HTML
    extraction cannot be).
    """
    if html is None:
        return None
    p = _TextCollector()
    try:
        p.feed(html.decode("utf-8", errors="replace"))
        p.close()
    except Exception:
        # html.parser is documented lenient; belt-and-braces so one
        # pathological page can't fail a 100 TB extract stage
        return None
    s = "".join(p.parts)
    s = re.sub(r" {2,}", " ", s)  # joins across chunk boundaries
    s = _NL_RE.sub("\n", s).strip()
    return s or None


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_text)


@pandas_udf(StringType())
def extract_text_fallback_udf(html: pd.Series) -> pd.Series:
    def _one(b):
        t = extract_text(b)
        return t if t is not None else extract_generic_html(b)

    return html.map(_one)


def with_extracted_text(
    df,
    html_col: str = "html",
    out_col: str = "text",
    generic_fallback: bool = False,
):
    """Fill/replace out_col from html via the versioned extractor.

    generic_fallback=True additionally runs the tag-strip extractor on
    pages without text markers (real crawl data); default False keeps
    the frozen marker-only v1 semantics.
    """
    udf = extract_text_fallback_udf if generic_fallback else extract_text_udf
    return df.withColumn(out_col, udf(F.col(html_col)))
