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

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

EXTRACTOR_VERSION = 1
GENERIC_EXTRACTOR_VERSION = 1

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


_SCRIPT_RE = re.compile(r"(?is)<(script|style)\b.*?</\1\s*>")
_COMMENT_RE = re.compile(r"(?s)<!--.*?-->")
_TAG_RE = re.compile(r"(?s)<[^>]*>")
_WS_RE = re.compile(r"\s+")


def extract_generic_html(html: bytes | None) -> str | None:
    """Deterministic general-HTML extractor (no markers required):
    drop script/style blocks and comments, strip tags, decode the basic
    entities, normalize whitespace runs to single spaces.

    Pure and versioned (GENERIC_EXTRACTOR_VERSION) like extract_text —
    byte-identity regressions are detectable the same way.  This is
    the path REAL crawl input takes; the marker extractor stays the
    frozen v1 invariant for the synth corpus (its round-trip
    extraction(render(text)) == text is exact, which tag-stripping
    cannot be).
    """
    if html is None:
        return None
    s = html.decode("utf-8", errors="replace")
    s = _SCRIPT_RE.sub(" ", s)
    s = _COMMENT_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    for k, v in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&nbsp;", " "),
        ("&amp;", "&"),  # last, so &amp;lt; decodes to &lt; not <
    ):
        s = s.replace(k, v)
    s = _WS_RE.sub(" ", s).strip()
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
