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

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

EXTRACTOR_VERSION = 1

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


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_text)


def with_extracted_text(df, html_col: str = "html", out_col: str = "text"):
    """Fill/replace out_col from html via the versioned extractor."""
    return df.withColumn(out_col, extract_text_udf(F.col(html_col)))
