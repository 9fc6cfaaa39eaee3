"""Raw-file ingest: a directory of crawled pages -> the web_pages table.

Second source connector (destor analogue: the FSL trace reader as an
alternate input format, /root/reference/src/fsl/read_fsl_trace.c:50-163;
and the recursive directory scan, /root/reference/src/read_phase.c:65-106).

Uses Spark's binaryFile source — each file becomes one row with its
raw bytes; extraction then runs through the same versioned extractor
as the main pipeline, preserving the byte-identity invariant.  File
modification time stands in for warc_ts; the path for url.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from destor_spark.operators.extract import with_extracted_text


def ingest_html_dir(
    spark: SparkSession,
    path: str,
    glob: str = "*.html",
    lang: str | None = None,
    generic_fallback: bool = True,
) -> DataFrame:
    """directory of raw html files -> web_pages(url, warc_ts, html, text, lang).

    generic_fallback (default True here, unlike the pipeline-internal
    extractor): real crawled pages carry no synthetic text markers, so
    the marker-only v1 extractor would yield text=NULL for every row
    and the dedup job downstream would silently find nothing —
    ingest's whole purpose is external data, so the tag-strip fallback
    is on unless the caller pins marker-only semantics."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    pages = raw.select(
        F.col("path").alias("url"),
        F.col("modificationTime").alias("warc_ts"),
        F.col("content").alias("html"),
        F.lit(lang).cast("string").alias("lang"),
    )
    # same versioned extractor as the main pipeline (byte-identity
    # invariant), via the one shared helper
    return with_extracted_text(
        pages, generic_fallback=generic_fallback
    ).select("url", "warc_ts", "html", "text", "lang")
