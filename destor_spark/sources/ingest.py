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

from destor_spark.operators.extract import extract_text_udf


def ingest_html_dir(
    spark: SparkSession, path: str, glob: str = "*.html", lang: str | None = None
) -> DataFrame:
    """directory of raw html files -> web_pages(url, warc_ts, html, text, lang)."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    return raw.select(
        F.col("path").alias("url"),
        F.col("modificationTime").alias("warc_ts"),
        F.col("content").alias("html"),
        extract_text_udf(F.col("content")).alias("text"),
        F.lit(lang).cast("string").alias("lang"),
    )
