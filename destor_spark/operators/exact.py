"""Exact duplicate pass: group by content hash.

destor analogue: whole-file chunking + exact fingerprint index lookup
(/root/reference/src/chunk_phase.c:160-170,
/root/reference/src/index/index.c:140-216) — identical bytes resolve to
the first stored copy.  Spark: sha2(text) groupBy; dup groups emit star
edges to the group head (min (warc_ts, url)), which union-find then
merges with the near-dup pairs.

Everything JVM-side; the aggregation is a single shuffle on the
256-bit content hash (no skew: identical texts are the only collisions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_content_hash(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn(
        "content_sha",
        F.sha2(F.coalesce(F.col(text_col), F.lit("")), 256),
    )


def exact_pairs(df: DataFrame) -> DataFrame:
    """(url, warc_ts, content_sha) -> star edges (url_a=head, url_b=member)."""
    heads = (
        df.groupBy("content_sha")
        .agg(
            F.min(F.struct("warc_ts", "url")).alias("head"),
            F.count("*").alias("n"),
        )
        .filter(F.col("n") >= 2)
        .select("content_sha", F.col("head.url").alias("url_a"))
    )
    return (
        df.join(heads, "content_sha")
        .filter(F.col("url") != F.col("url_a"))
        .select("url_a", F.col("url").alias("url_b"))
    )
