"""Cluster assignment + canonical selection.

destor analogue: the recipe — the per-backup record that maps every
file to its stored (deduplicated) chunks and makes restore possible
(/root/reference/src/recipe/recipestore.h:25-52).  Our assignment table
(url, warc_ts, cluster_id, is_canonical, cluster_size) is the lineage
record: keep rows where is_canonical (the dedup output) or join any url
back to its canonical text (the restore path).

Canonical = first occurrence by (warc_ts, url) inside the cluster —
destor's first-copy-wins made deterministic
(/root/reference/src/index/kvstore_htable.c:44-53; SURVEY.md J7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assignments(pages: DataFrame, components: DataFrame) -> DataFrame:
    """pages(url, warc_ts, ...) x components(url, cluster_id) -> assignment.

    ONE row per url: document identity is the url, so a re-crawled
    page (same url, multiple warc_ts rows) is one document whose
    identity timestamp is its EARLIEST crawl — the same min-wins rule
    the oracle's _order_map applies and destor's first-copy-wins
    implies.  cluster_size therefore counts DOCUMENTS, not crawl rows.
    Docs absent from components are singletons (cluster_id = own url).
    """
    docs = pages.groupBy("url").agg(F.min("warc_ts").alias("warc_ts"))
    joined = docs.join(components, "url", "left")
    labeled = joined.withColumn(
        "cluster_id", F.coalesce(F.col("cluster_id"), F.col("url"))
    )
    w = Window.partitionBy("cluster_id").orderBy("warc_ts", "url")
    return (
        labeled.withColumn(
            "is_canonical", F.row_number().over(w) == F.lit(1)
        )
        .withColumn(
            "cluster_size", F.count("*").over(Window.partitionBy("cluster_id"))
        )
    )


def restore(pages: DataFrame, assign: DataFrame) -> DataFrame:
    """Reconstruct (url, text) for every url from its canonical copy.

    The verification oracle: for EXACT clusters restored text is
    byte-identical to the input (destor restore byte-equality,
    /root/reference/src/do_restore.c:110-186).  Used by tests.
    """
    # one text per url (earliest crawl wins): joining on url alone
    # would fan a re-crawled canonical out per text version, emitting
    # duplicated rows with conflicting restored texts
    w = Window.partitionBy("url").orderBy("warc_ts")
    first_text = (
        pages.select("url", "warc_ts", "text")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("url", "text")
    )
    canon_text = (
        assign.filter("is_canonical")
        .select("cluster_id", "url")
        .join(first_text, "url")
        .select("cluster_id", F.col("text").alias("canonical_text"))
    )
    return (
        assign.select("url", "cluster_id")
        .join(canon_text, "cluster_id")
        .select("url", F.col("canonical_text").alias("text"))
    )
