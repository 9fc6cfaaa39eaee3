"""Incremental dedup over a document stream (Structured Streaming).

destor is itself a single-pass streaming dedup engine: each incoming
chunk is looked up against the accumulating fingerprint index
(/root/reference/src/index/index.c:140-216).  The Spark restatement for
documents:

  readStream (file source of web_pages batches)
    -> exact pass: dropDuplicates on content hash with a watermark
       (state = the fingerprint index; watermark bounds it, exactly the
       role of destor's bounded fingerprint cache, fast15 sec 4.1)
    -> signature stage (same Arrow UDF as batch — code reuse is total)
    -> foreachBatch: LSH pairs of the micro-batch vs the accumulated
       signature table (the "kv index" as a growing parquet table),
       append new assignments.

The micro-batch join against accumulated state is destor's
index-buffer + kv-store cascade (src/index/index.c:150-216) with the
batch as the buffer.  Tested end-to-end with the file source in
tests/test_streaming.py (availableNow trigger, no wall-clock waits).
"""

from __future__ import annotations

import json
import os
import shutil

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from destor_spark.config import DedupConfig
from destor_spark.operators import exact as exact_op
from destor_spark.operators import lsh as lsh_op
from destor_spark.operators import verify as verify_op
from destor_spark.plans.pipeline import signatures_stage

WEB_PAGES_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def stream_exact_dedup(
    spark: SparkSession,
    in_dir: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """readStream -> watermark -> dropDuplicates(content hash).

    Returns the streaming DataFrame (caller attaches the sink).  State
    is bounded by the event-time watermark — late duplicates beyond the
    watermark are not deduped, mirroring destor's bounded cache."""
    src = (
        spark.readStream.schema(WEB_PAGES_DDL)
        .option("maxFilesPerTrigger", 4)
        .parquet(in_dir)
    )
    hashed = exact_op.with_content_hash(src)
    return hashed.withWatermark("warc_ts", watermark).dropDuplicates(
        ["content_sha"]
    )


def run_incremental_dedup(
    spark: SparkSession,
    in_dir: str,
    state_dir: str,
    cfg: DedupConfig,
    value_len: int = 64,
    n_key_buckets: int = 64,
    n_url_buckets: int = 64,
    max_event_age: str | None = None,
) -> None:
    """foreachBatch incremental LSH dedup with a BOUNDED, PRUNED store.

    Store layout (the destor kv index, restated for files):

      * band_store/ — the exploded (url, warc_ts, bid, band, key)
        membership relation, hash-partitioned on kb = pmod(key,
        n_key_buckets).  A micro-batch only READS the kb partitions its
        own keys land in (partition pruning — asserted in
        tests/test_streaming.py) and only REWRITES those partitions
        (dynamic partition overwrite), so per-batch IO is bounded by
        the batch's bucket footprint, not the corpus.
      * FIFO newest-k retention: each (band, key) keeps only the
        value_len most recent members by arrival (batch id, then
        warc_ts, url) — exactly destor's index_value_length FIFO rule
        (/root/reference/src/index/kvstore_htable.c:44-53, "value[0]
        keeps the latest ID").  Retention is applied on the touched
        partitions at every rewrite, so the physical store is bounded
        too.  Consequence (destor-identical): a document evicted from
        a bucket cannot match FUTURE arrivals through that bucket.
      * signatures/ — (url, warc_ts, sig, ...) partitioned on
        ub = pmod(xxhash64(url), n_url_buckets); verification reads
        only the ub partitions of the candidate pairs' urls.

    Emitted pairs are restricted to those involving at least one url
    from the current batch (old-old pairs were emitted when first
    seen), so the pair store grows with new data only.  availableNow
    trigger => terminates when the backlog drains.

    Event-time retention (max_event_age, e.g. "7 days"): alongside the
    batch-arrival FIFO, an event-time watermark — the max warc_ts seen
    across all batches, persisted monotonically in
    state_dir/watermark.json — defines a horizon = watermark - age.
    Same semantics as Spark's own streaming watermark, applied to the
    LSH branch:
      * LATE-DATA DROP: batch rows with warc_ts < horizon never enter
        the band store and generate no pairs (a too-late document is
        not deduplicated — destor's bounded fingerprint cache has the
        identical miss semantics for evicted entries);
      * STATE EVICTION: on every touched-partition rewrite, stored
        members with warc_ts < horizon are dropped, so bucket state is
        bounded by the event-time window as well as by the FIFO k.
        Untouched partitions evict lazily at their next touch (their
        bytes are already bounded by the FIFO rule).
    None (default) disables event-time retention (FIFO only).
    """
    from destor_spark.plans.pipeline import _materialize, _mat_root

    band_store = os.path.join(state_dir, "band_store")
    sig_store = os.path.join(state_dir, "signatures")
    pair_store = os.path.join(state_dir, "pairs")
    ckpt = os.path.join(state_dir, "_checkpoint")
    wm_path = os.path.join(state_dir, "watermark.json")
    age = pd.Timedelta(max_event_age) if max_event_age else None

    src = (
        spark.readStream.schema(WEB_PAGES_DDL)
        .option("maxFilesPerTrigger", 4)
        .parquet(in_dir)
    )

    band_cols = ["url", "warc_ts", "bid", "band", "key"]

    def _process(batch: DataFrame, batch_id: int) -> None:
        # per-batch barrier dir, removed before the batch returns: a
        # long-lived driver must not accumulate b{id}_* intermediates
        # (the band/sig/pair STORES are the durable state, not these)
        root = _mat_root(spark)
        try:
            _process_inner(batch, batch_id, root)
        finally:
            shutil.rmtree(root, ignore_errors=True)

    def _process_inner(
        batch: DataFrame, batch_id: int, root: str
    ) -> None:
        sigs = _materialize(
            signatures_stage(batch, cfg), f"b{batch_id}_sigs", root
        )
        horizon = None
        if age is not None:
            prev = None
            if os.path.exists(wm_path):
                with open(wm_path) as f:
                    prev = pd.Timestamp(json.load(f)["watermark"])
            row = sigs.agg(F.max("warc_ts").alias("m")).first()
            batch_max = pd.Timestamp(row["m"]) if row["m"] else None
            wm = max(p for p in (prev, batch_max) if p is not None) \
                if (prev or batch_max) else None
            if wm is not None:
                with open(wm_path, "w") as f:
                    json.dump({"watermark": wm.isoformat()}, f)
                horizon = wm - age
        new_bands = lsh_op.explode_bands(sigs).select(
            "url",
            "warc_ts",
            F.lit(batch_id).alias("bid"),
            "band",
            "key",
            F.pmod("key", F.lit(n_key_buckets)).alias("kb"),
        )
        if horizon is not None:
            # late-data drop: too-late rows join no bucket
            new_bands = new_bands.filter(
                F.col("warc_ts") >= F.lit(horizon.isoformat()).cast(
                    "timestamp"
                )
            )
        touched_kbs = [
            r["kb"] for r in new_bands.select("kb").distinct().collect()
        ]

        if os.path.exists(band_store):
            old = spark.read.parquet(band_store).filter(
                F.col("kb").isin(touched_kbs)
            )
            merged = old.select(*band_cols, "kb").unionByName(new_bands)
        else:
            merged = new_bands

        if horizon is not None:
            # event-time eviction on the partitions being rewritten
            merged = merged.filter(
                F.col("warc_ts") >= F.lit(horizon.isoformat()).cast(
                    "timestamp"
                )
            )

        # FIFO newest-k per (band, key): arrival order = (bid, warc_ts, url)
        w = Window.partitionBy("band", "key").orderBy(
            F.desc("bid"), F.desc("warc_ts"), F.desc("url")
        )
        retained = _materialize(  # barrier: store is read AND rewritten
            merged.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= value_len)
            .drop("rn"),
            f"b{batch_id}_retained",
            root,
        )
        (
            retained.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("kb")
            .parquet(band_store)
        )

        # candidates: only buckets this batch touched, only retained members
        new_keys = new_bands.select("band", "key").distinct()
        members = retained.join(
            F.broadcast(new_keys), ["band", "key"], "left_semi"
        ).select("url", "warc_ts", "band", "key")
        pairs, _stats = lsh_op.bucket_pairs(members, cfg)
        new_urls = sigs.select("url")
        pairs = _materialize(
            pairs.join(
                F.broadcast(new_urls.withColumnRenamed("url", "url_a")),
                "url_a",
                "left_semi",
            )
            .unionByName(
                pairs.join(
                    F.broadcast(
                        new_urls.withColumnRenamed("url", "url_b")
                    ),
                    "url_b",
                    "left_semi",
                )
            )
            .distinct(),
            f"b{batch_id}_pairs",
            root,
        )

        # verification: read only the url-hash partitions the pairs touch
        urls_needed = (
            pairs.select(F.col("url_a").alias("url"))
            .unionByName(pairs.select(F.col("url_b").alias("url")))
            .distinct()
        )
        ubs = [
            r["ub"]
            for r in urls_needed.select(
                F.pmod(F.xxhash64("url"), F.lit(n_url_buckets)).alias("ub")
            )
            .distinct()
            .collect()
        ]
        all_sigs = sigs
        if os.path.exists(sig_store) and ubs:
            old_sigs = (
                spark.read.parquet(sig_store)
                .filter(F.col("ub").isin(ubs))
                .drop("ub")
            )
            all_sigs = sigs.unionByName(old_sigs)
        verified = verify_op.verify_pairs(pairs, all_sigs, cfg)
        verified.write.mode("append").parquet(pair_store)
        (
            sigs.withColumn(
                "ub", F.pmod(F.xxhash64("url"), F.lit(n_url_buckets))
            )
            .write.mode("append")
            .partitionBy("ub")
            .parquet(sig_store)
        )

    q = (
        src.writeStream.foreachBatch(_process)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
