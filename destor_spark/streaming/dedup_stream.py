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

import os

from pyspark.sql import DataFrame, SparkSession
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
) -> None:
    """foreachBatch incremental LSH dedup: each micro-batch's signatures
    are banded, joined against the accumulated signature store, and new
    verified pairs appended.  availableNow trigger => terminates when
    the input backlog is drained (test-friendly, also the production
    catch-up mode)."""
    sig_store = os.path.join(state_dir, "signatures")
    pair_store = os.path.join(state_dir, "pairs")
    ckpt = os.path.join(state_dir, "_checkpoint")

    src = (
        spark.readStream.schema(WEB_PAGES_DDL)
        .option("maxFilesPerTrigger", 4)
        .parquet(in_dir)
    )

    def _process(batch: DataFrame, batch_id: int) -> None:
        sigs = signatures_stage(batch, cfg)
        if os.path.exists(sig_store):
            store = spark.read.parquet(sig_store)
            both = sigs.unionByName(store)
        else:
            both = sigs
        # candidates limited to buckets touched by this batch
        new_bands = lsh_op.explode_bands(sigs).select("band", "key").distinct()
        touched = lsh_op.explode_bands(both).join(
            F.broadcast(new_bands), ["band", "key"], "left_semi"
        )
        pairs, _ = lsh_op.bucket_pairs(touched, cfg)
        verified = verify_op.verify_pairs(pairs, both, cfg)
        verified.write.mode("append").parquet(pair_store)
        sigs.write.mode("append").parquet(sig_store)

    q = (
        src.writeStream.foreachBatch(_process)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
