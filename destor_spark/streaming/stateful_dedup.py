"""Custom stateful streaming dedup via applyInPandasWithState.

destor's fingerprint index is exactly per-key state that survives the
stream (/root/reference/src/index/kvstore_htable.c): the first chunk
with a fingerprint is stored, later ones resolve to it.  Structured
Streaming restatement: group the stream by content hash and keep one
bit of state per key — "already emitted" — so only the FIRST document
with each content hash ever reaches the sink, across micro-batches and
restarts (state lives in the checkpoint).

This is the custom-stateful-operator path (applyInPandasWithState);
the watermarked dropDuplicates variant lives in dedup_stream.py and
the batch-join variant in dedup_stream.run_incremental_dedup.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from destor_spark.operators.exact import with_content_hash
from destor_spark.streaming.dedup_stream import WEB_PAGES_DDL

OUT_DDL = "url string, warc_ts timestamp, content_sha string"
STATE_DDL = "emitted boolean"


def _keep_first(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    if state.exists:
        return  # this content hash already produced its canonical row

    def _key(row) -> tuple:
        # batch parity: Spark ASC ordering is NULLS FIRST, so a null
        # warc_ts must WIN over any real timestamp (pandas sort_values
        # defaults NaT last, and NaT tuple comparisons are all-False,
        # which made the winner chunk-arrival-dependent).  NaT is
        # replaced by Timestamp.min so two null-ts rows still reach
        # the url tie-break (NaT < NaT is False, never True).
        ts = row["warc_ts"].iat[0]
        if pd.isna(ts):
            return (0, pd.Timestamp.min, row["url"].iat[0])
        return (1, ts, row["url"].iat[0])

    best = None
    for pdf in pdfs:
        pdf = pdf.sort_values(["warc_ts", "url"], na_position="first")
        head = pdf.iloc[[0]]
        if best is None or _key(head) < _key(best):
            best = head
    state.update((True,))
    yield best[["url", "warc_ts"]].assign(content_sha=key[0])


def stateful_exact_dedup(spark: SparkSession, in_dir: str) -> DataFrame:
    """readStream -> groupBy(content_sha) -> keep-first-with-state."""
    src = (
        spark.readStream.schema(WEB_PAGES_DDL)
        .option("maxFilesPerTrigger", 2)
        .parquet(in_dir)
    )
    hashed = with_content_hash(src).select("url", "warc_ts", "content_sha")
    return hashed.groupBy("content_sha").applyInPandasWithState(
        _keep_first,
        outputStructType=OUT_DDL,
        stateStructType=STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
