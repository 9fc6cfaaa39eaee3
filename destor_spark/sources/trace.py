"""Binary fingerprint-trace IO: destor's trace-driven replay mode.

destor can run its whole dedup pipeline from a recorded hash trace
instead of raw data (trace_phase, /root/reference/src/trace_phase.c:
96-142: replaying recorded (fp, size) chunk records must yield
identical dedup stats), and reads a second on-disk trace format via
the vendored FSL hashfile library.  This module is the Spark
restatement: a documented fixed-width binary record format

    DSTR1 magic (5 bytes) | records: 16-byte digest + 4-byte LE size

written/read without any Python-per-row work on the Spark side — files
arrive whole via the `binaryFile` source and are unpacked into Arrow
batches with numpy frombuffer inside one mapInPandas pass (a 1 GB
trace file is ~50M records: one worker unpacks it in two vectorized
numpy calls, no record loop).

The format here is OUR format (public struct layout documented above),
not a copy of the FSL hashfile codec — the parity target is destor's
REPLAY SEMANTICS (same trace in, same dedup stats out), which
`replay_dedup_stats` implements and tests/test_trace.py pins against
an independently computed expectation.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAGIC = b"DSTR1"
RECORD = 20  # 16-byte digest + uint32 LE size

TRACE_SCHEMA = "trace_file string, fp string, size bigint"


def write_trace(path: str, records: list[tuple[bytes, int]]) -> None:
    """Write (digest16, size) records; digest must be exactly 16 bytes."""
    with open(path, "wb") as f:
        f.write(MAGIC)
        for fp, size in records:
            if len(fp) != 16:
                raise ValueError("digest must be 16 bytes")
            f.write(fp + struct.pack("<I", size))


def read_trace(spark: SparkSession, path: str) -> DataFrame:
    """Directory (or glob) of trace files -> (trace_file, fp, size).

    fp is hex (32 chars).  One mapInPandas pass; each input file is
    one Arrow row from the binaryFile source, unpacked with vectorized
    numpy — the hex encode is a nibble-LUT gather over the whole
    buffer, no per-record Python loop.

    Size cap: the binaryFile source delivers each file as ONE row, so
    a single trace file must stay under Spark's ~2 GB byte-array row
    limit (~100M records).  Shard larger traces into multiple files —
    the reader takes a directory/glob and parallelizes per file.
    """
    _LUT = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)

    def _unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for fname, blob in zip(pdf["path"], pdf["content"]):
                b = bytes(blob)
                if not b.startswith(MAGIC):
                    raise ValueError(f"bad trace magic in {fname}")
                body = b[len(MAGIC):]
                if len(body) % RECORD:
                    raise ValueError(f"truncated trace {fname}")
                arr = np.frombuffer(body, dtype=np.uint8).reshape(-1, RECORD)
                digests = np.ascontiguousarray(arr[:, :16])
                sizes = (
                    arr[:, 16:20]
                    .copy()
                    .view("<u4")
                    .reshape(-1)
                    .astype(np.int64)
                )
                # vectorized hex: per-nibble LUT gather, then view the
                # (n, 32) char matrix as one fixed-width bytes column
                flat = digests.reshape(-1)
                chars = np.empty((flat.size, 2), dtype=np.uint8)
                chars[:, 0] = _LUT[flat >> 4]
                chars[:, 1] = _LUT[flat & 0xF]
                hexes = (
                    chars.reshape(-1, 32).view("S32").reshape(-1)
                )
                hexes = pd.Series(hexes).str.decode("ascii")
                yield pd.DataFrame(
                    {
                        "trace_file": fname,
                        "fp": hexes,
                        "size": sizes,
                    }
                )

    src = spark.read.format("binaryFile").load(path)
    return src.select("path", "content").mapInPandas(
        _unpack, schema=TRACE_SCHEMA
    )


def replay_dedup_stats(trace: DataFrame) -> DataFrame:
    """destor's trace replay invariant (trace_phase.c:96-142): dedup
    stats computed from the recorded hashes alone.  One hash-groupBy
    shuffle; identical to running the exact pass over the original
    data."""
    per_fp = trace.groupBy("fp").agg(
        F.count("*").alias("refs"),
        F.min("size").alias("size"),
    )
    return per_fp.agg(
        F.count("*").alias("unique_chunks"),
        F.sum("refs").alias("total_chunks"),
        F.sum(F.col("refs") * F.col("size")).alias("logical_bytes"),
        F.sum("size").alias("stored_bytes"),
        F.round(
            F.lit(1_000_000)
            * F.sum(F.col("refs") * F.col("size"))
            / F.sum("size")
        )
        .cast("bigint")
        .alias("dedup_ratio_ppm"),
    )
