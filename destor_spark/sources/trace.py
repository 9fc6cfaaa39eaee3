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

Two formats ship here: DSTR1 (our minimal fixed-width layout, above)
and — since r4 — the literal SUNY FSL hashfile v3 layout destor reads
through its vendored libhashfile (read_fsl_trace below), so recorded
FSL traces replay without conversion.  The parity target for both is
destor's REPLAY SEMANTICS (same trace in, same dedup stats out), which
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


# ---------------------------------------------------------------------------
# FSL hashfile codec — the literal SUNY trace layout destor reads
# (/root/reference/src/fsl/libhashfile.h:222-265, read by
# /root/reference/src/fsl/read_fsl_trace.c:50-163).  Version 3:
#
#   header_v3 (8288 bytes, packed):
#     u32 magic=0xDEADDEAD | u32 version=3 | u64 files
#     char path_root[4096] | u64 chunks | u32 chnk_method (1=FIXED,
#     2=VARIABLE) | 44-byte chnk params union | u32 hsh_method |
#     u32 hash_size (bits) | char sysid[4096] | u64 start | u64 end
#   then per file: file_header_v2 (u64 file_size | u64 chunks |
#     u32 pathlen | path[pathlen]) followed by its chunk records —
#     FIXED: <hash>... ; VARIABLE: <u64 chunk_size><hash>...
#
# The chunk params union is sizeof(var_chnking_params) = 44: algo u32 +
# 32-byte algo union (rabin: window u32, prime u64, module u64, bits
# u32, pattern u64) + min_csize u32 + max_csize u32.
# ---------------------------------------------------------------------------

FSL_MAGIC = 0xDEADDEAD
_FSL_PATH = 4096
_FSL_SYSID = 4096
_FSL_UNION = 44
_FSL_HEADER_V3 = 4 + 4 + 8 + _FSL_PATH + 8 + 4 + _FSL_UNION + 4 + 4 + _FSL_SYSID + 8 + 8

FSL_SCHEMA = "trace_file string, file_path string, fp string, size bigint"


def write_fsl_hashfile(
    path: str,
    files: list[tuple[str, list[tuple[bytes, int]]]],
    chunking: str = "variable",
    fixed_chunk_size: int = 4096,
    sysid: str = "destor-spark-fixture",
    path_root: str = "/fixture",
) -> None:
    """Write a v3 FSL hashfile.  files: [(file_path, [(digest, size)])];
    every digest must share one length (hash_size).  FIXED chunking
    stores no per-chunk sizes on disk — pass the TRUE sizes (chunk_size
    everywhere except a possibly-short tail): file_size is written as
    their sum, which is exactly what libhashfile's reader uses to
    reconstruct the tail chunk (libhashfile.c:898-913)."""
    if not files or not files[0][1]:
        raise ValueError("need at least one file with one chunk")
    hash_bytes = len(files[0][1][0][0])
    total_chunks = sum(len(cs) for _, cs in files)
    with open(path, "wb") as f:
        hdr = struct.pack("<II", FSL_MAGIC, 3)
        hdr += struct.pack("<Q", len(files))
        hdr += path_root.encode()[: _FSL_PATH].ljust(_FSL_PATH, b"\x00")
        hdr += struct.pack("<Q", total_chunks)
        if chunking == "fixed":
            hdr += struct.pack("<I", 1)
            hdr += struct.pack("<I", fixed_chunk_size).ljust(_FSL_UNION, b"\x00")
        else:
            hdr += struct.pack("<I", 2)
            # var_chnking_params: algo=RABIN(3) + rabin params + min/max
            rabin = struct.pack("<IQQIQ", 48, 1048583, 1 << 20, 13, 0x1FFF)
            hdr += (
                struct.pack("<I", 3) + rabin.ljust(32, b"\x00")
                + struct.pack("<II", 2048, 65536)
            )
        hsh = {16: 1, 32: 2, 6: 3, 8: 5, 20: 6}.get(hash_bytes, 1)
        hdr += struct.pack("<II", hsh, hash_bytes * 8)
        hdr += sysid.encode()[: _FSL_SYSID].ljust(_FSL_SYSID, b"\x00")
        hdr += struct.pack("<QQ", 1_700_000_000, 1_700_000_600)
        assert len(hdr) == _FSL_HEADER_V3
        f.write(hdr)
        for fpath, chunks in files:
            p = fpath.encode()
            fsize = sum(s for _, s in chunks)
            f.write(struct.pack("<QQI", fsize, len(chunks), len(p)) + p)
            for digest, size in chunks:
                if len(digest) != hash_bytes:
                    raise ValueError("inconsistent digest length")
                if chunking == "fixed":
                    f.write(digest)
                else:
                    f.write(struct.pack("<Q", size) + digest)


_HEX_LUT = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)


def _hex_column(digests: np.ndarray) -> pd.Series:
    """(n, hash_bytes) uint8 -> lowercase-hex Series, LUT gather."""
    n, hb = digests.shape
    flat = digests.reshape(-1)
    chars = np.empty((flat.size, 2), dtype=np.uint8)
    chars[:, 0] = _HEX_LUT[flat >> 4]
    chars[:, 1] = _HEX_LUT[flat & 0xF]
    fixed = chars.reshape(n, 2 * hb).copy().view(f"S{2 * hb}").reshape(n)
    return pd.Series(fixed).str.decode("ascii")


def read_fsl_trace(spark: SparkSession, path: str) -> DataFrame:
    """FSL hashfile(s) -> (trace_file, file_path, fp, size).

    Python touches one iteration per FILE record (the per-chunk arrays
    are strided numpy views + one LUT hex gather); same ~2 GB
    single-file cap as read_trace (binaryFile delivers whole files).
    FIXED-chunking traces carry no per-chunk sizes: chunks report the
    configured chunk_size except each file's LAST chunk, which reports
    min(chunk_size, file_size - (chunks-1)*chunk_size) — libhashfile's
    tail-detection rule (libhashfile.c:898-913) — so replay byte totals
    match destor's exactly on non-multiple file sizes."""

    def _unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for fname, blob in zip(pdf["path"], pdf["content"]):
                b = bytes(blob)
                if len(b) < _FSL_HEADER_V3:
                    raise ValueError(f"short FSL header in {fname}")
                magic, version = struct.unpack_from("<II", b, 0)
                if magic != FSL_MAGIC:
                    raise ValueError(f"bad FSL magic in {fname}")
                if version != 3:
                    raise ValueError(
                        f"unsupported FSL version {version} in {fname}"
                    )
                off = 8 + 8 + _FSL_PATH + 8
                (chnk_method,) = struct.unpack_from("<I", b, off)
                params = b[off + 4 : off + 4 + _FSL_UNION]
                (fixed_size,) = struct.unpack_from("<I", params, 0)
                off += 4 + _FSL_UNION
                _hsh, hash_bits = struct.unpack_from("<II", b, off)
                hb = hash_bits // 8
                pos = _FSL_HEADER_V3
                frames = []
                while pos < len(b):
                    fsize, nchunks, plen = struct.unpack_from("<QQI", b, pos)
                    pos += 20
                    fpath = b[pos : pos + plen].decode("utf-8", "replace")
                    pos += plen
                    if chnk_method == 1:  # FIXED: hashes only
                        rec = hb
                        arr = np.frombuffer(
                            b, dtype=np.uint8, count=nchunks * rec, offset=pos
                        ).reshape(-1, rec)
                        digests = np.ascontiguousarray(arr)
                        sizes = np.full(nchunks, fixed_size, dtype=np.int64)
                        if nchunks > 0:
                            # last chunk = file remainder, capped at
                            # chunk_size ("detect if tail was on or
                            # off" — libhashfile.c:898-913); without
                            # this, replay byte totals diverge from
                            # destor's on any file whose size is not a
                            # chunk-size multiple
                            sizes[-1] = min(
                                fixed_size,
                                fsize - (nchunks - 1) * fixed_size,
                            )
                    else:  # VARIABLE: u64 size + hash
                        rec = 8 + hb
                        arr = np.frombuffer(
                            b, dtype=np.uint8, count=nchunks * rec, offset=pos
                        ).reshape(-1, rec)
                        sizes = (
                            arr[:, :8].copy().view("<u8").reshape(-1)
                            .astype(np.int64)
                        )
                        digests = np.ascontiguousarray(arr[:, 8:])
                    pos += nchunks * rec
                    frames.append(
                        pd.DataFrame(
                            {
                                "trace_file": fname,
                                "file_path": fpath,
                                "fp": _hex_column(digests),
                                "size": sizes,
                            }
                        )
                    )
                if frames:
                    yield pd.concat(frames, ignore_index=True)

    src = spark.read.format("binaryFile").load(path)
    return src.select("path", "content").mapInPandas(_unpack, schema=FSL_SCHEMA)
