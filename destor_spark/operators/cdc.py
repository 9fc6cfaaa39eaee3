"""Content-defined chunking as a Spark stage (destor's chunk phase).

destor analogue: the chunk phase thread pulls data blocks off the read
queue and emits variable-size chunks via the selected chunker
(/root/reference/src/chunk_phase.c — chunking algorithm dispatch;
kernels in src/chunking/rabin_chunking.c and ae_chunking.c), then the
hash phase fingerprints each chunk (src/hash_phase.c, SHA-1).

Spark re-expression: one `mapInPandas` pass over the document table —
chunking is embarrassingly parallel per document, so there is NO
shuffle until the chunk-fingerprint aggregation.  The byte-level cut
kernels live in `destor_spark.chunking` (numpy-vectorized, parity-
tested against scalar transliterations of the reference walks); this
module is the Arrow plumbing plus the dedup-stats aggregation that
mirrors destor's per-job counters (src/do_backup.c:86-94:
data_size / dedup ratio printout).

Scale shape at 100 TB: the chunk pass is a map-only stage (input
splits -> chunk rows); `cdc_dedup_stats` is a single shuffle on the
160-bit chunk fingerprint (uniform keys — identical chunks are the
only collisions), with map-side partial aggregation.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from destor_spark.chunking import CUTTERS, DEF_AVG, DEF_MAX, DEF_MIN

CHUNK_SCHEMA = (
    "doc_id long, chunk_idx int, offset long, size int, fp binary"
)


def _cutter_kwargs(
    algo: str, min_size: int, avg_size: int, max_size: int
) -> dict:
    """Single dispatch point for per-algorithm cutter signatures (AE
    has no min_size — its window math supplies the lower bound).  Both
    chunk_documents and chunk_invariants MUST build kwargs here, so a
    new cutter signature cannot make the invariant certificate chunk
    with different parameters than the production chunker."""
    if algo == "ae":
        return {"avg_size": avg_size, "max_size": max_size}
    return {"min_size": min_size, "avg_size": avg_size, "max_size": max_size}


def chunk_documents(
    df: DataFrame,
    algo: str = "rabin",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_size: int = DEF_MIN,
    avg_size: int = DEF_AVG,
    max_size: int = DEF_MAX,
) -> DataFrame:
    """One row per chunk: (doc_id, chunk_idx, offset, size, sha1 fp).

    Chunk boundaries are byte offsets into the UTF-8 encoding (CDC cuts
    do not respect codepoint boundaries, exactly as destor cuts raw
    file bytes) and the fingerprint is SHA-1 of the chunk bytes
    (hash_phase.c's per-chunk digest).
    """
    cutter = CUTTERS[algo]
    kw = _cutter_kwargs(algo, min_size, avg_size, max_size)
    cols = df.select(F.col(id_col).alias("doc_id"), F.col(text_col))
    tname = text_col

    def run(batches):
        import pandas as pd

        for pdf in batches:
            ids, idxs, offs, sizes, fps = [], [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf[tname]):
                data = (text or "").encode("utf-8")
                cuts = cutter(data, **kw)
                prev = 0
                for i, end in enumerate(cuts.tolist()):
                    ids.append(doc_id)
                    idxs.append(i)
                    offs.append(prev)
                    sizes.append(end - prev)
                    fps.append(hashlib.sha1(data[prev:end]).digest())
                    prev = end
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "chunk_idx": pd.Series(idxs, dtype="int32"),
                    "offset": pd.Series(offs, dtype="int64"),
                    "size": pd.Series(sizes, dtype="int32"),
                    "fp": fps,
                }
            )

    return cols.mapInPandas(run, schema=CHUNK_SCHEMA)


def cdc_dedup_stats(chunks: DataFrame) -> DataFrame:
    """destor's backup-job counters over a chunk relation: stored bytes
    = one copy per distinct fingerprint (index lookup dedup,
    src/index/index.c exact match), dedup ratio = logical/stored
    (do_backup.c:86-94).  One shuffle on fp with map-side combine."""
    per_fp = chunks.groupBy("fp").agg(
        F.count("*").alias("refs"), F.first("size").alias("size")
    )
    return per_fp.agg(
        F.sum(F.col("refs") * F.col("size")).alias("logical_bytes"),
        F.sum("size").alias("stored_bytes"),
        F.sum("refs").alias("n_chunks"),
        F.count("*").alias("n_unique_chunks"),
        (
            F.sum(F.col("refs") * F.col("size")) / F.sum("size")
        ).alias("dedup_ratio"),
    )


def chunk_invariants(
    df: DataFrame,
    algo: str = "rabin",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_size: int = 64,
    avg_size: int = 512,
    max_size: int = 4096,
) -> DataFrame:
    """Per-document lossless-partition certificate, SQL-twinnable.

    Chunks each document, reassembles the chunk bytes in order inside
    the same Arrow batch, and emits (doc_id, total_bytes, reassembled
    md5) — equal to (octet_length(text), md5(text)) iff the cut array
    is a monotone exact partition of [0, n).  Boundary PARITY with the
    reference walks is pinned separately in tests/test_cdc.py; this
    query gates the Spark plumbing end-to-end on real data (destor's
    restore-path byte-equality check, src/do_restore.c, collapsed to
    one pass).  Map-only: no shuffle.
    """
    cutter = CUTTERS[algo]
    kw = _cutter_kwargs(algo, min_size, avg_size, max_size)
    cols = df.select(F.col(id_col).alias("doc_id"), F.col(text_col))
    tname = text_col

    def run(batches):
        import pandas as pd

        for pdf in batches:
            ids, nb, nc, digs = [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf[tname]):
                data = (text or "").encode("utf-8")
                cuts = cutter(data, **kw)
                prev = 0
                parts = []
                for end in cuts.tolist():
                    parts.append(data[prev:end])
                    prev = end
                ids.append(doc_id)
                nb.append(sum(len(p) for p in parts))
                nc.append(len(parts))
                digs.append(hashlib.md5(b"".join(parts)).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "total_bytes": pd.Series(nb, dtype="int64"),
                    "n_chunks": pd.Series(nc, dtype="int32"),
                    "reassembled_md5": digs,
                }
            )

    return cols.mapInPandas(
        run,
        schema="doc_id long, total_bytes long, n_chunks int, "
        "reassembled_md5 string",
    )
