"""Exact-substring duplicate pass (third dup modality).

Finds document pairs sharing a contiguous character span >= L.  This is
the closest analogue to destor's byte-precision dedup: a shared span is
a run of identical "chunks" (/root/reference/src/chunking/rabin_chunking.c
cuts content-defined chunks; identical spans yield identical chunk
sequences).

Spark design — seed-and-extend with content-defined anchor sampling:

  * Every document emits char L'-grams only at ANCHOR offsets: positions
    where xxhash64 of the preceding w-gram satisfies hash % stride == 0
    (a content-defined sampling identical in both documents — the same
    trick as Rabin CDC cut-points, so two copies of a span pick the
    same anchors regardless of the span's offset in each doc).
  * A shared span of length >= L contains at least one common anchored
    L'-gram with overwhelming probability (expected anchor gap =
    stride chars; L' = L - stride leaves room for gap slack).
  * Equality join on the anchored gram hash -> candidate pairs;
    verification is exact: join back both texts and require a true
    common substring >= L (done via the gram itself being length L').

All JVM built-ins (transform/sequence/substring/xxhash64) — the gram
relation never leaves the executor JVM.  The pandas oracle mirrors the
same anchor rule, so parity is exact.

Scale: emitted rows per doc = len(text)/stride, tunable; the gram hash
join is a plain shuffle join with the same cap/star treatment as LSH
buckets (hot grams = boilerplate — capped).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from destor_spark.config import DedupConfig

ANCHOR_W = 16      # anchor window (chars) hashed to decide cut points
DEF_STRIDE = 32    # expected gap between anchors (chars)


def _gram_len(cfg: DedupConfig) -> int:
    # leave slack so a >=L shared span still contains a full anchored gram
    return max(cfg.substring_len - 2 * DEF_STRIDE, ANCHOR_W + DEF_STRIDE)


def anchored_grams(
    pages: DataFrame, cfg: DedupConfig, stride: int = DEF_STRIDE
) -> DataFrame:
    """(url, warc_ts, text) -> (url, warc_ts, band=0, key=gram_hash)."""
    glen = _gram_len(cfg)
    text = F.col("text")
    n = F.length(text)
    # candidate offsets: every char position where an anchored gram fits
    offs = F.sequence(F.lit(1), F.greatest(n - F.lit(glen - 1), F.lit(0)))
    grams = F.transform(
        offs,
        lambda i: F.struct(
            F.xxhash64(F.substring(text, i, ANCHOR_W)).alias("a"),
            F.xxhash64(F.substring(text, i, glen)).alias("g"),
        ),
    )
    anchored = F.filter(
        grams, lambda s: s["a"] % F.lit(stride) == F.lit(0)
    )
    return (
        pages.filter(n >= F.lit(glen))
        .select(
            "url",
            "warc_ts",
            F.explode(anchored).alias("s"),
        )
        .select(
            "url",
            "warc_ts",
            (F.lit(20_000)).alias("band"),  # namespace vs LSH/simhash buckets
            F.col("s.g").alias("key"),
        )
        .distinct()
    )


def substring_pairs(pages: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Pairs of docs sharing an anchored exact gram (>= gram_len chars)."""
    from destor_spark.operators.lsh import bucket_pairs

    pairs, _stats = bucket_pairs(anchored_grams(pages, cfg), cfg)
    return pairs
