"""SimHash Hamming-ball pass (second dup modality).

Catches edits below word-shingle MinHash resolution.  The 64-bit
SimHash per document is computed over the SHINGLE-hash set inside the
signature UDF (operators/minhash.py, numpy kernel hashing.simhash64
shared with the oracle) — shingle-set SimHash keeps unrelated documents
far apart even under a Zipf token distribution, where token-frequency
SimHash degenerates (top words dominate every doc's vote vector).

Candidate generation by pigeonhole: with Hamming radius 3 and 4
disjoint 16-bit blocks, any pair within the ball agrees on at least one
whole block, so equality buckets on (block_id, block_value) are a
complete candidate filter.  Verification = bit_count(a ^ b) <= radius,
pure JVM.

destor analogue: a second sampling strategy plugged into the same
feature-index machinery (sampling strategies are swappable,
/root/reference/src/index/index.h:38-39); it reuses lsh.bucket_pairs.

Scale note: 16-bit block values over 10^12 docs make dense buckets;
the cap/star strategy in bucket_pairs bounds the work, and a
multi-block combination index (8 blocks, pairs of blocks) is the
documented scale-up path if SimHash recall ever dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from destor_spark.config import DedupConfig


def explode_blocks(sigs: DataFrame, cfg: DedupConfig) -> DataFrame:
    """(url, warc_ts, simhash) -> (url, warc_ts, band=block_id, key=block)."""
    width = cfg.simhash_bits // cfg.simhash_blocks
    mask = (1 << width) - 1
    blocks = F.array(
        *[
            F.shiftrightunsigned(F.col("simhash"), i * width)
            .bitwiseAND(F.lit(mask))
            .alias(f"b{i}")
            for i in range(cfg.simhash_blocks)
        ]
    )
    return (
        sigs.filter(F.col("n_shingles") > 0)  # empty docs: no sketch
        .select("url", "warc_ts", F.posexplode(blocks).alias("band", "key"))
        # offset band ids so SimHash buckets never merge with MinHash ones
        .withColumn("band", F.col("band") + F.lit(10_000))
    )


def simhash_pairs(sigs: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Candidate + verified pairs with Hamming distance <= radius.

    sigs: the signature table from minhash.with_signatures
    (url, warc_ts, ..., n_shingles, simhash).
    """
    from destor_spark.operators.lsh import bucket_pairs

    cand, _stats = bucket_pairs(explode_blocks(sigs, cfg), cfg)
    s = sigs.select("url", "simhash")
    a = s.select(F.col("url").alias("url_a"), F.col("simhash").alias("ha"))
    b = s.select(F.col("url").alias("url_b"), F.col("simhash").alias("hb"))
    return (
        cand.join(a, "url_a")
        .join(b, "url_b")
        .filter(
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
            <= F.lit(cfg.simhash_radius)
        )
        .select("url_a", "url_b")
    )
