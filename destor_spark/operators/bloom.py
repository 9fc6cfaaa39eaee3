"""Bloom-filter fingerprint prefilter (SURVEY H4) — DDFS's "summary
vector" (Zhu et al., FAST'08) as pure DataFrame algebra.

destor vendors a Bloom filter (/root/reference/src/utils/bloom_filter.c)
and exposes its size as `fingerprint-index-bloom-filter`
(/root/reference/src/config.c:174-176, destor.h:217): before paying a
disk lookup in the fingerprint index, a chunk's fp is tested against an
in-memory bit vector; a miss proves the chunk is new.  The Spark
restatement targets the shuffle instead of the disk: before the
probe→base equality JOIN (the expensive shuffle at 10^12 fps), probe
rows are tested against a compact bit table built from the base side —
non-members (the common case in a backup window: most chunks are new)
drop out BEFORE shuffling the full probe relation on fp.

Construction is join-based, never a driver bitmap:

  build:  base keys -> k positions via double hashing
          (h1 + i*h2 mod m, Kirsch-Mitzenmacher) -> groupBy word index
          -> bit_or of one-hot words.  Output: <= m/64 rows of
          (word, bits) — e.g. 10 bits/key at 10^9 keys = 1.25 GB of
          words SHARDED across the cluster, not a driver object.
  probe:  explode the same k positions, join words on word index
          (broadcast when the filter fits, AQE decides), a row passes
          iff ALL k probed bits are set.

EXACTNESS: membership stays probabilistic (false positives ~ fpp), so
`bloom_exact_lookup` always confirms survivors with the real equality
join — the final relation is EXACTLY the semi-join, which is what the
DuckDB oracle checks.  The filter only reduces how many rows reach the
shuffle, the same contract as destor's summary vector (false positive
=> wasted index lookup, never a wrong dedup decision).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SEED2 = 0x9E3779B9


def _positions(key_col: str, n_hashes: int, m_bits: int):
    """array of k bit positions for key_col (double hashing: h1 + i*h2
    mod m, Kirsch-Mitzenmacher; h2 forced odd so the stride cycles).
    Both hashes are reduced mod m BEFORE the combine — i*h2 on raw
    64-bit xxhash values would overflow long (Spark 4 ANSI arithmetic
    throws on overflow)."""
    h1 = F.pmod(F.xxhash64(F.col(key_col)), F.lit(m_bits))
    h2 = F.pmod(
        F.xxhash64(F.col(key_col), F.lit(_SEED2)), F.lit(m_bits)
    ) * F.lit(2) + F.lit(1)
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda i: F.pmod(h1 + i.cast("long") * h2, F.lit(m_bits)),
    )


def bloom_params(n_items: int, bits_per_key: int = 10) -> tuple[int, int]:
    """(m_bits, k_hashes) — k = round(ln2 * bits/key), the standard
    optimum (~0.0082 fpp at 10 bits/key)."""
    m_bits = max(64, n_items * bits_per_key)
    k = max(1, round(0.6931 * bits_per_key))
    return m_bits, k


def build_bloom(
    base: DataFrame, key_col: str, m_bits: int, n_hashes: int
) -> DataFrame:
    """base keys -> (word bigint, bits bigint) bit table, <= m/64 rows."""
    pos = _positions(key_col, n_hashes, m_bits)
    return (
        base.select(F.explode(pos).alias("p"))
        .select(
            (F.col("p") / 64).cast("bigint").alias("word"),
            F.expr("shiftleft(1L, int(p % 64))").alias("b"),
        )
        .groupBy("word")
        .agg(F.bit_or("b").alias("bits"))
    )


def bloom_prefilter(
    probe: DataFrame, words: DataFrame, key_col: str,
    m_bits: int, n_hashes: int,
) -> DataFrame:
    """Rows of probe whose key passes the filter (all k bits set).
    Missing words rows (never-set words) fail via the left join's null.
    One explode(k) + one join on the compact word table + one groupBy
    back to the original row set — the heavy relation never shuffles
    on the full key."""
    pos = _positions(key_col, n_hashes, m_bits)
    probed = probe.select(
        key_col,
        F.explode(pos).alias("p"),
    ).select(
        key_col,
        (F.col("p") / 64).cast("bigint").alias("word"),
        F.expr("shiftleft(1L, int(p % 64))").alias("need"),
    )
    hits = (
        probed.join(words, "word", "left")
        .withColumn(
            "ok",
            F.col("need").bitwiseAND(
                F.coalesce(F.col("bits"), F.lit(0))
            ) == F.col("need"),
        )
        .groupBy(key_col)
        .agg(F.min(F.col("ok").cast("int")).alias("all_ok"))
        .filter(F.col("all_ok") == 1)
        .select(key_col)
    )
    return probe.join(hits, key_col, "left_semi")


def bloom_exact_lookup(
    probe: DataFrame,
    base: DataFrame,
    key_col: str,
    bits_per_key: int = 10,
    n_base_hint: int | None = None,
) -> DataFrame:
    """Probe rows whose key EXISTS in base: bloom prefilter + exact
    semi-join confirm.  Result is exactly `probe SEMI JOIN base` — the
    filter only cuts shuffle volume (destor's summary vector cuts disk
    lookups the same way, config.c:174-176)."""
    n = n_base_hint if n_base_hint is not None else base.count()
    m_bits, k = bloom_params(max(1, n), bits_per_key)
    words = build_bloom(base.select(key_col), key_col, m_bits, k)
    candidates = bloom_prefilter(probe, words, key_col, m_bits, k)
    # no .distinct() on base: semi-join semantics already ignore
    # build-side duplicates, and the distinct would shuffle+agg the
    # full base relation once more for nothing at 10^12 keys
    return candidates.join(base.select(key_col), key_col, "left_semi")
