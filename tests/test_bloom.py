"""Bloom summary-vector prefilter (SURVEY H4, bloom_filter.c +
config.c:174-176): zero false negatives, bounded false positives,
exact final lookup."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from destor_spark.operators.bloom import (
    bloom_exact_lookup,
    bloom_params,
    bloom_prefilter,
    build_bloom,
)


def _tables(spark, n_base=2_000, n_probe=3_000, overlap=500, seed=3):
    rng = np.random.default_rng(seed)
    base_keys = [f"fp{i:08d}" for i in range(n_base)]
    member = list(rng.choice(n_base, size=overlap, replace=False))
    probe_keys = [f"fp{i:08d}" for i in member] + [
        f"zz{i:08d}" for i in range(n_probe - overlap)
    ]
    base = spark.createDataFrame([(k,) for k in base_keys], "fp string")
    probe = spark.createDataFrame([(k,) for k in probe_keys], "fp string")
    return base, probe, set(f"fp{i:08d}" for i in member)


def test_no_false_negatives(spark):
    """Every true member passes the prefilter (the Bloom guarantee the
    dedup decision relies on: a miss PROVES the chunk is new)."""
    base, probe, members = _tables(spark)
    m, k = bloom_params(2_000)
    words = build_bloom(base, "fp", m, k)
    passed = set(
        r["fp"] for r in bloom_prefilter(probe, words, "fp", m, k).collect()
    )
    assert members <= passed


def test_false_positive_rate_bounded(spark):
    """Non-members mostly fail: at 10 bits/key expect ~0.8% fpp; assert
    a loose 5% bound so the test is not flaky on the hash family."""
    base, probe, members = _tables(spark)
    m, k = bloom_params(2_000)
    words = build_bloom(base, "fp", m, k)
    passed = set(
        r["fp"] for r in bloom_prefilter(probe, words, "fp", m, k).collect()
    )
    non_members = 2_500
    fp = len(passed - members)
    assert fp / non_members < 0.05, f"fpp {fp / non_members}"


def test_exact_lookup_equals_semi_join(spark):
    """bloom_exact_lookup == plain semi-join, exactly (false positives
    removed by the confirm join)."""
    base, probe, members = _tables(spark)
    got = set(r["fp"] for r in bloom_exact_lookup(probe, base, "fp").collect())
    want = set(
        r["fp"]
        for r in probe.join(base, "fp", "left_semi").collect()
    )
    assert got == want == members


def test_empty_base(spark):
    """Empty base -> empty word table -> every probe row fails (left
    join null path)."""
    base = spark.createDataFrame([], "fp string")
    probe = spark.createDataFrame([("a",), ("b",)], "fp string")
    assert bloom_exact_lookup(probe, base, "fp", n_base_hint=0).count() == 0
