"""LRU-bounded CFL monitor (restore_aware.c:30-57): Spark per-stream
simulation == independent Python simulation; bounded vs infinite cache
semantics pinned."""

from __future__ import annotations

import numpy as np
import pandas as pd

from destor_spark.operators.restore_sim import bounded_cfl, simulate_lru_ccf

CONTAINER = 1_000


def _refs(seed: int, n_streams: int, n_refs: int, n_containers: int):
    """Skewed reference stream: hot containers recur (cache-friendly),
    cold tail forces evictions."""
    rng = np.random.default_rng(seed)
    rows = []
    for s in range(n_streams):
        hot = rng.integers(0, max(2, n_containers // 10), size=n_refs // 2)
        cold = rng.integers(0, n_containers, size=n_refs - n_refs // 2)
        containers = np.concatenate([hot, cold])
        rng.shuffle(containers)
        for i, c in enumerate(containers):
            rows.append((f"s{s}", i, int(c), int(rng.integers(100, 400))))
    return pd.DataFrame(rows, columns=["stream", "seq", "container", "bytes"])


def test_bounded_matches_independent_sim(spark):
    pdf = _refs(11, n_streams=3, n_refs=400, n_containers=60)
    refs = spark.createDataFrame(pdf)
    K = 8
    got = (
        bounded_cfl(refs, cache_size=K, container_bytes=CONTAINER)
        .toPandas()
        .set_index("stream")
        .sort_index()
    )
    for s, grp in pdf.groupby("stream"):
        seq = grp.sort_values("seq")["container"].tolist()
        want_ccf = simulate_lru_ccf(seq, K)
        # independent re-simulation (not the module function): plain
        # list-based LRU, different data structure, same semantics
        lru: list[int] = []
        fetches = 0
        for c in seq:
            if c in lru:
                lru.remove(c)
                lru.append(c)
            else:
                fetches += 1
                lru.append(c)
                if len(lru) > K:
                    lru.pop(0)
        assert want_ccf == fetches
        assert got.loc[s, "ccf"] == fetches
        total = int(grp["bytes"].sum())
        ocf = -(-total // CONTAINER)
        assert got.loc[s, "ocf"] == ocf
        assert got.loc[s, "cfl_ppm"] == min(
            1_000_000, round(1_000_000 * ocf / fetches)
        )


def test_infinite_cache_equals_distinct(spark):
    """cache_size >= distinct containers -> ccf == distinct count (the
    infinite-cache ccf of queries.q_cfl_monitor)."""
    pdf = _refs(7, n_streams=2, n_refs=300, n_containers=40)
    refs = spark.createDataFrame(pdf)
    got = (
        bounded_cfl(refs, cache_size=10_000, container_bytes=CONTAINER)
        .toPandas()
        .set_index("stream")
    )
    for s, grp in pdf.groupby("stream"):
        assert got.loc[s, "ccf"] == grp["container"].nunique()


def test_small_cache_refetches(spark):
    """Evictions force re-fetches: ccf(bounded) > ccf(infinite) on a
    cyclic pattern wider than the cache (worst case for LRU)."""
    n = 50
    seq = list(range(5)) * n  # cycle of 5 containers
    pdf = pd.DataFrame(
        {
            "stream": "s0",
            "seq": range(5 * n),
            "container": seq,
            "bytes": 100,
        }
    )
    refs = spark.createDataFrame(pdf)
    tight = bounded_cfl(refs, cache_size=4, container_bytes=CONTAINER)
    roomy = bounded_cfl(refs, cache_size=5, container_bytes=CONTAINER)
    assert tight.collect()[0]["ccf"] == 5 * n  # every ref misses
    assert roomy.collect()[0]["ccf"] == 5
