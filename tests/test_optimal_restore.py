"""Belady restore cache (operators/optimal_restore.py) parity gates.

Independent anchor: with an unbounded lookahead window, destor's
eviction rule (dead-containers-first, else farthest next use —
optimal_restore.c:183-231) must achieve EXACTLY the fetch count of a
textbook Belady-MIN simulator, because evicting a never-again-used
container can never cause a future miss and otherwise the rule IS MIN.
The textbook simulator below shares no code or structure with the
operator's windowed implementation.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from destor_spark.operators.optimal_restore import (
    optimal_restore_stats,
    simulate_optimal_fetches,
)
from destor_spark.operators.restore_sim import simulate_lru_ccf


def _min_fetches(raw, cache_size: int) -> int:
    """Textbook Belady MIN over the collapsed sequence: evict the
    cached item whose next use is farthest (never-used = +inf)."""
    seq = []
    last = None
    for c in raw:
        if c != last:
            seq.append(c)
            last = c
    n = len(seq)
    nxt = {}
    nxt_use = [0] * n  # next index where seq[i]'s cid recurs, else inf
    for i in range(n - 1, -1, -1):
        nxt_use[i] = nxt.get(seq[i], float("inf"))
        nxt[seq[i]] = i
    cache: dict[object, float] = {}  # cid -> next use index
    fetches = 0
    for i, cid in enumerate(seq):
        if cid in cache:
            cache[cid] = nxt_use[i]
            continue
        fetches += 1
        if len(cache) >= cache_size:
            victim = max(cache, key=lambda c: cache[c])
            del cache[victim]
        cache[cid] = nxt_use[i]
    return fetches


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(0, 12), min_size=0, max_size=400),
    st.integers(1, 8),
)
def test_unbounded_window_equals_textbook_min(raw, cache_size):
    got = simulate_optimal_fetches(raw, cache_size, window=10**6)
    assert got == _min_fetches(raw, cache_size)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(0, 12), min_size=0, max_size=400),
    st.integers(1, 8),
    st.integers(2, 64),
)
def test_windowed_bounds(raw, cache_size, window):
    """A finite lookahead can only lose information: fetches are
    bounded below by MIN and above by the collapsed access count, and
    the cache stays exact (>= distinct containers when cache fits)."""
    got = simulate_optimal_fetches(raw, cache_size, window=window)
    lo = _min_fetches(raw, cache_size)
    seq_len = len([1 for a, b in zip([object()] + raw, raw) if a != b])
    assert lo <= got <= max(seq_len, lo)
    distinct = len(set(raw))
    if cache_size >= distinct:
        assert got == distinct


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(0, 9), min_size=0, max_size=300),
    st.integers(1, 6),
)
def test_optimal_never_worse_than_lru(raw, cache_size):
    seq = []
    last = None
    for c in raw:
        if c != last:
            seq.append(c)
            last = c
    assert simulate_optimal_fetches(raw, cache_size, 10**6) <= (
        simulate_lru_ccf(seq, cache_size)
    )


def test_dead_container_preference():
    """Pin the quirk: a cached container with NO future access is
    evicted before the farthest-future one (optimal_restore.c:195-207),
    so re-referencing the farthest container stays a hit."""
    # cache 2; access a b (cache={a,b}) then c: b dead, a used later
    raw = ["a", "b", "c", "a", "c", "a"]
    assert simulate_optimal_fetches(raw, 2, 10**6) == 3  # a,b,c only
    # LRU would evict a (least recent) at c and refetch it
    assert simulate_lru_ccf(["a", "b", "c", "a", "c", "a"], 2) == 4


def test_spark_stats_matches_kernel(spark):
    rng = np.random.default_rng(5)
    rows = []
    for stream in ("s0", "s1", "s2"):
        cs = rng.integers(0, 20, 500)
        rows += [
            {"stream": stream, "seq": i, "container": int(c)}
            for i, c in enumerate(cs)
        ]
    import pandas as pd

    pdf = pd.DataFrame(rows)
    got = (
        optimal_restore_stats(
            spark.createDataFrame(pdf), cache_size=4, window=64
        )
        .toPandas()
        .set_index("stream")
        .sort_index()
    )
    for stream, g in pdf.groupby("stream"):
        cs = g.sort_values("seq")["container"].tolist()
        assert got.loc[stream, "fetches"] == simulate_optimal_fetches(
            cs, 4, 64
        )
        assert got.loc[stream, "n_containers"] == len(set(cs))
