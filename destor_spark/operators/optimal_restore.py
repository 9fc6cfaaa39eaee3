"""Belady ("optimal") restore-cache simulation — destor's V3/T5.

Reference: /root/reference/src/optimal_restore.c.  During restore,
destor keeps a lookahead window of `restore_opt_window_size` access
records (run-length-collapsed container ids — recipestore.c:380-388
writes an access record only when the id CHANGES) and a container
cache of `restore_cache[1]` slots.  On a miss it fetches the container
and, when full, evicts by Belady's rule with two reference quirks kept
faithfully:

  * the eviction candidate set is the FARTHEST-next-use record plus up
    to 10 records that have NO future access inside the window
    (optimal_restore.c:188-207: the sorted sequence puts empty-queue
    records last; the walk backwards breaks at the first non-empty);
  * the actual victim is whichever candidate the LRU list reaches
    first scanning from its least-recently-used end
    (lru_cache_kicks, utils/lru_cache.c:114-128).

With an unbounded window these quirks preserve Belady-MIN optimality
(evicting a never-again-used container can never cause a future miss;
otherwise the set collapses to {farthest}), which is the independent
parity anchor used in tests/test_optimal_restore.py: fetch count must
EQUAL a textbook MIN simulator's on random streams.  Windowed behavior
is pinned against a direct transliteration of the C walk.

Spark restatement (same shape as restore_sim.bounded_cfl): the
reference restores one stream sequentially; the document store has
many independent streams, so `groupBy(stream).applyInPandas` runs each
stream's collapsed access sequence through the scalar cache sim in seq
order — parallelism unit = stream count.  SIM state is
O(cache + window) per task, but applyInPandas first materializes the
whole stream's reference rows in the task, so the per-task bound is
O(longest stream's references): shard streams at per-backup-job
granularity (destor's natural restore unit), not one giant stream.
Not SQL-expressible (order-dependent eviction recurrence), so the
gate is pytest, like the stateful streaming operators.
"""

from __future__ import annotations

from collections import OrderedDict, deque

import pandas as pd
from pyspark.sql import DataFrame

OPTIMAL_SCHEMA = (
    "stream string, n_access bigint, n_containers bigint, fetches bigint"
)


def simulate_optimal_fetches(
    containers,
    cache_size: int,
    window: int = 1_000_000,
) -> int:
    """Container fetches under destor's windowed Belady cache.

    ``containers`` is the RAW per-chunk container sequence; consecutive
    duplicates are collapsed first (recipestore.c:380 semantics).
    """
    seq = []
    last = None
    for c in containers:
        if c != last:
            seq.append(c)
            last = c
    n = len(seq)

    future: dict[object, deque] = {}  # cid -> future seqnos in window
    buffered = 0
    fill_next = 0  # next seq index not yet pushed into the window

    def fill():
        nonlocal buffered, fill_next
        want = window - buffered
        hi = min(n, fill_next + want)
        for s in range(fill_next, hi):
            future.setdefault(seq[s], deque()).append(s)
        buffered += hi - fill_next
        fill_next = hi

    fill()
    # cache: OrderedDict, first item = MRU head (lru_cache prepends)
    cache: "OrderedDict[object, bool]" = OrderedDict()
    fetches = 0
    for cid in seq:
        # optimal_cache_window_slides (:115-127): refill at half-empty,
        # then consume this access's seqno
        if buffered * 2 <= window:
            fill()
        q = future[cid]
        q.popleft()
        buffered -= 1
        if not q:
            # drop exhausted entries eagerly: without this the dict
            # keeps one empty deque per distinct container ever seen,
            # growing O(stream cardinality) instead of O(cache+window)
            del future[cid]
        if cid in cache:
            cache.move_to_end(cid, last=False)  # hit -> MRU head
            continue
        fetches += 1
        if len(cache) >= cache_size:
            # re-sort cached records by first future seqno, empties last
            # (g_access_records_cmp_by_first_seqno, :37-49)
            cached = sorted(
                cache,
                key=lambda c: (
                    (1, 0) if not future.get(c) else (0, future[c][0])
                ),
            )
            kick = {cached[-1]}
            i = 0
            for c in reversed(cached[:-1]):
                if i >= 10:
                    break
                if not future.get(c):
                    kick.add(c)
                    i += 1
                else:
                    break
            # lru_cache_kicks: first member scanning from the LRU tail
            victim = next(c for c in reversed(cache) if c in kick)
            del cache[victim]
            if not future.get(victim):
                future.pop(victim, None)
        cache[cid] = True
        cache.move_to_end(cid, last=False)  # insert at MRU head
    return fetches


def optimal_restore_stats(
    refs: DataFrame,
    cache_size: int,
    window: int = 1_000_000,
) -> DataFrame:
    """(stream, seq, container) -> per-stream Belady-cache fetch stats.

    fetches is the windowed-optimal container-read count (destor's
    jcr.read_container_num under RESTORE_CACHE_OPT); compare with
    restore_sim.bounded_cfl's LRU ccf for the policy gap the reference
    reports between its two restore caches.
    """

    def sim(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("seq", kind="mergesort")
        cs = pdf["container"].tolist()
        return pd.DataFrame(
            [
                {
                    "stream": pdf["stream"].iloc[0],
                    "n_access": len(cs),
                    "n_containers": len(set(cs)),
                    "fetches": simulate_optimal_fetches(
                        cs, cache_size, window
                    ),
                }
            ]
        )

    return refs.groupBy("stream").applyInPandas(sim, OPTIMAL_SCHEMA)
