"""LRU-bounded restore-cache simulation: destor's CFL monitor with a
BOUNDED cache (/root/reference/src/restore_aware.c:30-57 — an LRU of
`destor.restore_cache[1]` container records is maintained during
backup; every reference that MISSES the cache is a container fetch, so
ccf counts re-fetches after eviction, unlike the infinite-cache ccf of
queries.q_cfl_monitor which counts distinct containers once).

Spark restatement: the reference restores ONE stream sequentially; the
document store has many independent streams (source shards), so the
simulation distributes ACROSS streams and stays sequential WITHIN one —
`groupBy(stream).applyInPandas` gives each stream's reference sequence
to one task in seq order.  At 100 TB the parallelism unit is the
stream/shard count (same unit destor scales by when restoring multiple
backups).  Memory per task: the LRU STATE is O(cache_size), but
applyInPandas materializes the whole stream's reference rows in the
task first — the per-task bound is O(longest stream's references),
so shard streams to per-backup-job granularity (destor's natural
unit, ~10^5-10^6 container refs per job), not one giant stream.

Not SQL-expressible (the LRU recurrence is order-dependent with
eviction), so the gate is a pytest parity check against an independent
pure-Python simulator (tests/test_restore_sim.py) rather than a DuckDB
oracle — the same gating used for the stateful streaming operators.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

BOUNDED_CFL_SCHEMA = (
    "stream string, total_bytes bigint, ocf bigint, ccf bigint, "
    "cfl_ppm bigint"
)


def simulate_lru_ccf(containers, cache_size: int) -> int:
    """Reference kernel: container fetches under an LRU of cache_size
    records (restore_aware_update: miss -> fetch++, insert-evict)."""
    from collections import OrderedDict

    lru: "OrderedDict[int, bool]" = OrderedDict()
    fetches = 0
    for c in containers:
        if c in lru:
            lru.move_to_end(c)
        else:
            fetches += 1
            lru[c] = True
            if len(lru) > cache_size:
                lru.popitem(last=False)
    return fetches


def bounded_cfl(
    refs: DataFrame, cache_size: int, container_bytes: int
) -> DataFrame:
    """(stream, seq, container, bytes) -> per-stream bounded-cache CFL.

    ocf = ceil(total_bytes / container_bytes)  (optimal containers)
    ccf = LRU-miss container fetches over the stream in seq order
    cfl_ppm = min(1, ocf/ccf) in parts-per-million
    (restore_aware.c:57-58; the >1 clamp is restore_aware_get_cfl,
    restore_aware.c:66-68).
    """

    def sim(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("seq", kind="mergesort")
        ccf = simulate_lru_ccf(pdf["container"].tolist(), cache_size)
        total = int(pdf["bytes"].sum())
        ocf = -(-total // container_bytes)
        cfl_ppm = min(1_000_000, round(1_000_000 * ocf / ccf)) if ccf else 0
        return pd.DataFrame(
            [
                {
                    "stream": pdf["stream"].iloc[0],
                    "total_bytes": total,
                    "ocf": ocf,
                    "ccf": ccf,
                    "cfl_ppm": cfl_ppm,
                }
            ]
        )

    return refs.groupBy("stream").applyInPandas(sim, BOUNDED_CFL_SCHEMA)
