"""Rewrite-denial rules (destor filter phase, P3 in SURVEY section 2).

destor's filter phase decides, chunk by chunk, whether a DUPLICATE
chunk is nevertheless written again ("rewritten") to defragment future
restores — and which named rules DENY that rewrite
(/root/reference/src/filter_phase.c:89-126):

  * cache-aware filter: a chunk already in the simulated restore cache
    is not worth rewriting (filter_phase.c:91-95);
  * CFL switch: when the measured chunk-fragmentation level is already
    above the required level, out-of-order rewriting is switched off
    wholesale (filter_phase.c:97-108);
  * recently-rewritten denial: a fragmented chunk whose fingerprint
    was already rewritten in the recent window is denied and pointed
    at the rewritten copy (filter_phase.c:115-119);
  * the write decision itself: write iff unique, OR not-denied AND
    (sparse OR (switch-on AND out-of-order AND not-in-cache))
    (filter_phase.c:121-126).  Note the asymmetry: sparseness (HAR)
    overrides the cache and the CFL switch; only the out-of-order
    (CFL/CBR) path is guarded by them.

Document-scale graft: chunk -> document, container -> the hash
partition holding the cluster's canonical copy, restore cache -> the
hot set of most-referenced containers, fragmentation -> a duplicate
whose canonical lives outside the container the document itself hashes
to (fetching it during a sequential scan jumps containers).  The rule
ENGINE is the faithful part — precedence, guards, and the denial
pointer are destor's, column for column.

Physical shape at 100 TB: two hash aggregations over the assignment
table (per-container resident/referenced counts), one broadcast of the
tiny per-container relation (n_containers rows), one broadcast-able
join against the recently-rewritten set, then a single F.when chain —
no Python, no window over the full table, one shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# destor.rewrite_har_utilization_threshold default
# (/root/reference/src/destor.c:120)
SPARSE_UTILIZATION = 0.5

# rules, in filter_phase.c precedence order (first match wins)
RULE_UNIQUE = "unique_write"
RULE_DENIED = "denied_recent_rewrite"
RULE_SPARSE = "sparse_rewrite"
RULE_CFL_OFF = "cfl_switch_off"
RULE_CACHED = "cache_suppressed"
RULE_OOO = "out_of_order_rewrite"
RULE_KEEP = "no_rewrite"


def assign_containers(
    assignments: DataFrame,
    n_containers: int = 64,
    container_hash: Column | None = None,
    own_hash: Column | None = None,
) -> DataFrame:
    """Add (container_id, own_container_id) to an assignment table.

    container_id is where the cluster's canonical copy lives (every
    member of a cluster references it); own_container_id is where the
    document ITSELF hashes — the container a sequential reader of this
    document's neighborhood is already holding.  A duplicate with
    container_id != own_container_id is the doc-scale out-of-order
    chunk.  Hash expressions are injectable so the DuckDB oracle twin
    can use a portable md5-based hash; the default is JVM xxhash64.
    """
    ch = container_hash if container_hash is not None else F.xxhash64("cluster_id")
    oh = own_hash if own_hash is not None else F.xxhash64("url")
    return assignments.withColumn(
        "container_id", F.pmod(ch, F.lit(n_containers)).cast("int")
    ).withColumn("own_container_id", F.pmod(oh, F.lit(n_containers)).cast("int"))


def rewrite_decisions(
    placed: DataFrame,
    cfl: float,
    cfl_require: float = 0.6,
    sparse_utilization: float = SPARSE_UTILIZATION,
    cache_hot_k: int = 4,
    recently_rewritten: DataFrame | None = None,
) -> DataFrame:
    """Apply destor's named rewrite-denial rules to placed assignments.

    placed: (url, content_sha, is_canonical, container_id,
    own_container_id) — from assign_containers over the pipeline's
    assignment output joined with content_sha.
    recently_rewritten: (content_sha, ref_url) — fingerprints rewritten
    by the previous run (cross-run state, the doc-scale
    recently_rewritten_chunks table of filter_phase.c:36-44).
    cfl: the measured chunk-fragmentation level (queries.cfl_monitor /
    restore_aware.c) — scalar, measured on the PREVIOUS restore, which
    is why it is a parameter and not computed here.

    Returns (url, container_id, rule, write, ref_url); rule is one of
    the RULE_* names, first match in filter_phase.c precedence.
    """
    # per-container utilization: resident canonicals vs duplicate
    # references into the container.  n_containers rows — broadcast.
    per_container = placed.groupBy("container_id").agg(
        F.sum(F.when(F.col("is_canonical"), 1).otherwise(0)).alias("resident"),
        F.sum(F.when(~F.col("is_canonical"), 1).otherwise(0)).alias("referenced"),
    )
    per_container = per_container.withColumn(
        "utilization",
        F.col("referenced") / F.greatest(F.col("resident"), F.lit(1)),
    )
    # restore cache: the cache_hot_k most-referenced containers
    # (restore_aware keeps the hottest containers resident; ties break
    # on container_id for determinism)
    hot = (
        per_container.orderBy(
            F.col("referenced").desc(), F.col("container_id")
        )
        .limit(cache_hot_k)
        .select("container_id", F.lit(True).alias("in_cache"))
    )
    stats = per_container.join(hot, "container_id", "left").select(
        "container_id",
        (F.col("utilization") < F.lit(sparse_utilization)).alias("is_sparse"),
        F.coalesce("in_cache", F.lit(False)).alias("in_cache"),
    )
    enriched = placed.join(F.broadcast(stats), "container_id", "left")
    if recently_rewritten is not None:
        rr = recently_rewritten.select(
            "content_sha", F.col("ref_url").alias("_rr_url")
        )
        enriched = enriched.join(F.broadcast(rr), "content_sha", "left")
    else:
        enriched = enriched.withColumn("_rr_url", F.lit(None).cast("string"))

    dup = ~F.col("is_canonical")
    denied = dup & F.col("_rr_url").isNotNull()
    ooo = F.col("own_container_id") != F.col("container_id")
    # batch collapse of the C loop's hysteresis switch: rewriting
    # out-of-order chunks is enabled iff fragmentation is still below
    # the required level (filter_phase.c:97-108)
    enable_rewrite = F.lit(bool(cfl < cfl_require))

    rule = (
        F.when(~dup, F.lit(RULE_UNIQUE))
        .when(denied, F.lit(RULE_DENIED))
        .when(dup & F.col("is_sparse"), F.lit(RULE_SPARSE))
        .when(dup & ooo & ~enable_rewrite, F.lit(RULE_CFL_OFF))
        .when(dup & ooo & F.col("in_cache"), F.lit(RULE_CACHED))
        .when(dup & ooo, F.lit(RULE_OOO))
        .otherwise(F.lit(RULE_KEEP))
    )
    return enriched.select(
        "url",
        "container_id",
        rule.alias("rule"),
        rule.isin(RULE_UNIQUE, RULE_SPARSE, RULE_OOO).alias("write"),
        F.when(denied, F.col("_rr_url")).alias("ref_url"),
    )
