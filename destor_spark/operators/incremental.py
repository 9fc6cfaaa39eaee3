"""Batch incremental dedup: assign a NEW batch against an existing
corpus without touching the existing assignments.

This is destor's steady-state semantics made relational: every backup
after the first dedups its chunks against the accumulated fingerprint
index — a duplicate references the EXISTING container (the stored
copy wins, regardless of any ordering among the new chunks), only
novel fingerprints allocate new containers
(/root/reference/src/index/index.c: index_lookup on the global store;
/root/reference/src/do_backup.c: the per-version loop).  Here the
"index" is the base corpus's (content-hash -> canonical doc) relation
and the unit is a document.

Guarantees (the incremental contract):
  * STABILITY — base assignments are never recomputed or changed; a
    delta doc whose text matches base joins the base canonical even if
    its own id is smaller.
  * BOUNDED WORK — base-base pairs are never re-derived; the batch
    costs one aggregation of base hashes (amortizable: the index is
    exactly the thing a production deployment keeps materialized,
    bucketed by hash — see streaming/dedup_stream.py's band store for
    the stored-state analogue) plus joins proportional to the delta.
  * CLOSURE — delta docs that match nothing in base still dedup among
    THEMSELVES (first-id canonical), so the output is a complete
    assignment for the batch.

Scale shape: one groupBy(hash) over base (or a read of the stored
index), one hash equi-join delta-vs-index (AQE/broadcast picks a side;
at 10^12 docs the stored index is bucketed by hash so only the delta
shuffles), one groupBy over the MISSES only.  No windows over the
corpus, no cartesian anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def incremental_exact_assign(
    base: DataFrame,
    delta: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign every delta doc a cluster id against the base corpus.

    Returns (doc_id, cluster_id, status) for DELTA rows only:
      status = 'base_hit'      -> text exists in base; cluster_id is the
                                  base canonical (min base id for that
                                  text — destor: reference the stored
                                  container)
      status = 'new_canonical' -> novel text, first (min-id) holder in
                                  the batch; cluster_id = own id
      status = 'batch_dup'     -> novel text already claimed by a
                                  smaller-id doc in the SAME batch

    md5 is the portable content hash (same family as the exact-dup
    driver query); swap for sha2-256 when adversarial collisions are a
    concern — the plan shape is identical.
    """
    # NULL text hashes as the empty string (same rule as
    # exact.with_content_hash): md5(NULL) is NULL, NULL keys never
    # match in the equi-joins below, and a null-text delta doc would
    # silently vanish from the output — violating CLOSURE
    h_expr = F.md5(F.coalesce(F.col(text_col), F.lit("")))
    base_index = (
        base.select(h_expr.alias("h"), F.col(id_col).alias("bid"))
        .groupBy("h")
        .agg(F.min("bid").alias("canonical"))
    )
    d = delta.select(F.col(id_col).alias("doc_id"), h_expr.alias("h"))
    # barrier: both the hits and misses branches (and misses twice
    # more) re-reference this join — without it the base md5 scan +
    # aggregation lineage re-runs once per subtree of the final union
    joined = d.join(base_index, "h", "left").localCheckpoint()
    hits = joined.filter(F.col("canonical").isNotNull()).select(
        "doc_id",
        F.col("canonical").alias("cluster_id"),
        F.lit("base_hit").alias("status"),
    )
    misses = joined.filter(F.col("canonical").isNull()).select("doc_id", "h")
    new_groups = misses.groupBy("h").agg(
        F.min("doc_id").alias("cluster_id")
    )
    new_assign = misses.join(new_groups, "h").select(
        "doc_id",
        "cluster_id",
        F.when(F.col("doc_id") == F.col("cluster_id"), "new_canonical")
        .otherwise("batch_dup")
        .alias("status"),
    )
    return hits.unionByName(new_assign)
