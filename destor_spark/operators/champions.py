"""Greedy champion selection with feature trimming.

destor's top_segment_select (/root/reference/src/index/
similarity_detection.c:49-126): candidates are ranked by shared-feature
count with the query; after each pick the champion's hit features are
removed from every remaining candidate (features_trim, :35-43) and the
rest re-sorted — so champion #2 is the candidate covering the most
features NOT already covered by champion #1, etc.  (A plain top-k
window returns k near-identical segments; the trim buys coverage.)

Spark restatement: the hit relation (query, candidate, feature) is
computed ONCE (one shuffle); each of the k rounds is then an
aggregate + rank-1 window + anti-join on the shrinking hit relation.
k is small (destor default 1-4), so this is k cheap stages over an
already-bucketed relation, localCheckpoint'ed per round to keep
lineage flat (same pattern as operators/cluster.py).

Ties are pinned to candidate-id ascending (the reference's tie order
is hash-iteration, i.e. unspecified; a distributed engine must pin it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def greedy_champions(
    membership: DataFrame,
    queries: DataFrame,
    k: int = 3,
) -> DataFrame:
    """membership: (doc_id, s) feature relation; queries: (doc_id).

    Returns (doc_id, rnk, champion, n_hits): for each query doc, the
    k greedily selected champions, where n_hits counts the champion's
    hit features not covered by earlier picks.
    """
    q_feats = membership.join(
        F.broadcast(queries.select("doc_id")), "doc_id", "left_semi"
    ).select(F.col("doc_id").alias("q"), "s")
    cand = membership.select(F.col("doc_id").alias("cand"), "s")
    # the full hit relation, computed once
    hits = (
        q_feats.join(cand, "s")
        .filter(F.col("q") != F.col("cand"))
        .select("q", "cand", "s")
    )
    hits = hits.localCheckpoint(eager=True)

    picks = []
    for rnk in range(1, k + 1):
        w = Window.partitionBy("q").orderBy(
            F.desc("n_hits"), F.asc("cand")
        )
        champ = (
            hits.groupBy("q", "cand")
            .agg(F.count("*").alias("n_hits"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("q", "cand", "n_hits")
            .localCheckpoint(eager=True)
        )
        picks.append(champ.withColumn("rnk", F.lit(rnk)))
        if rnk == k:
            break
        # features_trim: drop the champion's hit features from every
        # remaining candidate of that query, and retire the champion
        covered = hits.join(
            champ.select("q", "cand"), ["q", "cand"], "left_semi"
        ).select("q", "s")
        hits = (
            hits.join(covered, ["q", "s"], "left_anti")
            .join(champ.select("q", "cand"), ["q", "cand"], "left_anti")
            .localCheckpoint(eager=True)
        )

    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out.select(
        F.col("q").alias("doc_id"),
        "rnk",
        F.col("cand").alias("champion"),
        "n_hits",
    )
