"""Union-find connected components as iterative DataFrame joins.

Implements the alternating Large-Star / Small-Star algorithm (Kiveris
et al., "Connected Components in MapReduce and Beyond", SoCC'14 —
public algorithm), which converges in O(log^2 n) rounds regardless of
component diameter; each round is two groupBy/join stages and we
localCheckpoint to break lineage (SURVEY.md section 4 custom item 2).

destor analogue: duplicate chunks resolve to the FIRST stored copy via
the fingerprint index (first-copy-wins,
/root/reference/src/index/kvstore_htable.c:44-53); document clusters
resolve every member to the component-minimum node id.

Node ids are the url strings — exact at any scale (no 64-bit hash
collision risk at 10^12 docs); the string shuffle cost is bounded by
the edge table, which is tiny relative to the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _min_neighbor(edges: DataFrame) -> DataFrame:
    """m(u) = min(neighbors(u) + u) over a symmetric edge table."""
    return (
        edges.groupBy("u")
        .agg(F.least(F.min("v"), F.first("u")).alias("m"))
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every neighbor v > u to m(u)."""
    sym = edges.select("u", "v").union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    m = _min_neighbor(sym)
    return (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Point all smaller-or-equal neighbors (and u) at m(u)."""
    # orient u > v
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    m = _min_neighbor(oriented)
    out = (
        oriented.join(m, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(m.select(F.col("u"), F.col("m").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    return out


# Edge-count threshold below which the remaining star rounds collapse
# into ONE union-find task.  The star rounds shrink the relation
# geometrically, so the tail is many rounds over tiny data — and each
# round still pays 2 shuffles + a checkpoint + a probe scan of fixed
# scheduling cost (measured at 2M docs: the tail rounds run 128-task
# stages at parallelism 1.3 on the 8-core leg and 0.4-0.8 on the
# 2-core leg — pure fixed cost on BOTH legs).  2M edges x ~150 B of
# url strings is ~300 MB in the finishing task: well inside one
# executor at any realistic cluster sizing, and the knob is explicit
# for smaller executors.
TAIL_UNION_FIND_ROWS = 2_000_000


def _chained_count(edges: DataFrame) -> int:
    """Edges whose parent (v) is itself some edge's child (u) — zero
    when no edge points at a non-root.  NOT sufficient alone for the
    star-forest test: a node with TWO root parents ({(c,a),(c,b)} plus
    edges keeping a,b childless) passes — use _is_star_forest for the
    convergence decision."""
    return edges.join(
        edges.select(F.col("u").alias("v")).distinct(),
        "v",
        "left_semi",
    ).count()


def _is_star_forest(edges: DataFrame) -> bool:
    """True iff every edge points directly at a component root AND
    every child has exactly ONE parent.  The second clause matters:
    edge sets like {(c,a),(c,b),(d,a),(e,b)} have no chained edge yet
    give c two parents — emitting them as final would produce two
    conflicting (url, cluster_id) rows for c and leave the a*/b*
    components unmerged (a routine mid-iteration state: 56/3000 random
    graphs in simulation)."""
    if _chained_count(edges) != 0:
        return False
    agg = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("u").alias("nu"),
    ).collect()[0]
    return agg["n"] == agg["nu"]


def _union_find_finish(edges: DataFrame) -> DataFrame:
    """One-task path-compressed union-find over a SMALL edge relation;
    returns (url, cluster_id=component-min) for every node, roots
    included — the same contract as the star-rounds fixpoint."""

    def uf(batches):
        import pandas as pd

        parent: dict[str, str] = {}

        def find(x: str) -> str:
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for pdf in batches:
            for a, b in zip(pdf["u"], pdf["v"]):
                if a not in parent:
                    parent[a] = a
                if b not in parent:
                    parent[b] = b
                ra, rb = find(a), find(b)
                if ra != rb:
                    # union by MIN keeps roots = lexicographic minimum
                    if rb < ra:
                        ra, rb = rb, ra
                    parent[rb] = ra
        out = sorted(parent)
        yield pd.DataFrame(
            {"url": out, "cluster_id": [find(x) for x in out]}
        )

    return edges.coalesce(1).mapInPandas(
        uf, schema="url string, cluster_id string"
    )


def connected_components(
    pairs: DataFrame,
    max_rounds: int = 50,
    tail_rows: int = TAIL_UNION_FIND_ROWS,
) -> DataFrame:
    """pairs(url_a, url_b) -> (url, cluster_id) for every url in pairs.

    cluster_id is the lexicographic-minimum url of the component.
    Singleton nodes are absent (callers union them back).

    Star rounds run while the edge relation is large; as soon as the
    per-round count probe reports <= tail_rows edges the remaining
    rounds collapse into one union-find task (_union_find_finish) —
    the fixpoint tail is fixed-cost-dominated at every parallelism.
    """
    if max_rounds < 1:
        # the non-convergence guard's star-forest SHAPE check is only
        # sufficient after >= 1 star round has oriented every edge
        # downward (v < u); raw input passed straight through could be
        # shaped like a forest yet rooted at a non-minimum node,
        # silently violating the cluster_id contract
        raise ValueError("max_rounds must be >= 1")
    edges = pairs.select(
        F.col("url_a").alias("u"), F.col("url_b").alias("v")
    ).filter(F.col("u") != F.col("v"))

    # small inputs skip the star machinery entirely: the first probe
    # the star loop would run costs more than the finish itself
    first_cnt = edges.limit(tail_rows + 1).count() if tail_rows else None
    if tail_rows and first_cnt <= tail_rows:
        if first_cnt == 0:
            return edges.select(
                F.col("u").alias("url"), F.col("v").alias("cluster_id")
            )
        return _union_find_finish(edges)

    # Per-round convergence probe: an order-independent fingerprint
    # (count, xor of xxhash64(u,v)) of the edge SET.  One shuffle-free
    # scan of the just-checkpointed blocks — at 10^11 edges this
    # replaces a full edge-relation shuffle per round (the old
    # left_semi chained-edge count).  The star rounds hit a fixpoint
    # exactly when they converge, so "fingerprint unchanged" is the
    # convergence signal; the exact star-forest check then runs ONCE
    # to rule out a (2^-64-ish) hash-collision false positive.
    prev_fp = None
    converged = False
    for _ in range(max_rounds):
        edges = _small_star(_large_star(edges)).localCheckpoint()
        fp = tuple(
            edges.agg(
                F.count(F.lit(1)), F.bit_xor(F.xxhash64("u", "v"))
            ).first()
        )
        if tail_rows and fp[0] <= tail_rows and fp != prev_fp:
            # the relation shrank under the tail bar mid-iteration:
            # finish in one task instead of more fixed-cost rounds
            return _union_find_finish(edges)
        if fp == prev_fp:
            # Converged iff the relation is a star forest: every edge
            # points directly at a component root AND each child has
            # exactly one parent (see _is_star_forest).
            if _is_star_forest(edges):
                converged = True
                break
        prev_fp = fp
    if not converged:
        # max_rounds exhausted without a repeated fingerprint.  The
        # relation may STILL be a star forest (converged on the very
        # last round, fingerprint never got its repeat) — check once
        # before deciding.  Falling through silently on a non-forest
        # relation would emit multiple conflicting cluster_id rows per
        # url, which assignments() then duplicates downstream.
        if not _is_star_forest(edges):
            raise RuntimeError(
                f"connected_components did not converge within "
                f"{max_rounds} star rounds; raise cfg.max_cc_rounds "
                "(each round at least halves tree depth, so rounds "
                "needed ~ log2(longest chain))"
            )

    # star edges: u -> root v; roots themselves appear only as v
    members = edges.select(
        F.col("u").alias("url"), F.col("v").alias("cluster_id")
    )
    roots = (
        edges.select(F.col("v").alias("url"))
        .distinct()
        .join(members.select("url"), "url", "left_anti")
        .withColumn("cluster_id", F.col("url"))
    )
    return members.unionByName(roots)
