"""Approximate-nearest-neighbor / similarity search over embeddings.

Two paths over an `array<float>` embedding column:

  * brute-force cosine top-k — the exactness baseline: cross join of a
    (small, broadcast) query set against the corpus, dot product via
    zip_with/aggregate (JVM codegen, no Python), ranked by a window.
  * LSH-bucketed (random hyperplane / SRP) — the scale path: sign-bit
    sketch of each vector -> bucket equality join shrinks the candidate
    set from O(N*Q) to bucket-local, then exact cosine re-rank.  At
    10^12 rows the bucket join is the only viable shape; the sketch is
    deterministic (seeded numpy hyperplanes broadcast as literals).

destor analogue: similarity detection over segment features — sketch
first, exact top-k after (/root/reference/src/index/similarity_detection.c:49-126).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from destor_spark import hashing as H


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )
    )


def cosine_sim(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of every query vs the corpus.

    queries is expected small: it is broadcast, so the corpus is
    scanned once with no shuffle (verified via .explain:
    BroadcastNestedLoopJoin -> per-row codegen dot products).
    Output: (query_id, rank, neighbor_id, msim) where msim is the
    similarity scaled to integer micro-units (portable comparison).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("qv"),
    )
    c = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("cv"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_sim(F.col("qv"), F.col("cv")) * 1_000_000)
            .cast("bigint")
            .alias("msim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("msim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "msim")
    )


def srp_sketch_udf(dim: int, bits: int = 16, seed: int = 42):
    """Signed-random-projection sketch: bits sign bits -> int bucket."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((bits, dim))

    @pandas_udf(LongType())
    def sketch(vecs: pd.Series) -> pd.Series:
        mat = np.asarray(vecs.tolist(), dtype=np.float64)
        signs = (mat @ planes.T) > 0
        out = np.zeros(len(vecs), dtype=np.int64)
        for i in range(bits):
            out |= signs[:, i].astype(np.int64) << i
        return pd.Series(out)

    return sketch


def srp_topk(
    emb: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    bits: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bucketed ANN: SRP-bucket equality join, exact cosine re-rank.

    Recall < 1 by design (same-bucket requirement); multi-probe
    (flipping low-margin bits) is the documented recall lever.
    """
    sk = srp_sketch_udf(dim, bits)
    c = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("cv"),
        sk(F.col(vec_col)).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("qv"),
        sk(F.col(vec_col)).alias("bucket"),
    )
    scored = (
        F.broadcast(q)
        .join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_sim(F.col("qv"), F.col("cv")) * 1_000_000)
            .cast("bigint")
            .alias("msim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("msim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "msim")
    )
