"""Parity gates for the r6 exact-fold numpy ANN kernels vs the r5
expression formulations they replace.

The kernels claim BIT-identical doubles (same IEEE op sequence as the
JVM zip_with/aggregate folds), so the gates assert exact frame
equality — msim values included, not just rankings — on the driver
fixture plus adversarial vectors (zero vectors, ragged lengths,
nulls)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from destor_spark.operators import ann

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _pdf(df):
    return (
        df.toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


def test_brute_force_np_equals_expr(spark, emb):
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    got = _pdf(ann.brute_force_topk(emb, queries, k=10))
    want = _pdf(ann._brute_force_topk_expr(emb, queries, k=10))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_brute_force_np_adversarial(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.5, 0.5, 0.0]),
        (2, [0.0, 0.0, 0.0]),        # zero vector -> cosine 0
        (3, [1.0, 0.0]),             # ragged -> msim 0 vs 3-dim queries
        (4, [-1.0, 0.0, 0.0]),       # negative cosine
        (5, [0.3, -0.2, 0.9]),
        (6, [1.0, 0.0, 0.0]),        # exact twin of 0 -> msim 1000000
    ]
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding"])
    emb = spark.createDataFrame(pdf)
    queries = emb.filter(F.col("vec_id") < 2)
    got = _pdf(ann.brute_force_topk(emb, queries, k=5))
    want = _pdf(ann._brute_force_topk_expr(emb, queries, k=5))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_ivf_assign_np_equals_expr(spark, emb):
    cents = ann.ivf_centroids(emb, 8)
    want = (
        ann.ivf_assign(emb, cents, nprobe=3, id_alias="vid")
        .toPandas()
        .sort_values(["vid", "cell"])
        .reset_index(drop=True)
    )
    got = (
        ann._ivf_assign_np(emb, cents.toPandas(), 3, "vid")
        .toPandas()
        .sort_values(["vid", "cell"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_ivf_topk_np_equals_expr_path(spark, emb):
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    got = _pdf(ann.ivf_topk(emb, queries, n_cells=8, nprobe=3, k=10))
    # force the r5 expression path via the no-broadcast branch guarded
    # to distributed shapes (broadcast_queries=False)
    cents = ann.ivf_centroids(emb, 8)
    corpus_cells = ann.ivf_assign(emb, cents, 1, "neighbor_id")
    query_cells = ann.ivf_assign(queries, cents, 3, "query_id")
    cand = (
        query_cells.join(corpus_cells, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    q = ann._qvec(queries, "vec_id", "embedding", True)
    c = ann._cvec(emb, "vec_id", "embedding")
    want = _pdf(ann._rerank_candidates(cand, q, c, 10))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_pairwise_msim_np_equals_expr(spark):
    rows = [
        (0, [1.0, 0.0, 0.0], [1.0, 0.0, 0.0]),     # exact twin -> 1e6
        (1, [0.5, 0.5, 0.0], [0.2, -0.4, 0.9]),
        (2, [0.0, 0.0, 0.0], [1.0, 2.0, 3.0]),     # zero norm -> 0
        (3, [1.0, 0.0], [1.0, 0.0, 0.0]),          # ragged -> 0
        (4, [1.0, 0.0], [0.6, 0.8]),               # 2-dim group
        (5, [-1.0, 2.0, -3.0], [4.0, -5.0, 6.0]),  # negative cosine
    ]
    pdf = pd.DataFrame(rows, columns=["pid", "va", "vb"])
    df = spark.createDataFrame(pdf)
    got = (
        ann.pairwise_msim_np(df, "va", "vb")
        .toPandas().sort_values("pid").reset_index(drop=True)
    )
    want = (
        df.select(
            "pid",
            (
                F.round(ann.cosine_sim(F.col("va"), F.col("vb")) * 1_000_000)
                .cast("bigint")
                .alias("msim")
            ),
        )
        .toPandas().sort_values("pid").reset_index(drop=True)
    )
    assert list(got["msim"]) == list(want["msim"])


def test_srp_near_dup_pairs_matches_brute(spark, emb):
    """The kernel-verified bucketed pairs still equal the brute-force
    relation on the fixture (the bucketed query's oracle contract)."""
    from pyspark.sql import functions as FF

    planted = emb.select("vec_id", "embedding").unionByName(
        emb.filter(FF.col("vec_id") < 8).select(
            (FF.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
        )
    )
    got = (
        ann.srp_near_dup_pairs(planted, dim=64)
        .toPandas().sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
    )
    a = planted.select(FF.col("vec_id").alias("vec_a"),
                       FF.col("embedding").alias("ea"))
    b = planted.select(FF.col("vec_id").alias("vec_b"),
                       FF.col("embedding").alias("eb"))
    va = FF.transform(FF.col("ea"), lambda x: x.cast("double"))
    vb = FF.transform(FF.col("eb"), lambda x: x.cast("double"))
    brute = (
        a.crossJoin(b)
        .filter(FF.col("vec_a") < FF.col("vec_b"))
        .select(
            "vec_a", "vec_b",
            FF.round(ann.cosine_sim(va, vb) * 1_000_000)
            .cast("bigint").alias("msim"),
        )
        .filter(FF.col("msim") >= 990_000)
        .toPandas().sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, brute, check_dtype=False)


def test_fold_kernels_match_python_fold():
    rng = np.random.default_rng(5)
    A = rng.standard_normal((17, 9))
    B = rng.standard_normal((13, 9))

    def py_fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + (x * y)
        return acc

    dots = ann._fold_dot_cross(A, B)
    for i in range(A.shape[0]):
        for j in range(B.shape[0]):
            assert dots[i, j] == py_fold_dot(A[i], B[j])
    norms = ann._fold_norms(A)
    for i in range(A.shape[0]):
        acc = 0.0
        for x in A[i]:
            acc = acc + x * x
        assert norms[i] == np.sqrt(acc)
