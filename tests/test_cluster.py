"""Union-find connected components unit tests (large-star/small-star)."""

from __future__ import annotations

from destor_spark.operators.cluster import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "url_a string, url_b string")
    rows = connected_components(df).collect()
    return {r["url"]: r["cluster_id"] for r in rows}


def test_two_components(spark):
    got = _cc(spark, [("a", "b"), ("b", "c"), ("x", "y")])
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_chain_converges(spark):
    n = 200
    edges = [(f"n{i:04d}", f"n{i+1:04d}") for i in range(n - 1)]
    got = _cc(spark, edges)
    assert set(got.values()) == {"n0000"}
    assert len(got) == n


def test_star_and_selfloops(spark):
    edges = [("hub", f"s{i}") for i in range(20)] + [("hub", "hub")]
    got = _cc(spark, edges)
    assert set(got.values()) == {"hub"}
    assert len(got) == 21


def test_empty_edges(spark):
    df = spark.createDataFrame([], "url_a string, url_b string")
    assert connected_components(df).count() == 0
