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


def test_tail_union_find_parity(spark):
    """The single-task union-find tail must produce EXACTLY the star
    rounds' assignments on random graphs (tail disabled via
    tail_rows=0 vs forced via the default threshold)."""
    import random

    rng = random.Random(13)
    for trial in range(3):
        n = 150
        edges = [
            (f"v{rng.randrange(n):03d}", f"v{rng.randrange(n):03d}")
            for _ in range(200)
        ]
        df = spark.createDataFrame(edges, "url_a string, url_b string")
        stars = {
            r["url"]: r["cluster_id"]
            for r in connected_components(df, tail_rows=0).collect()
        }
        uf = {
            r["url"]: r["cluster_id"]
            for r in connected_components(df).collect()
        }
        assert stars == uf


def test_mid_loop_tail_switch(spark):
    """A chain long enough to run at least one star round before the
    relation shrinks under a tiny tail bar — exercises the in-loop
    switch path and must still converge to the chain minimum."""
    n = 60
    edges = [(f"n{i:04d}", f"n{i+1:04d}") for i in range(n - 1)]
    df = spark.createDataFrame(edges, "url_a string, url_b string")
    got = {
        r["url"]: r["cluster_id"]
        for r in connected_components(df, tail_rows=40).collect()
    }
    assert set(got.values()) == {"n0000"} and len(got) == n


def test_nonconvergence_raises_instead_of_emitting_conflicts(spark):
    """max_rounds exhausted on a non-star-forest relation must raise,
    not fall through to star extraction (which would emit multiple
    conflicting cluster_id rows per url).  tail_rows=0 disables the
    union-find shortcut so the star loop is actually exercised."""
    import pytest as _pt

    # a 16-node path needs ~log2(depth) star rounds; one round cannot
    # flatten it
    chain = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(15)]
    df = spark.createDataFrame(chain, "url_a string, url_b string")
    with _pt.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_rounds=1, tail_rows=0)
    # max_rounds < 1 is rejected outright: the post-loop shape check
    # is only sound on round-oriented edges
    with _pt.raises(ValueError, match="max_rounds"):
        connected_components(df, max_rounds=0, tail_rows=0)


def test_converged_on_final_round_without_fp_repeat(spark):
    """A relation that becomes a star forest exactly on the last
    allowed round never gets its fingerprint repeat — the post-loop
    star-forest check must accept it rather than raise."""
    df = spark.createDataFrame([("a", "b")], "url_a string, url_b string")
    rows = connected_components(df, max_rounds=1, tail_rows=0).collect()
    got = {r["url"]: r["cluster_id"] for r in rows}
    assert got == {"a": "a", "b": "a"}


def test_star_forest_test_rejects_multi_parent(spark):
    """{(c,a),(c,b),(d,a),(e,b)} has no chained edge (no parent is a
    child) yet c has TWO root parents — _chained_count alone calls it
    converged; the star-forest test must not."""
    from destor_spark.operators.cluster import (
        _chained_count,
        _is_star_forest,
    )

    edges = spark.createDataFrame(
        [("c", "a"), ("c", "b"), ("d", "a"), ("e", "b")],
        "u string, v string",
    )
    assert _chained_count(edges) == 0  # the old (insufficient) test
    assert not _is_star_forest(edges)  # the corrected one
    ok = spark.createDataFrame(
        [("c", "a"), ("d", "a"), ("e", "b")], "u string, v string"
    )
    assert _is_star_forest(ok)


def test_multi_parent_component_still_merges(spark):
    """A graph whose intermediate state is multi-parent must converge
    to ONE component with one row per url."""
    pairs = spark.createDataFrame(
        [("c", "a"), ("c", "b"), ("d", "a"), ("e", "b")],
        "url_a string, url_b string",
    )
    out = connected_components(pairs).toPandas()
    assert sorted(out["url"]) == ["a", "b", "c", "d", "e"]
    assert out["url"].is_unique
    assert set(out["cluster_id"]) == {"a"}
