"""Batch incremental dedup contract (operators/incremental.py).

destor's per-version semantics (index.c index_lookup; do_backup.c):
the stored copy wins — a new batch never disturbs existing
assignments — and novel content dedups within the batch.
"""

from __future__ import annotations

import duckdb
import pytest

from destor_spark.operators.incremental import incremental_exact_assign

SF_DIR = "/root/testdata/sf0.001"


def test_incremental_contract_semantics(spark):
    """STABILITY: a delta doc with a SMALLER id than the base canonical
    still joins the base canonical (the stored copy wins, exactly like
    a duplicate chunk referencing the existing container).  CLOSURE:
    unmatched delta texts dedup among themselves, min-id canonical."""
    base = spark.createDataFrame(
        [(10, "a"), (11, "b"), (12, "a")], "doc_id long, text string"
    )
    delta = spark.createDataFrame(
        [(1, "a"), (2, "c"), (3, "c"), (4, "d")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.cluster_id, r.status)
        for r in incremental_exact_assign(base, delta).collect()
    }
    assert got == {
        1: (10, "base_hit"),  # id 1 < 10, but base canonical wins
        2: (2, "new_canonical"),
        3: (2, "batch_dup"),
        4: (4, "new_canonical"),
    }


def test_incremental_null_text_closure(spark):
    """CLOSURE under NULL text: md5(NULL) is NULL and NULL keys never
    equi-join, so without the coalesce('') rule a null-text delta doc
    would silently vanish from the output.  NULL and '' hash alike
    (the exact.with_content_hash rule), so they cluster together."""
    base = spark.createDataFrame(
        [(10, "a"), (11, None)], "doc_id long, text string"
    )
    delta = spark.createDataFrame(
        [(1, None), (2, ""), (3, None), (4, "b")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.cluster_id, r.status)
        for r in incremental_exact_assign(base, delta).collect()
    }
    # every delta doc appears exactly once; NULL/'' join base's NULL row
    assert got == {
        1: (11, "base_hit"),
        2: (11, "base_hit"),
        3: (11, "base_hit"),
        4: (4, "new_canonical"),
    }


def test_incremental_base_never_in_output(spark):
    """The output covers exactly the delta — base rows are never
    re-assigned (bounded per-batch output)."""
    import destor_spark.queries as Q

    out = Q.q_incremental_dedup(spark, SF_DIR).toPandas()
    assert (out["doc_id"] >= Q._INC_BASE_HIT_OFF).all()
    assert set(out["status"]) == {"base_hit", "new_canonical", "batch_dup"}
    # every planted re-crawl row hits base and points AT the base id
    hits = out[out["status"] == "base_hit"]
    assert (hits["cluster_id"] == hits["doc_id"] - Q._INC_BASE_HIT_OFF).all()
    # the ' v3' twins pair up: A is canonical (smaller id), B is the dup
    dups = out[out["status"] == "batch_dup"]
    assert (dups["doc_id"] - dups["cluster_id"] == (
        Q._INC_PAIR_OFF_B - Q._INC_PAIR_OFF_A
    )).all() and len(dups) > 0


@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_incremental_driver_query_matches_duckdb(spark, sf):
    import destor_spark.queries as Q

    sp = (
        Q.q_incremental_dedup(spark, sf)
        .toPandas()
        .sort_values(["doc_id"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        "create view documents as select * from "
        f"read_parquet('{sf}/documents.parquet')"
    )
    du = (
        con.sql(Q.SQL_INCREMENTAL_DEDUP)
        .df()
        .sort_values(["doc_id"])
        .reset_index(drop=True)
    )
    assert len(sp) == len(du) > 0
    assert sp[["doc_id", "cluster_id"]].astype("int64").equals(
        du[["doc_id", "cluster_id"]].astype("int64")
    )
    assert sp["status"].tolist() == du["status"].tolist()


@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_containment_driver_query_matches_duckdb(spark, sf):
    """One-sided containment (excerpt/quotation detector): Spark and
    DuckDB agree value-for-value on the planted-excerpt corpus, and the
    planted excerpts are found with containment ~1.0 (the asymmetric
    relation Jaccard misses)."""
    import destor_spark.queries as Q

    cols = ["doc_src", "doc_in", "n_common", "containment_ppm"]
    sp = (
        Q.q_containment_pairs(spark, sf)
        .toPandas()[cols]
        .sort_values(cols)
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        "create view documents as select * from "
        f"read_parquet('{sf}/documents.parquet')"
    )
    du = (
        con.sql(Q.SQL_CONTAINMENT_PAIRS)
        .df()[cols]
        .sort_values(cols)
        .reset_index(drop=True)
    )
    assert len(sp) == len(du) > 0
    assert sp.astype("int64").equals(du.astype("int64"))
    # every planted excerpt is contained in its source...
    exc = sp[sp["doc_src"] >= Q._CONT_EXC_OFF]
    planted = exc[exc["doc_in"] == exc["doc_src"] - Q._CONT_EXC_OFF]
    assert len(planted) > 0
    assert (planted["containment_ppm"] >= 990_000).all()
    # ...and the relation is genuinely asymmetric for long sources:
    # at least one source is NOT contained in its own excerpt
    rev = set(zip(sp["doc_src"], sp["doc_in"]))
    missing_reverse = [
        (b, a) for a, b in zip(planted["doc_src"], planted["doc_in"])
        if (b, a) not in rev
    ]
    assert missing_reverse, "containment should not be symmetric here"


@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_incremental_near_dup_matches_duckdb(spark, sf):
    """Delta-vs-base MinHash band probe: Spark and DuckDB agree
    value-for-value; links include both exact re-crawls (n_match ==
    NUM_MH) and genuine near-dups (< NUM_MH) — the append-only ' v2'
    edits keep every original shingle."""
    import destor_spark.queries as Q

    cols = ["doc_delta", "doc_base", "n_match"]
    sp = (
        Q.q_incremental_near_dup(spark, sf)
        .toPandas()[cols]
        .sort_values(cols)
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        "create view documents as select * from "
        f"read_parquet('{sf}/documents.parquet')"
    )
    du = (
        con.sql(Q.SQL_INCREMENTAL_NEAR_DUP)
        .df()[cols]
        .sort_values(cols)
        .reset_index(drop=True)
    )
    assert len(sp) == len(du) > 0
    assert sp.astype("int64").equals(du.astype("int64"))
    assert (sp["n_match"] == Q.NUM_MH).any()
    assert (sp["n_match"] < Q.NUM_MH).any()
    # every doc_base is a real base id, every doc_delta a planted one
    assert (sp["doc_base"] < Q._INC_BASE_HIT_OFF).all()
    assert (sp["doc_delta"] >= Q._INC_BASE_HIT_OFF).all()


def test_incremental_near_dup_probe_shape(spark):
    """The delta side must broadcast: the base band relation is scanned
    map-side with an in-memory probe of the batch — the only join shape
    whose base-side cost is a single scan at 10^12 stored docs."""
    import destor_spark.queries as Q

    plan = (
        Q.q_incremental_near_dup(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


@pytest.mark.parametrize("seed", [0, 7, 23])
def test_incremental_random_corpus_vs_pandas_reference(spark, seed):
    """Randomized-corpus gate against an independent pandas reference:
    small alphabet forces heavy collisions inside base, inside delta,
    and across; ids are shuffled so min-id canonicals are exercised in
    arbitrary arrival order."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    texts = [f"t{c}" for c in rng.integers(0, 12, size=60)]
    ids = rng.permutation(1000 + np.arange(60))
    base_pd = pd.DataFrame(
        {"doc_id": ids[:35].astype("int64"), "text": texts[:35]}
    )
    delta_pd = pd.DataFrame(
        {"doc_id": ids[35:].astype("int64"), "text": texts[35:]}
    )
    got = (
        incremental_exact_assign(
            spark.createDataFrame(base_pd), spark.createDataFrame(delta_pd)
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # independent reference
    canon = base_pd.groupby("text")["doc_id"].min().to_dict()
    rows = []
    miss_canon: dict[str, int] = {}
    for _, r in delta_pd.sort_values("doc_id").iterrows():
        if r.text in canon:
            rows.append((r.doc_id, canon[r.text], "base_hit"))
        else:
            c = miss_canon.setdefault(
                r.text,
                int(delta_pd[delta_pd.text == r.text].doc_id.min()),
            )
            rows.append(
                (
                    r.doc_id,
                    c,
                    "new_canonical" if r.doc_id == c else "batch_dup",
                )
            )
    want = pd.DataFrame(
        rows, columns=["doc_id", "cluster_id", "status"]
    ).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"doc_id": "int64", "cluster_id": "int64"}), want.astype({"doc_id": "int64", "cluster_id": "int64"})
    )
