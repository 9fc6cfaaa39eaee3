"""P3 rewrite-denial rules (filter_phase.c:89-126 precedence).

Fixture geometry (n_containers conceptually 4, cache_hot_k=1,
sparse_utilization=0.5):
  c0: resident {a0,a1}, referenced by {d1,d2,d3} -> util 1.5, HOT
  c1: resident {b0..b4}, referenced by {d6,d7}   -> util 0.4, SPARSE
  c2: resident {e0},     referenced by {d4}      -> util 1.0
Expected rules (cfl=0.4 < require 0.6, switch ON):
  canonicals -> unique_write
  d1,d3 (in-place dup in healthy c0)            -> no_rewrite
  d2   (out-of-order dup into hot c0)           -> cache_suppressed
  d4   (out-of-order dup into healthy cold c2)  -> out_of_order_rewrite
  d6   (dup in sparse c1, sha recently rewritten) -> denied_recent_rewrite
       (denial BEATS sparse — filter_phase.c:121 checks !denied first)
  d7   (in-place dup in sparse c1)              -> sparse_rewrite
With cfl=0.9 (switch OFF) the out-of-order paths d2/d4 both collapse
to cfl_switch_off; sparse/denied/unique are unaffected.
"""

from __future__ import annotations

from destor_spark.operators.rewrite import (
    RULE_CACHED,
    RULE_CFL_OFF,
    RULE_DENIED,
    RULE_KEEP,
    RULE_OOO,
    RULE_SPARSE,
    RULE_UNIQUE,
    assign_containers,
    rewrite_decisions,
)


def _placed(spark):
    rows = []
    for url, c in [("a0", 0), ("a1", 0), ("b0", 1), ("b1", 1), ("b2", 1),
                   ("b3", 1), ("b4", 1), ("e0", 2)]:
        rows.append((url, "sha_" + url, True, c, c))
    rows += [
        ("d1", "sha_d1", False, 0, 0),
        ("d2", "sha_d2", False, 0, 2),
        ("d3", "sha_d3", False, 0, 0),
        ("d4", "sha_d4", False, 2, 0),
        ("d6", "sha_d6", False, 1, 1),
        ("d7", "sha_d7", False, 1, 1),
    ]
    return spark.createDataFrame(
        rows, "url string, content_sha string, is_canonical boolean, "
        "container_id int, own_container_id int"
    )


def _rr(spark):
    return spark.createDataFrame(
        [("sha_d6", "prev_copy_of_d6")], "content_sha string, ref_url string"
    )


def _run(spark, cfl):
    out = rewrite_decisions(
        _placed(spark), cfl=cfl, cfl_require=0.6, sparse_utilization=0.5,
        cache_hot_k=1, recently_rewritten=_rr(spark),
    ).toPandas().set_index("url")
    return out


def test_rules_switch_on(spark):
    out = _run(spark, cfl=0.4)
    for u in ["a0", "a1", "b0", "b1", "b2", "b3", "b4", "e0"]:
        assert out.loc[u, "rule"] == RULE_UNIQUE and out.loc[u, "write"]
    assert out.loc["d1", "rule"] == RULE_KEEP and not out.loc["d1", "write"]
    assert out.loc["d3", "rule"] == RULE_KEEP
    assert out.loc["d2", "rule"] == RULE_CACHED and not out.loc["d2", "write"]
    assert out.loc["d4", "rule"] == RULE_OOO and out.loc["d4", "write"]
    assert out.loc["d6", "rule"] == RULE_DENIED and not out.loc["d6", "write"]
    assert out.loc["d6", "ref_url"] == "prev_copy_of_d6"
    assert out.loc["d7", "rule"] == RULE_SPARSE and out.loc["d7", "write"]
    # denial pointer exists ONLY on the denied row
    assert out["ref_url"].notna().sum() == 1


def test_cfl_switch_off_guards_only_out_of_order(spark):
    out = _run(spark, cfl=0.9)
    assert out.loc["d2", "rule"] == RULE_CFL_OFF and not out.loc["d2", "write"]
    assert out.loc["d4", "rule"] == RULE_CFL_OFF and not out.loc["d4", "write"]
    # sparse rewrites and denials are NOT guarded by the switch
    assert out.loc["d7", "rule"] == RULE_SPARSE
    assert out.loc["d6", "rule"] == RULE_DENIED
    assert out.loc["a0", "rule"] == RULE_UNIQUE


def test_no_recently_rewritten_table(spark):
    out = rewrite_decisions(
        _placed(spark), cfl=0.4, cache_hot_k=1
    ).toPandas().set_index("url")
    # without cross-run state d6 falls through to the sparse rule
    assert out.loc["d6", "rule"] == RULE_SPARSE
    assert out["ref_url"].isna().all()


def test_assign_containers_cluster_colocated(spark):
    a = spark.createDataFrame(
        [("u1", "c1", True), ("u2", "c1", False), ("u3", "c2", True)],
        "url string, cluster_id string, is_canonical boolean",
    )
    out = assign_containers(a, n_containers=16).toPandas().set_index("url")
    # members of one cluster land in the canonical copy's container
    assert out.loc["u1", "container_id"] == out.loc["u2", "container_id"]
    assert out["container_id"].between(0, 15).all()
    assert out["own_container_id"].between(0, 15).all()
