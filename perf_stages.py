#!/usr/bin/env python
"""Per-stage wall-time breakdown of the dedup pipeline at one core count.

Diagnostic companion to perf_scaling.py: when end-to-end scaling looks
flat, this shows WHICH stage failed to parallelize (vs. uniform
inflation, which means host steal — this sandbox is a shared
Firecracker VM).  Mirrors run_pipeline()'s r4+ single-text-scan
structure exactly (sigs barrier carries content_sha; exact pass reads
the barrier, not the raw text), and additionally times the pieces the
scaling harness EXCLUDES from its wall (session build, corpus
read+warm) so the per-leg constant share is fully attributed.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "100000"))
CORES = int(os.environ.get("SPARK_GRAFT_STAGE_CORES", "32"))
# shuffle partitions sized by CORES unless overridden: the 2M-doc
# freeze diagnosis (BENCH.md r4) varies this independently of cores
SHUFFLE = int(os.environ.get("SPARK_GRAFT_STAGE_SHUFFLE", str(CORES)))


def main() -> None:
    from pyspark.sql import functions as F

    from destor_spark.config import DedupConfig
    from destor_spark.operators import (
        assign as assign_op,
        cluster as cluster_op,
        exact as exact_op,
        lsh as lsh_op,
        simhash as simhash_op,
        verify as verify_op,
    )
    from destor_spark.plans.pipeline import (
        _mat_root,
        _materialize,
        signatures_stage,
    )
    from destor_spark.session import build_session
    from destor_spark.synth import ensure_corpus

    path, _ = ensure_corpus(os.path.join(REPO, ".bench_cache"), 42, N_DOCS)
    stages: dict[str, float] = {}

    t = time.time()
    # SPARK_GRAFT_EVENT_DIR is honored by build_session itself (with
    # the rolling+zstd layout perf_eventlog expects) — no extra confs
    spark = build_session(master=f"local[{CORES}]", shuffle_partitions=SHUFFLE)
    stages["setup/session"] = round(time.time() - t, 2)
    t = time.time()
    pages = spark.read.parquet(path)
    pages.count()  # warm reader/JIT — excluded from perf_scaling's wall
    stages["setup/warm_read"] = round(time.time() - t, 2)

    cfg = DedupConfig()
    root = _mat_root(spark)
    t_all = time.time()

    t = time.time()
    sigs = _materialize(signatures_stage(pages, cfg, with_sha=True), "sigs", root)
    stages["signatures+sha"] = round(time.time() - t, 2)

    t = time.time()
    exact_edges = exact_op.exact_pairs(
        sigs.select("url", "warc_ts", "content_sha")
    )
    pairs, _stats = lsh_op.candidate_pairs(sigs, cfg)
    pairs = _materialize(pairs, "pairs", root)
    stages["exact+lsh_pairs"] = round(time.time() - t, 2)

    t = time.time()
    verified = _materialize(verify_op.verify_pairs(pairs, sigs, cfg), "verified", root)
    stages["verify"] = round(time.time() - t, 2)

    t = time.time()
    n_live = sigs.filter(F.col("n_shingles") > 0).count()
    sim_cfg = simhash_op.auto_index_config(cfg, n_live)
    stages["simhash/auto_cfg_count"] = round(time.time() - t, 2)

    t = time.time()
    sim = simhash_op.simhash_pairs(sigs, sim_cfg)
    # parquet barrier, NOT persist: run_pipeline barriers the edge
    # union before CC (the ~6.3 GB simhash exchange re-ran 3x at 4M
    # without it), and persist() of this relation measured ~2x slower
    # than the parquet round-trip — the breakdown must take the same
    # physical path as the pipeline it attributes
    edges = _materialize(
        exact_edges.unionByName(verified.select("url_a", "url_b"))
        .unionByName(sim)
        .distinct(),
        "edges",
        root,
    )
    n_edges = edges.count()
    stages["simhash+edges"] = round(time.time() - t, 2)

    t = time.time()
    comps = cluster_op.connected_components(edges, cfg.max_cc_rounds).persist()
    comps.count()
    stages["connected_components"] = round(time.time() - t, 2)

    t = time.time()
    n = assign_op.assignments(pages, comps).count()
    stages["assignments"] = round(time.time() - t, 2)

    wall = round(time.time() - t_all, 2)
    print(
        "RESULT "
        + json.dumps(
            {
                "cores": CORES,
                "shuffle": SHUFFLE,
                "docs": n,
                "edges": n_edges,
                "wall": wall,
                "stages": stages,
                "docs_per_sec": round(n / wall, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
