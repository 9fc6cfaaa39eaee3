#!/usr/bin/env python
"""Per-stage wall-time breakdown of the dedup pipeline at one core count.

Diagnostic companion to perf_scaling.py: when end-to-end scaling looks
flat, this shows WHICH stage failed to parallelize (vs. uniform
inflation, which means host steal — this sandbox is a shared
Firecracker VM).  Mirrors run_pipeline()'s barriers exactly.
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
    from destor_spark.config import DedupConfig
    from destor_spark.operators import (
        assign as assign_op,
        cluster as cluster_op,
        exact as exact_op,
        lsh as lsh_op,
        simhash as simhash_op,
        verify as verify_op,
    )
    from destor_spark.plans.pipeline import _mat_root, _materialize, signatures_stage
    from destor_spark.session import build_session
    from destor_spark.synth import ensure_corpus

    path, _ = ensure_corpus(os.path.join(REPO, ".bench_cache"), 42, N_DOCS)
    spark = build_session(master=f"local[{CORES}]", shuffle_partitions=SHUFFLE)
    pages = spark.read.parquet(path)
    pages.count()  # warm

    cfg = DedupConfig()
    root = _mat_root(spark)
    stages: dict[str, float] = {}
    t_all = time.time()

    t = time.time()
    hashed = _materialize(
        exact_op.with_content_hash(pages.select("url", "warc_ts", "text")).drop(
            "text"
        ),
        "hashed",
        root,
    )
    exact_edges = _materialize(exact_op.exact_pairs(hashed), "exact_edges", root)
    stages["exact"] = round(time.time() - t, 2)

    t = time.time()
    sigs = _materialize(signatures_stage(pages, cfg), "sigs", root)
    stages["signatures"] = round(time.time() - t, 2)

    t = time.time()
    pairs, _stats = lsh_op.candidate_pairs(sigs, cfg)
    pairs = _materialize(pairs, "pairs", root)
    stages["lsh_pairs"] = round(time.time() - t, 2)

    t = time.time()
    verified = _materialize(verify_op.verify_pairs(pairs, sigs, cfg), "verified", root)
    stages["verify"] = round(time.time() - t, 2)

    t = time.time()
    sim = simhash_op.simhash_pairs(sigs, cfg)
    edges = (
        exact_edges.unionByName(verified.select("url_a", "url_b"))
        .unionByName(sim)
        .distinct()
        .persist()
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
