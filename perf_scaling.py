#!/usr/bin/env python
"""Repeat-and-take-min scaling measurement (noisy-neighbor-robust).

This sandbox is a Firecracker VM; single-shot wall clocks swing 2-4x
with host steal.  Protocol: alternate local[8]/local[32] runs of the
SAME job on the SAME input, N repeats each, report the MIN wall per
core count (the least-interfered observation) + all raw samples.
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "200000"))
REPEATS = int(os.environ.get("SPARK_GRAFT_REPEATS", "3"))

RUN_SNIPPET = r"""
import sys, time, json, os
sys.path.insert(0, {repo!r})
from destor_spark.session import build_session
from destor_spark.config import DedupConfig
from destor_spark.plans.pipeline import run_pipeline
spark = build_session(master="local[{cores}]", shuffle_partitions={cores})
pages = spark.read.parquet({path!r})
pages.count()  # warm reader/JIT
t0 = time.time()
res = run_pipeline(pages, DedupConfig(), use_simhash=True)
n = res.assignments.count()
print("RESULT " + json.dumps({{"cores": {cores}, "docs": n, "wall": round(time.time()-t0, 2)}}))
spark.stop()
"""


def one_run(cores: int, path: str) -> dict:
    code = RUN_SNIPPET.format(repo=REPO, cores=cores, path=path)
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM="32g")
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError(out.stderr[-2000:])


def main() -> None:
    from destor_spark.synth import ensure_corpus

    path, _ = ensure_corpus(os.path.join(REPO, ".bench_cache"), 42, N_DOCS)
    samples: dict[int, list[float]] = {8: [], 32: []}
    for r in range(REPEATS):
        for cores in (8, 32):
            res = one_run(cores, path)
            samples[cores].append(res["wall"])
            print(f"run {r} cores={cores} wall={res['wall']}", flush=True)
    t8, t32 = min(samples[8]), min(samples[32])
    eff = round((t8 / t32) / 4.0, 3)
    out = {
        "metric": "dedup scaling local[8]->local[32], min of repeats",
        "n_docs": N_DOCS,
        "samples_8": samples[8],
        "samples_32": samples[32],
        "best_wall_8": t8,
        "best_wall_32": t32,
        "docs_per_sec_8": round(N_DOCS / t8, 1),
        "docs_per_sec_32": round(N_DOCS / t32, 1),
        "speedup": round(t8 / t32, 2),
        "scaling_efficiency": eff,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
