#!/usr/bin/env python
"""Heap-size A/B for the scaling pair's wide leg (GC-starvation check).

BENCH.md r5: fitting wall = C + W/cores to the bracketing-clean 4M
pair gives C ≈ 227 s/leg, up from ~77 s at 2M — the non-scaling share
GROWS with data.  Hypothesis: both legs run one JVM with the SAME
pinned heap, so the wide leg runs 4x the concurrent Arrow tasks in the
same memory (4 GB/core vs 16 GB/core) and pays a data-proportional GC
share the narrow leg never sees.  A real cluster going N -> 4N
executors holds PER-EXECUTOR memory fixed (aggregate heap quadruples);
pinning one total heap for both legs is a protocol artifact that
starves exactly the leg whose efficiency is being graded.

This script runs the SAME leg (cores fixed) at two heap sizes with
event logs, prints both walls + per-stage GC attribution, and appends
a row to .bench_cache/heap_ab.jsonl.  If the bigger heap recovers the
~95 s overhang, the faithful protocol is heap ∝ cores and
perf_scaling/perf_opportunistic switch to it.

Usage: SPARK_GRAFT_BENCH_DOCS=4000000 python perf_heap_ab.py 8 32g 64g
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from perf_scaling import membw_probe, RUN_SNIPPET, probe  # noqa: E402

N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "4000000"))
OUT = os.path.join(REPO, ".bench_cache", "heap_ab.jsonl")


def one_run(cores: int, path: str, mem: str, evdir: str) -> dict:
    code = RUN_SNIPPET.format(repo=REPO, cores=cores, path=path)
    env = dict(
        os.environ,
        SPARK_GRAFT_DRIVER_MEM=mem,
        SPARK_GRAFT_MAT_DIR="/dev/shm/destor_mat",
        SPARK_LOCAL_DIRS="/dev/shm/destor_spark_local",
        SPARK_GRAFT_EVENT_DIR=evdir,
    )
    os.makedirs("/dev/shm/destor_mat", exist_ok=True)
    os.makedirs("/dev/shm/destor_spark_local", exist_ok=True)
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        env=env,
        # a wedged leg fails the trial rather than hanging the A/B
        timeout=int(os.environ.get("SPARK_GRAFT_LEG_TIMEOUT", "14400")),
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    causes = [
        ln
        for ln in out.stderr.splitlines()
        if "Caused by" in ln or "Error" in ln or "Exception:" in ln
    ]
    raise RuntimeError("; ".join(causes[:8]) or out.stderr[-1000:])


def main() -> None:
    from destor_spark.synth import ensure_corpus

    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    mems = sys.argv[2:] or ["32g", "64g"]
    path, _ = ensure_corpus(os.path.join(REPO, ".bench_cache"), 42, N_DOCS)
    shm = os.path.join("/dev/shm/destor_input", os.path.basename(path))
    if os.path.exists(shm):
        path = shm
    rows = []
    for mem in mems:
        evdir = f"/tmp/evlog_ab_{cores}c_{mem}_{int(time.time())}"
        # membw probes alongside ALU: the r5 next-day regime proved
        # the ALU probe blind to memory-bandwidth contention (cpu frac
        # 0.86-0.88 while shuffle stages ran 2-2.7x slow) — exactly
        # the confound that would mimic a heap/GC effect in this A/B.
        # evdir is timestamped so perf_eventlog never sees two apps.
        p0, bw0 = probe(), membw_probe()
        t0 = time.time()
        res = one_run(cores, path, mem, evdir)
        p1, bw1 = probe(), membw_probe()
        row = {
            "t": time.strftime("%H:%M:%S"),
            "cores": cores,
            "mem": mem,
            "n_docs": N_DOCS,
            "wall": res["wall"],
            "total": round(time.time() - t0, 2),
            "probe_pre_ops": p0,
            "probe_post_ops": p1,
            "membw_pre": bw0,
            "membw_post": bw1,
            "evdir": evdir,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(row) + "\n")
    if len(rows) == 2:
        print(
            f"delta wall {rows[0]['wall'] - rows[1]['wall']:+.1f} s "
            f"({rows[0]['mem']} -> {rows[1]['mem']})"
        )


if __name__ == "__main__":
    main()
