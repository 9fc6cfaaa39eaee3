#!/usr/bin/env python
"""Repeat-and-take-min scaling measurement (noisy-neighbor-robust).

This sandbox is a shared Firecracker VM; effective machine capacity
swings up to ~4x with host oversubscription (vCPU lock-holder
preemption shows up as guest *system* time with modest visible steal,
so single-shot wall clocks are untrustworthy).  Protocol:

  1. Before every timed run, a 32-process pure-numpy CALIBRATION PROBE
     measures current effective throughput.  Trials started while the
     probe reads below --probe-floor of the session-best are retried
     (up to a bounded number of waits) rather than recorded.
  2. local[8]/local[32] runs of the SAME job on the SAME input
     alternate, N repeats each; report the MIN wall per core count
     (the least-interfered observation) plus every raw sample and its
     probe reading, so the filtering is auditable.

This is the sandbox stand-in for the north rule's N-vs-4N-executor
criterion (no real cluster is available here).
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "200000"))
# N vs 4N parallelism levels.  8/32 hits this host's measured ~21
# effective-core ceiling (BENCH.md) — 32 threads can never see 4x the
# cores of 8; 2/8 keeps BOTH runs inside the host's real capacity and
# measures the CODE's scaling, which is what the north rule's
# N->4N-executor criterion is about.
CORES_LOW = int(os.environ.get("SPARK_GRAFT_CORES_LOW", "8"))
CORES_HIGH = int(os.environ.get("SPARK_GRAFT_CORES_HIGH", "32"))
REPEATS = int(os.environ.get("SPARK_GRAFT_REPEATS", "3"))
PROBE_FLOOR = float(os.environ.get("SPARK_GRAFT_PROBE_FLOOR", "0.7"))
MAX_WAITS = int(os.environ.get("SPARK_GRAFT_MAX_WAITS", "6"))

RUN_SNIPPET = r"""
import sys, time, json, os
sys.path.insert(0, {repo!r})
from destor_spark.session import build_session
from destor_spark.config import DedupConfig
from destor_spark.plans.pipeline import run_pipeline
spark = build_session(master="local[{cores}]", shuffle_partitions={cores})
pages = spark.read.parquet({path!r})
# Warm the DATA, not just the footer: parquet count() is answered from
# row-group metadata and never touches the text pages, so the pair's
# FIRST leg used to pay a cold ~4 GB disk read inside its timed window
# (measured: wall_8 408 s warm vs 490 s cold — a pure order effect).
# Summing text lengths decodes every data page once, faulting the file
# into the OS page cache and warming codegen/JIT on the same plan shape
# the pipeline uses.
from pyspark.sql import functions as F
pages.select(F.sum(F.length("text")), F.sum(F.length("html"))).collect()
t0 = time.time()
res = run_pipeline(pages, DedupConfig(), use_simhash=True)
n = res.assignments.count()
print("RESULT " + json.dumps({{"cores": {cores}, "docs": n, "wall": round(time.time()-t0, 2)}}))
spark.stop()
"""

PROBE_SNIPPET = r"""
import multiprocessing as mp, time, json

def burn(n):
    x = 0
    for i in range(n):
        x += i * i
    return x

if __name__ == "__main__":
    N = 4_000_000
    t0 = time.time()
    with mp.Pool(32) as p:
        p.map(burn, [N] * 32)
    print(json.dumps({"probe_ops_per_sec": round(32 * N / (time.time() - t0))}))
"""


# Second probe dimension: MEMORY BANDWIDTH.  The ALU probe above is
# blind to an observed host mode where compute reads ~0.87 of best but
# shuffle-heavy Spark stages run at ~0.55x (r5 next-day regime: stage
# A/B showed signatures +32% while simhash/CC/verify inflated 2-2.7x —
# the signature of bandwidth-level neighbor contention, since shuffle
# writes/reads and Arrow transposes are memcpy-bound while the hash
# kernels are ALU-bound).  8 workers x 128 MB streaming copies
# saturate the memory controllers the way a shuffle does.
#
# The buffers MUST be per-page-unique and pre-faulted: the first
# version of this probe copied all-ones buffers, whose identical 4 KB
# pages the host's same-page merging (KSM / hypervisor page dedup)
# collapses to one physical page — the timed loop then measured
# COW-break page-fault service rate, not DRAM (observed: 0.2-1.5
# "GB/s" with 90% sys time in the same window where this fixed probe
# reads 32 GB/s and a single-thread copy reads 15 GB/s; the 119 GB/s
# "best" the old probe once recorded is the opposite artifact — reads
# served from one merged, cache-resident physical page).  uint64
# arange content makes every page distinct (unmergeable), and b is
# faulted in before the clock starts.
MEMBW_SNIPPET = r"""
import multiprocessing as mp, time, json
import numpy as np

def stream(seed):
    a = np.arange(seed * 8_000_000, (seed + 1) * 8_000_000, dtype=np.uint64)
    b = a.copy()  # pre-fault the destination before timing
    t0 = time.time()
    n = 0
    while time.time() - t0 < 1.0:
        np.copyto(b, a)
        n += 1
    return n * a.nbytes * 2  # bytes read + written

if __name__ == "__main__":
    t0 = time.time()
    with mp.Pool(8) as p:
        moved = sum(p.map(stream, range(8)))
    print(json.dumps({"membw_bytes_per_sec": round(moved / (time.time() - t0))}))
"""


# Third, observational dimension: HOST PAGE-MANAGEMENT PRESSURE.  The
# buggy first membw snippet turned out to be a sensitive detector of a
# real host mode — when the hypervisor/kernel is aggressively merging
# same-content pages, a loop that recreates mergeable pages and then
# rewrites them spends its life in COW-break faults (observed swinging
# 119 -> 0.2 "GB/s" within 90 min).  A 32 GB pre-touched JVM heap is
# exactly such a merge target, so this regime plausibly slows
# allocation-heavy Spark phases while leaving pure ALU intact.  Kept
# deliberately, renamed for what it measures; recorded per row for
# renormalization but NOT gated on (its healthy range is not yet
# characterized, and gating on it could block sampling indefinitely).
PGFAULT_SNIPPET = r"""
import multiprocessing as mp, time, json
import numpy as np

def churn(_):
    a = np.ones(64_000_000, dtype=np.uint8)  # mergeable: identical pages
    b = np.empty_like(a)
    t0 = time.time()
    n = 0
    while time.time() - t0 < 1.0:
        np.copyto(b, a)
        n += 1
    return n * a.nbytes * 2

if __name__ == "__main__":
    t0 = time.time()
    with mp.Pool(8) as p:
        moved = sum(p.map(churn, range(8)))
    print(json.dumps({"pgfault_bytes_per_sec": round(moved / (time.time() - t0))}))
"""


_PROBE_BEST_FILE = os.path.join(REPO, ".bench_cache", "probe_best.json")


def probe() -> float:
    out = subprocess.run(
        [sys.executable, "-c", PROBE_SNIPPET], capture_output=True, text=True
    )
    return json.loads(out.stdout.strip().splitlines()[-1])["probe_ops_per_sec"]


def membw_probe() -> float:
    out = subprocess.run(
        [sys.executable, "-c", MEMBW_SNIPPET], capture_output=True, text=True
    )
    return json.loads(out.stdout.strip().splitlines()[-1])[
        "membw_bytes_per_sec"
    ]


def _load_best_dict() -> dict:
    try:
        with open(_PROBE_BEST_FILE) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _save_best_dict(d: dict) -> None:
    # atomic replace: the sampler loop and a foreground perf_scaling
    # can both write this file; a truncating open() mid-write would
    # hand a concurrent reader invalid JSON -> best ratchets from a
    # degraded reading and garbage pairs read as healthy.  (The RMW
    # itself is still last-writer-wins per KEY, which only ever loses
    # a ratchet update — the next probe restores it.)
    os.makedirs(os.path.dirname(_PROBE_BEST_FILE), exist_ok=True)
    tmp = f"{_PROBE_BEST_FILE}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(d, f)
    os.replace(tmp, _PROBE_BEST_FILE)


def load_best_probe() -> float:
    """Best-known machine capacity persists across invocations —
    otherwise a run started inside a degraded phase calibrates against
    the degraded baseline and happily records garbage."""
    try:
        return float(_load_best_dict()["best"])
    except (ValueError, KeyError):
        return 0.0


def save_best_probe(v: float) -> None:
    d = _load_best_dict()
    d["best"] = v
    _save_best_dict(d)


def load_best_membw() -> float:
    try:
        return float(_load_best_dict()["membw_best"])
    except (ValueError, KeyError):
        return 0.0


def save_best_membw(v: float) -> None:
    d = _load_best_dict()
    d["membw_best"] = v
    _save_best_dict(d)


def pgfault_probe() -> float:
    out = subprocess.run(
        [sys.executable, "-c", PGFAULT_SNIPPET], capture_output=True, text=True
    )
    return json.loads(out.stdout.strip().splitlines()[-1])[
        "pgfault_bytes_per_sec"
    ]


def load_best_pgfault() -> float:
    try:
        return float(_load_best_dict()["pgfault_best"])
    except (ValueError, KeyError):
        return 0.0


def save_best_pgfault(v: float) -> None:
    d = _load_best_dict()
    d["pgfault_best"] = v
    _save_best_dict(d)


LEG_TIMEOUT = int(os.environ.get("SPARK_GRAFT_LEG_TIMEOUT", "14400"))


def one_run(cores: int, path: str) -> dict:
    code = RUN_SNIPPET.format(repo=REPO, cores=cores, path=path)
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM="32g")
    # timeout: a wedged leg (the in-JVM freeze class BENCH.md r4
    # documents) must fail the TRIAL, not hang the harness forever
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        env=env,
        timeout=LEG_TIMEOUT,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError(out.stderr[-2000:])


def main() -> None:
    from destor_spark.synth import ensure_corpus

    path, _ = ensure_corpus(os.path.join(REPO, ".bench_cache"), 42, N_DOCS)
    samples: dict[int, list[dict]] = {CORES_LOW: [], CORES_HIGH: []}
    best_probe = max(probe(), load_best_probe())
    save_best_probe(best_probe)
    print(f"probe baseline {best_probe:.3g} ops/s", flush=True)
    for r in range(REPEATS):
        for cores in (CORES_LOW, CORES_HIGH):
            waits = 0
            while True:
                p = probe()
                if p > best_probe:
                    best_probe = p
                    save_best_probe(p)
                if p >= PROBE_FLOOR * best_probe or waits >= MAX_WAITS:
                    break
                waits += 1
                print(
                    f"degraded window (probe {p/best_probe:.2f} of best), "
                    f"waiting 60s ({waits}/{MAX_WAITS})",
                    flush=True,
                )
                time.sleep(60)
            res = one_run(cores, path)
            res["probe_frac"] = round(p / best_probe, 3)
            samples[cores].append(res)
            print(
                f"run {r} cores={cores} wall={res['wall']} "
                f"probe_frac={res['probe_frac']}",
                flush=True,
            )
    # headline min is over HEALTHY-window trials only (probe_frac >=
    # floor at trial start); a MAX_WAITS fall-through trial stays in
    # samples_* for the audit trail but must not produce a confident
    # efficiency number measured under interference.  If NO healthy
    # trial exists for a leg the unfiltered min is reported with an
    # explicit degraded flag instead of silently.
    def _leg_min(ss):
        healthy = [s["wall"] for s in ss if s["probe_frac"] >= PROBE_FLOOR]
        if healthy:
            return min(healthy), False
        return min(s["wall"] for s in ss), True

    t8, deg_lo = _leg_min(samples[CORES_LOW])
    t32, deg_hi = _leg_min(samples[CORES_HIGH])
    ratio = CORES_HIGH / CORES_LOW
    eff = round((t8 / t32) / ratio, 3)
    out = {
        "metric": f"dedup scaling local[{CORES_LOW}]->local[{CORES_HIGH}], min of repeats",
        "n_docs": N_DOCS,
        "samples_low": samples[CORES_LOW],
        "samples_high": samples[CORES_HIGH],
        "best_wall_low": t8,
        "best_wall_high": t32,
        "docs_per_sec_low": round(N_DOCS / t8, 1),
        "docs_per_sec_high": round(N_DOCS / t32, 1),
        "speedup": round(t8 / t32, 2),
        "scaling_efficiency": eff,
        "degraded_legs": [
            c
            for c, d in ((CORES_LOW, deg_lo), (CORES_HIGH, deg_hi))
            if d
        ],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
