#!/usr/bin/env python
"""Opportunistic scaling sampler.

Loops: probe machine capacity against the best-ever baseline
(.bench_cache/probe_best.json); when the host is in a healthy window
(probe >= --floor of best), fire one back-to-back local[8]/local[32]
pair of the full dedup pipeline and append the pair + probe readings to
.bench_cache/scaling_pairs.jsonl.  Analysis (BENCH.md) takes the best
pair whose BOTH runs sat in healthy windows.

Rationale: this shared VM spends long phases at ~40% effective
capacity, where local[32] thrashes while local[8] barely notices —
any fixed-schedule protocol records garbage pairs.  Sampling only in
healthy windows measures the code, not the neighbors.
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from perf_scaling import (  # noqa: E402
    RUN_SNIPPET,
    load_best_membw,
    load_best_pgfault,
    load_best_probe,
    membw_probe,
    pgfault_probe,
    probe,
    save_best_membw,
    save_best_pgfault,
    save_best_probe,
)

N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "1000000"))
CORES_LOW = int(os.environ.get("SPARK_GRAFT_CORES_LOW", "8"))
CORES_HIGH = int(os.environ.get("SPARK_GRAFT_CORES_HIGH", "32"))
FLOOR = float(os.environ.get("SPARK_GRAFT_PROBE_FLOOR", "0.85"))
OUT = os.path.join(REPO, ".bench_cache", "scaling_pairs.jsonl")
# Builder/sampler coordination: `touch .bench_cache/PAUSE` holds the
# sampler between pairs (dev test runs would otherwise read as healthy
# probes one moment and steal the pair's cores the next); STATE says
# whether a pair is mid-flight so the builder can defer heavy work.
PAUSE = os.path.join(REPO, ".bench_cache", "PAUSE")
STATE = os.path.join(REPO, ".bench_cache", "sampler_state.json")


def _set_state(state: str, **extra) -> None:
    with open(STATE, "w") as f:
        json.dump({"state": state, "t": time.strftime("%H:%M:%S"), **extra}, f)


def one_run(cores: int, path: str) -> dict:
    code = RUN_SNIPPET.format(repo=REPO, cores=cores, path=path)
    # Stage barriers + shuffle spill on tmpfs (SCALE.md r2: t2 696->510
    # measured) — the sandbox analogue of a real cluster's node-local
    # NVMe.  Disk-backed /tmp adds a CONSTANT IO share to every leg,
    # which deflates the high-parallelism leg's apparent scaling.
    env = dict(
        os.environ,
        SPARK_GRAFT_DRIVER_MEM=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"),
        SPARK_GRAFT_MAT_DIR="/dev/shm/destor_mat",
        SPARK_LOCAL_DIRS="/dev/shm/destor_spark_local",
        # a leg that dies in native code should leave a Python stack in
        # the log, not just "Python worker exited unexpectedly" (one 4M
        # leg was lost that way); sampler legs are diagnostics, so the
        # per-UDF-launch overhead is acceptable here
        SPARK_GRAFT_FAULTHANDLER="1",
    )
    os.makedirs("/dev/shm/destor_mat", exist_ok=True)
    os.makedirs("/dev/shm/destor_spark_local", exist_ok=True)
    # timeout: a wedged leg (the in-JVM freeze class BENCH.md r4
    # documents) must become a 'failed' row and let the loop resume —
    # not hang the sampler forever with STATE stuck at pair_running
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        env=env,
        timeout=int(os.environ.get("SPARK_GRAFT_LEG_TIMEOUT", "14400")),
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    # surface the ROOT exception, not just the stack tail: the first
    # "Caused by"/Error lines name the failure; the raw tail truncates
    # to anonymous lambda frames.
    causes = [
        ln
        for ln in out.stderr.splitlines()
        if "Caused by" in ln or "Error" in ln or "Exception:" in ln
    ]
    raise RuntimeError("; ".join(causes[:8]) or out.stderr[-1000:])


def main() -> None:
    from destor_spark.synth import ensure_corpus

    path, _ = ensure_corpus(os.path.join(REPO, ".bench_cache"), 42, N_DOCS)
    # Stage the input on tmpfs beside the barriers: a leg must never pay
    # a cold disk read inside its timed window (the sandbox analogue of
    # a cluster's page-cached/distributed input).  Page cache would
    # usually do this, but a 20-minute local[2] leg can see eviction;
    # tmpfs makes it structural.
    shm_dir = "/dev/shm/destor_input"
    os.makedirs(shm_dir, exist_ok=True)
    shm_path = os.path.join(shm_dir, os.path.basename(path))
    if not os.path.exists(shm_path) or os.path.getsize(shm_path) != os.path.getsize(path):
        import shutil

        shutil.copyfile(path, shm_path + ".tmp")
        os.replace(shm_path + ".tmp", shm_path)
    path = shm_path
    best = load_best_probe()
    best_bw = load_best_membw()
    best_pf = load_best_pgfault()

    def take_probe() -> dict:
        """Health probe: ALU ops AND true memory bandwidth gate the
        sampling (the r5 next-day regime proved the ALU probe alone is
        blind to memory-level contention: cpu frac 0.86-0.88 while
        shuffle stages ran 2-2.7x slow, stage A/B in BENCH.md); the
        page-fault/same-page-merge pressure dimension is RECORDED per
        probe but not gated on — its healthy range is uncharacterized
        and it swings 500x with host page-dedup activity (BENCH.md r5
        audit note 4)."""
        nonlocal best, best_bw, best_pf
        p = probe()
        bw = membw_probe()
        pf = pgfault_probe()
        if p > best:
            best = p
            save_best_probe(p)
        if bw > best_bw:
            best_bw = bw
            save_best_membw(bw)
        if pf > best_pf:
            best_pf = pf
            save_best_pgfault(pf)
        cpu_frac = p / best if best else 0.0
        bw_frac = bw / best_bw if best_bw else 0.0
        pf_frac = pf / best_pf if best_pf else 0.0
        return {
            "ops": p,
            "cpu_frac": round(cpu_frac, 3),
            "bw": bw,
            "bw_frac": round(bw_frac, 3),
            "pf": pf,
            "pf_frac": round(pf_frac, 3),
            "frac": round(min(cpu_frac, bw_frac), 3),
        }

    while True:
        if os.path.exists(PAUSE):
            _set_state("paused")
            print("PAUSE file present, sleeping 60s", flush=True)
            time.sleep(60)
            continue
        _set_state("probing")
        pr0 = take_probe()
        frac = pr0["frac"]
        if frac < FLOOR:
            _set_state(
                "degraded", frac=frac, cpu=pr0["cpu_frac"], bw=pr0["bw_frac"]
            )
            print(
                f"degraded (min {frac:.2f}: cpu {pr0['cpu_frac']:.2f}, "
                f"membw {pr0['bw_frac']:.2f}), sleeping 120s",
                flush=True,
            )
            time.sleep(120)
            continue
        _set_state("pair_running", n_docs=N_DOCS, probe0=frac)
        # Alternate which leg runs first: the host's degradation phases
        # are minutes-long, so a fixed low-then-high order systematically
        # lands the HIGH leg deeper into a decaying window (observed:
        # six r3 pairs, every slow probe_end on the high leg).  The
        # min-per-leg protocol needs both legs sampled in the fresh
        # position.  Parity of the RECORDED pair count guarantees true
        # alternation even across sampler restarts (the previous
        # minute-of-epoch parity did NOT alternate: pairs of
        # near-constant duration kept landing on the same parity).
        try:
            with open(OUT) as _f:
                n_recorded = sum(1 for _l in _f if _l.strip())
        except OSError:
            n_recorded = 0
        first_low = n_recorded % 2 == 0
        order = (
            (CORES_LOW, CORES_HIGH) if first_low else (CORES_HIGH, CORES_LOW)
        )
        pair = {
            "t": time.strftime("%H:%M:%S"),
            "cores": [CORES_LOW, CORES_HIGH],
            "order": list(order),
            # probe fields are min(cpu, membw) fractions; *_cpu/*_bw
            # carry the per-dimension readings
            "probe0": frac,
            "probe0_cpu": pr0["cpu_frac"],
            "probe0_bw": pr0["bw_frac"],
            # raw ops/s beside each fraction: the session-best baseline
            # ratchets up over time (and .bench_cache is wiped between
            # rounds), so fractions written early can under- or
            # over-state health — raw values let analysis renormalize
            # every historical row against the final best.
            "probe0_ops": pr0["ops"],
            "probe0_bw_bytes": pr0["bw"],
            "probe0_pf": pr0["pf_frac"],
            "probe0_pf_bytes": pr0["pf"],
        }
        walls = {}
        try:
            ra = one_run(order[0], path)
        except (RuntimeError, subprocess.TimeoutExpired) as exc:
            # a failed leg (JVM death, host eviction, wedge->timeout)
            # is a finding, not
            # a reason to stop sampling — log it and keep looping
            pair["failed"] = f"{order[0]}: {exc}"[:500]
            with open(OUT, "a") as f:
                f.write(json.dumps(pair) + "\n")
            print(json.dumps(pair), flush=True)
            continue
        pr1 = take_probe()
        walls[order[0]] = ra["wall"]
        pair[f"wall_{order[0]}"] = ra["wall"]
        pair["probe_mid"] = pr1["frac"]
        pair["probe_mid_cpu"] = pr1["cpu_frac"]
        pair["probe_mid_bw"] = pr1["bw_frac"]
        pair["probe_mid_ops"] = pr1["ops"]
        pair["probe_mid_bw_bytes"] = pr1["bw"]
        pair["probe_mid_pf"] = pr1["pf_frac"]
        pair["probe_mid_pf_bytes"] = pr1["pf"]
        try:
            rb = one_run(order[1], path)
        except (RuntimeError, subprocess.TimeoutExpired) as exc:
            pair["failed"] = f"{order[1]}: {exc}"[:500]
            with open(OUT, "a") as f:
                f.write(json.dumps(pair) + "\n")
            print(json.dumps(pair), flush=True)
            continue
        pr2 = take_probe()
        walls[order[1]] = rb["wall"]
        pair[f"wall_{order[1]}"] = rb["wall"]
        pair["probe_end"] = pr2["frac"]
        pair["probe_end_cpu"] = pr2["cpu_frac"]
        pair["probe_end_bw"] = pr2["bw_frac"]
        pair["probe_end_ops"] = pr2["ops"]
        pair["probe_end_bw_bytes"] = pr2["bw"]
        pair["probe_end_pf"] = pr2["pf_frac"]
        pair["probe_end_pf_bytes"] = pr2["pf"]
        pair["n_docs"] = N_DOCS
        pair["speedup"] = round(walls[CORES_LOW] / walls[CORES_HIGH], 2)
        pair["eff"] = round(
            walls[CORES_LOW] / walls[CORES_HIGH] / (CORES_HIGH / CORES_LOW), 3
        )
        with open(OUT, "a") as f:
            f.write(json.dumps(pair) + "\n")
        print(json.dumps(pair), flush=True)


if __name__ == "__main__":
    main()
