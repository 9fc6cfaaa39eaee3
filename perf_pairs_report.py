#!/usr/bin/env python
"""Summarize .bench_cache/scaling_pairs.jsonl per (cores, n_docs):
min wall per leg over healthy-window samples (probe >= floor), the
min-protocol efficiency, and the best atomic pair (both legs healthy).
Pure reporting — the jsonl is the auditable record."""

from __future__ import annotations

import json
import os
import sys
from collections import defaultdict

FLOOR = float(os.environ.get("SPARK_GRAFT_PROBE_FLOOR", "0.85"))
PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    ".bench_cache",
    "scaling_pairs.jsonl",
)


def leg_probes(p: dict, lo: int, hi: int) -> dict[int, tuple[float, float]]:
    """(start, end) probe fractions bracketing each leg's run."""
    order = p.get("order", [lo, hi])
    probes = [p["probe0"], p["probe_mid"], p["probe_end"]]
    return {
        order[0]: (probes[0], probes[1]),
        order[1]: (probes[1], probes[2]),
    }


def main() -> None:
    rows = [json.loads(line) for line in open(PATH) if line.strip()]
    groups = defaultdict(list)
    n_failed = 0
    for r in rows:
        if "failed" in r or "n_docs" not in r or "probe_end" not in r:
            # a dead leg writes only {t, cores, probe0, failed}: count
            # it (the failure is auditable in the jsonl) but keep the
            # report running — one crashed leg must not brick the tool
            n_failed += 1
            continue
        if "cores" not in r:  # r1/r2 rows predate the cores field
            r["cores"] = sorted(
                int(k.split("_")[1]) for k in r if k.startswith("wall_")
            )
        groups[(tuple(r["cores"]), r["n_docs"])].append(r)
    if n_failed:
        print(json.dumps({"failed_or_partial_rows_skipped": n_failed}))
    for (cores, n_docs), rs in sorted(groups.items()):
        lo, hi = cores
        healthy = {lo: [], hi: []}
        best_pair = None
        for r in rs:
            pr = leg_probes(r, lo, hi)
            ok = {c: min(pr[c]) >= FLOOR for c in (lo, hi)}
            for c in (lo, hi):
                if ok[c]:
                    healthy[c].append(r[f"wall_{c}"])
            if ok[lo] and ok[hi]:
                if best_pair is None or r["eff"] > best_pair["eff"]:
                    best_pair = r
        out = {
            "cores": list(cores),
            "n_docs": n_docs,
            "pairs": len(rs),
            "healthy_lo_samples": len(healthy[lo]),
            "healthy_hi_samples": len(healthy[hi]),
        }
        if healthy[lo] and healthy[hi]:
            t_lo, t_hi = min(healthy[lo]), min(healthy[hi])
            out["min_protocol"] = {
                f"t{lo}": t_lo,
                f"t{hi}": t_hi,
                "speedup": round(t_lo / t_hi, 2),
                "eff": round(t_lo / t_hi / (hi / lo), 3),
            }
        if best_pair:
            out["best_atomic_pair"] = {
                k: best_pair[k]
                for k in (
                    "t",
                    f"wall_{lo}",
                    f"wall_{hi}",
                    "speedup",
                    "eff",
                    "probe0",
                    "probe_mid",
                    "probe_end",
                )
            }
        print(json.dumps(out))


if __name__ == "__main__":
    main()
