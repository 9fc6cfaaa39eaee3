#!/usr/bin/env python
"""Benchmark harness.

Default mode (driver contract): run the headline queries + the flagship
dedup pipeline at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]; print ONE JSON line
{"metric": ..., "value": sec, "unit": "sec", "queries": {...}, "sf": ...}.

Protocol (r4): this sandbox is a shared VM whose effective capacity
swings ~4x with host load, so a single-shot wall clock arbitrates
nothing (the r3 driver bench read 2.45x slower than r2 on identical
plans).  The suite therefore runs $SPARK_GRAFT_BENCH_REPEATS (default
3) alternating rounds and reports the MIN wall per query — the
least-interfered observation — plus a calibration probe before each
round and after the last (bracketing), emitted as probe fractions of
the session-best so the reading's cleanliness is auditable in the JSON
itself.  Same protocol as perf_scaling.py, whose machinery this reuses.

--scaling mode (north-rule evidence): run the SAME dedup job at
local[8] and local[32] on the SAME synthesized corpus (two fresh JVMs,
sequentially) and PRINT one JSON line with docs/sec at both + scaling
efficiency (eff = (T8/T32)/4) — nothing is written to disk; paste the
line into BENCH.md (the curated records live there and in
scaling_pairs_r5.jsonl).  This is the sandbox stand-in for N vs 4N
executors.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SEED = 42

# corpus sizes for the synthesized web_pages bench (docs)
_N_BY_SF = {"sf0.001": 1_000, "sf0.01": 5_000, "sf0.1": 50_000}

HEADLINE = [
    "pricing_summary",
    "events_rollup",
    "topk_orders_per_customer",
    "exact_dup_groups",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash",
    "quality_scores",
    "lang_id",
    "ann_cosine_topk",
    # r2 additions: bucketed scale paths + champion selection
    "srp_ann_topk",
    "embedding_near_dup_bucketed",
    "champion_segments",
    "dedup_pipeline_assignments",
    # r3 additions
    "grouping_sets_events",
    "uniform_sample_fingerprint",
    "cfl_monitor",
    # r4 additions
    "rewrite_decisions",
    "exact_media_dedup",
    # r5 additions: DDFS summary-vector prefilter + exact confirm,
    # byte-level Rabin CDC pass (map-only, vectorized kernels)
    "bloom_fp_lookup",
    "cdc_chunk_certificate",
    "optimized_min_features",
    # r5: IVF-partitioned ANN (cell-restricted search, the inverted-file
    # counterpart of srp_ann_topk)
    "ivf_ann_topk",
    # r5: batch incremental dedup — destor's per-version index lookup
    "incremental_dedup",
    # r5: one-sided containment (excerpt/quotation detection)
    "containment_pairs",
    # r5: delta-vs-base MinHash band probe (steady-state index lookup)
    "incremental_near_dup",
    # r5: whitespace vs BPE-ish pre-tokenizer accounting
    "token_stats",
    # r5: corpus-curation family — Gopher repetition, CCNet-style
    # segment dedup, URL canonicalization, SemDeDup, and the composed
    # per-document verdict
    "gopher_repetition",
    "segment_dedup_stats",
    "url_dup_groups",
    "semantic_dedup",
    "corpus_curation_decisions",
    "segment_clean_corpus",
    "decontamination",
    "pii_scrub",
    "source_mixture",
    # r5: suffix-array exact-substring measurement pass (third
    # north-star modality; SA kernel vs diagonal-islands oracle)
    "sa_longest_span",
]


def _sf_label(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir))


def _sf_value(sf_dir: str) -> float:
    try:
        return float(_sf_label(sf_dir).replace("sf", ""))
    except ValueError:
        return -1.0


def _corpus_path(n_docs: int) -> str:
    from destor_spark.synth import ensure_corpus

    cache = os.path.join(REPO, ".bench_cache")
    pages_path, _ = ensure_corpus(cache, SEED, n_docs)
    return pages_path


def _build(master: str, shuffle: int):
    from destor_spark.session import build_session

    return build_session(
        app="destor-bench", master=master, shuffle_partitions=shuffle
    )


def run_dedup_pipeline(
    spark, pages_path: str, use_substring: bool = False
) -> tuple[int, float]:
    """Returns (n_docs, wall_sec) for the full dedup pipeline.

    use_substring=True adds the third modality (anchored-gram
    candidates + vectorized exact-span verify) — benched separately so
    its cost is visible next to the MinHash+SimHash baseline."""
    from destor_spark.config import DedupConfig
    from destor_spark.plans.pipeline import run_pipeline

    pages = spark.read.parquet(pages_path)
    t0 = time.time()
    res = run_pipeline(
        pages, DedupConfig(), use_simhash=True, use_substring=use_substring
    )
    n = res.assignments.count()
    wall = time.time() - t0
    # drop this run's stage-barrier parquet immediately: the default
    # bench runs the pipeline 6x (3 repeats x 2 variants) and leaving
    # every run's signatures/edges/assignments barriers on disk until
    # interpreter exit costs GBs at sf0.1 (cleanup is outside the
    # timed window; the assignments count above fully consumed them)
    res.cleanup()
    return n, wall


def bench_simhash_passes(spark, pages_path: str) -> dict[str, float]:
    """Pigeonhole (default) vs 8-block combination index (SCALE_CONFIG
    path) over the SAME signature table: identical verified pairs
    (parity-gated in tests/test_simhash_combo.py), different bucket
    selectivity — the number the combo path exists to improve."""
    from destor_spark.config import DedupConfig
    from destor_spark.operators.simhash import simhash_pairs
    from destor_spark.plans.pipeline import (
        _materialize,
        _mat_root,
        signatures_stage,
    )

    pages = spark.read.parquet(pages_path)
    sigs = _materialize(
        signatures_stage(pages, DedupConfig()),
        "bench_simhash_sigs",
        _mat_root(spark),
    )
    out = {}
    for label, cfg in (
        ("simhash_pass_pigeonhole", DedupConfig()),
        ("simhash_pass_combo8", DedupConfig(simhash_combo_blocks=8)),
    ):
        t0 = time.time()
        simhash_pairs(sigs, cfg).count()
        out[label] = round(time.time() - t0, 3)
    return out


def bench_media_features(spark, n_rows: int) -> float:
    """Arrow feature stage at sf VOLUME: sniff + feature-extract +
    exact-dedup over the sf-scaled media corpus (synth.make_media_corpus,
    2-16 KB payloads, mean dup multiplicity 2.5).  The fixture-backed
    `exact_media_dedup` driver query stays as the CORRECTNESS gate; its
    0.4 s bench line measured session overhead over 40 rows (r4 judge,
    What's wrong #3) — this entry is the media family's honest price."""
    from destor_spark.operators.multimodal import (
        exact_media_dedup,
        extract_features,
        with_media_metadata,
    )
    from destor_spark.synth import ensure_media_corpus

    path = ensure_media_corpus(
        os.path.join(REPO, ".bench_cache"), SEED, n_rows
    )
    media = spark.read.parquet(path)
    t0 = time.time()
    meta_n = with_media_metadata(media).filter("width is not null").count()
    dup_n = exact_media_dedup(extract_features(media)).count()
    assert meta_n > 0 and dup_n > 0
    return round(time.time() - t0, 3)


REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))


def _probe_frac() -> dict:
    """Dual-dimension health probe, as fractions of the persisted
    session-best (shared with perf_scaling so bench and scaling runs
    calibrate against one baseline).  The ALU dimension alone is blind
    to bandwidth-level neighbor contention (BENCH.md r5 audit notes
    2-3: shuffle/Arrow stages ran 2-2.7x slow under cpu_frac ~0.87
    while streaming-copy bandwidth read 0.003-0.44 of best), so the
    headline `frac` is min(cpu, membw) and both dimensions are emitted
    so a reader can renormalize the round's numbers."""
    import perf_scaling as PS

    p = PS.probe()
    best = max(p, PS.load_best_probe())
    PS.save_best_probe(best)
    bw = PS.membw_probe()
    best_bw = max(bw, PS.load_best_membw())
    PS.save_best_membw(best_bw)
    pf = PS.pgfault_probe()
    best_pf = max(pf, PS.load_best_pgfault())
    PS.save_best_pgfault(best_pf)
    cpu_frac = round(p / best, 3)
    bw_frac = round(bw / best_bw, 3)
    return {
        "frac": min(cpu_frac, bw_frac),
        "cpu": cpu_frac,
        "membw": bw_frac,
        # observational: host same-page-merge / COW-fault pressure
        # (BENCH.md r5 audit note 4) — recorded, not part of `frac`
        "pgfault": round(pf / best_pf, 3),
    }


def default_bench() -> None:
    import destor_spark.queries as Q

    spark = _build(f"local[{CPUS}]", CPUS)
    n_docs = _N_BY_SF.get(_sf_label(SF_DIR), 5_000)
    pages_path = _corpus_path(n_docs)

    per_query: dict[str, float] = {}
    dedup_n = 0
    probes: list[dict] = []
    for _ in range(REPEATS):
        probes.append(_probe_frac())
        for name in HEADLINE:
            fn = Q.QUERIES[name]
            t0 = time.time()
            fn(spark, SF_DIR).count()
            wall = round(time.time() - t0, 3)
            per_query[name] = min(per_query.get(name, wall), wall)
        dedup_n, wall = run_dedup_pipeline(spark, pages_path)
        wall = round(wall, 3)
        per_query["webpages_dedup_pipeline"] = min(
            per_query.get("webpages_dedup_pipeline", wall), wall
        )
        _, wall_ss = run_dedup_pipeline(spark, pages_path, use_substring=True)
        wall_ss = round(wall_ss, 3)
        per_query["webpages_dedup_pipeline_substring"] = min(
            per_query.get("webpages_dedup_pipeline_substring", wall_ss), wall_ss
        )
        for k, v in bench_simhash_passes(spark, pages_path).items():
            per_query[k] = min(per_query.get(k, v), v)
        w = bench_media_features(spark, n_docs // 2)
        per_query["media_features_volume"] = min(
            per_query.get("media_features_volume", w), w
        )
    probes.append(_probe_frac())

    docs_per_sec = round(dedup_n / per_query["webpages_dedup_pipeline"], 1)
    total = round(sum(per_query.values()), 3)
    print(
        json.dumps(
            {
                "metric": "operator suite + dedup pipeline wall time",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": _sf_value(SF_DIR),
                "dedup_docs": dedup_n,
                "dedup_docs_per_sec": docs_per_sec,
                "cpus": CPUS,
                "protocol": f"min-of-{REPEATS} alternating rounds",
                # min(cpu, membw) per bracketing probe, for continuity
                # with earlier rounds' scalar probe_fracs
                "probe_fracs": [pr["frac"] for pr in probes],
                "probe_cpu_fracs": [pr["cpu"] for pr in probes],
                "probe_membw_fracs": [pr["membw"] for pr in probes],
                "probe_pgfault_fracs": [pr["pgfault"] for pr in probes],
            }
        )
    )
    spark.stop()


def scaling_bench(n_docs: int = 50_000) -> None:
    """Same job, same input, local[8] then local[32] (N vs 4N)."""
    pages_path = _corpus_path(n_docs)
    results = {}
    for cores in (8, 32):
        spark = _build(f"local[{cores}]", cores)
        # warm the JVM/reader so we time the job, not class loading
        spark.read.parquet(pages_path).count()
        n, wall = run_dedup_pipeline(spark, pages_path)
        results[cores] = {
            "docs": n,
            "wall_sec": round(wall, 2),
            "docs_per_sec": round(n / wall, 1),
        }
        spark.stop()
    t8, t32 = results[8]["wall_sec"], results[32]["wall_sec"]
    eff = round((t8 / t32) / 4.0, 3)
    speedup = round(t8 / t32, 2)
    out = {
        "metric": "dedup throughput scaling local[8] -> local[32]",
        "value": eff,
        "unit": "efficiency",
        "n_docs": n_docs,
        "local8": results[8],
        "local32": results[32],
        "speedup": speedup,
        "scaling_efficiency": eff,
    }
    # Single-shot numbers on this shared VM swing up to 4x with host
    # load; perf_scaling.py (probe-gated, min-of-repeats) is the
    # protocol of record for BENCH.md — this mode only prints JSON.
    print(json.dumps(out))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        n = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "50000"))
        scaling_bench(n)
    else:
        default_bench()
