"""Stage checkpointing with per-partition lineage + metrics.

destor analogue: the recipe + destor.stat pair — every backup persists
its fingerprint sequence and global counters so later jobs (restore,
delete, the next backup) resume from durable state
(/root/reference/src/recipe/recipestore.c:285-400,
/root/reference/src/destor.c:78-213).

Spark restatement: every pipeline stage writes its output as parquet
(Iceberg when a catalog is configured — same call sites, see
sources/catalog.py) plus a manifest json carrying
(run_id, stage, rows, per-partition row counts, wall seconds).  A
re-entrant run loads any stage whose manifest says complete instead of
recomputing — resume-equals-fresh is pinned by tests/test_resume.py.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class StageRunner:
    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        run_id: str,
        context_fp: str | None = None,
    ):
        """context_fp: fingerprint of everything OUTSIDE the checkpoint
        that determines a stage's output (DedupConfig values, pipeline
        flags).  When set, a completed stage resumes only if its
        manifest recorded the same fingerprint — a rerun against the
        same ckpt_dir with a different tau / band config / modality
        switch recomputes instead of silently returning results
        computed under the old parameters.  required_cols guards the
        column LAYOUT; this guards the PARAMETERS."""
        self.spark = spark
        self.base_dir = base_dir
        self.run_id = run_id
        self.context_fp = context_fp
        os.makedirs(base_dir, exist_ok=True)

    def _paths(self, stage: str) -> tuple[str, str]:
        d = os.path.join(self.base_dir, stage)
        return d, d + ".manifest.json"

    def completed(self, stage: str) -> bool:
        _, mpath = self._paths(stage)
        if not os.path.exists(mpath):
            return False
        try:
            with open(mpath) as f:
                m = json.load(f)
        except (json.JSONDecodeError, OSError):
            # a manifest truncated by a crash mid-write (pre-atomic
            # layouts) marks the stage incomplete, not the run broken
            return False
        if m.get("status") != "complete":
            return False
        if self.context_fp is not None and m.get("context_fp") != self.context_fp:
            # stage was computed under different parameters (or a
            # pre-fingerprint layout) — recompute rather than resume
            return False
        return True

    def run(
        self,
        stage: str,
        fn,
        repartition: int | None = None,
        required_cols: tuple[str, ...] = (),
    ) -> DataFrame:
        """fn() -> DataFrame; materialized once, loaded on resume.

        required_cols guards resume across code versions: a checkpoint
        written by an older layout (e.g. a signatures stage from before
        content_sha rode in the same scan) loads fine but breaks the
        FIRST downstream select — recompute it instead of resuming."""
        data_dir, mpath = self._paths(stage)
        if self.completed(stage):
            out = self.spark.read.parquet(data_dir)
            if set(required_cols) <= set(out.columns):
                return out
        t0 = time.time()
        df = fn()
        if repartition:
            df = df.repartition(repartition)
        # invalidate BEFORE the data overwrite: mode('overwrite')
        # deletes the old parquet first, so a crash mid-recompute must
        # not leave a stale 'complete' manifest (written under an
        # earlier config) pointing at destroyed/partial data — a later
        # run under that earlier config would resume from garbage.
        # Atomic replace, same pattern as the commit below.
        if os.path.exists(mpath):
            tmp = mpath + ".tmp"
            with open(tmp, "w") as f:
                json.dump(
                    {"status": "recomputing", "run_id": self.run_id}, f
                )
            os.replace(tmp, mpath)
        df.write.mode("overwrite").parquet(data_dir)
        # wall stops at the durable write: the lineage/metrics queries
        # below re-read the output and would otherwise be billed to the
        # stage, systematically understating throughput_mb_s
        wall = time.time() - t0
        out = self.spark.read.parquet(data_dir)
        part_rows = {
            str(r["pid"]): r["rows"]
            for r in out.groupBy(F.spark_partition_id().alias("pid"))
            .agg(F.count("*").alias("rows"))
            .collect()
        }
        # jcr restore-report analogue (/root/reference/src/do_restore.c:
        # 243-277): data size, throughput MB/s, and the speed factor —
        # destor normalizes restored bytes by containers READ; the
        # parquet restatement normalizes stage bytes by files written
        # (the unit a downstream stage must open), same packing-density
        # meaning.
        data_size = 0
        n_files = 0
        for dp, _, fns in os.walk(data_dir):
            for name in fns:
                if name.endswith(".parquet"):
                    data_size += os.path.getsize(os.path.join(dp, name))
                    n_files += 1
        manifest = {
            "status": "complete",
            "run_id": self.run_id,
            "context_fp": self.context_fp,
            "stage": stage,
            "rows": int(sum(part_rows.values())),
            "n_partitions": len(part_rows),
            "partition_rows": part_rows,
            "wall_s": round(wall, 3),
            "data_size": data_size,
            "n_files": n_files,
            "throughput_mb_s": round(data_size / (1024 * 1024 * wall), 3)
            if wall > 0
            else None,
            "speed_factor": round(data_size / (1024 * 1024 * n_files), 4)
            if n_files
            else None,
        }
        # atomic: a crash mid-dump must leave either no manifest or the
        # previous complete one, never a truncated file — the manifest
        # IS the stage's commit record
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, mpath)
        self._append_metrics(manifest)
        return out

    def _append_metrics(self, manifest: dict) -> None:
        """jcr-equivalent metrics log (/root/reference/src/jcr.h:19-61)."""
        with open(os.path.join(self.base_dir, "metrics.jsonl"), "a") as f:
            slim = {k: v for k, v in manifest.items() if k != "partition_rows"}
            f.write(json.dumps(slim) + "\n")

    def metrics(self) -> list[dict]:
        p = os.path.join(self.base_dir, "metrics.jsonl")
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return [json.loads(line) for line in f if line.strip()]
