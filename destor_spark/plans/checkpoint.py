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
    def __init__(self, spark: SparkSession, base_dir: str, run_id: str):
        self.spark = spark
        self.base_dir = base_dir
        self.run_id = run_id
        os.makedirs(base_dir, exist_ok=True)

    def _paths(self, stage: str) -> tuple[str, str]:
        d = os.path.join(self.base_dir, stage)
        return d, d + ".manifest.json"

    def completed(self, stage: str) -> bool:
        _, mpath = self._paths(stage)
        if not os.path.exists(mpath):
            return False
        with open(mpath) as f:
            return json.load(f).get("status") == "complete"

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
        df.write.mode("overwrite").parquet(data_dir)
        out = self.spark.read.parquet(data_dir)
        part_rows = {
            str(r["pid"]): r["rows"]
            for r in out.groupBy(F.spark_partition_id().alias("pid"))
            .agg(F.count("*").alias("rows"))
            .collect()
        }
        wall = time.time() - t0
        # jcr restore-report analogue (/root/reference/src/do_restore.c:
        # 243-277): data size, throughput MB/s, and the speed factor —
        # destor normalizes restored bytes by containers READ; the
        # parquet restatement normalizes stage bytes by files written
        # (the unit a downstream stage must open), same packing-density
        # meaning.
        data_size = sum(
            os.path.getsize(os.path.join(dp, fn))
            for dp, _, fns in os.walk(data_dir)
            for fn in fns
            if fn.endswith(".parquet")
        )
        n_files = sum(
            1
            for _, _, fns in os.walk(data_dir)
            for fn in fns
            if fn.endswith(".parquet")
        )
        manifest = {
            "status": "complete",
            "run_id": self.run_id,
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
        with open(mpath, "w") as f:
            json.dump(manifest, f, indent=1)
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
