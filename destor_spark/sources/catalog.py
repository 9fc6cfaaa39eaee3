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
import re

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg runtime jar is actually on the classpath.

    NOTE: `spark._jvm.org.apache.iceberg.Schema` alone is NOT a check —
    py4j resolves attribute chains lazily and returns a JavaPackage for
    any missing class, so it never raises.  Class.forName does."""
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.Schema"
        )
        return True
    except Exception:
        return False


class IcebergCatalog:
    """Iceberg-backed implementation of the same table interface.

    Real call sites for the cluster path (this sandbox has no Iceberg
    jars, so these are exercised by tests/test_catalog.py's stubbed
    routing test and skip-marked against a live catalog):

      * writes through the DataFrameWriterV2 API (`writeTo`), which
        routes the Spark catalog plugin (`spark.sql.catalog.<name> =
        org.apache.iceberg.spark.SparkCatalog`) — snapshots per write,
        so resume/time-travel come for free (destor's recipe store
        keeps per-backup versions the same way,
        /root/reference/src/recipe/recipestore.c:285-400);
      * `DELETE FROM ... WHERE` — a metadata/positional delete, not a
        full-table rewrite (destor manifest truncation + index purge,
        /root/reference/src/cma.c:83-139);
      * `CALL <catalog>.system.expire_snapshots` — GC of unreachable
        data files (destor's container GC after deletion).

    Setup on a real cluster (see README):
      spark.sql.catalog.dedup=org.apache.iceberg.spark.SparkCatalog
      spark.sql.catalog.dedup.type=hadoop   (or hive/rest)
      spark.sql.catalog.dedup.warehouse=<shared path>
    """

    def __init__(
        self, spark: SparkSession, catalog: str, namespace: str = "dedup"
    ):
        self.spark = spark
        self.catalog = catalog
        self.namespace = namespace
        spark.sql(
            f"CREATE NAMESPACE IF NOT EXISTS {catalog}.{namespace}"
        )

    _NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")

    def _fq(self, name: str) -> str:
        # table names are interpolated into SQL (delete_where,
        # expire_snapshots): restrict to identifier characters.  The
        # WHERE predicate itself is intentionally raw SQL — this is an
        # internal API whose callers pass literal predicates, never
        # user input (see delete_where docstring).
        if not self._NAME_RE.fullmatch(name):
            raise ValueError(f"invalid table name {name!r}")
        return f"{self.catalog}.{self.namespace}.{name}"

    def write_table(
        self,
        df: DataFrame,
        name: str,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
    ) -> None:
        """mode: 'overwrite' (createOrReplace) or 'append' (creates the
        table if absent).  Any other mode raises — silently mapping
        'error'/'ignore' semantics onto createOrReplace would clobber
        existing tables."""
        if mode not in ("overwrite", "append"):
            raise ValueError(
                f"unsupported write mode {mode!r}: use 'overwrite' or "
                "'append'"
            )
        w = df.writeTo(self._fq(name))
        if partition_by:
            from pyspark.sql import functions as F

            w = w.partitionedBy(*[F.col(c) for c in partition_by])
        if mode == "append" and self.exists(name):
            w.append()
        else:
            w.createOrReplace()

    def read_table(self, name: str) -> DataFrame:
        return self.spark.table(self._fq(name))

    def read_table_at(self, name: str, snapshot_id: int) -> DataFrame:
        """Time travel: read a historical snapshot (resume/audit)."""
        return self.spark.read.option("snapshot-id", snapshot_id).table(
            self._fq(name)
        )

    def exists(self, name: str) -> bool:
        return self.spark.catalog.tableExists(self._fq(name))

    def delete_where(self, name: str, predicate: str) -> None:
        """predicate is interpolated verbatim into the DELETE statement
        — pass trusted literal SQL only (internal API; do NOT route
        user input here)."""
        self.spark.sql(f"DELETE FROM {self._fq(name)} WHERE {predicate}")

    def expire_snapshots(self, name: str, older_than_ts: str) -> None:
        """GC: drop snapshots (and newly unreachable files) older than
        the timestamp literal, e.g. '2024-01-01 00:00:00'."""
        self.spark.sql(
            f"CALL {self.catalog}.system.expire_snapshots("
            f"table => '{self.namespace}.{name}', "
            f"older_than => TIMESTAMP '{older_than_ts}')"
        )


def open_catalog(
    spark: SparkSession,
    base: str,
    iceberg_catalog: str | None = None,
):
    """Route to Iceberg when the runtime has the jars (and a catalog
    name is configured), else the parquet-dir fallback — identical
    call sites either way."""
    name = iceberg_catalog or os.environ.get("SPARK_GRAFT_ICEBERG_CATALOG")
    if (
        name
        and spark.conf.get(f"spark.sql.catalog.{name}", None) is not None
        and iceberg_available(spark)
    ):
        return IcebergCatalog(spark, name)
    return Catalog(spark, base)


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
        # atomic replace (same pattern as checkpoint.py stage
        # manifests): truncating _catalog.json in place meant a crash
        # mid-dump corrupted the manifest and bricked every later
        # catalog call with JSONDecodeError
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self._manifest_path)

    def write_table(
        self,
        df: DataFrame,
        name: str,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
    ) -> None:
        # same mode whitelist as IcebergCatalog.write_table: 'ignore'
        # would skip the write while the manifest below still recorded
        # a new version, and 'error'/'errorifexists' diverge from the
        # Iceberg path's createOrReplace — the routing contract is
        # identical call sites either way
        if mode not in ("overwrite", "append"):
            raise ValueError(
                f"unsupported write mode {mode!r}: use 'overwrite' or "
                "'append'"
            )
        path = os.path.join(self.base, name)
        m = self._load_manifest()
        prior = m["tables"].get(name, {})
        if mode == "append" and name in m["tables"]:
            # Iceberg keeps the table's partition spec on append; the
            # fallback must too, or an append without partition_by
            # drops top-level part-files beside lang=... dirs
            # ('Conflicting directory structures' on the next read)
            # and silently resets the recorded layout
            recorded = prior.get("partition_by") or []
            if partition_by is None:
                partition_by = recorded
            elif list(partition_by) != recorded:
                raise ValueError(
                    f"append partition_by {partition_by} conflicts with "
                    f"table layout {recorded} (Iceberg appends always "
                    "use the table's existing spec)"
                )
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)
        versions = prior.get("versions", 0)
        m["tables"][name] = {
            "path": path,
            "format": "parquet",
            "versions": versions + 1,
            "partition_by": list(partition_by) if partition_by else [],
        }
        self._save_manifest(m)

    def read_table(self, name: str) -> DataFrame:
        path = os.path.join(self.base, name)
        # crash recovery for delete_where's two-rename commit: a crash
        # between rename(path, __old) and rename(__rewrite, path)
        # leaves no dir at `path` — restore whichever side exists
        # (the NEW data if its rewrite completed, else the old table)
        if not os.path.exists(path):
            for side in (path + "__rewrite", path + "__old"):
                if os.path.exists(side):
                    os.rename(side, path)
                    break
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
        old = path + "__old"
        m = self._load_manifest()
        entry = m["tables"].get(name, {})
        part_by = entry.get("partition_by") or []
        # Iceberg DELETE semantics: remove rows where the predicate is
        # TRUE — rows where it evaluates to NULL are KEPT.  A bare
        # NOT(pred) filter silently deletes the NULL rows too
        # (NOT(NULL) is NULL), so the survivor condition must admit
        # them explicitly.
        survivors = self.read_table(name).filter(
            f"NOT ({predicate}) OR (({predicate}) IS NULL)"
        )
        w = survivors.write.mode("overwrite")
        if part_by:
            # preserve the table's physical layout across the rewrite
            w = w.partitionBy(*part_by)
        w.parquet(tmp)
        # commit via renames: the table dir is moved aside, the new
        # data renamed in, then the old data removed.  Between the two
        # renames there IS a brief no-dir-at-`path` window (POSIX has
        # no atomic directory swap); read_table covers it by restoring
        # from __rewrite (the committed new data) or __old (the
        # original) whenever `path` is missing — so a crash at any
        # point leaves a RECOVERABLE table, never a lost one
        shutil.rmtree(old, ignore_errors=True)
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old, ignore_errors=True)
        if entry:
            entry["versions"] = entry.get("versions", 0) + 1
            m["tables"][name] = entry
            self._save_manifest(m)
