"""Catalog table IO + predicate delete (destor GC analogue,
/root/reference/src/cma.c:83-139, /root/reference/src/do_delete.c)."""

from __future__ import annotations

import pytest

from destor_spark.sources.catalog import (
    Catalog,
    IcebergCatalog,
    iceberg_available,
    open_catalog,
)


def test_write_read_roundtrip(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "cat"))
    df = spark.range(100).selectExpr("id", "id % 7 AS grp")
    cat.write_table(df, "nums", partition_by=["grp"])
    assert cat.exists("nums")
    got = cat.read_table("nums")
    assert got.count() == 100
    assert set(got.columns) == {"id", "grp"}


def test_predicate_delete_gc(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "cat"))
    df = spark.range(1000).selectExpr("id", "id % 10 AS retention_class")
    cat.write_table(df, "assignments")
    # retention: drop everything in classes 0-2 (destor: backups whose
    # time <= deleted jobid become invalid)
    cat.delete_where("assignments", "retention_class <= 2")
    remaining = cat.read_table("assignments")
    assert remaining.count() == 700
    assert remaining.filter("retention_class <= 2").count() == 0


def test_version_bump(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "cat"))
    df = spark.range(5)
    cat.write_table(df, "t")
    cat.write_table(df, "t")
    m = cat._load_manifest()
    assert m["tables"]["t"]["versions"] == 2


def test_partition_pruning(spark, tmp_path):
    """Writes partitioned by lang must prune at read (PartitionFilters
    in the scan; destor analogue: metadata-only container reads,
    /root/reference/src/storage/containerstore.c:269-356)."""
    cat = Catalog(spark, str(tmp_path / "cat"))
    df = spark.createDataFrame(
        [(f"u{i}", ["en", "de", "fr"][i % 3]) for i in range(90)],
        "url string, lang string",
    )
    cat.write_table(df, "pages", partition_by=["lang"])
    q = cat.read_table("pages").filter("lang = 'de'")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan, plan[:500]
    assert q.count() == 30


def test_open_catalog_routes_to_parquet_fallback(spark, tmp_path):
    """No Iceberg jars in this sandbox -> parquet fallback, identical
    call sites."""
    cat = open_catalog(spark, str(tmp_path / "cat"))
    assert isinstance(cat, Catalog)
    # and the env-configured route still falls back without the jars
    cat2 = open_catalog(
        spark, str(tmp_path / "cat"), iceberg_catalog="dedup"
    )
    if not iceberg_available(spark):
        assert isinstance(cat2, Catalog)


class _SqlRecorder:
    """Stub SparkSession capturing the SQL the Iceberg branch issues."""

    def __init__(self):
        self.stmts: list[str] = []

        class _Cat:
            @staticmethod
            def tableExists(name):
                return False

        self.catalog = _Cat()

    def sql(self, stmt):
        self.stmts.append(stmt)


def test_iceberg_call_sites_without_jars():
    """The Iceberg branch must issue the right DDL/DML even though this
    sandbox can't execute it (skip-marked live test below runs it on a
    real catalog)."""
    rec = _SqlRecorder()
    cat = IcebergCatalog(rec, "dedup", "ns")
    assert rec.stmts[0] == "CREATE NAMESPACE IF NOT EXISTS dedup.ns"
    cat.delete_where("assignments", "retention_class <= 2")
    assert (
        rec.stmts[-1]
        == "DELETE FROM dedup.ns.assignments WHERE retention_class <= 2"
    )
    cat.expire_snapshots("assignments", "2024-01-01 00:00:00")
    assert rec.stmts[-1] == (
        "CALL dedup.system.expire_snapshots("
        "table => 'ns.assignments', "
        "older_than => TIMESTAMP '2024-01-01 00:00:00')"
    )
    assert not cat.exists("assignments")


def test_iceberg_live_roundtrip(spark, tmp_path):
    """Full Iceberg roundtrip — runs only where the jars + a configured
    catalog exist (real cluster); skipped in this sandbox."""
    if not iceberg_available(spark):
        pytest.skip("no Iceberg jars in this runtime")
    cat = IcebergCatalog(spark, "dedup")
    df = spark.range(100).selectExpr("id", "id % 7 AS grp")
    cat.write_table(df, "nums", partition_by=["grp"])
    assert cat.read_table("nums").count() == 100
    cat.delete_where("nums", "grp = 0")
    assert cat.read_table("nums").filter("grp = 0").count() == 0


def test_binaryfile_ingest(spark, tmp_path):
    """Second source connector: raw html dir -> web_pages table with
    byte-identical extraction."""
    import os

    from destor_spark.sources.ingest import ingest_html_dir
    from destor_spark.synth import render_html

    d = tmp_path / "crawl"
    os.makedirs(d)
    texts = {f"doc{i}": f"page text number {i} with words" for i in range(5)}
    for name, t in texts.items():
        with open(d / f"{name}.html", "wb") as f:
            f.write(render_html(t, invalid_utf8=(name == "doc3")))
    pages = ingest_html_dir(spark, str(d))
    rows = {os.path.basename(r["url"]): r for r in pages.collect()}
    assert len(rows) == 5
    for name, t in texts.items():
        assert rows[f"{name}.html"]["text"] == t
        assert rows[f"{name}.html"]["warc_ts"] is not None


def test_delete_where_keeps_null_predicate_rows(spark, tmp_path):
    """Iceberg DELETE semantics: rows where the predicate evaluates to
    NULL are KEPT (DELETE removes only predicate-TRUE rows).  The
    fallback's bare NOT(pred) filter silently dropped them — NOT(NULL)
    is NULL."""
    cat = Catalog(spark, str(tmp_path / "cat"))
    df = spark.createDataFrame(
        [("a", "en"), ("b", None), ("c", "de")], "url string, lang string"
    )
    cat.write_table(df, "pages")
    cat.delete_where("pages", "lang = 'en'")
    got = {r["url"] for r in cat.read_table("pages").collect()}
    assert got == {"b", "c"}, got


def test_delete_where_preserves_partition_layout(spark, tmp_path):
    """The rewrite must re-apply the manifest's partition_by (and bump
    the version): a predicate delete must not silently flatten a
    partitioned table."""
    import os

    cat = Catalog(spark, str(tmp_path / "cat"))
    df = spark.range(100).selectExpr("id", "id % 4 AS grp")
    cat.write_table(df, "nums", partition_by=["grp"])
    v0 = cat._load_manifest()["tables"]["nums"]["versions"]
    cat.delete_where("nums", "grp = 0")
    table_dir = os.path.join(cat.base, "nums")
    subdirs = {d for d in os.listdir(table_dir) if d.startswith("grp=")}
    assert subdirs == {"grp=1", "grp=2", "grp=3"}, subdirs
    m = cat._load_manifest()["tables"]["nums"]
    assert m["versions"] == v0 + 1
    assert cat.read_table("nums").count() == 75


def test_fallback_write_mode_whitelist(spark, tmp_path):
    """Catalog.write_table rejects the modes IcebergCatalog rejects —
    'ignore' would skip the write yet still bump the manifest
    version."""
    cat = Catalog(spark, str(tmp_path / "cat"))
    df = spark.range(5)
    with pytest.raises(ValueError, match="unsupported write mode"):
        cat.write_table(df, "t", mode="ignore")
    with pytest.raises(ValueError, match="unsupported write mode"):
        cat.write_table(df, "t", mode="error")


def test_append_reuses_partition_spec(spark, tmp_path):
    """Iceberg keeps the table's partition spec on append; the parquet
    fallback must too — a bare append used to drop top-level
    part-files beside lang=... dirs and reset the recorded layout."""
    import pytest as _pytest

    from destor_spark.sources.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "cat"))
    df = spark.createDataFrame(
        [(1, "en"), (2, "de")], "doc_id long, lang string"
    )
    cat.write_table(df, "t", partition_by=["lang"])
    cat.write_table(df, "t", mode="append")  # no partition_by given
    got = cat.read_table("t")
    assert got.count() == 4
    m = cat._load_manifest()
    assert m["tables"]["t"]["partition_by"] == ["lang"]
    with _pytest.raises(ValueError, match="conflicts with table layout"):
        cat.write_table(df, "t", mode="append", partition_by=["doc_id"])


def test_read_table_recovers_interrupted_delete(spark, tmp_path):
    """delete_where's two-rename commit has a no-dir window; read_table
    must restore from __rewrite/__old instead of failing."""
    import os
    import shutil

    from destor_spark.sources.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "cat"))
    df = spark.createDataFrame([(1,), (2,)], "doc_id long")
    cat.write_table(df, "t")
    path = os.path.join(cat.base, "t")
    # simulate a crash after rename(path, __old), before rename(tmp, path)
    os.rename(path, path + "__old")
    assert cat.read_table("t").count() == 2  # recovered from __old
    assert os.path.exists(path)
    # simulate the same window with a completed __rewrite present:
    # recovery must prefer the committed NEW data
    shutil.move(path, path + "__old")
    spark.createDataFrame([(9,)], "doc_id long").write.parquet(
        path + "__rewrite"
    )
    got = cat.read_table("t")
    assert [r["doc_id"] for r in got.collect()] == [9]


def test_manifest_save_is_atomic(spark, tmp_path):
    """_save_manifest writes tmp + os.replace; no .tmp residue and the
    manifest parses after every write."""
    import json
    import os

    from destor_spark.sources.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "cat"))
    df = spark.createDataFrame([(1,)], "doc_id long")
    cat.write_table(df, "a")
    cat.write_table(df, "b")
    assert not os.path.exists(cat._manifest_path + ".tmp")
    with open(cat._manifest_path) as f:
        m = json.load(f)
    assert set(m["tables"]) == {"a", "b"}
