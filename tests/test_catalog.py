"""Catalog table IO + predicate delete (destor GC analogue,
/root/reference/src/cma.c:83-139, /root/reference/src/do_delete.c)."""

from __future__ import annotations

from destor_spark.sources.catalog import Catalog


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
