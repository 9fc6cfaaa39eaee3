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
