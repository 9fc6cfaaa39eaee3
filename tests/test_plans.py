"""Physical-plan assertions: the optimizations we rely on must be
visible in .explain output (column pruning, filter pushdown, broadcast
joins) — SURVEY.md section 4 'what Catalyst gives us for free' made
checkable."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_column_pruning_signature_scan(spark, cfg, tmp_path):
    """The signature stage must never read html (the heavy column)."""
    from destor_spark.plans.pipeline import signatures_stage
    from destor_spark.synth import make_corpus

    p = str(tmp_path / "pages.parquet")
    make_corpus(3, 50)[0].to_parquet(p, index=False)
    pages = spark.read.parquet(p)
    plan = _plan(signatures_stage(pages, cfg))
    assert "html" not in plan, plan[:800]
    assert "ReadSchema" in plan


def test_filter_pushdown_parquet(spark):
    q = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .filter(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_quantity")
    )
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity" in plan
    # pruned read schema: only the two referenced columns
    assert "l_extendedprice" not in plan


def test_broadcast_join_dims(spark):
    from destor_spark.queries import q_join_enrich

    plan = _plan(q_join_enrich(spark, SF))
    assert plan.count("BroadcastHashJoin") == 2, plan[:1200]


def test_ann_broadcast_no_shuffle(spark):
    """Brute-force top-k scores the corpus in ONE numpy mapInArrow scan
    (the collected query matrix rides in the task closure): no join of
    the corpus at all — r5's shape was a BroadcastNestedLoopJoin with
    interpreted per-pair folds, r6 emits per-batch local top-k rows so
    only ~batches*k*q rows reach the ranking window's exchange."""
    from destor_spark.operators.ann import brute_force_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = brute_force_topk(emb, emb.filter("vec_id % 100 = 0"), k=5)
    plan = _plan(q)
    assert "MapInArrow" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" not in plan  # corpus is never joined, only scanned


def test_champion_plan_shape(spark):
    """Champion selection is one feature join + one repartition(q) +
    one python map stage — no per-rank re-aggregation, no broadcast of
    a corpus-sized query list."""
    from destor_spark.queries import q_champion_segments

    plan = _plan(q_champion_segments(spark, SF))
    assert "MapInPandas" in plan
    # one exchange introduced by repartition("q") + the feature join's
    # exchanges; crucially NO iterative chain of k aggregates
    assert plan.count("MapInPandas") == 1


def test_cfl_window_is_partitioned(spark):
    """The container-packing window runs per source shard — a global
    (empty partitionBy) running sum would serialize 10^12 canonicals
    through one task."""
    from destor_spark.queries import q_cfl_monitor

    plan = _plan(q_cfl_monitor(spark, SF))
    assert "partitionBy" not in plan  # physical plan spells it Window [...]
    # the normalized form is unambiguous: a windowspecdefinition whose
    # partition expression list STARTS with `source` (a global window
    # would spell windowspecdefinition(canon_id... with no partition key)
    norm = plan.lower().replace(" ", "").replace("#", "")
    assert "windowspecdefinition(source" in norm


def test_single_text_scan_in_pipeline(spark, cfg, tmp_path):
    """r3 fusion: the signature stage computes content_sha in the same
    scan (sha2 present in the signature plan), so the exact pass needs
    no second text scan."""
    from destor_spark.plans.pipeline import signatures_stage
    from destor_spark.synth import make_corpus

    p = str(tmp_path / "pages2.parquet")
    make_corpus(3, 50)[0].to_parquet(p, index=False)
    pages = spark.read.parquet(p)
    plan = _plan(signatures_stage(pages, cfg, with_sha=True))
    assert "sha2" in plan
    assert "html" not in plan


def test_query_barriers_do_not_accumulate_run_dirs(spark):
    """Repeated driver-query invocations must hold ONE barrier dir per
    tag (generation-versioned: the new gen replaces the old after it
    commits), not allocate a fresh run{N} each call — a long-lived
    driver would otherwise leak intermediates until exit."""
    import os

    from destor_spark.plans.pipeline import _session_base
    from destor_spark.queries import q_ngram_jaccard_pairs

    q_ngram_jaccard_pairs(spark, SF).count()
    base = _session_base(spark)
    qroot = os.path.join(base, "queries")
    before = sorted(os.listdir(qroot))
    q_ngram_jaccard_pairs(spark, SF).count()
    q_ngram_jaccard_pairs(spark, SF).count()
    after = sorted(os.listdir(qroot))
    # same COUNT of dirs (one live generation per tag); generation
    # suffixes advance
    assert len(after) == len(before)
    assert {d.rsplit("_g", 1)[0] for d in after} == {
        d.rsplit("_g", 1)[0] for d in before
    }
    assert after != before  # the generation counter actually moved


def test_query_barrier_previous_generation_survives_until_commit(spark):
    """A barrier DataFrame from invocation N-1 must stay readable while
    invocation N is still being computed (the old overwrite-in-place
    scheme deleted its files at the START of the new write); after N
    commits, N-1's files are gone (bounded disk)."""
    import os

    from destor_spark.plans.pipeline import (
        _materialize_gen,
        _query_mat_root,
    )

    df = spark.range(100).withColumn("v", F.col("id") * 2)
    root = _query_mat_root(spark)
    first = _materialize_gen(df, "gen_probe", root)
    assert first.count() == 100
    second = _materialize_gen(df.filter("id < 50"), "gen_probe", root)
    # new generation committed -> old files deleted, new readable
    assert second.count() == 50
    live = [d for d in os.listdir(root) if d.startswith("gen_probe_g")]
    assert len(live) == 1


def test_ivf_assign_is_map_side(spark):
    """IVF cell assignment must compile to a broadcast of the single
    centroid-array row plus per-row HOF scoring — NO shuffle exchange
    of the corpus (the property that makes assignment O(N) map work at
    10^12 rows).  The only exchange allowed is inside the centroid
    TakeOrderedAndProject itself."""
    from destor_spark.operators.ann import ivf_assign, ivf_centroids

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = ivf_centroids(emb, n_cells=16)
    plan = _plan(ivf_assign(emb, cents, nprobe=1))
    corpus_side = plan.split("BroadcastExchange")[0]
    assert "Exchange hashpartitioning" not in corpus_side, plan[:1500]
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_curation_plans_prune_and_broadcast(spark):
    """The curation family must read only (doc_id, text), choose
    broadcast joins over sort-merge, and never read the unused corpus
    columns (lang/source/n_chars are not needed by any of them)."""
    import destor_spark.queries as Q

    for name in (
        "gopher_repetition",
        "segment_dedup_stats",
        "decontamination",
        "url_dup_groups",
        "segment_clean_corpus",
    ):
        plan = _plan(Q.QUERIES[name](spark, SF))
        assert "SortMergeJoin" not in plan, (name, plan[:800])
        # a parquet READ renders "n_chars:" in ReadSchema; a derived
        # alias renders "n_chars#NN" — so this catches regressions
        # without tripping on the queries' own output aliases
        for col in ("lang", "n_chars", "source"):
            assert f"{col}:" not in plan, (name, col)


def test_decontamination_benchmark_side_broadcasts(spark):
    """The benchmark gram set must be the broadcast side — the corpus
    probe stays map-side (no corpus-wide shuffle before the join)."""
    import destor_spark.queries as Q

    plan = _plan(Q.QUERIES["decontamination"](spark, SF))
    assert "BroadcastHashJoin" in plan
