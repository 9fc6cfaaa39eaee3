"""Structured-streaming incremental dedup: a duplicate arriving in a
later micro-batch must be detected against the accumulated signature
state (destor's growing fingerprint index,
/root/reference/src/index/index.c:140-216)."""

from __future__ import annotations

import os

import pandas as pd

from destor_spark.streaming.dedup_stream import run_incremental_dedup
from destor_spark.synth import make_corpus


def test_incremental_dedup_across_batches(spark, cfg, tmp_path):
    in_dir = str(tmp_path / "in")
    state = str(tmp_path / "state")
    os.makedirs(in_dir)

    pages, truth = make_corpus(seed=3, n_docs=200)
    near = truth[truth["dup_class"].isin(["near", "exact"])]
    groups = near.groupby("group_id")["url"].apply(list)
    split_groups = [g for g in groups if len(g) >= 2][:5]
    assert split_groups, "fixture has no dup groups"

    # batch 1: first member of each dup group + half the rest
    # batch 2: the remaining members (the duplicates arrive "later")
    first = {g[0] for g in split_groups}
    later = {u for g in split_groups for u in g[1:]}
    rest = [u for u in pages["url"] if u not in first | later]
    b1 = pages[pages["url"].isin(first | set(rest[::2]))]
    b2 = pages[~pages["url"].isin(set(b1["url"]))]
    b1.to_parquet(os.path.join(in_dir, "batch1.parquet"), index=False)

    run_incremental_dedup(spark, in_dir, state, cfg)
    b2.to_parquet(os.path.join(in_dir, "batch2.parquet"), index=False)
    run_incremental_dedup(spark, in_dir, state, cfg)

    pairs = pd.read_parquet(os.path.join(state, "pairs"))
    got = {
        frozenset((a, b)) for a, b in zip(pairs["url_a"], pairs["url_b"])
    }
    for g in split_groups:
        want_any = {frozenset((g[0], u)) for u in g[1:]}
        assert got & want_any, f"cross-batch dup not detected for group {g}"
