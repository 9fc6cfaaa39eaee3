"""Spark-free sanity tests of the pandas oracle itself on a handmade
corpus with known ground truth (guards the guard)."""

from __future__ import annotations

import pandas as pd

from destor_spark.config import DedupConfig
from destor_spark.oracle import run_oracle


def _pages(rows):
    df = pd.DataFrame(rows, columns=["url", "text"])
    df["warc_ts"] = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        range(len(df)), unit="s"
    )
    return df[["url", "warc_ts", "text"]]


BASE = " ".join(f"tok{i % 37}x{i % 11}" for i in range(300))
NEAR = BASE.replace("tok5x5", "changed", 1)
OTHER = " ".join(f"other{i % 41}y{i % 13}" for i in range(250))


def test_exact_and_near_cluster():
    pages = _pages(
        [
            ("u/a", BASE),
            ("u/b", BASE),          # exact dup of a
            ("u/c", NEAR),          # near dup of a
            ("u/d", OTHER),         # unrelated
            ("u/e", ""),            # empty
        ]
    )
    o = run_oracle(pages, DedupConfig(), use_simhash=True)
    cl = dict(zip(o["assignments"]["url"], o["assignments"]["cluster_id"]))
    assert cl["u/a"] == cl["u/b"] == cl["u/c"]
    assert cl["u/d"] != cl["u/a"]
    assert cl["u/e"] != cl["u/a"]
    canon = dict(
        zip(o["assignments"]["url"], o["assignments"]["is_canonical"])
    )
    assert canon["u/a"] and not canon["u/b"] and not canon["u/c"]
    mods = set(o["dup_pairs"]["modality"])
    assert "exact" in mods and "minhash" in mods


def test_empty_docs_pair_only_exactly():
    pages = _pages([("u/1", ""), ("u/2", ""), ("u/3", "   ")])
    o = run_oracle(pages, DedupConfig(), use_simhash=True)
    cl = dict(zip(o["assignments"]["url"], o["assignments"]["cluster_id"]))
    assert cl["u/1"] == cl["u/2"]      # identical raw text
    assert cl["u/3"] != cl["u/1"]      # different whitespace != dup
    assert set(o["dup_pairs"]["modality"]) == {"exact"}


def test_oracle_order_invariance():
    rows = [("u/a", BASE), ("u/b", BASE), ("u/c", NEAR), ("u/d", OTHER)]
    a = run_oracle(_pages(rows), DedupConfig(), use_simhash=False)
    b = run_oracle(_pages(rows[::-1]), DedupConfig(), use_simhash=False)
    pa = a["assignments"].sort_values("url").reset_index(drop=True)
    pb = b["assignments"].sort_values("url").reset_index(drop=True)
    # warc_ts differs by construction order, so compare cluster shape
    assert list(pa["cluster_id"] == pa["url"]) == list(
        pb["cluster_id"] == pb["url"]
    )
    assert (
        pa.groupby("cluster_id")["url"].apply(frozenset).sort_values().tolist()
        == pb.groupby("cluster_id")["url"].apply(frozenset).sort_values().tolist()
    )


def test_oracle_bucket_pairs_self_pair_guard():
    """Engine parity (lsh.py self-pair guard): a url present twice in
    one bucket under different warc_ts must not emit the degenerate
    (X, X) pair — in either the all-pairs or the star branch."""
    import pandas as pd

    from destor_spark.oracle import _bucket_pairs

    docs = pd.DataFrame(
        {
            "url": ["u/a", "u/b", "u/c"],
            "warc_ts": pd.to_datetime(
                ["2024-01-01", "2024-01-02", "2024-01-03"]
            ),
        }
    )
    # all-pairs branch: u/a twice in the bucket
    got = _bucket_pairs({(0, 1): ["u/a", "u/a", "u/b"]}, docs, cap=64)
    assert ("u/a", "u/a") not in got
    assert ("u/a", "u/b") in got
    # star branch (cap exceeded): head duplicated
    got = _bucket_pairs(
        {(0, 1): ["u/a", "u/a", "u/b", "u/c"]}, docs, cap=2
    )
    assert ("u/a", "u/a") not in got


def test_tokenize_ascii_whitespace_only(spark):
    """Oracle tokenization must match the engine's Java \\s (ASCII):
    NBSP and Unicode spaces are rendered characters the extractor
    preserves — they must NOT split tokens in the oracle either."""
    from pyspark.sql import functions as F

    import destor_spark.oracle as O
    from destor_spark.operators.shingles import tokens_col

    for s in ["foo\xa0bar", "a b", "x y", "p \t\n q"]:
        engine = (
            spark.createDataFrame([(s,)], "text string")
            .select(tokens_col(F.col("text")).alias("t"))
            .collect()[0]["t"]
        )
        assert O.tokenize(s) == engine, s
