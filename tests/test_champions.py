"""Greedy champion selection vs an independent pandas reference of
destor's top_segment_select + features_trim
(/root/reference/src/index/similarity_detection.c:35-126)."""

from __future__ import annotations

from collections import Counter

from destor_spark.operators.champions import greedy_champions

SF_DIR = "/root/testdata/sf0.001"
K_SHINGLE = 5


def _shingles(text: str) -> set[str]:
    w = [t for t in text.split(" ") if t != ""]
    if len(w) < K_SHINGLE:
        return set()
    return {
        " ".join(w[i : i + K_SHINGLE])
        for i in range(len(w) - K_SHINGLE + 1)
    }


def _reference_greedy(feats: dict, queries: list, k: int) -> set:
    """Pure-python mirror: rank by shared count, trim the champion's
    hit features, re-rank; ties -> smallest candidate id."""
    out = set()
    for q in queries:
        remaining = {
            c: feats[c] & feats[q] for c in feats if c != q
        }
        remaining = {c: s for c, s in remaining.items() if s}
        for rnk in range(1, k + 1):
            if not remaining:
                break
            counts = Counter({c: len(s) for c, s in remaining.items()})
            best = min(
                (c for c in counts if counts[c] == max(counts.values()))
            )
            hit = remaining.pop(best)
            out.add((q, rnk, best, len(hit)))
            remaining = {
                c: s - hit for c, s in remaining.items() if s - hit
            }
    return out


def test_greedy_champions_match_reference(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    feats = {
        int(r.doc_id): _shingles(r.text) for r in docs.itertuples()
    }
    queries = [d for d in feats if d % 100 == 0 and feats[d]]

    sdf = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sh = sdf.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda x: x != F.lit("")).alias("w"),
    ).filter(F.size("w") >= K_SHINGLE)
    e = sh.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size("w") - F.lit(K_SHINGLE - 1)),
                    lambda i: F.array_join(
                        F.slice(F.col("w"), i, K_SHINGLE), " "
                    ),
                )
            )
        ).alias("s"),
    )
    qdf = sdf.filter(F.col("doc_id") % 100 == 0).select("doc_id")
    got = {
        (int(r.doc_id), int(r.rnk), int(r.champion), int(r.n_hits))
        for r in greedy_champions(e, qdf, k=3).collect()
    }
    want = _reference_greedy(feats, queries, k=3)
    assert want, "fixture produced no champions"
    assert got == want
