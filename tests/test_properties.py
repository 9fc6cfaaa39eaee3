"""Property tests (SURVEY.md section 5.2): permutation invariance and
idempotence.  destor is order-DEPENDENT (first-copy-wins by arrival,
/root/reference/src/index/kvstore_htable.c:44-53); we pin determinism
to (warc_ts, url) so input order and partitioning must not matter."""

from __future__ import annotations

import pandas as pd
import pytest

from destor_spark.plans.pipeline import run_pipeline


def _assign(spark, cfg, pages_pd, n_parts):
    sdf = spark.createDataFrame(pages_pd).repartition(n_parts)
    res = run_pipeline(sdf, cfg, use_simhash=True)
    return (
        res.assignments.select("url", "cluster_id", "is_canonical")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def perm_corpus(smoke_corpus):
    pages, _ = smoke_corpus
    return pages


def test_permutation_invariance(spark, cfg, perm_corpus):
    base = _assign(spark, cfg, perm_corpus, 4)
    shuffled = perm_corpus.sample(frac=1.0, random_state=99).reset_index(
        drop=True
    )
    other = _assign(spark, cfg, shuffled, 7)
    pd.testing.assert_frame_equal(base, other)


def test_idempotence(spark, cfg, perm_corpus):
    a = _assign(spark, cfg, perm_corpus, 4)
    b = _assign(spark, cfg, perm_corpus, 4)
    pd.testing.assert_frame_equal(a, b)
