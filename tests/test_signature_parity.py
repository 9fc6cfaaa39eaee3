"""Spark signature stage == oracle signatures, per url, bit-for-bit."""

from __future__ import annotations

import numpy as np

from destor_spark import hashing as H
from destor_spark.oracle import run_oracle
from destor_spark.plans.pipeline import signatures_stage


def test_signatures_match_oracle(spark, cfg, smoke_corpus):
    pages, _ = smoke_corpus
    sdf = spark.createDataFrame(pages)
    got = {
        r["url"]: r
        for r in signatures_stage(sdf, cfg).collect()
    }
    o = run_oracle(pages, cfg, use_simhash=False)
    assert set(got) == set(o["signatures"])
    for url, sig in o["signatures"].items():
        r = got[url]
        assert np.array_equal(np.array(r["sig"], dtype=np.int64), sig), url
        assert np.array_equal(
            np.array(r["band_keys"], dtype=np.int64), o["band_keys"][url]
        ), url
        assert r["n_shingles"] == o["n_shingles"][url], url
        assert r["simhash"] == o["simhash"][url], url


def test_empty_doc_sentinel(cfg):
    a, b = H.minhash_params(cfg.num_hashes, cfg.seed)
    sig = H.minhash_signature(np.empty(0, np.uint64), a, b)
    assert (sig == np.uint64(0xFFFFFFFFFFFFFFFF)).all()
    assert H.simhash64(np.empty(0, np.uint64)) == 0
