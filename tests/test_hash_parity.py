"""xxh64 + tokenization parity between the pure-Python oracle path and
Spark's JVM built-ins — the foundation of every downstream parity gate."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from destor_spark.hashing import xxh64_str
from destor_spark.operators.shingles import with_token_hashes
from destor_spark.oracle import _TokenHasher, tokenize

SAMPLES = [
    "",
    "a",
    "abc",
    "hello world",
    "x" * 7,
    "y" * 8,
    "z" * 31,
    "w" * 32,
    "W" * 33,
    "mixed é中文 bytes ✓",
    "q" * 100,
    "tab\tsep  multi   space\nnewline",
    " leading and trailing ",
]


def test_xxh64_matches_spark(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], "s string").select(
        "s", F.xxhash64("s").alias("h")
    )
    got = {r["s"]: r["h"] for r in df.collect()}
    for s in SAMPLES:
        assert xxh64_str(s) == got[s], repr(s)


def test_token_hashes_match_oracle(spark):
    texts = SAMPLES + ["one two three four five six", "  ", "a  b"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = with_token_hashes(df).collect()
    th = _TokenHasher()
    for r in rows:
        expect = th(tokenize(r["text"])).tolist()
        assert list(r["token_hashes"]) == expect, repr(r["text"])


def test_token_hasher_cache_consistent():
    th = _TokenHasher()
    a = th(["foo", "bar", "foo"])
    b = th(["foo", "bar", "foo"])
    assert np.array_equal(a, b)
    assert a[0] == a[2] != a[1]
