"""Suffix-array kernel + exact longest-span operator gates.

The kernel (destor_spark/suffix.py) is the north-star's third dup
modality (suffix-array exact substring).  Gates:

  * suffix_array vs a naive sorted-suffixes oracle;
  * longest_common_span vs a naive O(n^2 m) scan under hypothesis
    (length AND witness validity — the returned offsets must slice to
    identical substrings);
  * longest_common_token_run vs an independent diagonal-islands
    computation in pure pandas — the SAME alternative algorithm the
    DuckDB oracle (queries.SQL_SA_LONGEST_SPAN) uses, so a local
    failure here predicts a driver hash mismatch exactly;
  * operators/substring.longest_span_pairs end to end on planted spans
    (exact maximal length reported, sub-L pairs rejected, witness
    offsets valid).
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from destor_spark import hashing as H
from destor_spark.config import DedupConfig
from destor_spark.operators.substring import (
    ANCHOR_W,
    _anchor_win,
    _gram_len,
    longest_span_pairs,
)
from destor_spark.suffix import (
    longest_common_span,
    longest_common_token_run,
    suffix_array,
)

CFG = DedupConfig()  # substring_len = 200
GLEN = _gram_len(CFG)
WIN = _anchor_win(CFG)

_ALPHABET = np.array(list("abcdefghijklmnopqrstuvwxyz"))


def _rand_str(rng: np.random.Generator, n: int) -> str:
    return "".join(rng.choice(_ALPHABET, size=n))


def _naive_lcs(a: str, b: str) -> int:
    best = 0
    for i in range(len(a)):
        for j in range(len(b)):
            k = 0
            while i + k < len(a) and j + k < len(b) and a[i + k] == b[j + k]:
                k += 1
            if k > best:
                best = k
    return best


def test_suffix_array_vs_sorted_suffixes():
    for s in ("banana", "mississippi", "aaaaaa", "abcabcabc", "z", "abab"):
        arr = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(
            np.int64
        )
        assert list(suffix_array(arr)) == sorted(
            range(len(s)), key=lambda i: s[i:]
        )


@settings(max_examples=200, deadline=None)
@given(
    st.text(alphabet="ab c", max_size=60),
    st.text(alphabet="ab c", max_size=60),
)
def test_span_matches_naive_and_witness_valid(a, b):
    n, ao, bo = longest_common_span(a, b)
    assert n == _naive_lcs(a, b)
    if n == 0:
        assert (ao, bo) == (-1, -1)
    else:
        assert a[ao : ao + n] == b[bo : bo + n]
        # maximality: no shared span of n+1 exists (naive already says so)


def _islands_longest_run(ta: list[str], tb: list[str]) -> int:
    """The DuckDB oracle's algorithm (diagonal match-islands), in
    python: independent cross-check of the suffix-array answer."""
    import pandas as pd

    pa = pd.DataFrame({"tok": ta, "ia": range(len(ta))})
    pb = pd.DataFrame({"tok": tb, "ib": range(len(tb))})
    m = pa.merge(pb, on="tok")
    if m.empty:
        return 0
    m["diag"] = m["ia"] - m["ib"]
    m = m.sort_values(["diag", "ia"])
    m["island"] = m["ia"] - m.groupby("diag").cumcount()
    return int(m.groupby(["diag", "island"]).size().max())


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.sampled_from(["a", "b", "c", "dd"]), max_size=40),
    st.lists(st.sampled_from(["a", "b", "c", "dd"]), max_size=40),
)
def test_token_run_matches_islands(ta, tb):
    assert longest_common_token_run(ta, tb)[0] == _islands_longest_run(ta, tb)


def test_token_run_witness():
    n, ao, bo = longest_common_token_run(
        "the quick brown fox jumps".split(), "a quick brown fox leaps".split()
    )
    assert (n, ao, bo) == (3, 1, 1)


def test_long_planted_span_exact():
    rng = np.random.default_rng(3)
    core = _rand_str(rng, 5000)
    a = _rand_str(rng, 800) + core + _rand_str(rng, 300)
    b = _rand_str(rng, 100) + core + _rand_str(rng, 900)
    n, ao, bo = longest_common_span(a, b)
    assert n >= 5000  # random flanks may extend the span by chance ends
    assert a[ao : ao + n] == b[bo : bo + n]


@pytest.fixture(scope="module")
def planted_pages(spark):
    """Three docs: p0/p1 share an exact 600-char span (above L=200);
    p0/p2 share only ~150 chars (above gram_len, below L — candidate
    that verification must reject with span_len < L, i.e. filtered)."""
    rng = np.random.default_rng(11)

    def span_with_anchor(n: int) -> str:
        # must provably contain an anchored gram so the candidate join
        # fires for any embedding (same rule as tests/test_substring)
        while True:
            s = _rand_str(rng, n)
            if H.anchor_offsets(s, GLEN, WIN, ANCHOR_W).size:
                return s

    big = span_with_anchor(600)
    small = span_with_anchor(GLEN + 10)  # candidate-triggering, sub-L
    rows = [
        ("u0", _rand_str(rng, 400) + big + small + _rand_str(rng, 200)),
        ("u1", _rand_str(rng, 150) + big + _rand_str(rng, 350)),
        ("u2", small + _rand_str(rng, 700)),
    ]
    import datetime

    ts = datetime.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [(u, ts, t) for u, t in rows], "url string, warc_ts timestamp, text string"
    )


def test_longest_span_pairs_operator(spark, planted_pages):
    out = longest_span_pairs(planted_pages, CFG).collect()
    pairs = {tuple(sorted((r.url_a, r.url_b))): r for r in out}
    assert ("u0", "u1") in pairs
    r = pairs[("u0", "u1")]
    assert r.span_len >= 600
    texts = {x.url: x.text for x in planted_pages.collect()}
    a, b = (
        (texts[r.url_a], texts[r.url_b])
    )
    assert a[r.a_off : r.a_off + r.span_len] == b[r.b_off : r.b_off + r.span_len]
    # the sub-L sharer must NOT be reported
    assert ("u0", "u2") not in pairs
