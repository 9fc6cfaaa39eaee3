"""CDC kernel parity: vectorized chunkers vs direct scalar
transliterations of the reference per-call semantics.

The scalar twins below re-state, byte for byte, what each reference
walk does (rabin_chunk_data rabin_chunking.c:249-276, normalized
:283-320, tttd :322-361, ae_chunk_data ae_chunking.c:32-54) using the
SLIDE recurrence (:10-21) — independent code, shared only through the
published algorithm.  Hypothesis drives random bytes and size configs
through both.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from destor_spark.chunking import (
    BREAKMARK,
    RABIN_POLY,
    WINSIZE,
    _tables,
    ae_cuts,
    normalized_rabin_cuts,
    rabin_cuts,
    tttd_cuts,
    window_fps,
)

_M64 = 0xFFFFFFFFFFFFFFFF


class _Slide:
    """The reference SLIDE macro: 48-byte ring buffer + remove/append."""

    def __init__(self):
        T, U, shift = _tables(RABIN_POLY)
        self.T = [int(x) for x in T]
        self.U = [int(x) for x in U]
        self.shift = shift
        self.fp = 0
        self.buf = [0] * WINSIZE
        self.pos = -1

    def slide(self, m: int) -> int:
        self.pos += 1
        if self.pos >= WINSIZE:
            self.pos = 0
        om = self.buf[self.pos]
        self.buf[self.pos] = m
        fp = self.fp ^ self.U[om]
        fp = (((fp << 8) | m) ^ self.T[fp >> self.shift]) & _M64
        self.fp = fp
        return fp


def _scalar_rabin_once(p: bytes, mn: int, avg: int, mx: int) -> int:
    n = len(p)
    if n <= mn:
        return n
    w = _Slide()
    mask = avg - 1
    end = min(n, mx)
    i = mn
    while i < end:
        fp = w.slide(p[i - 1])
        if (fp & mask) == BREAKMARK:
            break
        i += 1
    return i


def _scalar_normalized_once(p: bytes, mn: int, avg: int, mx: int) -> int:
    n = len(p)
    if n <= mn:
        return n
    w = _Slide()
    small, large = avg * 2 - 1, avg // 2 - 1
    end = min(n, mx)
    i = mn
    while i < end:
        fp = w.slide(p[i - 1])
        if (fp & (small if i < avg else large)) == BREAKMARK:
            break
        i += 1
    return i


def _scalar_tttd_once(p: bytes, mn: int, avg: int, mx: int) -> int:
    n = len(p)
    if n <= mn:
        return n
    w = _Slide()
    main, back = avg - 1, avg // 2 - 1
    end = min(n, mx)
    i, m = mn, 0
    while i < end:
        fp = w.slide(p[i - 1])
        if (fp & back) == BREAKMARK:
            if (fp & main) == BREAKMARK:
                return i
            m = i
        i += 1
    return m if m else i


def _scalar_ae_once(p: bytes, avg: int, mx: int) -> int:
    n = len(p)
    window = int(avg / (np.e - 1))
    if n <= window + 8:
        return n

    def val(i: int) -> int:
        return int.from_bytes(p[i: i + 8], "big")

    maxp, curr, end = 0, 1, n - 8
    while curr <= end:
        if val(curr) <= val(maxp):  # my_memcmp: ties update the extremum
            maxp = curr
            curr += 1
            continue
        if curr == maxp + window or curr == mx:
            return curr
        curr += 1
    return n


def _scalar_cuts(data: bytes, once, *args) -> np.ndarray:
    cuts, s = [], 0
    while s < len(data):
        c = once(data[s:], *args)
        s += c
        cuts.append(s)
    return np.array(cuts, dtype=np.int64)


# small power-of-2 configs so short hypothesis buffers produce many
# chunks; min both below and above the 48-byte window exercises the
# partial-window scan on each side
_CFGS = [(32, 64, 256), (64, 128, 512), (16, 256, 384)]


def _data(draw):
    # low-entropy alphabet → frequent mask matches AND repeated spans
    return bytes(
        draw(
            st.lists(
                st.integers(0, 7), min_size=0, max_size=3000
            )
        )
    )


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_rabin_matches_scalar(data):
    buf = _data(data.draw)
    mn, avg, mx = data.draw(st.sampled_from(_CFGS))
    got = rabin_cuts(buf, mn, avg, mx)
    want = _scalar_cuts(buf, _scalar_rabin_once, mn, avg, mx)
    np.testing.assert_array_equal(got, want)


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_normalized_matches_scalar(data):
    buf = _data(data.draw)
    mn, avg, mx = data.draw(st.sampled_from(_CFGS))
    got = normalized_rabin_cuts(buf, mn, avg, mx)
    want = _scalar_cuts(buf, _scalar_normalized_once, mn, avg, mx)
    np.testing.assert_array_equal(got, want)


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_tttd_matches_scalar(data):
    buf = _data(data.draw)
    mn, avg, mx = data.draw(st.sampled_from(_CFGS))
    got = tttd_cuts(buf, mn, avg, mx)
    want = _scalar_cuts(buf, _scalar_tttd_once, mn, avg, mx)
    np.testing.assert_array_equal(got, want)


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_ae_matches_scalar(data):
    buf = _data(data.draw)
    avg, mx = data.draw(st.sampled_from([(64, 256), (128, 384)]))
    got = ae_cuts(buf, avg, mx)
    want = _scalar_cuts(buf, _scalar_ae_once, avg, mx)
    np.testing.assert_array_equal(got, want)


@settings(max_examples=30, deadline=None)
@given(st.binary(min_size=WINSIZE, max_size=400))
def test_window_fp_equals_slide(buf):
    """The XOR-of-contributions formulation == the SLIDE recurrence for
    every full window (the GF(2)-linearity claim, operationally)."""
    fps = window_fps(np.frombuffer(buf, dtype=np.uint8))
    w = _Slide()
    for i, b in enumerate(buf):
        fp = w.slide(b)
        if i >= WINSIZE - 1:
            assert fp == int(fps[i - (WINSIZE - 1)])


def test_chunk_size_bounds():
    rng = np.random.default_rng(7)
    buf = rng.integers(0, 256, 200_000, dtype=np.uint8).tobytes()
    for cuts in (
        rabin_cuts(buf, 1024, 8192, 65536),
        normalized_rabin_cuts(buf, 1024, 8192, 65536),
        tttd_cuts(buf, 1024, 8192, 65536),
    ):
        sizes = np.diff(cuts, prepend=0)
        assert cuts[-1] == len(buf)
        assert (sizes[:-1] >= 1024).all() and (sizes <= 65536).all()
        # random bytes at avg 8192 should land near avg
        assert 2000 < sizes.mean() < 20000


def test_duplicate_span_resynchronizes():
    """The property CDC exists for (rabin_chunking.c header comment):
    the same span embedded at different offsets produces identical
    chunks once the window re-syncs — so chunk-level dedup finds it."""
    rng = np.random.default_rng(11)
    span = rng.integers(0, 256, 120_000, dtype=np.uint8).tobytes()
    a = rng.integers(0, 256, 5_000, dtype=np.uint8).tobytes() + span
    b = rng.integers(0, 256, 11_111, dtype=np.uint8).tobytes() + span
    for cutter in (rabin_cuts, normalized_rabin_cuts, tttd_cuts, ae_cuts):
        def chunks(buf):
            cuts = cutter(buf)
            return {
                buf[lo:hi]
                for lo, hi in zip(np.concatenate(([0], cuts[:-1])), cuts)
            }
        common = chunks(a) & chunks(b)
        # all but the first (unsynced) and last (tail) span chunks shared
        assert sum(len(c) for c in common) > 100_000, cutter.__name__


def test_empty_and_tiny():
    assert rabin_cuts(b"").size == 0
    assert list(rabin_cuts(b"abc", 32, 64, 256)) == [3]
    assert list(ae_cuts(b"abc", 64, 256)) == [3]


def test_ae_max_size_overshoot_quirk():
    """ae_chunking.c:49 tests curr == p + max_size only in the
    non-update branch: a descending run through that exact offset lets
    the chunk overshoot max_size.  Pin the quirk so a 'fix' that
    silently diverges from the reference fails loudly."""
    mx = 256
    # strictly descending byte values -> every step updates the extremum
    buf = bytes(255 - (i % 256) for i in range(mx * 3)) * 1
    got = ae_cuts(buf, 64, mx)
    want = _scalar_cuts(buf, _scalar_ae_once, 64, mx)
    np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# Spark-side operator (operators/cdc.py)
# ---------------------------------------------------------------------------

def _dup_span_pdf():
    import pandas as pd

    rng = np.random.default_rng(11)
    span = rng.integers(0, 256, 4_000, dtype=np.uint8).tobytes()
    docs = []
    for i in range(20):
        pre = rng.integers(0, 256, int(rng.integers(0, 800)), dtype=np.uint8)
        post = rng.integers(0, 256, int(rng.integers(0, 800)), dtype=np.uint8)
        body = pre.tobytes() + span + post.tobytes()
        # latin-1 round-trips every byte value through a Python str
        docs.append({"doc_id": i, "text": body.decode("latin-1")})
    return pd.DataFrame(docs)


def test_chunk_documents_matches_local_kernel(spark):
    from destor_spark.operators.cdc import cdc_dedup_stats, chunk_documents

    pdf = _dup_span_pdf()
    df = spark.createDataFrame(pdf)
    got = (
        chunk_documents(df, algo="rabin", min_size=64, avg_size=256,
                        max_size=2048)
        .toPandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    import hashlib

    rows = []
    for _, r in pdf.iterrows():
        data = r["text"].encode("utf-8")
        cuts = rabin_cuts(data, 64, 256, 2048)
        prev = 0
        for i, end in enumerate(cuts.tolist()):
            rows.append(
                (r["doc_id"], i, prev, end - prev,
                 hashlib.sha1(data[prev:end]).digest())
            )
            prev = end
    assert [tuple(x) for x in got.itertuples(index=False)] == rows

    # dedup stats: the shared span must dedup across the 20 docs
    stats = cdc_dedup_stats(
        chunk_documents(df, algo="rabin", min_size=64, avg_size=256,
                        max_size=2048)
    ).toPandas().iloc[0]
    fp_sizes = {}
    logical = 0
    for _, _, _, size, fp in rows:
        fp_sizes[fp] = size
        logical += size
    assert stats["logical_bytes"] == logical
    assert stats["stored_bytes"] == sum(fp_sizes.values())
    assert stats["n_unique_chunks"] == len(fp_sizes)
    assert stats["dedup_ratio"] > 1.5  # shared 4 KB span across 20 docs


def test_cdc_certificate_matches_duckdb(spark):
    """The driver-facing lossless-partition certificate vs its SQL twin
    (mirrors CORRECTNESS gating at sf0.001)."""
    import duckdb

    from destor_spark.queries import ORACLE_SQL, QUERIES

    sf = "/root/testdata/sf0.001"
    sp = (
        QUERIES["cdc_chunk_certificate"](spark, sf)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        "create view documents as select * from "
        f"read_parquet('{sf}/documents.parquet')"
    )
    du = (
        con.sql(ORACLE_SQL["cdc_chunk_certificate"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(sp) == len(du) == 500
    assert (sp["total_bytes"] == du["total_bytes"]).all()
    assert (sp["reassembled_md5"] == du["reassembled_md5"]).all()
