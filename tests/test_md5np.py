"""Parity gates for the vectorized MD5 kernel (destor_spark/md5np.py).

The kernel's digests must be BIT-identical to hashlib across message
lengths (0..beyond two blocks), prefixes, and binary content — md5
equality is the whole basis of the portable-minhash fast path."""

from __future__ import annotations

import hashlib
import random

import numpy as np
import pytest

from destor_spark.md5np import (
    digests_to_hex,
    md5_digests,
    segmented_min_digest,
)


def _spans(msgs: list[bytes]):
    data = np.frombuffer(b"".join(msgs), dtype=np.uint8)
    starts, lens, pos = [], [], 0
    for m in msgs:
        starts.append(pos)
        lens.append(len(m))
        pos += len(m)
    return data, np.array(starts, np.int64), np.array(lens, np.int64)


@pytest.mark.parametrize("prefix", [b"", b"0:", b"15:", b"prefix-"])
def test_md5_matches_hashlib_all_lengths(prefix):
    random.seed(1234)
    msgs = [b""] + [
        bytes(random.randrange(256) for _ in range(n))
        for n in list(range(1, 150)) + [200, 255, 256, 300, 511]
    ]
    data, starts, lens = _spans(msgs)
    hexes = digests_to_hex(md5_digests(data, starts, lens, prefix=prefix))
    for i, m in enumerate(msgs):
        assert hexes[i] == hashlib.md5(prefix + m).hexdigest()


def test_md5_unordered_spans():
    """Spans may overlap and arrive in any order (shingles are slices
    of one shared normalized buffer)."""
    base = b"the quick brown fox jumps over the lazy dog " * 10
    data = np.frombuffer(base, dtype=np.uint8)
    rng = random.Random(7)
    starts = np.array(
        [rng.randrange(0, len(base) - 60) for _ in range(500)], np.int64
    )
    lens = np.array([rng.randrange(0, 60) for _ in range(500)], np.int64)
    hexes = digests_to_hex(md5_digests(data, starts, lens, prefix=b"3:"))
    for i in range(500):
        want = hashlib.md5(
            b"3:" + base[starts[i] : starts[i] + lens[i]]
        ).hexdigest()
        assert hexes[i] == want


def test_multi_prefix_equals_per_prefix():
    from destor_spark.md5np import md5_digests_prefixes

    rng = random.Random(3)
    msgs = [
        bytes(rng.randrange(256) for _ in range(rng.randrange(0, 120)))
        for _ in range(400)
    ]
    data, starts, lens = _spans(msgs)
    prefixes = [f"{p}:".encode() for p in range(16)]
    multi = md5_digests_prefixes(data, starts, lens, prefixes)
    for pi, p in enumerate(prefixes):
        single = md5_digests(data, starts, lens, prefix=p)
        assert (multi[pi] == single).all(), p
        for i, m in enumerate(msgs):
            assert bytes(multi[pi, i]) == hashlib.md5(p + m).digest()


def test_segmented_min_matches_python():
    rng = random.Random(99)
    msgs = [
        bytes(rng.randrange(256) for _ in range(rng.randrange(1, 40)))
        for _ in range(1000)
    ]
    data, starts, lens = _spans(msgs)
    dig = md5_digests(data, starts, lens)
    seg_starts = np.array([0, 1, 2, 500, 997], np.int64)
    win = segmented_min_digest(dig, seg_starts)
    bounds = list(seg_starts) + [len(msgs)]
    for s in range(len(seg_starts)):
        rows = range(bounds[s], bounds[s + 1])
        want = min(bytes(dig[i]) for i in rows)
        assert bytes(dig[win[s]]) == want
