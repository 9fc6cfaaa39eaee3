"""Vectorized MD5 over numpy byte buffers (public RFC 1321 algorithm).

Why this exists: the portable query surface (destor_spark/queries.py)
derives MinHash signatures as ``array_min(transform(sh, s ->
md5(p || ':' || s)))`` — 16 md5 evaluations per shingle, ~10^8 calls at
sf1 — because md5-hex is the one hash family both Spark and the DuckDB
oracle evaluate identically.  Spark's ``Md5`` expression instantiates a
MessageDigest per call and materializes a 32-char hex string per (p,
shingle); at 10^8 calls that is the dominant cost of every
portable-minhash query.  This module computes the SAME digests in bulk:
messages are padded into (n, 64*B) block matrices and all n lanes run
the 64 MD5 steps together as uint32 vector ops — no per-message Python,
no per-message allocation.

Exactness: MD5 here is the reference algorithm (RFC 1321) evaluated in
uint32 lanes; ``tests/test_md5np.py`` pins digest equality against
hashlib across lengths 0..200 and random binary content.  Digest
equality is bit-equality — there is no float or ordering subtlety.
"""

from __future__ import annotations

import numpy as np

# --- RFC 1321 constants -----------------------------------------------------

_S = np.array(
    [7, 12, 17, 22] * 4
    + [5, 9, 14, 20] * 4
    + [4, 11, 16, 23] * 4
    + [6, 10, 15, 21] * 4,
    dtype=np.uint32,
)
_T = np.floor(np.abs(np.sin(np.arange(1, 65, dtype=np.float64))) * 4294967296.0).astype(
    np.uint64
).astype(np.uint32)
_K = np.array(
    [i for i in range(16)]
    + [(5 * i + 1) % 16 for i in range(16)]
    + [(3 * i + 5) % 16 for i in range(16)]
    + [(7 * i) % 16 for i in range(16)],
    dtype=np.int64,
)

_INIT = (
    np.uint32(0x67452301),
    np.uint32(0xEFCDAB89),
    np.uint32(0x98BADCFE),
    np.uint32(0x10325476),
)

# Messages processed per internal slice.  The padding build allocates
# ~(width-plen) x 8 B of gather indices plus the width-byte matrix per
# message; 64k messages x 64 B blocks keeps every temporary in the
# tens of MB (the repo-wide malloc-threshold discipline — see
# hashing._MH_CHUNK) regardless of how large an Arrow batch the caller
# feeds in (10 KB documents at maxRecordsPerBatch=4096 produce ~6M
# shingle messages per batch; unchunked that is a multi-GB src
# matrix).
_MSG_CHUNK = 1 << 16

_ERR = np.errstate(over="ignore")


def _compress(state, X):
    """One MD5 compression round over n lanes.

    state: list of 4 uint32[n]; X: uint32[n, 16] message words.
    Returns the updated state (new arrays).
    """
    A, B, C, D = state
    a, b, c, d = A, B, C, D
    with _ERR:
        for i in range(64):
            if i < 16:
                f = (b & c) | (~b & d)
            elif i < 32:
                f = (d & b) | (~d & c)
            elif i < 48:
                f = b ^ c ^ d
            else:
                f = c ^ (b | ~d)
            tmp = a + f + X[:, _K[i]] + _T[i]
            s = int(_S[i])
            rot = (tmp << np.uint32(s)) | (tmp >> np.uint32(32 - s))
            a, d, c, b = d, c, b, b + rot
        return [A + a, B + b, C + c, D + d]


def md5_digests(
    data: np.ndarray, starts: np.ndarray, lengths: np.ndarray,
    prefix: bytes = b"",
) -> np.ndarray:
    """MD5 digests of ``prefix + data[starts[i]:starts[i]+lengths[i]]``.

    data: uint8 buffer; starts/lengths: int64[n] spans into it.
    Returns uint8[n, 16] — digest bytes per message (hex via
    ``digests_to_hex`` or ``bytes(row).hex()``).
    """
    n = int(starts.shape[0])
    out = np.empty((n, 16), dtype=np.uint8)
    if n == 0:
        return out
    starts = np.asarray(starts, dtype=np.int64)
    lengths = np.asarray(lengths, dtype=np.int64)
    plen = len(prefix)
    pre = np.frombuffer(prefix, dtype=np.uint8)
    total = lengths + plen
    nblocks = (total + 9 + 63) // 64
    nbuf = data.shape[0]
    for bcount in np.unique(nblocks):
        full_idx = np.flatnonzero(nblocks == bcount)
        for c0 in range(0, full_idx.shape[0], _MSG_CHUNK):
            idx = full_idx[c0 : c0 + _MSG_CHUNK]
            out[idx] = _pad_and_compress(
                data, starts[idx], lengths[idx], pre, int(bcount)
            )
    return out


def _pad_and_compress(
    data: np.ndarray,
    S: np.ndarray,
    L: np.ndarray,
    pre: np.ndarray,
    bcount: int,
) -> np.ndarray:
    """Pad one same-block-count message slice and run the rounds."""
    m = S.shape[0]
    M = _padded_matrix(data, S, L, pre, bcount)
    X = M.view("<u4").reshape(m, bcount, 16)
    state = [np.full(m, v, dtype=np.uint32) for v in _INIT]
    for blk in range(bcount):
        state = _compress(state, np.ascontiguousarray(X[:, blk, :]))
    return _digest_bytes(state, m)


def _padded_matrix(
    data: np.ndarray,
    S: np.ndarray,
    L: np.ndarray,
    pre: np.ndarray,
    bcount: int,
) -> np.ndarray:
    """RFC-1321 padded block matrix for one same-block-count slice.

    Unmasked gather + multiply-by-mask: reading past a message's end
    (clipped to the buffer) is fine because the mask zeroes those
    lanes — ~3x faster than the boolean-indexed scatter (profiled:
    padding construction was 85% of kernel time)."""
    nbuf = data.shape[0]
    plen = pre.shape[0]
    width = bcount * 64
    m = S.shape[0]
    M = np.zeros((m, width), dtype=np.uint8)
    if plen:
        M[:, :plen] = pre[None, :]
    cols = np.arange(width - plen, dtype=np.int64)[None, :]
    if nbuf:
        src = S[:, None] + cols
        np.minimum(src, nbuf - 1, out=src)
        body = data[src]
        body *= cols < L[:, None]
        M[:, plen:] = body
    M[np.arange(m), plen + L] = 0x80
    bitlen = (L + plen).astype(np.uint64) * np.uint64(8)
    M[:, width - 8 : width] = (
        bitlen.astype("<u8").view(np.uint8).reshape(m, 8)
    )
    return M


def _digest_bytes(state, m: int) -> np.ndarray:
    dig = np.empty((m, 16), dtype=np.uint8)
    for j, word in enumerate(state):
        dig[:, j * 4 : j * 4 + 4] = (
            word.astype("<u4").view(np.uint8).reshape(m, 4)
        )
    return dig


def md5_digests_prefixes(
    data: np.ndarray,
    starts: np.ndarray,
    lengths: np.ndarray,
    prefixes: list[bytes],
) -> np.ndarray:
    """MD5 digests of ``p + span`` for every prefix p in ``prefixes``.

    Returns uint8[len(prefixes), n, 16].  The MinHash family hashes the
    SAME spans under 16 short prefixes ('0:'..'15:'); building the
    padded block matrix is ~75% of md5_digests' cost and depends only
    on the prefix LENGTH, so this entry point constructs it once per
    distinct length and re-runs only the (cheap) compression rounds per
    prefix — digest-equal to calling md5_digests per prefix (pinned in
    tests/test_md5np.py).
    """
    n = int(starts.shape[0])
    P = len(prefixes)
    out = np.empty((P, n, 16), dtype=np.uint8)
    if n == 0:
        return out
    starts = np.asarray(starts, dtype=np.int64)
    lengths = np.asarray(lengths, dtype=np.int64)
    nbuf = data.shape[0]
    by_len: dict[int, list[int]] = {}
    for pi, p in enumerate(prefixes):
        by_len.setdefault(len(p), []).append(pi)
    for plen, pis in by_len.items():
        total = lengths + plen
        nblocks = (total + 9 + 63) // 64
        pre0 = np.frombuffer(prefixes[pis[0]], dtype=np.uint8)
        for bcount in np.unique(nblocks):
            full_idx = np.flatnonzero(nblocks == bcount)
            for c0 in range(0, full_idx.shape[0], _MSG_CHUNK):
                idx = full_idx[c0 : c0 + _MSG_CHUNK]
                m = idx.shape[0]
                M = _padded_matrix(
                    data, starts[idx], lengths[idx], pre0, int(bcount)
                )
                X = M.view("<u4").reshape(m, int(bcount), 16)
                for pi in pis:
                    if plen:
                        M[:, :plen] = np.frombuffer(
                            prefixes[pi], dtype=np.uint8
                        )[None, :]
                    state = [
                        np.full(m, v, dtype=np.uint32) for v in _INIT
                    ]
                    for blk in range(int(bcount)):
                        state = _compress(
                            state, np.ascontiguousarray(X[:, blk, :])
                        )
                    out[pi, idx] = _digest_bytes(state, m)
    return out


_HEX = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)


def digests_to_hex(dig: np.ndarray) -> list[str]:
    """uint8[n, 16] digests -> list of 32-char lowercase hex strings."""
    n = dig.shape[0]
    hx = np.empty((n, 32), dtype=np.uint8)
    hx[:, 0::2] = _HEX[dig >> 4]
    hx[:, 1::2] = _HEX[dig & 0x0F]
    flat = hx.tobytes()
    return [flat[i * 32 : i * 32 + 32].decode("ascii") for i in range(n)]


def segmented_min_digest(dig: np.ndarray, seg_starts: np.ndarray) -> np.ndarray:
    """Per-segment lexicographic-minimum digest row indices.

    dig: uint8[n, 16]; seg_starts: int64[k] ascending segment start
    offsets (first must be 0, segments cover [seg_starts[i],
    seg_starts[i+1]) with the last segment ending at n).  Returns
    int64[k] — for each segment, the row index of the lexicographically
    smallest digest (ties resolve to an arbitrary tied row — digests
    equal bytewise, so the choice is value-irrelevant).

    Lexicographic byte order == (hi u64 BE, lo u64 BE) order, so two
    big-endian uint64 views + two ``np.minimum.reduceat`` passes give
    the exact min without any sort.
    """
    n = dig.shape[0]
    hi = dig[:, :8].view(">u8")[:, 0].astype(np.uint64)
    lo = dig[:, 8:].view(">u8")[:, 0].astype(np.uint64)
    seg_starts = np.asarray(seg_starts, dtype=np.int64)
    k = seg_starts.shape[0]
    seg_id = np.zeros(n, dtype=np.int64)
    if k > 1:
        seg_id[seg_starts[1:]] = 1
        np.cumsum(seg_id, out=seg_id)
    min_hi = np.minimum.reduceat(hi, seg_starts)
    is_min_hi = hi == min_hi[seg_id]
    lo_masked = np.where(is_min_hi, lo, np.uint64(0xFFFFFFFFFFFFFFFF))
    min_lo = np.minimum.reduceat(lo_masked, seg_starts)
    winner = is_min_hi & (lo_masked == min_lo[seg_id])
    # first winning row per segment: reduceat(argmax-style) via cumsum
    first_true = np.full(k, -1, dtype=np.int64)
    w_idx = np.flatnonzero(winner)
    # w_idx ascending; first per segment = first occurrence
    w_seg = seg_id[w_idx]
    # keep the first w_idx of each segment
    keep = np.ones(w_idx.shape[0], dtype=bool)
    keep[1:] = w_seg[1:] != w_seg[:-1]
    first_true[w_seg[keep]] = w_idx[keep]
    return first_true
