"""Suffix-array exact-substring kernel (vectorized, numpy).

The north-star pass list names three near-dup modalities: MinHash/LSH,
SimHash Hamming-ball, and SUFFIX-ARRAY exact substring.  The anchored-
gram pass (operators/substring.py) answers the DECISION question "do
these two docs share a span >= L?"; this module answers the stronger
MEASUREMENT question "what is the LONGEST exact span they share, and
where?" — destor's byte-precision restore guarantee re-expressed as a
span certificate (a shared span is a run of identical chunks in
/root/reference/src/chunking/rabin_chunking.c terms; the suffix array
finds the maximal such run exactly, not just an >=L witness).

Algorithms (all public classics):
  * Manber-Myers prefix doubling for the suffix array — O(n log^2 n),
    expressed as numpy lexsort passes; no per-character Python (the
    r4 review retired a per-char kernel: scale rule, BENCH.md).
  * pairwise LCP via the retained doubling rank LEVELS (the standard
    "sparse table on ranks" trick): rank_k[i] == rank_k[j] iff the
    k-length windows at i and j are identical, so an LCP decomposes
    greedily over descending k — O(log n) vectorized steps for ALL
    queried pairs at once (Kasai's O(n) walk is a data-dependent
    Python loop; the level walk trades a log factor for full
    vectorization).
  * longest common substring of two sequences = max LCP over ADJACENT
    suffix-array entries owned by different documents (the classical
    reduction; a unique separator sentinel keeps cross-sentinel
    matches impossible).

Memory: the retained int32 rank levels cost ~4n·log2(n) bytes per
pair, and _doubling_levels additionally holds ~4 int64 working arrays
(~32n bytes) while building — a 1 MB + 1 MB codepoint pair (n ~ 2^21)
peaks around 90 MB of levels plus ~70 MB transient working set, call
it ~150-250 MB.  Verify-path texts are page-sized (KBs), and the
Arrow batch processes pairs one at a time, so the bound is per-pair,
not per-batch; size executor overhead memory for the LARGEST document
pair you expect, not for the batch.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "suffix_array",
    "longest_common_span",
    "longest_common_token_run",
]


def _doubling_levels(arr: np.ndarray):
    """Suffix array of an int array via prefix doubling.

    Returns (sa, levels) where levels is [(k, rank_k), ...] and
    rank_k[i] ranks the k-length window starting at i (ties beyond the
    string end break by position, the usual convention).
    """
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.int64), []
    rank = np.unique(arr, return_inverse=True)[1].astype(np.int64)
    levels = [(1, rank.astype(np.int32))]
    sa = np.argsort(rank, kind="stable")
    k = 1
    while k < n and rank[sa[-1]] < n - 1:
        rk2 = np.full(n, -1, dtype=np.int64)
        rk2[: n - k] = rank[k:]
        order = np.lexsort((rk2, rank))
        r1 = rank[order]
        r2 = rk2[order]
        bump = np.empty(n, dtype=np.int64)
        bump[0] = 0
        bump[1:] = (r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])
        new_rank = np.cumsum(bump)
        rank = np.empty(n, dtype=np.int64)
        rank[order] = new_rank
        sa = order
        k *= 2
        levels.append((k, rank.astype(np.int32)))
    return sa, levels


def suffix_array(arr: np.ndarray) -> np.ndarray:
    """Suffix array (positions of suffixes in lexicographic order)."""
    return _doubling_levels(np.asarray(arr))[0]


def _pairwise_lcp(levels, i_arr: np.ndarray, j_arr: np.ndarray, n: int):
    """LCP(arr[i:], arr[j:]) for every (i, j) pair, vectorized.

    Greedy binary decomposition over descending window sizes: at level
    k, equal ranks certify k more equal elements, so advance both
    cursors.  Every step is a full-array gather + compare.
    """
    lcp = np.zeros(len(i_arr), dtype=np.int64)
    for k, rank in reversed(levels):
        ii = i_arr + lcp
        jj = j_arr + lcp
        can = (ii + k <= n) & (jj + k <= n)
        idx_i = np.where(can, ii, 0)
        idx_j = np.where(can, jj, 0)
        eq = can & (rank[idx_i] == rank[idx_j])
        lcp = np.where(eq, lcp + k, lcp)
    return lcp


def longest_common_span(a: str, b: str) -> tuple[int, int, int]:
    """(span_len, a_off, b_off): the longest exact substring shared by
    a and b (character/codepoint granularity) and one witness position
    in each.  (0, -1, -1) when nothing is shared.

    Ties break to the lexicographically-first adjacent pair in suffix
    order with the a-side suffix position ascending — deterministic, so
    distributed re-runs return identical witnesses (the reference's
    hash-iteration tie order is unspecified; an engine that checkpoints
    results must pin one).
    """
    ca = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)
    cb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    return _lcs_ids(ca.astype(np.int64), cb.astype(np.int64))


def longest_common_token_run(
    toks_a, toks_b
) -> tuple[int, int, int]:
    """Token-granularity longest_common_span: tokens are factorized to
    int ids over the pair's joint vocabulary first.  Used by the
    SQL-checkable driver twin (whitespace tokens, md5-free: the value
    compared is a LENGTH, portable by construction)."""
    a = np.asarray(list(toks_a), dtype=object)
    b = np.asarray(list(toks_b), dtype=object)
    if len(a) == 0 or len(b) == 0:
        return 0, -1, -1
    joint, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    return _lcs_ids(
        inv[: len(a)].astype(np.int64), inv[len(a):].astype(np.int64)
    )


def _lcs_ids(a: np.ndarray, b: np.ndarray) -> tuple[int, int, int]:
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0, -1, -1
    lo = min(a.min(), b.min())
    sep = np.array([lo - 1], dtype=np.int64)  # unique: below every id
    s = np.concatenate([a, sep, b])
    n = len(s)
    sa, levels = _doubling_levels(s)
    # owner: 0 = a, 1 = b, -1 = the sentinel position
    owner = np.empty(n, dtype=np.int8)
    owner[:la] = 0
    owner[la] = -1
    owner[la + 1:] = 1
    own_sa = owner[sa]
    adj = (own_sa[:-1] != own_sa[1:]) & (own_sa[:-1] >= 0) & (own_sa[1:] >= 0)
    if not adj.any():
        return 0, -1, -1
    t = np.nonzero(adj)[0]
    lcp = _pairwise_lcp(levels, sa[t], sa[t + 1], n)
    best = int(lcp.max())
    if best == 0:
        return 0, -1, -1
    # deterministic witness: smallest suffix-order index among maxima
    w = t[np.argmax(lcp)]
    p, q = int(sa[w]), int(sa[w + 1])
    if owner[p] == 1:
        p, q = q, p
    return best, p, q - (la + 1)
