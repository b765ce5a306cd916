"""Sweep-line block-max chunk pruning primitives (A19 cluster path, BMM).

The distributed scorers skip whole chunk rows before the mapInArrow decode
using bounds computed from impact-frontier metadata alone. Round 4 used the
*sum-UB* bound: chunk c of term t dies when ``UB(c) + sum_{t'!=t}
UBmax_global(t') < theta``. That bound credits every chunk with the single
strongest chunk of every other term ANYWHERE in doc space, so an
equal-strength disjunction ("the a") can never prune — both terms' global
maxima are high even when whole doc-id regions are uniformly weak.

This module implements the *windowed* bound (the Block-Max Maxscore /
BMM idea restated for doc-range-bucketed postings): per term, chunk rows
cover DISJOINT ascending doc-id ranges (operators/merge.py positional
bucketing), so for any doc range ``r`` the step function

    S(r) = sum over query terms of UB(the term's chunk covering r, else 0)

upper-bounds the total score of EVERY doc in ``r`` — each term contributes
at most its covering chunk's UB.  A chunk survives iff somewhere in its
range the stacked coverage reaches theta:

    keep(c)  <=>  max_{r in [first_docid(c), last_docid(c)]} S(r)
                      >= theta - margin

Soundness mirrors the sum-UB argument (plans/search.py) exactly:
* any doc d in a dropped chunk has total score <= S(r_d) <= max_window(c)
  < theta - margin, so it cannot reach the top-k; it may survive with a
  partial (underestimated) score, still strictly below theta - margin;
* any doc with total >= theta - margin keeps ALL its chunks: for each of
  its terms, the covering chunk's window max >= S(r_d) >= total — so every
  true top-k doc is scored EXACTLY.
Dominance: S(r) <= UB(c) + sum of other terms' global maxima, so the
windowed bound never keeps a chunk the sum-UB bound would drop — it is a
strict refinement, and on frontier-homogeneous inputs degrades to it.

Everything here is driver-side numpy over the collected chunk metadata
triplets (term, first_docid, last_docid, ub) — the same tiny metadata-only
job the sum-UB bound already paid for; the sweep itself is O(C log C) in
the chunk-row count with no per-row Python loops.
"""

from __future__ import annotations

import numpy as np

__all__ = ["interval_values", "range_max", "chunk_window_max"]


def interval_values(
    P: np.ndarray, lo: np.ndarray, hi: np.ndarray, w: np.ndarray
) -> np.ndarray:
    """Step-function values over the breakpoint grid ``P``.

    ``P`` is the sorted unique array of every chunk's ``lo`` and ``hi+1``;
    interval j spans ``[P[j], P[j+1])`` (the last interval is uncovered by
    construction). Returns V with V[j] = sum of ``w`` over chunks covering
    interval j. Ranges may belong to many step functions at once (summed);
    per-term disjointness is NOT required here — overlaps simply add."""
    delta = np.zeros(P.size + 1, dtype=np.float64)
    a = np.searchsorted(P, lo)
    b1 = np.searchsorted(P, hi + 1)
    np.add.at(delta, a, w)
    np.add.at(delta, b1, -w)
    return np.cumsum(delta[: P.size])


def range_max(
    P: np.ndarray,
    V: np.ndarray,
    lo: np.ndarray,
    hi: np.ndarray,
    term_codes: np.ndarray,
) -> np.ndarray:
    """Per-chunk ``max of V over the chunk's intervals``.

    ``V[j]`` applies to ``[P[j], P[j+1])``; every ``lo``/``hi+1`` must be a
    member of ``P``. Within one term the ranges are disjoint and can be
    sorted ascending, so each term's chunks turn into one interleaved
    ``[a_i, b1_i)`` index list and a single ``np.maximum.reduceat`` sweep
    answers all of that term's windows — O(|P|) per distinct term, no
    sparse table, no per-chunk loop."""
    n = lo.size
    out = np.empty(n, dtype=np.float64)
    if n == 0:
        return out
    a = np.searchsorted(P, lo)
    b1 = np.searchsorted(P, hi + 1)
    order = np.lexsort((a, term_codes))
    codes_sorted = term_codes[order]
    starts = np.flatnonzero(
        np.r_[True, codes_sorted[1:] != codes_sorted[:-1]]
    )
    bounds = np.r_[starts, codes_sorted.size]
    for s, e in zip(bounds[:-1], bounds[1:]):
        idx = order[s:e]
        r = np.empty(idx.size * 2, dtype=np.int64)
        r[0::2] = a[idx]
        r[1::2] = b1[idx]
        seg = np.maximum.reduceat(V, r)
        out[idx] = seg[0::2]
    return out


def chunk_window_max(
    term_codes: np.ndarray,
    lo: np.ndarray,
    hi: np.ndarray,
    ub: np.ndarray,
) -> np.ndarray:
    """The windowed BMM bound: per chunk, ``max over its doc range of the
    summed per-term covering UBs`` (module docstring). Inputs are parallel
    arrays over chunk rows; ``term_codes`` is any integer factorization of
    the term column."""
    if lo.size == 0:
        return np.empty(0, dtype=np.float64)
    P = np.unique(np.concatenate([lo, hi + 1]))
    V = interval_values(P, lo, hi, ub)
    return range_max(P, V, lo, hi, term_codes)
