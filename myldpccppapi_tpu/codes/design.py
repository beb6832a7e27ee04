"""PEXIT-guided protograph design: optimize base-graph supports.

Closes the loop the reference cannot (it ships fixed tables;
``MyLdpc.h:40-102``): with :mod:`.pexit` pricing any protograph in
milliseconds, the synthetic NR base graphs (PROVENANCE.md) can be *designed*
instead of merely structure-matched — a threshold-driven search over the
edge support, under the exact TS 38.212 structural constraints that keep the
triangular encoder, 2Z front puncture, and rate matcher working:

* columns 0/1 (the punctured systematic pair) stay high-degree,
* the 4x4 core-parity staircase and the identity extension columns are
  fixed (they ARE the encoder),
* extension rows keep bounded degree (sparsity = decode cost/iteration).

The search is plain greedy hill-climbing with move = relocate one edge of
one row; each candidate is priced by ONE pexit run at (current threshold -
tol) — full bisection only on acceptance — so hundreds of moves cost
minutes on the host.  Thresholds depend on the protograph only; the lifted
shifts (girth-6 fill + measured-FER seed selection in :mod:`.nr`) control
the floor and are chosen downstream, unchanged.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from .pexit import pexit_run, threshold_ebn0

__all__ = ["optimize_nr_support", "nr_support_default"]


def _nr_shapes(bg: int) -> Tuple[int, int, int]:
    from .nr import _BG_SHAPES

    return _BG_SHAPES[bg]


def nr_support_default(bg: int, seed: Optional[int] = None) -> np.ndarray:
    """Boolean support of the LEGACY profile-recall synthetic base graph
    (the search start point — not the already-designed default)."""
    from .nr import nr_base_graph

    return nr_base_graph(bg, seed=seed, support="legacy") >= 0


def _nr_fixed_and_bounds(bg: int):
    m_b, n_b, k_b = _nr_shapes(bg)
    fixed = np.zeros((m_b, n_b), dtype=bool)
    # core-parity staircase + identity extension columns are the encoder
    for i in range(4):
        fixed[i, k_b + i] = True
        if i + 1 < 4:
            fixed[i + 1, k_b + i] = True
    for r in range(4, m_b):
        fixed[r, k_b + 4 + (r - 4)] = True
    # mutable region: systematic + core-parity columns
    mutable_cols = np.arange(0, k_b + 4)
    return fixed, mutable_cols


def _valid(b: np.ndarray, bg: int) -> bool:
    m_b, n_b, k_b = _nr_shapes(bg)
    core = b[:4, : k_b + 4]
    ext = b[4:, : k_b + 4]
    # triangular encodability: core row i may touch parity columns only up
    # to its own staircase diagonal k_b + i
    for i in range(4):
        if b[i, k_b + i + 1: k_b + 4].any():
            return False
    # punctured columns need protection: high degree, and every extension
    # row keeps at least one of them is NOT required (the real BGs don't),
    # but the columns themselves must stay the best-connected
    if b[:, 0].sum() < m_b // 3 or b[:, 1].sum() < m_b // 3:
        return False
    # degree bounds: extension rows 3..7 over the mutable region (plus
    # their identity bit), core rows 8..k_b+2
    d_ext = ext.sum(axis=1)
    if d_ext.min() < 3 or d_ext.max() > 7:
        return False
    d_core = core.sum(axis=1)
    if d_core.min() < 6 or d_core.max() > k_b + 3:
        return False
    # every systematic/core-parity column must be reachable (degree >= 1;
    # transmitted systematic want >= 2 for BP to improve them at all)
    d_col = b[:, : k_b + 4].sum(axis=0)
    if d_col.min() < 1 or (d_col[2:k_b] < 2).any():
        return False
    return True


def _threshold(b: np.ndarray, bg: int, lo: float, hi: float,
               tol: float) -> float:
    m_b, n_b, k_b = _nr_shapes(bg)
    rate = (n_b - m_b) / (n_b - 2)
    return threshold_ebn0(
        b.astype(np.int64), rate=rate, punctured_cols=(0, 1),
        lo=lo, hi=hi, tol_db=tol,
    )


def _converges_at(b: np.ndarray, bg: int, ebn0_db: float) -> bool:
    m_b, n_b, k_b = _nr_shapes(bg)
    rate = (n_b - m_b) / (n_b - 2)
    s = np.full(n_b, 8.0 * rate * 10.0 ** (ebn0_db / 10.0))
    s[0] = s[1] = 0.0
    return pexit_run(b.astype(np.int64), s).converged


def optimize_nr_support(
    bg: int = 2,
    steps: int = 600,
    seed: int = 0,
    start: Optional[np.ndarray] = None,
    tol_db: float = 0.02,
    log_every: int = 0,
) -> Tuple[np.ndarray, float]:
    """Greedy threshold descent on the BG support.  Returns (support,
    threshold_ebn0_db).

    Moves (uniform mix): relocate one mutable edge within its row; add an
    edge to a row below its degree cap; drop an edge from a row above its
    floor.  A move is accepted iff the protograph converges strictly below
    the incumbent threshold (one pexit run for rejects).
    """
    rng = np.random.default_rng(seed)
    m_b, n_b, k_b = _nr_shapes(bg)
    fixed, mcols = _nr_fixed_and_bounds(bg)
    b = (start if start is not None else nr_support_default(bg)).copy()
    assert _valid(b, bg), "start support violates the structural constraints"
    thr = _threshold(b, bg, lo=-2.0, hi=10.0, tol=tol_db)

    for step in range(steps):
        cand = b.copy()
        r = int(rng.integers(0, m_b))
        row = cand[r, : k_b + 4]
        on = [j for j in np.flatnonzero(row) if not fixed[r, j]]
        off = [j for j in mcols if not row[j]]
        if not on or not off:
            continue
        kind = rng.random()
        if kind < 0.6:                      # relocate
            row[rng.choice(on)] = False
            row[rng.choice(off)] = True
        elif kind < 0.8:                    # add
            row[rng.choice(off)] = True
        else:                               # drop
            row[rng.choice(on)] = False
        if not _valid(cand, bg):
            continue
        if _converges_at(cand, bg, thr - tol_db):
            b = cand
            thr = _threshold(b, bg, lo=thr - 2.0, hi=thr, tol=tol_db)
            if log_every and (step % log_every == 0):
                print(f"[design] step {step}: threshold {thr:.3f} dB")
    return b, thr
