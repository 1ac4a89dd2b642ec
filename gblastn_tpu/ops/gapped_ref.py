"""Banded gapped-extension DP: reference semantics for the Pallas kernel.

This module defines, in NumPy, the EXACT computation the TPU kernel
(ops.pallas_gapped) performs, so interpret-mode tests can assert kernel
== oracle bit-for-bit. It is a *band-restricted, lazily-pruned* variant
of the host semi-gapped aligner (gapped.dynprog.semi_gapped_align,
reference /root/reference/c++/src/algo/blast/core/blast_gapalign.c:744):

* fixed band of W diagonals centred on the seed diagonal (lane l of a
  row i holds column j = i + l - W/2, so the diagonal predecessor stays
  in-lane and the vertical one is a one-lane shift);
* the horizontal-gap (E) recurrence is evaluated with its closed-form
  prefix-max (exact for gap_open >= 0: opening from a cell that was
  itself reached horizontally never helps);
* X-drop pruning is applied per STEP-row GROUP against the best score
  through the previous group -- strictly lazier than the host's in-row
  running best, so cells the host keeps are always kept here and the
  band score is an upper bound on the host score except for the host's
  sticky-E quirk (E is not decayed across host-pruned cells), which can
  exceed the bound by at most gap_extend * (pruned run length) in rare
  revivals;
* a seed whose H row is entirely dead at a group boundary is latched
  dead (sticky F cannot revive it), matching the kernel's early exit;
* hazard flags make the bound checkable: ``FLAG_EDGE`` = a live cell
  (including the row-0 band) touched the band boundary (the true
  window may be wider than W); ``FLAG_ROWS`` = still alive when the
  row budget ran out before the sequence did.

The engine uses the kernel as a sound REJECTION filter: a candidate
whose flag-free band score (plus a safety margin) misses the cutoff
cannot be admitted by the host aligner; admitted candidates are always
re-extended exactly on host, so saved HSPs are host-identical by
construction (VERDICT.md round-1 item 2).
"""
from __future__ import annotations

import numpy as np

NEG = -(1 << 24)
W = 128            # band width (diagonals) == TPU lane count
STEP = 8           # rows per X-drop/death group (kernel lag)

FLAG_EDGE = 1      # live cell at band edge: window may exceed the band
FLAG_ROWS = 2      # alive at the row budget with rows < M remaining


def banded_dp_score(
    A: np.ndarray,          # subject codes consumed down rows (step i
                            # reads A[i-1]); already direction-resolved
    B: np.ndarray,          # query codes along columns (col j reads
                            # B[j-1])
    score_fn,               # (a_code, b_code) -> int score
    M: int,                 # max subject steps (rows)
    N: int,                 # max query steps (columns)
    gap_open: int,
    gap_extend: int,
    x_dropoff: int,
    max_rows: int,
) -> tuple[int, int, int, int]:
    """Returns (best_score, a_steps, b_steps, flags)."""
    oe = gap_open + gap_extend
    e = gap_extend
    X = max(x_dropoff, oe)
    if M <= 0 or N <= 0:
        return 0, 0, 0, 0

    half = W // 2
    lanes = np.arange(W)

    # row 0: H(0, j) = -open - j*e for j in [0, N]; band lane l -> j=l-half
    jj0 = lanes - half
    H = np.where(
        (jj0 >= 0) & (jj0 <= N),
        -gap_open - jj0 * e + (jj0 == 0) * gap_open,   # j=0 -> 0
        NEG,
    ).astype(np.int64)
    H = np.where((jj0 > 0) & (-gap_open - jj0 * e < -X), NEG, H)
    F = np.where(H > NEG // 2, H - oe, NEG)
    best = 0
    besti = 0
    bestj = 0
    flags = 0
    bestlane = H.copy()
    # row-0 band-edge liveness counts toward the edge flag
    if H[0] > NEG // 2 or H[W - 1] > NEG // 2:
        flags |= FLAG_EDGE

    R = min(M, max_rows)
    thr = best - X
    i = 0
    while i < R:
        # group-lazy X-drop threshold (kernel: refreshed every STEP)
        thr = max(int(bestlane.max()), 0) - X
        group_end = min(i + STEP, R)
        while i < group_end:
            i += 1
            jj = i + lanes - half           # column per lane this row
            a_code = int(A[i - 1])
            bvals = np.where(
                (jj >= 1) & (jj <= N),
                B.astype(np.int64)[np.clip(jj - 1, 0, len(B) - 1)],
                -1,
            )
            msc = np.array(
                [score_fn(a_code, int(b)) if b >= 0 else NEG
                 for b in bvals],
                dtype=np.int64,
            )

            diag = np.where((jj >= 1) & (jj <= N), H + msc, NEG)
            # vertical predecessor (i-1, jj) sat one lane to the right
            Fv = np.concatenate([F[1:], [NEG]])
            Ht = np.maximum(diag, Fv)                   # H sans E
            # E(i,jj) = max_{j'<jj}(Ht(i,j') - oe - (jj-j')*e)
            u = np.where(Ht > NEG // 2, Ht + lanes * e, NEG)
            run = np.maximum.accumulate(u)
            excl = np.concatenate([[NEG], run[:-1]])
            E = np.where(excl > NEG // 2, excl - oe - lanes * e, NEG)
            Hn = np.maximum(Ht, E)
            valid = (jj >= 0) & (jj <= N)
            Hn = np.where(valid, Hn, NEG)

            Hn = np.where(Hn < thr, NEG, Hn)
            live = Hn > NEG // 2
            # F kept stale (host quirk) when the cell is pruned/dead
            F = np.where(
                live, np.maximum(Fv - e, Hn - oe), Fv
            )
            H = Hn
            bestlane = np.maximum(bestlane, Hn)

            if live.any():
                rowmax = int(Hn[live].max())
                if rowmax > best:
                    best = rowmax
                    l = int(np.flatnonzero(live & (Hn == rowmax))[0])
                    besti = i
                    bestj = i + l - half
                if live[0] or live[W - 1]:
                    flags |= FLAG_EDGE

        # group boundary: death latch (kernel-identical early exit)
        if not (H > NEG // 2).any():
            return best, besti, bestj, flags

    if R < M:
        # alive at the row budget: the host would have kept going
        flags |= FLAG_ROWS
    return best, besti, bestj, flags
