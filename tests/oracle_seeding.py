"""Scalar NumPy oracle for the seeding stage.

A direct, loop-based transcription of the reference algorithm semantics
(na_ungapped.c: scanning at stride, s_BlastNaExtend mini-extension,
s_NuclUngappedExtendExact, one-hit s_BlastnDiagTableExtendInitialHit),
used as ground truth for the vectorized device implementation. Slow but
obviously correct.
"""
from __future__ import annotations

import numpy as np

from gblastn_tpu.stats.karlin import nucl_score_matrix

NEG = -(1 << 24)


def matrix16x4(reward: int, penalty: int) -> np.ndarray:
    """BLASTNA x 2-bit score matrix used on device (int32[16,4])."""
    m = nucl_score_matrix(reward, penalty)[:, :4].astype(np.int64)
    return np.clip(m, NEG, None).astype(np.int32)


def oracle_scan(subject2, valid, lut_pos_by_word, w, step):
    """Yield (q_off, s_off) scan hits in reference emission order."""
    hits = []
    S = len(subject2)
    for s in range(0, S - w + 1, step):
        if not valid[s:s + w].all():
            continue
        word = 0
        for j in range(w):
            word = word * 4 + int(subject2[s + j])
        for q in lut_pos_by_word.get(word, ()):  # chain order
            hits.append((q, s))
    return hits


def oracle_mini_extend(query, subject2, valid, q_off, s_off, w, W):
    """s_BlastNaExtend for one hit. Returns (q_adj, s_adj) or None."""
    ext_to = W - w
    Q, S = len(query), len(subject2)

    def s_eq(q, s):
        return (
            0 <= s < S and 0 <= q < Q and valid[s]
            and int(query[q]) == int(subject2[s])
        )

    ext_left = 0
    while ext_left < min(ext_to, s_off):
        if not s_eq(q_off - ext_left - 1, s_off - ext_left - 1):
            break
        ext_left += 1
    if ext_left < ext_to:
        need = ext_to - ext_left
        ext_right = 0
        while ext_right < need:
            if not s_eq(q_off + w + ext_right, s_off + w + ext_right):
                break
            ext_right += 1
        if ext_left + ext_right < ext_to:
            return None
    return q_off - ext_left, s_off - ext_left


def oracle_ungapped_exact(query, subject2, valid, mat16, q_off, s_off, X):
    """s_NuclUngappedExtendExact. X is the positive dropoff magnitude.
    Returns (q_start, s_start, length, score)."""
    Q, S = len(query), len(subject2)

    def sc(q, s):
        if not (0 <= q < Q and 0 <= s < S) or not valid[s]:
            return NEG
        return int(mat16[int(query[q]), int(subject2[s])])

    # left
    score = 0
    total = 0
    best_pos_l = 0
    max_left = min(q_off, s_off)
    s = 0
    for j in range(1, max_left + 1):
        s += sc(q_off - j, s_off - j)
        if s > 0:
            best_pos_l = j
            score += s
            s = 0
        elif s < -X:
            break
    # right
    s = 0
    best_pos_r = 0
    max_right = min(Q - q_off, S - s_off)
    for j in range(1, max_right + 1):
        s += sc(q_off + j - 1, s_off + j - 1)
        if s > 0:
            best_pos_r = j
            score += s
            s = 0
        elif s < -X:
            break
    q_start = q_off - best_pos_l
    s_start = s_off - best_pos_l
    length = best_pos_l + best_pos_r
    return q_start, s_start, length, score


def oracle_seeding_pipeline(
    query, subject2, valid, lut_pos_by_word, w, W, step, mat16,
    subject_starts, context_offsets, cutoffs_by_ctx, xdrop_by_ctx,
):
    """Full one-hit seeding pipeline; returns list of saved hit dicts in
    emission order (not score-sorted)."""
    diag_state = {}
    saved = []
    starts = np.asarray(subject_starts)
    for q0, s0 in oracle_scan(subject2, valid, lut_pos_by_word, w, step):
        adj = oracle_mini_extend(query, subject2, valid, q0, s0, w, W)
        if adj is None:
            continue
        q, s = adj
        oid = int(np.searchsorted(starts, s, side="right") - 1)
        key = (oid, s - q)
        last_hit = diag_state.get(key, 0)
        if s < last_hit:
            continue
        ctx = int(np.searchsorted(context_offsets, q, side="right") - 1)
        ctx = min(ctx, len(cutoffs_by_ctx) - 1)
        qs, ss, ln, sco = oracle_ungapped_exact(
            query, subject2, valid, mat16, q, s, int(xdrop_by_ctx[ctx])
        )
        if sco >= cutoffs_by_ctx[ctx]:
            saved.append(dict(q_off=q, s_off=s, q_start=qs, s_start=ss,
                              length=ln, score=sco, context=ctx, oid=oid))
            diag_state[key] = ss + ln
        else:
            diag_state[key] = s + W
    return saved
