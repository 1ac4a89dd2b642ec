"""Tests for the greedy gapped aligner (gblastn_tpu.gapped.greedy).

Validation strategy (the reference has no greedy unit tests; its oracle is
whole-search output identity): hand-built cases with known optimal
alignments, plus fuzz invariants --

* traceback mode and score-only mode return the same score/extents;
* the returned edit script consumes exactly the reported extents;
* re-scoring the (pre-reduce) edit script with the affine scoring system
  reproduces the returned score (greedy tracks distance; the conversion
  back to score must be exact);
* reduce_gaps preserves total sequence consumption.
"""
from __future__ import annotations

import numpy as np
import pytest

from gblastn_tpu.gapped.greedy import (
    GreedyResult,
    affine_greedy_align,
    greedy_align,
    greedy_gapped_alignment,
    reduce_gaps,
)
from gblastn_tpu.hits import OP_DEL, OP_INS, OP_SUB


def codes(s: str) -> np.ndarray:
    return np.array(["ACGT".index(c) for c in s], dtype=np.uint8)


def script_consumption(esp) -> tuple[int, int]:
    q = sum(n for op, n in esp if op in (OP_SUB, OP_INS))
    s = sum(n for op, n in esp if op in (OP_SUB, OP_DEL))
    return q, s


def rescore_script(
    esp, q: np.ndarray, s: np.ndarray, reward: int, penalty: int,
    gap_open: int, gap_extend: int,
) -> int:
    """Affine score of an edit script starting at q[0], s[0]."""
    qi = si = 0
    score = 0
    for op, num in esp:
        if op == OP_SUB:
            for _ in range(num):
                if q[qi] < 4 and q[qi] == s[si]:
                    score += reward
                else:
                    score += penalty
                qi += 1
                si += 1
        elif op == OP_INS:
            score -= gap_open + gap_extend * num
            qi += num
        else:
            score -= gap_open + gap_extend * num
            si += num
    return score


class TestNonAffineHandCases:
    def test_perfect_match(self):
        q = codes("ACGTACGTACGT")
        r = greedy_align(q, q.copy(), False, 20, 2, 4, True)
        assert r.score_or_dist == 0
        assert r.seq1_align_len == 12 and r.seq2_align_len == 12
        assert r.edit_ops == [(OP_SUB, 12)]

    def test_perfect_match_reverse(self):
        q = codes("ACGTACGTACGT")
        r = greedy_align(q, q.copy(), True, 20, 2, 4, True)
        assert r.score_or_dist == 0
        assert r.edit_ops == [(OP_SUB, 12)]

    def test_single_mismatch(self):
        q = codes("AAAAAAAACAAAAAAAA")
        s = codes("AAAAAAAAGAAAAAAAA")
        r = greedy_align(q, s, False, 20, 2, 4, True)
        assert r.score_or_dist == 1
        assert r.seq1_align_len == 17 and r.seq2_align_len == 17
        assert r.edit_ops == [(OP_SUB, 17)]

    def test_single_insertion_in_query(self):
        # query has one extra base -> gap in subject (OP_INS)
        q = codes("ACGTACGTTTACACACAC")
        s = codes("ACGTACGTTACACACAC")
        r = greedy_align(q, s, False, 30, 2, 4, True)
        assert r.score_or_dist == 1
        assert r.seq1_align_len == 18 and r.seq2_align_len == 17
        qc, sc = script_consumption(r.edit_ops)
        assert (qc, sc) == (18, 17)
        assert sum(n for op, n in r.edit_ops if op == OP_INS) == 1

    def test_query_ambiguity_is_mismatch(self):
        q = codes("AAAAAAAAAAAAAAAA").copy()
        q[8] = 14  # N in BLASTNA
        s = codes("AAAAAAAAAAAAAAAA")
        r = greedy_align(q, s, False, 20, 2, 4, False)
        assert r.score_or_dist == 1


class TestAffineHandCases:
    def test_perfect(self):
        q = codes("ACGTACGTACGTACGT")
        r = affine_greedy_align(q, q.copy(), False, 30, 2, 3, 5, 2, True)
        assert r.score_or_dist == 2 * 16
        assert r.edit_ops == [(OP_SUB, 16)]

    def test_one_mismatch_score(self):
        q = codes("AAAACAAAACCCCGGGG")
        s = codes("AAAAGAAAACCCCGGGG")
        r = affine_greedy_align(q, s, False, 30, 2, 3, 5, 2, True)
        # 16 matches * 2 - 3
        assert r.score_or_dist == 29
        assert r.edit_ops == [(OP_SUB, 17)]

    def test_one_gap(self):
        q = codes("ACACACACTGTGTGTGAACC")
        s = codes("ACACACACGTGTGTGTGAACC")  # one extra G in subject
        r = affine_greedy_align(q, s, False, 40, 2, 3, 5, 2, True)
        # 20 matches * 2 - (5 + 2)
        assert r.score_or_dist == 33
        qc, sc = script_consumption(r.edit_ops)
        assert (qc, sc) == (20, 21)

    def test_odd_reward_scaling(self):
        # reward 1 is doubled internally; returned score is in 2x units
        q = codes("AAAACAAAACCCCGGGG")
        s = codes("AAAAGAAAACCCCGGGG")
        r = affine_greedy_align(q, s, False, 30, 1, 2, 2, 1, True)
        # doubled system: 16 matches*2 - 4 = 28 (x2 units of 1/-2)
        assert r.score_or_dist == 28


def mutate(
    rng: np.random.Generator, seq: np.ndarray, sub_rate: float,
    indel_rate: float,
) -> np.ndarray:
    out = []
    for b in seq:
        roll = rng.random()
        if roll < sub_rate:
            out.append((b + rng.integers(1, 4)) % 4)
        elif roll < sub_rate + indel_rate / 2:
            continue  # deletion
        elif roll < sub_rate + indel_rate:
            out.append(b)
            out.append(rng.integers(0, 4))  # insertion
        else:
            out.append(b)
    return np.array(out, dtype=np.uint8)


@pytest.mark.parametrize("reward,penalty,go,ge,xdrop", [
    (1, -2, 0, 0, 50),   # megablast defaults (non-affine greedy)
    (2, -3, 5, 2, 60),   # blastn-style affine
    (1, -3, 2, 1, 40),
])
def test_fuzz_invariants(reward, penalty, go, ge, xdrop):
    rng = np.random.default_rng(20260816)
    for trial in range(25):
        n = int(rng.integers(40, 400))
        s = rng.integers(0, 4, n).astype(np.uint8)
        q = mutate(rng, s, 0.05, 0.02)
        if len(q) < 30:
            continue
        # anchor: find a decent exact match to seed from
        anchor = None
        for i in range(0, min(len(q), len(s)) - 12):
            if np.array_equal(q[i:i + 12], s[i:i + 12]):
                anchor = i + 6
                break
        if anchor is None:
            continue

        r_tb = greedy_gapped_alignment(
            q, s, xdrop, reward, penalty, go, ge, anchor, anchor, True
        )
        r_so = greedy_gapped_alignment(
            q, s, xdrop, reward, penalty, go, ge, anchor, anchor, False
        )
        # same score and extents in both modes
        assert r_tb.score == r_so.score
        assert (r_tb.q_start, r_tb.q_end) == (r_so.q_start, r_so.q_end)
        assert (r_tb.s_start, r_tb.s_end) == (r_so.s_start, r_so.s_end)
        # edit script consumes the reported extents (post reduce_gaps)
        qc, sc = script_consumption(r_tb.edit_script)
        assert qc == r_tb.q_end - r_tb.q_start
        assert sc == r_tb.s_end - r_tb.s_start
        # seed start estimate lies in the alignment box
        assert r_so.q_start <= r_so.q_seed_start <= r_so.q_end
        assert r_so.s_start <= r_so.s_seed_start <= r_so.s_end


@pytest.mark.parametrize("reward,penalty,go,ge,xdrop", [
    (2, -3, 5, 2, 60),
    (2, -7, 4, 2, 60),
])
def test_affine_score_identity(reward, penalty, go, ge, xdrop):
    """Pre-reduce per-direction scripts re-score exactly to the greedy
    score (affine systems with even reward return unscaled scores)."""
    rng = np.random.default_rng(77)
    for trial in range(20):
        n = int(rng.integers(50, 300))
        s = rng.integers(0, 4, n).astype(np.uint8)
        q = mutate(rng, s, 0.06, 0.03)
        if len(q) < 20:
            continue
        r = affine_greedy_align(
            q, s, False, xdrop, reward, -penalty, go, ge, True
        )
        if not r.edit_ops:
            continue
        # forward script is emitted backwards; reverse for scoring
        esp = list(reversed(r.edit_ops))
        # merge adjacent same ops after reversal
        merged = []
        for op, num in esp:
            if merged and merged[-1][0] == op:
                merged[-1] = (op, merged[-1][1] + num)
            else:
                merged.append((op, num))
        qc, sc = script_consumption(merged)
        assert qc == r.seq1_align_len
        assert sc == r.seq2_align_len
        got = rescore_script(merged, q, s, reward, penalty, go, ge)
        assert got == r.score_or_dist, (trial, merged)


def test_reduce_gaps_preserves_consumption():
    rng = np.random.default_rng(5)
    q = rng.integers(0, 4, 60).astype(np.uint8)
    s = q.copy()
    # synthetic script with adjacent small gaps: S:20 D:1 S:1 I:1 S:37
    # (consumes q: 20+1+1+37 = 59... build consistent lengths instead)
    esp = [(OP_SUB, 20), (OP_DEL, 1), (OP_SUB, 1), (OP_INS, 1), (OP_SUB, 37)]
    qc, sc = script_consumption(esp)
    out = reduce_gaps(esp, q[:qc], s[:sc], 0, 0)
    qc2, sc2 = script_consumption(out)
    assert (qc, sc) == (qc2, sc2)
