"""Tests for the DP gapped aligner and the blastn task end to end."""
from __future__ import annotations

import numpy as np
import pytest

from gblastn_tpu.engine.search import search
from gblastn_tpu.gapped.dynprog import (
    dyn_prog_nt_gapped_alignment,
    gapped_alignment_with_traceback,
    semi_gapped_align,
)
from gblastn_tpu.hits import OP_DEL, OP_INS, OP_SUB
from gblastn_tpu.io.fasta import FastaRecord
from gblastn_tpu.io.seqdb import SequenceDB
from gblastn_tpu.params.options import blastn_options
from gblastn_tpu.stats.karlin import nucl_score_matrix


def codes(s: str) -> np.ndarray:
    return np.array(["ACGT".index(c) for c in s], dtype=np.uint8)


MAT = nucl_score_matrix(2, -3)


def rescore(esp, q, s, q0, s0, go, ge):
    qi, si = q0, s0
    total = 0
    for op, num in esp:
        if op == OP_SUB:
            for _ in range(num):
                total += int(MAT[q[qi], s[si]])
                qi += 1
                si += 1
        elif op == OP_DEL:
            total -= go + ge * num
            si += num
        else:
            total -= go + ge * num
            qi += num
    return total


class TestSemiGapped:
    def test_perfect_forward(self):
        # A[0] skipped by convention: prepend one pad base
        a = codes("A" + "ACGTACGTACGT")
        b = codes("A" + "ACGTACGTACGT")
        score, ao, bo, _ = semi_gapped_align(
            a, b, 12, 12, MAT, 5, 2, 50, reverse_sequence=False
        )
        # cell (a,b) consumes A[1..a], B[1..b]
        assert score == 24 and ao == 12 and bo == 12

    def test_perfect_reverse(self):
        a = codes("ACGTACGTACGT" + "A")
        b = codes("ACGTACGTACGT" + "A")
        score, ao, bo, _ = semi_gapped_align(
            a, b, 12, 12, MAT, 5, 2, 50, reverse_sequence=True
        )
        assert score == 24

    def test_mismatch_stops_when_negative(self):
        a = codes("A" + "ACGT" + "GGGGGGGG")
        b = codes("A" + "ACGT" + "CCCCCCCC")
        score, ao, bo, _ = semi_gapped_align(
            a, b, 12, 12, MAT, 5, 2, 50, reverse_sequence=False
        )
        assert score == 8  # 4 matches then mismatches drop it

    def test_gap_placement_traceback(self):
        # a has one extra base relative to b
        a = codes("A" + "ACGTACGTG" + "TTACCAGTTACC")
        b = codes("A" + "ACGTACGT" + "TTACCAGTTACC")
        score, ao, bo, ops = semi_gapped_align(
            a, b, 21, 20, MAT, 5, 2, 80,
            reverse_sequence=False, score_only=False,
        )
        # 20 matches * 2 - (5+2)
        assert score == 33
        ac = sum(n for op, n in ops if op in (OP_SUB, OP_INS))
        bc = sum(n for op, n in ops if op in (OP_SUB, OP_DEL))
        assert ac == ao and bc == bo

    def test_scoreonly_equals_traceback_fuzz(self):
        rng = np.random.default_rng(99)
        for _ in range(15):
            n = int(rng.integers(30, 150))
            s = rng.integers(0, 4, n).astype(np.uint8)
            q = s.copy()
            for p in np.flatnonzero(rng.random(n) < 0.08):
                q[p] = (q[p] + 1) % 4
            a = np.concatenate([[0], q]).astype(np.uint8)
            b = np.concatenate([[0], s]).astype(np.uint8)
            so, ao1, bo1, _ = semi_gapped_align(
                a, b, n, n, MAT, 5, 2, 60, False, True
            )
            st, ao2, bo2, ops = semi_gapped_align(
                a, b, n, n, MAT, 5, 2, 60, False, False
            )
            assert (so, ao1, bo1) == (st, ao2, bo2)
            if ops:
                # re-scoring the alignment must reproduce the DP score
                # (A consumed by SUB+INS, B consumed by SUB+DEL)
                ac = sum(x for o, x in ops if o in (OP_SUB, OP_INS))
                bc = sum(x for o, x in ops if o in (OP_SUB, OP_DEL))
                got = rescore(
                    list(reversed(ops)), a, b, ao1 - ac + 1, bo1 - bc + 1,
                    5, 2,
                )
                assert got == st


class TestDynProgDrivers:
    def test_prelim_extension_recovers_match(self):
        rng = np.random.default_rng(3)
        s = rng.integers(0, 4, 400).astype(np.uint8)
        q = s[100:300].copy()
        res = dyn_prog_nt_gapped_alignment(
            q, s, MAT, 5, 2, 60, 100, 200
        )
        assert res.score == 400  # 200 matches * 2
        assert res.q_start == 0 and res.q_end == 200
        assert res.s_start == 100 and res.s_end == 300

    def test_traceback_extension(self):
        rng = np.random.default_rng(4)
        s = rng.integers(0, 4, 300).astype(np.uint8)
        q = s[50:250].copy()
        q[100] = (q[100] + 1) % 4
        res = gapped_alignment_with_traceback(
            q, s, MAT, 5, 2, 100, 20, 70
        )
        assert res.q_start == 0 and res.q_end == 200
        assert res.s_start == 50 and res.s_end == 250
        assert res.score == 199 * 2 - 3
        got = rescore(res.edit_script, q, s, res.q_start, res.s_start, 5, 2)
        assert got == res.score


class TestBlastnE2E:
    @pytest.fixture(scope="class")
    def setup(self):
        rng = np.random.default_rng(77)
        genome = "".join("ACGT"[i] for i in rng.integers(0, 4, 15000))
        db = SequenceDB.from_records(
            [FastaRecord("c1", "", genome)], title="blastn_db"
        )
        return genome, db

    def test_blastn_exact(self, setup):
        genome, db = setup
        q = genome[6000:6100]
        res = search([FastaRecord("q", "", q)], db, blastn_options())
        h = res.queries[0].hsplists[0].hsps[0]
        assert h.num_ident == 100
        assert h.score == 200
        assert (h.q_off, h.q_end) == (0, 100)
        assert (h.s_off, h.s_end) == (6000, 6100)

    def test_blastn_with_gap(self, setup):
        genome, db = setup
        q = genome[3000:3060] + genome[3062:3120]
        res = search([FastaRecord("qg", "", q)], db, blastn_options())
        assert res.queries[0].hsplists, "gapped blastn hit lost"
        h = res.queries[0].hsplists[0].hsps[0]
        # 118 matches*2 - (5 + 2*2) = 227, rounded down to even
        # (round_down for reward-2 systems, AdjustOddBlastnScores)
        assert h.score == 226
        assert h.num_ident == 118

    def test_blastn_short_word_sensitivity(self, setup):
        genome, db = setup
        # 30 bp exact: megablast word 28 barely catches, blastn word 11
        # catches robustly
        q = genome[9000:9030]
        res = search([FastaRecord("qs", "", q)], db, blastn_options())
        assert res.queries[0].hsplists
        h = res.queries[0].hsplists[0].hsps[0]
        assert h.num_ident == 30
