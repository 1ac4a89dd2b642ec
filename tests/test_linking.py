"""Even-gap sum-statistics linking and ungapped search mode."""
from __future__ import annotations

import math

import numpy as np
import pytest

from gblastn_tpu.engine.search import search
from gblastn_tpu.hits import HSP
from gblastn_tpu.io.fasta import FastaRecord
from gblastn_tpu.io.seqdb import SequenceDB
from gblastn_tpu.linking import (
    even_gap_link_hsps,
    gap_decay_divisor,
    large_gap_sum_e,
    small_gap_sum_e,
    sum_p,
)
from gblastn_tpu.params.options import blastn_options, megablast_options

BASES = "ACGT"


def rand_seq(rng, n):
    return "".join(BASES[i] for i in rng.integers(0, 4, n))


class TestSumStats:
    def test_sum_p_single(self):
        # r=1: P = 1 - exp(-exp(-s))
        for s in (-1.0, 0.0, 2.0, 8.0):
            assert sum_p(1, s) == pytest.approx(
                -math.expm1(-math.exp(-s)), rel=1e-12)

    def test_sum_p_table_range(self):
        # r=2..4 interpolation: monotone decreasing in s, within [0,1]
        for r in (2, 3, 4):
            prev = 1.1
            for s in np.linspace(-2 * r + 0.1, r * r + r - 1.5, 25):
                p = sum_p(r, float(s))
                assert 0.0 <= p <= 1.0
                assert p <= prev + 1e-9
                prev = p

    def test_sum_p_large_r_integration(self):
        p = sum_p(6, 5.0)
        assert 0.0 < p < 1.0

    def test_single_alignment_sum_e_matches_plain(self):
        # num=1: e = searchsp * exp(-xsum), both variants
        xsum = 30.0
        e1 = small_gap_sum_e(50, 1, xsum, 100, 1000, 10**6, 1.0)
        e2 = large_gap_sum_e(1, xsum, 100, 1000, 10**6, 1.0)
        want = 10**6 * math.exp(-xsum)
        assert e1 == pytest.approx(want)
        assert e2 == pytest.approx(want)

    def test_gap_decay_divisor(self):
        assert gap_decay_divisor(0.5, 1) == pytest.approx(0.5)
        assert gap_decay_divisor(0.5, 2) == pytest.approx(0.25)


class _CP:
    def __init__(self, qlen, searchsp, adj=0):
        self.query_length = qlen
        self.eff_searchsp = searchsp
        self.length_adjustment = adj


class _KBP:
    Lambda = 1.33
    logK = math.log(0.621)


class TestEvenGapLinking:
    def _link(self, hsps, cutoff=20):
        contexts = {0: _CP(1000, 10**7)}
        kbp = {0: _KBP()}
        return even_gap_link_hsps(
            hsps, kbp, contexts, 50000, cutoff_small_gap=cutoff)

    def test_colinear_pair_links(self):
        a = HSP(q_off=10, q_end=60, s_off=110, s_end=160, score=50)
        b = HSP(q_off=70, q_end=120, s_off=170, s_end=220, score=50)
        out = self._link([a, b])
        assert a.num == 2 and b.num == 2
        assert a.evalue == b.evalue
        # chained e-value beats the singleton e-value of either part
        single = 10**7 * math.exp(-(50 * _KBP.Lambda - _KBP.logK))
        assert a.evalue < single

    def test_far_apart_not_small_linked_but_large_linked(self):
        # colinear but 5 kb apart: small-gap ordering can't join them,
        # large-gap ordering can
        a = HSP(q_off=10, q_end=60, s_off=110, s_end=160, score=50)
        b = HSP(q_off=600, q_end=650, s_off=5700, s_end=5750, score=50)
        out = self._link([a, b])
        assert a.num == 2 and b.num == 2

    def test_non_colinear_never_link(self):
        # b starts before a's end in the subject: not chainable
        a = HSP(q_off=10, q_end=60, s_off=110, s_end=160, score=50)
        b = HSP(q_off=70, q_end=120, s_off=50, s_end=100, score=50)
        out = self._link([a, b])
        assert a.num == 1 and b.num == 1
        assert a.evalue > 0 and b.evalue > 0

    def test_different_contexts_never_link(self):
        contexts = {0: _CP(1000, 10**7), 1: _CP(1000, 10**7)}
        kbp = {0: _KBP(), 1: _KBP()}
        a = HSP(q_off=10, q_end=60, s_off=110, s_end=160, score=50,
                context=0)
        b = HSP(q_off=70, q_end=120, s_off=170, s_end=220, score=50,
                context=1)
        even_gap_link_hsps([a, b], kbp, contexts, 50000,
                           cutoff_small_gap=20)
        assert a.num == 1 and b.num == 1

    def test_three_chain(self):
        hs = [
            HSP(q_off=10 + 60 * i, q_end=50 + 60 * i,
                s_off=110 + 60 * i, s_end=150 + 60 * i, score=40)
            for i in range(3)
        ]
        self._link(hs)
        assert all(h.num == 3 for h in hs)
        assert len({h.evalue for h in hs}) == 1


class TestUngappedSearch:
    @pytest.fixture(scope="class")
    def setup(self):
        rng = np.random.default_rng(33)
        genome = rand_seq(rng, 30000)
        db = SequenceDB.from_records([FastaRecord("g", "", genome)])
        return rng, genome, db

    def test_exact_match_found_ungapped(self, setup):
        rng, genome, db = setup
        q = genome[9000:9400]
        res = search([FastaRecord("q", "", q)], db,
                     megablast_options(gapped=False))
        hsps = res.queries[0].hsplists[0].hsps
        assert hsps and hsps[0].num_ident == 400
        assert hsps[0].score == 400
        assert hsps[0].edit_script is None

    def test_split_match_links(self, setup):
        rng, genome, db = setup
        # query = two exact genome segments separated by 30 unrelated
        # bases: ungapped search produces two HSPs that link (num == 2)
        q = genome[3000:3120] + rand_seq(rng, 30) + genome[3150:3270]
        res = search([FastaRecord("q", "", q)], db,
                     blastn_options(gapped=False, dust=False))
        hsps = res.queries[0].hsplists[0].hsps
        big = [h for h in hsps if h.q_end - h.q_off >= 100]
        assert len(big) >= 2
        assert any(h.num >= 2 for h in big)

    def test_ambiguity_rescoring_trims(self, setup):
        rng, genome, db = setup
        # plant an N-run in the subject copy region: identities drop
        q = genome[15000:15200]
        rec = [FastaRecord("q", "", q)]
        res = search(rec, db, megablast_options(gapped=False))
        h = res.queries[0].hsplists[0].hsps[0]
        assert h.num_ident == 200
