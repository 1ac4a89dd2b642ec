"""Tests for HSP management (gblastn_tpu.hits)."""
from __future__ import annotations

import numpy as np
import pytest

from gblastn_tpu.hits import (
    HSP,
    HSPList,
    HitList,
    OP_DEL,
    OP_INS,
    OP_SUB,
    adjust_odd_scores,
    fuzzy_evalue_comp,
    get_bit_scores,
    get_evalues,
    hitlist_update,
    hsp_contained_in_saved,
    purge_common_endpoints,
    reap_by_evalue,
    sort_by_score,
)
from gblastn_tpu.stats.karlin import ungapped_karlin_block


def mk(q0, q1, s0, s1, score, ctx=0, es=None):
    return HSP(q0, q1, s0, s1, score, context=ctx, edit_script=es)


class TestSortOrders:
    def test_score_sort_total_order(self):
        # ScoreCompareHSPs: score desc, s_off asc, s_end desc,
        # q_off asc, q_end desc
        hsps = [
            mk(0, 10, 5, 15, 50),
            mk(0, 10, 0, 15, 90),
            mk(0, 10, 0, 20, 90),
            mk(3, 10, 0, 20, 90),
        ]
        sort_by_score(hsps)
        assert [h.score for h in hsps] == [90, 90, 90, 50]
        assert hsps[0].s_end == 20 and hsps[0].q_off == 0
        assert hsps[1].s_end == 20 and hsps[1].q_off == 3

    def test_fuzzy_evalue(self):
        assert fuzzy_evalue_comp(1e-5, 1e-5 * (1 + 1e-8)) == 0
        assert fuzzy_evalue_comp(1e-5, 2e-5) == -1
        assert fuzzy_evalue_comp(2e-5, 1e-5) == 1


class TestEvalues:
    def test_evalue_and_reap(self):
        kbp = ungapped_karlin_block(1, -2)
        lst = HSPList(oid=0, hsps=[mk(0, 100, 0, 100, 100),
                                   mk(0, 20, 0, 20, 12)])
        get_evalues(lst, kbp, {0: 10_000_000})
        assert lst.hsps[0].evalue < 1e-20
        assert lst.hsps[1].evalue > 0.1
        assert lst.best_evalue == lst.hsps[0].evalue
        reap_by_evalue(lst, 10.0)
        # keeps both if second is under 10, otherwise only first
        assert len(lst.hsps) >= 1
        get_bit_scores(lst, kbp)
        assert lst.hsps[0].bit_score > 0

    def test_adjust_odd(self):
        hsps = [mk(0, 10, 0, 10, 91), mk(0, 10, 0, 10, 90)]
        adjust_odd_scores(hsps, round_down=True)
        assert all(h.score % 2 == 0 for h in hsps)


class TestContainment:
    def test_contained(self):
        saved = [mk(10, 110, 10, 110, 200)]
        # candidate entirely inside the saved box, on a nearby diagonal
        assert hsp_contained_in_saved(saved, 20, 60, 21, 61, 50, 0, 6)
        # diagonal too far away
        assert not hsp_contained_in_saved(saved, 20, 60, 40, 80, 50, 0, 6)
        # higher score never contained
        assert not hsp_contained_in_saved(saved, 20, 60, 21, 61, 300, 0, 6)
        # different context
        assert not hsp_contained_in_saved(saved, 20, 60, 21, 61, 50, 1, 6)
        # min_diag_separation 0: containment alone suffices
        assert hsp_contained_in_saved(saved, 20, 60, 40, 80, 50, 0, 0)


class TestPurgeCommonEndpoints:
    def test_purge_removes_common_start(self):
        h1 = mk(0, 100, 0, 100, 90)
        h2 = mk(0, 50, 0, 50, 40)
        out = purge_common_endpoints([h1, h2], purge=True)
        assert out == [h1]

    def test_purge_removes_common_end(self):
        h1 = mk(0, 100, 0, 100, 90)
        h2 = mk(50, 100, 50, 100, 40)
        out = purge_common_endpoints([h1, h2], purge=True)
        assert out == [h1]

    def test_keep_mode_cuts_longer_hsp(self):
        # blastn mode: the longer, lower-scoring duplicate is cut back
        h1 = mk(0, 50, 0, 50, 90, es=[(OP_SUB, 50)])
        h2 = mk(0, 80, 0, 80, 60, es=[(OP_SUB, 80)])
        out = purge_common_endpoints([h1, h2], purge=False)
        assert len(out) == 2
        cut = [h for h in out if h is h2][0]
        assert cut.q_off == 50 and cut.s_off == 50
        assert cut.edit_script == [(OP_SUB, 30)]

    def test_cut_with_gaps(self):
        # h2 shares the start point with higher-scoring h1 and extends
        # further; it is cut just past h1's end, walking its gapped
        # script: S:10 D:2 S:10 cut at (q>=15, s>=15) -> qid=15, sid=17
        h1 = mk(0, 15, 0, 15, 90, es=[(OP_SUB, 15)])
        h2 = mk(0, 20, 0, 22, 50,
                es=[(OP_SUB, 10), (OP_DEL, 2), (OP_SUB, 10)])
        out = purge_common_endpoints([h1, h2], purge=False)
        cut = [h for h in out if h is h2]
        assert cut and cut[0].q_off == 15 and cut[0].s_off == 17
        assert cut[0].edit_script == [(OP_SUB, 5)]
        assert cut[0].q_end == 20 and cut[0].s_end == 22

    def test_different_contexts_not_purged(self):
        h1 = mk(0, 100, 0, 100, 90, ctx=0)
        h2 = mk(0, 100, 0, 100, 40, ctx=1)
        out = purge_common_endpoints([h1, h2], purge=True)
        assert len(out) == 2


class TestHitList:
    def test_hitlist_size_enforced(self):
        hl = HitList(hitlist_size=2)
        for oid, ev in [(0, 1e-10), (1, 1e-5), (2, 1e-20)]:
            lst = HSPList(oid=oid, hsps=[mk(0, 10, 0, 10, 50)])
            lst.hsps[0].evalue = ev
            hitlist_update(hl, lst)
        assert len(hl.hsplists) == 2
        oids = {l.oid for l in hl.hsplists}
        assert oids == {0, 2}


class TestContainmentIndex:
    """ContainmentIndex (interval tree) vs the flat-scan reference."""

    @pytest.mark.parametrize("sep", [0, 6])
    def test_fuzz_matches_flat_scan(self, sep):
        from gblastn_tpu.hits import ContainmentIndex, hsp_contained_in_saved

        rng = np.random.default_rng(99)
        for span in (1000, 100000):
            saved = []
            index = ContainmentIndex(sep, q_span=span)
            for trial in range(300):
                q0 = int(rng.integers(0, span - 200))
                s0 = int(rng.integers(0, span - 200))
                ln = int(rng.integers(10, 200))
                sc = int(rng.integers(10, 100))
                ctx = int(rng.integers(0, 3))
                got = index.contains(q0, q0 + ln, s0, s0 + ln, sc, ctx)
                want = hsp_contained_in_saved(
                    saved, q0, q0 + ln, s0, s0 + ln, sc, ctx, sep,
                )
                assert got == want, (span, trial)
                if not got:
                    h = HSP(q_off=q0, q_end=q0 + ln, s_off=s0,
                            s_end=s0 + ln, score=sc, context=ctx)
                    saved.append(h)
                    index.add(h)

    def test_nested_containment(self):
        from gblastn_tpu.hits import ContainmentIndex

        index = ContainmentIndex(0, q_span=10000)
        big = HSP(q_off=100, q_end=900, s_off=100, s_end=900,
                  score=500, context=0)
        index.add(big)
        assert index.contains(200, 300, 200, 300, 50, 0)
        assert not index.contains(200, 300, 200, 300, 50, 1)  # other ctx
        assert not index.contains(200, 300, 200, 300, 501, 0)  # higher score
        assert not index.contains(50, 300, 200, 300, 50, 0)    # q not inside
