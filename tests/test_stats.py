"""Stats layer tests.

Oracle values are the published NCBI BLAST Karlin-Altschul parameters
(these are the values NCBI prints in report footers for the corresponding
scoring systems) plus internal-consistency checks of the defining equations.
"""
import math

import numpy as np
import pytest

from gblastn_tpu.stats import karlin
from gblastn_tpu.stats.evalue import (
    bit_score,
    blast_cutoffs,
    compute_length_adjustment,
    effective_search_space,
    karlin_etos,
    karlin_stoe,
)
from gblastn_tpu.stats.karlin import (
    nucl_score_matrix,
    score_frequencies,
    std_nucl_freqs,
    ungapped_karlin_block,
)
from gblastn_tpu.stats.tables import (
    UnsupportedScoringError,
    gapped_karlin_block,
    nucl_alpha_beta,
)


class TestScoreMatrix:
    def test_acgt_block(self):
        m = nucl_score_matrix(1, -2)
        for i in range(4):
            for j in range(4):
                assert m[i, j] == (1 if i == j else -2)

    def test_ambiguity_scores(self):
        # N (code 14) vs base: degeneracy 4 -> nint((3*p + r)/4)
        m = nucl_score_matrix(1, -2)
        assert m[14, 0] == -1  # (-6+1)/4 = -1.25 -> -1 (round half away, trunc)
        m = nucl_score_matrix(2, -3)
        assert m[14, 0] == round(-7 / 4) or m[14, 0] == -2  # -1.75 -> -2

    def test_sentinel(self):
        m = nucl_score_matrix(1, -2)
        assert m[15, 0] < -(10**8)


class TestUngappedKarlin:
    @pytest.mark.parametrize(
        "reward,penalty,exp_lambda,exp_k,exp_h",
        [
            # Published NCBI ungapped blastn values (report footers).
            (1, -2, 1.33, 0.621, 1.12),
            (1, -3, 1.37, 0.711, 1.31),
            # 2/-3: lambda verified by independent bisection of the
            # defining equation (0.25*e^{2l} + 0.75*e^{-3l} = 1).
            (2, -3, 0.6337, 0.408, 0.912),
            (1, -1, 1.10, 0.333, 0.549),  # closed-form K case
        ],
    )
    def test_published_values(self, reward, penalty, exp_lambda, exp_k, exp_h):
        kbp = ungapped_karlin_block(reward, penalty)
        assert kbp.Lambda == pytest.approx(exp_lambda, rel=0.01)
        assert kbp.K == pytest.approx(exp_k, rel=0.02)
        assert kbp.H == pytest.approx(exp_h, rel=0.02)

    @pytest.mark.parametrize("reward,penalty", [(1, -2), (1, -3), (2, -3), (1, -4), (2, -5), (1, -1), (4, -5)])
    def test_lambda_equation(self, reward, penalty):
        """lambda satisfies sum p_i exp(lambda*s_i) = 1."""
        kbp = ungapped_karlin_block(reward, penalty)
        m = nucl_score_matrix(reward, penalty)
        sprob, lo_obs, hi_obs, _ = score_frequencies(
            m, std_nucl_freqs(), std_nucl_freqs()
        )
        lo, _ = karlin._matrix_score_range(m)
        total = sum(
            sprob[s - lo] * math.exp(kbp.Lambda * s)
            for s in range(lo_obs, hi_obs + 1)
        )
        assert total == pytest.approx(1.0, abs=1e-5)

    def test_h_positive(self):
        kbp = ungapped_karlin_block(1, -2)
        assert 0 < kbp.H < 2.0


class TestGappedTables:
    def test_megablast_linear(self):
        kbp, round_down = gapped_karlin_block(1, -2, 0, 0)
        assert (kbp.Lambda, kbp.K, kbp.H) == (1.28, 0.46, 0.85)
        assert round_down is False

    def test_blastn_default(self):
        kbp, round_down = gapped_karlin_block(2, -3, 5, 2)
        assert (kbp.Lambda, kbp.K, kbp.H) == (0.625, 0.41, 0.78)
        assert round_down is True

    def test_gcd_scaling(self):
        # (2, -4) reduces to (1, -2); lambda halves, gap costs double.
        kbp, _ = gapped_karlin_block(2, -4, 0, 0)
        assert kbp.Lambda == pytest.approx(1.28 / 2)
        kbp2, _ = gapped_karlin_block(2, -4, 4, 4)  # row (2,2) doubled
        assert kbp2.Lambda == pytest.approx(1.33 / 2)

    def test_infinite_gap_costs_use_ungapped(self):
        kbp_u = ungapped_karlin_block(1, -2)
        kbp, _ = gapped_karlin_block(1, -2, 100, 100)
        assert kbp.Lambda == kbp_u.Lambda

    def test_unsupported(self):
        with pytest.raises(UnsupportedScoringError):
            gapped_karlin_block(7, -11, 0, 0)
        with pytest.raises(UnsupportedScoringError):
            gapped_karlin_block(1, -2, 0, 1)  # below-max unsupported combo

    def test_alpha_beta(self):
        a, b = nucl_alpha_beta(1, -2, 0, 0, gapped=True)
        assert (a, b) == (1.5, -2)
        a, b = nucl_alpha_beta(2, -3, 5, 2, gapped=True)
        assert (a, b) == (0.8, -2)
        # ungapped: lambda/H and special beta
        kbp = ungapped_karlin_block(1, -1)
        a, b = nucl_alpha_beta(1, -1, 0, 0, gapped=False)
        assert a == pytest.approx(kbp.Lambda / kbp.H)
        assert b == -2


class TestEvalues:
    def test_stoe_etos_roundtrip(self):
        kbp, _ = gapped_karlin_block(1, -2, 0, 0)
        searchsp = 10**9
        s = karlin_etos(1e-5, kbp, searchsp)
        e = karlin_stoe(s, kbp, searchsp)
        assert e <= 1e-5
        assert karlin_stoe(s - 1, kbp, searchsp) > 1e-5

    def test_bit_score(self):
        kbp, _ = gapped_karlin_block(1, -2, 0, 0)
        # 100% identity 100-mer under megablast scoring: raw 100
        bs = bit_score(100, kbp)
        assert bs == pytest.approx((100 * 1.28 - math.log(0.46)) / math.log(2))

    def test_cutoffs(self):
        kbp, _ = gapped_karlin_block(1, -2, 0, 0)
        s, e = blast_cutoffs(1, 10.0, kbp, 10**9)
        assert s > 1
        assert karlin_stoe(s, kbp, 10**9) <= 10.0

    def test_length_adjustment_converges(self):
        kbp, _ = gapped_karlin_block(1, -2, 0, 0)
        la = compute_length_adjustment(
            kbp.K, kbp.logK, 1.5 / kbp.Lambda, -2.0, 1000, 4_641_652, 1
        )
        assert 0 < la < 1000
        eff = effective_search_space(kbp, 1.5, -2.0, 1000, 4_641_652, 1)
        assert eff.eff_searchsp == (4_641_652 - eff.length_adjustment) * (
            1000 - eff.length_adjustment
        )


class TestDerivedParams:
    def test_megablast_defaults(self):
        from gblastn_tpu.params.derived import derive_params
        from gblastn_tpu.params.options import megablast_options

        p = derive_params(megablast_options(), [1000, 1000], 4_641_652, 1)
        assert p.round_down is False
        assert len(p.contexts) == 2
        ctx = p.contexts[0]
        assert ctx.cutoff_score > 0
        # gap trigger: (27*ln2 + logK)/lambda with ungapped 1/-2 params
        kbp_u = ungapped_karlin_block(1, -2)
        expected_trigger = int(
            (27.0 * math.log(2) + kbp_u.logK) / kbp_u.Lambda
        )
        assert ctx.word_cutoff_score == min(expected_trigger, ctx.cutoff_score_max)
        # ungapped x-drop: ceil(20*ln2/lambda_ungap)
        assert ctx.x_dropoff_ungapped == math.ceil(20 * math.log(2) / kbp_u.Lambda)
        # greedy gapped x-drop: (25*ln2/1.28)
        assert p.gap_x_dropoff == int(25 * math.log(2) / 1.28)

    def test_blastn_round_down(self):
        from gblastn_tpu.params.derived import derive_params
        from gblastn_tpu.params.options import blastn_options

        p = derive_params(blastn_options(), [500], 10**6, 10)
        assert p.round_down is True

    def test_score_table_packed(self):
        from gblastn_tpu.params.derived import nucl_score_table_packed

        t = nucl_score_table_packed(1, -2)
        assert t[0] == 4            # 4 matches
        assert t[0b11000000] == 1   # one mismatch in high group
        assert t[255] == -8
