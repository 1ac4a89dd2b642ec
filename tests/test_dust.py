"""Tests for the symmetric DUST masker and its soft-mask integration."""
from __future__ import annotations

import numpy as np
import pytest

from gblastn_tpu.engine.search import search
from gblastn_tpu.io.encoding import seq_to_blastna
from gblastn_tpu.io.fasta import FastaRecord
from gblastn_tpu.io.query import build_query_block
from gblastn_tpu.io.seqdb import SequenceDB
from gblastn_tpu.masking.dust import dust_mask, query_dust_masks
from gblastn_tpu.params.options import megablast_options


def mask(s: str, **kw):
    return dust_mask(seq_to_blastna(s), **kw)


class TestDustMask:
    def test_homopolymer_masked(self):
        s = "A" * 40
        out = mask(s)
        assert len(out) == 1
        a, b = out[0]
        assert a == 0 and b >= 38

    def test_dinucleotide_repeat_masked(self):
        s = "AT" * 30
        out = mask(s)
        assert out and out[0][0] == 0

    def test_random_not_masked(self):
        rng = np.random.default_rng(123)
        s = "".join("ACGT"[i] for i in rng.integers(0, 4, 200))
        assert mask(s) == []

    def test_repeat_inside_random(self):
        rng = np.random.default_rng(5)
        left = "".join("ACGT"[i] for i in rng.integers(0, 4, 100))
        right = "".join("ACGT"[i] for i in rng.integers(0, 4, 100))
        s = left + "CA" * 25 + right
        out = mask(s)
        assert len(out) == 1
        a, b = out[0]
        # masked interval centered on the repeat
        assert 90 <= a <= 105 and 143 <= b <= 155

    def test_linker_merges_nearby(self):
        rng = np.random.default_rng(9)
        mid = "".join("ACGT"[i] for i in rng.integers(0, 4, 2))
        s = "A" * 30 + mid + "T" * 30
        out = mask(s)
        # with linker=1 and a tiny gap the intervals may merge or abut
        assert out[0][0] == 0
        assert out[-1][1] >= 58

    def test_short_sequence_no_crash(self):
        assert mask("ACG") == []
        assert mask("") == []

    def test_minus_context_mirroring(self):
        rng = np.random.default_rng(31)
        rand = "".join("ACGT"[i] for i in rng.integers(0, 4, 60))
        q = rand + "AC" * 20 + rand[::-1]
        qb = build_query_block([FastaRecord("q", "", q)], "both")
        masks = query_dust_masks(qb)
        assert len(masks) == 2
        assert masks[0] and masks[1]
        # minus-strand mask mirrors the plus-strand one
        L = len(q)
        plus = masks[0][0]
        minus = masks[1][0]
        p_off = qb.contexts[0].offset
        m_off = qb.contexts[1].offset
        assert (minus[0] - m_off, minus[1] - m_off) == (
            L - 1 - (plus[1] - p_off), L - 1 - (plus[0] - p_off)
        )


class TestDustInSearch:
    def test_low_complexity_query_produces_no_seeds(self):
        rng = np.random.default_rng(44)
        genome = (
            "".join("ACGT"[i] for i in rng.integers(0, 4, 5000))
            + "AT" * 100
            + "".join("ACGT"[i] for i in rng.integers(0, 4, 5000))
        )
        db = SequenceDB.from_records([FastaRecord("g", "", genome)])
        # query entirely inside the AT repeat: dust masks it -> no hits
        q = "AT" * 40
        res = search([FastaRecord("q", "", q)], db, megablast_options())
        assert res.queries[0].hsplists == []
        # with dust off the repeat seeds and aligns
        res2 = search(
            [FastaRecord("q", "", q)], db, megablast_options(dust=False)
        )
        assert res2.queries[0].hsplists


class TestNativeParity:
    """native/dust.cpp vs the Python state machine, fuzzed."""

    def test_fuzz_native_vs_python(self):
        from gblastn_tpu.masking.dust import dust_mask
        from gblastn_tpu.native import native_available

        if not native_available():
            pytest.skip("native toolchain unavailable")
        rng = np.random.default_rng(99)
        for trial in range(40):
            n = int(rng.integers(4, 800))
            # mix random with planted low-complexity runs
            codes = rng.integers(0, 4, n).astype(np.uint8)
            for _ in range(int(rng.integers(0, 4))):
                p = int(rng.integers(0, n))
                ln = int(rng.integers(5, 60))
                kind = rng.integers(0, 3)
                if kind == 0:
                    codes[p: p + ln] = 0
                elif kind == 1:
                    seg = np.tile([0, 3], ln)[:ln]
                    codes[p: p + ln] = seg[: len(codes[p: p + ln])]
                else:
                    seg = np.tile([1, 1, 2], ln)[:ln]
                    codes[p: p + ln] = seg[: len(codes[p: p + ln])]
            got = dust_mask(codes, use_native=True)
            ref = dust_mask(codes, use_native=False)
            assert got == ref, f"trial {trial}: {got} != {ref}"

    def test_fuzz_ambiguity_codes(self):
        from gblastn_tpu.masking.dust import dust_mask
        from gblastn_tpu.native import native_available

        if not native_available():
            pytest.skip("native toolchain unavailable")
        rng = np.random.default_rng(5)
        for _ in range(10):
            n = int(rng.integers(10, 300))
            codes = rng.integers(0, 16, n).astype(np.uint8)
            assert dust_mask(codes, use_native=True) == dust_mask(
                codes, use_native=False)


class TestLcaseMasking:
    def test_lowercase_intervals(self):
        from gblastn_tpu.masking.lcase import lowercase_intervals

        assert lowercase_intervals(b"ACGTacgtACGT") == [(4, 7)]
        assert lowercase_intervals(b"acgtACGTacgt") == [(0, 3), (8, 11)]
        assert lowercase_intervals(b"ACGT") == []
        assert lowercase_intervals(b"acgt") == [(0, 3)]

    def test_lcase_masks_suppress_seeding(self):
        import numpy as np
        from gblastn_tpu.engine.search import search
        from gblastn_tpu.params.options import megablast_options

        rng = np.random.default_rng(8)
        genome = "".join("ACGT"[i] for i in rng.integers(0, 4, 20000))
        db = SequenceDB.from_records([FastaRecord("g", "", genome)])
        # query: unique region + a lowercase copy of another region
        q = genome[2000:2300] + genome[9000:9300].lower()
        rec = [FastaRecord("q", "", q)]
        plain = search(rec, db, megablast_options())
        spans = {(h.q_off, h.q_end)
                 for l in plain.queries[0].hsplists for h in l.hsps}
        assert any(b > 320 for _, b in spans)  # lowercase half aligns

        masked = search(rec, db, megablast_options(lcase_masking=True))
        spans = {(h.q_off, h.q_end)
                 for l in masked.queries[0].hsplists for h in l.hsps}
        assert spans and all(a < 300 for a, _ in spans)
