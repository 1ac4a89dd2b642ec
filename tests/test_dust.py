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
