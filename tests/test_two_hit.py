"""Two-hit initial word filter (window_size > 0)."""
from __future__ import annotations

import numpy as np
import pytest

from gblastn_tpu.engine.search import search
from gblastn_tpu.engine.seeding import (
    compute_right_runs,
    two_hit_diag_filter,
)
from gblastn_tpu.io.fasta import FastaRecord
from gblastn_tpu.io.seqdb import SequenceDB
from gblastn_tpu.params.options import blastn_options

BASES = "ACGT"


def rand_seq(rng, n):
    return "".join(BASES[i] for i in rng.integers(0, 4, n))


class TestRightRuns:
    def test_run_lengths(self):
        rng = np.random.default_rng(2)
        sub = rng.integers(0, 4, 200).astype(np.int8)
        q = np.concatenate([
            np.full(1, 15, np.uint8),
            sub[50:80].astype(np.uint8),      # 30 exact bases at q 1
            np.full(1, 15, np.uint8),
        ])
        valid = np.ones(200, bool)
        # seed of word 11 at q=1/s=50: run beyond word end = 30-11=19
        # capped at word_size 11
        runs = compute_right_runs(
            q, sub, valid, np.array([1]), np.array([50]), 11)
        assert runs[0] == 11
        # word 28 at same spot: remaining exact = 2
        runs = compute_right_runs(
            q, sub, valid, np.array([1]), np.array([50]), 28)
        assert runs[0] == 2

    def test_sentinel_stops_run(self):
        sub = np.zeros(100, np.int8)          # all A
        q = np.concatenate([
            np.zeros(15, np.uint8), np.full(1, 15, np.uint8),
            np.zeros(10, np.uint8),
        ])
        valid = np.ones(100, bool)
        # word 11 at q=0: only 4 more As before the sentinel
        runs = compute_right_runs(
            q, sub, valid, np.array([0]), np.array([10]), 11)
        assert runs[0] == 4


class TestTwoHitReplay:
    W = 11

    def filt(self, seeds, window=40, scores=None, runs=None):
        q = np.array([a for a, _ in seeds], np.int32)
        s = np.array([b for _, b in seeds], np.int32)
        n = len(seeds)
        oid = np.zeros(n, np.int32)
        sc = np.array(scores if scores is not None else [100] * n,
                      np.int32)
        rr = np.array(runs if runs is not None else [0] * n, np.int32)
        return two_hit_diag_filter(
            q, s, oid, self.W, window,
            s, np.full(n, 30, np.int32), sc,
            np.full(n, 20, np.int32), rr,
        )

    def test_single_hit_not_extended(self):
        assert not self.filt([(5, 100)]).any()

    def test_second_hit_in_window_extended(self):
        # same diagonal, 20 apart, window 40: second hit extends
        got = self.filt([(5, 100), (25, 120)])
        assert list(got) == [False, True]

    def test_second_hit_outside_window(self):
        got = self.filt([(5, 100), (80, 175)])
        assert list(got) == [False, False]

    def test_double_word_extends_immediately(self):
        got = self.filt([(5, 100)], runs=[self.W])
        assert list(got) == [True]

    def test_different_diagonals_do_not_pair(self):
        got = self.filt([(5, 100), (20, 121)])  # diag 95 vs 101
        assert list(got) == [False, False]

    def test_below_cutoff_second_hit_not_saved(self):
        got = self.filt([(5, 100), (25, 120)], scores=[100, 10])
        assert list(got) == [False, False]


@pytest.mark.parametrize("window", [0, 40])
def test_search_two_hit_e2e(window):
    """blastn with window_size 40: a region with a single isolated seed
    (one exact 11-mer, rest mutated every ~8 bases) yields no alignment,
    while a long exact region (double word) still aligns."""
    rng = np.random.default_rng(17)
    genome = rand_seq(rng, 12000)
    db = SequenceDB.from_records([FastaRecord("g", "", genome)])
    q = genome[4000:4300]
    res = search(
        [FastaRecord("q", "", q)], db,
        blastn_options(window_size=window, dust=False),
    )
    # 300 exact bases: double words exist, found under both modes
    hsps = res.queries[0].hsplists[0].hsps
    assert hsps and hsps[0].num_ident == 300
