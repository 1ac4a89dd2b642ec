"""Tests for best-hit and culling prelim filters."""
from __future__ import annotations

import numpy as np
import pytest

from gblastn_tpu.engine.search import search
from gblastn_tpu.hspfilters import dominate_test
from gblastn_tpu.io.fasta import FastaRecord
from gblastn_tpu.io.seqdb import SequenceDB
from gblastn_tpu.params.options import megablast_options


class TestDominateTest:
    def test_identical_drops_second(self):
        assert dominate_test(0, 100, 50, 0, 100, 50, True)
        assert not dominate_test(0, 100, 50, 0, 100, 50, False)

    def test_higher_score_dominates(self):
        assert dominate_test(0, 100, 80, 0, 100, 50, True)
        assert not dominate_test(0, 100, 50, 0, 100, 80, True)

    def test_no_overlap_no_domination(self):
        assert not dominate_test(0, 100, 80, 200, 300, 50, True)


@pytest.fixture(scope="module")
def multicopy():
    """Genome with one region duplicated into many subjects."""
    rng = np.random.default_rng(202)
    core = "".join("ACGT"[i] for i in rng.integers(0, 4, 600))
    recs = []
    for i in range(8):
        flank = "".join("ACGT"[j] for j in rng.integers(0, 4, 400))
        recs.append(FastaRecord(f"s{i}", "", flank + core))
    db = SequenceDB.from_records(recs)
    return db, core


def test_culling_limits_enveloped_hits(multicopy):
    db, core = multicopy
    q = core
    base = search(
        [FastaRecord("q", "", q)], db,
        megablast_options(max_target_seqs=20),
    )
    n_base = sum(len(l.hsps) for l in base.queries[0].hsplists)
    assert n_base == 8  # hits all copies
    culled = search(
        [FastaRecord("q", "", q)], db,
        megablast_options(max_target_seqs=20, culling_limit=2),
    )
    n_cull = sum(len(l.hsps) for l in culled.queries[0].hsplists)
    assert n_cull == 2


def test_best_hit_keeps_dominant(multicopy):
    db, core = multicopy
    q = core
    res = search(
        [FastaRecord("q", "", q)], db,
        megablast_options(
            max_target_seqs=20,
            best_hit_overhang=0.1, best_hit_score_edge=0.1,
        ),
    )
    n = sum(len(l.hsps) for l in res.queries[0].hsplists)
    # all 8 hits identical in score: none strictly dominates another
    # through the score-edge margin, so all survive
    assert n == 8


def test_best_hit_drops_worse(multicopy):
    db, core = multicopy
    # query = full core; one subject has the pristine core (high score),
    # the query also partially matches shorter degraded copies
    rng = np.random.default_rng(5)
    degraded = list(core)
    for p in np.flatnonzero(rng.random(len(core)) < 0.1):
        degraded[p] = "ACGT"[("ACGT".index(degraded[p]) + 1) % 4]
    recs = [
        FastaRecord("good", "", core),
        FastaRecord("bad", "", "".join(degraded)),
    ]
    db2 = SequenceDB.from_records(recs)
    plain = search(
        [FastaRecord("q", "", core)], db2,
        megablast_options(max_target_seqs=20),
    )
    n_plain = sum(len(l.hsps) for l in plain.queries[0].hsplists)
    filt = search(
        [FastaRecord("q", "", core)], db2,
        megablast_options(
            max_target_seqs=20,
            best_hit_overhang=0.1, best_hit_score_edge=0.1,
        ),
    )
    kept = [
        db2.ids[l.oid] for l in filt.queries[0].hsplists for _ in l.hsps
    ]
    assert "good" in kept
    n_filt = len(kept)
    assert n_filt <= n_plain
