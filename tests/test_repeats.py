"""Repeats-database query filtering (-filtering_db)."""
from __future__ import annotations

import numpy as np
import pytest

from gblastn_tpu.engine.search import search
from gblastn_tpu.io.fasta import FastaRecord
from gblastn_tpu.io.seqdb import SequenceDB
from gblastn_tpu.masking.repeats import (
    combine_intervals,
    find_repeat_masks,
    repeats_search_options,
)
from gblastn_tpu.params.options import megablast_options

BASES = "ACGT"


def rand_seq(rng, n):
    return "".join(BASES[i] for i in rng.integers(0, 4, n))


def revcomp(s):
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    return "".join(comp[c] for c in reversed(s))


def test_combine_intervals_link_rule():
    # blast_filter.c:995: merge when right + 5 > next_left (inclusive)
    assert combine_intervals([(0, 10), (14, 20)]) == [(0, 20)]
    assert combine_intervals([(0, 10), (15, 20)]) == [(0, 10), (15, 20)]
    assert combine_intervals([(5, 8), (0, 10), (9, 12)]) == [(0, 12)]
    assert combine_intervals([]) == []


def test_repeat_options_constants():
    o = repeats_search_options()
    assert (o.reward, o.penalty) == (1, -1)
    assert (o.gap_open, o.gap_extend) == (2, 1)
    assert o.word_size == 11
    assert o.cutoff_score == 26
    assert o.dust is False


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(21)
    repeat_elem = rand_seq(rng, 300)
    genome_core = rand_seq(rng, 20000)
    # subject genome also contains the repeat, so an unfiltered search
    # WOULD align the query's repeat copy to it
    genome = genome_core[:8000] + repeat_elem + genome_core[8000:]
    db = SequenceDB.from_records(
        [FastaRecord("chr1", "", genome)], title="main"
    )
    repeat_db = SequenceDB.from_records(
        [FastaRecord("rep1", "a repeat element", repeat_elem)],
        title="repeats",
    )
    return repeat_elem, genome_core, genome, db, repeat_db


def test_find_repeat_masks_plus_and_minus(setup):
    repeat_elem, genome_core, genome, db, repeat_db = setup
    rng = np.random.default_rng(4)
    q_plus = rand_seq(rng, 150) + repeat_elem + rand_seq(rng, 150)
    q_minus = rand_seq(rng, 100) + revcomp(repeat_elem) + rand_seq(rng, 100)
    masks = find_repeat_masks(
        [FastaRecord("qp", "", q_plus), FastaRecord("qm", "", q_minus)],
        repeat_db,
    )
    (a, b), = masks[0]
    assert a == 150 and b == 150 + 300 - 1
    (a, b), = masks[1]
    assert a == 100 and b == 100 + 300 - 1


def test_filtering_db_masks_search(setup, tmp_path):
    repeat_elem, genome_core, genome, db, repeat_db = setup
    repeat_db.save(tmp_path / "repdb")
    rng = np.random.default_rng(7)
    # query: unique flank matching the genome + embedded repeat copy
    q = genome_core[3000:3400] + repeat_elem
    rec = [FastaRecord("q1", "", q)]

    plain = search(rec, db, megablast_options())
    spans_plain = {
        (h.q_off, h.q_end)
        for lst in plain.queries[0].hsplists for h in lst.hsps
    }
    # unfiltered: some alignment covers the repeat part (q_off >= 400)
    assert any(b > 420 for _, b in spans_plain)

    filt = search(
        rec, db, megablast_options(filtering_db=str(tmp_path / "repdb"))
    )
    spans = {
        (h.q_off, h.q_end)
        for lst in filt.queries[0].hsplists for h in lst.hsps
    }
    assert spans  # the unique flank still aligns
    # masking is seed-level (mask-at-hash): no alignment may START in
    # the repeat region, and the flank alignment must survive
    assert any(a < 400 for a, _ in spans)
    assert all(a < 400 for a, _ in spans)
