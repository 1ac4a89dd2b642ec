"""Pipelined search == sequential search, in output and order."""
from __future__ import annotations

import numpy as np
import pytest

from gblastn_tpu.engine.pipeline import run_pipelined_search
from gblastn_tpu.engine.search import search
from gblastn_tpu.io.fasta import FastaRecord
from gblastn_tpu.io.seqdb import SequenceDB
from gblastn_tpu.params.options import megablast_options


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(313)
    genome = "".join("ACGT"[i] for i in rng.integers(0, 4, 40000))
    db = SequenceDB.from_records([FastaRecord("c", "", genome)])
    batches = []
    for b in range(4):
        recs = []
        for i in range(3):
            start = 1000 + (b * 3 + i) * 2500
            recs.append(
                FastaRecord(f"q{b}_{i}", "", genome[start: start + 400])
            )
        batches.append(recs)
    return db, batches


def summarize(results):
    out = []
    for qres in results.queries:
        qid = results.qblock.ids[qres.query_index]
        for lst in qres.hsplists:
            for h in lst.hsps:
                out.append((qid, lst.oid, h.q_off, h.q_end, h.s_off,
                            h.s_end, h.score, round(h.evalue, 12)))
    return out


def test_pipeline_matches_sequential(setup):
    db, batches = setup
    opts = megablast_options(evalue=1e-6)

    seq = []
    for b in batches:
        seq.extend(summarize(search(b, db, opts)))

    piped = []
    n = run_pipelined_search(
        iter(batches), db, opts, lambda r: piped.extend(summarize(r)),
        trace_threads=2,
    )
    assert n == len(batches)
    assert piped == seq


def test_pipeline_propagates_errors(setup):
    db, batches = setup

    def bad_batches():
        yield batches[0]
        raise RuntimeError("reader exploded")

    with pytest.raises(RuntimeError, match="reader exploded"):
        run_pipelined_search(
            bad_batches(), db, megablast_options(), lambda r: None
        )
