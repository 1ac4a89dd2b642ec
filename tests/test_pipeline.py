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


def test_pipelined_equals_sequential_dc_megablast(tmp_path):
    """Pipelined mode must be output-identical for dc-megablast too
    (two-hit window + DP extension through the worker handoff)."""
    import numpy as np

    from gblastn_tpu.engine.pipeline import run_pipelined_search
    from gblastn_tpu.engine.search import search
    from gblastn_tpu.io.fasta import FastaRecord
    from gblastn_tpu.io.seqdb import SequenceDB
    from gblastn_tpu.params.options import dc_megablast_options

    rng = np.random.default_rng(61)
    B = "ACGT"
    genome = "".join(B[i] for i in rng.integers(0, 4, 20000))
    batches = []
    for k in range(3):
        recs = []
        for i in range(4):
            start = int(rng.integers(0, len(genome) - 500))
            frag = list(genome[start: start + 400])
            for pp in range(2, len(frag), 3):
                if rng.random() < 0.35:
                    frag[pp] = B[(B.index(frag[pp]) + 1
                                  + int(rng.integers(0, 3))) % 4]
            recs.append(FastaRecord(f"b{k}q{i}", "", "".join(frag)))
        batches.append(recs)
    db = SequenceDB.from_records(
        [FastaRecord("g", "", genome)], title="t"
    )
    options = dc_megablast_options(evalue=1e-3)

    def rows(results):
        out = []
        for q in results.queries:
            for lst in q.hsplists:
                for h in lst.hsps:
                    out.append((
                        results.qblock.ids[q.query_index], lst.oid,
                        h.q_off, h.q_end, h.s_off, h.s_end, h.score,
                    ))
        return out

    seq_rows = []
    for b in batches:
        seq_rows.extend(rows(search(b, db, options)))
    pipe_rows = []
    run_pipelined_search(
        iter(batches), db, options,
        lambda res: pipe_rows.extend(rows(res)), trace_threads=2,
    )
    assert seq_rows and pipe_rows == seq_rows
