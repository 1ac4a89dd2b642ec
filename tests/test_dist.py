"""Multi-chip sharded seeding vs the single-buffer path (8-dev CPU mesh)."""
from __future__ import annotations

import jax
import numpy as np
import pytest

from gblastn_tpu.engine.search import device_matrix16
from gblastn_tpu.io.fasta import FastaRecord
from gblastn_tpu.io.query import build_query_block
from gblastn_tpu.lut.builder import build_lookup_table, unmasked_locations
from gblastn_tpu.parallel.dist import (
    make_mesh,
    run_sharded_seeding,
    shard_subject,
)


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(11)
    bases = "ACGT"
    genome = "".join(bases[i] for i in rng.integers(0, 4, 50000))
    queries = [
        FastaRecord("q1", "", genome[4000:4500]),
        FastaRecord("q2", "", genome[30000:30400]),
    ]
    qblock = build_query_block(queries, "both")
    locations = unmasked_locations(qblock.buffer, qblock.context_offsets())
    lut = build_lookup_table(qblock.buffer, locations, 28, 11)
    from gblastn_tpu.io.encoding import seq_to_blastna

    subject2 = seq_to_blastna(genome).astype(np.int8)
    valid = np.ones(len(subject2), dtype=bool)
    return qblock, lut, subject2, valid


def test_shard_subject_layout():
    s = np.arange(1000, dtype=np.int8) % 4
    v = np.ones(1000, dtype=bool)
    sub, val, bases, core = shard_subject(s, v, 4, ctx=16)
    assert core == 250
    assert sub.shape == (4, 16 + 250 + 16)
    # shard 1 local position 16 is global 250
    assert bases[1] + 16 == 250
    assert sub[1, 16] == s[250]
    # shard 0 front context is invalid padding
    assert not val[0, :16].any()
    assert val[0, 16]


def test_sharded_matches_planted(problem):
    qblock, lut, subject2, valid = problem
    mesh = make_mesh(8)
    matrix16 = device_matrix16(1, -2)
    q_off, s_off, ok, uq, us, ulen, uscore = run_sharded_seeding(
        mesh, subject2, valid, qblock.buffer,
        lut.counts_offsets, lut.positions, matrix16, 22,
        scan_step=lut.scan_step, lut_word=lut.lut_word_size,
        word_size=lut.word_size, cmax=8,
    )
    ok = ok.astype(bool)
    assert ok.sum() > 0
    # the planted q1 match must produce a full-length ungapped hit
    got = uscore[ok]
    assert got.max() >= 500  # 500 exact matches * reward 1
    # seed subject offsets must be globally consistent: every surviving
    # seed's subject word equals the query word at q_off
    idx = np.flatnonzero(ok)[:200]
    for i in idx:
        q0, s0 = int(q_off[i]), int(s_off[i])
        qw = qblock.buffer[q0: q0 + lut.word_size]
        sw = subject2[s0: s0 + lut.word_size]
        assert np.array_equal(qw.astype(int), sw.astype(int))


def test_production_sharded_path_matches_single(monkeypatch):
    """GBLASTN_TPU_SHARDS routes prelim_search through the sharded
    seeding stage; whole-search output must equal the single-buffer
    path (matches here never straddle a shard core boundary)."""
    from gblastn_tpu.engine.search import search
    from gblastn_tpu.format.tabular import hsp_to_tabular
    from gblastn_tpu.io.seqdb import SequenceDB
    from gblastn_tpu.params.options import megablast_options

    rng = np.random.default_rng(77)
    bases = "ACGT"
    chr1 = "".join(bases[i] for i in rng.integers(0, 4, 30000))
    chr2 = "".join(bases[i] for i in rng.integers(0, 4, 20000))
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    queries = [
        FastaRecord("q1", "", chr1[4000:4350]),
        FastaRecord("q2", "", "".join(
            comp[c] for c in reversed(chr2[9000:9300]))),
        FastaRecord("q3", "", chr1[21000:21200] + chr2[500:700]),
    ]

    def run():
        db = SequenceDB.from_records(
            [FastaRecord("chr1", "", chr1), FastaRecord("chr2", "", chr2)],
            title="distdb",
        )
        res = search(queries, db, megablast_options(evalue=10.0))
        rows = []
        for qr in res.queries:
            qrec = queries[qr.query_index]
            for hl in qr.hsplists:
                sid = db.ids[hl.oid]
                for h in hl.hsps:
                    t = hsp_to_tabular(
                        h, qrec.seq_id, sid, len(qrec.sequence),
                        int(db.lengths[hl.oid]),
                    )
                    rows.append(tuple(vars(t).values()))
        return rows

    monkeypatch.delenv("GBLASTN_TPU_SHARDS", raising=False)
    single = run()
    monkeypatch.setenv("GBLASTN_TPU_SHARDS", "8")
    sharded = run()
    assert len(single) >= 4            # q1, q2, and both q3 halves
    assert sharded == single


def test_graft_entry_single_and_multichip():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    ge.dryrun_multichip(8)
