"""Multi-chip sharded seeding vs the single-buffer path (8-dev CPU mesh).

Covers the VERDICT-mandated equivalence edge cases: matches straddling
a shard core boundary (exact host escalation), capacity-overflow retry
on the sharded path, and the two-hit (window_size > 0) filter.
"""
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


def _run(mesh, qblock, lut, subject2, valid, x_drop=22, **kw):
    """run_sharded_seeding with a single subject + uniform X-drop."""
    n_ctx = len(qblock.contexts)
    ctx_off = np.full(
        65, np.iinfo(np.int32).max, np.int32
    )
    co = qblock.context_offsets()
    ctx_off[: n_ctx + 1] = co[: n_ctx + 1]
    xdrops = np.full(64, x_drop, np.int32)
    return run_sharded_seeding(
        mesh, subject2, valid, qblock.buffer,
        lut.counts_offsets,
        lut.positions if len(lut.positions) else np.zeros(1, np.int32),
        device_matrix16(1, -2),
        subject_starts=np.array([0], np.int64),
        subject_lengths=np.array([len(subject2)], np.int64),
        ctx_offsets=ctx_off, x_dropoffs=xdrops,
        scan_step=lut.scan_step, lut_word=lut.lut_word_size,
        word_size=lut.word_size, cmax=8, **kw,
    )


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
    q_off, s_off, ctx, uq, us, ulen, uscore = _run(
        mesh, qblock, lut, subject2, valid
    )
    assert len(q_off) > 0
    # the planted q1 match must produce a full-length ungapped hit
    assert uscore.max() >= 500  # 500 exact matches * reward 1
    # seed subject offsets must be globally consistent: every surviving
    # seed's subject word equals the query word at q_off
    for i in range(min(len(q_off), 200)):
        q0, s0 = int(q_off[i]), int(s_off[i])
        qw = qblock.buffer[q0: q0 + lut.word_size]
        sw = subject2[s0: s0 + lut.word_size]
        assert np.array_equal(qw.astype(int), sw.astype(int))


def test_sharded_capacity_overflow_retries(problem):
    """Tiny initial capacities must escalate (doubling retry) on the
    sharded path and still return the full seed set."""
    qblock, lut, subject2, valid = problem
    mesh = make_mesh(8)
    ref = _run(mesh, qblock, lut, subject2, valid)
    small = _run(
        mesh, qblock, lut, subject2, valid, hit_cap=32, seed_cap=32
    )

    def canon(out):
        q, s = out[0], out[1]
        order = np.lexsort((s, q))
        return [np.asarray(a)[order] for a in out]

    for a, b in zip(canon(ref), canon(small)):
        assert np.array_equal(a, b)


def _search_rows(queries, records, options):
    from gblastn_tpu.engine.search import search
    from gblastn_tpu.format.tabular import hsp_to_tabular
    from gblastn_tpu.io.seqdb import SequenceDB

    db = SequenceDB.from_records(records, title="distdb")
    res = search(queries, db, options)
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


def test_production_sharded_path_matches_single(monkeypatch):
    """GBLASTN_TPU_SHARDS routes prelim_search through the sharded
    seeding stage; whole-search output must equal the single-buffer
    path — including q4, planted to straddle the shard-2/3 core
    boundary (30000/8*2 = 7500), which exercises the exact host
    escalation of edge-truncated extensions."""
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
        # straddles global position 7500 (a shard core boundary at 8
        # shards over the 50 kb concatenated DB)
        FastaRecord("q4", "", chr1[6300:8700]),
    ]
    records = [FastaRecord("chr1", "", chr1), FastaRecord("chr2", "", chr2)]
    options = megablast_options(evalue=10.0)

    monkeypatch.delenv("GBLASTN_TPU_SHARDS", raising=False)
    single = _search_rows(queries, records, options)
    monkeypatch.setenv("GBLASTN_TPU_SHARDS", "8")
    sharded = _search_rows(queries, records, options)
    assert len(single) >= 5            # q1, q2, both q3 halves, q4
    assert sharded == single


def test_production_sharded_two_hit_matches_single(monkeypatch):
    """window_size > 0 (two-hit blastn) on the sharded path must equal
    the single-buffer path, including near a shard boundary."""
    from gblastn_tpu.params.options import blastn_options

    rng = np.random.default_rng(101)
    bases = "ACGT"
    genome = "".join(bases[i] for i in rng.integers(0, 4, 40000))
    # 40000/8 = 5000 core; plant matches across the 15000 boundary and
    # mid-shard, with 3% substitutions so two-hit admission matters
    def noisy(seg, seed):
        r = np.random.default_rng(seed)
        out = list(seg)
        for p in np.flatnonzero(r.random(len(seg)) < 0.03):
            out[p] = bases[(bases.index(out[p]) + 1) % 4]
        return "".join(out)

    queries = [
        FastaRecord("b1", "", noisy(genome[14200:15800], 1)),
        FastaRecord("b2", "", noisy(genome[22000:23000], 2)),
    ]
    records = [FastaRecord("g", "", genome)]
    options = blastn_options(evalue=10.0, window_size=40)

    monkeypatch.delenv("GBLASTN_TPU_SHARDS", raising=False)
    single = _search_rows(queries, records, options)
    monkeypatch.setenv("GBLASTN_TPU_SHARDS", "8")
    sharded = _search_rows(queries, records, options)
    assert len(single) >= 2
    assert sharded == single


def test_production_sharded_disc_matches_single(monkeypatch):
    """dc-megablast on the sharded path must equal the single-buffer
    path, including a diverged match straddling a shard boundary."""
    from gblastn_tpu.params.options import dc_megablast_options

    rng = np.random.default_rng(202)
    bases = "ACGT"
    genome = "".join(bases[i] for i in rng.integers(0, 4, 40000))

    def wobble(seg, seed):
        r = np.random.default_rng(seed)
        out = list(seg)
        for pp in range(2, len(out), 3):
            if r.random() < 0.4:
                out[pp] = bases[
                    (bases.index(out[pp]) + 1 + r.integers(0, 3)) % 4
                ]
        return "".join(out)

    queries = [
        FastaRecord("d1", "", wobble(genome[14700:15400], 1)),
        FastaRecord("d2", "", wobble(genome[30000:30500], 2)),
    ]
    records = [FastaRecord("g", "", genome)]
    options = dc_megablast_options(evalue=1e-3)

    monkeypatch.delenv("GBLASTN_TPU_SHARDS", raising=False)
    single = _search_rows(queries, records, options)
    monkeypatch.setenv("GBLASTN_TPU_SHARDS", "8")
    sharded = _search_rows(queries, records, options)
    assert len(single) >= 2
    assert sharded == single


def test_production_sharded_approx_gate_matches_single(monkeypatch):
    """The approximate-ungapped gate (s_NuclUngappedExtend demotions,
    na_ungapped.c:263) must run identically on the sharded path: a
    marginal lone 13-mer whose byte-quantized score stays below the
    reduced cutoff is dropped on both paths (the sharded driver forgot
    to forward approx_ctx once -- this pins the fix)."""
    from gblastn_tpu.params.options import blastn_options

    bases = "ACGT"
    for seed, expect_hits in ((4, 0), (0, 1)):
        rng = np.random.default_rng(seed)
        g = "".join(bases[i] for i in rng.integers(0, 4, 30000))
        q = "".join(bases[i] for i in rng.integers(0, 4, 500))
        pos = int(rng.integers(100, 29000))
        sub = g[:pos] + q[200:213] + g[pos:]   # lone exact 13-mer
        queries = [FastaRecord("q", "", q)]
        records = [FastaRecord("s", "", sub)]
        options = blastn_options(evalue=1.0, word_size=12, dust=False)

        monkeypatch.delenv("GBLASTN_TPU_SHARDS", raising=False)
        single = _search_rows(queries, records, options)
        monkeypatch.setenv("GBLASTN_TPU_SHARDS", "8")
        sharded = _search_rows(queries, records, options)
        assert len(single) == expect_hits      # oracle-pinned outcome
        assert sharded == single


def test_graft_entry_single_and_multichip():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    ge.dryrun_multichip(8)


def test_production_sharded_two_template_matches_single(monkeypatch):
    """coding_and_optimal (two-template) dc-megablast on the sharded
    path: both templates scan every shard and the raw hit sets merge
    before the diagonal replay, equal to the single-buffer path."""
    from gblastn_tpu.params.options import dc_megablast_options

    rng = np.random.default_rng(303)
    bases = "ACGT"
    genome = "".join(bases[i] for i in rng.integers(0, 4, 40000))

    def wobble(seg, seed):
        r = np.random.default_rng(seed)
        out = list(seg)
        for pp in range(2, len(out), 3):
            if r.random() < 0.4:
                out[pp] = bases[
                    (bases.index(out[pp]) + 1 + r.integers(0, 3)) % 4
                ]
        return "".join(out)

    queries = [
        FastaRecord("d1", "", wobble(genome[14700:15400], 1)),
        FastaRecord("d2", "", wobble(genome[30000:30500], 2)),
    ]
    records = [FastaRecord("g", "", genome)]
    options = dc_megablast_options(
        evalue=1e-3, template_type="coding_and_optimal",
    )

    monkeypatch.delenv("GBLASTN_TPU_SHARDS", raising=False)
    single = _search_rows(queries, records, options)
    monkeypatch.setenv("GBLASTN_TPU_SHARDS", "8")
    sharded = _search_rows(queries, records, options)
    assert len(single) >= 2
    assert sharded == single


def test_sharded_packed_residency_no_reupload(monkeypatch):
    """The sharded path's persistent device array is the 2-bit packed
    buffer, uploaded ONCE per (db, mesh) and reused across query
    batches (VERDICT round-4 item 4; reference: per-GPU cached device
    subject arrays, gpu_blastn_MB_and_smallNa.cu:63-152)."""
    from gblastn_tpu.engine.search import search
    from gblastn_tpu.io.seqdb import SequenceDB
    from gblastn_tpu.params.options import megablast_options

    rng = np.random.default_rng(5)
    bases = "ACGT"
    g = "".join(bases[i] for i in rng.integers(0, 4, 40000))
    db = SequenceDB.from_records([FastaRecord("g", "", g)], title="t")
    queries1 = [FastaRecord("a", "", g[3000:3400])]
    queries2 = [FastaRecord("b", "", g[11000:11500])]
    options = megablast_options(evalue=10.0)

    monkeypatch.setenv("GBLASTN_TPU_SHARDS", "8")
    r1 = search(queries1, db, options)
    cache = getattr(db, "_shard_device_cache", None)
    assert cache, "packed shard cache was not populated"
    (key, entry1) = next(iter(cache.items()))
    sub_dev_1 = entry1[0]

    # second batch: the SAME device array object must be reused (no
    # re-shard, no re-upload) and the search must still hit
    r2 = search(queries2, db, options)
    entry2 = db._shard_device_cache[key]
    assert entry2[0] is sub_dev_1, "packed shard array was re-uploaded"
    n1 = sum(len(hl.hsps) for q in r1.queries for hl in q.hsplists)
    n2 = sum(len(hl.hsps) for q in r2.queries for hl in q.hsplists)
    assert n1 >= 1 and n2 >= 1
