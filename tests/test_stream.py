"""Subject block streaming (engine.stream) vs the device-resident path.

The contract: streamed seeding over many small blocks produces exactly
the same InitHits (and final search output) as the single-buffer path,
including seeds whose extensions cross block boundaries (host exact
escalation) and the two-hit window path.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from gblastn_tpu.engine.seeding import (
    SeedingDeviceData,
    compute_right_runs,
    run_seeding,
)
from gblastn_tpu.engine.stream import (
    compute_right_runs_packed,
    run_seeding_streamed,
    ungapped_extend_host,
    unpack_range,
)
from gblastn_tpu.io.fasta import FastaRecord
from gblastn_tpu.io.query import build_query_block
from gblastn_tpu.io.seqdb import SequenceDB
from gblastn_tpu.lut.builder import build_lookup_table, unmasked_locations
from gblastn_tpu.ops.seeding import ungapped_extend


def _rand_seq(rng, n):
    return "".join("ACGT"[i] for i in rng.integers(0, 4, n))


def _mutate(rng, s, rate):
    out = list(s)
    for i in range(len(out)):
        if rng.random() < rate:
            out[i] = "ACGT"[rng.integers(0, 4)]
    return "".join(out)


def _matrix16(reward, penalty):
    from gblastn_tpu.engine.search import device_matrix16

    return device_matrix16(reward, penalty)


def _setup(rng, query_seqs, subject_seqs, word_size, lut_word):
    qb = build_query_block(
        [FastaRecord(f"q{i}", "", s.encode())
         for i, s in enumerate(query_seqs)],
        strand="both",
    )
    db = SequenceDB.from_records(
        [FastaRecord(f"s{i}", "", s.encode())
         for i, s in enumerate(subject_seqs)]
    )
    locs = unmasked_locations(qb.buffer, qb.context_offsets())
    lut = build_lookup_table(qb.buffer, locs, word_size, lut_word)
    return qb, db, lut


@pytest.fixture(scope="module")
def problem():
    """Multi-subject DB sized to span many 1kb blocks, with matches
    planted ON block boundaries (long perfect runs crossing them)."""
    rng = np.random.default_rng(42)
    q1 = _rand_seq(rng, 800)
    q2 = _rand_seq(rng, 500)
    s1 = _rand_seq(rng, 3000)
    # perfect 700bp match crossing the 4096 block boundary (subject s2
    # occupies [3072, ...) in padded space: plant at local 700 so the
    # match covers padded positions ~3772..4472)
    s2 = _rand_seq(rng, 700) + q1[:700] + _rand_seq(rng, 2500)
    # mutated match entirely inside a later block
    s3 = _rand_seq(rng, 1000) + _mutate(rng, q2, 0.04) + _rand_seq(rng, 900)
    # short subject + another crossing match for strand minus
    s4 = _rand_seq(rng, 150)
    return [q1, q2], [s1, s2, s3, s4]


def _run_both(problem, word_size, lut_word, reward, penalty,
              cutoff, xdrop, window_size=0, block_bases=4096, halo=512):
    qs, ss = problem
    rng = np.random.default_rng(0)
    qb, db, lut = _setup(rng, qs, ss, word_size, lut_word)
    mat = _matrix16(reward, penalty)
    ctx_offs = qb.context_offsets()
    n_ctx = len(qb.contexts)
    cutoffs = np.full(n_ctx, cutoff, np.int32)
    xdrops = np.full(n_ctx, xdrop, np.int32)
    sub2 = db.unpacked().astype(np.int8)
    valid = db.valid_mask()

    dev = SeedingDeviceData(
        query=jnp.asarray(qb.buffer),
        subject2=jnp.asarray(sub2),
        subject_valid=jnp.asarray(valid),
        lut_offsets=jnp.asarray(lut.counts_offsets),
        lut_positions=jnp.asarray(lut.positions),
        matrix16=jnp.asarray(mat),
    )
    if window_size > 0:
        dev.host_query = np.asarray(qb.buffer)
        dev.host_subject2 = sub2
        dev.host_valid = valid
    ref = run_seeding(
        dev, word_size=word_size, lut_word=lut.lut_word_size,
        scan_step=lut.scan_step, subject_starts=np.asarray(db.starts),
        subject_lengths=np.asarray(db.lengths),
        context_offsets=ctx_offs, word_cutoffs=cutoffs,
        x_dropoffs=xdrops, window_size=window_size,
    )
    got = run_seeding_streamed(
        db,
        query_dev=jnp.asarray(qb.buffer),
        query_host=np.asarray(qb.buffer),
        lut_offsets_dev=jnp.asarray(lut.counts_offsets),
        lut_positions_dev=jnp.asarray(lut.positions),
        matrix16=mat,
        context_offsets=ctx_offs,
        word_cutoffs=cutoffs,
        x_dropoffs=xdrops,
        word_size=word_size,
        lut_word=lut.lut_word_size,
        scan_step=lut.scan_step,
        cmax=16,
        window_size=window_size,
        block_bases=block_bases,
        halo=halo,
        use_pallas=False,
    )
    return ref, got


def _as_rows(hits):
    return sorted(
        zip(
            np.asarray(hits.q_off).tolist(),
            np.asarray(hits.s_off).tolist(),
            np.asarray(hits.q_start).tolist(),
            np.asarray(hits.s_start).tolist(),
            np.asarray(hits.length).tolist(),
            np.asarray(hits.score).tolist(),
            np.asarray(hits.context).tolist(),
            np.asarray(hits.oid).tolist(),
        )
    )


def test_streamed_matches_resident_megablast(problem):
    ref, got = _run_both(problem, 28, 11, 1, -2, cutoff=20, xdrop=11)
    assert len(ref) > 0
    assert _as_rows(ref) == _as_rows(got)


def test_streamed_matches_resident_blastn(problem):
    ref, got = _run_both(problem, 11, 8, 2, -3, cutoff=22, xdrop=22)
    assert len(ref) > 0
    assert _as_rows(ref) == _as_rows(got)


def test_streamed_matches_resident_two_hit(problem):
    ref, got = _run_both(
        problem, 11, 8, 2, -3, cutoff=22, xdrop=22, window_size=40,
    )
    assert len(ref) > 0
    assert _as_rows(ref) == _as_rows(got)


def test_streamed_single_block_degenerate(problem):
    # a block far larger than the DB: exercises the 1-block path
    ref, got = _run_both(
        problem, 28, 11, 1, -2, cutoff=20, xdrop=11,
        block_bases=1 << 20, halo=1024,
    )
    assert _as_rows(ref) == _as_rows(got)


def test_streamed_tiny_blocks(problem):
    # blocks barely above the minimum, many escalations
    ref, got = _run_both(
        problem, 28, 11, 1, -2, cutoff=20, xdrop=11,
        block_bases=1024, halo=256,
    )
    assert _as_rows(ref) == _as_rows(got)


def test_unpack_range():
    rng = np.random.default_rng(3)
    db = SequenceDB.from_records(
        [FastaRecord("s", "", _rand_seq(rng, 999).encode())]
    )
    full = db.unpacked()
    for p0, p1 in [(0, 10), (3, 17), (127, 131), (998, 999), (0, 999)]:
        np.testing.assert_array_equal(
            unpack_range(db.packed, p0, p1), full[p0:p1]
        )


def test_host_extension_matches_device():
    rng = np.random.default_rng(8)
    genome = _rand_seq(rng, 5000)
    q = genome[1000:1600]
    qb, db, _ = _setup(rng, [q], [genome], 28, 11)
    mat = _matrix16(1, -2)
    sub2 = db.unpacked().astype(np.int8)
    valid = db.valid_mask()
    n = 64
    q_off = rng.integers(1, len(qb.buffer) - 1, n).astype(np.int32)
    s_off = rng.integers(0, 5000, n).astype(np.int32)
    xd = np.full(n, 11, np.int32)
    dq, ds, dl, dsc, _t = ungapped_extend(
        jnp.asarray(qb.buffer), jnp.asarray(sub2), jnp.asarray(valid),
        jnp.asarray(mat), jnp.asarray(q_off), jnp.asarray(s_off),
        jnp.ones(n, bool), jnp.asarray(xd),
    )
    sub_start = np.zeros(n, np.int64)
    sub_end = np.full(n, 5000, np.int64)
    hq, hs, hl, hsc = ungapped_extend_host(
        np.asarray(qb.buffer), mat, db.packed, sub_start, sub_end,
        q_off.astype(np.int64), s_off.astype(np.int64), xd,
    )
    np.testing.assert_array_equal(np.asarray(dq), hq)
    np.testing.assert_array_equal(np.asarray(ds), hs)
    np.testing.assert_array_equal(np.asarray(dl), hl)
    np.testing.assert_array_equal(np.asarray(dsc), hsc)


def test_right_runs_packed_matches_unpacked():
    rng = np.random.default_rng(9)
    genome = _rand_seq(rng, 4000)
    q = genome[500:1200]
    qb, db, _ = _setup(rng, [q], [genome], 11, 8)
    sub2 = db.unpacked().astype(np.int8)
    valid = db.valid_mask()
    n = 40
    q_off = rng.integers(1, len(qb.buffer) - 30, n).astype(np.int64)
    s_off = rng.integers(0, 3900, n).astype(np.int64)
    ref = compute_right_runs(
        np.asarray(qb.buffer), sub2, valid, q_off, s_off, 11
    )
    sub_end = np.full(n, 4000, np.int64)
    got = compute_right_runs_packed(
        np.asarray(qb.buffer), db.packed, sub_end, q_off, s_off, 11
    )
    np.testing.assert_array_equal(ref, got)


def test_search_end_to_end_streamed(monkeypatch):
    """Full search() with forced streaming == default, byte-identical."""
    from gblastn_tpu.engine.search import search
    from gblastn_tpu.params.options import megablast_options

    def rows(res):
        out = []
        for q in res.queries:
            for lst in q.hsplists:
                for h in lst.hsps:
                    out.append((
                        q.query_index, lst.oid, h.context,
                        h.q_off, h.q_end, h.s_off, h.s_end,
                        h.score, float(h.evalue), h.num_ident,
                        tuple(h.edit_script)
                        if h.edit_script is not None else None,
                    ))
        return out

    rng = np.random.default_rng(5)
    genome = _rand_seq(rng, 20000)
    reads = [
        FastaRecord("r1", "", _mutate(rng, genome[3000:3400], 0.02).encode()),
        FastaRecord("r2", "", genome[9000:9800].encode()),
        FastaRecord("r3", "", _rand_seq(rng, 300).encode()),
    ]
    db = SequenceDB.from_records(
        [FastaRecord("chr", "", genome.encode())]
    )
    opts = megablast_options()
    ref = search(reads, db, opts)

    monkeypatch.setenv("GBLASTN_TPU_STREAM", "1")
    monkeypatch.setenv("GBLASTN_TPU_BLOCK_BASES", "2048")
    monkeypatch.setenv("GBLASTN_TPU_BLOCK_HALO", "512")
    db2 = SequenceDB.from_records(
        [FastaRecord("chr", "", genome.encode())]
    )
    got = search(reads, db2, opts)
    assert rows(got) == rows(ref)


def test_streamed_matches_resident_disc(problem):
    # discontiguous template: streamed blocks must reproduce the
    # device-resident seed set exactly (template window crossing
    # block boundaries included)
    from gblastn_tpu.lut.builder import build_disc_lookup_table
    from gblastn_tpu.lut.templates import disc_template_offsets

    qs, ss = problem
    rng = np.random.default_rng(0)
    qb = build_query_block(
        [FastaRecord(f"q{i}", "", s.encode())
         for i, s in enumerate(qs)],
        strand="both",
    )
    db = SequenceDB.from_records(
        [FastaRecord(f"s{i}", "", s.encode())
         for i, s in enumerate(ss)]
    )
    locs = unmasked_locations(qb.buffer, qb.context_offsets())
    lut = build_disc_lookup_table(qb.buffer, locs, 11, 18, "coding")
    offs = disc_template_offsets(11, 18, "coding")
    mat = _matrix16(2, -3)
    ctx_offs = qb.context_offsets()
    n_ctx = len(qb.contexts)
    cutoffs = np.full(n_ctx, 30, np.int32)
    xdrops = np.full(n_ctx, 22, np.int32)
    sub2 = db.unpacked().astype(np.int8)

    dev = SeedingDeviceData(
        query=jnp.asarray(qb.buffer),
        subject2=jnp.asarray(sub2),
        subject_valid=jnp.asarray(db.valid_mask()),
        lut_offsets=jnp.asarray(lut.counts_offsets),
        lut_positions=jnp.asarray(lut.positions),
        matrix16=jnp.asarray(mat),
    )
    kw = dict(
        word_size=lut.word_size, context_offsets=ctx_offs,
        word_cutoffs=cutoffs, x_dropoffs=xdrops, window_size=40,
    )
    ref = run_seeding(
        dev, lut_word=lut.lut_word_size, scan_step=1,
        subject_starts=np.asarray(db.starts),
        subject_lengths=np.asarray(db.lengths),
        disc_offsets=offs, **kw,
    )
    got = run_seeding_streamed(
        db,
        query_dev=jnp.asarray(qb.buffer),
        query_host=np.asarray(qb.buffer),
        lut_offsets_dev=jnp.asarray(lut.counts_offsets),
        lut_positions_dev=jnp.asarray(lut.positions),
        matrix16=mat,
        lut_word=lut.lut_word_size,
        scan_step=1, cmax=16, block_bases=4096, halo=512,
        use_pallas=False, disc_offsets=offs, **kw,
    )
    assert len(ref) > 0
    assert _as_rows(ref) == _as_rows(got)


def test_search_end_to_end_streamed_two_template(monkeypatch):
    """coding_and_optimal (two-template) dc-megablast with forced
    streaming: two streamed passes, raw hits merged before the replay,
    byte-identical to the device-resident two-template path."""
    from gblastn_tpu.engine.search import search
    from gblastn_tpu.params.options import dc_megablast_options

    def rows(res):
        out = []
        for q in res.queries:
            for lst in q.hsplists:
                for h in lst.hsps:
                    out.append((
                        q.query_index, lst.oid, h.context,
                        h.q_off, h.q_end, h.s_off, h.s_end,
                        h.score, float(h.evalue), h.num_ident,
                    ))
        return out

    rng = np.random.default_rng(71)
    genome = _rand_seq(rng, 24000)

    def wobble(seg, seed):
        r = np.random.default_rng(seed)
        out = list(seg)
        for pp in range(2, len(out), 3):
            if r.random() < 0.4:
                out[pp] = "ACGT"[
                    ("ACGT".index(out[pp]) + 1 + r.integers(0, 3)) % 4
                ]
        return "".join(out)

    reads = [
        FastaRecord("d1", "", wobble(genome[3000:3700], 1).encode()),
        FastaRecord("d2", "", wobble(genome[19000:19500], 2).encode()),
    ]
    db = SequenceDB.from_records(
        [FastaRecord("chr", "", genome.encode())]
    )
    opts = dc_megablast_options(
        evalue=1e-3, template_type="coding_and_optimal",
    )
    ref = search(reads, db, opts)

    monkeypatch.setenv("GBLASTN_TPU_STREAM", "1")
    monkeypatch.setenv("GBLASTN_TPU_BLOCK_BASES", "4096")
    monkeypatch.setenv("GBLASTN_TPU_BLOCK_HALO", "512")
    db2 = SequenceDB.from_records(
        [FastaRecord("chr", "", genome.encode())]
    )
    got = search(reads, db2, opts)
    assert rows(ref)
    assert rows(got) == rows(ref)
