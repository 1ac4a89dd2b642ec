"""Shared problem for the multi-host equality test: deterministic
sharded seeding over an 8-device mesh; returns sorted seed rows."""
import numpy as np


def run_problem() -> np.ndarray:
    from gblastn_tpu.engine.search import device_matrix16
    from gblastn_tpu.io.fasta import FastaRecord
    from gblastn_tpu.io.query import build_query_block
    from gblastn_tpu.io.seqdb import SequenceDB
    from gblastn_tpu.lut.builder import (
        build_lookup_table,
        unmasked_locations,
    )
    from gblastn_tpu.parallel.dist import make_mesh, run_sharded_seeding

    rng = np.random.default_rng(5)
    bases = "ACGT"
    genome = "".join(bases[i] for i in rng.integers(0, 4, 16384))
    # matches crossing shard-core boundaries (16384/8 = 2048 cores)
    q1 = genome[1900:2400]
    q2 = genome[9000:9350]
    qb = build_query_block(
        [FastaRecord("q1", "", q1), FastaRecord("q2", "", q2)], "both"
    )
    db = SequenceDB.from_records(
        [FastaRecord("s", "", genome)], title="t"
    )
    locs = unmasked_locations(qb.buffer, qb.context_offsets())
    lut = build_lookup_table(qb.buffer, locs, 28, 11)
    mesh = make_mesh(8)
    n_ctx = len(qb.contexts)
    ctx_cap = 64
    ctx_off = np.full(ctx_cap + 1, np.iinfo(np.int32).max, np.int32)
    ctx_off[: n_ctx + 1] = qb.context_offsets()
    out = run_sharded_seeding(
        mesh, db.unpacked().astype(np.int8), db.valid_mask(), qb.buffer,
        lut.counts_offsets, lut.positions, device_matrix16(1, -2),
        subject_starts=db.starts, subject_lengths=db.lengths,
        ctx_offsets=ctx_off, x_dropoffs=np.full(ctx_cap, 22, np.int32),
        scan_step=lut.scan_step, lut_word=lut.lut_word_size,
        word_size=lut.word_size, use_pallas=False,
    )
    rows = np.stack([np.asarray(o, np.int64) for o in out], axis=1)
    order = np.lexsort(rows.T[::-1])
    return rows[order]
