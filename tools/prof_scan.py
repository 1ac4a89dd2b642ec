"""Stage-level seeding profiler for real-TPU runs.

BASELINE.md round 2 measured the fused seeding dispatch at ~34 ms per
4.6 Mb subject (0.14 Gbases/s) -- far below HBM speed. This script
isolates where the time goes by timing progressively larger slices of
the scan (word compute -> LUT gather -> compaction), then the full
production search with slog stage timers and FRESH content per rep
(the axon tunnel caches results on identical buffers -- see memory:
axon-tunnel-performance).

Run on TPU:   python tools/prof_scan.py
Run on CPU:   PYTHONPATH= JAX_PLATFORMS=cpu python tools/prof_scan.py
(sanity only; the PYTHONPATH= drops the axon site dir -- the tunnel
plugin otherwise registers itself regardless of JAX_PLATFORMS, see
CLAUDE.md "Environment facts")
"""
from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from gblastn_tpu.io.fasta import FastaRecord
from gblastn_tpu.io.seqdb import SequenceDB

GENOME = 4_600_000
WORD = 28
REPS = 5


def make_workload(seed):
    rng = np.random.default_rng(seed)
    g = "".join("ACGT"[i] for i in rng.integers(0, 4, GENOME))
    reads = []
    for i in range(500):
        s = int(rng.integers(0, GENOME - 1100))
        frag = list(g[s: s + 1000])
        for j in range(len(frag)):
            if rng.random() < 0.02:
                frag[j] = "ACGT"[int(rng.integers(0, 4))]
        reads.append(FastaRecord(f"q{seed}_{i}", "", "".join(frag)))
    db = SequenceDB.from_records([FastaRecord("chr1", "", g)])
    return db, reads


def timed(fn, variants, *fixed, reps=REPS):
    """Mean ms/call over ``reps`` calls, each on a DIFFERENT first
    argument (``variants[k]``): the axon tunnel serves repeat calls on
    identical buffers from a result cache in <1 ms, so same-buffer
    loops measure nothing (memory: axon-tunnel-performance)."""
    jax.block_until_ready(fn(variants[0], *fixed))      # compile
    t0 = time.perf_counter()
    for k in range(reps):
        jax.block_until_ready(fn(variants[1 + k], *fixed))
    return (time.perf_counter() - t0) / reps * 1e3


def micro_stages(db, reads):
    """Word compute / LUT gather / compaction in isolation."""
    from gblastn_tpu.io.encoding import unpack_2na
    from gblastn_tpu.io.query import build_query_block
    from gblastn_tpu.lut.builder import (
        build_lookup_table,
        unmasked_locations,
    )

    qblock = build_query_block(reads)
    locations = unmasked_locations(
        qblock.buffer, qblock.context_offsets(), None
    )
    lut = build_lookup_table(qblock.buffer, locations, WORD)
    total = int(db.starts[-1] + db.lengths[-1])
    codes = unpack_2na(np.asarray(db.packed), total)
    # one subject variant per timed rep: +k (mod 4) rewrites every
    # base, defeating the tunnel's identical-buffer result cache while
    # keeping the same shape/statistics
    subjects = [
        jnp.asarray((codes.astype(np.int16) + k) & 3, jnp.int8)
        for k in range(REPS + 1)
    ]
    subject2 = subjects[0]
    loff = jnp.asarray(lut.counts_offsets)
    lut_word = lut.lut_word_size
    scan_step = WORD - lut_word + 1
    n_scan = (subject2.shape[0] - WORD) // scan_step + 1

    def words_only(s2):
        w = jnp.zeros(n_scan, jnp.int32)
        lim0 = (n_scan - 1) * scan_step + 1
        for j in range(lut_word):
            sl = jax.lax.slice(s2, (j,), (lim0 + j,), (scan_step,))
            w = w + (sl.astype(jnp.int32) << (2 * (lut_word - 1 - j)))
        return w

    def words_gather(s2, lo):
        w = words_only(s2)
        st = lo[w]
        return st, lo[w + 1] - st

    def words_compact(s2, lo):
        _, ct = words_gather(s2, lo)
        return jnp.nonzero(ct > 0, size=65536, fill_value=0)[0]

    print(f"scan positions: {n_scan}  lut_word: {lut_word} "
          f"stride: {scan_step}")
    print(f"A words-only        "
          f"{timed(jax.jit(words_only), subjects):8.2f} ms")
    print(f"B +offset gather    "
          f"{timed(jax.jit(words_gather), subjects, loff):8.2f} ms")
    print(f"C +nonzero compact  "
          f"{timed(jax.jit(words_compact), subjects, loff):8.2f} ms")


def full_search_reps():
    from gblastn_tpu.engine.search import search
    from gblastn_tpu.params.options import megablast_options
    from gblastn_tpu.utils.profiling import slog

    options = megablast_options(evalue=1e-5, hitlist_size=10)
    for rep in range(3):
        db, reads = make_workload(rep + 1)    # fresh content each rep
        slog.reset()
        t0 = time.perf_counter()
        res = search(reads, db, options)
        dt = time.perf_counter() - t0
        n = sum(len(l.hsps) for q in res.queries for l in q.hsplists)
        print(f"D search rep{rep}: {dt * 1e3:8.1f} ms ({n} HSPs, "
              f"{len(reads) / dt:.0f} q/s)")
        print(slog.report())


def main():
    print("device:", jax.devices()[0])
    db, reads = make_workload(0)
    micro_stages(db, reads)
    full_search_reps()


if __name__ == "__main__":
    main()
