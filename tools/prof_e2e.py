"""End-to-end stage breakdown of config-1 (and optionally config-3)
on real TPU: runs bench-shaped searches and prints the slog stage
report plus wall time, so optimization effort goes where the
milliseconds are.

Run:  python tools/prof_e2e.py [config1|config3|config2]
"""
from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "config1"
    sys.path.insert(0, ".")
    import bench
    from gblastn_tpu.engine.search import search
    from gblastn_tpu.params.options import (
        blastn_options,
        megablast_options,
    )
    from gblastn_tpu.utils.cache import enable_compilation_cache
    from gblastn_tpu.utils.profiling import slog

    enable_compilation_cache()
    rng = np.random.default_rng(bench.SEED)

    if which == "config3":
        from gblastn_tpu.io.fasta import FastaRecord
        from gblastn_tpu.io.seqdb import SequenceDB

        rng = np.random.default_rng(bench.SEED + 3)
        genome = bench._make_genome(rng, bench.BIG_GENOME_LEN)
        db = SequenceDB.from_records(
            [FastaRecord("chr1_synth", "", genome)], title="c3")
        sets = [bench._sample_reads(rng, genome, 500, 1000, f"c{k}")
                for k in range(3)]
        del genome
        options = megablast_options(evalue=1e-5, max_target_seqs=10)
    else:
        db, genome, rng = bench.build_workload()
        n, qlen = (200, 1500) if which == "config2" else (500, 1000)
        sets = [bench._sample_reads(rng, genome, n, qlen, f"w{k}_")
                for k in range(3)]
        options = (blastn_options(evalue=1e-5, max_target_seqs=10)
                   if which == "config2"
                   else megablast_options(evalue=1e-5, max_target_seqs=10))

    t0 = time.time()
    search(sets[0], db, options)     # warm-up
    print(f"# warm-up {time.time() - t0:.2f}s", flush=True)
    for i, queries in enumerate(sets[1:]):
        slog.reset()
        t0 = time.time()
        res = search(queries, db, options)
        dt = time.time() - t0
        nh = sum(len(l.hsps) for q in res.queries for l in q.hsplists)
        print(f"# run {i}: {dt:.3f}s = {len(queries) / dt:.1f} q/s, "
              f"{nh} HSPs", flush=True)
        print(slog.report(), flush=True)


if __name__ == "__main__":
    main()
