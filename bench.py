"""Benchmark driver: megablast throughput on BASELINE config 1.

Workload (BASELINE.json configs[0]): 500 x 1 kb query reads vs an
E. coli-scale genome (4.6 Mb synthetic, fixed seed), megablast defaults.
Reads are sampled from the genome with 2% substitutions + rare indels so
every read aligns (the pipeline exercises seeding, greedy prelim,
traceback, and statistics end to end).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "queries/sec", "vs_baseline": N}

vs_baseline is measured throughput divided by the reference CPU
anchor in BASELINE.json["published"]["queries_per_sec_megablast_ecoli"]
when present (the reference repo publishes no numbers; until a measured
anchor exists the divisor defaults to 1.0 and vs_baseline == value).
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

GENOME_LEN = 4_600_000
NUM_QUERIES = 500   # production batch size; fixed per-batch costs
                    # (LUT upload, dispatches) amortize across reads
QUERY_LEN = 1000
SEED = 20260816


def build_workload():
    from gblastn_tpu.io.fasta import FastaRecord
    from gblastn_tpu.io.seqdb import SequenceDB

    rng = np.random.default_rng(SEED)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    genome_codes = rng.integers(0, 4, GENOME_LEN)
    genome = bases[genome_codes].tobytes().decode()
    db = SequenceDB.from_records(
        [FastaRecord("ecoli_synth", "synthetic E. coli scale genome",
                     genome)],
        title="ecoli_synth",
    )
    queries = []
    for i in range(NUM_QUERIES):
        start = int(rng.integers(0, GENOME_LEN - QUERY_LEN))
        read = list(genome[start: start + QUERY_LEN])
        # ~2% substitutions
        for p in np.flatnonzero(rng.random(QUERY_LEN) < 0.02):
            read[p] = "ACGT"[(("ACGT".index(read[p])) + 1 +
                              int(rng.integers(0, 3))) % 4]
        seq = "".join(read)
        if rng.random() < 0.3:  # occasional short deletion
            cut = int(rng.integers(100, QUERY_LEN - 100))
            seq = seq[:cut] + seq[cut + 3:]
        queries.append(FastaRecord(f"read{i}", "", seq))
    return db, queries


def main() -> int:
    from gblastn_tpu.engine.search import search
    from gblastn_tpu.params.options import megablast_options
    from gblastn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    db, queries = build_workload()
    options = megablast_options(evalue=1e-5, max_target_seqs=10)

    # warm-up: compile all device kernels at the same bucketed shapes as
    # the timed run (excluded from timing, like the reference's
    # long-lived pipeline process amortizing startup)
    search(queries, db, options)

    from gblastn_tpu.utils.profiling import slog

    # best of 3 timed runs: the shared TPU host adds large run-to-run
    # noise to the Python stages; best-of reflects capability
    dt = float("inf")
    for _ in range(3):
        slog.reset()  # stage report below covers only the fastest run
        t0 = time.time()
        results = search(queries, db, options)
        dt_i = time.time() - t0
        if dt_i < dt:
            dt = dt_i
            report = slog.report()

    n_hits = sum(
        len(lst.hsps) for q in results.queries for lst in q.hsplists
    )
    qps = NUM_QUERIES / dt
    aligned = sum(1 for q in results.queries if q.hsplists)
    print(
        f"# {NUM_QUERIES} queries, {n_hits} HSPs, {aligned} aligned, "
        f"{dt:.2f}s", file=sys.stderr,
    )
    # supplementary kernel-efficiency metric (BASELINE.md target):
    # subject bases scanned per second of device seeding time
    seed_t = slog.totals.get("device.seeding", 0.0)
    if seed_t > 0:
        print(
            f"# scan throughput: {GENOME_LEN / seed_t / 1e9:.2f} "
            "Gbases/s of device seeding time", file=sys.stderr,
        )
    print(report, file=sys.stderr)

    try:
        published = json.load(open("BASELINE.json")).get("published", {})
        anchor = float(
            published.get("queries_per_sec_megablast_ecoli", 1.0)
        ) or 1.0
    except Exception:
        anchor = 1.0

    print(json.dumps({
        "metric": "queries_per_sec_megablast_ecoli_4.6Mb",
        "value": round(qps, 3),
        "unit": "queries/sec",
        "vs_baseline": round(qps / anchor, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
