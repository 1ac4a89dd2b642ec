"""Device banded gapped-extension filter: oracle soundness + engine
integration (VERDICT round-1 item 2).

The NumPy oracle (ops.gapped_ref) IS the kernel's semantics -- the
Pallas kernel is asserted bit-identical to it on real TPU hardware by
bench.py's parity smoke (interpret-mode compilation is too slow for
CI); here we prove the things CI can prove fast:

* the oracle's flag-free score upper-bounds (and almost always equals)
  the host exact aligners on both task scorings;
* the engine's device_gapped_rejects + host walk produce output
  identical to the host-only path, with the kernel stubbed by the
  oracle (same semantics, no Pallas).
"""
from __future__ import annotations

import numpy as np
import pytest

from gblastn_tpu.gapped.dynprog import semi_gapped_align
from gblastn_tpu.gapped.greedy import greedy_gapped_alignment
from gblastn_tpu.ops.gapped_ref import banded_dp_score
from gblastn_tpu.stats.karlin import nucl_score_matrix


def test_oracle_vs_host_dp_blastn_scale():
    rng = np.random.default_rng(5)
    matrix = nucl_score_matrix(2, -3)
    sf = lambda a, b: int(matrix[a][b])
    eq = under = flagged = 0
    for _ in range(150):
        M = int(rng.integers(5, 250))
        N = int(rng.integers(5, 250))
        B = rng.integers(0, 4, max(M, N) + 2).astype(np.uint8)
        if rng.random() < 0.6:
            A = B[: M + 1].copy()
            mut = rng.random(M + 1) < 0.1
            A[mut] = rng.integers(0, 4, mut.sum())
        else:
            A = rng.integers(0, 4, M + 1).astype(np.uint8)
        host = semi_gapped_align(
            A, B, M, N, matrix, 5, 2, 30, False, True, use_native=False
        )
        dev = banded_dp_score(A[1:], B[1:], sf, M, N, 5, 2, 30, 4096)
        if dev[3]:
            flagged += 1
        elif dev[0] == host[0]:
            eq += 1
            assert (dev[1], dev[2]) == (host[1], host[2])
        else:
            # only the sticky-E quirk may push host above the band
            # score, and only by a few gap-extends (margin absorbs it)
            assert host[0] - dev[0] <= 10
            under += 1
    assert eq >= 140, (eq, under, flagged)


def test_oracle_vs_host_greedy_megablast_scale():
    rng = np.random.default_rng(9)
    r, p, gxd = 1, -2, 55
    m2, mm2, ext2 = 2 * r, 2 * p, r - 2 * p
    sf = lambda a, b: (m2 if (b < 4 and a == b) else mm2)
    for trial in range(100):
        L = int(rng.integers(20, 400))
        g = rng.integers(0, 4, L + 400).astype(np.uint8)
        q = g[100: 100 + L].copy()
        mut = rng.random(L) < 0.05
        q[mut] = rng.integers(0, 4, mut.sum())
        if rng.random() < 0.5:
            cut = int(rng.integers(5, L - 5))
            q = np.concatenate([q[:cut], q[cut + 2:]])
        q_off = len(q) // 2
        s_off = 100 + q_off
        host = greedy_gapped_alignment(
            q, g, gxd, r, p, 0, 0, q_off, s_off, False
        )
        dr = banded_dp_score(
            g[s_off:], q[q_off:], sf, len(g) - s_off, len(q) - q_off,
            0, ext2, 2 * gxd, 4096,
        )
        dl = banded_dp_score(
            g[:s_off][::-1], q[:q_off][::-1], sf, s_off, q_off,
            0, ext2, 2 * gxd, 4096,
        )
        if dr[3] | dl[3]:
            continue
        # the band DP may undershoot greedy by a few units (different
        # X-drop schedules); the filter margin (16*dbl) must cover it
        assert 2 * host.score - (dr[0] + dl[0]) <= 16, trial


def _numpy_kernel(monkeypatch):
    """Stub banded_gapped_scores with the oracle (same semantics, no
    Pallas compile)."""
    import gblastn_tpu.engine.gapped as eg

    def fake(init, qblock, subject_starts, subject_lengths, params,
             dgd):
        from gblastn_tpu.ops.gapped_ref import banded_dp_score as bds
        import gblastn_tpu.ops.pallas_gapped as pg

        real = pg.banded_gapped_scores

        def stub(operands, matrix16, q_len, s_len, q_seed, s_seed,
                 q_lo, q_hi, s_lo, s_hi, x_drop, *, rows, gap_open,
                 gap_extend, interpret=False):
            mat = np.asarray(matrix16)

            def sf(a, b):
                return int(mat[b][a])

            qbuf = np.asarray(qblock.buffer)
            sub = _numpy_kernel.subject
            n = len(q_seed)
            tot = np.zeros(n, np.int64)
            fl = np.zeros(n, np.int32)
            for i in range(n):
                qs, ss = int(q_seed[i]), int(s_seed[i])
                x = int(x_drop[i])
                r = bds(
                    sub[ss: s_hi[i]], qbuf[qs: q_hi[i]], sf,
                    int(s_hi[i] - ss), int(q_hi[i] - qs),
                    gap_open, gap_extend, x, rows,
                )
                l = bds(
                    sub[s_lo[i]: ss][::-1],
                    qbuf[q_lo[i]: qs][::-1], sf,
                    int(ss - s_lo[i]), int(qs - q_lo[i]),
                    gap_open, gap_extend, x, rows,
                )
                tot[i] = r[0] + l[0]
                fl[i] = r[3] | l[3]
            return tot, fl

        pg.banded_gapped_scores = stub
        try:
            return orig_rejects(
                init, qblock, subject_starts, subject_lengths, params,
                dgd,
            )
        finally:
            pg.banded_gapped_scores = real

    orig_rejects = eg.device_gapped_rejects

    # patch at the module level so run_gapped_prelim picks it up
    monkeypatch.setattr(eg, "device_gapped_rejects", fake)


@pytest.mark.parametrize("task", ["megablast", "blastn"])
def test_engine_filter_identical_output(monkeypatch, task):
    """Search output with the device filter (oracle-stubbed) must be
    identical to the host-only path, and must actually reject some
    junk candidates."""
    from gblastn_tpu.engine.search import search
    from gblastn_tpu.format.tabular import hsp_to_tabular
    from gblastn_tpu.io.fasta import FastaRecord
    from gblastn_tpu.io.seqdb import SequenceDB
    from gblastn_tpu.params.options import (
        blastn_options,
        megablast_options,
    )
    from gblastn_tpu.utils.profiling import slog

    rng = np.random.default_rng(42)
    bases = "ACGT"
    genome = "".join(bases[i] for i in rng.integers(0, 4, 20000))

    def noisy(seg, seed, p=0.05):
        r = np.random.default_rng(seed)
        out = list(seg)
        for t in np.flatnonzero(r.random(len(seg)) < p):
            out[t] = bases[
                (bases.index(out[t]) + 1 + int(r.integers(0, 3))) % 4
            ]
        return "".join(out)

    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    junk = lambda m, s: "".join(
        bases[i] for i in np.random.default_rng(s).integers(0, 4, m)
    )
    queries = [
        FastaRecord("q1", "", noisy(genome[4000:4400], 1)),
        FastaRecord("q2", "", "".join(
            comp[c] for c in reversed(noisy(genome[15000:15300], 2)))),
        FastaRecord("q3", "", junk(300, 7)),
        # 16 bp islands: above the ungapped word cutoff, far below the
        # tight-evalue gapped cutoff -> device-rejectable candidates
        FastaRecord("q4", "", junk(100, 8) + genome[9000:9016]
                    + junk(100, 9) + genome[12000:12016] + junk(80, 10)),
    ]
    db = SequenceDB.from_records(
        [FastaRecord("g", "", genome)], title="t"
    )
    opt = (megablast_options(evalue=10.0) if task == "megablast"
           else blastn_options(evalue=1e-8))

    def rows(opt):
        res = search(queries, db, opt)
        out = []
        for qr in res.queries:
            for hl in qr.hsplists:
                for h in hl.hsps:
                    t = hsp_to_tabular(
                        h, queries[qr.query_index].seq_id, "g",
                        len(queries[qr.query_index].sequence),
                        int(db.lengths[hl.oid]),
                    )
                    out.append(tuple(vars(t).values()))
        return out

    monkeypatch.setenv("GBLASTN_TPU_GAPPED_FILTER", "0")
    base = rows(opt)
    assert len(base) >= 2

    _numpy_kernel.subject = db.unpacked().astype(np.uint8)
    _numpy_kernel(monkeypatch)
    monkeypatch.setenv("GBLASTN_TPU_GAPPED_FILTER", "1")
    before = slog.diagnostics.device_gapped_rejects
    filt = rows(opt)
    assert filt == base
    # blastn word 11 on random junk produces rejectable candidates
    if task == "blastn":
        assert slog.diagnostics.device_gapped_rejects > before
