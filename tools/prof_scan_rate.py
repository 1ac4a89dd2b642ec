"""True DEVICE rate of the seeding scan, measured with in-jit loops.

Round-2 verdict: the 0.15 Gbases/s scan figure was ~all tunnel RTT
(~27 ms/dispatch vs 30 ms measured). This tool loops the scan K times
INSIDE one jit (lax.scan with a per-iteration subject perturbation so
XLA cannot CSE the iterations) and differentiates two loop depths, so
the dispatch overhead cancels exactly:

    rate = S * (K2 - K1) / (T(K2) - T(K1))

Also times the micro-stages (word compute, PV probe, compaction,
mini-extension) the same way to show where device time goes.

Run on TPU:  python tools/prof_scan_rate.py
"""
from __future__ import annotations

import functools
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
K1, K2 = 2, 10


def make_workload(seed=0, num_queries=64, qlen=1000):
    rng = np.random.default_rng(seed)
    g = "".join("ACGT"[i] for i in rng.integers(0, 4, GENOME))
    reads = []
    for i in range(num_queries):
        s = int(rng.integers(0, GENOME - qlen - 100))
        frag = list(g[s: s + qlen])
        for j in range(len(frag)):
            if rng.random() < 0.02:
                frag[j] = "ACGT"[int(rng.integers(0, 4))]
        reads.append(FastaRecord(f"q{i}", "", "".join(frag)))
    db = SequenceDB.from_records([FastaRecord("chr1", "", g)])
    return db, reads


def loop_timer(fn_k, label, s_bases, extra=""):
    """fn_k(K) -> a jitted callable taking no args; times K1 vs K2."""
    fns = {}
    for k in (K1, K2):
        fns[k] = fn_k(k)
        jax.block_until_ready(fns[k]())          # compile
    # interleave and best-of-3 to ride out tunnel congestion episodes
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fns[K1]())
        t1 = time.perf_counter()
        jax.block_until_ready(fns[K2]())
        t2 = time.perf_counter()
        dt = (t2 - t1) - (t1 - t0)
        best = min(best, dt)
    per_iter_ms = best / (K2 - K1) * 1e3
    rate = s_bases / (best / (K2 - K1)) / 1e9
    print(f"{label:28s} {per_iter_ms:8.2f} ms/iter  "
          f"{rate:7.2f} Gbases/s  {extra}")
    return per_iter_ms


def main():
    from gblastn_tpu.io.query import build_query_block
    from gblastn_tpu.lut.builder import build_lookup_table, unmasked_locations
    from gblastn_tpu.ops.seeding import seeding_scan_mini

    print("device:", jax.devices()[0])
    db, reads = make_workload()
    qblock = build_query_block(reads, "both")
    locs = unmasked_locations(qblock.buffer, qblock.context_offsets())
    lut = build_lookup_table(qblock.buffer, locs, WORD, 11)
    qbuf = np.full(1 << 17, 15, np.uint8)
    qbuf[: len(qblock.buffer)] = qblock.buffer

    sub2 = db.unpacked().astype(np.int8)
    S = len(sub2)
    valid = db.valid_mask()
    scan_step = lut.scan_step
    lut_word = lut.lut_word_size
    n_scan = (S - lut_word) // scan_step + 1
    co = qblock.context_offsets()
    ctx_cap = 64
    while ctx_cap + 1 < len(co):
        ctx_cap *= 2
    ctx_off = np.full(ctx_cap + 1, np.iinfo(np.int32).max, np.int32)
    ctx_off[: len(co)] = co
    xdrops = np.full(ctx_cap, 22, np.int32)

    d_sub = jnp.asarray(sub2)
    d_valid = jnp.asarray(valid)
    d_off = jnp.asarray(lut.counts_offsets)
    d_pos = jnp.asarray(lut.positions)
    d_q = jnp.asarray(qbuf)
    d_co = jnp.asarray(ctx_off)
    d_xd = jnp.asarray(xdrops)
    d_st = jnp.asarray(db.starts)
    d_en = jnp.asarray(db.starts + db.lengths)

    print(f"subject {S/1e6:.1f} Mb, stride {scan_step}, lut_word "
          f"{lut_word}, n_scan {n_scan}, positions {len(lut.positions)}")

    # ---------------- full production scan+mini program
    def full_k(K):
        @jax.jit
        def run():
            def body(carry, k):
                s2 = ((d_sub + k) & 3).astype(jnp.int8)
                out = seeding_scan_mini(
                    s2, d_valid, d_off, d_pos, d_q, d_co, d_xd,
                    d_st, d_en,
                    scan_step=scan_step, lut_word=lut_word,
                    word_size=WORD, cmax=8, n_scan=n_scan,
                    hit_cap=16384, seed_cap=16384,
                )
                return carry + out[-1], None
            tot, _ = jax.lax.scan(
                body, jnp.zeros((), jnp.int32),
                jnp.arange(K, dtype=jnp.int8),
            )
            return tot
        return run

    # ---------------- micro-stages, same loop harness
    lim0 = (n_scan - 1) * scan_step + 1

    def words_of(s2):
        w = jnp.zeros(n_scan, jnp.int32)
        for j in range(lut_word):
            sl = jax.lax.slice(s2, (j,), (lim0 + j,), (scan_step,))
            w = w + (sl.astype(jnp.int32) << (2 * (lut_word - 1 - j)))
        return w

    def make_loop(stage_fn):
        def fk(K):
            @jax.jit
            def run():
                def body(carry, k):
                    s2 = ((d_sub + k) & 3).astype(jnp.int8)
                    return carry + stage_fn(s2), None
                tot, _ = jax.lax.scan(
                    body, jnp.zeros((), jnp.int32),
                    jnp.arange(K, dtype=jnp.int8),
                )
                return tot
            return run
        return fk

    def stage_words(s2):
        return words_of(s2).sum()

    table_size = lut.counts_offsets.shape[0] - 1
    present = lut.counts_offsets[1:] > lut.counts_offsets[:-1]
    bits = present.reshape(table_size // 32, 32).astype(np.int32)
    pv_host = (bits << np.arange(32, dtype=np.int32)[None, :]).sum(
        axis=1, dtype=np.int32)
    d_pv = jnp.asarray(pv_host)

    def stage_words_pv(s2):
        w = words_of(s2)
        hit = ((d_pv[w >> 5] >> (w & 31)) & 1) == 1
        return hit.sum()

    def stage_words_pv_compact(s2):
        w = words_of(s2)
        hit = ((d_pv[w >> 5] >> (w & 31)) & 1) == 1
        idx = jnp.nonzero(hit, size=16384, fill_value=n_scan - 1)[0]
        return idx.sum()

    from gblastn_tpu.ops.seeding import (
        compact_indices,
        mini_extend,
        scan_block,
    )

    def stage_scan_block(s2):
        q_off, s_off, take, nd, nh = scan_block(
            s2, d_valid, d_off, d_pos,
            scan_step=scan_step, lut_word=lut_word, word_size=WORD,
            cmax=8, n_scan=n_scan, hit_cap=16384,
        )
        return take.sum() + nd + nh

    def stage_scan_compact(s2):
        q_off, s_off, take, nd, nh = scan_block(
            s2, d_valid, d_off, d_pos,
            scan_step=scan_step, lut_word=lut_word, word_size=WORD,
            cmax=8, n_scan=n_scan, hit_cap=16384,
        )
        ridx, rfill, n_raw = compact_indices(take, 16384, 0)
        return jnp.where(rfill, q_off[ridx], 0).sum() + n_raw

    def stage_scan_compact_mini(s2):
        q_off, s_off, take, nd, nh = scan_block(
            s2, d_valid, d_off, d_pos,
            scan_step=scan_step, lut_word=lut_word, word_size=WORD,
            cmax=8, n_scan=n_scan, hit_cap=16384,
        )
        ridx, rfill, n_raw = compact_indices(take, 16384, 0)
        q2 = jnp.where(rfill, q_off[ridx], 0)
        s2o = jnp.where(rfill, s_off[ridx], 0)
        qs, ss, ok = mini_extend(
            d_q, s2, d_valid, q2, s2o, rfill,
            lut_word=lut_word, word_size=WORD,
        )
        return qs.sum() + ss.sum() + ok.sum()

    from gblastn_tpu.ops.seeding import (
        pack_query_nibbles,
        pack_subject_words,
    )

    d_qnib = jax.jit(pack_query_nibbles)(d_q)
    d_subw = jax.jit(pack_subject_words)(jnp.asarray(db.packed))
    jax.block_until_ready((d_qnib, d_subw))

    # production variant: packed-word mini-extension (the blob path)
    def full_packed_k(K):
        @jax.jit
        def run():
            def body(carry, k):
                s2 = ((d_sub + k) & 3).astype(jnp.int8)
                out = seeding_scan_mini(
                    s2, d_valid, d_off, d_pos, d_q, d_co, d_xd,
                    d_st, d_en,
                    query_nib=d_qnib, subject_w=d_subw,
                    scan_step=scan_step, lut_word=lut_word,
                    word_size=WORD, cmax=8, n_scan=n_scan,
                    hit_cap=16384, seed_cap=16384,
                    pos_base_static=0,
                )
                return carry + out[-1], None
            tot, _ = jax.lax.scan(
                body, jnp.zeros((), jnp.int32),
                jnp.arange(K, dtype=jnp.int8),
            )
            return tot
        return run

    loop_timer(make_loop(stage_words), "A words-only", S)
    loop_timer(make_loop(stage_words_pv), "B +PV probe", S)
    loop_timer(make_loop(stage_words_pv_compact), "C +compact", S)
    loop_timer(make_loop(stage_scan_block), "D1 scan_block", S)
    loop_timer(make_loop(stage_scan_compact), "D2 +seed compact", S)
    loop_timer(make_loop(stage_scan_compact_mini), "D3 +mini_extend", S)
    full_ms = loop_timer(full_k, "D full scan+mini", S)
    loop_timer(full_packed_k, "E full w/ packed mini", S)
    print(f"# scan+mini true device rate: {S / (full_ms / 1e3) / 1e9:.2f}"
          f" Gbases/s (in-jit loop, dispatch overhead cancelled)")


if __name__ == "__main__":
    main()
