"""Per-stage DEVICE time of the fused seeding finisher (round 4).

The chain-slope measurement showed the fused dispatch costs ~170 ms of
real device compute on config-1 shapes (scan ~5 ms of it), so this
tool times each finisher stage with the in-jit loop harness
(dispatch overhead cancels; inputs perturbed per iteration so the
tunnel result cache and XLA CSE cannot short-circuit).

Run on TPU:  python tools/prof_finisher.py
"""
from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

K1, K2 = 2, 8
WORD = 28


def loop_timer(stage_fn, label, n_pert):
    """stage_fn(k_scalar) -> scalar; loops K inside one jit."""
    def fn_k(K):
        @jax.jit
        def run():
            def body(c, k):
                return c + stage_fn(k.astype(jnp.int32)), None
            t, _ = jax.lax.scan(
                body, jnp.zeros((), jnp.int32),
                jnp.arange(K, dtype=jnp.int32))
            return t
        return run

    fns = {k: fn_k(k) for k in (K1, K2)}
    for k in (K1, K2):
        jax.block_until_ready(fns[k]())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fns[K1]())
        t1 = time.perf_counter()
        jax.block_until_ready(fns[K2]())
        t2 = time.perf_counter()
        best = min(best, (t2 - t1) - (t1 - t0))
    per = best / (K2 - K1)
    print(f"{label:44s} {per * 1e3:8.2f} ms/iter", flush=True)
    return per


def main():
    import bench
    from gblastn_tpu.engine.search import device_matrix16
    from gblastn_tpu.io.query import build_query_block
    from gblastn_tpu.lut.builder import build_lookup_table, unmasked_locations
    from gblastn_tpu.ops.pallas_ungapped import (
        make_table64,
        prepare_query,
        prepare_subject,
        ungapped_extend_pallas_prepared,
    )
    from gblastn_tpu.ops.seeding import (
        approx_gate_device,
        compact_indices,
        diag_replay_device,
        pack_query_nibbles,
        pack_subject_words,
        seeding_scan_mini,
        subject_arrays_from_packed,
        ungapped_phase0_packed,
        unpack_2na_device,
    )

    print("device:", jax.devices()[0], flush=True)
    db, genome, rng = bench.build_workload()
    queries = bench._sample_reads(rng, genome, 500, 1000, "f")
    qblock = build_query_block(queries, "both")
    locs = unmasked_locations(qblock.buffer, qblock.context_offsets())
    lut = build_lookup_table(qblock.buffer, locs, WORD, 11)
    qcap = 32768
    while qcap < len(qblock.buffer):
        qcap *= 2
    qbuf = np.full(qcap, 15, np.uint8)
    qbuf[: len(qblock.buffer)] = qblock.buffer

    packed_np = db.packed_padded()
    S = len(packed_np) * 4
    co = qblock.context_offsets()
    ctx_cap = 64
    while ctx_cap + 1 < len(co):
        ctx_cap *= 2
    ctx_off = np.full(ctx_cap + 1, np.iinfo(np.int32).max, np.int32)
    ctx_off[: len(co)] = co
    xdrops = np.full(ctx_cap, 22, np.int32)

    d_packed = jnp.asarray(packed_np)
    d_q = jnp.asarray(qbuf)
    d_off = jnp.asarray(lut.counts_offsets)
    d_pos = jnp.asarray(lut.positions)
    d_co = jnp.asarray(ctx_off)
    d_xd = jnp.asarray(xdrops)
    d_st = jnp.asarray(db.starts)
    d_en = jnp.asarray(db.starts + db.lengths)
    m16 = device_matrix16(1, -2)
    d_t64 = jnp.asarray(make_table64(m16))
    jax.block_until_ready((d_packed, d_q, d_pos))

    scan_step = lut.scan_step
    lut_word = lut.lut_word_size
    n_scan = (S - lut_word) // scan_step + 1
    seed_cap = 32768
    out_cap = seed_cap // 2
    alive_cap = 4096
    save_cap = 16384

    npos_full = qcap - lut_word + 1
    abits_np = np.packbits(
        np.isin(np.arange(qcap), lut.positions), bitorder="little"
    ).view(np.uint32).view(np.int32)
    d_abits = jnp.asarray(abits_np)

    # ---------- stage: derive subject arrays from packed
    def st_derive(k):
        p = d_packed ^ (k & 0).astype(jnp.uint8)  # no-op perturb safe
        s2, valid, sw = subject_arrays_from_packed(p, d_st, d_en)
        return s2[k].astype(jnp.int32) + valid[k] + sw[k].astype(jnp.int32)

    # ---------- stage: prepare_subject (pallas guard pad)
    def st_prep_sub(k):
        s2 = unpack_2na_device(d_packed)
        sp = prepare_subject(s2 + k.astype(jnp.int8) * 0)
        return sp[0, k & 127].astype(jnp.int32)

    # ---------- stage: prepare_query + nibbles
    def st_prep_q(k):
        q = d_q ^ (k & 0).astype(jnp.uint8)
        return (prepare_query(q)[0, k & 127].astype(jnp.int32)
                + pack_query_nibbles(q)[k].astype(jnp.int32))

    # ---------- stage: device CSR build (word sort over npos_full)
    def st_csr(k):
        words = jnp.zeros(npos_full, jnp.int32)
        for j in range(lut_word):
            words = words + (
                (d_q[j: j + npos_full].astype(jnp.int32) & 3)
                << (2 * (lut_word - 1 - j))
            )
        allowed = (
            ((d_abits[:, None] >> jnp.arange(32, dtype=jnp.int32)[None, :])
             & 1).astype(bool).reshape(-1)[:npos_full]
        )
        key = jnp.where(allowed, words, lut.table_size) + k * 0
        _w, pos = jax.lax.sort(
            (key, jax.lax.broadcasted_iota(jnp.int32, (npos_full,), 0)),
            num_keys=1, is_stable=True,
        )
        counts = jnp.zeros(lut.table_size, jnp.int32).at[key].add(
            1, mode="drop")
        return pos[k].astype(jnp.int32) + counts[k]

    # ---------- real scan outputs for the extension stages
    s2_real, valid_real, sw_real = jax.jit(subject_arrays_from_packed)(
        d_packed, d_st, d_en)
    qnib_real = jax.jit(pack_query_nibbles)(d_q)

    @jax.jit
    def scan_real():
        return seeding_scan_mini(
            s2_real, valid_real, d_off, d_pos, d_q, d_co, d_xd,
            d_st, d_en, query_nib=qnib_real, subject_w=sw_real,
            scan_step=scan_step, lut_word=lut_word, word_size=WORD,
            cmax=8, n_scan=n_scan, hit_cap=seed_cap, seed_cap=seed_cap,
            out_cap=out_cap, pos_base_static=0,
        )
    (qs, ss, ok, ctx, xd, maxl, maxr, novf, nraw, nhit, nsrv) = (
        scan_real())
    jax.block_until_ready(qs)
    print(f"n_scan {n_scan}, raw {int(nraw)}, survivors {int(nsrv)}",
          flush=True)

    # ---------- stage: full scan+mini
    def st_scan(k):
        out = seeding_scan_mini(
            s2_real, valid_real, d_off, d_pos,
            d_q ^ (k & 0).astype(jnp.uint8), d_co, d_xd,
            d_st, d_en, query_nib=qnib_real, subject_w=sw_real,
            scan_step=scan_step, lut_word=lut_word, word_size=WORD,
            cmax=8, n_scan=n_scan, hit_cap=seed_cap, seed_cap=seed_cap,
            out_cap=out_cap, pos_base_static=0,
        )
        return out[0][k]

    # ---------- stage: phase0 clamped walk on out_cap lanes
    def st_phase0(k):
        uq, us, ulen, usc, exact = ungapped_phase0_packed(
            qnib_real, sw_real, d_t64, qs + k * 0, ss, ok, xd,
            maxl, maxr, word_size=WORD,
        )
        return uq[k] + usc[k] + exact[k]

    uq0, us0, ulen0, usc0, exact0 = jax.jit(
        lambda: ungapped_phase0_packed(
            qnib_real, sw_real, d_t64, qs, ss, ok, xd, maxl, maxr,
            word_size=WORD)
    )()
    n_alive = int((ok & ~exact0).sum())
    print(f"phase0 alive: {n_alive} of {int(ok.sum())}", flush=True)

    query_p = jax.jit(prepare_query)(d_q)
    subject_p = jax.jit(lambda: prepare_subject(s2_real))()
    jax.block_until_ready((query_p, subject_p))

    # ---------- stage: alive compaction + window kernel
    def st_window(k):
        alive = ok & ~exact0
        aidx, afill, _na = compact_indices(alive, alive_cap, 0)
        f = ungapped_extend_pallas_prepared(
            (query_p, subject_p), d_t64,
            qs[aidx] + k * 0, ss[aidx], afill, xd[aidx],
            maxl[aidx], maxr[aidx],
        )
        return f[0][k & (alive_cap - 1)]

    # ---------- stage: one-hit device replay
    oid = jnp.zeros(qs.shape[0], jnp.int32)
    cutoff = jnp.full(qs.shape[0], 16, jnp.int32)
    ug_end = ss + ulen0

    def st_replay(k):
        saved, novf_ = diag_replay_device(
            qs + k * 0, ss, ok, jnp.zeros_like(qs), oid,
            ug_end, usc0, cutoff,
            word_size=WORD, window=0, diag_mask=0,
        )
        return saved[k].astype(jnp.int32) + novf_

    # ---------- stage: approx gate, one pass at save_cap lanes
    q32 = d_q.astype(jnp.int32)
    qbytes = ((q32[:-3] << 6) | (q32[1:-2] << 4)
              | (q32[2:-1] << 2) | q32[3:]) & 0xFF
    t256 = jnp.asarray(
        np.arange(256, dtype=np.int32) % 8 - 4)  # placeholder table
    sub_lo = jnp.zeros(save_cap, jnp.int32)
    sub_hi = jnp.full(save_cap, S, jnp.int32)

    def st_gate(k):
        d1, _q1, _s1, _e1, t1, r1 = approx_gate_device(
            qbytes, sw_real, t256,
            qs[:save_cap] + k * 0, ss[:save_cap], ok[:save_cap],
            xd[:save_cap], jnp.full(save_cap, 20, jnp.int32),
            sub_lo, sub_hi, len(qblock.buffer) - 1,
        )
        return d1[k].astype(jnp.int32) + t1[k]

    def st_gate_tier2(k):
        d1, _q1, _s1, _e1, t1, r1 = approx_gate_device(
            qbytes, sw_real, t256,
            qs[:512] + k * 0, ss[:512], ok[:512],
            xd[:512], jnp.full(512, 20, jnp.int32),
            sub_lo[:512], sub_hi[:512], len(qblock.buffer) - 1,
            clamp_bytes=1536,
        )
        return d1[k].astype(jnp.int32) + t1[k]

    loop_timer(st_derive, "derive subject (unpack+valid+words)", 0)
    loop_timer(st_prep_sub, "prepare_subject (pallas pad)", 0)
    loop_timer(st_prep_q, "prepare_query + nibbles", 0)
    loop_timer(st_csr, f"device CSR build ({npos_full} lanes)", 0)
    loop_timer(st_scan, "scan+mini (production shapes)", 0)
    loop_timer(st_phase0, f"phase0 walk ({int(qs.shape[0])} lanes)", 0)
    loop_timer(st_window, f"window kernel ({alive_cap} lanes)", 0)
    loop_timer(st_replay, "one-hit device replay", 0)
    loop_timer(st_gate, f"approx gate 48B ({save_cap} lanes)", 0)
    loop_timer(st_gate_tier2, "approx gate tier2 1536B (512 lanes)", 0)


if __name__ == "__main__":
    main()
