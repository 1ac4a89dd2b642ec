"""Production-shape breakdown of the blob scan program (round 4).

The two-dispatch split shows ~45 ms device in _scan_blob_jit and
~70 ms in the finisher on config-1 shapes, while the standalone stage
profiles sum to far less -- XLA fusion of the derive/unpack stages into
consumers is the suspect. This tool times cumulative prefixes of the
actual blob program so the gap is attributable.

Run on TPU:  python tools/prof_blob.py
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


def loop_timer(stage_fn, label):
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
    print(f"{label:46s} {best / (K2 - K1) * 1e3:8.2f} ms", flush=True)


def main():
    import bench
    from gblastn_tpu.engine.seeding import (
        _build_batch_blob,
        allowed_bits,
    )
    from gblastn_tpu.io.query import build_query_block
    from gblastn_tpu.lut.builder import build_lookup_table, unmasked_locations
    from gblastn_tpu.ops.seeding import (
        pack_query_nibbles,
        seeding_scan_mini,
        subject_arrays_from_packed,
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

    co = qblock.context_offsets()
    ctx_cap = 64
    while ctx_cap + 1 < len(co):
        ctx_cap *= 2
    ctx_off = np.full(ctx_cap + 1, np.iinfo(np.int32).max, np.int32)
    ctx_off[: len(co)] = co
    xdrops = np.full(ctx_cap, 22, np.int32)

    blob = _build_batch_blob(
        ctx_off, xdrops, allowed_bits(lut.positions, qcap),
        len(lut.positions), qbuf,
    )
    d_blob = jnp.asarray(blob)
    d_packed = jnp.asarray(db.packed_padded())
    d_st = jnp.asarray(db.starts)
    d_en = jnp.asarray(db.starts + db.lengths)
    jax.block_until_ready((d_blob, d_packed))

    lut_word = lut.lut_word_size
    scan_step = lut.scan_step
    table_size = lut.table_size
    S = len(db.packed_padded()) * 4
    n_scan = (S - lut_word) // scan_step + 1
    pcap = qcap // 32
    o0 = 2 + (ctx_cap + 1) + 3 * ctx_cap + 256
    npos_full = qcap - lut_word + 1

    def blob_query(k):
        qw = jax.lax.slice(d_blob, (o0 + pcap,),
                           (o0 + pcap + qcap // 8,))
        sh = jnp.arange(8, dtype=jnp.int32) * 4
        query = (((qw[:, None] >> sh[None, :]) & 15)
                 .astype(jnp.uint8).reshape(-1))
        return query[k].astype(jnp.int32)

    def plus_words(k):
        qw = jax.lax.slice(d_blob, (o0 + pcap,),
                           (o0 + pcap + qcap // 8,))
        sh = jnp.arange(8, dtype=jnp.int32) * 4
        query = (((qw[:, None] >> sh[None, :]) & 15)
                 .astype(jnp.uint8).reshape(-1))
        words = jnp.zeros(npos_full, jnp.int32)
        for j in range(lut_word):
            words = words + (
                (query[j: j + npos_full].astype(jnp.int32) & 3)
                << (2 * (lut_word - 1 - j)))
        return words[k] + query[k].astype(jnp.int32)

    def plus_csr(k):
        qw = jax.lax.slice(d_blob, (o0 + pcap,),
                           (o0 + pcap + qcap // 8,))
        abits = jax.lax.slice(d_blob, (o0,), (o0 + pcap,))
        sh = jnp.arange(8, dtype=jnp.int32) * 4
        query = (((qw[:, None] >> sh[None, :]) & 15)
                 .astype(jnp.uint8).reshape(-1))
        words = jnp.zeros(npos_full, jnp.int32)
        for j in range(lut_word):
            words = words + (
                (query[j: j + npos_full].astype(jnp.int32) & 3)
                << (2 * (lut_word - 1 - j)))
        allowed = (((abits[:, None]
                     >> jnp.arange(32, dtype=jnp.int32)[None, :]) & 1)
                   .astype(bool).reshape(-1)[:npos_full])
        key = jnp.where(allowed, words, table_size)
        _w, pos = jax.lax.sort(
            (key, jax.lax.broadcasted_iota(jnp.int32, (npos_full,), 0)),
            num_keys=1, is_stable=True)
        counts = jnp.zeros(table_size, jnp.int32).at[key].add(
            1, mode="drop")
        offsets = jnp.concatenate(
            [jnp.zeros(1, jnp.int32),
             jnp.cumsum(counts, dtype=jnp.int32)])
        return pos[k] + offsets[k] + query[k].astype(jnp.int32)

    def plus_nib(k):
        qw = jax.lax.slice(d_blob, (o0 + pcap,),
                           (o0 + pcap + qcap // 8,))
        sh = jnp.arange(8, dtype=jnp.int32) * 4
        query = (((qw[:, None] >> sh[None, :]) & 15)
                 .astype(jnp.uint8).reshape(-1))
        return pack_query_nibbles(query)[k].astype(jnp.int32)

    def full_scan(k):
        from gblastn_tpu.engine.seeding import _scan_blob_jit
        out = _scan_blob_jit(
            d_blob + (k & 0), None, None, None,
            d_st, d_en, None, None,
            qcap=qcap, ctx_cap=ctx_cap, pcap=pcap,
            table_size=table_size, packed_mini=True,
            scan_step=scan_step, lut_word=lut_word, word_size=WORD,
            cmax=8, n_scan=n_scan, hit_cap=32768, seed_cap=32768,
            out_cap=16384, disc_offsets=None,
        )
        return out[0][k]

    def derive_plus_scan(k):
        s2, valid, sw = subject_arrays_from_packed(
            d_packed ^ (k & 0).astype(jnp.uint8), d_st, d_en)
        qw = jax.lax.slice(d_blob, (o0 + pcap,),
                           (o0 + pcap + qcap // 8,))
        sh = jnp.arange(8, dtype=jnp.int32) * 4
        query = (((qw[:, None] >> sh[None, :]) & 15)
                 .astype(jnp.uint8).reshape(-1))
        words = jnp.zeros(npos_full, jnp.int32)
        for j in range(lut_word):
            words = words + (
                (query[j: j + npos_full].astype(jnp.int32) & 3)
                << (2 * (lut_word - 1 - j)))
        abits = jax.lax.slice(d_blob, (o0,), (o0 + pcap,))
        allowed = (((abits[:, None]
                     >> jnp.arange(32, dtype=jnp.int32)[None, :]) & 1)
                   .astype(bool).reshape(-1)[:npos_full])
        key = jnp.where(allowed, words, table_size)
        _w, pos = jax.lax.sort(
            (key, jax.lax.broadcasted_iota(jnp.int32, (npos_full,), 0)),
            num_keys=1, is_stable=True)
        counts = jnp.zeros(table_size, jnp.int32).at[key].add(
            1, mode="drop")
        offsets = jnp.concatenate(
            [jnp.zeros(1, jnp.int32),
             jnp.cumsum(counts, dtype=jnp.int32)])
        qnib = pack_query_nibbles(query)
        out = seeding_scan_mini(
            s2, valid, offsets, pos, query,
            jnp.asarray(ctx_off), jnp.asarray(xdrops), d_st, d_en,
            query_nib=qnib, subject_w=sw,
            scan_step=scan_step, lut_word=lut_word, word_size=WORD,
            cmax=8, n_scan=n_scan, hit_cap=32768, seed_cap=32768,
            out_cap=16384, pos_base_static=0,
        )
        return out[0][k]

    loop_timer(blob_query, "A blob query unpack (1M)")
    loop_timer(plus_words, "B + rolling words")
    loop_timer(plus_nib, "A + pack_query_nibbles")
    loop_timer(plus_csr, "C + CSR sort/offsets")
    loop_timer(derive_plus_scan, "E derive + CSR + scan (hand)")
    loop_timer(full_scan, "F _scan_blob_jit (production)")




def one_jit_profile():
    """Slope the REAL _scan_finish_one_jit: packed-derived vs
    materialized subject operands (isolates the per-dispatch derive/
    prepare cost; element-indexed micro-stages get DCE'd by XLA and
    cannot see it)."""
    import bench
    from gblastn_tpu.engine.search import device_matrix16
    from gblastn_tpu.engine.seeding import (
        _build_batch_blob,
        _derive_material_jit,
        _scan_finish_one_jit,
        allowed_bits,
        diag_table_mask,
    )
    from gblastn_tpu.io.query import build_query_block
    from gblastn_tpu.lut.builder import build_lookup_table, unmasked_locations
    from gblastn_tpu.ops.pallas_ungapped import make_table64
    from gblastn_tpu.params.derived import nucl_score_table_packed

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
    co = qblock.context_offsets()
    ctx_cap = 64
    while ctx_cap + 1 < len(co):
        ctx_cap *= 2
    ctx_off = np.full(ctx_cap + 1, np.iinfo(np.int32).max, np.int32)
    ctx_off[: len(co)] = co
    xdrops = np.full(ctx_cap, 22, np.int32)
    cuts = np.full(ctx_cap, 16, np.int32)
    reds = np.full(ctx_cap, 14, np.int32)
    blob = _build_batch_blob(
        ctx_off, xdrops, allowed_bits(lut.positions, qcap),
        len(lut.positions), qbuf, cutoffs=cuts, reduced=reds,
        concat_end=len(qblock.buffer) - 1,
        table256=nucl_score_table_packed(1, -2),
    )
    d_blob = jnp.asarray(blob)
    d_packed = jnp.asarray(db.packed_padded())
    d_st = jnp.asarray(db.starts)
    d_en = jnp.asarray(db.starts + db.lengths)
    t64 = jnp.asarray(make_table64(device_matrix16(1, -2)))
    mat = _derive_material_jit(d_packed, d_st, d_en)
    jax.block_until_ready(mat)
    s2, valid, sw, sp = mat

    S = len(db.packed_padded()) * 4
    n_scan = (S - lut.lut_word_size) // lut.scan_step + 1
    dmask = diag_table_mask(len(qblock.buffer) - 2, 0)
    statics = dict(
        qcap=qcap, ctx_cap=ctx_cap, pcap=qcap // 32,
        table_size=lut.table_size, packed_mini=True,
        scan_step=lut.scan_step, lut_word=lut.lut_word_size,
        word_size=WORD, cmax=8, n_scan=n_scan,
        hit_cap=32768, seed_cap=32768, disc_offsets=None,
        alive_cap=16384, interpret=False, window=0, diag_mask=dmask,
        adm_cap=0, save_cap=16384, rr_zero=False, gate_cap=2048,
        ext_window=1024,
    )

    def packed_mode(k):
        out = _scan_finish_one_jit(
            d_blob.at[-1].set(k), d_packed, None, None, None, None,
            t64, d_st, d_en, None, None, **statics,
        )
        return out[0].astype(jnp.int32)

    def mat_mode(k):
        out = _scan_finish_one_jit(
            d_blob.at[-1].set(k), None, s2, valid, sw, sp,
            t64, d_st, d_en, None, None, **statics,
        )
        return out[0].astype(jnp.int32)

    loop_timer(packed_mode, "P one-jit, packed-derived subject")
    loop_timer(mat_mode, "M one-jit, materialized subject")


if __name__ == "__main__":
    import sys as _s
    if len(_s.argv) > 1 and _s.argv[1] == "one":
        one_jit_profile()
    else:
        main()
