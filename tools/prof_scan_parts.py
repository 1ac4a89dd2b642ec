"""Micro-profiles for the scan redesign (round 4).

Answers, on real TPU, with the in-jit loop harness of
tools/prof_scan_rate.py (dispatch overhead cancels):

  1. random-gather throughput (the PV probe shape: n gathers into a
     512K-entry int32 table);
  2. PV BUILD cost (16M-entry compare + bit-pack) -- today rebuilt
     inside every scan dispatch;
  3. word compute: strided int8 slices (today) vs packed-u32 phase
     arithmetic (no gathers);
  4. sort-based compaction at the scan sizes;
  5. whether a Pallas kernel can vector-gather from a VMEM table
     (decides if the fused scan kernel can host the PV probe).

Run on TPU:  python tools/prof_scan_parts.py
"""
from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

S = 4_600_000
STEP = 17
LUT_W = 12
N_SCAN = (S - LUT_W) // STEP + 1
TABLE = 4 ** LUT_W
K1, K2 = 2, 10


def loop_timer(stage_fn, label, denom, unit="Gelem/s"):
    """stage_fn(x_int8_array) -> scalar; loops K inside one jit."""
    base = jnp.asarray(
        np.random.default_rng(0).integers(0, 4, S, dtype=np.int8)
    )

    def fn_k(K):
        @jax.jit
        def run():
            def body(c, k):
                return c + stage_fn(((base + k) & 3).astype(jnp.int8)), None
            t, _ = jax.lax.scan(
                body, jnp.zeros((), jnp.int32),
                jnp.arange(K, dtype=jnp.int8))
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
    print(f"{label:36s} {per * 1e3:8.3f} ms/iter  "
          f"{denom / per / 1e9:8.2f} {unit}")
    return per


def main():
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(1)
    pv = jnp.asarray(rng.integers(0, 1 << 31, TABLE // 32, np.int32))
    lut_off = jnp.asarray(
        np.sort(rng.integers(0, 130000, TABLE + 1)).astype(np.int32)
    )
    packed_np = rng.integers(0, 256, S // 4, np.uint8)
    packed = jnp.asarray(packed_np)
    w32 = jnp.asarray(
        packed_np.reshape(-1, 4).astype(np.uint32) @
        np.array([1 << 24, 1 << 16, 1 << 8, 1], np.uint32)
    )

    # 1. random gathers: n_scan probes into the 2MB pv table
    idx = jnp.asarray(rng.integers(0, TABLE // 32, N_SCAN, np.int32))

    def g_pv(x):
        i2 = (idx + x[:N_SCAN].astype(jnp.int32)) & (TABLE // 32 - 1)
        return pv[i2].sum()
    loop_timer(g_pv, f"1a gather {N_SCAN} from 2MB", N_SCAN)

    idx2 = jnp.asarray(rng.integers(0, TABLE, N_SCAN, np.int32))

    def g_lut(x):
        i2 = (idx2 + x[:N_SCAN].astype(jnp.int32)) & (TABLE - 1)
        return lut_off[i2].sum()
    loop_timer(g_lut, f"1b gather {N_SCAN} from 67MB", N_SCAN)

    def g_lut_small(x):
        i2 = (idx2[:16384] + x[:16384].astype(jnp.int32)) & (TABLE - 1)
        return lut_off[i2].sum()
    loop_timer(g_lut_small, "1c gather 16k from 67MB", 16384)

    # 2. PV build from offsets (today: inside every scan dispatch)
    def pv_build(x):
        present = (lut_off[1:] != lut_off[:-1])
        bits = present.reshape(TABLE // 32, 32).astype(jnp.int32)
        pvv = (bits << jax.lax.broadcasted_iota(
            jnp.int32, (1, 32), 1)).sum(axis=1, dtype=jnp.int32)
        return pvv.sum() + x[0].astype(jnp.int32)
    loop_timer(pv_build, "2  PV build 16M offsets", TABLE)

    # 3a. words via 12 strided int8 slices (today's fast path)
    def words_strided(s2):
        lim0 = (N_SCAN - 1) * STEP + 1
        w = jnp.zeros(N_SCAN, jnp.int32)
        for j in range(LUT_W):
            sl = jax.lax.slice(s2, (j,), (lim0 + j,), (STEP,))
            w = w + (sl.astype(jnp.int32) << (2 * (LUT_W - 1 - j)))
        return w.sum()
    loop_timer(words_strided, "3a words strided-slices", S, "Gbase/s")

    # 3b. words via packed u32: 2 gathers + variable shifts per lane
    pos = jnp.arange(N_SCAN, dtype=jnp.int32) * STEP

    def words_packed(x):
        w32x = w32 ^ x[: S // 16].astype(jnp.uint32)
        hi = w32x[pos >> 4]
        lo = w32x[jnp.minimum((pos >> 4) + 1, S // 16 - 1)]
        sh = (2 * (pos & 15)).astype(jnp.uint32)
        word = ((hi << sh) | jnp.where(
            sh == 0, 0, lo >> (32 - sh))) >> (32 - 2 * LUT_W)
        return word.astype(jnp.int32).sum()
    loop_timer(words_packed, "3b words packed-u32 2-gather", S, "Gbase/s")

    # 3c. words all positions via 16-phase elementwise + transpose
    def words_allpos(x):
        w32x = w32 ^ x[: S // 16].astype(jnp.uint32)
        lo = jnp.concatenate([w32x[1:], w32x[:1]])
        phases = []
        for k in range(16):
            sh = 2 * k
            v = (w32x << sh) | (lo >> (32 - sh) if sh else 0)
            phases.append(v >> (32 - 2 * LUT_W))
        allw = jnp.stack(phases, axis=1).reshape(-1)  # [S] pos order
        return allw.astype(jnp.int32)[pos].sum()
    loop_timer(words_allpos, "3c words all-pos + subsample", S, "Gbase/s")

    # 4. sort-based compaction at n_scan
    from gblastn_tpu.ops.seeding import compact_indices

    def comp(x):
        mask = (x[:N_SCAN] & 15) == 0
        i3, f3, nh = compact_indices(mask, 16384, 0)
        return i3.sum() + nh
    loop_timer(comp, f"4  compact {N_SCAN} -> 16k", N_SCAN)

    # 5. Pallas VMEM vector gather feasibility
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def gk(tab_ref, idx_ref, out_ref):
        out_ref[:] = tab_ref[idx_ref[:]]

    tab = jnp.asarray(rng.integers(0, 100, (TABLE // 32,), np.int32))
    gidx = jnp.asarray(
        rng.integers(0, TABLE // 32, (8, 128), np.int32))
    try:
        out = pl.pallas_call(
            gk,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, gidx)
        ok = np.array_equal(np.asarray(out), np.asarray(tab)[np.asarray(gidx)])
        print(f"5a pallas VMEM gather tab[idx]: OK correct={ok}")
    except Exception as e:
        print(f"5a pallas VMEM gather tab[idx]: FAIL {str(e)[:200]}")

    def gk2(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)

    try:
        out = pl.pallas_call(
            gk2,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, gidx)
        ok = np.array_equal(np.asarray(out), np.asarray(tab)[np.asarray(gidx)])
        print(f"5b pallas jnp.take: OK correct={ok}")
    except Exception as e:
        print(f"5b pallas jnp.take: FAIL {str(e)[:200]}")

    # timed pallas gather (if supported): full n_scan probes per call
    try:
        GN = 262144

        def gk3(tab_ref, idx_ref, out_ref):
            out_ref[:] = tab_ref[idx_ref[:]]

        @jax.jit
        def pall_g(i32):
            return pl.pallas_call(
                gk3,
                out_shape=jax.ShapeDtypeStruct((GN // 128, 128), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(tab, i32)

        bigidx = jnp.asarray(
            rng.integers(0, TABLE // 32, (GN // 128, 128), np.int32))
        jax.block_until_ready(pall_g(bigidx))

        def pg(x):
            return pall_g((bigidx + x[0].astype(jnp.int32))
                          & (TABLE // 32 - 1)).sum()
        loop_timer(pg, f"5c pallas gather {GN}", GN)
    except Exception as e:
        print(f"5c pallas gather timed: FAIL {str(e)[:200]}")


if __name__ == "__main__":
    main()
