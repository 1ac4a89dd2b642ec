"""Micro-benchmark: stream-compaction strategies on TPU.

The seeding scan's dominant device cost (tools/prof_scan_rate.py) is
compacting ~sparse hit positions out of n_scan lanes: jnp.nonzero
(size=cap) costs ~3.7 ms at n=255k. The diagonal replay sorts hits on
host anyway, so compaction ORDER does not matter -- only the set.
Candidates:

  A nonzero        jnp.nonzero(mask, size=cap)             (baseline)
  B sort           jnp.sort(where(mask, pos, BIG))[:cap]
  C top_k          lax.top_k(where(mask, -pos, -BIG), cap)
  D scatter        zeros(cap).at[where(mask, rank, cap)].set(pos, drop)
  E grouped sort   reshape [G, L]; per-row sort; [:, :capg]
  F grouped iota   reshape [G, L]; per-row rank; onehot-dot on MXU

Run on TPU: python tools/prof_compaction.py [n] [cap]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
CAP = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
HIT_RATE = float(sys.argv[3]) if len(sys.argv) > 3 else 0.05
import os

K1 = int(os.environ.get("K1", "2"))
K2 = int(os.environ.get("K2", "10"))
BIG = np.int32(2**31 - 1)


def loop_timer(make_stage, label):
    d_base = jnp.asarray(
        (np.random.default_rng(0).random(N) < HIT_RATE).astype(np.int8)
    )

    def fk(K):
        @jax.jit
        def run():
            def body(carry, k):
                # perturb so XLA cannot CSE iterations
                mask = jnp.roll(d_base, k).astype(bool)
                return carry + make_stage(mask), None
            tot, _ = jax.lax.scan(
                body, jnp.zeros((), jnp.int32),
                jnp.arange(K, dtype=jnp.int32),
            )
            return tot
        return run

    fns = {k: fk(k) for k in (K1, K2)}
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
    ms = best / (K2 - K1) * 1e3
    print(f"{label:24s} {ms:8.3f} ms/iter")
    return ms


def main():
    print(f"device: {jax.devices()[0]}  n={N} cap={CAP} "
          f"hit_rate={HIT_RATE}")
    pos = jnp.arange(N, dtype=jnp.int32)

    def a_nonzero(mask):
        idx = jnp.nonzero(mask, size=CAP, fill_value=N - 1)[0]
        return idx.sum()

    def b_sort(mask):
        v = jnp.where(mask, pos, BIG)
        return jax.lax.sort(v)[:CAP].sum()

    def c_topk(mask):
        v = jnp.where(mask, -pos, -BIG)
        top, _ = jax.lax.top_k(v, CAP)
        return (-top).sum()

    def d_scatter(mask):
        rank = jnp.cumsum(mask.astype(jnp.int32)) - 1
        tgt = jnp.where(mask, rank, CAP)
        out = jnp.zeros(CAP, jnp.int32).at[tgt].set(pos, mode="drop")
        return out.sum()

    def make_grouped_sort(L, capg):
        G = N // L
        posg = pos.reshape(G, L)

        def f(mask):
            m = mask.reshape(G, L)
            v = jnp.where(m, posg, BIG)
            s = jax.lax.sort(v, dimension=1)[:, :capg]
            return s.sum()
        return f

    def make_grouped_dot(L, capg):
        G = N // L
        lane = jax.lax.broadcasted_iota(jnp.float32, (G, L), 1)

        def f(mask):
            m = mask.reshape(G, L)
            rank = jnp.cumsum(m.astype(jnp.int32), axis=1) - 1
            rank = jnp.where(m, rank, capg)
            onehot = (
                rank[:, :, None]
                == jax.lax.broadcasted_iota(jnp.int32, (G, L, capg), 2)
            ).astype(jnp.float32)
            out = jnp.einsum(
                "gl,glc->gc", lane, onehot,
                preferred_element_type=jnp.float32,
            )
            return out.astype(jnp.int32).sum()
        return f

    loop_timer(a_nonzero, "A nonzero")
    loop_timer(b_sort, "B global sort")
    loop_timer(c_topk, "C top_k")
    loop_timer(d_scatter, "D cumsum+scatter")
    loop_timer(make_grouped_sort(2048, CAP // (N // 2048)),
               "E grouped sort 2048")
    loop_timer(make_grouped_sort(512, max(CAP // (N // 512), 8)),
               "E grouped sort 512")
    loop_timer(make_grouped_dot(512, max(CAP // (N // 512), 8)),
               "F grouped dot 512")
    loop_timer(make_grouped_dot(128, 16), "F grouped dot 128x16")


if __name__ == "__main__":
    main()
