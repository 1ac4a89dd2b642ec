"""Pallas TPU kernel: batched X-drop ungapped extension.

The XLA implementation (ops.seeding.ungapped_extend) is bound by random
HBM gathers: every while_loop chunk gathers [n, chunk] query/subject
bytes through three indirections. But each seed's extension reads two
CONTIGUOUS sequence windows -- exactly the access pattern TPU DMA
engines like. This kernel assigns one seed per grid step, DMAs the
+-WINDOW base windows around the seed into VMEM (the inputs carry
WINDOW guard bases on each side, so the window layout is static: seed
at index WINDOW), converts code pairs to scores with a one-hot matmul
against the 64-entry score table (MXU), and runs the exact X-drop
prefix-scan semantics of s_NuclUngappedExtendExact (na_ungapped.c:152;
the same recurrence as ops.seeding._xdrop_direction) on the VPU.

Sequence/subject boundaries are enforced by per-seed step clamps
(query sentinels additionally score NEG_BIG via the table), so the
kernel needs no validity mask. Extensions that would run past WINDOW
bases in either direction return a truncation flag; the host re-runs
those few seeds through the XLA path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_BIG = -(1 << 24)
WINDOW = 2048          # bases per direction held in VMEM


def _direction_scan(scores, max_steps, xdrop):
    """Exact reset-at-best X-drop over a [WINDOW] score vector.

    scores[j-1] is the score of 1-based step j. Returns (best,
    best_pos, bound_hit): best prefix sum (>= 0), its earliest step,
    and whether the walk was still live at min(max_steps, WINDOW)
    without an X-drop decision.
    """
    steps = (
        jax.lax.broadcasted_iota(jnp.int32, (WINDOW, 1), 0).reshape(
            WINDOW
        )
        + 1
    )
    sc = jnp.where(steps <= max_steps, scores, NEG_BIG)
    cs = jnp.cumsum(sc)
    runmax = jax.lax.associative_scan(jnp.maximum, cs)
    prev_best = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), runmax[:-1]]
    )
    prev_best = jnp.maximum(prev_best, 0)
    dropped = (cs - prev_best) < -xdrop
    any_drop = jnp.any(dropped)
    stop = jnp.where(
        any_drop,
        jnp.argmax(dropped).astype(jnp.int32) + 1,   # 1-based drop step
        jnp.minimum(max_steps, WINDOW),
    )
    live = steps <= stop
    cand = jnp.where(live, cs, NEG_BIG)
    best = jnp.maximum(jnp.max(cand), 0)
    is_best = jnp.where(live & (cs == best), steps, WINDOW + 1)
    best_pos = jnp.where(best > 0, jnp.min(is_best), 0)
    bound_hit = jnp.logical_not(any_drop) & (max_steps > WINDOW)
    return best, best_pos, bound_hit


SEEDS_PER_BLOCK = 8


def _kernel(
    # scalar prefetch
    q_off_ref, s_off_ref, valid_ref, xdrop_ref, max_l_ref, max_r_ref,
    # inputs
    query_hbm, query_rev_hbm, subject_hbm, subject_rev_hbm, table_ref,
    # outputs
    qs_ref, ss_ref, len_ref, score_ref, trunc_ref,
    # scratch
    qwin, swin, sem,
):
    blk = pl.program_id(0)
    qlen_p = query_hbm.shape[0]      # padded length
    slen_p = subject_hbm.shape[0]
    table = table_ref[:].astype(jnp.float32)

    def scores_for(qcodes, scodes):
        code = (
            jnp.clip(qcodes.astype(jnp.int32), 0, 15) * 4
            + jnp.clip(scodes.astype(jnp.int32), 0, 3)
        )
        onehot = (
            code[:, None]
            == jax.lax.broadcasted_iota(jnp.int32, (WINDOW, 64), 1)
        ).astype(jnp.float32)
        sc = jax.lax.dot_general(
            onehot, table[:, None],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(WINDOW)
        return sc.astype(jnp.int32)

    # one seed at a time within the block, with 2-slot scratch
    for k in range(SEEDS_PER_BLOCK):
        i = blk * SEEDS_PER_BLOCK + k
        q_off = q_off_ref[i]
        s_off = s_off_ref[i]

        # guard-padded inputs: original position p lives at padded
        # index p + WINDOW. Right steps j=1..W read original positions
        # [q_off, q_off+W) = padded [q_off+W, q_off+2W). Left steps
        # read (q_off - j) which in the REVERSED padded array (R[x] =
        # P[len-1-x]) is the ascending run starting at len - W - q_off.
        slot = k % 2
        ql0 = qlen_p - WINDOW - q_off
        sl0 = slen_p - WINDOW - s_off
        cps = [
            pltpu.make_async_copy(
                query_rev_hbm.at[pl.ds(ql0, WINDOW)],
                qwin.at[slot, 0], sem.at[4 * slot + 0],
            ),
            pltpu.make_async_copy(
                query_hbm.at[pl.ds(q_off + WINDOW, WINDOW)],
                qwin.at[slot, 1], sem.at[4 * slot + 1],
            ),
            pltpu.make_async_copy(
                subject_rev_hbm.at[pl.ds(sl0, WINDOW)],
                swin.at[slot, 0], sem.at[4 * slot + 2],
            ),
            pltpu.make_async_copy(
                subject_hbm.at[pl.ds(s_off + WINDOW, WINDOW)],
                swin.at[slot, 1], sem.at[4 * slot + 3],
            ),
        ]
        for c in cps:
            c.start()
        for c in cps:
            c.wait()

        q_left = qwin[slot, 0]
        s_left = swin[slot, 0]
        q_right = qwin[slot, 1]
        s_right = swin[slot, 1]

        xdrop = xdrop_ref[i]
        l_best, l_pos, l_bound = _direction_scan(
            scores_for(q_left, s_left), max_l_ref[i], xdrop
        )
        r_best, r_pos, r_bound = _direction_scan(
            scores_for(q_right, s_right), max_r_ref[i], xdrop
        )

        ok = valid_ref[i] != 0

        def bcast(v):
            return jnp.full((128,), v, jnp.int32)

        qs_ref[k, :] = bcast(jnp.where(ok, q_off - l_pos, 0))
        ss_ref[k, :] = bcast(jnp.where(ok, s_off - l_pos, 0))
        len_ref[k, :] = bcast(jnp.where(ok, l_pos + r_pos, 0))
        score_ref[k, :] = bcast(jnp.where(ok, l_best + r_best, 0))
        trunc_ref[k, :] = bcast(
            jnp.where(ok & (l_bound | r_bound), 1, 0)
        )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _call(
    query_padded, query_rev, subject_padded, subject_rev, table64,
    q_off, s_off, valid, x_dropoff, max_l, max_r, *, interpret,
):
    n = q_off.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(n // SEEDS_PER_BLOCK,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # query (HBM)
            pl.BlockSpec(memory_space=pl.ANY),   # query reversed
            pl.BlockSpec(memory_space=pl.ANY),   # subject (HBM)
            pl.BlockSpec(memory_space=pl.ANY),   # subject reversed
            pl.BlockSpec(memory_space=pltpu.VMEM),  # table
        ],
        out_specs=[
            pl.BlockSpec((SEEDS_PER_BLOCK, 128), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(5)
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 2, WINDOW), jnp.uint8),
            pltpu.VMEM((2, 2, WINDOW), jnp.int8),
            pltpu.SemaphoreType.DMA((8,)),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((n // SEEDS_PER_BLOCK * SEEDS_PER_BLOCK,
                              128), jnp.int32)
    ] * 5
    outs = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(
        q_off, s_off, valid, x_dropoff, max_l, max_r,
        query_padded, query_rev, subject_padded, subject_rev, table64,
    )
    return tuple(o[:, 0] for o in outs)


def ungapped_extend_pallas(
    query: jnp.ndarray,          # uint8[Q] BLASTNA (sentinel-separated)
    subject2: jnp.ndarray,       # int8[S] 2-bit codes
    table64: jnp.ndarray,        # int32[64] score for code q*4+s
    q_off: jnp.ndarray,          # int32[n] seed starts
    s_off: jnp.ndarray,
    valid: jnp.ndarray,          # bool[n]
    x_dropoff: jnp.ndarray,      # int32[n]
    subject_max_l: jnp.ndarray,  # int32[n] steps to the subject start
    subject_max_r: jnp.ndarray,  # int32[n] steps to the subject end
    *,
    interpret: bool = False,
):
    """Returns (q_start, s_start, length, score, truncated); exact
    ungapped_extend semantics for extensions within WINDOW bases.

    ``subject_max_l/r`` bound the walk to the seed's own subject (the
    validity-mask role: inter-subject padding must not be crossed).
    Inputs are guard-padded here; offsets passed to the kernel stay in
    original coordinates because the pad shifts cancel.
    """
    Q = query.shape[0]
    S = subject2.shape[0]
    qpad = jnp.full((WINDOW,), 15, jnp.uint8)
    query_p = jnp.concatenate([qpad, query.astype(jnp.uint8), qpad])
    spad = jnp.zeros((WINDOW,), jnp.int8)
    subject_p = jnp.concatenate([spad, subject2.astype(jnp.int8), spad])
    query_r = jnp.flip(query_p)
    subject_r = jnp.flip(subject_p)

    max_l = jnp.minimum(
        jnp.where(valid, jnp.minimum(q_off, s_off), 0), subject_max_l
    )
    max_r = jnp.minimum(
        jnp.where(valid, jnp.minimum(Q - q_off, S - s_off), 0),
        subject_max_r,
    )
    # the grid covers SEEDS_PER_BLOCK seeds per step: pad n up
    n = q_off.shape[0]
    pad = (-n) % SEEDS_PER_BLOCK

    def p32(x, fill=0):
        x = x.astype(jnp.int32)
        if pad:
            x = jnp.concatenate(
                [x, jnp.full((pad,), fill, jnp.int32)]
            )
        return x

    outs = _call(
        query_p, query_r, subject_p, subject_r,
        jnp.asarray(table64, jnp.int32),
        p32(q_off), p32(s_off), p32(valid.astype(jnp.int32)),
        p32(x_dropoff, 1), p32(max_l), p32(max_r),
        interpret=interpret,
    )
    return tuple(o[:n] for o in outs)


def make_table64(matrix16: np.ndarray) -> np.ndarray:
    """Flatten the BLASTNA x 2na matrix into the (q*4+s) code table."""
    m = np.asarray(matrix16, dtype=np.int64)[:16, :4]
    return np.clip(m.reshape(-1), NEG_BIG, None).astype(np.int32)
