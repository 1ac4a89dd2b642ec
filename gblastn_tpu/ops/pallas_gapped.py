"""Pallas TPU kernel: batched banded gapped-extension DP (score only).

The device twin of ops.gapped_ref.banded_dp_score (see that module for
the exact semantics and the soundness argument): a fixed 128-diagonal
band per seed, row-wavefront affine DP with closed-form horizontal-gap
scans, lazy per-row X-drop, and hazard flags (band edge / row budget).
The engine uses it as a rejection pre-filter in front of the exact host
aligners (VERDICT round-1 item 2); bench.py times it for the GCUPS
metric.

Layout: 32 seeds ride the sublanes of [32, 128] int32 tiles; lane l of
DP row i holds column j = i + l - 64, so the diagonal predecessor is
in-lane, the vertical one is a one-lane roll, and the horizontal (E)
recurrence is a 7-step log-roll prefix-max scan. Each seed's subject
and query windows arrive as ONE contiguous DMA each from guard-padded
HBM arrays (left extensions run forward over pre-reversed twins); the
bytes consumed per 128-row chunk are re-staged into step-major tiles so
each row needs only two dynamic lane extractions for the whole block.
Rows advance in chunks of 128 under the grid; a block whose seeds are
all dead skips its remaining chunks via an SMEM alive latch.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gblastn_tpu.ops.pallas_ungapped import (
    _extract_window,
    _scores_closed_form,
)

NEG = -(1 << 24)
W = 128                 # band width == lanes
HALF = W // 2
SEEDS = 32              # seeds per block (tile sublanes)
CHUNK = 128             # DP rows per grid step
ALIGN = 4096            # DMA start alignment (bases)
MAX_LANES = 16384       # scalar-prefetch SMEM budget (5 int32 arrays)

FLAG_EDGE = 1
FLAG_ROWS = 2


def _row_chunks(rows: int) -> int:
    return (rows + CHUNK - 1) // CHUNK


def _buf_rows(rows: int) -> int:
    # window bytes consumed by a full run: rows for A, rows + HALF for
    # B; DMA slice row counts must be sublane (8) aligned
    r = -(-(rows + HALF + 2 * ALIGN) // 128)
    return r + (-r) % 8


def _kernel(
    # scalar prefetch
    a_start_ref, b_start_ref, m_ref, n_ref, x_ref,
    # inputs
    a_hbm, b_hbm, table_ref,
    # outputs
    score_ref, ai_ref, bj_ref, flag_ref,
    # scratch
    awin, bwin, h_st, f_st, bb_st, acc_st, alive_ref, sem,
    *,
    rows: int,
    gap_open: int,
    gap_extend: int,
):
    blk = pl.program_id(0)
    chunk = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    oe = gap_open + gap_extend
    e = gap_extend

    lanes = jax.lax.broadcasted_iota(jnp.int32, (SEEDS, W), 1)
    seedrow = jax.lax.broadcasted_iota(jnp.int32, (SEEDS, W), 0)

    def seed_vec(ref):
        v = jnp.zeros((SEEDS, 1), jnp.int32)
        for k in range(SEEDS):
            v = jnp.where(seedrow[:, :1] == k,
                          ref[blk * SEEDS + k], v)
        return v

    m_v = seed_vec(m_ref)
    n_v = seed_vec(n_ref)
    x_v = jnp.maximum(seed_vec(x_ref), oe)

    # ---------------- chunk 0: DMA windows + state init
    @pl.when(chunk == 0)
    def _init():
        cps = []
        for k in range(SEEDS):
            i = blk * SEEDS + k
            for src, dst, start, idx in (
                (a_hbm, awin, a_start_ref[i], 0),
                (b_hbm, bwin, b_start_ref[i], 1),
            ):
                arow = pl.multiple_of(
                    (start // ALIGN) * (ALIGN // 128), ALIGN // 128
                )
                cps.append(pltpu.make_async_copy(
                    src.at[pl.ds(arow, awin.shape[1])],
                    dst.at[k],
                    sem.at[2 * k + idx],
                ))
        for c in cps:
            c.start()
        for c in cps:
            c.wait()

        # row-0 band: lane l holds column j0 = l - HALF
        jj0 = lanes - HALF
        h0 = jnp.where(
            jj0 == 0, 0, -gap_open - jj0 * e
        )
        h0 = jnp.where(
            (jj0 >= 0) & (jj0 <= n_v)
            & ((jj0 == 0) | (-gap_open - jj0 * e >= -x_v)),
            h0, NEG,
        )
        f0 = jnp.where(h0 > NEG // 2, h0 - oe, NEG)
        h_st[:, :] = h0
        f_st[:, :] = f0
        # accumulators: rows = [best, besti, bestj, flags, alive]
        edge0 = jnp.where(
            (n_v > HALF - 1) & (-gap_open - HALF * e >= -x_v),
            FLAG_EDGE, 0,
        )
        acc_st[0, :, :] = jnp.zeros((SEEDS, W), jnp.int32)      # best
        acc_st[1, :, :] = jnp.zeros((SEEDS, W), jnp.int32)      # besti
        acc_st[2, :, :] = jnp.zeros((SEEDS, W), jnp.int32)      # bestj
        acc_st[3, :, :] = jnp.broadcast_to(edge0, (SEEDS, W))   # flags
        acc_st[4, :, :] = jnp.ones((SEEDS, W), jnp.int32)       # alive
        alive_ref[0] = 1

    # ---------------- chunk body (skipped once every seed is dead)
    @pl.when(alive_ref[0] != 0)
    def _body():
        # stage this chunk's consumed bytes in step-major tiles:
        # asteps[k, t] = A byte of row chunk*128 + t + 1  (0-based t)
        asteps = jnp.zeros((SEEDS, W), jnp.int32)
        bsteps = jnp.zeros((SEEDS, W), jnp.int32)
        bband0 = jnp.zeros((SEEDS, W), jnp.int32)
        for k in range(SEEDS):
            i = blk * SEEDS + k
            off_a = a_start_ref[i] - (a_start_ref[i] // ALIGN) * ALIGN
            off_b = b_start_ref[i] - (b_start_ref[i] // ALIGN) * ALIGN
            # out_rows=8 keeps the dynamic rotate shape sublane-aligned
            # (Mosaic rejects 9x128); only row 0 is used
            row_a = _extract_window(awin, k, off_a + chunk * CHUNK, 8)
            # entering lane (l = W-1) of row i reads B[i + HALF - 2];
            # chunk-local t -> B index chunk*128 + t + HALF - 1
            row_b = _extract_window(
                bwin, k, off_b + chunk * CHUNK + HALF - 1, 8
            )
            sel = seedrow == k
            asteps = jnp.where(sel, row_a[0:1, :], asteps)
            bsteps = jnp.where(sel, row_b[0:1, :], bsteps)
            if True:  # band init bytes only needed at chunk == 0
                row_b0 = _extract_window(bwin, k, off_b, 8)
                bband0 = jnp.where(sel, row_b0[0:1, :], bband0)

        h_in = h_st[:, :]
        f_in = f_st[:, :]
        best_in = acc_st[0, :, 0:1]
        besti_in = acc_st[1, :, 0:1]
        bestj_in = acc_st[2, :, 0:1]
        flags_in = acc_st[3, :, 0:1]

        bb_in = jnp.where(
            chunk == 0,
            # bband[l] = B[l - HALF - 1] (column j reads B[j-1]);
            # roll right so lane l picks window byte l - (HALF + 1)
            pltpu.roll(bband0, HALF + 1, 1),
            bb_st[:, :],
        )

        ext_lanes = lanes * e

        def row_step(t, carry):
            h, f, bb, best, besti, bestj, flags = carry
            i = chunk * CHUNK + t + 1          # global row number
            # A byte for every seed: column t of asteps
            a_col = pltpu.roll(asteps, (W - t) % W, 1)[:, 0:1]
            # B byte entering the band at lane W-1
            b_col = pltpu.roll(bsteps, (W - t) % W, 1)[:, 0:1]
            bb = jnp.where(
                lanes == W - 1,
                jnp.broadcast_to(b_col, (SEEDS, W)),
                pltpu.roll(bb, W - 1, 1),
            )

            jj = i + lanes - HALF
            msc = _scores_closed_form(
                bb, jnp.clip(jnp.broadcast_to(a_col, (SEEDS, W)), 0, 3),
                table_ref,
            )
            row_ok = i <= m_v
            diag = jnp.where(
                (jj >= 1) & (jj <= n_v) & row_ok, h + msc, NEG
            )
            fv = jnp.where(lanes < W - 1, pltpu.roll(f, W - 1, 1), NEG)
            ht = jnp.maximum(diag, fv)
            u = jnp.where(ht > NEG // 2, ht + ext_lanes, NEG)
            # exclusive prefix max over lanes
            run = u
            d = 1
            while d < W:
                sh = pltpu.roll(run, d, 1)
                run = jnp.maximum(run, jnp.where(lanes >= d, sh, NEG))
                d *= 2
            excl = jnp.where(lanes >= 1, pltpu.roll(run, 1, 1), NEG)
            ee = jnp.where(excl > NEG // 2, excl - oe - ext_lanes, NEG)
            hn = jnp.maximum(ht, ee)
            hn = jnp.where((jj >= 0) & (jj <= n_v) & row_ok, hn, NEG)
            hn = jnp.where(best - hn > x_v, NEG, hn)
            live = hn > NEG // 2
            f = jnp.where(
                live, jnp.maximum(fv - e, hn - oe), fv
            )
            h = jnp.where(live, hn, NEG)

            rowmax = jnp.max(jnp.where(live, hn, NEG), axis=1,
                             keepdims=True)
            improved = rowmax > best
            lbest = jnp.min(
                jnp.where(live & (hn == rowmax), lanes, W + 1),
                axis=1, keepdims=True,
            )
            best = jnp.where(improved, rowmax, best)
            besti = jnp.where(improved, i, besti)
            bestj = jnp.where(improved, i + lbest - HALF, bestj)
            edge = jnp.max(
                jnp.where(live & ((lanes == 0) | (lanes == W - 1)),
                          1, 0),
                axis=1, keepdims=True,
            )
            flags = jnp.bitwise_or(
                flags, jnp.where(edge > 0, FLAG_EDGE, 0)
            )
            return h, f, bb, best, besti, bestj, flags

        h, f, bb, best, besti, bestj, flags = jax.lax.fori_loop(
            0, CHUNK,
            row_step,
            (h_in, f_in, bb_in, best_in, besti_in, bestj_in, flags_in),
        )

        alive_v = jnp.max(
            jnp.where(h > NEG // 2, 1, 0), axis=1, keepdims=True
        )
        # row budget exhausted while the sequence continues
        flags = jnp.where(
            (chunk == n_chunks - 1) & (alive_v > 0) & (rows < m_v),
            jnp.bitwise_or(flags, FLAG_ROWS), flags,
        )

        h_st[:, :] = h
        f_st[:, :] = f
        bb_st[:, :] = bb
        acc_st[0, :, :] = jnp.broadcast_to(best, (SEEDS, W))
        acc_st[1, :, :] = jnp.broadcast_to(besti, (SEEDS, W))
        acc_st[2, :, :] = jnp.broadcast_to(bestj, (SEEDS, W))
        acc_st[3, :, :] = jnp.broadcast_to(flags, (SEEDS, W))
        acc_st[4, :, :] = jnp.broadcast_to(alive_v, (SEEDS, W))
        alive_ref[0] = jnp.max(alive_v)

        score_ref[:, :] = acc_st[0, :, :]
        ai_ref[:, :] = acc_st[1, :, :]
        bj_ref[:, :] = acc_st[2, :, :]
        flag_ref[:, :] = acc_st[3, :, :]

    # a fully-dead block must still write its (frozen) outputs, because
    # each grid step maps to the same output block
    @pl.when((alive_ref[0] == 0) & (chunk > 0))
    def _frozen():
        score_ref[:, :] = acc_st[0, :, :]
        ai_ref[:, :] = acc_st[1, :, :]
        bj_ref[:, :] = acc_st[2, :, :]
        flag_ref[:, :] = acc_st[3, :, :]


@functools.partial(
    jax.jit,
    static_argnames=("rows", "gap_open", "gap_extend", "interpret"),
)
def _call(
    a_padded, b_padded, table64,
    a_start, b_start, m, n, x,
    *, rows, gap_open, gap_extend, interpret,
):
    nseeds = a_start.shape[0]
    bufr = _buf_rows(rows)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(nseeds // SEEDS, _row_chunks(rows)),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # A (HBM)
            pl.BlockSpec(memory_space=pl.ANY),      # B (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # table
        ],
        out_specs=[
            pl.BlockSpec((SEEDS, W), lambda i, c, *_: (i, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
        scratch_shapes=[
            pltpu.VMEM((SEEDS, bufr, 128), jnp.int8),
            pltpu.VMEM((SEEDS, bufr, 128), jnp.uint8),
            pltpu.VMEM((SEEDS, W), jnp.int32),
            pltpu.VMEM((SEEDS, W), jnp.int32),
            pltpu.VMEM((SEEDS, W), jnp.int32),
            pltpu.VMEM((5, SEEDS, W), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((2 * SEEDS,)),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((nseeds, W), jnp.int32) for _ in range(4)
    ]
    outs = pl.pallas_call(
        functools.partial(
            _kernel, rows=rows, gap_open=gap_open,
            gap_extend=gap_extend,
        ),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(a_start, b_start, m, n, x, a_padded, b_padded, table64)
    return tuple(o[:, 0] for o in outs)


def _pad_guard(arr, rows, dtype, reverse=False):
    """Guard-padded (and optionally reversed) [*, 128] HBM form; offset
    of original index i is GUARD + i (forward) / GUARD + len-1-i
    (reversed)."""
    guard = ALIGN
    n0 = arr.shape[0]
    if reverse:
        arr = jnp.flip(arr, 0)
    total = guard + n0 + rows + HALF + 2 * ALIGN
    total += (-total) % ALIGN
    out = jnp.concatenate([
        jnp.zeros((guard,), dtype),
        arr.astype(dtype),
        jnp.zeros((total - guard - n0,), dtype),
    ])
    return out.reshape(-1, 128)


def prepare_gapped_query(query, rows):
    """(B fwd, B rev) padded HBM forms, bytes packed for the
    closed-form scorer (pallas_ungapped._QUERY_PACK). Per query batch."""
    from gblastn_tpu.ops.pallas_ungapped import _QUERY_PACK

    packed = jnp.asarray(_QUERY_PACK)[query.astype(jnp.int32)]
    return (
        _pad_guard(packed, rows, jnp.uint8),
        _pad_guard(packed, rows, jnp.uint8, reverse=True),
    )


def prepare_gapped_subject(subject2, rows):
    """(A fwd, A rev) padded 2-bit-code HBM forms. Per database --
    cache alongside the other device-resident subject arrays."""
    return (
        _pad_guard(subject2, rows, jnp.int8),
        _pad_guard(subject2, rows, jnp.int8, reverse=True),
    )


def prepare_gapped_operands(query, subject2, rows):
    """(B fwd, B rev, A fwd, A rev) padded HBM forms (convenience)."""
    return prepare_gapped_query(query, rows) + prepare_gapped_subject(
        subject2, rows
    )


def banded_gapped_scores(
    operands,                 # prepare_gapped_operands output
    table64,
    q_len: int,
    s_len: int,
    q_seed: np.ndarray,       # int64[n] global query seed points
    s_seed: np.ndarray,       # int64[n] global subject seed points
    q_lo: np.ndarray,         # int64[n] query context lower bound
    q_hi: np.ndarray,         # upper bound (exclusive)
    s_lo: np.ndarray,
    s_hi: np.ndarray,
    x_drop: np.ndarray,       # int32[n] X-drop (kernel score scale)
    *,
    rows: int,
    gap_open: int,
    gap_extend: int,
    interpret: bool = False,
):
    """Left+right banded extension through each seed point; returns
    (total_score, flags) with flags != 0 marking seeds whose band score
    is not a certified upper bound (host fallback required).

    The right extension consumes subject bytes s_seed.. and query bytes
    q_seed..; the left extension consumes (reversed) bytes below the
    seed point, matching the host convention that the seed point itself
    belongs to the right side's row/column 1.
    """
    b_fwd, b_rev, a_fwd, a_rev = operands
    n = len(q_seed)
    if n == 0:
        return (np.zeros(0, np.int64), np.zeros(0, np.int32))
    guard = ALIGN

    def run(a_start, b_start, m, bn):
        # bucket the lane count so the grid's block dimension (and the
        # compiled program) doesn't vary with every candidate count;
        # pad seeds carry M=0 and die at row 1
        bucket = 128
        while bucket < n:
            bucket *= 4
        pad = min(bucket, MAX_LANES) - n if n <= MAX_LANES else (-n) % SEEDS

        def p32(v, fill=0):
            v = np.asarray(v, np.int64)
            v = np.clip(v, np.iinfo(np.int32).min,
                        np.iinfo(np.int32).max).astype(np.int32)
            if pad:
                v = np.concatenate([v, np.full(pad, fill, np.int32)])
            return jnp.asarray(v)

        outs = []
        for i in range(0, n + pad, MAX_LANES):
            sl = slice(i, i + MAX_LANES)
            outs.append(_call(
                a_start[2], b_start[2], table64,
                p32(a_start[0])[sl], p32(b_start[0])[sl],
                p32(m)[sl], p32(bn)[sl], p32(x_drop, 1)[sl],
                rows=rows, gap_open=gap_open, gap_extend=gap_extend,
                interpret=interpret,
            ))
        if len(outs) == 1:
            res = outs[0]
        else:
            res = tuple(jnp.concatenate(cols) for cols in zip(*outs))
        return tuple(np.asarray(r)[:n] for r in res)

    # right: first consumed A byte is subject[s_seed], B byte query[q_seed]
    r_score, _ai, _bj, r_flags = run(
        (guard + s_seed, None, a_fwd),
        (guard + q_seed, None, b_fwd),
        s_hi - s_seed, q_hi - q_seed,
    )
    # left: reversed arrays; first consumed byte is original index
    # s_seed - 1 -> reversed offset len - s_seed
    l_score, _ai, _bj, l_flags = run(
        (guard + s_len - s_seed, None, a_rev),
        (guard + q_len - q_seed, None, b_rev),
        s_seed - s_lo, q_seed - q_lo,
    )
    total = r_score.astype(np.int64) + l_score.astype(np.int64)
    return total, (r_flags | l_flags).astype(np.int32)
