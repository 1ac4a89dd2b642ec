"""Pallas TPU kernel: batched banded gapped-extension DP (score only).

The device twin of ops.gapped_ref.banded_dp_score (see that module for
the exact semantics and the soundness argument): a fixed 128-diagonal
band per seed, row-wavefront affine DP with closed-form horizontal-gap
scans, group-lazy X-drop, and hazard flags (band edge / row budget).
The engine uses it as a rejection pre-filter in front of the exact host
aligners (VERDICT round-1 item 2); bench.py times it for the GCUPS
metric.

Round-5 redesign (VERDICT round-4 item 1). Measured per-op costs on
v5e showed the old [seeds=32 sublanes, band=128 lanes] layout paid for
exactly the wrong primitives: cross-LANE rolls ~15-110 cycles, [S,1]
lane-broadcasts ~70, variable lane shifts ~120, lane reduces ~150 --
while sublane rolls are ~4 cycles, [1,C] sublane-broadcasts ~24, and
sublane reduces/scans ~16-50. So the layout is TRANSPOSED:

* the band's 128 positions ride the SUBLANES and 128 seeds ride the
  LANES of [128, 128] int32 tiles: band shifts, the horizontal-gap
  prefix scan, per-row byte broadcasts, and the X-drop reduce all move
  to the cheap sublane direction;
* per-seed bounds (m/n/x) arrive as lane-vector VMEM inputs (one
  [1, 128] row per block) instead of scalar-prefetch scatter loops;
* the query operand carries PACKED SCORES: one int32 per query byte
  holding the four biased int8 scores against subject codes 0..3, so
  the per-cell match score is shift+mask+bias with the score matrix
  baked in at operand build time;
* both extension directions run in ONE dispatch: forward and reversed
  operand arrays are concatenated at build time and the left jobs just
  carry offset starts (halves dispatch count and tunnel legs);
* X-drop uses a GROUP-LAZY best (the threshold refreshes every STEP=8
  rows), per-seed death latches at group boundaries, and the whole
  block exits its row loop early (lax.while_loop) once every seed is
  dead -- candidates that die in the first rows (the common case for a
  rejection filter) cost ~2 groups instead of the full row budget;
* the horizontal-gap prefix scan is TRUNCATED to the provable reach of
  a surviving gap run (see _scan_steps; bit-identical to the full
  scan);
* best-position tracking (ai/bj) is dropped -- the engine only
  consumes score+flags.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gblastn_tpu.ops.pallas_ungapped import _extract_window

NEG = -(1 << 24)
NEGH = NEG // 2
W = 128                 # band width == sublanes
HALF = W // 2
SEEDS = 128             # seeds per block (tile lanes)
STEP = 8                # rows per X-drop/death group (lag granularity)
GUARD = 256             # operand guard bases (>= HALF + 2)
ALIGN_A = 4096          # int8 HBM row-tile alignment (32 rows x 128)
ALIGN_B = 1024          # int32 HBM row-tile alignment (8 rows x 128)
BIAS = 128              # packed-score byte bias
MAX_LANES = 16384       # scalar-prefetch SMEM budget (2 int32 arrays)

FLAG_EDGE = 1
FLAG_ROWS = 2


def _buf_rows_a(rows: int) -> int:
    # _extract_window(o, 8) reads rows [o//1024*8, +16); max A offset
    # is off_a(< ALIGN_A) + t(<= rows-128)
    max_o = ALIGN_A - 1 + max(rows - 128, 0)
    return (max_o // 1024) * 8 + 16


def _buf_rows_b(rows: int) -> int:
    # max B offset is off_b(< ALIGN_B) + t(<= rows-128) + 128 + 127
    max_o = ALIGN_B - 1 + max(rows - 128, 0) + 255
    return (max_o // 1024) * 8 + 16


def _kernel(
    # scalar prefetch
    a_start_ref, b_start_ref,
    # inputs
    m_ref, n_ref, x_ref, a_hbm, b_hbm,
    # outputs
    score_ref, flag_ref,
    # scratch
    awin, bwin, sem,
    *,
    rows: int,
    gap_open: int,
    gap_extend: int,
    scan_steps: int,
):
    blk = pl.program_id(0)
    oe = gap_open + gap_extend
    e = gap_extend

    subl = jax.lax.broadcasted_iota(jnp.int32, (W, SEEDS), 0)
    seedrow = jax.lax.broadcasted_iota(jnp.int32, (SEEDS, 1), 0)

    # issue all window DMAs up front, tile-aligned starts (int8 rows
    # align to 32x128, int32 to 8x128); the residual offset is resolved
    # once per 128-row chunk during staging
    cps = []
    for k in range(SEEDS):
        i = blk * SEEDS + k
        arow = pl.multiple_of(
            (a_start_ref[i] // ALIGN_A) * (ALIGN_A // 128),
            ALIGN_A // 128,
        )
        bstart = b_start_ref[i] - (HALF + 1)
        brow = pl.multiple_of(
            (bstart // ALIGN_B) * (ALIGN_B // 128), ALIGN_B // 128
        )
        cps.append(pltpu.make_async_copy(
            a_hbm.at[pl.ds(arow, awin.shape[1])], awin.at[k],
            sem.at[2 * k],
        ))
        cps.append(pltpu.make_async_copy(
            b_hbm.at[pl.ds(brow, bwin.shape[1])], bwin.at[k],
            sem.at[2 * k + 1],
        ))
    for c in cps:
        c.start()

    m_v = m_ref[0, 0:1, :]
    n_v = n_ref[0, 0:1, :]
    x_v = jnp.maximum(x_ref[0, 0:1, :], oe)
    nvh = n_v + HALF

    for c in cps:
        c.wait()

    def stage_chunk(t, want_bb0):
        """Transposed byte planes for rows t+1 .. t+128 (t multiple of
        128): amat[u, k] = A code of row t+1+u, bmat[u, k] = packed
        B score word entering the band at row t+1+u; plus (when
        want_bb0) the row-0 band B words bb0[p, k] = B[p - HALF - 1]."""
        sma = jnp.zeros((SEEDS, W), jnp.int32)
        smb = jnp.zeros((SEEDS, W), jnp.int32)
        smz = jnp.zeros((SEEDS, W), jnp.int32)
        for k in range(SEEDS):
            i = blk * SEEDS + k
            off_a = a_start_ref[i] - (
                a_start_ref[i] // ALIGN_A) * ALIGN_A
            bstart = b_start_ref[i] - (HALF + 1)
            off_b = bstart - (bstart // ALIGN_B) * ALIGN_B
            sel = seedrow == k
            row_a = _extract_window(awin, k, off_a + t, 8)
            # B's entering byte of row i sits at window offset i + 127
            row_b = _extract_window(bwin, k, off_b + t + 128, 8)
            sma = jnp.where(sel, row_a[0:1, :], sma)
            smb = jnp.where(sel, row_b[0:1, :], smb)
            if want_bb0:
                row_z = _extract_window(bwin, k, off_b, 8)
                smz = jnp.where(sel, row_z[0:1, :], smz)
        if want_bb0:
            return sma.T, smb.T, smz.T
        return sma.T, smb.T

    # ---- row-0 band: sublane p holds column j0 = p - HALF
    jj0 = subl - HALF
    h0 = jnp.where(jj0 == 0, 0, -gap_open - jj0 * e)
    h0 = jnp.where((jj0 >= 0) & (jj0 <= n_v), h0, NEG)
    h0 = jnp.where((jj0 > 0) & (-gap_open - jj0 * e < -x_v), NEG, h0)
    h0 = jnp.where(m_v >= 1, h0, NEG)          # M <= 0 -> empty result
    f0 = jnp.where(h0 > NEGH, h0 - oe, NEG)

    ext = subl * e
    oeext = oe + ext
    last_mask = subl == W - 1

    # dynamic row bound: no seed runs past its own subject
    r_dyn = jnp.max(jnp.minimum(m_v, rows))
    r_dyn = (r_dyn + (STEP - 1)) // STEP * STEP

    amat0, bmat0, bb0 = stage_chunk(0, True)
    zeros_t = jnp.zeros((W, SEEDS), jnp.int32)

    def cond(carry):
        t, alive = carry[0], carry[1]
        return jnp.logical_and(t < r_dyn, alive > 0)

    def body(carry):
        t, alive, h, f, bb, aa, ba, bestlane = carry

        aa, ba = jax.lax.cond(
            jnp.logical_and(t > 0, jax.lax.rem(t, W) == 0),
            lambda _: stage_chunk(t, False),
            lambda _: (aa, ba),
            None,
        )

        # group-lazy X-drop threshold (refreshed every STEP rows)
        thr = jnp.maximum(
            jnp.max(bestlane, axis=0, keepdims=True), 0
        ) - x_v

        for u in range(STEP):
            i = t + 1 + u                      # global row number
            a_row = aa[0:1, :]
            aa = pltpu.roll(aa, W - 1, 0)
            b_row = ba[0:1, :]
            ba = pltpu.roll(ba, W - 1, 0)
            bb = jnp.where(
                last_mask, jnp.broadcast_to(b_row, (W, SEEDS)),
                pltpu.roll(bb, W - 1, 0),
            )
            msc = jnp.bitwise_and(
                jnp.right_shift(bb, a_row * 8), 255
            ) - BIAS
            hi_eff = jnp.where(i <= m_v, nvh - i, -1)
            le_hi = subl <= hi_eff
            diag = jnp.where(
                (subl >= HALF + 1 - i) & le_hi, h + msc, NEG
            )
            fv = jnp.where(last_mask, NEG, pltpu.roll(f, W - 1, 0))
            ht = jnp.maximum(diag, fv)
            run = ht + ext
            d = 1
            for _ in range(scan_steps):
                run = jnp.maximum(
                    run,
                    jnp.where(subl >= d, pltpu.roll(run, d, 0), NEG),
                )
                d *= 2
            excl = jnp.where(subl >= 1, pltpu.roll(run, 1, 0), NEG)
            hn = jnp.maximum(ht, excl - oeext)
            hn = jnp.where((subl >= HALF - i) & le_hi, hn, NEG)
            hn = jnp.where(hn < thr, NEG, hn)
            live = hn > NEGH
            # F kept sticky when the cell is pruned/dead (host quirk
            # dominance -- see gapped_ref docstring)
            f = jnp.where(live, jnp.maximum(fv - e, hn - oe), fv)
            h = hn
            bestlane = jnp.maximum(bestlane, hn)

        # per-seed death latch at group boundaries (twin-identical:
        # a dead seed can never revive through sticky F)
        seed_alive = jnp.max(h, axis=0, keepdims=True) > NEGH
        h = jnp.where(seed_alive, h, NEG)
        f = jnp.where(seed_alive, f, NEG)
        alive = jnp.max(jnp.where(seed_alive, 1, 0))
        return t + STEP, alive, h, f, bb, aa, ba, bestlane

    t_fin, _alive, h_fin, _f, _bb, _aa, _ba, bestlane = (
        jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.int32(1), h0, f0, bb0, amat0, bmat0,
             h0),
        )
    )

    best = jnp.maximum(jnp.max(bestlane, axis=0, keepdims=True), 0)
    edge = jnp.max(
        jnp.where((subl == 0) | last_mask, bestlane, NEG),
        axis=0, keepdims=True,
    ) > NEGH
    alive_fin = jnp.max(h_fin, axis=0, keepdims=True) > NEGH
    flags = (
        jnp.where(edge, FLAG_EDGE, 0)
        + jnp.where(alive_fin & (m_v > rows), FLAG_ROWS, 0)
    )
    score_ref[0, 0:1, :] = best
    flag_ref[0, 0:1, :] = flags


@functools.partial(
    jax.jit,
    static_argnames=(
        "rows", "gap_open", "gap_extend", "scan_steps", "interpret"
    ),
)
def _call(
    a_padded, b_padded,
    a_start, b_start, m, n, x,
    *, rows, gap_open, gap_extend, scan_steps, interpret,
):
    nseeds = a_start.shape[0]
    nblocks = nseeds // SEEDS
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, 8, SEEDS), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),   # m
            pl.BlockSpec((1, 8, SEEDS), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),   # n
            pl.BlockSpec((1, 8, SEEDS), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),   # x
            pl.BlockSpec(memory_space=pl.ANY),       # A (HBM)
            pl.BlockSpec(memory_space=pl.ANY),       # B (HBM)
        ],
        out_specs=[
            pl.BlockSpec((1, 8, SEEDS), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(2)
        ],
        scratch_shapes=[
            pltpu.VMEM((SEEDS, _buf_rows_a(rows), 128), jnp.int8),
            pltpu.VMEM((SEEDS, _buf_rows_b(rows), 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2 * SEEDS,)),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((nblocks, 8, SEEDS), jnp.int32)
        for _ in range(2)
    ]
    def v8(a):
        # (nblocks, 8, SEEDS) with data in row 0 (TPU block shapes
        # need the sublane dim divisible by 8)
        return jnp.broadcast_to(
            a.reshape(nblocks, 1, SEEDS), (nblocks, 8, SEEDS)
        )

    outs = pl.pallas_call(
        functools.partial(
            _kernel, rows=rows, gap_open=gap_open,
            gap_extend=gap_extend, scan_steps=scan_steps,
        ),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(
        a_start, b_start, v8(m), v8(n), v8(x), a_padded, b_padded,
    )
    return tuple(o[:, 0, :].reshape(-1) for o in outs)


def _pad_2d(arr, rows, dtype, tail, reverse=False):
    """Guard-padded (and optionally reversed) [*, 128] HBM form; offset
    of original index i is GUARD + i (forward) / GUARD + len-1-i
    (reversed). ``tail`` must cover the largest window DMA extent past
    the final valid start (buf_rows * 128)."""
    n0 = arr.shape[0]
    if reverse:
        arr = jnp.flip(arr, 0)
    total = GUARD + n0 + rows + tail
    total += (-total) % 128
    out = jnp.concatenate([
        jnp.zeros((GUARD,), dtype),
        arr.astype(dtype),
        jnp.zeros((total - GUARD - n0,), dtype),
    ])
    return out.reshape(-1, 128)


def _packed_score_table(matrix16) -> np.ndarray:
    """int32[16]: entry q holds the four biased scores of query byte q
    against subject codes 0..3, one per byte (code s at bits 8s)."""
    m = np.clip(
        np.asarray(matrix16, np.int64)[:16, :4], -BIAS + 8, BIAS - 1
    ).astype(np.int64)
    packed = np.zeros(16, np.uint32)
    for s in range(4):
        packed |= ((m[:, s] + BIAS).astype(np.uint32)) << (8 * s)
    return packed.view(np.int32)


def prepare_gapped_query(query, rows, matrix16):
    """(b_all, rev_offset): packed-score HBM form holding the forward
    sequence followed by its reverse; left-extension jobs address the
    reversed half via rev_offset. The score matrix is baked into the
    operand (one int32 per query byte holding its four subject-code
    scores)."""
    tab = jnp.asarray(_packed_score_table(matrix16))
    packed = tab[query.astype(jnp.int32)]
    fwd = _pad_2d(packed, rows, jnp.int32, 4096)
    rev = _pad_2d(packed, rows, jnp.int32, 4096, reverse=True)
    return (jnp.concatenate([fwd, rev]), fwd.shape[0] * 128)


def prepare_gapped_subject(subject2, rows):
    """(a_all, rev_offset): 2-bit-code HBM form, forward then reversed.
    Per database -- cache alongside the other device-resident subject
    arrays."""
    fwd = _pad_2d(subject2, rows, jnp.int8, 2 * ALIGN_A)
    rev = _pad_2d(subject2, rows, jnp.int8, 2 * ALIGN_A, reverse=True)
    return (jnp.concatenate([fwd, rev]), fwd.shape[0] * 128)


def prepare_gapped_operands(query, subject2, rows, matrix16):
    """(b_all, b_off, a_all, a_off) HBM forms (convenience)."""
    return prepare_gapped_query(
        query, rows, matrix16
    ) + prepare_gapped_subject(subject2, rows)


def _scan_steps(x_bound, gap_open, gap_extend, reward_max):
    """Provably sufficient truncated-scan depth: an E source g lanes
    back scores ht_k - oe - g*e with ht_k <= best_lagged + 9*reward
    (the group-lazy best lags <= 8 rows and one row adds <= reward), so
    g > (X + 9*reward - oe)/e can never pass the X-drop test; omitted
    sources change no surviving cell."""
    oe = gap_open + gap_extend
    if gap_extend <= 0:
        return 7
    g = (x_bound + 9 * max(reward_max, 0) - oe) // gap_extend + 1
    steps = 1
    while (1 << steps) - 1 < g and steps < 7:
        steps += 1
    return steps


def banded_gapped_scores(
    operands,                 # prepare_gapped_operands output
    matrix16,                 # int[16,4] score matrix (for scan bound)
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
    belongs to the right side's row/column 1. Both directions run as
    one fused dispatch (lanes [0, n) = right, [n, 2n) = left).
    """
    b_all, b_off, a_all, a_off = operands
    n = len(q_seed)
    if n == 0:
        return (np.zeros(0, np.int64), np.zeros(0, np.int32))

    # static scan depth from a pow2 bucket over the batch's max X
    oe = gap_open + gap_extend
    x_hi = max(int(np.max(x_drop)) if n else 1, oe, 1)
    x_bucket = 1
    while x_bucket < x_hi:
        x_bucket *= 2
    reward_max = int(np.max(np.asarray(matrix16, np.int64)[:16, :4]))
    steps = _scan_steps(x_bucket, gap_open, gap_extend, reward_max)

    q_seed = np.asarray(q_seed, np.int64)
    s_seed = np.asarray(s_seed, np.int64)
    a_start = np.concatenate([
        GUARD + s_seed, a_off + GUARD + s_len - s_seed
    ])
    b_start = np.concatenate([
        GUARD + q_seed, b_off + GUARD + q_len - q_seed
    ])
    m2 = np.concatenate([
        np.asarray(s_hi, np.int64) - s_seed,
        s_seed - np.asarray(s_lo, np.int64),
    ])
    n2 = np.concatenate([
        np.asarray(q_hi, np.int64) - q_seed,
        q_seed - np.asarray(q_lo, np.int64),
    ])
    x2 = np.concatenate([x_drop, x_drop])
    n_jobs = 2 * n

    # bucket the lane count so the grid (and the compiled program)
    # doesn't vary with every candidate count; pad jobs carry M=0 and
    # die at row 1
    bucket = 2 * SEEDS
    while bucket < n_jobs:
        bucket *= 2
    pad = (min(bucket, MAX_LANES) - n_jobs if n_jobs <= MAX_LANES
           else (-n_jobs) % SEEDS)

    def p32(v, fill=0):
        v = np.asarray(v, np.int64)
        v = np.clip(v, np.iinfo(np.int32).min,
                    np.iinfo(np.int32).max).astype(np.int32)
        if pad:
            v = np.concatenate([v, np.full(pad, fill, np.int32)])
        return jnp.asarray(v)

    outs = []
    for i in range(0, n_jobs + pad, MAX_LANES):
        sl = slice(i, i + MAX_LANES)
        outs.append(_call(
            a_all, b_all,
            p32(a_start, GUARD)[sl], p32(b_start, GUARD)[sl],
            p32(m2)[sl], p32(n2)[sl], p32(x2, 1)[sl],
            rows=rows, gap_open=gap_open, gap_extend=gap_extend,
            scan_steps=steps, interpret=interpret,
        ))
    if len(outs) == 1:
        score, flags = outs[0]
    else:
        score, flags = (jnp.concatenate(cols) for cols in zip(*outs))
    score = np.asarray(score)
    flags = np.asarray(flags)
    total = (score[:n].astype(np.int64)
             + score[n: n_jobs].astype(np.int64))
    return total, (flags[:n] | flags[n: n_jobs]).astype(np.int32)
