"""Pallas TPU kernel: batched X-drop ungapped extension.

The XLA implementation (ops.seeding.ungapped_extend) is bound by random
HBM gathers: every while_loop chunk gathers [n, chunk] query/subject
bytes through three indirections. But each seed's extension reads one
CONTIGUOUS sequence window -- exactly the access pattern TPU DMA
engines like. This kernel processes SEEDS_PER_BLOCK seeds per grid
step as one [BROWS, 128] tile batch: a single DMA per seed per
sequence brings [off-WINDOW, off+WINDOW) of the guard-padded forward
array into VMEM (all DMAs issued before one wait), scores come from a
closed form over packed query bytes (equal to the 64-entry matrix
table, asserted at build), and the exact X-drop reset-at-best
recurrence of s_NuclUngappedExtendExact (na_ungapped.c:152) runs as
grouped log-roll prefix scans -- forward flat order for the right
direction, mirrored suffix order for the left (which sits unreversed
in the same window).

Sequence/subject boundaries are enforced by per-seed step clamps
(query sentinels additionally score NEG_BIG), so the kernel needs no
validity mask. Extensions that would run past WINDOW bases in either
direction return a truncation flag; the host re-runs those few seeds
through the XLA path.
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


ROWS = 16
COLS = 128  # ROWS * COLS == WINDOW


SEEDS_PER_BLOCK = 16
ALIGN = 4096                 # DMA start alignment in bases
BUF_ROWS = (WINDOW + ALIGN) // COLS   # rows per direction buffer
BUF2_ROWS = (2 * WINDOW + ALIGN) // COLS  # combined-window buffer
MAX_LANES = 16384   # per pallas_call: 6 scalar-prefetch int32 arrays
                    # must fit SMEM (~1MB)


def _scores_closed_form(qpacked, scodes2, table_ref):
    """Score from the packed query byte (4na mask | degeneracy << 4)
    and the 2-bit subject code; constants live at table_ref[64:70]
    (see make_table64). Equals the 64-entry table exactly."""
    qmask = jnp.bitwise_and(qpacked, 15)
    deg = jnp.right_shift(qpacked, 4)
    sbit = jnp.left_shift(1, jnp.clip(scodes2, 0, 3))
    member = jnp.bitwise_and(qmask, sbit) != 0
    exact = qmask == sbit
    amb = jnp.where(
        deg == 2, table_ref[66],
        jnp.where(deg == 3, table_ref[67], table_ref[68]),
    )
    return jnp.where(
        qmask == 0, table_ref[69],
        jnp.where(exact, table_ref[64],
                  jnp.where(member, amb, table_ref[65])),
    )


SUB = 8  # sublane alignment required for dynamic row slices


def _extract_window(ref, slot, o, out_rows):
    """[out_rows, COLS] window starting at flattened offset o (< ALIGN)
    of scratch ref[slot].

    Dynamic sublane slices must start at multiples of SUB rows, so the
    slice starts at the containing 8-row boundary; the residual row
    shift (< 8) uses a dynamic pltpu.roll, and the lane remainder a
    roll + cross-row carry select.
    """
    nrows = out_rows + SUB
    o_row8 = (o // (SUB * COLS)) * SUB
    o2 = o - o_row8 * COLS
    o2_row = o2 // COLS
    r = o2 % COLS
    x = ref[slot, pl.ds(o_row8, nrows), :].astype(jnp.int32)

    # dynamic sublane shifts: pltpu.roll accepts traced shift amounts
    y1 = pltpu.roll(x, (nrows - o2_row) % nrows, 0)
    y2 = pltpu.roll(x, (nrows - o2_row - 1) % nrows, 0)
    a = pltpu.roll(y1, (COLS - r) % COLS, 1)   # out[l] = in[(l+r)%C]
    b = pltpu.roll(y2, (COLS - r) % COLS, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (nrows, COLS), 1)
    out = jnp.where(lane < COLS - r, a, b)
    return out[0:out_rows, :]


BROWS = SEEDS_PER_BLOCK * ROWS  # batched tile rows (8 seeds x 16)


def _flat_scan_grouped(x2, op, identity, rows):
    """Inclusive scan over the flattened [rows*COLS] window of each
    seed group (carries masked at group boundaries)."""
    brows = x2.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (brows, COLS), 1)
    d = 1
    while d < COLS:
        sh = pltpu.roll(x2, d, 1)
        x2 = op(x2, jnp.where(col >= d, sh, identity))
        d *= 2
    rowg = jax.lax.broadcasted_iota(jnp.int32, (brows, 1), 0) % rows
    t = x2[:, COLS - 1:COLS]
    d = 1
    while d < rows:
        sh = pltpu.roll(t, d, 0)
        t = op(t, jnp.where(rowg >= d, sh, identity))
        d *= 2
    excl = jnp.where(rowg >= 1, pltpu.roll(t, 1, 0), identity)
    return op(x2, excl)


def _shift1_flat_grouped(x2, fill, rows):
    brows = x2.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (brows, COLS), 1)
    rowg = jax.lax.broadcasted_iota(jnp.int32, (brows, COLS), 0) % rows
    sh = pltpu.roll(x2, 1, 1)
    prev_last = pltpu.roll(x2[:, COLS - 1:COLS], 1, 0)
    prev_last = jnp.where(rowg[:, :1] >= 1, prev_last, fill)
    return jnp.where(col == 0, prev_last, sh)


def _flat_scan_grouped_rev(x2, op, identity, rows):
    """Suffix (right-to-left flattened) scan per seed group: the left
    extension window sits in FORWARD order in VMEM (one DMA covers both
    directions), so its step order is descending flat index."""
    brows = x2.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (brows, COLS), 1)
    d = 1
    while d < COLS:
        sh = pltpu.roll(x2, COLS - d, 1)       # out[i] = x[i + d]
        x2 = op(x2, jnp.where(col < COLS - d, sh, identity))
        d *= 2
    rowg = jax.lax.broadcasted_iota(jnp.int32, (brows, 1), 0) % rows
    t = x2[:, 0:1]                              # row totals (col 0)
    d = 1
    while d < rows:
        sh = pltpu.roll(t, brows - d, 0)       # out[r] = t[r + d]
        t = op(t, jnp.where(rowg < rows - d, sh, identity))
        d *= 2
    excl = jnp.where(rowg <= rows - 2, pltpu.roll(t, brows - 1, 0),
                     identity)
    return op(x2, excl)


def _shift1_flat_grouped_rev(x2, fill, rows):
    """x2 shifted one step in REVERSED flattened order (x[p+1])."""
    brows = x2.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (brows, COLS), 1)
    rowg = jax.lax.broadcasted_iota(jnp.int32, (brows, COLS), 0) % rows
    sh = pltpu.roll(x2, COLS - 1, 1)           # out[i] = x[i + 1]
    nxt_first = pltpu.roll(x2[:, 0:1], brows - 1, 0)
    nxt_first = jnp.where(rowg[:, :1] <= rows - 2, nxt_first, fill)
    return jnp.where(col == COLS - 1, nxt_first, sh)


def _make_kernel(window: int):
    """Build the batched extension kernel for a per-direction window of
    ``window`` bases (128 | window | window <= WINDOW). Smaller windows
    do proportionally less scan work. Extensions are sentinel-bounded
    by their query context, so a window >= max context length + margin
    never truncates; lanes whose walk does not resolve inside the
    window return the truncation flag and escalate to the XLA phase-2
    path."""
    rows_w = window // COLS
    brows = SEEDS_PER_BLOCK * rows_w
    buf2 = (2 * window + ALIGN) // COLS
    goff = WINDOW - window     # guard pad is WINDOW; window start shift

    def issue_block_dmas(b, sl, q_off_ref, s_off_ref,
                         query_hbm, subject_hbm, qwin, swin, sem):
        cps = []
        for k in range(SEEDS_PER_BLOCK):
            i = b * SEEDS_PER_BLOCK + k
            for idx, (src, dst, start0) in enumerate((
                (query_hbm, qwin, q_off_ref[i]),
                (subject_hbm, swin, s_off_ref[i]),
            )):
                start = start0 + goff
                arow = pl.multiple_of(
                    (start // ALIGN) * (ALIGN // COLS), ALIGN // COLS
                )
                cps.append(pltpu.make_async_copy(
                    src.at[pl.ds(arow, buf2)],
                    dst.at[sl, k],
                    sem.at[sl, 2 * k + idx],
                ))
        return cps

    def kernel(
        # scalar prefetch
        q_off_ref, s_off_ref, valid_ref, xdrop_ref, max_l_ref,
        max_r_ref,
        # inputs
        query_hbm, subject_hbm, table_ref,
        # outputs
        qs_ref, ss_ref, len_ref, score_ref, trunc_ref,
        # scratch
        qwin, swin, ql_c, qr_c, sl_c, sr_c, sem,
    ):
        """All seeds of a block processed as one [brows, 128] tile
        batch: ONE DMA per seed per sequence covers both extension
        directions ([off-window, off+window) of the guard-padded
        forward array); the left direction is evaluated in place with
        mirrored suffix scans. Window buffers are DOUBLE-BUFFERED
        across grid steps (block i's compute overlaps block i+1's
        DMAs) and per-seed reductions run as XOR-butterfly vector
        reductions."""
        blk = pl.program_id(0)
        nblk = pl.num_programs(0)
        slot = jax.lax.rem(blk, 2)

        def issue(b, sl):
            for c in issue_block_dmas(
                b, sl, q_off_ref, s_off_ref, query_hbm, subject_hbm,
                qwin, swin, sem,
            ):
                c.start()

        @pl.when(blk == 0)
        def _():
            issue(blk, slot)

        @pl.when(blk + 1 < nblk)
        def _():
            issue(blk + 1, 1 - slot)

        for c in issue_block_dmas(
            blk, slot, q_off_ref, s_off_ref, query_hbm, subject_hbm,
            qwin, swin, sem,
        ):
            c.wait()

        # ---- phase 2: extract [2*rows_w] windows, split left/right
        for k in range(SEEDS_PER_BLOCK):
            i = blk * SEEDS_PER_BLOCK + k
            sq = q_off_ref[i] + goff
            ssb = s_off_ref[i] + goff
            off_q = sq - (sq // ALIGN) * ALIGN
            off_s = ssb - (ssb // ALIGN) * ALIGN
            r0, r1 = k * rows_w, (k + 1) * rows_w
            qw = _extract_window(qwin.at[slot], k, off_q, 2 * rows_w)
            sw = _extract_window(swin.at[slot], k, off_s, 2 * rows_w)
            ql_c[r0:r1, :] = qw[0:rows_w, :]
            qr_c[r0:r1, :] = qw[rows_w: 2 * rows_w, :]
            sl_c[r0:r1, :] = sw[0:rows_w, :]
            sr_c[r0:r1, :] = sw[rows_w: 2 * rows_w, :]

        # ---- phase 3: batched scores + scans
        def scores_for(qpacked, scodes2):
            return _scores_closed_form(qpacked, scodes2, table_ref)

        rowgid = (
            jax.lax.broadcasted_iota(jnp.int32, (brows, 1), 0)
            // rows_w
        )

        def per_row(ref_read):
            v = jnp.zeros((brows, 1), jnp.int32)
            for k in range(SEEDS_PER_BLOCK):
                v = jnp.where(rowgid == k,
                              ref_read(blk * SEEDS_PER_BLOCK + k), v)
            return v

        xdrop_rows = per_row(lambda i: xdrop_ref[i])
        col = jax.lax.broadcasted_iota(jnp.int32, (brows, COLS), 1)
        rowg = jax.lax.broadcasted_iota(
            jnp.int32, (brows, COLS), 0
        ) % rows_w
        # right window: flat index p = step - 1 (ascending). left
        # window: step j reads flat index window - j (descending).
        steps_fwd = rowg * COLS + col + 1
        steps_rev = window - (rowg * COLS + col)

        def direction_fwd(scores2, max_steps_rows):
            sc = jnp.where(
                steps_fwd <= max_steps_rows, scores2, NEG_BIG
            )
            cs = _flat_scan_grouped(sc, jnp.add, 0, rows_w)
            runmax = _flat_scan_grouped(
                cs, jnp.maximum, NEG_BIG, rows_w
            )
            prev_best = jnp.maximum(
                _shift1_flat_grouped(runmax, 0, rows_w), 0
            )
            dropped = (cs - prev_best) < -xdrop_rows
            return cs, dropped

        def direction_rev(scores2, max_steps_rows):
            sc = jnp.where(
                steps_rev <= max_steps_rows, scores2, NEG_BIG
            )
            cs = _flat_scan_grouped_rev(sc, jnp.add, 0, rows_w)
            runmax = _flat_scan_grouped_rev(
                cs, jnp.maximum, NEG_BIG, rows_w
            )
            prev_best = jnp.maximum(
                _shift1_flat_grouped_rev(runmax, 0, rows_w), 0
            )
            dropped = (cs - prev_best) < -xdrop_rows
            return cs, dropped

        l_cs, l_drop = direction_rev(
            scores_for(ql_c[:, :], sl_c[:, :]),
            per_row(lambda i: max_l_ref[i]),
        )
        r_cs, r_drop = direction_fwd(
            scores_for(qr_c[:, :], sr_c[:, :]),
            per_row(lambda i: max_r_ref[i]),
        )

        # ---- phase 4: grouped vector reductions. Lane-reduce to
        # [brows, 1], then an XOR-butterfly over the rows_w rows of
        # each group (partner r ^ d stays inside the aligned group for
        # d < rows_w) leaves every row holding its group total.
        rowi = jax.lax.broadcasted_iota(jnp.int32, (brows, 1), 0)

        def group_reduce(lane_reduced, op):
            t = lane_reduced
            d = 1
            while d < rows_w:
                fwd = pltpu.roll(t, d, 0)          # out[r] = t[r - d]
                bwd = pltpu.roll(t, brows - d, 0)  # out[r] = t[r + d]
                t = op(t, jnp.where((rowi & d) != 0, fwd, bwd))
                d *= 2
            return t

        def reduce_dir(cs, dropped, max_steps_rows, steps):
            # flags stay int32 vectors ([brows, 1] i1 vectors trip
            # Mosaic truncation limits)
            any_dropi = group_reduce(
                jnp.max(jnp.where(dropped, 1, 0), axis=1,
                        keepdims=True),
                jnp.maximum,
            )
            first_drop = group_reduce(
                jnp.min(jnp.where(dropped, steps, window + 1),
                        axis=1, keepdims=True),
                jnp.minimum,
            )
            msr = jnp.minimum(max_steps_rows, window)
            stop = jnp.where(any_dropi > 0, first_drop, msr)
            live = steps <= stop
            cand = jnp.where(live, cs, NEG_BIG)
            best = jnp.maximum(group_reduce(
                jnp.max(cand, axis=1, keepdims=True), jnp.maximum
            ), 0)
            is_best = jnp.where(
                live & (cs == best), steps, window + 1
            )
            best_pos = jnp.where(best > 0, group_reduce(
                jnp.min(is_best, axis=1, keepdims=True), jnp.minimum
            ), 0)
            bound_hit = jnp.where(
                (any_dropi == 0) & (max_steps_rows > window), 1, 0
            )
            # walk exhausted its step budget (first "drop" is the
            # budget-mask sentinel, or no drop at all) rather than
            # making a genuine X-drop decision -- the caller decides
            # whether that budget was a true sequence end or an
            # artificial clamp needing escalation (block streaming)
            bound_stop = jnp.where(
                any_dropi > 0, jnp.where(first_drop > msr, 1, 0), 1
            )
            return best, best_pos, bound_hit, bound_stop

        l_best, l_pos, l_bound, l_stop = reduce_dir(
            l_cs, l_drop, per_row(lambda i: max_l_ref[i]), steps_rev
        )
        r_best, r_pos, r_bound, r_stop = reduce_dir(
            r_cs, r_drop, per_row(lambda i: max_r_ref[i]), steps_fwd
        )

        ok_rows = per_row(lambda i: valid_ref[i]) != 0
        q_rows = per_row(lambda i: q_off_ref[i])
        s_rows = per_row(lambda i: s_off_ref[i])
        qs_all = jnp.where(ok_rows, q_rows - l_pos, 0)
        ss_all = jnp.where(ok_rows, s_rows - l_pos, 0)
        len_all = jnp.where(ok_rows, l_pos + r_pos, 0)
        score_all = jnp.where(ok_rows, l_best + r_best, 0)
        # bit 0: window overrun (escalation); bits 1/2: left/right walk
        # ended at its step budget (block streaming buffer-edge
        # semantics)
        tr_all = jnp.where(
            ok_rows,
            jnp.where(l_bound + r_bound > 0, 1, 0)
            + 2 * l_stop + 4 * r_stop,
            0,
        )
        for k in range(SEEDS_PER_BLOCK):
            r0 = k * rows_w

            def bcast(v2):
                return jnp.full((128,), v2[r0, 0], jnp.int32)

            qs_ref[k, :] = bcast(qs_all)
            ss_ref[k, :] = bcast(ss_all)
            len_ref[k, :] = bcast(len_all)
            score_ref[k, :] = bcast(score_all)
            trunc_ref[k, :] = bcast(tr_all)

    return kernel, buf2, brows


@functools.partial(jax.jit, static_argnames=("interpret", "window"))
def _call_batched(
    query_padded, subject_padded, table64,
    q_off, s_off, valid, x_dropoff, max_l, max_r, *, interpret,
    window=WINDOW,
):
    n = q_off.shape[0]
    kernel, buf2, brows = _make_kernel(window)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(n // SEEDS_PER_BLOCK,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # query (HBM)
            pl.BlockSpec(memory_space=pl.ANY),      # subject (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # table
        ],
        out_specs=[
            pl.BlockSpec((SEEDS_PER_BLOCK, 128), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(5)
        ],
        scratch_shapes=[
            # leading 2: double-buffer slots (block i computes on
            # slot i%2 while block i+1's DMAs land in the other)
            pltpu.VMEM((2, SEEDS_PER_BLOCK, buf2, COLS), jnp.uint8),
            pltpu.VMEM((2, SEEDS_PER_BLOCK, buf2, COLS), jnp.int8),
            pltpu.VMEM((brows, COLS), jnp.int32),
            pltpu.VMEM((brows, COLS), jnp.int32),
            pltpu.VMEM((brows, COLS), jnp.int32),
            pltpu.VMEM((brows, COLS), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2 * SEEDS_PER_BLOCK)),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((n // SEEDS_PER_BLOCK * SEEDS_PER_BLOCK,
                              128), jnp.int32)
    ] * 5
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(
        q_off, s_off, valid, x_dropoff, max_l, max_r,
        query_padded, subject_padded, table64,
    )
    return tuple(o[:, 0] for o in outs)


def _pad_fwd(arr, fill, dtype):
    n0 = arr.shape[0]
    total = WINDOW + n0 + WINDOW + ALIGN
    total += (-total) % ALIGN
    right = total - WINDOW - n0
    fwd = jnp.concatenate([
        jnp.full((WINDOW,), fill, dtype),
        arr.astype(dtype),
        jnp.full((right,), fill, dtype),
    ])
    return fwd.reshape(-1, 128)


def prepare_query(query: jnp.ndarray):
    """Guard-padded query form (per batch).

    Bytes are PACKED as (4na mask | degeneracy << 4) so the kernel can
    score with the closed form; guard fill 0 = sentinel (mask 0)."""
    packed = jnp.asarray(_QUERY_PACK)[query.astype(jnp.int32)]
    return _pad_fwd(packed, 0, jnp.uint8)


def prepare_subject(subject2: jnp.ndarray):
    """Guard-padded subject form (per database -- cache alongside the
    other device-resident subject arrays)."""
    return _pad_fwd(subject2, 0, jnp.int8)


def prepare_padded(query: jnp.ndarray, subject2: jnp.ndarray):
    """Build both padded forms (convenience for tests)."""
    return (prepare_query(query), prepare_subject(subject2))


def ungapped_extend_pallas_prepared(
    prepared,                    # output of prepare_padded
    table64: jnp.ndarray,
    q_off: jnp.ndarray,
    s_off: jnp.ndarray,
    valid: jnp.ndarray,
    x_dropoff: jnp.ndarray,
    max_l: jnp.ndarray,          # per-seed left step bound
    max_r: jnp.ndarray,          # per-seed right step bound
    *,
    interpret: bool = False,
    window: int | None = WINDOW,
):
    if window is None:
        window = WINDOW
    query_p, subject_p = prepared
    n = q_off.shape[0]

    # scalar-prefetch arrays live in SMEM (~1MB): 6 int32 arrays cap
    # the lane count per kernel invocation; larger seed sets chunk
    if n > MAX_LANES:
        parts = [
            ungapped_extend_pallas_prepared(
                prepared, table64,
                q_off[i: i + MAX_LANES], s_off[i: i + MAX_LANES],
                valid[i: i + MAX_LANES], x_dropoff[i: i + MAX_LANES],
                max_l[i: i + MAX_LANES], max_r[i: i + MAX_LANES],
                interpret=interpret, window=window,
            )
            for i in range(0, n, MAX_LANES)
        ]
        return tuple(
            jnp.concatenate(cols) for cols in zip(*parts)
        )

    pad = (-n) % SEEDS_PER_BLOCK

    def p32(x, fill=0):
        x = x.astype(jnp.int32)
        if pad:
            x = jnp.concatenate(
                [x, jnp.full((pad,), fill, jnp.int32)]
            )
        return x

    outs = _call_batched(
        query_p, subject_p,
        jnp.asarray(table64, jnp.int32),
        p32(q_off), p32(s_off), p32(valid.astype(jnp.int32)),
        p32(x_dropoff, 1), p32(max_l), p32(max_r),
        interpret=interpret, window=window,
    )
    return tuple(o[:n] for o in outs)


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
    """
    Q = query.shape[0]
    S = subject2.shape[0]
    prepared = prepare_padded(query, subject2)
    max_l = jnp.minimum(
        jnp.where(valid, jnp.minimum(q_off, s_off), 0), subject_max_l
    )
    max_r = jnp.minimum(
        jnp.where(valid, jnp.minimum(Q - q_off, S - s_off), 0),
        subject_max_r,
    )
    return ungapped_extend_pallas_prepared(
        prepared, table64, q_off, s_off, valid, x_dropoff,
        max_l, max_r, interpret=interpret,
    )


def make_table64(matrix16: np.ndarray) -> np.ndarray:
    """(q*4+s) code table + closed-form score constants.

    Entries [0:64] hold the flattened BLASTNA x 2na table; [64:72] hold
    [reward, penalty, amb_deg2, amb_deg3, amb_deg4, sentinel, 0, 0].
    The kernels score with the closed form (the nucleotide matrix of
    BlastScoreBlkNuclMatrixCreate depends only on exact/member/
    degeneracy — asserted here), which needs ~10 VPU ops instead of a
    64-way select chain."""
    m = np.asarray(matrix16, dtype=np.int64)[:16, :4]
    table = np.clip(m.reshape(-1), NEG_BIG, None).astype(np.int32)
    consts = np.zeros(8, dtype=np.int32)
    consts[0] = table[0]          # reward  (A vs A)
    consts[1] = table[1]          # penalty (A vs C)
    consts[2] = table[4 * 4 + 0]  # amb deg2 member (R vs A)
    consts[3] = table[10 * 4 + 1]  # amb deg3 member (B vs C)
    consts[4] = table[14 * 4 + 0]  # amb deg4 member (N vs A)
    consts[5] = table[15 * 4 + 0]  # sentinel

    # verify the closed form reproduces the table exactly
    from gblastn_tpu.io.encoding import BLASTNA_TO_NCBI4NA

    for q in range(16):
        mask = int(BLASTNA_TO_NCBI4NA[q]) if q != 15 else 0
        deg = bin(mask).count("1")
        for s in range(4):
            if mask == 0:
                want = consts[5]
            elif mask == (1 << s):
                want = consts[0]
            elif mask & (1 << s):
                want = consts[deg]  # deg 2/3/4 -> consts[2]/[3]/[4]
            else:
                want = consts[1]
            assert table[q * 4 + s] == want, (q, s)
    return np.concatenate([table, consts])


# BLASTNA code -> packed (4na mask | degeneracy << 4); sentinel mask 0
def _make_query_pack_table() -> np.ndarray:
    from gblastn_tpu.io.encoding import BLASTNA_TO_NCBI4NA

    t = np.zeros(256, dtype=np.uint8)
    for q in range(16):
        mask = int(BLASTNA_TO_NCBI4NA[q]) if q != 15 else 0
        deg = bin(mask).count("1")
        t[q] = mask | (deg << 4)
    return t


_QUERY_PACK = _make_query_pack_table()
