"""Pallas TPU kernel: batched X-drop ungapped extension.

The XLA implementation (ops.seeding.ungapped_extend) is bound by random
HBM gathers: every while_loop chunk gathers [n, chunk] query/subject
bytes through three indirections. But each seed's extension reads one
CONTIGUOUS sequence window -- exactly the access pattern TPU DMA
engines like.

Round-5 layout (VERDICT item 1): 128 jobs ride the LANES of each
block; each seed's window arrives as one DMA per sequence covering
both directions, and the reset-at-best X-drop walk of
s_NuclUngappedExtendExact (na_ungapped.c:152) advances in 32-step
groups along the SUBLANE dimension (cumsum + running max + first-drop
per group -- the cheap direction for scans, shifts and reduces on
TPU), with a lax.while early exit once every lane has resolved.
Random seeds die within a group or two, so dense junk workloads pay
~1/30th of the old all-window flat scans. Scores come from a closed
form over packed query bytes (equal to the 64-entry matrix table,
asserted at build); query sentinels score NEG_BIG so extensions are
context-bounded; per-seed step clamps bound the walk to the owning
subject. Extensions that would run past ``window`` bases in either
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


SEEDS_PER_BLOCK = 128        # jobs per block (tile lanes)
G = 32                       # walk steps per group (early-exit grain)
ALIGN = 4096                 # DMA start alignment in bases
MAX_LANES = 16384   # per pallas_call: scalar-prefetch SMEM budget


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
    # dynamic sublane rotates need a multiple-of-8 sublane dimension
    nrows = -(-(out_rows + SUB) // SUB) * SUB
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


def _rev_sublanes(x):
    """Reverse the (power-of-two) sublane dimension: out[p] = x[N-1-p]
    via an XOR butterfly (reverse = index XOR (N-1))."""
    n = x.shape[0]
    subl = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    d = 1
    while d < n:
        dn = pltpu.roll(x, d, 0)        # out[p] = x[p - d]
        up = pltpu.roll(x, n - d, 0)    # out[p] = x[p + d]
        x = jnp.where((subl & d) != 0, dn, up)
        d *= 2
    return x


def _scan_sub(x, op, identity):
    """Inclusive scan over the sublane dimension (log rolls)."""
    n = x.shape[0]
    subl = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    d = 1
    while d < n:
        sh = pltpu.roll(x, d, 0)
        x = op(x, jnp.where(subl >= d, sh, identity))
        d *= 2
    return x


def _shift_down1(x, first_row):
    """x shifted one sublane down; row 0 takes ``first_row`` [1, C]."""
    subl = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    sh = pltpu.roll(x, 1, 0)
    return jnp.where(subl == 0, jnp.broadcast_to(first_row, x.shape),
                     sh)


def _make_kernel(window: int):
    """Batched bidirectional X-drop walk, one job per LANE.

    Round-5 redesign (VERDICT item 1): the old layout ran whole-window
    flat scans along the LANE dimension for 16 seeds per block -- all
    work up-front (every seed paid the full window regardless of where
    its walk died) on the expensive cross-lane primitives. Jobs now
    ride 128 LANES per block; the walk advances in G=32-step groups on
    the cheap sublane direction (cumsum + running max + first-drop per
    group, exactly the reset-at-best recurrence of
    s_NuclUngappedExtendExact, na_ungapped.c:152), with a lax.while
    early exit once every lane's walk has resolved -- random seeds die
    within a group or two, so dense junk costs ~1/30th of the old
    all-window scans. Left then right phases run sequentially over the
    same per-seed window DMA (left consumes the window reversed via an
    XOR-butterfly sublane flip at staging)."""
    nchunk = window // COLS
    assert window % COLS == 0 and nchunk >= 1
    SUPER = min(8, nchunk)       # chunks staged per extraction round
    assert nchunk % SUPER == 0
    # +16 rows: _extract_window reads up to 16 sublanes past its
    # 8-aligned start, and the worst-case ALIGN residual pushes the
    # final super-block's extraction right to the window end
    buf2 = (2 * window + ALIGN) // COLS + 16
    goff = WINDOW - window     # guard pad is WINDOW; window start shift
    C = SEEDS_PER_BLOCK
    BIGJ = (1 << 30)

    def kernel(
        # scalar prefetch
        q_off_ref, s_off_ref,
        # inputs
        valid_ref, x_ref, maxl_ref, maxr_ref,
        query_hbm, subject_hbm, table_ref,
        # outputs
        qs_ref, ss_ref, len_ref, score_ref, trunc_ref,
        # scratch
        qwin, swin, stq, sts, sem,
    ):
        blk = pl.program_id(0)

        cps = []
        for k in range(C):
            i = blk * C + k
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
                    dst.at[k],
                    sem.at[2 * k + idx],
                ))
        for c in cps:
            c.start()

        valid_v = valid_ref[0, 0:1, :] != 0
        x_v = x_ref[0, 0:1, :]
        maxl_v = maxl_ref[0, 0:1, :]
        maxr_v = maxr_ref[0, 0:1, :]

        for c in cps:
            c.wait()

        seedrow = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
        subl_g = jax.lax.broadcasted_iota(jnp.int32, (G, C), 0)

        def stage8(t, left, stq_ref, sts_ref):
            """Fill SUPER consecutive chunk planes ([COLS, C] each,
            transposed, left phases reversed) into scratch, so the
            expensive per-seed window extraction runs once per
            SUPER*COLS steps instead of once per chunk -- the staging
            was the dominant cost for long-running blocks."""
            exq = []
            exs = []
            for k in range(C):
                i = blk * C + k
                sq = q_off_ref[i] + goff
                ssb = s_off_ref[i] + goff
                off_q = sq - (sq // ALIGN) * ALIGN
                off_s = ssb - (ssb // ALIGN) * ALIGN
                if left:
                    o_q = off_q + (window - t - SUPER * COLS)
                    o_s = off_s + (window - t - SUPER * COLS)
                else:
                    o_q = off_q + window + t
                    o_s = off_s + window + t
                exq.append(_extract_window(qwin, k, o_q, SUPER))
                exs.append(_extract_window(swin, k, o_s, SUPER))
            for j in range(SUPER):
                # plane j covers steps t + j*COLS + 1 .. t + (j+1)*COLS;
                # left extraction is ascending bytes, so plane j is the
                # (SUPER-1-j)-th extracted row, reversed after transpose
                r = (SUPER - 1 - j) if left else j
                smq = jnp.zeros((C, COLS), jnp.int32)
                sms = jnp.zeros((C, COLS), jnp.int32)
                for k in range(C):
                    sel = seedrow == k
                    smq = jnp.where(sel, exq[k][r: r + 1, :], smq)
                    sms = jnp.where(sel, exs[k][r: r + 1, :], sms)
                qmat = smq.T
                smat = sms.T
                if left:
                    qmat = _rev_sublanes(qmat)
                    smat = _rev_sublanes(smat)
                stq_ref[j] = qmat
                sts_ref[j] = smat

        def run_phase(left, msr, stq_ref, sts_ref):
            """(best, best_pos, bound_hit, bound_stop), all [1, C].

            All carried [1, C] rows are produced by the same canonical
            pattern (last row of a sublane scan, extracted via
            roll+slice to sublane offset 0) -- mixed offset/replicated
            vector layouts in a lax.while carry fail Mosaic's scf.yield
            legalization."""
            zero_r = jnp.zeros((1, C), jnp.int32)
            zeros_m = jnp.zeros((COLS, C), jnp.int32)

            def last_row(x):
                return pltpu.roll(x, 1, 0)[0:1, :]

            def cond(carry):
                t, done = carry[0], carry[7]
                return jnp.logical_and(
                    t < window, jnp.logical_not(jnp.all(done > 0))
                )

            def body(carry):
                (t, qa, sa, s_car, p_car, best, bpos, done,
                 fdrop) = carry

                @pl.when(jax.lax.rem(t, SUPER * COLS) == 0)
                def _():
                    stage8(t, left, stq_ref, sts_ref)

                def load_plane(_):
                    c2 = jax.lax.rem(t // COLS, SUPER)
                    return (stq_ref[c2], sts_ref[c2])

                qa, sa = jax.lax.cond(
                    jax.lax.rem(t, COLS) == 0,
                    load_plane,
                    lambda _: (qa, sa),
                    None,
                )
                qg = qa[0:G, :]
                sg = sa[0:G, :]
                qa = pltpu.roll(qa, COLS - G, 0)
                sa = pltpu.roll(sa, COLS - G, 0)
                j = t + 1 + subl_g
                sc = _scores_closed_form(qg, sg, table_ref)
                sc = jnp.where(j <= msr, sc, NEG_BIG)
                cs = s_car + _scan_sub(sc, jnp.add, 0)
                rm = _scan_sub(cs, jnp.maximum, NEG_BIG)
                prev_best = jnp.maximum(_shift_down1(rm, p_car), 0)
                dropped = jnp.where(
                    (cs - prev_best) < -x_v, 1, 0
                )
                seen = _shift_down1(
                    _scan_sub(dropped, jnp.maximum, 0), zero_r
                )
                live = (done == 0) & (seen == 0)
                cand = jnp.where(live, cs, NEG_BIG)
                gbest = last_row(_scan_sub(cand, jnp.maximum, NEG_BIG))
                gpos = last_row(_scan_sub(
                    jnp.where(live & (cs == gbest), j, BIGJ),
                    jnp.minimum, BIGJ,
                ))
                improved = gbest > best
                best = jnp.where(improved, gbest, best)
                bpos = jnp.where(improved, gpos, bpos)
                dj = last_row(_scan_sub(
                    jnp.where((dropped > 0) & (done == 0), j, BIGJ),
                    jnp.minimum, BIGJ,
                ))
                fdrop = jnp.minimum(fdrop, dj)
                done = jnp.where(dj < BIGJ, 1, done)
                s_car = last_row(cs)
                p_car = jnp.maximum(p_car, last_row(rm))
                return (t + G, qa, sa, s_car, p_car, best, bpos,
                        done, fdrop)

            init = (
                jnp.int32(0), zeros_m, zeros_m,
                zero_r, jnp.full((1, C), NEG_BIG, jnp.int32),
                zero_r, zero_r,
                jnp.where(valid_v, 0, 1),
                jnp.full((1, C), BIGJ, jnp.int32),
            )
            (_t, _qa, _sa, _sc, _pc, best, bpos, _done, fdrop) = (
                jax.lax.while_loop(cond, body, init)
            )
            any_drop = fdrop < BIGJ
            msr_b = jnp.minimum(msr, window)
            bound_hit = jnp.where(
                jnp.logical_not(any_drop) & (msr > window), 1, 0
            )
            bound_stop = jnp.where(
                any_drop, jnp.where(fdrop > msr_b, 1, 0), 1
            )
            best = jnp.maximum(best, 0)
            bpos = jnp.where(best > 0, bpos, 0)
            return best, bpos, bound_hit, bound_stop

        l_best, l_pos, l_bound, l_stop = run_phase(
            True, maxl_v, stq, sts
        )
        r_best, r_pos, r_bound, r_stop = run_phase(
            False, maxr_v, stq, sts
        )

        lane_r = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
        q_row = jnp.zeros((1, C), jnp.int32)
        s_row = jnp.zeros((1, C), jnp.int32)
        for k in range(C):
            i = blk * C + k
            q_row = jnp.where(lane_r == k, q_off_ref[i], q_row)
            s_row = jnp.where(lane_r == k, s_off_ref[i], s_row)

        ok = valid_v
        qs_all = jnp.where(ok, q_row - l_pos, 0)
        ss_all = jnp.where(ok, s_row - l_pos, 0)
        len_all = jnp.where(ok, l_pos + r_pos, 0)
        score_all = jnp.where(ok, l_best + r_best, 0)
        # bit 0: window overrun (escalation); bits 1/2: left/right walk
        # ended at its step budget (block streaming buffer-edge
        # semantics)
        tr_all = jnp.where(
            ok,
            jnp.where(l_bound + r_bound > 0, 1, 0)
            + 2 * l_stop + 4 * r_stop,
            0,
        )
        qs_ref[0, 0:1, :] = qs_all
        ss_ref[0, 0:1, :] = ss_all
        len_ref[0, 0:1, :] = len_all
        score_ref[0, 0:1, :] = score_all
        trunc_ref[0, 0:1, :] = tr_all

    return kernel, buf2


@functools.partial(jax.jit, static_argnames=("interpret", "window"))
def _call_batched(
    query_padded, subject_padded, table64,
    q_off, s_off, valid, x_dropoff, max_l, max_r, *, interpret,
    window=WINDOW,
):
    n = q_off.shape[0]
    kernel, buf2 = _make_kernel(window)
    C = SEEDS_PER_BLOCK
    nblocks = n // C
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, 8, C), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),   # valid
            pl.BlockSpec((1, 8, C), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),   # x
            pl.BlockSpec((1, 8, C), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),   # max_l
            pl.BlockSpec((1, 8, C), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),   # max_r
            pl.BlockSpec(memory_space=pl.ANY),      # query (HBM)
            pl.BlockSpec(memory_space=pl.ANY),      # subject (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # table
        ],
        out_specs=[
            pl.BlockSpec((1, 8, C), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(5)
        ],
        scratch_shapes=[
            pltpu.VMEM((C, buf2, COLS), jnp.uint8),
            pltpu.VMEM((C, buf2, COLS), jnp.int8),
            pltpu.VMEM((8, COLS, C), jnp.int32),
            pltpu.VMEM((8, COLS, C), jnp.int32),
            pltpu.SemaphoreType.DMA((2 * C,)),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((nblocks, 8, C), jnp.int32)
        for _ in range(5)
    ]

    def v8(a):
        return jnp.broadcast_to(
            a.reshape(nblocks, 1, C), (nblocks, 8, C)
        )

    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(
        q_off, s_off,
        v8(valid), v8(x_dropoff), v8(max_l), v8(max_r),
        query_padded, subject_padded, table64,
    )
    return tuple(o[:, 0, :].reshape(-1) for o in outs)


def _pad_fwd(arr, fill, dtype):
    n0 = arr.shape[0]
    # tail covers the largest window DMA extent past the final valid
    # start (buf2 rows incl. the +16 extraction slack)
    total = WINDOW + n0 + WINDOW + ALIGN + 4096
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
