"""Preliminary gapped extension stage (host side).

Reimplements ``BLAST_GetGappedScore`` for the nucleotide greedy path
(reference: /root/reference/c++/src/algo/blast/core/blast_gapalign.c:3233)
and the per-subject post-processing of the prelim engine core
(blast_engine.c:503-509, :792-812):

1. walk saved init hits in score order;
2. skip hits whose ungapped region is contained in an already-saved HSP
   (interval-tree pruning -- gblastn_tpu.hits.ContainmentIndex);
3. greedy gapped extension (score-only) seeded at the middle of the
   ungapped alignment; keep HSPs scoring >= the per-context cutoff, with
   the aligner's best-start-point estimate as the gapped start;
4. purge common endpoints, round odd scores down (reward=2 systems),
   sort by score;
5. assign e-values from per-context effective search spaces and reap by
   the e-value threshold.

The subject here is the 2-bit packed buffer's codes (ambiguities already
randomized), exactly what the reference's compressed-subject greedy sees;
true-base rescoring happens in the traceback stage.
"""
from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from gblastn_tpu.gapped.dynprog import dyn_prog_nt_gapped_alignment
from gblastn_tpu.gapped.greedy import greedy_gapped_alignment
from gblastn_tpu.hits import (
    HSP,
    HSPList,
    ContainmentIndex,
    adjust_odd_scores,
    get_evalues,
    purge_common_endpoints,
    reap_by_evalue,
    sort_by_score,
)
from gblastn_tpu.engine.seeding import InitHits
from gblastn_tpu.io.query import QueryBlock
from gblastn_tpu.params.derived import SearchParams
from gblastn_tpu.params.options import ExtensionMethod
from gblastn_tpu.stats.karlin import nucl_score_matrix
from gblastn_tpu.utils.profiling import slog


@dataclass
class DeviceGappedData:
    """Device-side banded-DP rejection filter context (ops.pallas_gapped).

    ``dbl`` is the score scale the kernel runs in relative to the host
    aligner's reported scores (2 when the host greedy works in doubled
    units, else 1); ``margin`` absorbs the rare pruning-order
    underestimate documented in ops.gapped_ref."""

    query_ops: tuple               # (b_fwd, b_rev) packed-score arrays
    subject_ops: tuple             # (a_fwd, a_rev)
    matrix16: object               # np int32[16, 4] kernel-scale matrix
    rows: int
    dbl: int
    gap_open: int                  # kernel scale
    gap_extend: int
    x_drop: int                    # kernel scale
    margin: int                    # kernel scale
    q_len: int
    s_len: int
    interpret: bool = False


def device_gapped_params(opts, gap_x_dropoff: int):
    """(matrix16, dbl, gap_open, gap_extend, x_drop) for the kernel's
    score scale, mirroring the host aligner drivers
    (gapped.greedy.greedy_gapped_alignment scale conversions and
    gapped.dynprog.dyn_prog_nt_gapped_alignment)."""
    from gblastn_tpu.ops.pallas_gapped import NEG
    from gblastn_tpu.stats.karlin import nucl_score_matrix

    r, p = opts.reward, opts.penalty
    if opts.extension_method is ExtensionMethod.GREEDY:
        if opts.gap_open == 0 and opts.gap_extend == 0:
            # non-affine greedy == affine DP at (2r, 2p, open 0,
            # extend r - 2p) in doubled units
            dbl, go, ge = 2, 0, r - 2 * p
        elif r % 2 == 1:
            dbl, go, ge = 2, 2 * opts.gap_open, 2 * opts.gap_extend
        else:
            dbl, go, ge = 1, opts.gap_open, opts.gap_extend
        # greedy match semantics: code < 4 and equal, else mismatch
        m = np.full((16, 4), dbl * p, np.int32)
        for c in range(4):
            m[c, c] = dbl * r
        m[15, :] = NEG
        return m, dbl, go, ge, dbl * gap_x_dropoff
    m = np.asarray(nucl_score_matrix(r, p), np.int32)[:16, :4]
    return m, 1, opts.gap_open, opts.gap_extend, gap_x_dropoff


def build_device_gapped(
    qblock: QueryBlock,
    params: SearchParams,
    subject_ops,                   # prepare_gapped_subject output
    rows: int,
    s_len: int,
    interpret: bool = False,
) -> DeviceGappedData:
    import jax.numpy as jnp

    from gblastn_tpu.ops.pallas_gapped import prepare_gapped_query

    opts = params.options
    matrix, dbl, go, ge, xd = device_gapped_params(
        opts, params.gap_x_dropoff
    )
    # the X-drop schedule differences (lazy per-row vs greedy's
    # distance-delayed test) underestimate the host score by <= 10
    # doubled units over 1500 adversarial trials; 16*dbl gives 3x
    # headroom (tests/test_gapped_device.py measures this)
    margin = int(os.environ.get("GBLASTN_TPU_GAPPED_MARGIN", "0")) or (
        16 * dbl
    )
    # bucket the query buffer to a pow2 length so the padded-operand
    # shapes (and hence the compiled prep + kernel programs) are stable
    # across batches; the raw length varies with every batch and would
    # recompile ~7s of programs per search. Pad bytes are sentinels
    # (NEG matrix row) and sit outside every band's q_hi bound anyway.
    qbuf = np.asarray(qblock.buffer)
    qcap = 1024
    while qcap < len(qbuf):
        qcap *= 2
    qpad = np.full(qcap, 15, np.uint8)
    qpad[: len(qbuf)] = qbuf
    return DeviceGappedData(
        query_ops=prepare_gapped_query(
            jnp.asarray(qpad), rows, matrix
        ),
        subject_ops=subject_ops,
        matrix16=np.asarray(matrix, np.int32),
        rows=rows, dbl=dbl, gap_open=go, gap_extend=ge, x_drop=xd,
        margin=margin, q_len=qcap, s_len=s_len,
        interpret=interpret,
    )


def device_gapped_rejects(
    init: InitHits,
    qblock: QueryBlock,
    subject_starts: np.ndarray,
    subject_lengths: np.ndarray,
    params: SearchParams,
    dgd: DeviceGappedData,
) -> np.ndarray:
    """bool[n] mask of candidates the banded device DP certifies can
    NOT reach their context cutoff (flag-free band score + margin below
    cutoff); the host walk skips extending these. Admitted candidates
    are still extended exactly on host, so saved HSPs are identical to
    the host-only path."""
    from gblastn_tpu.ops.pallas_gapped import banded_gapped_scores

    n = len(init)
    opts = params.options
    ctx = np.asarray(init.context, np.int64)
    ctx_off = qblock.context_offsets().astype(np.int64)
    ctx_len = np.array(
        [c.length for c in qblock.contexts], np.int64
    )
    q_lo = ctx_off[ctx]
    q_hi = q_lo + ctx_len[ctx]
    oid = np.asarray(init.oid, np.int64)
    s_lo = np.asarray(subject_starts, np.int64)[oid]
    s_hi = s_lo + np.asarray(subject_lengths, np.int64)[oid]

    if opts.extension_method is ExtensionMethod.GREEDY:
        # greedy seeds at the middle of the ungapped alignment
        # (blast_gapalign.c:3466-3471)
        q_seed = np.asarray(init.q_start, np.int64) + (
            np.asarray(init.length, np.int64) // 2
        )
        s_seed = np.asarray(init.s_start, np.int64) + (
            np.asarray(init.length, np.int64) // 2
        )
    else:
        # DP split point: the byte-boundary adjustment of
        # s_BlastDynProgNtGappedAlignment (blast_gapalign.c:2762) on
        # top of the first-all-match-byte start selection (:3486-3499)
        q_off = np.asarray(init.q_off, np.int64).copy()
        s_off = np.asarray(init.s_off, np.int64).copy()
        us = np.asarray(init.s_start, np.int64)
        ln = np.asarray(init.length, np.int64)
        adj3 = us + ln >= s_off + 8
        q_off[adj3] += 3
        s_off[adj3] += 3
        s_loc = s_off - s_lo
        adjust = 4 - (s_loc % 4)
        q_seed = q_off + adjust
        s_seed = s_off + adjust
        over = (q_seed > q_hi) | (s_seed > s_hi)
        q_seed[over] -= 4
        s_seed[over] -= 4

    x = np.full(n, dgd.x_drop, np.int32)
    total, flags = banded_gapped_scores(
        dgd.query_ops + dgd.subject_ops, dgd.matrix16,
        dgd.q_len, dgd.s_len,
        q_seed, s_seed, q_lo, q_hi, s_lo, s_hi, x,
        rows=dgd.rows, gap_open=dgd.gap_open,
        gap_extend=dgd.gap_extend, interpret=dgd.interpret,
    )
    cutoff = np.array(
        [c.cutoff_score for c in params.contexts], np.int64
    )[ctx]
    reject = (flags == 0) & (total < dgd.dbl * cutoff - dgd.margin)
    slog.diagnostics.device_gapped_rejects += int(reject.sum())
    return reject


def _walk_native(
    qblock: QueryBlock,
    subject2: np.ndarray,
    subject_start: int,
    init_order: np.ndarray,
    init: InitHits,
    params: SearchParams,
    reject: np.ndarray | None,
) -> list[HSP] | None:
    """native/prelim.cpp fast path for the per-subject walk; None = use
    the Python loop (identical semantics, asserted by tests)."""
    from gblastn_tpu.native import get_lib

    lib = get_lib()
    if lib is None:
        return None
    opts = params.options
    order = np.asarray(init_order, np.int64)
    n = len(order)
    if n == 0:
        return []
    ctx = np.ascontiguousarray(np.asarray(init.context)[order], np.int32)
    uq = np.ascontiguousarray(np.asarray(init.q_start)[order], np.int64)
    us = np.ascontiguousarray(
        np.asarray(init.s_start)[order].astype(np.int64) - subject_start
    )
    ln = np.ascontiguousarray(np.asarray(init.length)[order], np.int64)
    sc = np.ascontiguousarray(np.asarray(init.score)[order], np.int64)
    qo = np.ascontiguousarray(np.asarray(init.q_off)[order], np.int64)
    so = np.ascontiguousarray(
        np.asarray(init.s_off)[order].astype(np.int64) - subject_start
    )
    rej_ptr = 0
    if reject is not None:
        rej = np.ascontiguousarray(
            np.asarray(reject)[order].astype(np.uint8)
        )
        rej_ptr = rej.ctypes.data
    ctx_off = np.ascontiguousarray(
        qblock.context_offsets()[:-1], np.int64
    )
    ctx_len = np.ascontiguousarray(
        [c.length for c in qblock.contexts], np.int64
    )
    cutoff = np.ascontiguousarray(
        [c.cutoff_score for c in params.contexts], np.int64
    )
    greedy = opts.extension_method is ExtensionMethod.GREEDY
    mat_ptr = 0
    if not greedy:
        mat = np.ascontiguousarray(
            nucl_score_matrix(opts.reward, opts.penalty), np.int32
        )
        mat_ptr = mat.ctypes.data
    sub = np.ascontiguousarray(subject2, np.uint8)
    qbuf = np.ascontiguousarray(qblock.buffer, np.uint8)
    o_qo = np.empty(n, np.int64)
    o_qe = np.empty(n, np.int64)
    o_so = np.empty(n, np.int64)
    o_se = np.empty(n, np.int64)
    o_sc = np.empty(n, np.int64)
    o_cx = np.empty(n, np.int32)
    o_qg = np.empty(n, np.int64)
    o_sg = np.empty(n, np.int64)
    n_ext = np.zeros(1, np.int64)
    k = lib.gblastn_gapped_prelim_walk(
        qbuf.ctypes.data, len(qbuf), sub.ctypes.data, len(sub),
        n, ctx.ctypes.data, uq.ctypes.data, us.ctypes.data,
        ln.ctypes.data, sc.ctypes.data, qo.ctypes.data, so.ctypes.data,
        rej_ptr, ctx_off.ctypes.data, ctx_len.ctypes.data,
        cutoff.ctypes.data, 0 if greedy else 1,
        opts.reward, opts.penalty, opts.gap_open, opts.gap_extend,
        params.gap_x_dropoff, opts.min_diag_separation, mat_ptr,
        o_qo.ctypes.data, o_qe.ctypes.data, o_so.ctypes.data,
        o_se.ctypes.data, o_sc.ctypes.data, o_cx.ctypes.data,
        o_qg.ctypes.data, o_sg.ctypes.data, n_ext.ctypes.data,
    )
    if k < 0:
        return None
    slog.diagnostics.gapped_extensions += int(n_ext[0])
    saved: list[HSP] = []
    for j in range(int(k)):
        c = int(o_cx[j])
        saved.append(HSP(
            q_off=int(o_qo[j]), q_end=int(o_qe[j]),
            s_off=int(o_so[j]), s_end=int(o_se[j]),
            score=int(o_sc[j]), context=c,
            q_frame=qblock.contexts[c].frame, s_frame=1,
            q_gapped_start=int(o_qg[j]), s_gapped_start=int(o_sg[j]),
        ))
    return saved


def get_gapped_score_one_subject(
    qblock: QueryBlock,
    subject2: np.ndarray,          # uint8[s_len] 2-bit codes of one subject
    subject_start: int,            # base offset of this subject in the DB
    init_order: np.ndarray,        # indices into init (score order)
    init: InitHits,
    params: SearchParams,
    reject: np.ndarray | None = None,   # device filter verdicts (global)
    use_native: bool | None = None,
) -> list[HSP]:
    """BLAST_GetGappedScore (blast_gapalign.c:3233), greedy and DP
    branches."""
    opts = params.options
    if use_native is not False:
        res = _walk_native(
            qblock, subject2, subject_start, init_order, init, params,
            reject,
        )
        if res is not None:
            return res
    saved: list[HSP] = []
    index = ContainmentIndex(
        opts.min_diag_separation, q_span=len(qblock.buffer) + 1
    )
    n_extensions = 0
    ctx_offsets = qblock.context_offsets()
    matrix = (
        nucl_score_matrix(opts.reward, opts.penalty)
        if opts.extension_method is not ExtensionMethod.GREEDY else None
    )

    for i in init_order:
        ctx = int(init.context[i])
        ctx_info = qblock.contexts[ctx]
        q0 = int(ctx_offsets[ctx])
        q_len = ctx_info.length
        # ungapped data in context-local / subject-local coordinates
        uq_start = int(init.q_start[i]) - q0
        us_start = int(init.s_start[i]) - subject_start
        length = int(init.length[i])
        score = int(init.score[i])

        if index.contains(
            uq_start, uq_start + length, us_start, us_start + length,
            score, ctx,
        ):
            continue

        if reject is not None and reject[i]:
            # the device band DP certified this extension cannot reach
            # the cutoff; a rejected extension saves nothing and adds
            # nothing to the containment index, so the walk is
            # host-identical
            n_extensions += 1
            continue

        cutoff = params.contexts[ctx].cutoff_score
        query = qblock.buffer[q0: q0 + q_len]
        n_extensions += 1
        if opts.extension_method is ExtensionMethod.GREEDY:
            # greedy seed: middle of the ungapped alignment
            # (blast_gapalign.c:3466-3471)
            q_off = uq_start + length // 2
            s_off = us_start + length // 2
            res = greedy_gapped_alignment(
                query, subject2, params.gap_x_dropoff,
                opts.reward, opts.penalty, opts.gap_open, opts.gap_extend,
                q_off, s_off, do_traceback=False,
            )
        else:
            # DP path: start inside the first all-match byte of the seed
            # (blast_gapalign.c:3486-3499)
            q_off = int(init.q_off[i]) - q0
            s_off = int(init.s_off[i]) - subject_start
            if us_start + length >= s_off + 8:
                q_off += 3
                s_off += 3
            res = dyn_prog_nt_gapped_alignment(
                query, subject2, matrix,
                opts.gap_open, opts.gap_extend, params.gap_x_dropoff,
                q_off, s_off,
            )
        if res.score >= cutoff:
            h = HSP(
                q_off=res.q_start, q_end=res.q_end,
                s_off=res.s_start, s_end=res.s_end,
                score=res.score, context=ctx,
                q_frame=ctx_info.frame, s_frame=1,
                q_gapped_start=res.q_seed_start,
                s_gapped_start=res.s_seed_start,
            )
            saved.append(h)
            index.add(h)
    slog.diagnostics.gapped_extensions += n_extensions
    return saved


def run_gapped_prelim(
    init: InitHits,
    qblock: QueryBlock,
    get_subject2,                  # fn(oid) -> uint8[s_len] 2-bit codes
    subject_starts: np.ndarray,    # int64[num_seqs] DB base offsets
    params: SearchParams,
    device_gapped: DeviceGappedData | None = None,
    subject_lengths: np.ndarray | None = None,
) -> list[HSPList]:
    """Prelim gapped stage over all subjects with init hits.

    ``init`` must be in final score order per subject (run_seeding output).
    Returns per-oid HSPLists sorted by score, with e-values assigned and
    reaped (blast_engine.c:503-509 and :792-812). With ``device_gapped``
    the TPU band-DP kernel pre-screens every candidate in one batch and
    the host only extends the survivors.
    """
    eff_searchsp = {
        c: params.contexts[c].eff_searchsp
        for c in range(len(params.contexts))
    }
    out: list[HSPList] = []
    if len(init) == 0:
        return out
    reject = None
    if device_gapped is not None and subject_lengths is not None:
        with slog.time("device.gapped_filter"):
            reject = device_gapped_rejects(
                init, qblock, subject_starts, subject_lengths,
                params, device_gapped,
            )
    oids = np.asarray(init.oid)
    for oid in np.unique(oids):
        order = np.flatnonzero(oids == oid)
        subject2 = get_subject2(int(oid))
        hsps = get_gapped_score_one_subject(
            qblock, subject2, int(subject_starts[oid]), order, init,
            params, reject,
        )
        if not hsps:
            continue
        hsps = purge_common_endpoints(hsps, purge=True)
        adjust_odd_scores(hsps, params.round_down)
        sort_by_score(hsps)
        lst = HSPList(oid=int(oid), hsps=hsps)
        get_evalues(lst, params.kbp_gap, eff_searchsp)
        reap_by_evalue(lst, params.options.evalue)
        if lst.hsps:
            lst.best_evalue = min(h.evalue for h in lst.hsps)
            out.append(lst)
    return out
