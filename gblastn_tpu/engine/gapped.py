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


def get_gapped_score_one_subject(
    qblock: QueryBlock,
    subject2: np.ndarray,          # uint8[s_len] 2-bit codes of one subject
    subject_start: int,            # base offset of this subject in the DB
    init_order: np.ndarray,        # indices into init (score order)
    init: InitHits,
    params: SearchParams,
) -> list[HSP]:
    """BLAST_GetGappedScore (blast_gapalign.c:3233), greedy and DP
    branches."""
    opts = params.options
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
) -> list[HSPList]:
    """Prelim gapped stage over all subjects with init hits.

    ``init`` must be in final score order per subject (run_seeding output).
    Returns per-oid HSPLists sorted by score, with e-values assigned and
    reaped (blast_engine.c:503-509 and :792-812).
    """
    eff_searchsp = {
        c: params.contexts[c].eff_searchsp
        for c in range(len(params.contexts))
    }
    out: list[HSPList] = []
    if len(init) == 0:
        return out
    oids = np.asarray(init.oid)
    for oid in np.unique(oids):
        order = np.flatnonzero(oids == oid)
        subject2 = get_subject2(int(oid))
        hsps = get_gapped_score_one_subject(
            qblock, subject2, int(subject_starts[oid]), order, init, params
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
