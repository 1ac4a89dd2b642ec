"""Ungapped search mode (-ungapped): HSPs from the ungapped extension
stage, e-values by even-gap sum-statistics linking.

Reference flow: BLAST_GetUngappedHSPList (blast_gapalign.c:4157)
builds the HSP list straight from the initial hits;
s_BlastSearchEngineCore then links with Blast_EvenGapLinkHSPs instead
of plain e-values because ungapped searches always use sum statistics
(blast_options.c:1364-1373, blast_engine.c:773-777), and reaps by
e-value. The traceback stage re-scores against the ambiguity-restored
subject and re-links (blast_traceback.c).
"""
from __future__ import annotations

import numpy as np

from gblastn_tpu.hits import HSP, HSPList, get_bit_scores, reap_by_evalue
from gblastn_tpu.linking import even_gap_link_hsps
from gblastn_tpu.traceback.stage import num_identities
from gblastn_tpu.utils.profiling import slog


def _link_and_reap(hsps, params, subject_length):
    kbp = {c: params.kbp_gap for c in range(len(params.contexts))}
    hsps = even_gap_link_hsps(
        hsps, kbp, params.contexts, subject_length,
        cutoff_small_gap=params.word_cutoff_score_min,
    )
    return hsps


def run_ungapped_prelim(
    init,
    qblock,
    subject_starts: np.ndarray,
    subject_lengths: np.ndarray,
    params,
) -> list[HSPList]:
    """Ungapped prelim stage: init hits -> linked, reaped HSP lists."""
    out: list[HSPList] = []
    if len(init) == 0:
        return out
    ctx_offsets = qblock.context_offsets()
    oids = np.asarray(init.oid)

    for oid in np.unique(oids):
        idx = np.flatnonzero(oids == oid)
        hsps: list[HSP] = []
        for i in idx:
            ctx = int(init.context[i])
            ctx_info = qblock.contexts[ctx]
            q0 = int(init.q_start[i]) - int(ctx_offsets[ctx])
            s0 = int(init.s_start[i]) - int(subject_starts[int(oid)])
            n = int(init.length[i])
            hsps.append(
                HSP(
                    q_off=q0, q_end=q0 + n, s_off=s0, s_end=s0 + n,
                    score=int(init.score[i]), context=ctx,
                    q_frame=ctx_info.frame, s_frame=1,
                    q_gapped_start=q0, s_gapped_start=s0,
                )
            )
        subject_length = int(subject_lengths[int(oid)])
        hsps = _link_and_reap(hsps, params, subject_length)
        lst = HSPList(oid=int(oid), hsps=hsps)
        reap_by_evalue(lst, params.options.evalue)
        if lst.hsps:
            lst.best_evalue = min(h.evalue for h in lst.hsps)
            out.append(lst)
    return out


def finish_ungapped_hsplist(
    lst: HSPList,
    qblock,
    subject: np.ndarray,      # BLASTNA with true ambiguity codes
    matrix: np.ndarray,
    params,
    subject_length: int,
) -> None:
    """Traceback-stage finishing for ungapped HSPs: re-score against
    the true subject (Blast_HSPListReevaluateUngapped's role, realized
    through the same best-section walk with a single substitution run),
    re-link, reap, identities and bit scores."""
    from gblastn_tpu.hits import OP_SUB
    from gblastn_tpu.traceback.stage import (
        reevaluate_with_ambiguities_gapped,
    )

    opts = params.options
    kept: list[HSP] = []
    for h in lst.hsps:
        ctx_info = qblock.contexts[h.context]
        q = qblock.buffer[
            ctx_info.offset: ctx_info.offset + ctx_info.length
        ]
        h.edit_script = [(OP_SUB, h.q_end - h.q_off)]
        cp = params.contexts[h.context]
        deleted = reevaluate_with_ambiguities_gapped(
            h, q, subject, matrix, cp.cutoff_score,
            opts.reward, opts.penalty, 0, 0,
        )
        h.edit_script = None
        if deleted:
            continue
        h.num_ident, _ = num_identities(q, subject, h)
        kept.append(h)
    kept = _link_and_reap(kept, params, subject_length)
    lst.hsps = kept
    reap_by_evalue(lst, opts.evalue)
    if lst.hsps:
        get_bit_scores(lst, params.kbp_gap)
        lst.best_evalue = min(h.evalue for h in lst.hsps)
