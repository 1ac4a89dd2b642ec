"""Prelim-stage HSP filter writers: best-hit and culling.

Host-side reimplementation of the reference's pluggable HSP writers
(reference: /root/reference/c++/src/algo/blast/core/hspfilter_besthit.c
and hspfilter_culling.c), which replace the default collector when
``-best_hit_overhang``/``-best_hit_score_edge`` or ``-culling_limit``
are given:

* BestHitWriter -- s_BlastHSPBestHitRun (:252): per query, a sorted
  list of surviving hits in plus-strand query coordinates; a new hit A
  is rejected when an existing B with B.end >= A.end, B.begin <= A.begin,
  evalueB <= evalueA and scoreB/lenB > (scoreA/lenA)/(1-score_edge)
  exists; an accepted A evicts old hits whose overhang-trimmed range
  lies within A's overhang-extended range with worse e-value and
  density (:304-336). Stored ranges are overhang-extended exactly as
  the reference stores them.
* CullingWriter -- hspfilter_culling.c: each hit carries a merit
  (initially culling_limit); a dominating hit (s_DominateTest :84:
  weighted score/length criterion + >50% overlap) decrements it, and
  hits reaching merit 0 are dropped. This implementation applies the
  dominate test pairwise over the per-context survivor list (the
  reference's interval tree additionally marks down whole fully-covered
  subtrees without re-testing scores -- a spatial approximation not
  reproduced here).
"""
from __future__ import annotations

from dataclasses import dataclass, field

from gblastn_tpu.hits import HSP, HSPList


@dataclass
class _BHNode:
    hsp: HSP
    sid: int
    begin: int
    end: int
    len: int


class BestHitWriter:
    """-best_hit_overhang / -best_hit_score_edge filter."""

    def __init__(self, num_queries: int, overhang: float,
                 score_edge: float):
        self.overhang = overhang
        self.score_edge = score_edge
        self.best: list[list[_BHNode]] = [[] for _ in range(num_queries)]

    def add_hsplist(self, lst: HSPList, qblock) -> None:
        param_s = 1.0 - self.score_edge
        for hsp in lst.hsps:
            ctx = qblock.contexts[hsp.context]
            qid = ctx.query_index
            qlen = qblock.lengths[qid]
            if ctx.frame < 0:
                begin = qlen - hsp.q_end
            else:
                begin = hsp.q_off
            lenA = hsp.q_end - hsp.q_off
            end = begin + lenA
            scoreA = hsp.score
            evalueA = hsp.evalue
            denA = scoreA / lenA / param_s

            blist = self.best[qid]
            # is A bad? (:287-301)
            bad = False
            i = 0
            while i < len(blist) and blist[i].end < end:
                i += 1
            while i < len(blist) and blist[i].begin < begin:
                p = blist[i]
                if (
                    p.end >= end
                    and p.hsp.evalue <= evalueA
                    and p.hsp.score / p.len > denA
                ):
                    bad = True
                    break
                i += 1
            if bad:
                continue

            # does A make old hits bad? (:304-336)
            oh = int(2.0 * lenA * self.overhang /
                     (1.0 - 2.0 * self.overhang))
            allowed_begin = begin - oh
            allowed_end = end + oh
            oh = int(lenA * self.overhang)
            begin -= oh
            end += oh
            denA = scoreA / lenA * param_s
            i = 0
            while i < len(blist) and blist[i].begin < allowed_begin:
                i += 1
            while i < len(blist) and blist[i].begin < allowed_end:
                p = blist[i]
                p_oh = (p.end - p.begin - p.len) // 2
                if (
                    p.begin + p_oh >= begin
                    and p.end - p_oh <= end
                    and p.hsp.evalue >= evalueA
                    and p.hsp.score / p.len < denA
                ):
                    del blist[i]
                else:
                    i += 1

            # insert A keeping the list sorted by begin (:338-352)
            i = 0
            while i < len(blist) and blist[i].begin < begin:
                i += 1
            blist.insert(
                i, _BHNode(hsp=hsp, sid=lst.oid, begin=begin, end=end,
                           len=lenA)
            )

    def export(self, qid: int) -> list[HSPList]:
        """Surviving hits of one query, grouped by subject oid."""
        by_sid: dict[int, HSPList] = {}
        for node in self.best[qid]:
            by_sid.setdefault(
                node.sid, HSPList(oid=node.sid)
            ).hsps.append(node.hsp)
        return [by_sid[k] for k in sorted(by_sid)]


def dominate_test(p_begin, p_end, p_score, y_begin, y_end, y_score,
                  drop_y_if_tie: bool) -> bool:
    """s_DominateTest (hspfilter_culling.c:84)."""
    l1 = p_end - p_begin
    l2 = y_end - y_begin
    d = 3 * p_score * l1 + p_score * l2 - y_score * l1 - 3 * y_score * l2
    if d < 0 or (
        (p_end + p_begin - 2 * y_begin) * (p_end + p_begin - 2 * y_end) > 0
        and (y_end + y_begin - 2 * p_begin)
        * (y_end + y_begin - 2 * p_end) > 0
    ):
        return False
    if d > 0 or (drop_y_if_tie and p_score == y_score and l1 == l2):
        return True
    return p_score > y_score


@dataclass
class _CullNode:
    hsp: HSP
    sid: int
    begin: int
    end: int
    merit: int


class CullingWriter:
    """-culling_limit filter (merit-based domination counting)."""

    def __init__(self, num_contexts: int, culling_limit: int):
        self.culling_limit = culling_limit
        self.kept: list[list[_CullNode]] = [
            [] for _ in range(num_contexts)
        ]

    def add_hsplist(self, lst: HSPList, qblock) -> None:
        for hsp in lst.hsps:
            cid = hsp.context
            node = _CullNode(
                hsp=hsp, sid=lst.oid, begin=hsp.q_off, end=hsp.q_end,
                merit=self.culling_limit,
            )
            klist = self.kept[cid]
            ok = True
            for p in klist:
                if dominate_test(p.begin, p.end, p.hsp.score,
                                 node.begin, node.end, node.hsp.score,
                                 True):
                    node.merit -= 1
                    if node.merit <= 0:
                        ok = False
                        break
            if not ok:
                continue
            # A survives: decrement merit of hits it dominates, dropping
            # any that reach zero (s_ProcessHSPList)
            survivors = []
            for p in klist:
                if dominate_test(node.begin, node.end, node.hsp.score,
                                 p.begin, p.end, p.hsp.score, False):
                    p.merit -= 1
                    if p.merit <= 0:
                        continue
                survivors.append(p)
            survivors.append(node)
            self.kept[cid] = survivors

    def export_query(self, qblock, qid: int) -> list[HSPList]:
        by_sid: dict[int, HSPList] = {}
        for cid, klist in enumerate(self.kept):
            if qblock.contexts[cid].query_index != qid:
                continue
            for node in klist:
                by_sid.setdefault(
                    node.sid, HSPList(oid=node.sid)
                ).hsps.append(node.hsp)
        return [by_sid[k] for k in sorted(by_sid)]
