"""Query splitting: oversized queries searched in overlapping chunks.

Reimplements the role of the reference's query-splitting machinery
(reference: /root/reference/c++/src/algo/blast/api/split_query_cxx.cpp,
split_query_aux_priv.cpp:54-74 overlap=100,
local_blast.cpp:62-100 chunk sizes: megablast 5 Mbase, blastn 1 Mbase;
env overrides CHUNK_SIZE / OVERLAP_CHUNK_SIZE honored the same way):
queries longer than the chunk size are searched as overlapping chunks
and per-chunk HSPs are mapped back to original coordinates and merged.

Merge semantics: exact duplicates from the overlap region are dropped;
of two same-(context, subject, diagonal) HSPs with overlapping ranges,
the higher-scoring one is kept (the role of Blast_HitListMerge /
Blast_HSPListsMerge, blast_hits.c:2545, without the gapped-merge
concatenation of truncated boundary HSPs).
"""
from __future__ import annotations

import os
from dataclasses import dataclass

from gblastn_tpu.hits import HSP, HSPList, sort_by_evalue, sort_hsplists_by_evalue, hsplist_cmp
from gblastn_tpu.io.fasta import FastaRecord

CHUNK_MEGABLAST = 5_000_000
CHUNK_BLASTN = 1_000_000
OVERLAP = 100


def chunk_size_for_task(task: str) -> int:
    env = os.environ.get("CHUNK_SIZE")
    if env:
        return int(env)
    return CHUNK_MEGABLAST if task == "megablast" else CHUNK_BLASTN


def overlap_size() -> int:
    env = os.environ.get("OVERLAP_CHUNK_SIZE")
    if env:
        return int(env)
    return OVERLAP


@dataclass
class ChunkInfo:
    orig_index: int
    offset: int        # chunk start in the original query
    length: int
    orig_length: int


def split_records(
    records: list[FastaRecord], chunk_size: int, overlap: int
) -> tuple[list[FastaRecord], list[ChunkInfo], bool]:
    """Split oversized records into overlapping chunks. Returns
    (chunked_records, per-record ChunkInfo, any_split)."""
    out: list[FastaRecord] = []
    info: list[ChunkInfo] = []
    any_split = False
    for qi, rec in enumerate(records):
        L = rec.length
        if L <= chunk_size:
            out.append(rec)
            info.append(ChunkInfo(qi, 0, L, L))
            continue
        any_split = True
        step = chunk_size - overlap
        start = 0
        ci = 0
        while start < L:
            end = min(start + chunk_size, L)
            out.append(
                FastaRecord(
                    f"{rec.seq_id}__chunk{ci}", rec.title,
                    rec.sequence[start:end],
                )
            )
            info.append(ChunkInfo(qi, start, end - start, L))
            if end == L:
                break
            start += step
            ci += 1
    return out, info, any_split


def _remap_hsp(h: HSP, ci: ChunkInfo, n_ctx_per_query: int) -> HSP:
    """Map a chunk-local HSP to original-query context coordinates."""
    out = h.copy()
    if h.q_frame >= 0:
        shift = ci.offset
    else:
        # chunk minus strand maps into the original minus strand at
        # offset (orig_length - chunk_end)
        shift = ci.orig_length - (ci.offset + ci.length)
    out.q_off = h.q_off + shift
    out.q_end = h.q_end + shift
    out.q_gapped_start = h.q_gapped_start + shift
    ctx_in_query = h.context % n_ctx_per_query
    out.context = ci.orig_index * n_ctx_per_query + ctx_in_query
    return out


def merge_chunk_results(
    results,                       # BlastResults over chunked records
    info: list[ChunkInfo],
    num_orig: int,
    n_ctx_per_query: int,
    hitlist_size: int,
):
    """Regroup per-chunk results by original query, remapping
    coordinates and deduplicating overlap-region HSPs."""
    per_query: dict[int, dict[int, list[HSP]]] = {
        qi: {} for qi in range(num_orig)
    }
    for qres in results.queries:
        ci = info[qres.query_index]
        for lst in qres.hsplists:
            bucket = per_query[ci.orig_index].setdefault(lst.oid, [])
            for h in lst.hsps:
                bucket.append(_remap_hsp(h, ci, n_ctx_per_query))

    merged: list[list[HSPList]] = []
    for qi in range(num_orig):
        lists: list[HSPList] = []
        for oid, hsps in per_query[qi].items():
            # drop exact duplicates, then same-diagonal overlapping
            # lower scores
            hsps.sort(
                key=lambda h: (h.context, h.s_off - h.q_off, h.q_off,
                               -h.score)
            )
            kept: list[HSP] = []
            seen = set()
            for h in hsps:
                key = (h.context, h.q_off, h.q_end, h.s_off, h.s_end)
                if key in seen:
                    continue
                seen.add(key)
                if kept:
                    p = kept[-1]
                    if (
                        p.context == h.context
                        and (p.s_off - p.q_off) == (h.s_off - h.q_off)
                        and h.q_off <= p.q_end
                    ):
                        # overlapping same-diagonal pair: keep the better
                        if h.score > p.score:
                            kept[-1] = h
                        continue
                kept.append(h)
            if kept:
                lst = HSPList(oid=oid, hsps=kept)
                sort_by_evalue(lst.hsps)
                lst.best_evalue = min(x.evalue for x in kept)
                lists.append(lst)
        sort_hsplists_by_evalue(lists)
        del lists[hitlist_size:]
        merged.append(lists)
    return merged
