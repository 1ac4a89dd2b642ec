"""Device seeding stage: subject scan, seed resolution, mini-extension,
and exact X-drop ungapped extension -- as fixed-shape JAX array programs.

TPU-native replacement for the reference seeding pipeline
(reference: /root/reference/c++/src/algo/blast/core/blast_nascan.c scanners,
na_ungapped.c:1026 ``s_BlastNaExtend`` mini-extension, na_ungapped.c:152
``s_NuclUngappedExtendExact``). Where the reference dispatches dozens of
stride-specialized scalar scanners and the G-BLASTN CUDA port mirrors them
as thread-per-position kernels with atomics, this implementation is three
data-parallel array transforms:

1. ``scan_block``: word codes at stride positions via a strided windowed
   dot, CSR lookup (two gathers), fixed per-position fan-out (CMAX slots) --
   replaces the scan + hash-chain-walk kernel pair
   (gpu_blastn_mb_scan_kernel_v3.cuh + gpu_blastn_lookup_hash_kernel_v3.cuh).
2. ``mini_extend``: masked windowed compare + leading-run count (cumprod),
   replacing gpu_blastn_mini_extension_kernel_v3.cuh / s_BlastNaExtend.
3. ``ungapped_extend``: both-direction X-drop extension as a chunked
   prefix-scan (cumsum + running max) inside ``lax.while_loop``; exact
   semantics of s_NuclUngappedExtendExact including first-best tie-breaks.

All functions are shape-static and jittable; invalid lanes are masked, and
out-of-range gathers are clamped with their scores forced to a large
negative sentinel so the X-drop terminates exactly at sequence/pad bounds.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

# presence-vector scan pre-filter (GBLASTN_TPU_NO_PV=1 disables; read
# when a scan variant compiles, so A/B needs a fresh process)
_USE_PV = os.environ.get("GBLASTN_TPU_NO_PV", "") == ""

NEG_BIG = -(1 << 24)  # sentinel score; large but safe against int32 overflow

# plain numpy scalar: a jnp constant here would initialize the XLA
# backend at import time, breaking jax.distributed.initialize()
_I32_BIG = np.int32(2**31 - 1)


def compact_indices(mask, cap: int, fill_clamp):
    """Indices of the first ``cap`` True lanes, ascending, sort-based.

    Bit-identical contract to ``jnp.nonzero(mask, size=cap,
    fill_value=fill_clamp)`` + the ``iota < n_hit`` fill mask, but via a
    bitonic sort of (lane if mask else INT32_MAX): on TPU the sort is
    ~20-60x faster than the cumsum+scatter that sized nonzero lowers to
    (2.3 -> 0.13 ms at n=256k, 37 -> 5.6 ms at n=4M;
    tools/prof_compaction.py). Returns (idx int32[cap], fill bool[cap],
    n_hit int32).
    """
    n = mask.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    keyed = jnp.where(mask, lane, _I32_BIG)
    if cap > n:
        keyed = jnp.concatenate(
            [keyed, jnp.full(cap - n, _I32_BIG, jnp.int32)]
        )
    srt = jax.lax.sort(keyed)[:cap]
    fill = srt != _I32_BIG
    idx = jnp.where(fill, srt, fill_clamp)
    return idx, fill, mask.sum()


def compact_with(mask, cap: int, fill_clamp, payloads, fills=None):
    """compact_indices with the payload columns RIDING the sort.

    Measured on v5e: a 1M-lane random gather costs ~7 ms while an
    extra sort operand costs ~0.5 ms, so compact-then-gather loses
    ~10x to payload riding once lane counts reach the millions.
    Selection and order are bit-identical to compact_indices followed
    by ``jnp.where(fill, p[idx], fill_val)`` per payload.

    Returns (idx int32[cap], fill bool[cap], n_hit, [payloads...]).
    """
    n = mask.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    keyed = jnp.where(mask, lane, _I32_BIG)
    ops = [keyed]
    for p in payloads:
        assert p.shape[0] == n
        ops.append(p)
    if cap > n:
        ops = [
            jnp.concatenate([
                o, jnp.zeros(cap - n, o.dtype)
                if i else jnp.full(cap - n, _I32_BIG, jnp.int32)
            ])
            for i, o in enumerate(ops)
        ]
    srt = jax.lax.sort(tuple(ops), num_keys=1)
    key_s = srt[0][:cap]
    fill = key_s != _I32_BIG
    idx = jnp.where(fill, key_s, fill_clamp)
    if fills is None:
        fills = [0] * len(payloads)
    outs = [
        jnp.where(fill, p_s[:cap], f)
        for p_s, f in zip(srt[1:], fills)
    ]
    return (idx, fill, mask.sum(), *outs)


def window_take_join(tables, idx, out_dtype=jnp.uint32):
    """tuple(tables[k][idx] for k) via ONE sort-join instead of
    len(tables) random gathers.

    ``tables`` are equal-length 1-D arrays (typically shifted views of
    one packed array, so col k yields arr[idx + k]); ``idx`` must be in
    [0, T). On v5e an N-element random gather runs at ~0.6 GB/s while
    sorts run ~10x faster, so for multi-million N this join (sort +
    last-non-null scan + unsort) wins ~5x and amortizes over columns.
    """
    T = tables[0].shape[0]
    N = idx.shape[0]
    M = T + N
    keys = jnp.concatenate([
        jax.lax.broadcasted_iota(jnp.int32, (T,), 0),
        jnp.clip(idx, 0, T - 1).astype(jnp.int32),
    ])
    # table rows order BEFORE query rows of the same key
    tag = jnp.concatenate([
        jnp.zeros(T, jnp.int32), jnp.ones(N, jnp.int32)
    ])
    back = jnp.concatenate([
        jnp.full(T, _I32_BIG, jnp.int32),
        jax.lax.broadcasted_iota(jnp.int32, (N,), 0),
    ])
    vals = [
        jnp.concatenate([
            t.astype(jnp.int32)
            if t.dtype != jnp.uint32
            else jax.lax.bitcast_convert_type(t, jnp.int32),
            jnp.zeros(N, jnp.int32),
        ])
        for t in tables
    ]
    srt = jax.lax.sort((keys, tag, back, *vals), num_keys=2)
    b_s = srt[2]
    v_s = srt[3:]
    # forward-fill: each query row takes the nearest table row above
    # (exactly its key's row -- the table is dense over [0, T))
    p = jnp.where(
        srt[1] == 0, jax.lax.broadcasted_iota(jnp.int32, (M,), 0), -1
    )

    def comb(a, b):
        sel = b[0] >= 0
        return tuple(jnp.where(sel, xb, xa) for xa, xb in zip(a, b))

    filled = jax.lax.associative_scan(comb, (p, *v_s))
    # un-permute (query rows carry back = original lane; table rows
    # sort to the tail with BIG keys)
    res = jax.lax.sort((b_s, *filled[1:]), num_keys=1)
    out = []
    for r in res[1:]:
        r = r[:N]
        if out_dtype == jnp.uint32:
            r = jax.lax.bitcast_convert_type(r, jnp.uint32)
        out.append(r)
    return tuple(out)


def unpack_2na_device(packed: jnp.ndarray) -> jnp.ndarray:
    """uint8 packed (4 bases/byte, first base in high bits) -> int8 codes."""
    p = packed.astype(jnp.int32)
    cols = jnp.stack(
        [(p >> 6) & 3, (p >> 4) & 3, (p >> 2) & 3, p & 3], axis=-1
    )
    return cols.reshape(-1).astype(jnp.int8)


def valid_from_intervals(S: int, starts, ends) -> jnp.ndarray:
    """bool[S] validity mask from per-subject [start, end) intervals,
    gather-free: +1/-1 boundary scatter + running sum (O(S + n_subj)
    elementwise work; the searchsorted form costs S * log(n_subj)
    gathers). Subject coordinates must fit int32 (the resident-path
    guard; streamed blocks are block-local)."""
    d = jnp.zeros(S + 1, jnp.int32)
    d = d.at[jnp.clip(starts.astype(jnp.int32), 0, S)].add(
        1, mode="drop"
    )
    d = d.at[jnp.clip(ends.astype(jnp.int32), 0, S)].add(
        -1, mode="drop"
    )
    return jnp.cumsum(d[:S]) > 0


def subject_arrays_from_packed(packed, starts, ends):
    """(subject2, valid, subject_w) derived ON DEVICE from the 2-bit
    packed buffer -- the packed-only residency path (VERDICT r3 item
    2): the packed bytes are the ONLY persistent subject array
    (0.25 B/base); everything else materializes transiently inside the
    seeding program and is freed when the dispatch ends. Reference
    analog: whole-chromosome device residency, blast_gapalign.h:54."""
    subject2 = unpack_2na_device(packed)
    valid = valid_from_intervals(subject2.shape[0], starts, ends)
    return subject2, valid, pack_subject_words(packed)


@functools.partial(
    jax.jit,
    static_argnames=(
        "scan_step", "lut_word", "word_size", "cmax", "n_scan",
        "hit_cap", "pos_base_static", "disc_offsets", "use_pv",
    ),
)
def scan_block(
    subject2: jnp.ndarray,        # int8[S_pad] 2-bit codes
    subject_valid: jnp.ndarray,   # bool[S_pad] real-base mask
    lut_offsets: jnp.ndarray,     # int32[4^w + 1]
    lut_positions: jnp.ndarray,   # int32[P]
    *,
    scan_step: int,
    lut_word: int,
    word_size: int,
    cmax: int,
    n_scan: int,
    pos_base=0,                   # first scan position (traced OK)
    pos_end=None,                 # exclusive scan bound (traced; None=all)
    hit_cap: int = 0,             # 0 = no compaction (dense fan-out)
    mask_starts=None,             # int32[M] sorted soft-mask starts
    mask_ends=None,               # int32[M] sorted soft-mask ends
    pos_base_static: int | None = None,  # static pos_base (fast path)
    disc_offsets: tuple[int, ...] | None = None,  # disc-mb template
    use_pv: bool | None = None,   # None = GBLASTN_TPU_NO_PV default
):
    """Scan subject at stride positions; resolve CSR seeds.

    ``mask_starts``/``mask_ends`` (optional) are sorted non-overlapping
    half-open subject intervals (buffer-local coords, padded with a
    past-the-end sentinel): scan words overlapping one are not seeded
    -- database soft masking (the reference restricts scanning to the
    unmasked ranges, masksubj.inl s_DetermineScanningOffsets), while
    mini/ungapped extension still runs through masked bases.

    Word codes are computed for the whole subject with ``lut_word``
    shifted multiply-adds over the full array (one fused elementwise
    chain on the VPU) rather than per-position gathers; PV-positive
    scan positions are then compacted to ``hit_cap`` slots before the
    per-position fan-out, so downstream extension stages only process
    real candidates (the role of the reference GPU kernels' shared-
    memory hit compaction, gpu_blastn_mb_scan_kernel_v3.cuh:26-120).

    Returns (q_off, s_off, valid, n_dropped):
      q_off/s_off: int32[N * cmax] seed offsets (N = hit_cap or n_scan),
      valid:       bool[N * cmax],
      n_dropped:   int32 scalar; > 0 means capacity overflow (seeds
                   beyond cmax per position, or hit positions beyond
                   hit_cap) -- the caller must retry with more capacity.
    """
    del word_size
    S = subject2.shape[0]
    # contiguous words read lut_word consecutive bases; discontiguous
    # templates read the selected offsets of a template_length window
    # (the whole window must be valid -- s_FillDiscMBTable resets its
    # accumulator on any ambiguity, blast_nalookup.c:757)
    if disc_offsets is not None:
        code_offs = list(enumerate(disc_offsets))
        span = disc_offsets[-1] + 1
        w_eff = len(disc_offsets)
    else:
        code_offs = [(j, j) for j in range(lut_word)]
        span = lut_word
        w_eff = lut_word
    fast = (
        pos_base_static is not None
        and pos_base_static + (n_scan - 1) * scan_step + span <= S
    )
    if fast:
        # fast path (static start): compute word codes ONLY at the
        # stride positions via strided slices -- the full-array rolling
        # compute + subsample gathers cost ~4x more device time
        pos = pos_base_static + jnp.arange(
            n_scan, dtype=jnp.int32
        ) * scan_step
        lim0 = pos_base_static + (n_scan - 1) * scan_step + 1
        words = jnp.zeros(n_scan, dtype=jnp.int32)
        valid_word = jnp.ones(n_scan, dtype=bool)
        for r, j in code_offs:
            sl = jax.lax.slice(
                subject2, (pos_base_static + j,), (lim0 + j,),
                (scan_step,),
            )
            words = words + (
                sl.astype(jnp.int32) << (2 * (w_eff - 1 - r))
            )
        for j in range(span):
            vl = jax.lax.slice(
                subject_valid, (pos_base_static + j,), (lim0 + j,),
                (scan_step,),
            )
            valid_word = valid_word & vl
        if pos_end is not None:
            valid_word = valid_word & (pos < pos_end)
        words = jnp.where(valid_word, words, 0)
    else:
        # rolling word codes over the full subject: word_full[i] =
        # sum_j base[i+j] * 4^(w-1-j), via static shifted slices
        npos_full = S - span + 1
        word_full = jnp.zeros(npos_full, dtype=jnp.int32)
        valid_all = subject_valid
        valid_word_full = jnp.ones(npos_full, dtype=bool)
        for r, j in code_offs:
            word_full = word_full + (
                subject2[j: j + npos_full].astype(jnp.int32)
                << (2 * (w_eff - 1 - r))
            )
        for j in range(span):
            valid_word_full = (
                valid_word_full & valid_all[j: j + npos_full]
            )

        pos = pos_base + jnp.arange(n_scan, dtype=jnp.int32) * scan_step
        pos_c = jnp.minimum(pos, npos_full - 1)
        words = word_full[pos_c]
        valid_word = valid_word_full[pos_c] & (pos == pos_c)
        if pos_end is not None:
            valid_word = valid_word & (pos < pos_end)
        words = jnp.where(valid_word, words, 0)

    if use_pv is None:
        use_pv = _USE_PV
    table_size = lut_offsets.shape[0] - 1
    pv_path = bool(
        use_pv and hit_cap and table_size % 32 == 0
        and table_size >= 4096
    )

    soft_masked = None
    if mask_starts is not None:
        # word at pos overlaps a masked interval iff the first interval
        # ending after pos starts before pos + span
        j = jnp.clip(
            jnp.searchsorted(mask_ends, pos, side="right"),
            0, mask_starts.shape[0] - 1,
        )
        soft_masked = (
            (mask_starts[j] < pos + span) & (mask_ends[j] > pos)
        )

    if pv_path:
        # presence-vector probe first (the reference GPU's PV texture,
        # gpu_blastn_mb_scan_kernel_v3.cuh:26): the bit-packed presence
        # table is derived from the CSR offsets with ONE linear pass
        # (4^w/32 int32, 2MB at width 12), so the n_scan random probes
        # touch a 32x smaller table and the two offset gathers into the
        # dense 4^w table run only on the compacted hits
        present = lut_offsets[1:] > lut_offsets[:-1]
        bits = present.reshape(table_size // 32, 32).astype(jnp.int32)
        pv = (bits << jax.lax.broadcasted_iota(
            jnp.int32, (1, 32), 1
        )).sum(axis=1, dtype=jnp.int32)
        hit = valid_word & (
            ((pv[words >> 5] >> (words & 31)) & 1) == 1
        )
        if soft_masked is not None:
            hit = hit & ~soft_masked
        hit_idx, fill, n_hit = compact_indices(hit, hit_cap, n_scan - 1)
        pos = jnp.where(fill, pos[hit_idx], 0)
        words_c = jnp.where(fill, words[hit_idx], 0)
        start = jnp.where(fill, lut_offsets[words_c], 0)
        count = jnp.where(
            fill, lut_offsets[words_c + 1] - lut_offsets[words_c], 0
        )
        overflow_hits = jnp.maximum(n_hit - hit_cap, 0)
    else:
        start = lut_offsets[words]
        count = lut_offsets[words + 1] - start
        count = jnp.where(valid_word, count, 0)
        if soft_masked is not None:
            count = jnp.where(soft_masked, 0, count)

        if hit_cap:
            # compact PV-positive positions to hit_cap slots
            hit_idx, fill, n_hit = compact_indices(
                count > 0, hit_cap, n_scan - 1
            )
            pos = jnp.where(fill, pos[hit_idx], 0)
            start = jnp.where(fill, start[hit_idx], 0)
            count = jnp.where(fill, count[hit_idx], 0)
            overflow_hits = jnp.maximum(n_hit - hit_cap, 0)
        else:
            overflow_hits = jnp.zeros((), jnp.int32)

    # fan out to cmax slots per (compacted) scan position
    slot = jnp.arange(cmax, dtype=jnp.int32)
    take = slot[None, :] < count[:, None]                  # [N, cmax]
    pidx = jnp.minimum(start[:, None] + slot[None, :],
                       lut_positions.shape[0] - 1)
    q_off = lut_positions[pidx]
    s_off = jnp.broadcast_to(pos[:, None], take.shape)
    n_dropped = jnp.maximum(count - cmax, 0).sum() + overflow_hits
    if not hit_cap:
        n_hit = (count > 0).sum()
    return (
        q_off.reshape(-1).astype(jnp.int32),
        s_off.reshape(-1).astype(jnp.int32),
        take.reshape(-1),
        n_dropped.astype(jnp.int32),
        n_hit.astype(jnp.int32),
    )


@functools.partial(
    jax.jit,
    static_argnames=("lut_word", "cmax", "n_scan", "hit_cap"),
)
def indexed_scan_block(
    query: jnp.ndarray,           # uint8[Q_pad] BLASTNA codes
    q_allowed: jnp.ndarray,       # bool[Q_pad] allowed seed starts
    idx_offsets: jnp.ndarray,     # int32[4^w + 1] DB-index CSR offsets
    idx_positions: jnp.ndarray,   # int32[P] subject grid positions
    *,
    lut_word: int,
    cmax: int,
    n_scan: int,                  # Q_pad - lut_word + 1
    hit_cap: int,
    mask_starts=None,             # int32[M] sorted subject soft-mask
    mask_ends=None,
):
    """Indexed megablast scan: the role-swapped twin of ``scan_block``.

    Instead of scanning the subject against a query-side lookup table,
    walk every allowed QUERY position against a prebuilt DATABASE index
    (reference: /root/reference/c++/src/algo/blast/core/
    mb_indexed_lookup.c s_MBIdxScanSubject + algo/blast/dbindex/ — there
    the index replaces the subject scan so repeated searches of the same
    DB skip it; same trade here, with device work proportional to the
    query, not the database).

    ``q_allowed`` marks exactly the query offsets the search's lookup
    table would have indexed (``LookupTable.positions``), so the raw
    seed set equals the scan path's set for a DB index built at the
    search's (lut_word, scan_step) — equivalence by construction.

    Subject soft-mask intervals are applied per gathered subject
    position (the scan path drops masked scan words before lookup; here
    the subject position arrives from the gather instead).

    Returns (q_off, s_off, valid, n_dropped) with the same contract as
    ``scan_block``.
    """
    # rolling word codes over the query buffer; BLASTNA codes >= 4
    # (ambiguity/sentinel) cannot occur inside an allowed word, so the
    # &3 clamp only affects positions q_allowed already excludes
    words = jnp.zeros(n_scan, dtype=jnp.int32)
    for j in range(lut_word):
        words = words + (
            (query[j: j + n_scan].astype(jnp.int32) & 3)
            << (2 * (lut_word - 1 - j))
        )
    pos = jnp.arange(n_scan, dtype=jnp.int32)
    valid_word = q_allowed[:n_scan]
    words = jnp.where(valid_word, words, 0)

    start = idx_offsets[words]
    count = jnp.where(valid_word, idx_offsets[words + 1] - start, 0)

    if hit_cap:
        hit_idx, fill, n_hit = compact_indices(
            count > 0, hit_cap, n_scan - 1
        )
        pos = jnp.where(fill, pos[hit_idx], 0)
        start = jnp.where(fill, start[hit_idx], 0)
        count = jnp.where(fill, count[hit_idx], 0)
        overflow_hits = jnp.maximum(n_hit - hit_cap, 0)
    else:
        overflow_hits = jnp.zeros((), jnp.int32)

    slot = jnp.arange(cmax, dtype=jnp.int32)
    take = slot[None, :] < count[:, None]                  # [N, cmax]
    pidx = jnp.minimum(start[:, None] + slot[None, :],
                       idx_positions.shape[0] - 1)
    s_off = idx_positions[pidx]
    q_off = jnp.broadcast_to(pos[:, None], take.shape)

    if mask_starts is not None:
        j = jnp.clip(
            jnp.searchsorted(mask_ends, s_off, side="right"),
            0, mask_starts.shape[0] - 1,
        )
        soft_masked = (
            (mask_starts[j] < s_off + lut_word) & (mask_ends[j] > s_off)
        )
        take = take & ~soft_masked

    n_dropped = jnp.maximum(count - cmax, 0).sum() + overflow_hits
    if not hit_cap:
        n_hit = (count > 0).sum()
    return (
        q_off.reshape(-1).astype(jnp.int32),
        s_off.reshape(-1).astype(jnp.int32),
        take.reshape(-1),
        n_dropped.astype(jnp.int32),
        n_hit.astype(jnp.int32),
    )


@functools.partial(jax.jit, static_argnames=("lut_word", "word_size"))
def mini_extend(
    query: jnp.ndarray,           # uint8[Q] BLASTNA codes (sentinels = 15)
    subject2: jnp.ndarray,        # int8[S_pad]
    subject_valid: jnp.ndarray,   # bool[S_pad]
    q_off: jnp.ndarray,
    s_off: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    lut_word: int,
    word_size: int,
):
    """Extend lut_word seeds to full word_size by exact matching
    (s_BlastNaExtend, na_ungapped.c:1026).

    Returns (q_adj, s_adj, ok): seed start shifted left by the left
    extension length; ok = seed survives (ext_left + ext_right >= W - w).
    """
    ext_to = word_size - lut_word
    if ext_to == 0:
        return q_off, s_off, valid

    S = subject2.shape[0]
    Q = query.shape[0]
    steps = jnp.arange(1, ext_to + 1, dtype=jnp.int32)

    # left: compare q_off-i vs s_off-i for i = 1..ext_to
    ql = q_off[:, None] - steps[None, :]
    sl = s_off[:, None] - steps[None, :]
    in_l = (ql >= 0) & (sl >= 0)
    qlc = jnp.clip(ql, 0, Q - 1)
    slc = jnp.clip(sl, 0, S - 1)
    m_l = (
        in_l
        & subject_valid[slc]
        & (query[qlc].astype(jnp.int32) == subject2[slc].astype(jnp.int32))
    )
    ext_left = jnp.cumprod(m_l.astype(jnp.int32), axis=1).sum(axis=1)
    ext_left = jnp.minimum(ext_left, ext_to)

    # right: compare q_off+w+i vs s_off+w+i for i = 0..ext_to-1
    need = ext_to - ext_left
    stepsr = jnp.arange(ext_to, dtype=jnp.int32)
    qr = q_off[:, None] + lut_word + stepsr[None, :]
    sr = s_off[:, None] + lut_word + stepsr[None, :]
    in_r = (qr < Q) & (sr < S)
    qrc = jnp.clip(qr, 0, Q - 1)
    src = jnp.clip(sr, 0, S - 1)
    m_r = (
        in_r
        & subject_valid[src]
        & (query[qrc].astype(jnp.int32) == subject2[src].astype(jnp.int32))
    )
    ext_right = jnp.cumprod(m_r.astype(jnp.int32), axis=1).sum(axis=1)

    ok = valid & (ext_left + jnp.minimum(ext_right, need) >= ext_to)
    q_adj = q_off - ext_left
    s_adj = s_off - ext_left
    return q_adj.astype(jnp.int32), s_adj.astype(jnp.int32), ok


@jax.jit
def pack_subject_words(packed: jnp.ndarray) -> jnp.ndarray:
    """uint8[S/4] packed bytes -> uint32[ceil(S/16)], 16 bases per word,
    first base in the highest 2 bits (the gather unit of
    mini_extend_packed). Odd byte counts (NCBI .nsq volumes end at the
    remainder byte) are zero-padded to the word."""
    if packed.shape[0] % 4:
        packed = jnp.concatenate([
            packed,
            jnp.zeros(4 - packed.shape[0] % 4, packed.dtype),
        ])
    # bitcast the [N, 4] byte groups to little-endian u32 and byteswap:
    # the stride-4 byte slices this replaces cost ~28 ms on a 4.6 Mb
    # subject (TPU lane gathers); this form is ~free
    w = jax.lax.bitcast_convert_type(
        packed.reshape(-1, 4), jnp.uint32
    )
    return (
        ((w & 0xFF) << 24) | ((w & 0xFF00) << 8)
        | ((w >> 8) & 0xFF00) | (w >> 24)
    )


@jax.jit
def pack_query_nibbles(query: jnp.ndarray) -> jnp.ndarray:
    """uint8[Q] BLASTNA codes -> uint32[Q/8] of NCBI4na MASK nibbles
    (A=1 C=2 G=4 T=8, ambiguity = member bitmask, sentinel/gap = 0),
    8 codes per word, first code in the highest 4 bits.

    The mask form serves two consumers gather-free: exact-match tests
    (mask == 1 << scode) for the mini-extension, and the closed-form
    matrix scoring (exact/member/degeneracy, pallas_ungapped.
    _scores_closed_form) for the clamped phase-0 X-drop."""
    from gblastn_tpu.io.encoding import BLASTNA_TO_NCBI4NA

    mask4 = jnp.asarray(BLASTNA_TO_NCBI4NA.astype(np.uint32))
    q = mask4[query.astype(jnp.int32)].reshape(-1, 8)
    w = jnp.zeros(q.shape[0], jnp.uint32)
    for k in range(8):
        w = w | (q[:, k] << (4 * (7 - k)))
    return w


@functools.partial(jax.jit, static_argnames=("lut_word", "word_size"))
def mini_extend_packed(
    query_nib: jnp.ndarray,       # uint32[Q/8] (pack_query_nibbles)
    subject_w: jnp.ndarray,       # uint32[S/16] (pack_subject_words)
    q_off: jnp.ndarray,
    s_off: jnp.ndarray,
    valid: jnp.ndarray,
    sub_lo: jnp.ndarray,          # int32[n] owning subject start
    sub_hi: jnp.ndarray,          # int32[n] owning subject end
    *,
    lut_word: int,
    word_size: int,
):
    """mini_extend on packed words: 4 + 7 aligned word gathers per seed
    instead of ~6 * (word_size - lut_word) scattered byte gathers --
    the dominant cost of the fused seeding program (random gathers pay
    per ELEMENT on TPU, so fewer/wider wins ~10x device time).

    Code extraction happens in registers via vector shifts; subject
    validity is the owning-subject bound test (equivalent to the
    valid-mask probes: inter-subject pad is >= 1 base, so the
    leading-run cumprod stops at the same place). Semantics and
    returns identical to mini_extend (asserted in tests)."""
    ext_to = word_size - lut_word
    if ext_to == 0:
        return q_off, s_off, valid
    n = q_off.shape[0]
    Q8 = query_nib.shape[0]
    S16 = subject_w.shape[0]
    span = lut_word + 2 * ext_to        # [q_off - ext_to, q_off + W + ext_to)

    # join-gathers win over per-column random gathers once lane counts
    # reach the millions (sorts ~10x faster than gathers on v5e);
    # below that the plain gathers win (and CPU tests stay fast)
    use_join = n >= (1 << 18)

    # ---- query codes over the span: 4-bit nibbles, 8 per word
    qbase = q_off - ext_to
    jq = qbase >> 3                     # floor also for negatives
    phase_q = (qbase - (jq << 3)).astype(jnp.int32)
    nq = (7 + span + 7) // 8 + 1
    if use_join:
        qn_ext = jnp.concatenate(
            [query_nib, jnp.broadcast_to(query_nib[-1:], (nq,))]
        )
        qws = list(window_take_join(
            tuple(jax.lax.slice(qn_ext, (k,), (k + Q8,))
                  for k in range(nq)),
            jnp.clip(jq, 0, Q8 - 1),
        ))
    else:
        qws = [
            query_nib[jnp.clip(jq + k, 0, Q8 - 1)] for k in range(nq)
        ]
    d = jnp.arange(span, dtype=jnp.int32)
    qpos = phase_q[:, None] + d[None, :]            # [n, span]
    qk = qpos >> 3
    qsh = ((7 - (qpos & 7)) << 2).astype(jnp.uint32)
    qcodes = jnp.zeros((n, span), jnp.uint32)
    for k in range(nq):
        qcodes = qcodes | jnp.where(
            qk == k, (qws[k][:, None] >> qsh) & 15, 0
        )

    # ---- subject codes over the span: 2-bit, 16 per word
    sbase = s_off - ext_to
    js = sbase >> 4
    phase_s = (sbase - (js << 4)).astype(jnp.int32)
    ns = (15 + span + 15) // 16 + 1
    if use_join:
        sw_ext = jnp.concatenate(
            [subject_w, jnp.broadcast_to(subject_w[-1:], (ns,))]
        )
        sws = list(window_take_join(
            tuple(jax.lax.slice(sw_ext, (k,), (k + S16,))
                  for k in range(ns)),
            jnp.clip(js, 0, S16 - 1),
        ))
    else:
        sws = [
            subject_w[jnp.clip(js + k, 0, S16 - 1)] for k in range(ns)
        ]
    spos = phase_s[:, None] + d[None, :]
    sk = spos >> 4
    ssh = ((15 - (spos & 15)) << 1).astype(jnp.uint32)
    scodes = jnp.zeros((n, span), jnp.uint32)
    for k in range(ns):
        scodes = scodes | jnp.where(
            sk == k, (sws[k][:, None] >> ssh) & 3, 0
        )

    qi = q_off[:, None] + (d - ext_to)[None, :]
    si = s_off[:, None] + (d - ext_to)[None, :]
    inb = (
        (qi >= 0) & (qi < Q8 * 8)
        & (si >= jnp.maximum(sub_lo, 0)[:, None])
        & (si < jnp.minimum(sub_hi, S16 * 16)[:, None])
    )
    # query nibbles are 4na masks: exact base match iff mask == 1<<code
    match = inb & (qcodes == jnp.left_shift(
        jnp.uint32(1), scodes
    ))

    # left: positions ext_to-1 .. 0 (i.e. q_off-1 .. q_off-ext_to)
    m_l = match[:, :ext_to][:, ::-1]
    ext_left = jnp.minimum(
        jnp.cumprod(m_l.astype(jnp.int32), axis=1).sum(axis=1), ext_to
    )
    # right: positions ext_to+lut_word .. span-1
    m_r = match[:, ext_to + lut_word:]
    ext_right = jnp.cumprod(m_r.astype(jnp.int32), axis=1).sum(axis=1)

    need = ext_to - ext_left
    ok = valid & (ext_left + jnp.minimum(ext_right, need) >= ext_to)
    q_adj = q_off - ext_left
    s_adj = s_off - ext_left
    return q_adj.astype(jnp.int32), s_adj.astype(jnp.int32), ok


@functools.partial(jax.jit, static_argnames=("word_size",))
def right_run_packed(
    query_nib: jnp.ndarray,       # uint32[Q/8] (pack_query_nibbles)
    subject_w: jnp.ndarray,       # uint32[S/16] (pack_subject_words)
    q_off: jnp.ndarray,
    s_off: jnp.ndarray,
    valid: jnp.ndarray,
    sub_hi: jnp.ndarray,          # int32[n] owning subject end
    *,
    word_size: int,
):
    """Exact-match run length to the right of each seed's word end,
    capped at word_size -- the double-word probe of s_TypeOfWord
    (na_ungapped.c:559-586), the packed-word twin of the host
    compute_right_runs (engine.seeding): query nibbles are 4na masks,
    so ``mask == 1 << code`` is exactly 'unambiguous AND equal', and
    query sentinels (mask 0) stop the run at context bounds."""
    W = word_size
    n = q_off.shape[0]
    Q8 = query_nib.shape[0]
    S16 = subject_w.shape[0]
    d = jnp.arange(W, dtype=jnp.int32)

    use_join = n >= (1 << 18)
    qbase = q_off + W
    jq = qbase >> 3
    phase_q = (qbase & 7).astype(jnp.int32)
    nq = (7 + W + 7) // 8 + 1
    if use_join:
        qn_ext = jnp.concatenate(
            [query_nib, jnp.broadcast_to(query_nib[-1:], (nq,))]
        )
        qws = list(window_take_join(
            tuple(jax.lax.slice(qn_ext, (k,), (k + Q8,))
                  for k in range(nq)),
            jnp.clip(jq, 0, Q8 - 1),
        ))
    else:
        qws = [
            query_nib[jnp.clip(jq + k, 0, Q8 - 1)] for k in range(nq)
        ]
    qpos = phase_q[:, None] + d[None, :]
    qk = qpos >> 3
    qsh = ((7 - (qpos & 7)) << 2).astype(jnp.uint32)
    qcodes = jnp.zeros((n, W), jnp.uint32)
    for k in range(nq):
        qcodes = qcodes | jnp.where(
            qk == k, (qws[k][:, None] >> qsh) & 15, 0
        )

    sbase = s_off + W
    js = sbase >> 4
    phase_s = (sbase & 15).astype(jnp.int32)
    ns = (15 + W + 15) // 16 + 1
    if use_join:
        sw_ext = jnp.concatenate(
            [subject_w, jnp.broadcast_to(subject_w[-1:], (ns,))]
        )
        sws = list(window_take_join(
            tuple(jax.lax.slice(sw_ext, (k,), (k + S16,))
                  for k in range(ns)),
            jnp.clip(js, 0, S16 - 1),
        ))
    else:
        sws = [
            subject_w[jnp.clip(js + k, 0, S16 - 1)] for k in range(ns)
        ]
    spos = phase_s[:, None] + d[None, :]
    sk = spos >> 4
    ssh = ((15 - (spos & 15)) << 1).astype(jnp.uint32)
    scodes = jnp.zeros((n, W), jnp.uint32)
    for k in range(ns):
        scodes = scodes | jnp.where(
            sk == k, (sws[k][:, None] >> ssh) & 3, 0
        )

    qi = q_off[:, None] + W + d[None, :]
    si = s_off[:, None] + W + d[None, :]
    inb = (
        (qi < Q8 * 8)
        & (si < jnp.minimum(sub_hi, S16 * 16)[:, None])
    )
    match = inb & (
        qcodes == jnp.left_shift(jnp.uint32(1), scodes)
    )
    run = jnp.cumprod(match.astype(jnp.int32), axis=1).sum(axis=1)
    return jnp.where(valid, run, 0).astype(jnp.int32)


def two_hit_admission(
    qs: jnp.ndarray,
    ss: jnp.ndarray,
    ok: jnp.ndarray,
    right_run: jnp.ndarray,
    oid: jnp.ndarray,
    *,
    word_size: int,
    window: int,
    diag_mask: int,
):
    """Provable SUPERSET of the seeds the two-hit replay will extend
    (s_BlastnDiagTableExtendInitialHit, na_ungapped.c:612-755, default
    scan_range 0), so the ungapped extension only runs on admitted
    lanes and the host replay stays bit-exact.

    Proof sketch: the replay extends a hit only as (a) the second hit
    of a pair -- admission test ``s + W <= last_hit + window`` where the
    machine's last_hit is always some EARLIER raw hit's end, at most
    ``s' + 2W`` (first-hit ends include the capped right run; failed
    second hits store ``s' + W``; saved extensions set flag=1, whose
    next hit takes the first-hit branch, never the pair test) -- so the
    pair test implies ``s - s_prev <= window + W`` against the NEAREST
    previous raw hit on the same (oid, masked-diag); or (b) a double
    word, ``right_run >= W``. Diagonal aliasing partitions identically
    in global and subject-local coordinates within an oid (the class
    shift is constant per subject), so global coords are safe here.
    """
    n = qs.shape[0]
    big = _I32_BIG
    diag = ss - qs
    if diag_mask:
        diag = diag & jnp.int32(diag_mask)
    o_key = jnp.where(ok, oid, big)
    d_key = jnp.where(ok, diag, big)
    s_key = jnp.where(ok, ss, big)
    idx = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    o_s, d_s, s_s, i_s = jax.lax.sort(
        (o_key, d_key, s_key, idx), num_keys=3
    )
    prev_same = (o_s[1:] == o_s[:-1]) & (d_s[1:] == d_s[:-1])
    near = (s_s[1:] - s_s[:-1]) <= (window + word_size)
    adm_sorted = jnp.concatenate(
        [jnp.zeros(1, bool), prev_same & near]
    )
    # un-permute with a single-key sort: a multi-million-lane random
    # scatter is gather-bound on TPU (~7 ms/M), the radix sort is not
    # (~0.6 ms/M)
    _orig, adm = jax.lax.sort(
        (i_s, adm_sorted.astype(jnp.int32)), num_keys=1
    )
    return ok & (adm.astype(bool) | (right_run >= word_size))


def _clamped_reset_walk(scores, max_steps, x, clamp_steps):
    """(best, best_pos, exact) of the reset-at-best X-drop walk over
    ``scores`` [rows, C] (step j = column j-1): walk accumulates, every
    strict improvement commits (best, position), stop when the running
    sum drops more than ``x`` below the best. Exactly _xdrop_direction
    semantics within the clamp; ``exact`` marks rows whose walk
    resolved inside it (full range fit, or a genuine drop fired
    strictly inside the true range)."""
    C = scores.shape[1]
    d = jnp.arange(C, dtype=jnp.int32)
    # beyond the true bound the walk cannot go: NEG_BIG stops it
    # with best/best_pos unchanged (equivalent to the bound stop)
    s = jnp.where(d[None, :] < max_steps[:, None], scores, NEG_BIG)
    cs = jnp.cumsum(s, axis=1)
    run = jax.lax.cummax(cs, axis=1)
    prev = jnp.maximum(
        jnp.concatenate(
            [jnp.zeros((cs.shape[0], 1), cs.dtype), run[:, :-1]],
            axis=1,
        ),
        0,
    )
    dropped = (cs - prev) < -x[:, None]
    any_drop = dropped.any(axis=1)
    first = jnp.argmax(dropped, axis=1)          # column index
    stop = jnp.where(any_drop, first, C - 1)     # last live column
    live = d[None, :] <= stop[:, None]
    cs_live = jnp.where(live, cs, NEG_BIG)
    best = cs_live.max(axis=1)
    pos = jnp.argmax(cs_live == best[:, None], axis=1) + 1
    best = jnp.maximum(best, 0)
    pos = jnp.where(best > 0, pos, 0)
    genuine = dropped & (d[None, :] < max_steps[:, None])
    exact = (max_steps <= clamp_steps) | genuine.any(axis=1)
    return best, pos, exact


def approx_gate_device(
    qbytes: jnp.ndarray,          # int32[qcap-3] truncated query bytes
    subject_w: jnp.ndarray,       # uint32[S/16] (pack_subject_words)
    table256: jnp.ndarray,        # int32[256] packed score table
    q_off: jnp.ndarray,           # int32[n] buffer coords
    s_off: jnp.ndarray,           # int32[n] global coords
    need: jnp.ndarray,            # bool[n]
    x_drop: jnp.ndarray,          # int32[n]
    reduced: jnp.ndarray,         # int32[n] per-seed reduced cutoff
    sub_start: jnp.ndarray,       # int32[n] owning subject start
    sub_end: jnp.ndarray,         # int32[n]
    concat_end,                   # traced scalar (buffer index past end)
    *,
    clamp_bytes: int = 48,
):
    """The reference's approximate ungapped pass ON DEVICE, clamped
    (s_NuclUngappedExtend, na_ungapped.c:263; host twin
    engine.approx.approx_ungapped_one): score four bases at a time off
    the packed subject via the 256-entry XOR table, reset-at-positive.

    A seed resolves when (a) both directions genuinely stopped inside
    the clamp -- the returned approx data is then bit-exact -- or
    (b) the clamped score already reaches the reduced cutoff, which is
    monotone in further steps, so the verdict 'not demoted' is final.
    Unresolved seeds count in n_unresolved; the caller falls back.

    Returns (demote, a_q, a_s, a_end, a_score, resolved) -- a_q/a_s the
    substituted extension start (buffer/global), a_end the substituted
    ungapped END (global; max of the word+run end is applied by the
    caller which knows rr), a_score the approx score."""
    n = q_off.shape[0]
    CL = clamp_bytes
    q_ref = q_off - 1
    s_loc = s_off - sub_start
    adj = (4 - (s_loc & 3)) & 3
    q_ext = q_ref + adj
    s_ext = s_loc + adj
    sub_byte0 = sub_start >> 2
    qb = q_ext + 1
    n_left = jnp.where(need, jnp.minimum(q_ext, s_ext) >> 2, 0)
    qlen_ref = concat_end - 1
    slen = sub_end - sub_start
    n_right = jnp.where(
        need,
        jnp.minimum(qlen_ref - q_ext, slen - s_ext) >> 2, 0,
    )
    sb = sub_byte0 + (s_ext >> 2)

    QB = qbytes.shape[0]
    SB = subject_w.shape[0] * 4

    def sbyte_at(b):
        b_c = jnp.clip(b, 0, SB - 1)
        w = subject_w[b_c >> 2]
        return ((w >> (((3 - (b_c & 3)) << 3)).astype(jnp.uint32))
                & 255).astype(jnp.int32)

    # the 256-entry XOR table is a closed form of the byte (each zero
    # 2-bit group is a match): score = m*reward + (4-m)*penalty. The
    # reward/penalty units recover exactly from the table corners
    # (table[0] = 4*reward, table[255] = 4*penalty; >> 2 is exact on
    # multiples of 4), and the elementwise form beats a [lanes, CL]
    # random gather on the VPU.
    reward = table256[0] >> 2
    penalty = table256[255] >> 2

    def score_of(x):
        p = (x | (x >> 1)) & 0x55
        mism = (p & 1) + ((p >> 2) & 1) + ((p >> 4) & 1) + (p >> 6)
        return mism * penalty + (4 - mism) * reward

    j = jnp.arange(1, CL + 1, dtype=jnp.int32)
    # left: step j reads subject byte sb - j, query byte qb - 4j
    t_l = score_of(
        qbytes[jnp.clip(qb[:, None] - 4 * j[None, :], 0, QB - 1)]
        ^ sbyte_at(sb[:, None] - j[None, :])
    )
    l_best, l_pos, l_exact = _clamped_reset_walk(
        t_l, n_left, x_drop, CL
    )
    # right: step j reads subject byte sb + j - 1, query byte
    # qb + 4(j-1)
    t_r = score_of(
        qbytes[jnp.clip(qb[:, None] + 4 * (j[None, :] - 1), 0, QB - 1)]
        ^ sbyte_at(sb[:, None] + j[None, :] - 1)
    )
    r_best, r_pos, r_exact = _clamped_reset_walk(
        t_r, n_right, x_drop, CL
    )

    total = l_best + r_best
    not_demoted_early = total >= reduced
    resolved_exact = l_exact & r_exact
    resolved = (~need) | resolved_exact | not_demoted_early
    demote = need & resolved_exact & (total < reduced)

    q_start = q_ext - 4 * l_pos
    a_q = q_start + 1
    a_s = s_ext - 4 * l_pos + sub_start
    new_q_r = jnp.where(r_pos > 0, q_ext + 4 * r_pos - 1, q_ext)
    a_r = new_q_r + 1
    a_end = a_s + (a_r - a_q + 1)
    return demote, a_q, a_s, a_end, total, resolved


def diag_replay_device(
    qs: jnp.ndarray,
    ss: jnp.ndarray,
    ok: jnp.ndarray,
    right_run: jnp.ndarray,
    oid: jnp.ndarray,
    ug_end: jnp.ndarray,          # int32[n] ungapped extension end (global)
    ug_score: jnp.ndarray,
    cutoff: jnp.ndarray,          # int32[n] per-seed word cutoff
    *,
    word_size: int,
    window: int,
    diag_mask: int,
    short_waves: int = 8,
    n_long_cap: int = 8192,
    long_jump_cap: int = 512,
):
    """The per-diagonal replay ON DEVICE, bit-exact to the host twins:
    ``window > 0`` replays ``two_hit_diag_filter``
    (s_BlastnDiagTableExtendInitialHit, na_ungapped.c:612-755, scan
    range 0); ``window == 0`` replays ``one_hit_diag_filter`` (same
    reference loop with the pair test degenerate, ``right_run``
    ignored).

    The sequential per-(oid, masked-diag) state machine is independent
    across diagonals. Seeds sort by (oid, diag, s, q) with every
    per-seed operand riding the sort as payload, which makes segments
    CONTIGUOUS runs -- so wave k (the transition at element k of every
    segment) reads its predecessor state with a whole-array SHIFT, not
    a gather; the short tier is pure elementwise VPU work. Segments
    still alive after ``short_waves`` compact to ``n_long_cap`` rows
    and finish by STATE JUMPING: every processed (non-skipped) seed
    advances last_hit by at least word_size -- a failure pushes it to
    s + word, a save to the ungapped end -- so the next processed seed
    is found with a binary search over the segment's ascending s, and
    a dense chain of L seeds (a perfect query-long match emits one
    seed per position) replays in about L / word_size jumps.

    Returns (saved bool[n], n_overflow): n_overflow > 0 when a segment
    was still unfinished after long_jump_cap jumps or more than
    n_long_cap segments were long -- the caller must fall back (or
    retry bigger).
    """
    n = qs.shape[0]
    big = _I32_BIG
    diag = ss - qs
    if diag_mask:
        diag = diag & jnp.int32(diag_mask)
    o_key = jnp.where(ok, oid, big)
    d_key = jnp.where(ok, diag, big)
    s_key = jnp.where(ok, ss, big)
    q_key = jnp.where(ok, qs, big)
    idx = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    # payloads RIDE the sort: measured on v5e, a 1M-lane gather costs
    # ~7 ms while an extra sort operand costs ~0.5 ms -- the round-4
    # keys-only-sort-plus-gathers pattern was a 10x pessimization
    # (idx promotes to a 5th key so duplicate (o,d,s,q) tuples order
    # deterministically; the machine's verdicts are order-invariant
    # among identical seeds)
    (o_s, d_s, s_s, _q_s, i_s, rr_s, end_s, sc_s, cut_s) = jax.lax.sort(
        (o_key, d_key, s_key, q_key, idx,
         right_run, ug_end, ug_score, cutoff),
        num_keys=5,
    )
    ok_s = o_s != big

    head = ok_s & jnp.concatenate([
        jnp.ones(1, bool),
        (o_s[1:] != o_s[:-1]) | (d_s[1:] != d_s[:-1]),
    ])
    # position within segment: distance to the latest head at or before
    head_pos = jax.lax.cummax(jnp.where(head, idx, -1), axis=0)
    pos_in_seg = idx - head_pos

    W = jnp.int32(word_size)
    win = jnp.int32(window)

    def step(last_hit, flag, e_c, live):
        """One machine transition at sorted element e_c (gather form,
        used by the jump tier); returns (upd, passed, s_end)."""
        s = s_s[e_c]
        s_end_raw = s + W
        skip = s < last_hit
        if window > 0:
            first = flag | (s_end_raw > last_hit + win)
            ext = rr_s[e_c]
            hit_ready = jnp.where(first, ext >= W, True)
            s_end = jnp.where(first, s_end_raw + ext, s_end_raw)
            passed = hit_ready & (sc_s[e_c] >= cut_s[e_c])
        else:
            # one-hit: every non-skipped seed takes the cutoff test
            passed = sc_s[e_c] >= cut_s[e_c]
            s_end = s_end_raw
        s_end = jnp.where(passed, end_s[e_c], s_end)
        return live & ~skip, passed, s_end

    # ---- short tier: elementwise waves over the whole sorted array.
    # state arrays hold the machine state AFTER each element; wave k
    # feeds element e from element e - 1 (same segment: contiguous)
    # via a shift, resetting at heads. No gathers.
    s_end_raw_v = s_s + W
    neg_w = jnp.int32(-window)

    def step_all(last_in, flag_in):
        skip = s_s < last_in
        if window > 0:
            first = flag_in | (s_end_raw_v > last_in + win)
            hit_ready = jnp.where(first, rr_s >= W, True)
            s_end = jnp.where(first, s_end_raw_v + rr_s, s_end_raw_v)
            passed = hit_ready & (sc_s >= cut_s)
        else:
            passed = sc_s >= cut_s
            s_end = s_end_raw_v
        s_end = jnp.where(passed, end_s, s_end)
        last_out = jnp.where(skip, last_in, s_end)
        flag_out = jnp.where(skip, flag_in, passed)
        return last_out, flag_out, ~skip & passed

    last_state = jnp.full(n, neg_w, jnp.int32)
    flag_state = jnp.zeros(n, bool)
    saved_s = jnp.zeros(n, bool)
    for k in range(short_waves):
        prev_last = jnp.concatenate([
            jnp.full(1, neg_w, jnp.int32), last_state[:-1],
        ])
        prev_flag = jnp.concatenate([
            jnp.zeros(1, bool), flag_state[:-1],
        ])
        in_last = jnp.where(head, neg_w, prev_last)
        in_flag = jnp.where(head, False, prev_flag)
        lo_, fo_, sv_ = step_all(in_last, in_flag)
        active = ok_s & (pos_in_seg == k)
        last_state = jnp.where(active, lo_, last_state)
        flag_state = jnp.where(active, fo_, flag_state)
        saved_s = saved_s | (active & sv_)

    # ---- long tier: segments with an element at pos == short_waves
    # (pos_in_seg keeps counting into the invalid tail after the last
    # head, so the element itself must be ok)
    head_idx, seg_fill, _n_segs = compact_indices(head, n, n - 1)
    e_long = jnp.minimum(head_idx + short_waves, n - 1)
    long_seg = (
        seg_fill
        & (head_idx + short_waves < n)
        & (pos_in_seg[e_long] == short_waves)
        & ok_s[e_long]
    )
    n_long = long_seg.sum()
    lidx, lfill, _nl = compact_indices(long_seg, n_long_cap, 0)
    l_head = head_idx[lidx]

    # segment end = next head (ok lanes are a sorted prefix, so the
    # last segment ends at the ok count)
    n_ok = ok_s.sum().astype(jnp.int32)
    nxt = jnp.concatenate([head_idx[1:], jnp.full(1, 0, jnp.int32)])
    nxt_fill = jnp.concatenate([seg_fill[1:], jnp.zeros(1, bool)])
    l_end = jnp.where(nxt_fill, nxt, n_ok)[lidx]

    # state jumping, from the segment start (the short-wave prefix on
    # long segments computed the identical transitions; saved bits are
    # idempotent): cur always points at a non-skipped element, and the
    # next one is the first j with s >= last_hit (s ascending in the
    # segment), found by an unrolled lower-bound search
    LOG = max(1, int(n - 1).bit_length())

    def jump_cond(state):
        it, cur, _last, _flag, _saved = state
        return (it < long_jump_cap) & (lfill & (cur < l_end)).any()

    def jump(state):
        it, cur, last, flag_j, saved = state
        e_c = jnp.minimum(cur, n - 1)
        live = lfill & (cur < l_end)
        upd, passed, s_end = step(last, flag_j, e_c, live)
        new_last = jnp.where(upd, s_end, last)
        new_flag = jnp.where(upd, passed, flag_j)
        saved = saved.at[jnp.where(upd & passed, e_c, n)].set(
            True, mode="drop"
        )
        lo = cur + 1
        hi = l_end
        for _b in range(LOG):
            cont = lo < hi
            mid = (lo + hi) >> 1
            less = s_s[jnp.clip(mid, 0, n - 1)] < new_last
            lo = jnp.where(cont & less, mid + 1, lo)
            hi = jnp.where(cont & ~less, mid, hi)
        new_cur = jnp.where(live, lo, cur)
        return (it + 1, new_cur, new_last, new_flag, saved)

    init_l = (
        jnp.zeros((), jnp.int32),
        l_head,
        jnp.full(n_long_cap, neg_w, jnp.int32),
        jnp.zeros(n_long_cap, bool),
        saved_s,
    )
    # while_loop, not scan: the cap bounds the pathological case, but
    # typical batches finish in ~(longest chain / word_size) jumps
    (_it, l_cur, _ll, _lf, saved_s) = jax.lax.while_loop(
        jump_cond, jump, init_l
    )

    # overflow: a long segment still unfinished, or too many longs
    unfinished = (lfill & (l_cur < l_end)).sum()
    n_overflow = (
        jnp.maximum(n_long - n_long_cap, 0) + unfinished
    ).astype(jnp.int32)

    # saved is indexed in SORTED element space; invert the permutation
    # with a single-key sort (a 1M-lane random scatter is gather-bound
    # on TPU; the radix sort is not)
    _orig, saved_orig = jax.lax.sort(
        (i_s, saved_s.astype(jnp.int32)), num_keys=1
    )
    return saved_orig.astype(bool), n_overflow


@functools.partial(
    jax.jit, static_argnames=("word_size", "clamp", "chunk_rows")
)
def ungapped_phase0_packed(
    query_nib: jnp.ndarray,       # uint32[Q/8] 4na-mask nibbles
    subject_w: jnp.ndarray,       # uint32[S/16] 2-bit words
    table64: jnp.ndarray,         # int32[72] (pallas_ungapped.make_table64)
    q_off: jnp.ndarray,           # int32[n] seed starts
    s_off: jnp.ndarray,
    valid: jnp.ndarray,           # bool[n]
    x_drop: jnp.ndarray,          # int32[n]
    max_l: jnp.ndarray,           # int32[n] true max steps left
    max_r: jnp.ndarray,           # int32[n] true max steps right
    *,
    word_size: int,
    clamp: int = 48,
    chunk_rows: int = 32768,
):
    """Exact CLAMPED bidirectional X-drop on packed words: the phase-0
    filter in front of the Pallas window kernel.

    Random seeds die to the X-drop within a few bases (the reference's
    per-hit scalar extension exploits exactly this,
    s_NuclUngappedExtendExact na_ungapped.c:152); paying the full
    window kernel for every raw seed is the dominant cost of dense
    one-hit workloads (blastn word 11). This op walks at most ``clamp``
    steps left and ``word_size + clamp`` steps right with the
    closed-form matrix scoring (no gathers beyond ~10 packed words per
    seed) and reports ``exact`` for seeds whose BOTH directions
    resolved within the clamp (a genuine X-drop stop, or the true
    sequence bound) -- for those the returned extension is bit-exact
    and the window kernel is skipped.

    Returns (uq, us, ulen, uscore, exact), all [n].
    """
    n = q_off.shape[0]
    Q8 = query_nib.shape[0]
    S16 = subject_w.shape[0]
    C_L = clamp
    C_R = word_size + clamp
    T = C_L + C_R                # window [off - C_L, off + C_R)
    nq_words = (7 + T + 7) // 8 + 1
    ns_words = (15 + T + 15) // 16 + 1
    reward = table64[64]
    penalty = table64[65]
    amb2 = table64[66]
    amb3 = table64[67]
    amb4 = table64[68]
    sent = table64[69]

    def extract_codes(words, base, per_word, bits, mask):
        """[rows, T] code extraction from gathered packed words."""
        shift_unit = 32 // per_word
        # floor division (correct for negative base near position 0)
        j0 = jnp.floor_divide(base, per_word)
        phase = (base - j0 * per_word).astype(jnp.int32)
        nw = (per_word - 1 + T + per_word - 1) // per_word + 1
        ws = [
            words[jnp.clip(j0 + k, 0, words.shape[0] - 1)]
            for k in range(nw)
        ]
        d = jnp.arange(T, dtype=jnp.int32)
        pos = phase[:, None] + d[None, :]
        k = pos // per_word
        sh = (((per_word - 1) - (pos % per_word))
              * shift_unit).astype(jnp.uint32)
        codes = jnp.zeros(pos.shape, jnp.uint32)
        for kk in range(nw):
            codes = codes | jnp.where(
                k == kk, (ws[kk][:, None] >> sh) & mask, 0
            )
        return codes

    direction = _clamped_reset_walk

    def score_codes(qmask, scode):
        deg = ((qmask & 1) + ((qmask >> 1) & 1)
               + ((qmask >> 2) & 1) + ((qmask >> 3) & 1))
        sbit = jnp.left_shift(jnp.uint32(1), scode)
        member = (qmask & sbit) != 0
        exact_m = qmask == sbit
        amb = jnp.where(deg == 2, amb2,
                        jnp.where(deg == 3, amb3, amb4))
        return jnp.where(
            qmask == 0, sent,
            jnp.where(exact_m, reward,
                      jnp.where(member, amb, penalty)),
        ).astype(jnp.int32)

    def one_chunk(args):
        qo, so, xv, ml, mr = args
        qmask = extract_codes(query_nib, qo - C_L, 8, 4, jnp.uint32(15))
        scode = extract_codes(subject_w, so - C_L, 16, 2, jnp.uint32(3))
        sc = score_codes(qmask, scode)
        # left: step j reads window column C_L - j  (j = 1..C_L)
        sc_l = sc[:, :C_L][:, ::-1]
        l_best, l_pos, l_exact = direction(sc_l, ml, xv, C_L)
        # right: step j reads window column C_L + j - 1
        sc_r = sc[:, C_L:]
        r_best, r_pos, r_exact = direction(sc_r, mr, xv, C_R)
        return (
            qo - l_pos, so - l_pos, l_pos + r_pos,
            l_best + r_best, l_exact & r_exact,
        )

    rows = min(chunk_rows, n)
    if n % rows:
        rows = n          # odd sizes: single chunk
    shaped = tuple(
        a.reshape(n // rows, rows)
        for a in (q_off, s_off, x_drop,
                  jnp.minimum(max_l, 1 << 24),
                  jnp.minimum(max_r, 1 << 24))
    )
    uq, us, ulen, uscore, exact = jax.lax.map(one_chunk, shaped)
    uq = uq.reshape(n).astype(jnp.int32)
    us = us.reshape(n).astype(jnp.int32)
    ulen = ulen.reshape(n).astype(jnp.int32)
    uscore = jnp.where(valid, uscore.reshape(n), 0).astype(jnp.int32)
    exact = exact.reshape(n) & valid
    uq = jnp.where(valid, uq, 0)
    us = jnp.where(valid, us, 0)
    ulen = jnp.where(valid, ulen, 0)
    return uq, us, ulen, uscore, exact


def _xdrop_direction(
    scores_at,                    # fn(j: int32[n, K]) -> int32[n, K] scores
    max_steps: jnp.ndarray,       # int32[n] hard bound per seed
    x_drop: jnp.ndarray | int,    # positive magnitude
    chunk: int,
):
    """Shared chunked X-drop scan. Returns (best, best_pos).

    Implements the reset-at-best accumulation of s_NuclUngappedExtendExact:
    walk j = 1.., keep running sum S_j; strict improvement records a new
    best (score & position); stop when S_j - best < -X. Per chunk this is a
    cumsum + associative running max; the carry is (S, best, best_pos, done).
    """
    n = max_steps.shape[0]
    x = jnp.broadcast_to(jnp.asarray(x_drop, dtype=jnp.int32), (n,))

    def cond(state):
        base, _s, _b, _p, done, _bound = state
        return jnp.logical_not(jnp.all(done))

    def body(state):
        base, s, best, best_pos, done, bound = state
        j = base + jnp.arange(1, chunk + 1, dtype=jnp.int32)[None, :]
        sc = scores_at(j)
        sc = jnp.where(j <= max_steps[:, None], sc, NEG_BIG)
        cs = s[:, None] + jnp.cumsum(sc, axis=1)
        runmax = jax.lax.associative_scan(jnp.maximum, cs, axis=1)
        best_before = jnp.concatenate(
            [best[:, None], jnp.maximum(best[:, None], runmax[:, :-1])], axis=1
        )
        dropped = (cs - best_before) < -x[:, None]
        # first dropped position in this chunk (chunk if none)
        stop = jnp.where(
            jnp.any(dropped, axis=1), jnp.argmax(dropped, axis=1), chunk
        ).astype(jnp.int32)
        live = (
            (jnp.arange(chunk, dtype=jnp.int32)[None, :] <= stop[:, None])
            & jnp.logical_not(done)[:, None]
        )
        cand = jnp.where(live, cs, NEG_BIG)
        chunk_best = jnp.max(cand, axis=1)
        improved = chunk_best > best
        # first position attaining the chunk max (ties keep earliest)
        first_pos = jnp.argmax(cand == chunk_best[:, None], axis=1).astype(
            jnp.int32
        )
        new_best = jnp.where(improved, chunk_best, best)
        new_pos = jnp.where(
            improved & jnp.logical_not(done), base + first_pos + 1, best_pos
        )
        dropped_any = jnp.any(dropped, axis=1)
        exceeded = base + chunk >= max_steps
        # terminated by the step bound without an X-drop decision: either
        # the chunk ran out with no drop, or the "drop" happened past
        # max_steps (the NEG_BIG mask region, i.e. the bound itself)
        stop_j = base + stop + 1
        artificial = dropped_any & (stop_j > max_steps)
        new_bound = bound | (
            jnp.logical_not(done)
            & (artificial | (jnp.logical_not(dropped_any) & exceeded))
        )
        now_done = done | dropped_any | exceeded
        last_live = jnp.where(done, s, cs[:, -1])
        stop_s = jnp.where(
            dropped_any,
            jnp.take_along_axis(cs, stop[:, None], axis=1)[:, 0],
            last_live,
        )
        new_s = jnp.where(done, s, stop_s)
        return (base + chunk, new_s, new_best, new_pos, now_done, new_bound)

    # derive the zero carries from max_steps so they inherit its
    # device-varying type under shard_map (jax vma rules)
    zero_n = max_steps * 0
    init = (
        jnp.zeros((), jnp.int32),
        zero_n,
        zero_n,
        zero_n,
        max_steps <= 0,
        max_steps < 0,   # all-False, derived for shard_map vma typing
    )
    _, _, best, best_pos, _, bound = jax.lax.while_loop(cond, body, init)
    return best, best_pos, bound


@functools.partial(
    jax.jit, static_argnames=("chunk", "max_extend", "return_bounds")
)
def ungapped_extend(
    query: jnp.ndarray,           # uint8[Q] BLASTNA
    subject2: jnp.ndarray,        # int8[S_pad]
    subject_valid: jnp.ndarray,   # bool[S_pad]
    matrix16: jnp.ndarray,        # int32[16, 4] BLASTNA x 2na scores
    q_off: jnp.ndarray,           # int32[n] seed starts (mini-extended)
    s_off: jnp.ndarray,
    valid: jnp.ndarray,           # bool[n]
    x_dropoff: jnp.ndarray,       # int32[n] per-seed raw X-drop magnitude
    *,
    chunk: int = 64,
    max_extend: int = 0,          # 0 = unbounded; else clamp per direction
    return_bounds: bool = False,  # also return per-direction bound stops
):
    """Exact bidirectional X-drop ungapped extension
    (s_NuclUngappedExtendExact, na_ungapped.c:152).

    Returns (q_start, s_start, length, score, truncated) per seed. The
    right pass starts at the seed start (re-scoring the word region);
    the left pass starts one base before it. Scores use the BLASTNA-row
    matrix so query ambiguity codes and sentinels score identically to
    the reference. With ``max_extend`` set, extensions stop after that
    many steps per direction and ``truncated`` marks seeds whose result
    is inexact (the caller re-runs those unclamped -- the escalation
    pattern bounding the while_loop cost to the short common case).
    """
    Q = query.shape[0]
    S = subject2.shape[0]
    n = q_off.shape[0]

    def make_scores(sign):
        def scores_at(j):  # j: [n, K] step index (1-based)
            if sign < 0:
                qi = q_off[:, None] - j
                si = s_off[:, None] - j
            else:
                qi = q_off[:, None] + (j - 1)
                si = s_off[:, None] + (j - 1)
            inb = (qi >= 0) & (qi < Q) & (si >= 0) & (si < S)
            qic = jnp.clip(qi, 0, Q - 1)
            sic = jnp.clip(si, 0, S - 1)
            sc = matrix16[query[qic].astype(jnp.int32),
                          subject2[sic].astype(jnp.int32)]
            ok = inb & subject_valid[sic]
            return jnp.where(ok, sc, NEG_BIG).astype(jnp.int32)

        return scores_at

    max_left = jnp.where(valid, jnp.minimum(q_off, s_off), 0)
    max_right = jnp.where(
        valid, jnp.minimum(Q - q_off, S - s_off), 0
    )
    if max_extend:
        true_left, true_right = max_left, max_right
        max_left = jnp.minimum(max_left, max_extend)
        max_right = jnp.minimum(max_right, max_extend)

    left_best, left_pos, left_bound = _xdrop_direction(
        make_scores(-1), max_left.astype(jnp.int32), x_dropoff, chunk
    )
    right_best, right_pos, right_bound = _xdrop_direction(
        make_scores(+1), max_right.astype(jnp.int32), x_dropoff, chunk
    )
    left_best = jnp.maximum(left_best, 0)
    right_best = jnp.maximum(right_best, 0)
    left_pos = jnp.where(left_best > 0, left_pos, 0)
    right_pos = jnp.where(right_best > 0, right_pos, 0)

    score = left_best + right_best
    q_start = q_off - left_pos
    s_start = s_off - left_pos
    length = left_pos + right_pos
    # a result is truncated (inexact) only if a direction stopped at the
    # artificial clamp rather than the true sequence bound
    if max_extend:
        truncated = valid & (
            (left_bound & (true_left > max_extend))
            | (right_bound & (true_right > max_extend))
        )
    else:
        truncated = jnp.zeros_like(valid)
    out = (
        q_start.astype(jnp.int32),
        s_start.astype(jnp.int32),
        length.astype(jnp.int32),
        jnp.where(valid, score, 0).astype(jnp.int32),
        truncated,
    )
    if return_bounds:
        # a direction "bound-stopped" when the walk exhausted its step
        # budget without a genuine X-drop decision; the caller decides
        # whether that budget was a true sequence end or an artificial
        # clamp (block-streaming buffer edge) needing escalation
        out = out + (valid & left_bound, valid & right_bound)
    return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "scan_step", "lut_word", "word_size", "cmax", "n_scan", "hit_cap",
        "seed_cap", "chunk", "phase1_extend", "disc_offsets",
    ),
)
def seeding_pipeline(
    subject2: jnp.ndarray,        # int8[S_pad]
    subject_valid: jnp.ndarray,   # bool[S_pad]
    lut_offsets: jnp.ndarray,     # int32[4^w + 1]
    lut_positions: jnp.ndarray,   # int32[P]
    query: jnp.ndarray,           # uint8[Q]
    matrix16: jnp.ndarray,        # int32[16, 4]
    ctx_offsets: jnp.ndarray,     # int32[CTX_CAP] padded with INT32_MAX
    x_dropoffs: jnp.ndarray,      # int32[CTX_CAP] per-context raw X-drop
    *,
    scan_step: int,
    lut_word: int,
    word_size: int,
    cmax: int,
    n_scan: int,
    hit_cap: int,
    seed_cap: int,
    chunk: int = 64,
    phase1_extend: int = 96,
    mask_starts=None,
    mask_ends=None,
    q_allowed=None,               # bool[Q_pad]: indexed-megablast mode
    disc_offsets: tuple[int, ...] | None = None,
):
    """Fused device seeding: scan -> seed compaction -> mini-extension
    -> survivor compaction -> clamped X-drop ungapped extension, one
    XLA program, one D2H transfer.

    With ``q_allowed`` set, the scan runs in indexed-megablast mode:
    ``lut_offsets``/``lut_positions`` hold the DATABASE index and the
    query is walked instead of the subject (``indexed_scan_block``;
    ``n_scan`` is then the query scan extent and ``scan_step`` unused).

    The ungapped stage is clamped to ``phase1_extend`` steps per
    direction (random seeds die to the X-drop within a few bases); the
    returned ``trunc`` flags mark seeds still running at the clamp,
    which the host re-runs unclamped in a second, compacted device call
    (engine.seeding.run_seeding). This keeps the gather-heavy
    while_loop iterations proportional to the short common case.

    Returns (q_off, s_off, valid, ctx, q_start, s_start, length, score,
    trunc, n_overflow): seed arrays [seed_cap]; n_overflow > 0 => a
    capacity (hit_cap / cmax / seed_cap) overflowed, retry larger.
    """
    if q_allowed is not None:
        q_off, s_off, take, n_dropped, n_hit = indexed_scan_block(
            query, q_allowed, lut_offsets, lut_positions,
            lut_word=lut_word, cmax=cmax, n_scan=n_scan,
            hit_cap=hit_cap,
            mask_starts=mask_starts, mask_ends=mask_ends,
        )
    else:
        q_off, s_off, take, n_dropped, n_hit = scan_block(
            subject2, subject_valid, lut_offsets, lut_positions,
            scan_step=scan_step, lut_word=lut_word, word_size=word_size,
            cmax=cmax, n_scan=n_scan, hit_cap=hit_cap,
            mask_starts=mask_starts, mask_ends=mask_ends,
            pos_base_static=0, disc_offsets=disc_offsets,
        )
    # compact raw seeds before the gather-heavy mini-extension
    ridx, rfill, n_raw = compact_indices(take, seed_cap, 0)
    q_off = jnp.where(rfill, q_off[ridx], 0)
    s_off = jnp.where(rfill, s_off[ridx], 0)

    if disc_offsets is not None:
        # discontiguous hits are full template words: no mini-extension
        # (s_BlastNaExtendDirect, na_ungapped.c:941)
        qs, ss, ok = q_off, s_off, rfill
    else:
        qs, ss, ok = mini_extend(
            query, subject2, subject_valid, q_off, s_off, rfill,
            lut_word=lut_word, word_size=word_size,
        )
    qs = jnp.where(ok, qs, 0)
    ss = jnp.where(ok, ss, 0)

    ctx = (
        jnp.searchsorted(ctx_offsets, qs, side="right").astype(jnp.int32)
        - 1
    )
    ctx = jnp.clip(ctx, 0, x_dropoffs.shape[0] - 1)
    xd = x_dropoffs[ctx]

    # phase 1: clamped extension over all surviving seeds
    uq, us, ulen, uscore, trunc = ungapped_extend(
        query, subject2, subject_valid, matrix16, qs, ss, ok, xd,
        chunk=chunk, max_extend=phase1_extend,
    )
    n_overflow = n_dropped + jnp.maximum(n_raw - seed_cap, 0)
    return qs, ss, ok, ctx, uq, us, ulen, uscore, trunc, n_overflow, n_raw


@functools.partial(
    jax.jit,
    static_argnames=(
        "scan_step", "lut_word", "word_size", "cmax", "n_scan", "hit_cap",
        "seed_cap", "out_cap", "pos_base_static", "disc_offsets",
    ),
)
def seeding_scan_mini(
    subject2: jnp.ndarray,
    subject_valid: jnp.ndarray,
    lut_offsets: jnp.ndarray,
    lut_positions: jnp.ndarray,
    query: jnp.ndarray,
    ctx_offsets: jnp.ndarray,
    x_dropoffs: jnp.ndarray,
    subject_starts: jnp.ndarray,   # int64[num_subjects] base starts
    subject_ends: jnp.ndarray,     # int64[num_subjects] true ends
    pos_base=0,                    # first scan position (traced OK)
    pos_end=None,                  # exclusive scan bound (traced OK)
    mask_starts=None,              # int32[M] soft-mask starts (sorted)
    mask_ends=None,                # int32[M] soft-mask ends
    query_nib=None,                # uint32[Q/8]: use mini_extend_packed
    subject_w=None,                # uint32[S/16]
    q_allowed=None,                # bool[Q_pad]: indexed-megablast mode
    *,
    scan_step: int,
    lut_word: int,
    word_size: int,
    cmax: int,
    n_scan: int,
    hit_cap: int,
    seed_cap: int,
    out_cap: int = 0,
    pos_base_static: int | None = None,
    disc_offsets: tuple[int, ...] | None = None,
):
    """Device seeding WITHOUT the ungapped stage: scan -> compaction ->
    mini-extension -> per-seed context/X-drop/subject-bound lookup.
    ``out_cap`` > 0 compacts the mini-extension survivors to that many
    slots (they are scattered through [seed_cap]; the ungapped kernel
    then runs ~seed_cap/out_cap times fewer lanes); survivors beyond
    out_cap count as overflow, triggering the caller's capacity retry.

    Used when the Pallas ungapped kernel is the primary extension path
    (TPU): this program's outputs chain straight into
    ops.pallas_ungapped.ungapped_extend_pallas_prepared with no host
    round trip. Returns (q_off, s_off, valid, ctx, x_drop, max_l,
    max_r, n_overflow), all [seed_cap].
    """
    if q_allowed is not None:
        q_off, s_off, take, n_dropped, n_hit = indexed_scan_block(
            query, q_allowed, lut_offsets, lut_positions,
            lut_word=lut_word, cmax=cmax, n_scan=n_scan,
            hit_cap=hit_cap,
            mask_starts=mask_starts, mask_ends=mask_ends,
        )
    else:
        q_off, s_off, take, n_dropped, n_hit = scan_block(
            subject2, subject_valid, lut_offsets, lut_positions,
            scan_step=scan_step, lut_word=lut_word, word_size=word_size,
            cmax=cmax, n_scan=n_scan, hit_cap=hit_cap,
            pos_base=pos_base, pos_end=pos_end,
            mask_starts=mask_starts, mask_ends=mask_ends,
            pos_base_static=pos_base_static, disc_offsets=disc_offsets,
        )
    _ridx, rfill, n_raw, q_off, s_off = compact_with(
        take, seed_cap, 0, (q_off, s_off)
    )

    if disc_offsets is not None:
        # discontiguous hits are full template words: no mini-extension
        # (s_BlastNaExtendDirect, na_ungapped.c:941)
        qs, ss, ok = q_off, s_off, rfill
    elif query_nib is not None:
        # owning-subject bounds BEFORE the extension (mini-extension
        # never crosses the inter-subject pad, so the oid is stable
        # under the <= ext_to leftward shift)
        oid = jnp.clip(
            jnp.searchsorted(subject_starts, s_off, side="right") - 1,
            0, subject_starts.shape[0] - 1,
        )
        lo = subject_starts[oid].astype(jnp.int32)
        hi = subject_ends[oid].astype(jnp.int32)
        qs, ss, ok = mini_extend_packed(
            query_nib, subject_w, q_off, s_off, rfill, lo, hi,
            lut_word=lut_word, word_size=word_size,
        )
    else:
        qs, ss, ok = mini_extend(
            query, subject2, subject_valid, q_off, s_off, rfill,
            lut_word=lut_word, word_size=word_size,
        )
    qs = jnp.where(ok, qs, 0)
    ss = jnp.where(ok, ss, 0)

    n_overflow = n_dropped + jnp.maximum(n_raw - seed_cap, 0)

    # compact the survivors FIRST (payloads riding), then derive the
    # per-seed metadata (context, X-drop, subject bounds) on the far
    # smaller survivor set -- these searchsorteds/gathers used to run
    # on the full seed_cap lanes
    if out_cap and out_cap < seed_cap:
        _sidx, sfill, n_srv, qs, ss = compact_with(
            ok, out_cap, 0, (qs, ss)
        )
        ok_m = sfill
    else:
        n_srv = ok.sum()
        ok_m = ok

    ctx = (
        jnp.searchsorted(ctx_offsets, qs, side="right").astype(jnp.int32)
        - 1
    )
    ctx = jnp.clip(ctx, 0, x_dropoffs.shape[0] - 1)
    xd = jnp.where(ok_m, x_dropoffs[ctx], 1)

    # per-seed subject bounds for the Pallas kernel's window clamp
    oid = jnp.clip(
        jnp.searchsorted(subject_starts, ss, side="right") - 1,
        0, subject_starts.shape[0] - 1,
    )
    sub_l = (ss - subject_starts[oid]).astype(jnp.int32)
    sub_r = (subject_ends[oid] - ss).astype(jnp.int32)
    Q = query.shape[0]
    S = subject2.shape[0]
    max_l = jnp.minimum(jnp.minimum(qs, ss), sub_l)
    max_r = jnp.minimum(jnp.minimum(Q - qs, S - ss), sub_r)
    max_l = jnp.maximum(jnp.where(ok_m, max_l, 0), 0).astype(jnp.int32)
    max_r = jnp.maximum(jnp.where(ok_m, max_r, 0), 0).astype(jnp.int32)

    if out_cap and out_cap < seed_cap:
        ok = sfill
        n_overflow = n_overflow + jnp.maximum(n_srv - out_cap, 0)

    return (qs, ss, ok, ctx, xd, max_l, max_r, n_overflow, n_raw,
            n_hit, n_srv.astype(jnp.int32))


# --------------------------------------------------------------- streaming
# Subject block streaming (the TPU answer to the reference's 5MB subject
# chunking with overlap + HSP merge, blast_engine.c:220-305): the scan
# owns a disjoint core range of global stride positions per block, so no
# seed is ever found twice and no merge pass is needed; extensions run
# inside a context halo and the few that stop at the halo edge are
# re-extended exactly on the host (engine.stream).


def _valid_from_bounds(S, local_starts, local_ends):
    idx = jnp.arange(S, dtype=jnp.int32)
    oid = jnp.clip(
        jnp.searchsorted(local_starts, idx, side="right") - 1,
        0, local_starts.shape[0] - 1,
    )
    return (idx >= local_starts[oid]) & (idx < local_ends[oid])


@jax.jit
def block_arrays(
    packed: jnp.ndarray,          # uint8[S_buf // 4] 2-bit packed block
    local_starts: jnp.ndarray,    # int32[K] subject starts (buffer-local,
    local_ends: jnp.ndarray,      #   clipped); pad slots INT32_MAX
):
    """Unpack a streamed subject block on device and derive its validity
    mask from the (buffer-local) subject intervals. Uploading packed
    bytes moves 4x less data host->device than pre-unpacked codes."""
    subject2 = unpack_2na_device(packed)
    valid = _valid_from_bounds(subject2.shape[0], local_starts, local_ends)
    return subject2, valid


@jax.jit
def block_arrays_pallas(packed, local_starts, local_ends):
    """block_arrays + the guard-padded Pallas subject form."""
    from gblastn_tpu.ops.pallas_ungapped import prepare_subject

    subject2, valid = block_arrays(packed, local_starts, local_ends)
    return subject2, valid, prepare_subject(subject2)


@functools.partial(
    jax.jit,
    static_argnames=(
        "scan_step", "lut_word", "word_size", "cmax", "n_scan", "hit_cap",
        "seed_cap", "out_cap", "chunk", "pos_base_static", "disc_offsets",
    ),
)
def seeding_pipeline_block(
    packed: jnp.ndarray,          # uint8[S_buf // 4]
    local_starts: jnp.ndarray,    # int32[K]
    local_ends: jnp.ndarray,      # int32[K]
    lut_offsets: jnp.ndarray,
    lut_positions: jnp.ndarray,
    query: jnp.ndarray,
    matrix16: jnp.ndarray,
    ctx_offsets: jnp.ndarray,
    x_dropoffs: jnp.ndarray,
    pos_base,                     # int32 first local scan position
    pos_end,                      # int32 exclusive local scan bound
    mask_starts=None,             # int32[M] block-local soft-mask starts
    mask_ends=None,
    *,
    scan_step: int,
    lut_word: int,
    word_size: int,
    cmax: int,
    n_scan: int,
    hit_cap: int,
    seed_cap: int,
    out_cap: int = 0,
    chunk: int = 64,
    pos_base_static: int | None = None,
    disc_offsets: tuple[int, ...] | None = None,
):
    """One streamed block through the XLA seeding path: unpack -> scan
    (core positions only) -> mini-extension -> unclamped ungapped
    extension within the buffer, with per-direction bound-stop flags so
    the host can escalate halo-edge truncations.

    Returns (q_off, s_off, valid, ctx, q_start, s_start, length, score,
    bound_bits, max_l, max_r, n_overflow, n_raw); coordinates are
    buffer-local int32 (the host re-bases them to global int64, so
    databases beyond 2^31 bases stream fine)."""
    subject2, subject_valid = block_arrays(packed, local_starts, local_ends)
    (qs, ss, ok, ctx, xd, max_l, max_r, n_overflow, n_raw,
     _n_hit, _n_srv) = (
        seeding_scan_mini(
            subject2, subject_valid, lut_offsets, lut_positions, query,
            ctx_offsets, x_dropoffs, local_starts, local_ends,
            pos_base, pos_end, mask_starts, mask_ends,
            scan_step=scan_step, lut_word=lut_word, word_size=word_size,
            cmax=cmax, n_scan=n_scan, hit_cap=hit_cap, seed_cap=seed_cap,
            out_cap=out_cap, pos_base_static=pos_base_static,
            disc_offsets=disc_offsets,
        )
    )
    uq, us, ulen, uscore, _t, bl, br = ungapped_extend(
        query, subject2, subject_valid, matrix16, qs, ss, ok, xd,
        chunk=chunk, return_bounds=True,
    )
    bound_bits = bl.astype(jnp.int32) * 2 + br.astype(jnp.int32) * 4
    return (qs, ss, ok, ctx, uq, us, ulen, uscore, bound_bits,
            max_l, max_r, n_overflow, n_raw)
