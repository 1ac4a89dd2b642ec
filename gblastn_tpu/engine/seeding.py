"""Host orchestration of the device seeding stage.

Runs scan -> mini-extension -> ungapped extension on device
(gblastn_tpu.ops.seeding; on TPU the extension is the Pallas window
kernel, chained with scan+mini into async dispatches and one packed
fetch) and applies the sequential per-diagonal filter on host,
reproducing the accept/reject semantics of
``s_BlastnDiagTableExtendInitialHit`` (reference:
/root/reference/c++/src/algo/blast/core/na_ungapped.c:612-755): the
one-hit path for window_size == 0 (the blastn/megablast default) and
the two-hit paired-admission path for window_size > 0.

Correctness notes proven against the reference:
* mini-extension shifts a seed left by at most word_size - lut_word, which
  is strictly less than the scan stride, so per-diagonal order by adjusted
  s_off equals the reference's scan-order processing;
* diagonal state never interacts across diagonals, so processing order
  across diagonals is irrelevant;
* the final init-hit ordering is a total-order sort (score desc, s_start
  asc, length desc, q_start asc -- score_compare_match,
  blast_extend.c:279), which we reproduce exactly.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from gblastn_tpu.ops.seeding import (
    compact_indices,
    mini_extend,
    seeding_pipeline,
    ungapped_extend,
)
from gblastn_tpu.utils.profiling import slog


@dataclass
class InitHits:
    """Saved initial hits (BlastInitHitList analog), sorted by score order."""

    q_off: np.ndarray      # seed offsets (mini-extended starts)
    s_off: np.ndarray
    q_start: np.ndarray    # ungapped extension data
    s_start: np.ndarray
    length: np.ndarray
    score: np.ndarray
    context: np.ndarray    # query context per hit
    oid: np.ndarray        # subject id per hit

    def __len__(self) -> int:
        return len(self.q_off)


@dataclass
class SeedingDeviceData:
    """Device-resident arrays reused across subject blocks.

    On the TPU blob path the ONLY persistent subject array is the
    2-bit ``packed_dev`` (0.25 B/base; VERDICT r3 item 2): the int8
    codes, validity mask, packed words, and the Pallas guard-padded
    form are all derived INSIDE the seeding program per dispatch
    (transient HBM, freed when the dispatch ends). The materialized
    fields below are populated only for the non-blob legs (CPU
    pipeline, FORCE_XLA parity, indexed megablast) or lazily when a
    phase-2 escalation needs them."""

    query: jnp.ndarray          # uint8[Q]
    subject2: jnp.ndarray | None       # int8[S_pad] (None: packed-only)
    subject_valid: jnp.ndarray | None  # bool[S_pad]
    lut_offsets: jnp.ndarray
    lut_positions: jnp.ndarray
    matrix16: jnp.ndarray       # int32[16, 4]
    # padded form for the Pallas ungapped kernel (None = XLA fallback)
    pallas_subject: jnp.ndarray | None = None  # guard-padded fwd2d
    table64: jnp.ndarray | None = None
    # packed-word forms for mini_extend_packed (None = byte-gather path)
    query_nib: jnp.ndarray | None = None       # uint32[Q/8]
    subject_w: jnp.ndarray | None = None       # uint32[S/16]
    # host copies, needed only by the two-hit (window_size > 0) path
    host_query: np.ndarray | None = None
    host_subject2: np.ndarray | None = None
    host_valid: np.ndarray | None = None
    # indexed-megablast mode (-use_index): lut_offsets/lut_positions
    # hold the DATABASE index and the scan walks allowed query starts
    q_allowed: jnp.ndarray | None = None        # bool[Q]
    # per-DB device constants (cached on the db across batches)
    subject_starts_dev: jnp.ndarray | None = None
    subject_ends_dev: jnp.ndarray | None = None
    # 2-bit packed subject (uint8[S_pad/4]): the one persistent subject
    # array on the packed-only blob path
    packed_dev: jnp.ndarray | None = None
    # host-side batch inputs for the single-blob upload path (TPU):
    # when set (and not indexed), the per-batch ctx/xdrop/LUT/query
    # arrays ship as ONE device upload instead of ~6 (each separate
    # upload pays a tunnel round trip)
    host_qbuf: np.ndarray | None = None         # uint8[qcap], qcap % 8 == 0
    lut_pos_host: np.ndarray | None = None      # int32[qcap/32] allowed
                                                # seed-start bit mask
                                                # (engine.seeding.allowed_bits)
    lut_n_pos: int = 0                          # real (unpadded) count
    lut_table_size: int = 0


# (subject_pad, query_cap, word_size) -> last working (hit_cap, seed_cap)
_CAP_CACHE: dict[tuple, tuple[int, int]] = {}


@functools.partial(jax.jit, static_argnames=("table_size",))
def offsets_on_device(pos_words_padded, table_size: int):
    """Rebuild the CSR counts_offsets table on device from per-position
    word codes (pad slots carry ``table_size`` and are dropped). The
    dense table is 4^w+1 int32 -- 67MB at width 12 -- so shipping the
    4-byte-per-position codes instead saves ~0.5s/batch over the
    tunnel."""
    counts = jnp.zeros(table_size, jnp.int32)
    counts = counts.at[pos_words_padded].add(1, mode="drop")
    return jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)]
    )


def _round_up_pow2(n: int, lo: int = 256) -> int:
    """Smallest bucket >= n from {2^k, 3*2^(k-1)}: half-step buckets
    halve the worst-case lane over-allocation (a demand of 39k used to
    compile 65536-lane programs; now 49152 -- every downstream sort,
    walk, and compaction scales with the bucket), while the compiled-
    variant count stays logarithmic."""
    m = lo
    while m < n:
        if m + m // 2 >= n and m + m // 2 >= lo:
            return m + m // 2
        m *= 2
    return m


def sort_by_score_order(
    score: np.ndarray, s_start: np.ndarray, length: np.ndarray,
    q_start: np.ndarray,
) -> np.ndarray:
    """Index order of score_compare_match (blast_extend.c:279)."""
    return np.lexsort((q_start, -length, s_start, -score))


def _native_diag_order(q_off, s_off, oid, diag_mask=0):
    """Replay key order via native comparator sort (== np.lexsort
    ((q_off, s_off, diag, oid)) exactly); None if the lib is absent."""
    from gblastn_tpu.native import get_lib

    lib = get_lib()
    if lib is None:
        return None
    n = len(q_off)
    q32 = np.ascontiguousarray(q_off, np.int32)
    s32 = np.ascontiguousarray(s_off, np.int32)
    o32 = np.ascontiguousarray(oid, np.int32)
    order = np.empty(n, np.int64)
    rc = lib.gblastn_diag_order(
        q32.ctypes.data, s32.ctypes.data, o32.ctypes.data,
        n, diag_mask, order.ctypes.data,
    )
    if rc != 0:   # allocation failure: fall back to np.lexsort
        return None
    return order


def _native_diag_filter(
    q_off, s_off, oid, order, word_size, window,
    ung_s_start, ung_length, ung_score, cutoff, right_run,
    diag_mask=0,
):
    """Run the native replay loop; None if the native lib is absent."""
    from gblastn_tpu.native import get_lib

    lib = get_lib()
    if lib is None:
        return None
    import ctypes

    def c32(a):
        return np.ascontiguousarray(a, dtype=np.int32)

    n = len(q_off)
    saved = np.zeros(n, dtype=np.uint8)
    q32, s32, o32 = c32(q_off), c32(s_off), c32(oid)
    us32, ul32, sc32, cu32 = (
        c32(ung_s_start), c32(ung_length), c32(ung_score), c32(cutoff)
    )
    ord64 = np.ascontiguousarray(order, dtype=np.int64)
    rr32 = c32(right_run) if right_run is not None else None
    lib.gblastn_diag_filter(
        q32.ctypes.data, s32.ctypes.data, o32.ctypes.data,
        ord64.ctypes.data, ctypes.c_int64(n),
        ctypes.c_int64(word_size), ctypes.c_int64(window),
        ctypes.c_int64(diag_mask),
        us32.ctypes.data, ul32.ctypes.data,
        sc32.ctypes.data, cu32.ctypes.data,
        rr32.ctypes.data if rr32 is not None else None,
        saved.ctypes.data,
    )
    return saved.astype(bool)


def diag_table_mask(concat_qlen: int, window_size: int) -> int:
    """Diagonal-key mask replicating the reference's container choice:
    blastn-family searches with concatenated query length > 8000 use the
    exact eDiagHash container (mask 0 here = exact diagonals); smaller
    ones use the pow2 eDiagArray whose masked indexing ALIASES diagonals
    that differ by diag_array_length (BlastExtendWordNew,
    blast_extend.c:57 + kQueryLenForHashTable, blast_parameters.c:174).
    Aliased state is observable: a hit can be suppressed by the explored
    area of a far-away diagonal in the same congruence class."""
    if concat_qlen > 8000:
        return 0
    L = 1
    while L < concat_qlen + window_size:
        L <<= 1
    return L - 1


def one_hit_diag_filter(
    q_off: np.ndarray,
    s_off: np.ndarray,
    oid: np.ndarray,
    word_size: int,
    ung_s_start: np.ndarray,
    ung_length: np.ndarray,
    ung_score: np.ndarray,
    cutoff: np.ndarray,
    use_native: bool = True,
    diag_mask: int = 0,
) -> np.ndarray:
    """Sequential per-diagonal replay; returns boolean 'saved' mask.

    Seeds must cover one subject buffer; diagonal state is keyed on
    (oid, diag). Reference semantics (na_ungapped.c:612):
      - skip seeds starting inside the explored area (s_off < last_hit);
      - accepted seeds with ungapped score >= cutoff are saved and push
        last_hit to the ungapped end; failed ones push it to seed end.

    Runs natively (native/diagfilter.cpp) when available; the Python
    loop below is the parity oracle.
    """
    n = len(q_off)
    saved = np.zeros(n, dtype=bool)
    if n == 0:
        return saved
    if use_native:
        order = _native_diag_order(q_off, s_off, oid, diag_mask)
        if order is not None:
            native = _native_diag_filter(
                q_off, s_off, oid, order, word_size, 0,
                ung_s_start, ung_length, ung_score, cutoff, None,
                diag_mask,
            )
            if native is not None:
                return native
    diag = s_off.astype(np.int64) - q_off.astype(np.int64)
    if diag_mask:
        diag = diag & diag_mask
    # q tiebreak: aliased diagonals can carry two hits at one subject
    # position; the scan emits them in ascending-q chain order
    order = np.lexsort((q_off, s_off, diag, oid))
    last_key = None
    last_hit = 0
    for i in order:
        key = (int(oid[i]), int(diag[i]))
        if key != last_key:
            last_key = key
            last_hit = 0
        s = int(s_off[i])
        if s < last_hit:
            continue
        if ung_score[i] >= cutoff[i]:
            saved[i] = True
            last_hit = int(ung_s_start[i]) + int(ung_length[i])
        else:
            last_hit = s + word_size
    return saved


def compute_right_runs(
    query: np.ndarray,       # uint8[Q] BLASTNA with sentinels
    subject2: np.ndarray,    # int8[S] 2-bit codes
    valid: np.ndarray,       # bool[S]
    q_off: np.ndarray,
    s_off: np.ndarray,
    word_size: int,
) -> np.ndarray:
    """Exact-match run length to the right of each seed's word end,
    capped at word_size (the double-word probe of s_TypeOfWord,
    na_ungapped.c:559-586; equality there is checked through lookup
    membership, which reduces to base equality for unmasked seeds).
    Sentinels in the query (code 15) and subject padding stop the run,
    which enforces the reference's context/range bounds ext_max."""
    n = len(q_off)
    if n == 0:
        return np.zeros(0, np.int32)
    W = word_size
    k = np.arange(W)
    qi = np.minimum(q_off.astype(np.int64)[:, None] + W + k,
                    len(query) - 1)
    si = np.minimum(s_off.astype(np.int64)[:, None] + W + k,
                    len(subject2) - 1)
    match = (
        (query[qi] == subject2[si].astype(np.uint8))
        & (query[qi] < 4)
        & valid[si]
        & (q_off[:, None] + W + k < len(query))
        & (s_off[:, None] + W + k < len(subject2))
    )
    return np.cumprod(match, axis=1).sum(axis=1).astype(np.int32)


def two_hit_diag_filter(
    q_off: np.ndarray,
    s_off: np.ndarray,
    oid: np.ndarray,
    word_size: int,
    window: int,
    ung_s_start: np.ndarray,
    ung_length: np.ndarray,
    ung_score: np.ndarray,
    cutoff: np.ndarray,
    right_run: np.ndarray,
    use_native: bool = True,
    diag_mask: int = 0,
) -> np.ndarray:
    """Two-hit per-diagonal replay for window_size > 0
    (s_BlastnDiagTableExtendInitialHit, na_ungapped.c:612-755 with the
    default scan_range 0, so the off-diagonal probe is skipped).

    Per (oid, diag) state: last_hit = right end of the last hit seen,
    hit_saved flag. A hit is extended when it is the second hit within
    ``window`` of a pending first hit, or when it is itself a double
    word (exact run >= 2 * word_size, via ``right_run``).
    """
    n = len(q_off)
    saved = np.zeros(n, dtype=bool)
    if n == 0:
        return saved
    if use_native:
        order = _native_diag_order(q_off, s_off, oid, diag_mask)
        if order is not None:
            native = _native_diag_filter(
                q_off, s_off, oid, order, word_size, window,
                ung_s_start, ung_length, ung_score, cutoff, right_run,
                diag_mask,
            )
            if native is not None:
                return native
    diag = s_off.astype(np.int64) - q_off.astype(np.int64)
    if diag_mask:
        diag = diag & diag_mask
    order = np.lexsort((q_off, s_off, diag, oid))
    last_key = None
    last_hit = 0
    flag = 0
    for i in order:
        key = (int(oid[i]), int(diag[i]))
        if key != last_key:
            last_key = key
            # virgin diagonal: last_hit = -window (s_BlastDiagClear,
            # blast_extend.c:108), so the first hit always takes the
            # first-hit branch even when s_end <= window
            last_hit = -window
            flag = 0
        s = int(s_off[i])
        s_end = s + word_size
        if s < last_hit:
            continue
        if flag or s_end > last_hit + window:
            # first hit (or follows a saved hit): record it unless the
            # word itself extends to a double word
            ext = int(right_run[i])
            s_end += ext
            hit_ready = ext >= word_size
        else:
            hit_ready = True
        if hit_ready:
            if ung_score[i] >= cutoff[i]:
                saved[i] = True
                s_end = int(ung_s_start[i]) + int(ung_length[i])
            else:
                hit_ready = False
        last_hit = s_end
        flag = 1 if hit_ready else 0
    return saved


def two_hit_scan_range_filter(
    q_off: np.ndarray,
    s_off: np.ndarray,
    oid: np.ndarray,
    word_size: int,
    window: int,
    scan_range: int,
    ung_s_start: np.ndarray,
    ung_length: np.ndarray,
    ung_score: np.ndarray,
    cutoff: np.ndarray,
    right_run: np.ndarray,
    diag_mask: int = 0,
) -> np.ndarray:
    """Two-hit replay with the off-diagonal probe
    (-off_diagonal_range > 0): s_BlastnDiagTableExtendInitialHit
    (na_ungapped.c:612) with Delta = min(scan_range, window - word).

    Unlike the per-diagonal replay, neighbor diagonals interact, so
    hits process in scan order (s_off, then q_off) over an exact
    per-(oid, diag) state map -- the eDiagHash container semantics.
    ``right_run`` carries the double-word probe (s_TypeOfWord,
    zeros when word_length == lut_word_length).
    """
    n = len(q_off)
    saved = np.zeros(n, dtype=bool)
    if n == 0:
        return saved
    order = np.lexsort((q_off, s_off, oid))
    delta_max = min(scan_range, window - word_size)
    if delta_max < 0:
        delta_max = 0
    # (oid, diag) -> (last_hit, flag, hit_len)
    state: dict[tuple[int, int], tuple[int, int, int]] = {}
    for i in order:
        o = int(oid[i])
        s = int(s_off[i])
        q = int(q_off[i])
        diag = s - q
        if diag_mask:
            diag = diag & diag_mask
        # virgin diagonal: last_hit = -window (blast_extend.c:108)
        last_hit, flag, _hl = state.get((o, diag), (-window, 0, 0))
        s_end = s + word_size
        if s < last_hit:
            continue
        hit_ready = 1
        off_found = False
        if flag or s_end > last_hit + window:
            ext = int(right_run[i])
            s_end += ext
            if ext < word_size:
                # single word: probe the off-diagonals for a pending
                # (unsaved) hit whose span qualifies; double words
                # (word_type 2) skip the probe and stay ready
                s_a = s + word_size - window
                s_b = s_end - 2 * word_size
                for delta in range(1, delta_max + 1):
                    st = state.get(
                        (o, (diag + delta) & diag_mask if diag_mask
                         else diag + delta)
                    )
                    if (st and st[2]
                            and st[0] - delta >= s_a
                            and st[0] - st[2] <= s_b):
                        off_found = True
                        break
                    st = state.get(
                        (o, (diag - delta) & diag_mask if diag_mask
                         else diag - delta)
                    )
                    if (st and st[2]
                            and st[0] >= s_a
                            and st[0] - st[2] + delta <= s_b):
                        off_found = True
                        break
                if not off_found:
                    hit_ready = 0
        if hit_ready:
            if off_found or ung_score[i] >= cutoff[i]:
                saved[i] = True
                s_end = int(ung_s_start[i]) + int(ung_length[i])
            else:
                hit_ready = 0
        state[(o, diag)] = (
            s_end, hit_ready, 0 if hit_ready else s_end - s
        )
    return saved


@jax.jit
def _pack_seeds(qs, ss, ok, f_q, f_len, f_score, f_tr,
                n_overflow, n_raw, counts=(0, 0, 0, 0), rr=None):
    """One flat int32[4 * cap + 7] device->host transfer (5 rows when
    the two-hit right-run row rides along).

    Naive row-stacking of every per-seed array is 44 B/lane; over the
    tunnel's ~80 MB/s downlink that fetch dominates dense-seed (blastn
    word 11) batches. 16 B/lane instead: qs, ss, score, and a bitfield
    of ok(1) | trunc-flags(3) | left-ext(12) | length(13). Left
    extension shifts q and s equally, so f_s needs no slot, and the
    Pallas window clamp (WINDOW steps/side) plus the XLA phase-1 clamp
    bound l_ext < 2^12 and length < 2^13; ctx is recomputed on host
    from qs (same searchsorted the device does)."""
    counts = [jnp.asarray(c, jnp.int32) for c in counts]
    l_ext = jnp.clip(qs - f_q, 0, (1 << 12) - 1)
    d = (
        ok.astype(jnp.int32)
        | ((f_tr.astype(jnp.int32) & 7) << 1)
        | (l_ext << 4)
        | (jnp.clip(f_len, 0, (1 << 13) - 1) << 16)
    )
    rows = [qs, ss, f_score, d]
    if rr is not None:
        rows.append(rr)
    return jnp.concatenate(rows + [
        jnp.stack([n_overflow.astype(jnp.int32),
                   n_raw.astype(jnp.int32),
                   counts[0].astype(jnp.int32),   # n_hit
                   counts[1].astype(jnp.int32),   # n_srv
                   counts[2].astype(jnp.int32),   # n_alive
                   counts[3].astype(jnp.int32),   # n_adm (two-hit)
                   jnp.zeros((), jnp.int32)]),    # reserved
    ])


def _unpack_seeds(flat, ctx_off_dev, ctx_cap, rows=4):
    """Host side of ``_pack_seeds``: rebuild the per-seed arrays.

    ``rows`` must match the device pack (5 when the two-hit right-run
    row rides along). ``ctx`` is recomputed with the same
    padded-offsets searchsorted the device program applies
    (ops.seeding.seeding_scan_mini), so the result is bit-identical to
    fetching it."""
    tail = 7
    cap = (len(flat) - tail) // rows
    qs = flat[:cap]
    ss = flat[cap: 2 * cap]
    ug_score = flat[2 * cap: 3 * cap]
    d = flat[3 * cap: 4 * cap]
    fill = (d & 1).astype(bool)
    # bit 1 of the flag word = WINDOW overrun (bits 2/3 are bound-stop
    # info used by the streaming path)
    trunc = (d & 2).astype(bool)
    l_ext = (d >> 4) & 0xFFF
    ug_len = ((d >> 16) & 0x1FFF).astype(np.int32)
    ug_q = (qs - l_ext).astype(np.int32)
    ug_s = (ss - l_ext).astype(np.int32)
    ctx = np.clip(
        np.searchsorted(ctx_off_dev, qs, side="right") - 1,
        0, ctx_cap - 1,
    ).astype(np.int32)
    rr = flat[4 * cap: 5 * cap] if rows == 5 else None
    base = rows * cap
    counts = tuple(int(c) for c in flat[base + 2: base + 6])
    return (qs, ss, fill, ctx, ug_q, ug_s, ug_len, ug_score, trunc,
            flat[base], flat[base + 1], counts, rr)


def _unpack_saved(flat, save_cap):
    """Host side of the device-replay pack (_finish_seeds_jit with
    save_cap > 0): rows [qs | ss | score | bitfield] over the saved
    (compacted, lane-ascending) seeds plus the 9-slot counter tail
    [n_overflow, n_raw, n_hit, n_srv, n_alive, n_adm, n_saved,
    n_fallback, reserved]."""
    qs = flat[:save_cap]
    ss = flat[save_cap: 2 * save_cap]
    score = flat[2 * save_cap: 3 * save_cap]
    d = flat[3 * save_cap: 4 * save_cap]
    tail = flat[4 * save_cap:]
    return qs, ss, score, d, tail


def _finish_saved_hits(
    sq, sss, ssc, sd, n_saved, ctx_off_dev, n_ctx, subject_starts,
) -> InitHits:
    """InitHits straight from the device-replay pack: the gate, the
    replay, and the cutoff test already ran on device, so only the
    context/oid mapping and the final score ordering remain. Saved
    lanes arrive lane-ascending (compact_indices), the same pre-order
    the host replay path feeds sort_by_score_order, so the result is
    bit-identical to _finish_init_hits on the full fetch."""
    qs = np.asarray(sq[:n_saved], np.int32)
    ss = np.asarray(sss[:n_saved], np.int32)
    score = np.asarray(ssc[:n_saved], np.int32)
    d = np.asarray(sd[:n_saved])
    l_ext = ((d >> 4) & 0xFFF).astype(np.int32)
    length = ((d >> 16) & 0x1FFF).astype(np.int32)
    ug_q = qs - l_ext
    ug_s = ss - l_ext
    ctx = np.clip(
        np.searchsorted(ctx_off_dev, qs, side="right") - 1,
        0, n_ctx - 1,
    ).astype(np.int32)
    if len(subject_starts) == 1:
        oid = np.zeros(n_saved, np.int32)
    else:
        oid = (
            np.searchsorted(subject_starts, ss, side="right") - 1
        ).astype(np.int32)
    order = sort_by_score_order(score, ug_s, length, ug_q)
    return InitHits(
        q_off=qs[order],
        s_off=ss[order],
        q_start=ug_q[order],
        s_start=ug_s[order],
        length=length[order],
        score=score[order],
        context=ctx[order],
        oid=oid[order],
    )


def _pallas_alive_only(
    query_p, subject_p, table64, query_nib, subject_w,
    qs, ss, ok, xd, maxl, maxr,
    *, word_size, alive_cap, interpret=False, ext_window=None,
):
    """Phase-0 clamped X-drop for ALL seeds; the window kernel only for
    the (few) seeds still alive at the clamp, scattered back in place.

    Returns (uq, us, ulen, uscore, tr, n_alive) matching the
    full-kernel outputs bit-for-bit (phase-0 exactness is asserted in
    tests/test_seeding.py::TestPhase0); alive seeds beyond alive_cap
    count as capacity overflow in the caller."""
    from gblastn_tpu.ops.pallas_ungapped import (
        ungapped_extend_pallas_prepared,
    )
    from gblastn_tpu.ops.seeding import ungapped_phase0_packed

    uq0, us0, ulen0, usc0, exact0 = ungapped_phase0_packed(
        query_nib, subject_w, table64, qs, ss, ok, xd, maxl, maxr,
        word_size=word_size,
    )
    alive = ok & ~exact0
    aidx, afill, n_alive = compact_indices(alive, alive_cap, 0)
    f_q, f_s, f_len, f_score, f_tr = ungapped_extend_pallas_prepared(
        (query_p, subject_p), table64,
        qs[aidx], ss[aidx], afill, xd[aidx], maxl[aidx], maxr[aidx],
        interpret=interpret, window=ext_window,
    )
    widx = jnp.where(afill, aidx, qs.shape[0])   # OOB pads: dropped
    uq = uq0.at[widx].set(f_q, mode="drop")
    us = us0.at[widx].set(f_s, mode="drop")
    ulen = ulen0.at[widx].set(f_len, mode="drop")
    uscore = usc0.at[widx].set(f_score, mode="drop")
    tr = jnp.zeros(qs.shape[0], jnp.int32).at[widx].set(
        f_tr.astype(jnp.int32), mode="drop"
    )
    return uq, us, ulen, uscore, tr, n_alive


def _dev_replay_pack(
    blob, ctx, query, subject_w, starts_dev,
    qs, ss, ok, xd, f_q, f_len, f_score, f_tr, rr, oid, sub_hi,
    n_overflow, n_raw, n_hit, n_srv, n_alive, n_adm,
    *, word_size, window, diag_mask, save_cap, ctx_cap,
    gate_cap=0,
):
    """Device replay tail of the finisher: the per-diagonal replay
    (two-hit when window > 0, one-hit otherwise), the approx-ungapped
    demotion gate (word >= 11), and the saved-seed compaction into the
    [save_cap] pack.

    The gate and the replay run as a FIXPOINT: per-seed demotion
    verdicts are order-independent (s_NuclUngappedExtend consults only
    the seed's own data), and the replay consults a verdict only for
    seeds that would PASS (hit_ready and exact score above cutoff) --
    which is exactly the replay's saved set. So: replay with exact
    scores, gate only the newly-saved lanes (a few thousand, vs the
    ~hundreds of thousands above the cutoff), substitute demoted
    scores, and re-replay until no saved lane is ungated. Converges in
    one iteration when nothing demotes (the common case).

    Seeds the clamped gate cannot resolve (after a 32x-clamp second
    tier), gate-compaction overflows, replay-tier overflows,
    non-convergence, and window-truncated extensions (the host
    re-extends those BEFORE its replay, so their clamped score may
    misjudge the cutoff test) count into n_fallback: the caller
    re-dispatches the full pack and replays on host."""
    from gblastn_tpu.ops.seeding import (
        approx_gate_device,
        diag_replay_device,
    )

    n = qs.shape[0]
    sc = jnp.clip(ctx, 0, ctx_cap - 1)
    o = 2 + (ctx_cap + 1) + ctx_cap
    cut_tab = jax.lax.slice(blob, (o,), (o + ctx_cap,))
    o += ctx_cap
    red_tab = jax.lax.slice(blob, (o,), (o + ctx_cap,))
    o += ctx_cap
    t256 = jax.lax.slice(blob, (o,), (o + 256,))
    cutoff = cut_tab[sc]
    ug_end = ss - (qs - f_q) + f_len

    def replay(scores):
        return diag_replay_device(
            qs, ss, ok, rr, oid, ug_end, scores, cutoff,
            word_size=word_size, window=window, diag_mask=diag_mask,
        )

    if word_size >= 11:
        # the reference's approximate-first scoring demotes
        # byte-misaligned marginal hits (na_ungapped.c:263)
        q32 = query.astype(jnp.int32)
        qbytes = (
            (q32[:-3] << 6) | (q32[1:-2] << 4)
            | (q32[2:-1] << 2) | q32[3:]
        ) & 0xFF
        red_per = red_tab[sc]
        sub_lo = starts_dev[oid].astype(jnp.int32)

        g_cap = gate_cap or save_cap
        t2_cap = max(g_cap // 16, 64)

        def gate_lanes(mask):
            """Two-tier clamped gate on the compacted mask lanes.
            Returns (demote[n], a_total[n] partial scatters,
            n_unresolved incl. compaction overflow, n_new)."""
            gidx, gfill, n_new = compact_indices(mask, g_cap, 0)
            d1, _q1, _s1, _e1, t1, r1 = approx_gate_device(
                qbytes, subject_w, t256,
                qs[gidx], ss[gidx], gfill, xd[gidx],
                red_per[gidx], sub_lo[gidx], sub_hi[gidx], blob[1],
            )
            # tier 2: the default 48-byte clamp leaves ~1 per ~20k
            # unresolved (meandering walks that neither drop nor
            # reach the reduced cutoff); re-walk those with 32x clamp
            unres1 = gfill & ~r1
            u_idx, u_fill, n_u = compact_indices(unres1, t2_cap, 0)
            g2 = gidx[u_idx]
            d2, _q2, _s2, _e2, t2, r2 = approx_gate_device(
                qbytes, subject_w, t256,
                qs[g2], ss[g2], u_fill, xd[g2],
                red_per[g2], sub_lo[g2], sub_hi[g2], blob[1],
                clamp_bytes=1536,
            )
            wg = jnp.where(gfill, gidx, n)
            demote_p = jnp.zeros(n, bool).at[wg].set(
                d1 & gfill, mode="drop"
            )
            a_tot_p = jnp.zeros(n, jnp.int32).at[wg].set(
                t1, mode="drop"
            )
            w2 = jnp.where(u_fill, g2, n)
            demote_p = demote_p.at[w2].set(d2 & u_fill, mode="drop")
            a_tot_p = a_tot_p.at[w2].set(t2, mode="drop")
            n_un = (
                (u_fill & ~r2).sum()
                + (n_u > t2_cap)
                + (n_new > g_cap)
            ).astype(jnp.int32)
            return demote_p, a_tot_p, n_un, n_new

        saved0, rep_ovf0 = replay(f_score)

        def fix_cond(st):
            it, _sc_, _g, _d, to_gate, _sv, _ov, _un, _gn = st
            return (it < 6) & to_gate.any()

        def fix_body(st):
            (it, scores, gated, demoted, to_gate, saved_i, ovf,
             n_un, g_need) = st
            demote_p, a_tot_p, n_un_i, n_new = gate_lanes(to_gate)
            gated = gated | to_gate
            demoted = demoted | demote_p
            scores = jnp.where(demote_p, a_tot_p, scores)
            # a demotion changes the replay's per-diagonal path; only
            # then re-replay (the common no-demotion case exits here)
            saved_i, ovf = jax.lax.cond(
                demote_p.any(),
                lambda: replay(scores),
                lambda: (saved_i, ovf),
            )
            return (it + 1, scores, gated, demoted,
                    saved_i & ~gated, saved_i, ovf, n_un + n_un_i,
                    jnp.maximum(g_need, n_new))

        init = (
            jnp.zeros((), jnp.int32),
            f_score,
            jnp.zeros(n, bool),
            jnp.zeros(n, bool),
            saved0,
            saved0,
            rep_ovf0,
            jnp.zeros((), jnp.int32),
            jnp.zeros((), jnp.int32),
        )
        (fix_it, _scores, _gated, _demoted, to_gate, saved,
         n_rep_ovf, n_unres, n_gate_need) = jax.lax.while_loop(
            fix_cond, fix_body, init
        )
        # non-convergence within the iteration cap -> host fallback
        n_unres = n_unres + to_gate.any().astype(jnp.int32)
    else:
        saved, n_rep_ovf = replay(f_score)
        n_unres = jnp.zeros((), jnp.int32)
        n_gate_need = jnp.zeros((), jnp.int32)

    n_trunc = (ok & ((f_tr & 1) != 0)).sum().astype(jnp.int32)
    n_fallback = n_unres + n_rep_ovf + n_trunc
    sidx, sfill, n_saved = compact_indices(saved, save_cap, 0)
    l_ext_s = jnp.clip(qs[sidx] - f_q[sidx], 0, (1 << 12) - 1)
    d = (
        sfill.astype(jnp.int32)
        | ((f_tr[sidx] & 7) << 1)
        | (l_ext_s << 4)
        | (jnp.clip(f_len[sidx], 0, (1 << 13) - 1) << 16)
    )
    return jnp.concatenate([
        qs[sidx], ss[sidx], f_score[sidx], d,
        jnp.stack([
            n_overflow.astype(jnp.int32),
            n_raw.astype(jnp.int32),
            n_hit.astype(jnp.int32),
            n_srv.astype(jnp.int32),
            n_alive.astype(jnp.int32),
            n_adm.astype(jnp.int32),
            n_saved.astype(jnp.int32),
            n_fallback,
            n_gate_need.astype(jnp.int32),
        ]),
    ])


@functools.partial(
    jax.jit,
    static_argnames=(
        "word_size", "alive_cap", "interpret", "window", "diag_mask",
        "adm_cap", "save_cap", "ctx_cap", "rr_zero", "gate_cap",
        "ext_window",
    ),
)
def _finish_seeds_jit(
    query, subject_p, table64, query_nib, subject_w,
    starts_dev, ends_dev,
    qs, ss, ok, xd, maxl, maxr, n_overflow, n_raw, n_hit, n_srv,
    ctx=None, blob=None,
    *, word_size, alive_cap, interpret=False,
    window=0, diag_mask=0, adm_cap=0, save_cap=0, ctx_cap=0,
    rr_zero=False, gate_cap=0, ext_window=None,
):
    """Everything after the scan program as ONE jitted dispatch:
    query window-prep, phase-0 clamped X-drop, alive compaction, the
    Pallas window kernel, in-place scatter, and the packed D2H form.

    Keeping this glue eager costs ~15 separate device dispatches; over
    the axon tunnel each one pays ~27 ms, dominating the whole batch
    (round-2 VERDICT weak item 1). The scan program stays its own
    dispatch -- fusing the window kernel with the scan makes XLA
    schedule the kernel ~3x slower (see _seeding_tpu_fused).

    With ``window > 0`` (two-hit searches, adm_cap > 0): the device
    computes each seed's right run and the two-hit admission SUPERSET
    (ops.seeding.two_hit_admission) and extends ONLY admitted seeds --
    the reference extends only paired hits (na_ungapped.c:612), and on
    dense-seed blastn batches this cuts the extension work ~25x. The
    right-run row rides the packed fetch for the host replay.

    With ``save_cap > 0`` additionally: the approx-ungapped demotion
    gate and the two-hit per-diagonal replay themselves run ON DEVICE
    (ops.seeding.approx_gate_device / diag_replay_device, both
    fuzz-pinned bit-exact to the host twins) and only the SAVED seeds
    ship to the host -- a [save_cap]-lane pack instead of the full
    [seed_cap] 5-row fetch that dominates dense-seed batches over the
    tunnel. Seeds the clamped gate cannot resolve, replay-tier
    overflows, and window-truncated extensions all count into the
    pack's n_fallback: the caller re-dispatches the full pack and runs
    the host replay (rare; zero on clean workloads)."""
    from gblastn_tpu.ops.pallas_ungapped import (
        prepare_query,
        ungapped_extend_pallas_prepared,
    )
    from gblastn_tpu.ops.seeding import (
        right_run_packed,
        two_hit_admission,
    )

    query_p = prepare_query(query)
    n_alive = jnp.zeros((), jnp.int32)
    n_adm = jnp.zeros((), jnp.int32)
    rr = None
    if window > 0 and adm_cap and query_nib is not None:
        n = qs.shape[0]
        oid = jnp.clip(
            jnp.searchsorted(starts_dev, ss, side="right") - 1,
            0, starts_dev.shape[0] - 1,
        ).astype(jnp.int32)
        sub_hi = ends_dev[oid].astype(jnp.int32)
        if rr_zero:
            # lut width == word size: no double-word probe, runs are
            # zero by definition (s_TypeOfWord, na_ungapped.c:512)
            rr = jnp.zeros(n, jnp.int32)
        else:
            rr = right_run_packed(
                query_nib, subject_w, qs, ss, ok, sub_hi,
                word_size=word_size,
            )
        admit = two_hit_admission(
            qs, ss, ok, rr, oid,
            word_size=word_size, window=window, diag_mask=diag_mask,
        )
        n_adm = admit.sum()
        aidx, afill, _na = compact_indices(admit, adm_cap, 0)
        (c_q, _c_s, c_len, c_score, c_tr, n_alive) = _pallas_alive_only(
            query_p, subject_p, table64, query_nib, subject_w,
            qs[aidx], ss[aidx], afill, xd[aidx], maxl[aidx], maxr[aidx],
            word_size=word_size, alive_cap=alive_cap,
            interpret=interpret, ext_window=ext_window,
        )
        widx = jnp.where(afill, aidx, n)     # OOB pads: dropped
        f_q = qs.at[widx].set(c_q, mode="drop")      # zeros elsewhere?
        f_q = jnp.where(admit, f_q, qs)
        f_len = jnp.zeros(n, jnp.int32).at[widx].set(c_len, mode="drop")
        f_score = jnp.zeros(n, jnp.int32).at[widx].set(
            c_score, mode="drop"
        )
        f_tr = jnp.zeros(n, jnp.int32).at[widx].set(
            c_tr.astype(jnp.int32), mode="drop"
        )
        n_overflow = (
            n_overflow
            + jnp.maximum(n_adm - adm_cap, 0)
            + jnp.maximum(n_alive - alive_cap, 0)
        )
        if save_cap:
            return _dev_replay_pack(
                blob, ctx, query, subject_w, starts_dev,
                qs, ss, ok, xd, f_q, f_len, f_score, f_tr, rr,
                oid, sub_hi,
                n_overflow, n_raw, n_hit, n_srv, n_alive, n_adm,
                word_size=word_size, window=window,
                diag_mask=diag_mask, save_cap=save_cap,
                ctx_cap=ctx_cap, gate_cap=gate_cap,
            )
    elif alive_cap and query_nib is not None:
        (f_q, _f_s, f_len, f_score, f_tr, n_alive) = _pallas_alive_only(
            query_p, subject_p, table64, query_nib, subject_w,
            qs, ss, ok, xd, maxl, maxr,
            word_size=word_size, alive_cap=alive_cap,
            interpret=interpret, ext_window=ext_window,
        )
        n_overflow = n_overflow + jnp.maximum(n_alive - alive_cap, 0)
        if save_cap:
            # one-hit device replay (window == 0): no admission stage,
            # every seed was extended; gate + replay + compaction
            n = qs.shape[0]
            oid = jnp.clip(
                jnp.searchsorted(starts_dev, ss, side="right") - 1,
                0, starts_dev.shape[0] - 1,
            ).astype(jnp.int32)
            return _dev_replay_pack(
                blob, ctx, query, subject_w, starts_dev,
                qs, ss, ok, xd, f_q, f_len, f_score, f_tr,
                jnp.zeros(n, jnp.int32), oid,
                ends_dev[oid].astype(jnp.int32),
                n_overflow, n_raw, n_hit, n_srv, n_alive,
                jnp.zeros((), jnp.int32),
                word_size=word_size, window=0,
                diag_mask=diag_mask, save_cap=save_cap,
                ctx_cap=ctx_cap, gate_cap=gate_cap,
            )
    else:
        f_q, _f_s, f_len, f_score, f_tr = ungapped_extend_pallas_prepared(
            (query_p, subject_p), table64,
            qs, ss, ok, xd, maxl, maxr, interpret=interpret,
            window=ext_window,
        )
    return _pack_seeds(qs, ss, ok, f_q, f_len, f_score, f_tr,
                       n_overflow, n_raw, (n_hit, n_srv, n_alive, n_adm),
                       rr=rr)


def allowed_bits(positions: np.ndarray, qcap: int) -> np.ndarray:
    """Bit-pack the LUT's indexed query offsets into int32[qcap/32]
    (bit i of word w = offset 32w + i): 1 bit/position instead of the
    4-byte CSR entry, 32x fewer upload bytes.  The device rebuilds the
    full CSR (positions sorted by word code + offsets table) from this
    mask with one stable sort (_scan_blob_jit)."""
    b = np.zeros(qcap, bool)
    b[np.asarray(positions, np.int64)] = True
    bits = np.packbits(b, bitorder="little").view(np.uint32)
    if not np.little_endian:  # pragma: no cover
        bits = bits.byteswap()
    return bits.view(np.int32)


def _build_batch_blob(ctx_off, xdrop, abits, n_pos, qbuf,
                      cutoffs=None, reduced=None, concat_end=0,
                      table256=None) -> np.ndarray:
    """Concatenate the per-batch device inputs into ONE int32 upload:
    [n_pos, concat_end | ctx_off | xdrop | cutoffs | reduced |
    table256 | allowed-bits | query nibbles]. BLASTNA codes are 4-bit,
    so the query packs two per byte (eight per int32, nibble t of word
    k = code 8k+t); the CSR itself is not shipped at all -- the device
    re-derives word codes from the query and rebuilds the positions/
    offsets arrays from the 1-bit/position allowed mask
    (_scan_blob_jit). After the first device->host fetch the tunnel's
    uploads run at ~30ms + ~20ms/MB, so bytes matter: this layout is
    ~0.6 MB/batch where shipping the CSR positions was ~4 MB.

    cutoffs/reduced (per-context word + reduced-nucl cutoffs) and
    table256 (the packed XOR score table) feed the device two-hit
    replay + approx gate (_finish_seeds_jit save_cap > 0); they ride
    every blob (~1.5 KB) to keep one layout."""
    assert len(qbuf) % 32 == 0
    ctx_cap = len(xdrop)
    cut = (np.zeros(ctx_cap, np.int32) if cutoffs is None
           else np.ascontiguousarray(cutoffs, np.int32))
    red = (np.zeros(ctx_cap, np.int32) if reduced is None
           else np.ascontiguousarray(reduced, np.int32))
    t256 = (np.zeros(256, np.int32) if table256 is None
            else np.ascontiguousarray(table256, np.int32))
    q4 = (qbuf[0::2] | (qbuf[1::2] << 4)).astype(np.uint8)
    qw = q4.view(np.int32)
    if not np.little_endian:  # pragma: no cover
        qw = qw.byteswap()
    return np.concatenate([
        np.array([n_pos, concat_end], np.int32),
        np.ascontiguousarray(ctx_off, np.int32),
        np.ascontiguousarray(xdrop, np.int32),
        cut, red, t256,
        np.ascontiguousarray(abits, np.int32),
        qw,
        # one dedicated scratch word: the slope profiler's cache-busting
        # tag writes blob[-1]; without this, an exactly-qcap query would
        # have its last 8 bases corrupted during profiling runs
        np.zeros(1, np.int32),
    ])


@functools.partial(
    jax.jit,
    static_argnames=(
        "qcap", "ctx_cap", "pcap", "table_size", "packed_mini",
        "scan_step", "lut_word", "word_size", "cmax", "n_scan",
        "hit_cap", "seed_cap", "out_cap", "disc_offsets",
    ),
)
def _scan_blob_jit(
    blob, subject2, subject_valid, subject_w,
    starts_dev, ends_dev, mask_starts, mask_ends,
    *, qcap, ctx_cap, pcap, table_size, packed_mini,
    scan_step, lut_word, word_size, cmax, n_scan,
    hit_cap, seed_cap, out_cap, disc_offsets,
):
    """Scan+mini as one dispatch fed by the single batch blob: unpack
    the 4-bit query, rebuild the FULL CSR on device from the allowed-
    bits mask (word codes via rolling compute over the query, positions
    via one stable sort by word code -- identical to the host builder's
    counting sort, which also keeps positions ascending within a
    word), pack the query nibbles, and run seeding_scan_mini -- all
    previously separate dispatches/uploads, each costing a tunnel round
    trip. Returns the scan outputs plus the device-resident
    query/query_nib for the finisher jit."""
    from gblastn_tpu.ops.seeding import (
        pack_query_nibbles,
        seeding_scan_mini,
    )

    o = 2
    ctx_off = jax.lax.slice(blob, (o,), (o + ctx_cap + 1,))
    o += ctx_cap + 1
    xdrop = jax.lax.slice(blob, (o,), (o + ctx_cap,))
    # advance past xdrop and skip cutoffs/reduced/table256 (finisher)
    o += 3 * ctx_cap + 256
    abits = jax.lax.slice(blob, (o,), (o + pcap,))
    o += pcap
    qw = jax.lax.slice(blob, (o,), (o + qcap // 8,))
    sh = jnp.arange(8, dtype=jnp.int32) * 4
    query = (
        ((qw[:, None] >> sh[None, :]) & 15)
        .astype(jnp.uint8).reshape(-1)
    )
    # word code at every query offset, same bit layout as the scan's
    # (ops.seeding.scan_block code_offs); allowed offsets hold only
    # base codes < 4, so the &3 clamp never fires on real slots.
    if disc_offsets is not None:
        code_offs = list(enumerate(disc_offsets))
        span = disc_offsets[-1] + 1
        w_eff = len(disc_offsets)
    else:
        code_offs = [(j, j) for j in range(lut_word)]
        span = lut_word
        w_eff = lut_word
    npos_full = qcap - span + 1
    word_full = jnp.zeros(npos_full, jnp.int32)
    for r, j in code_offs:
        word_full = word_full + (
            (query[j: j + npos_full].astype(jnp.int32) & 3)
            << (2 * (w_eff - 1 - r))
        )
    # expand the bit mask gather-free (bit i of word w = offset 32w+i)
    allowed = (
        ((abits[:, None] >> jnp.arange(32, dtype=jnp.int32)[None, :])
         & 1).astype(bool).reshape(-1)[:npos_full]
    )
    key = jnp.where(allowed, word_full, table_size)
    # stable sort by word code: positions ascending within each word,
    # bit-identical to the host counting-sort CSR; non-allowed slots
    # (key = table_size) sort past every real chain and are never
    # indexed (their counts are dropped below)
    _w_s, pos = jax.lax.sort(
        (key, jax.lax.broadcasted_iota(jnp.int32, (npos_full,), 0)),
        num_keys=1, is_stable=True,
    )
    counts = jnp.zeros(table_size, jnp.int32).at[key].add(1, mode="drop")
    offsets = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)]
    )
    query_nib = pack_query_nibbles(query) if packed_mini else None
    out = seeding_scan_mini(
        subject2, subject_valid, offsets, pos, query,
        ctx_off, xdrop, starts_dev, ends_dev,
        mask_starts=mask_starts, mask_ends=mask_ends,
        query_nib=query_nib, subject_w=subject_w,
        scan_step=scan_step, lut_word=lut_word, word_size=word_size,
        cmax=cmax, n_scan=n_scan, hit_cap=hit_cap, seed_cap=seed_cap,
        out_cap=out_cap, pos_base_static=0, disc_offsets=disc_offsets,
    )
    return out + (query, query_nib)


@jax.jit
def _derive_material_jit(packed, starts, ends):
    """Materialized subject arrays from the packed-only residency form
    (for the non-fused debug split and phase-2 escalations)."""
    from gblastn_tpu.ops.pallas_ungapped import prepare_subject
    from gblastn_tpu.ops.seeding import subject_arrays_from_packed

    subject2, valid, subject_w = subject_arrays_from_packed(
        packed, starts, ends
    )
    return subject2, valid, subject_w, prepare_subject(subject2)


@functools.partial(
    jax.jit,
    static_argnames=(
        "qcap", "ctx_cap", "pcap", "table_size", "packed_mini",
        "scan_step", "lut_word", "word_size", "cmax", "n_scan",
        "hit_cap", "seed_cap", "disc_offsets",
        "alive_cap", "interpret", "window", "diag_mask", "adm_cap",
        "save_cap", "rr_zero", "gate_cap", "ext_window",
    ),
)
def _scan_finish_one_jit(
    blob, packed, subject2, subject_valid, subject_w, subject_p,
    table64, starts_dev, ends_dev, mask_starts, mask_ends,
    *, qcap, ctx_cap, pcap, table_size, packed_mini,
    scan_step, lut_word, word_size, cmax, n_scan, hit_cap, seed_cap,
    disc_offsets, alive_cap, interpret, window, diag_mask, adm_cap,
    save_cap, rr_zero, gate_cap=0, ext_window=None,
):
    """The whole seeding chain (scan + finisher) as ONE dispatch.

    Over the axon tunnel each dispatch pays a large flat cost (~30-90
    ms measured), so folding the two programs into one jit beats any
    scheduling loss from compiling the Pallas window kernel inside the
    bigger program. GBLASTN_TPU_ONE_DISPATCH=0 restores the
    two-dispatch split (also used for the rare device-replay
    fallback, which re-runs this program with save_cap=0).

    With ``packed`` set (packed-only residency), the int8 codes,
    validity mask, packed words, and Pallas guard-padded subject are
    derived here as program-local temps from the 2-bit buffer."""
    if packed is not None:
        from gblastn_tpu.ops.pallas_ungapped import prepare_subject
        from gblastn_tpu.ops.seeding import subject_arrays_from_packed

        subject2, subject_valid, subject_w = subject_arrays_from_packed(
            packed, starts_dev, ends_dev
        )
        subject_p = prepare_subject(subject2)
    out = _scan_blob_jit(
        blob, subject2, subject_valid, subject_w,
        starts_dev, ends_dev, mask_starts, mask_ends,
        qcap=qcap, ctx_cap=ctx_cap, pcap=pcap, table_size=table_size,
        packed_mini=packed_mini,
        scan_step=scan_step, lut_word=lut_word, word_size=word_size,
        cmax=cmax, n_scan=n_scan, hit_cap=hit_cap, seed_cap=seed_cap,
        out_cap=seed_cap // 2, disc_offsets=disc_offsets,
    )
    (qs, ss, ok, ctx, xd, maxl, maxr, n_overflow, n_raw,
     n_hit, n_srv, query, query_nib) = out
    return _finish_seeds_jit(
        query, subject_p, table64, query_nib, subject_w,
        starts_dev, ends_dev,
        qs, ss, ok, xd, maxl, maxr, n_overflow, n_raw, n_hit, n_srv,
        ctx=(ctx if save_cap else None),
        blob=(blob if save_cap else None),
        save_cap=save_cap, ctx_cap=(ctx_cap if save_cap else 0),
        word_size=word_size, alive_cap=alive_cap, interpret=interpret,
        window=window, diag_mask=diag_mask, adm_cap=adm_cap,
        rr_zero=rr_zero, gate_cap=gate_cap, ext_window=ext_window,
    )


def _seeding_tpu_blob(
    blob_dev, subject2, subject_valid, subject_w, subject_p, table64,
    starts_dev, ends_dev, mask_starts, mask_ends,
    *, qcap, ctx_cap, pcap, table_size, packed_mini,
    scan_step, lut_word, word_size, cmax, n_scan,
    hit_cap, seed_cap, alive_cap, disc_offsets, interpret=False,
    sync=True, window=0, diag_mask=0, adm_cap=0, save_cap=0,
    rr_zero=False, packed_dev=None, gate_cap=0, ext_window=None,
):
    """Blob-fed TPU seeding: ONE upload + ONE dispatch + ONE fetch
    (GBLASTN_TPU_ONE_DISPATCH=0: two dispatches, scan | finisher).
    ``sync=False`` skips the completion wait (async pipelining).

    With ``save_cap > 0`` the fetch is the [save_cap] device-replay
    pack; the second returned element is a refetch closure producing
    the FULL pack for the rare device-replay fallback."""
    import os as _os

    stage_sync = _os.environ.get("GBLASTN_TPU_STAGE_SYNC")
    # the one-dispatch fusion only pays off against per-dispatch
    # tunnel overhead (TPU); the CPU interpret-mode leg keeps the
    # two-dispatch split (giant single XLA:CPU programs with the
    # inlined interpret-mode window kernel have been unstable)
    one = (
        _os.environ.get("GBLASTN_TPU_ONE_DISPATCH", "1") != "0"
        and not interpret
    )
    if stage_sync:
        with slog.time("device.seeding.blob_sync"):
            jax.block_until_ready(blob_dev)
    alive_eff = alive_cap if packed_mini else 0
    static_kw = dict(
        qcap=qcap, ctx_cap=ctx_cap, pcap=pcap, table_size=table_size,
        packed_mini=packed_mini,
        scan_step=scan_step, lut_word=lut_word, word_size=word_size,
        cmax=cmax, n_scan=n_scan, hit_cap=hit_cap, seed_cap=seed_cap,
        disc_offsets=disc_offsets,
        alive_cap=alive_eff, interpret=interpret, window=window,
        diag_mask=diag_mask, adm_cap=adm_cap, rr_zero=rr_zero,
        gate_cap=gate_cap, ext_window=ext_window,
    )
    if packed_dev is not None and not one:
        # the two-dispatch debug split needs materialized subject
        # arrays; derive them once (this path is not the production
        # route, so the extra dispatch is acceptable)
        subject2, subject_valid, subject_w, subject_p = (
            _derive_material_jit(packed_dev, starts_dev, ends_dev)
        )
    ops = (blob_dev,
           packed_dev if one else None,
           subject2, subject_valid, subject_w, subject_p,
           table64, starts_dev, ends_dev, mask_starts, mask_ends)
    if one:
        packed = _scan_finish_one_jit(*ops, save_cap=save_cap,
                                      **static_kw)
        if stage_sync == "slope":
            # true device time of the fused dispatch via chain slope:
            # K enqueued calls cost ~RTT + K * device over the tunnel.
            # Each call perturbs the blob's last word (query-nibble pad
            # region -- semantically inert) to defeat the tunnel's
            # identical-buffer result cache.
            import sys as _sys
            import time as _time

            def run_k(kk, tag):
                outs = [
                    _scan_finish_one_jit(
                        blob_dev.at[-1].set(tag * 100 + i), *ops[1:],
                        save_cap=save_cap, **static_kw,
                    )
                    for i in range(kk)
                ]
                jax.block_until_ready(outs)

            run_k(1, 9)   # warm compile identical (same shapes)
            t2 = t6 = float("inf")
            for r in range(2):
                t0 = _time.perf_counter()
                run_k(2, 10 + r)
                t2 = min(t2, _time.perf_counter() - t0)
                t0 = _time.perf_counter()
                run_k(6, 20 + r)
                t6 = min(t6, _time.perf_counter() - t0)
            dev_ms = (t6 - t2) / 4 * 1e3
            print(
                f"# fused seeding dispatch: device {dev_ms:.1f} ms, "
                f"wall(K=2) {t2 * 1e3:.1f} ms -> flat overhead "
                f"{max(t2 * 1e3 - 2 * dev_ms, 0):.1f} ms",
                file=_sys.stderr,
            )

        def refetch():
            # device-replay fallback: full pack, host replay; re-runs
            # the scan (its outputs were fused intermediates)
            return _scan_finish_one_jit(*ops, save_cap=0, **static_kw)
    else:
        out = _scan_blob_jit(
            blob_dev, subject2, subject_valid, subject_w,
            starts_dev, ends_dev, mask_starts, mask_ends,
            qcap=qcap, ctx_cap=ctx_cap, pcap=pcap,
            table_size=table_size, packed_mini=packed_mini,
            scan_step=scan_step, lut_word=lut_word,
            word_size=word_size,
            cmax=cmax, n_scan=n_scan, hit_cap=hit_cap,
            seed_cap=seed_cap,
            out_cap=seed_cap // 2, disc_offsets=disc_offsets,
        )
        if stage_sync:
            with slog.time("device.seeding.scan_sync"):
                jax.block_until_ready(out)
        (qs, ss, ok, ctx, xd, maxl, maxr, n_overflow, n_raw,
         n_hit, n_srv, query, query_nib) = out
        finish_args = (
            query, subject_p, table64, query_nib, subject_w,
            starts_dev, ends_dev,
            qs, ss, ok, xd, maxl, maxr, n_overflow, n_raw, n_hit,
            n_srv,
        )
        finish_kw = dict(
            word_size=word_size,
            alive_cap=(alive_cap if query_nib is not None else 0),
            interpret=interpret,
            window=window, diag_mask=diag_mask, adm_cap=adm_cap,
            rr_zero=rr_zero, gate_cap=gate_cap, ext_window=ext_window,
        )
        packed = _finish_seeds_jit(
            *finish_args,
            ctx=(ctx if save_cap else None),
            blob=(blob_dev if save_cap else None),
            save_cap=save_cap, ctx_cap=(ctx_cap if save_cap else 0),
            **finish_kw,
        )

        def refetch():
            return _finish_seeds_jit(*finish_args, **finish_kw)
    if stage_sync:
        with slog.time("device.seeding.finish_sync"):
            jax.block_until_ready(packed)
    if sync:
        with slog.time("device.seeding.pack_sync"):
            jax.block_until_ready(packed)
    if save_cap:
        return packed, refetch
    return packed


def _seeding_tpu_fused(
    subject2, subject_valid, lut_offsets, lut_positions, query,
    ctx_offsets, x_dropoffs, subject_starts, subject_ends,
    subject_p, table64,
    *, scan_step, lut_word, word_size, cmax, n_scan, hit_cap, seed_cap,
    mask_starts=None, mask_ends=None, query_nib=None, subject_w=None,
    alive_cap=0, q_allowed=None, disc_offsets=None,
):
    """TPU seeding stage: exactly TWO device dispatches -- the scan+mini
    program, then one fused finisher jit (_finish_seeds_jit: query prep,
    phase-0, alive compaction, Pallas window kernel, pack) -- and ONE
    device fetch. Fusing the window kernel INTO the scan program makes
    XLA schedule it ~3x slower, so they stay separate dispatches; but
    every other op rides inside a jit because over the axon tunnel each
    separate dispatch pays a ~27ms round trip."""
    from gblastn_tpu.ops.seeding import seeding_scan_mini

    import os

    sync = os.environ.get("GBLASTN_TPU_STAGE_SYNC")

    (qs, ss, ok, ctx, xd, maxl, maxr, n_overflow, n_raw,
     n_hit, n_srv) = seeding_scan_mini(
        subject2, subject_valid, lut_offsets, lut_positions, query,
        ctx_offsets, x_dropoffs, subject_starts, subject_ends,
        mask_starts=mask_starts, mask_ends=mask_ends,
        query_nib=query_nib, subject_w=subject_w, q_allowed=q_allowed,
        scan_step=scan_step, lut_word=lut_word, word_size=word_size,
        cmax=cmax, n_scan=n_scan, hit_cap=hit_cap, seed_cap=seed_cap,
        out_cap=seed_cap // 2, pos_base_static=0,
        disc_offsets=disc_offsets,
    )
    if sync:
        with slog.time("device.seeding.scan_sync"):
            jax.block_until_ready((qs, ss, ok, ctx, xd, maxl, maxr))
    from gblastn_tpu.ops.pallas_ungapped import WINDOW

    assert 2 * WINDOW < (1 << 13)   # _pack_seeds bitfield bounds
    packed = _finish_seeds_jit(
        query, subject_p, table64, query_nib, subject_w,
        jnp.asarray(subject_starts), jnp.asarray(subject_ends),
        qs, ss, ok, xd, maxl, maxr, n_overflow, n_raw, n_hit, n_srv,
        word_size=word_size,
        alive_cap=(alive_cap if query_nib is not None else 0),
    )
    # the caller fetches `packed` immediately, so blocking here costs
    # nothing -- and fetching a ready buffer avoids the tunnel's
    # (much) slower transfer-of-pending-computation path
    with slog.time("device.seeding.pack_sync"):
        jax.block_until_ready(packed)
    return packed


def run_seeding(dev: SeedingDeviceData, **kw) -> InitHits:
    """Full seeding pass; drives run_seeding_steps to completion."""
    gen = run_seeding_steps(dev, **kw)
    try:
        while True:
            next(gen)
    except StopIteration as e:
        return e.value


def run_seeding_steps(
    dev: SeedingDeviceData,
    *,
    word_size: int,
    lut_word: int,
    scan_step: int,
    subject_starts: np.ndarray,     # int64[num_subjects] base starts
    subject_lengths: np.ndarray | None = None,  # int64[num_subjects]
    context_offsets: np.ndarray,    # int32[n_ctx+1]
    word_cutoffs: np.ndarray,       # int32[n_ctx] per-context word cutoff
    x_dropoffs: np.ndarray,         # int32[n_ctx] per-context raw X-drop
    cmax: int = 8,
    max_cmax: int = 4096,
    hit_cap: int = 16384,
    seed_cap: int = 16384,
    window_size: int = 0,
    scan_range: int = 0,
    mask_starts: np.ndarray | None = None,  # int32[M] sorted, padded
    mask_ends: np.ndarray | None = None,    # (db soft-mask intervals)
    disc_offsets: tuple[int, ...] | None = None,  # disc-mb template
    approx_ctx: dict | None = None,
    _raw: bool = False,   # return pre-replay hit arrays (two templates)
) -> InitHits:
    """Full seeding pass over one subject buffer; returns saved init hits.

    Runs the fused device pipeline (ops.seeding.seeding_pipeline): one
    XLA program for scan + mini-extension + on-device seed compaction +
    ungapped extension, one device->host transfer of [seed_cap] arrays.
    Capacity overflows (hit_cap / cmax / seed_cap) trigger doubling
    retries; compiled variants are bounded by the power-of-two buckets.
    """
    s_pad = (
        int(dev.packed_dev.shape[0]) * 4 if dev.packed_dev is not None
        else int(dev.subject2.shape[0])
    )
    indexed = dev.q_allowed is not None
    span = disc_offsets[-1] + 1 if disc_offsets else lut_word
    if indexed:
        # indexed megablast: the scan walks the query, not the subject
        n_scan = max(int(dev.query.shape[0]) - lut_word + 1, 1)
    else:
        n_scan = max((s_pad - span) // scan_step + 1, 1)

    # start from the last capacities that worked for this problem
    # shape: capacity overflows would otherwise re-run the doubling
    # retries on EVERY search (2-3 wasted device passes per batch)
    import os as _os

    phase0 = _os.environ.get("GBLASTN_TPU_PHASE0", "1") != "0"
    alive_cap = max(seed_cap // 8, 4096)
    qlen_cap = (
        int(dev.query.shape[0]) if dev.query is not None
        else len(dev.host_qbuf)
    )
    cap_key = (s_pad, qlen_cap, word_size, indexed)
    if _os.environ.get("GBLASTN_TPU_FORCE_SMALL_CAPS"):
        # bench smoke knob: start with deliberately undersized
        # capacities so the overflow-retry path executes FOR REAL on
        # hardware (round-3 VERDICT item 8); the retries must converge
        # to byte-identical output
        hit_cap, seed_cap, alive_cap = 2048, 2048, 1024
        cap_key = (cap_key, "forced-small")
    cached = _CAP_CACHE.get(cap_key)
    if cached:
        hit_cap = max(hit_cap, cached[0])
        seed_cap = max(seed_cap, cached[1])
        if len(cached) > 2:
            alive_cap = max(alive_cap, cached[2])

    # pad per-context arrays to a bucketed size for shape stability
    n_ctx = len(word_cutoffs)
    ctx_cap = 64
    while ctx_cap < n_ctx:
        ctx_cap *= 2
    ctx_off_dev = np.full(ctx_cap + 1, np.iinfo(np.int32).max, np.int32)
    ctx_off_dev[: n_ctx + 1] = context_offsets[: n_ctx + 1]
    xdrop_dev = np.ones(ctx_cap, np.int32)
    xdrop_dev[:n_ctx] = x_dropoffs

    # On TPU, the Pallas window kernel IS the ungapped stage: the
    # scan+mini program chains into it on device (no host round trip,
    # no clamped XLA phase-1). Elsewhere, the fused XLA pipeline runs.
    _plat_arr = (
        dev.packed_dev if dev.packed_dev is not None else dev.subject2
    )
    pallas_primary = (
        (dev.pallas_subject is not None or dev.packed_dev is not None)
        and next(iter(_plat_arr.devices())).platform == "tpu"
        # debug/parity knob: force the fused XLA pipeline on TPU (the
        # bench parity smoke diffs both paths on real hardware)
        and not _os.environ.get("GBLASTN_TPU_FORCE_XLA")
    )
    if subject_lengths is not None:
        subject_ends = subject_starts + subject_lengths
    else:
        subject_ends = np.concatenate(
            [subject_starts[1:], [s_pad]]
        )

    mask_dev = (None, None)
    if mask_starts is not None and len(mask_starts):
        mask_dev = (jnp.asarray(mask_starts), jnp.asarray(mask_ends))

    # single-blob upload route: all per-batch arrays in one transfer
    # (see _build_batch_blob); per-DB constants come pre-uploaded.
    # GBLASTN_TPU_FORCE_BLOB=1 forces it off-TPU (Pallas interpret
    # mode) so the CPU suite covers the production TPU path.
    blob_ok = (
        not indexed
        and dev.host_qbuf is not None
        and dev.lut_pos_host is not None
        and dev.subject_starts_dev is not None
    )
    use_blob = blob_ok and (
        pallas_primary or _os.environ.get("GBLASTN_TPU_FORCE_BLOB") == "1"
    )
    blob_interpret = use_blob and not pallas_primary
    if dev.packed_dev is not None and not use_blob:
        # packed-only residency, but a non-blob leg (FORCE_XLA parity,
        # indexed, CPU pipeline): materialize the subject arrays once
        # and cache them on the dataclass for this search
        if dev.subject2 is None:
            (dev.subject2, dev.subject_valid, dev.subject_w,
             dev.pallas_subject) = _derive_material_jit(
                dev.packed_dev, dev.subject_starts_dev,
                dev.subject_ends_dev,
            )
    blob_dev = None
    if use_blob:
        cut_dev = np.full(ctx_cap, 1 << 30, np.int32)
        cut_dev[:n_ctx] = word_cutoffs
        red_dev = np.full(ctx_cap, 1 << 30, np.int32)
        t256 = None
        cend = 0
        if approx_ctx is not None:
            red_dev[:n_ctx] = np.clip(
                approx_ctx["reduced"], 0, (1 << 30)
            ).astype(np.int32)
            t256 = approx_ctx["table"]
            cend = int(approx_ctx["concat_end"])
        with slog.time("device.seeding.blob_upload"):
            blob_dev = jnp.asarray(_build_batch_blob(
                ctx_off_dev, xdrop_dev, dev.lut_pos_host,
                dev.lut_n_pos, dev.host_qbuf,
                cutoffs=cut_dev, reduced=red_dev, concat_end=cend,
                table256=t256,
            ))

    # device two-hit admission (window_size > 0, default scan_range 0):
    # the finisher extends only the admission superset and ships the
    # right-run row for the host replay. The off-diagonal variant
    # (scan_range > 0) interacts across diagonals, so it extends all.
    concat_qlen = int(context_offsets[len(word_cutoffs)]) - 2
    # when lut_word == word_size the reference never probes the double
    # word (s_TypeOfWord, na_ungapped.c:512): right runs are ZERO by
    # definition, and the device two-hit path must replay with zeros
    dev_two_hit = (
        use_blob and window_size > 0 and scan_range == 0
        and not disc_offsets
    )
    rr_zero = lut_word >= word_size
    dmask = diag_table_mask(concat_qlen, window_size)
    cached_adm = _CAP_CACHE.get((cap_key, "adm"))
    adm_cap = max(cached_adm or 0, 16384) if dev_two_hit else 0

    # device replay: the approx gate + the per-diagonal replay (one-hit
    # when window_size == 0, two-hit otherwise) run on device and only
    # the saved seeds ship (a [save_cap] pack vs the full [seed_cap]
    # fetch). Requires the gate data for word >= 11 (the host applies
    # no gate without approx_ctx, so neither may the device) and the
    # phase-0 finisher shape (alive-compacted extension).
    dev_replay = (
        use_blob and scan_range == 0 and not disc_offsets and phase0
        and _os.environ.get("GBLASTN_TPU_DEV_REPLAY", "1") != "0"
        and (word_size < 11 or approx_ctx is not None)
    )
    save_cap = (
        max(_CAP_CACHE.get((cap_key, "save"), 0), 16384)
        if dev_replay else 0
    )
    # the approx gate runs on statically-capped compacted lanes; the
    # real demand is the newly-saved count (~final HSPs per batch), far
    # below save_cap -- start small and grow from the measured need
    gate_cap = (
        max(_CAP_CACHE.get((cap_key, "gate"), 0), 2048)
        if dev_replay else 0
    )
    # window-kernel extent: extensions stop (genuine X-drop) within one
    # query context -- sentinels score NEG_BIG -- so a per-direction
    # window of max-context-length + margin is exact and costs
    # proportionally less scan work than the fixed 2048 (1 kb reads ->
    # window 1024, half the kernel cells). Longer contexts keep the
    # full window; anything truncated escalates to phase 2 as before.
    max_ctx = int(np.max(np.diff(context_offsets[: n_ctx + 1]),
                         initial=1))
    ext_window = 256
    while ext_window < min(max_ctx + 64, 2048):
        ext_window *= 2

    first_dispatch = True
    dev_saved = None
    while True:
        if use_blob:
            with slog.time("device.seeding.pipeline"):
                packed = _seeding_tpu_blob(
                    blob_dev, dev.subject2, dev.subject_valid,
                    dev.subject_w, dev.pallas_subject, dev.table64,
                    dev.subject_starts_dev, dev.subject_ends_dev,
                    mask_dev[0], mask_dev[1],
                    qcap=len(dev.host_qbuf), ctx_cap=ctx_cap,
                    pcap=len(dev.lut_pos_host),
                    table_size=dev.lut_table_size,
                    packed_mini=not disc_offsets,
                    scan_step=scan_step, lut_word=lut_word,
                    word_size=word_size, cmax=cmax, n_scan=n_scan,
                    hit_cap=hit_cap, seed_cap=seed_cap,
                    alive_cap=(
                        alive_cap if phase0 and not disc_offsets else 0
                    ),
                    disc_offsets=disc_offsets,
                    interpret=blob_interpret,
                    sync=False,
                    window=(window_size if dev_two_hit else 0),
                    diag_mask=(
                        dmask if (dev_two_hit or save_cap) else 0
                    ),
                    adm_cap=adm_cap,
                    save_cap=save_cap,
                    rr_zero=rr_zero,
                    packed_dev=dev.packed_dev,
                    gate_cap=gate_cap,
                    ext_window=ext_window,
                )
            refetch_full = None
            if save_cap:
                packed, refetch_full = packed
            if first_dispatch:
                # suspension point: the device chain is dispatched but
                # not fetched -- a pipelining caller overlaps host work
                # of the previous batch here (engine.pipeline)
                first_dispatch = False
                yield
            with slog.time("device.seeding.pack_sync"):
                flat = np.asarray(packed)
            if save_cap:
                sq, sss, ssc, sd, tail = _unpack_saved(flat, save_cap)
                n_overflow, n_raw = int(tail[0]), int(tail[1])
                counts = tuple(int(c) for c in tail[2:6])
                n_saved, n_fb = int(tail[6]), int(tail[7])
                n_gate_need = int(tail[8])
                if (n_overflow == 0 and n_fb > 0
                        and n_gate_need > gate_cap):
                    # gate compaction overflowed: grow the gate cap and
                    # re-dispatch (cheap) instead of the host fallback
                    gate_cap = _round_up_pow2(
                        n_gate_need + n_gate_need // 8, gate_cap
                    )
                    _CAP_CACHE[(cap_key, "gate")] = gate_cap
                    continue
                if n_overflow == 0:
                    if n_saved > save_cap:
                        # remember the real demand for future batches;
                        # this batch completes via the full-fetch path
                        _CAP_CACHE[(cap_key, "save")] = _round_up_pow2(
                            n_saved + n_saved // 8, save_cap
                        )
                    if n_fb == 0 and n_saved <= save_cap:
                        dev_saved = (sq, sss, ssc, sd, n_saved)
                        break
                    # fallback: unresolved gate walks / replay-tier
                    # overflow / truncated extensions -> fetch the full
                    # pack (scan outputs are still device-resident) and
                    # run the host replay
                    slog.diagnostics.replay_fallbacks += 1
                    with slog.time("device.seeding.replay_fallback"):
                        flat = np.asarray(refetch_full())
            if not save_cap or n_overflow == 0:
                (qs, ss, fill, ctx, ug_q, ug_s, ug_len, ug_score,
                 trunc, n_overflow, n_raw, counts,
                 dev_rr) = _unpack_seeds(
                    flat, ctx_off_dev, ctx_cap,
                    rows=(5 if dev_two_hit else 4),
                )
        elif pallas_primary:
            if first_dispatch:
                first_dispatch = False
                yield
            with slog.time("device.seeding.pipeline"):
                flat = np.asarray(_seeding_tpu_fused(
                    dev.subject2, dev.subject_valid,
                    dev.lut_offsets, dev.lut_positions, dev.query,
                    jnp.asarray(ctx_off_dev), jnp.asarray(xdrop_dev),
                    jnp.asarray(subject_starts),
                    jnp.asarray(subject_ends),
                    dev.pallas_subject,
                    dev.table64,
                    scan_step=scan_step, lut_word=lut_word,
                    word_size=word_size, cmax=cmax, n_scan=n_scan,
                    hit_cap=hit_cap, seed_cap=seed_cap,
                    mask_starts=mask_dev[0], mask_ends=mask_dev[1],
                    query_nib=(
                        None if disc_offsets else dev.query_nib
                    ),
                    subject_w=dev.subject_w,
                    alive_cap=(
                        alive_cap if phase0 and not disc_offsets else 0
                    ),
                    q_allowed=dev.q_allowed,
                    disc_offsets=disc_offsets,
                ))
                (qs, ss, fill, ctx, ug_q, ug_s, ug_len, ug_score,
                 trunc, n_overflow, n_raw, counts, dev_rr) = _unpack_seeds(
                    flat, ctx_off_dev, ctx_cap
                )
        else:
            if first_dispatch:
                first_dispatch = False
                yield
            with slog.time("device.seeding.pipeline"):
                out = seeding_pipeline(
                    dev.subject2, dev.subject_valid,
                    dev.lut_offsets, dev.lut_positions,
                    dev.query, dev.matrix16,
                    jnp.asarray(ctx_off_dev), jnp.asarray(xdrop_dev),
                    scan_step=scan_step, lut_word=lut_word,
                    word_size=word_size, cmax=cmax, n_scan=n_scan,
                    hit_cap=hit_cap, seed_cap=seed_cap,
                    mask_starts=mask_dev[0], mask_ends=mask_dev[1],
                    q_allowed=dev.q_allowed,
                    disc_offsets=disc_offsets,
                )
                (qs, ss, fill, ctx, ug_q, ug_s, ug_len, ug_score, trunc,
                 n_overflow, n_raw) = (np.asarray(o) for o in out)
                counts = ()
                dev_rr = None
        if int(n_overflow) == 0:
            break
        # right-size each capacity from the measured stage counts
        # (blind doubling of every cap overshoots: a seed_cap overflow
        # used to quadruple the scan program's lane count); counts are
        # the TRUE totals, so one retry usually clears
        grew = False
        if len(counts) == 4:
            nh, ns_, na, nadm = counts
            if nh > hit_cap:
                hit_cap = _round_up_pow2(nh + nh // 8, hit_cap)
                grew = True
            need_seed = max(int(n_raw), 2 * ns_)
            if need_seed > seed_cap:
                seed_cap = _round_up_pow2(
                    need_seed + need_seed // 8, seed_cap
                )
                grew = True
            if na > alive_cap:
                alive_cap = _round_up_pow2(na + na // 8, alive_cap)
                grew = True
            if adm_cap and nadm > adm_cap:
                adm_cap = _round_up_pow2(nadm + nadm // 8, adm_cap)
                grew = True
        if not grew:
            # cmax drops / legacy path: fall back to doubling
            hit_cap *= 2
            seed_cap *= 2
            alive_cap *= 2
        if hit_cap > max(n_scan * 4, 1 << 23):
            raise RuntimeError("seeding capacity overflow did not clear")
    _CAP_CACHE[cap_key] = (hit_cap, seed_cap, alive_cap)
    if adm_cap:
        _CAP_CACHE[(cap_key, "adm")] = adm_cap
    slog.diagnostics.lookup_hits += int(n_raw)
    if dev_saved is not None:
        # device-replay fast path: only saved seeds were fetched; the
        # gate, replay, and cutoff test already ran on device
        slog.diagnostics.init_extends += int(counts[1])
        return _finish_saved_hits(
            *dev_saved, ctx_off_dev, n_ctx, subject_starts,
        )

    # phase 2: re-run clamp-truncated extensions unclamped on a host-
    # compacted seed set (typically the true matches only). The Pallas
    # window kernel handles extensions up to its WINDOW; anything it
    # still truncates (queries longer than WINDOW) escalates to the
    # XLA path.
    tidx = np.nonzero(trunc)[0]
    if len(tidx):
        # np.asarray of a jax array is a read-only view; copy to patch
        ug_q = ug_q.copy()
        ug_s = ug_s.copy()
        ug_len = ug_len.copy()
        ug_score = ug_score.copy()
        cap2 = _round_up_pow2(len(tidx))
        pad2 = cap2 - len(tidx)
        q2 = np.concatenate([qs[tidx], np.zeros(pad2, qs.dtype)])
        s2 = np.concatenate([ss[tidx], np.zeros(pad2, ss.dtype)])
        v2 = np.concatenate([np.ones(len(tidx), bool),
                             np.zeros(pad2, bool)])
        x2 = np.concatenate([
            xdrop_dev[np.clip(ctx[tidx], 0, ctx_cap - 1)],
            np.ones(pad2, np.int32),
        ])
        # truncated seeds exceeded the Pallas WINDOW (or we ran
        # the XLA pipeline): finish them unclamped through XLA
        if dev.query is None:   # blob path keeps the query in the blob
            dev.query = jnp.asarray(dev.host_qbuf)
        if dev.subject2 is None:   # packed-only residency
            (dev.subject2, dev.subject_valid, dev.subject_w,
             dev.pallas_subject) = _derive_material_jit(
                dev.packed_dev, dev.subject_starts_dev,
                dev.subject_ends_dev,
            )
        with slog.time("device.seeding.phase2"):
            f_q, f_s, f_len, f_score, _t = ungapped_extend(
                dev.query, dev.subject2, dev.subject_valid,
                dev.matrix16,
                jnp.asarray(q2), jnp.asarray(s2), jnp.asarray(v2),
                jnp.asarray(x2),
            )
            ug_q[tidx] = np.asarray(f_q)[: len(tidx)]
            ug_s[tidx] = np.asarray(f_s)[: len(tidx)]
            ug_len[tidx] = np.asarray(f_len)[: len(tidx)]
            ug_score[tidx] = np.asarray(f_score)[: len(tidx)]

    # mini-extension kills seeds in place, so survivors are scattered
    # through the [seed_cap] arrays -- compact by the mask, not a prefix
    sel = np.nonzero(fill)[0]
    slog.diagnostics.init_extends += len(sel)
    if len(sel) == 0:
        z = np.zeros(0, dtype=np.int32)
        if _raw:
            return (z,) * 7
        return InitHits(z, z, z, z, z, z, z, z)
    raw = (
        qs[sel], ss[sel], np.clip(ctx[sel], 0, n_ctx - 1),
        ug_q[sel], ug_s[sel], ug_len[sel], ug_score[sel],
    )
    if _raw:
        # caller merges hits from another pass (second disc template)
        # before the diagonal replay
        return raw
    right_run = None
    if window_size > 0:
        if lut_word >= word_size or disc_offsets is not None:
            # word_length == lut_word_length (for discontiguous, word
            # length IS the template length): s_TypeOfWord returns
            # "single word, extended = 0" without any probe
            # (na_ungapped.c:512), so the double-word test never fires
            right_run = np.zeros(len(sel), np.int32)
        elif dev_rr is not None:
            # device-computed runs rode the packed fetch
            right_run = np.asarray(dev_rr)[sel].astype(np.int32)
        else:
            if dev.host_query is None or dev.host_subject2 is None:
                raise ValueError(
                    "window_size > 0 needs host_query/host_subject2/"
                    "host_valid on SeedingDeviceData"
                )
            right_run = compute_right_runs(
                dev.host_query, dev.host_subject2, dev.host_valid,
                qs[sel], ss[sel], word_size,
            )
    return _finish_init_hits(
        raw[0], raw[1], raw[2], raw[3], raw[4], raw[5], raw[6],
        word_cutoffs, subject_starts, word_size,
        window_size=window_size, right_run=right_run,
        scan_range=scan_range,
        concat_qlen=int(context_offsets[n_ctx]) - 2,
        approx_ctx=approx_ctx,
    )


def run_seeding_two_templates(
    dev: SeedingDeviceData,
    dev2: SeedingDeviceData,
    disc_offsets: tuple[int, ...],
    disc_offsets2: tuple[int, ...],
    **kw,
) -> InitHits:
    """coding_and_optimal discontiguous megablast: both templates are
    scanned (the reference fills two hashtables and scans both,
    s_FillDiscMBTable blast_nalookup.c:714); the raw hit sets are merged
    before the diagonal replay, which orders by (oid, diag, s_off) --
    duplicates (a hit found by both templates) fall inside the explored
    area and are skipped, exactly as the second table's chain is in the
    reference scanner."""
    raw1 = run_seeding(dev, disc_offsets=disc_offsets, _raw=True, **kw)
    raw2 = run_seeding(dev2, disc_offsets=disc_offsets2, _raw=True, **kw)
    return merge_two_template_raw(
        raw1, raw2,
        word_cutoffs=kw["word_cutoffs"],
        subject_starts=kw["subject_starts"],
        word_size=kw["word_size"],
        window_size=kw.get("window_size", 0),
        scan_range=kw.get("scan_range", 0),
        context_offsets=kw["context_offsets"],
        approx_ctx=kw.get("approx_ctx"),
    )


def merge_two_template_raw(
    raw1, raw2, *, word_cutoffs, subject_starts, word_size,
    window_size, scan_range, context_offsets, approx_ctx,
) -> InitHits:
    """Merge the two templates' raw hit tuples (run_seeding /
    run_seeding_streamed / run_seeding_sharded with ``_raw=True``) and
    run the shared host finishing (diagonal replay, score order)."""
    cat = tuple(
        np.concatenate([a, b]) for a, b in zip(raw1, raw2)
    )
    right_run = np.zeros(len(cat[0]), np.int32)   # word == lut word
    n_ctx2 = len(word_cutoffs)
    return _finish_init_hits(
        cat[0], cat[1], cat[2], cat[3], cat[4], cat[5], cat[6],
        word_cutoffs, subject_starts, word_size,
        window_size=window_size, right_run=right_run,
        scan_range=scan_range,
        concat_qlen=int(context_offsets[n_ctx2]) - 2,
        approx_ctx=approx_ctx,
    )


def _finish_init_hits(
    q_np, s_np, ctx, ug_q, ug_s, ug_len, ug_score,
    word_cutoffs, subject_starts, word_size,
    window_size: int = 0, right_run=None, scan_range: int = 0,
    concat_qlen: int = 1 << 30,   # > 8000 -> exact (hash) diagonals
    approx_ctx: dict | None = None,   # approximate-ungapped gate data
) -> InitHits:
    """Host finishing: per-context cutoffs, oid mapping, one- or
    two-hit diagonal replay, final score ordering.

    The diagonal replay runs in subject-local int32 coordinates
    (diagonal state is keyed per (oid, diag), and shifting s_off and
    ung_s_start by the same per-subject constant preserves every
    comparison), which keeps the native filter int32-safe for global
    positions beyond 2^31 (streamed multi-Gbase databases). A SINGLE
    subject longer than 2^31 bases (beyond what the reference's Int4
    coordinates can even represent) would still overflow the local
    cast -- skipped wrapped-negative seeds silently lose every hit
    past 2^31 -- so those seeds are additionally rebased per
    (oid, diagonal-class): replay state never crosses classes, so any
    per-class shift preserves the machine exactly."""
    cutoff = word_cutoffs[ctx].astype(np.int32)

    if len(subject_starts) == 1:
        # single-subject DB (the whole-chromosome shape): every seed
        # maps to oid 0; skip the 64-bit binary search over ~1M seeds
        oid = np.zeros(len(s_np), np.int32)
        base = np.int64(subject_starts[0])
    else:
        oid = (
            np.searchsorted(subject_starts, s_np, side="right") - 1
        ).astype(np.int32)
        base = subject_starts[oid].astype(np.int64)
    s_loc64 = s_np.astype(np.int64) - base
    ug_s_loc64 = ug_s.astype(np.int64) - base
    i32_safe = (1 << 31) - (1 << 20)
    rebase_shift = None
    if len(s_loc64) and int(s_loc64.max()) >= i32_safe:
        if window_size > 0 and scan_range > 0:
            raise OverflowError(
                "-off_diagonal_range probes interact across diagonals "
                "and cannot be class-rebased; single subjects >= 2^31 "
                "bases are unsupported with it"
            )
        dmask_r = diag_table_mask(concat_qlen, window_size)
        diag64 = s_np.astype(np.int64) - q_np.astype(np.int64)
        if dmask_r:
            diag64 = diag64 & dmask_r
        order_r = np.lexsort((s_loc64, diag64, oid))
        o_s2 = oid[order_r]
        d_s2 = diag64[order_r]
        s_s2 = s_loc64[order_r]
        head2 = np.ones(len(order_r), bool)
        head2[1:] = (o_s2[1:] != o_s2[:-1]) | (d_s2[1:] != d_s2[:-1])
        gmin = np.minimum.reduceat(s_s2, np.flatnonzero(head2))
        shift_sorted = np.repeat(gmin, np.diff(np.append(
            np.flatnonzero(head2), len(order_r))))
        shift = np.empty(len(order_r), np.int64)
        shift[order_r] = shift_sorted
        s_loc64 = s_loc64 - shift
        ug_s_loc64 = ug_s_loc64 - shift
        rebase_shift = shift
        if int(s_loc64.max()) >= i32_safe:
            raise OverflowError(
                "a single diagonal class spans >= 2^31 subject bases; "
                "the replay cannot run in int32"
            )
    s_loc = s_loc64.astype(np.int32)
    ug_s_loc = ug_s_loc64.astype(np.int32)
    q32 = q_np.astype(np.int32)
    len32 = ug_len.astype(np.int32)
    score32 = ug_score.astype(np.int32)

    # the reference scores ungapped extensions APPROXIMATELY first for
    # word lengths >= 11 (s_NuclUngappedExtend, na_ungapped.c:263) and
    # only rescored exactly above the reduced cutoff; a seed whose
    # byte-quantized score stays below it keeps the low approximate
    # score and fails the cutoff even when its exact score passes.
    # Substitute the approximate data for those seeds so the replay
    # (and any off-diagonal save) behaves bit-identically.
    if approx_ctx is not None and word_size >= 11:
        # only cutoff-passing seeds can be demoted (failed seeds push
        # last_hit from the seed end either way); below-cutoff seeds
        # saved via the off-diagonal probe get their reference-accurate
        # (approximate) data substituted after the replay
        need = score32 >= cutoff
        if need.any():
            from gblastn_tpu.engine.approx import compute_approx_info

            sub_st = np.asarray(subject_starts, np.int64)[oid]
            sub_en = np.asarray(approx_ctx["subject_ends"],
                                np.int64)[oid]
            with slog.time("host.approx_gate"):
                demote, a_sc, a_q, a_s, a_r = compute_approx_info(
                    approx_ctx["query"], approx_ctx["concat_end"],
                    approx_ctx["packed"], sub_st, sub_en,
                    np.asarray(q_np, np.int64),
                    np.asarray(s_np, np.int64),
                    ctx, approx_ctx["x_dropoffs"],
                    approx_ctx["reduced"],
                    approx_ctx["table"], need,
                )
            if demote.any():
                ext = (
                    right_run.astype(np.int64)
                    if right_run is not None else 0
                )
                sme = np.asarray(s_np, np.int64) + word_size + ext
                ug_q = np.asarray(ug_q).copy()
                ug_s = np.asarray(ug_s).copy()
                ug_len = np.asarray(ug_len).copy()
                ug_score = np.asarray(ug_score).copy()
                d = demote
                ug_q[d] = a_q[d]
                ug_s[d] = a_s[d]
                ug_len[d] = np.maximum(
                    sme[d] - a_s[d], a_r[d] - a_q[d] + 1
                )
                ug_score[d] = a_sc[d]
                ug_s_loc64b = ug_s.astype(np.int64) - base
                if rebase_shift is not None:
                    ug_s_loc64b = ug_s_loc64b - rebase_shift
                ug_s_loc = ug_s_loc64b.astype(np.int32)
                len32 = ug_len.astype(np.int32)
                score32 = ug_score.astype(np.int32)

    dmask = diag_table_mask(concat_qlen, window_size)
    with slog.time("host.diag_filter"):
        if window_size > 0 and scan_range > 0:
            saved = two_hit_scan_range_filter(
                q32, s_loc, oid, word_size, window_size, scan_range,
                ug_s_loc, len32, score32, cutoff,
                right_run if right_run is not None
                else np.zeros(len(q_np), np.int32),
                diag_mask=dmask,
            )
        elif window_size > 0:
            saved = two_hit_diag_filter(
                q32, s_loc, oid, word_size, window_size,
                ug_s_loc, len32, score32, cutoff, right_run,
                diag_mask=dmask,
            )
        else:
            saved = one_hit_diag_filter(
                q32, s_loc, oid, word_size, ug_s_loc, len32, score32,
                cutoff, diag_mask=dmask,
            )
    if (approx_ctx is not None and word_size >= 11
            and window_size > 0 and scan_range > 0):
        # the off-diagonal probe saves below-cutoff seeds with the
        # reference's ungapped data -- approximate unless the byte
        # score reached the reduced cutoff (na_ungapped.c:732). The
        # replay's last_hit for such a save uses the exact end; the
        # divergence window is a saved-below-cutoff hit followed by
        # another hit inside the approx/exact end gap on one diagonal.
        sub2 = saved & (score32 < cutoff)
        if sub2.any():
            from gblastn_tpu.engine.approx import compute_approx_info

            sub_st2 = np.asarray(subject_starts, np.int64)[oid]
            sub_en2 = np.asarray(
                approx_ctx["subject_ends"], np.int64
            )[oid]
            with slog.time("host.approx_gate"):
                dem2, a2_sc, a2_q, a2_s, a2_r = compute_approx_info(
                    approx_ctx["query"], approx_ctx["concat_end"],
                    approx_ctx["packed"], sub_st2, sub_en2,
                    np.asarray(q_np, np.int64),
                    np.asarray(s_np, np.int64),
                    ctx, approx_ctx["x_dropoffs"],
                    approx_ctx["reduced"],
                    approx_ctx["table"], sub2,
                )
            d2 = sub2 & dem2
            if d2.any():
                ext2 = (
                    right_run.astype(np.int64)
                    if right_run is not None else 0
                )
                sme2 = np.asarray(s_np, np.int64) + word_size + ext2
                ug_q = np.asarray(ug_q).copy()
                ug_s = np.asarray(ug_s).copy()
                ug_len = np.asarray(ug_len).copy()
                ug_score = np.asarray(ug_score).copy()
                ug_q[d2] = a2_q[d2]
                ug_s[d2] = a2_s[d2]
                ug_len[d2] = np.maximum(
                    sme2[d2] - a2_s[d2], a2_r[d2] - a2_q[d2] + 1
                )
                ug_score[d2] = a2_sc[d2]

    keep = np.nonzero(saved)[0]
    order = sort_by_score_order(
        ug_score[keep], ug_s[keep], ug_len[keep], ug_q[keep]
    )
    keep = keep[order]
    return InitHits(
        q_off=q_np[keep],
        s_off=s_np[keep],
        q_start=ug_q[keep],
        s_start=ug_s[keep],
        length=ug_len[keep],
        score=ug_score[keep],
        context=ctx[keep],
        oid=oid[keep],
    )


def run_seeding_sharded(
    mesh,
    subject2: np.ndarray,
    subject_valid: np.ndarray,
    query_buffer: np.ndarray,
    lut,
    matrix16: np.ndarray,
    *,
    word_size: int,
    subject_starts: np.ndarray,
    subject_lengths: np.ndarray,
    context_offsets: np.ndarray,
    word_cutoffs: np.ndarray,
    x_dropoffs: np.ndarray,
    cmax: int = 8,
    window_size: int = 0,
    scan_range: int = 0,
    mask_intervals: np.ndarray | None = None,
    approx_ctx: dict | None = None,
    db_index=None,                # lut.dbindex.DbIndex (-use_index)
    q_allowed: np.ndarray | None = None,
    packed: np.ndarray | None = None,      # 2-bit buffer (cached upload)
    device_cache: dict | None = None,
    _raw: bool = False,   # return pre-replay hit arrays (two templates)
) -> InitHits:
    """Multi-chip seeding over a DB-sharded device mesh
    (gblastn_tpu.parallel.dist), then the same host finishing as the
    single-chip path. The sharded program runs the full production
    seeding stage (compaction, per-context X-drops, Pallas ungapped on
    TPU, overflow retry, exact edge escalation)."""
    from gblastn_tpu.parallel.dist import run_sharded_seeding

    n_ctx = len(word_cutoffs)
    ctx_cap = 64
    while ctx_cap < n_ctx:
        ctx_cap *= 2
    ctx_off = np.full(ctx_cap + 1, np.iinfo(np.int32).max, np.int32)
    ctx_off[: n_ctx + 1] = context_offsets[: n_ctx + 1]
    xdrops = np.ones(ctx_cap, np.int32)
    xdrops[:n_ctx] = x_dropoffs

    with slog.time("device.seeding.sharded"):
        q_off, s_off, ctx, ug_q, ug_s, ug_len, ug_score = (
            run_sharded_seeding(
                mesh, subject2, subject_valid, query_buffer,
                lut.counts_offsets,
                lut.positions if len(lut.positions)
                else np.zeros(1, np.int32),
                matrix16,
                subject_starts=subject_starts,
                subject_lengths=subject_lengths,
                ctx_offsets=ctx_off, x_dropoffs=xdrops,
                scan_step=lut.scan_step, lut_word=lut.lut_word_size,
                word_size=word_size, cmax=cmax,
                mask_intervals=mask_intervals,
                disc_offsets=lut.disc_offsets,
                db_index=db_index, q_allowed=q_allowed,
                packed=packed, device_cache=device_cache,
            )
        )
    slog.diagnostics.init_extends += len(q_off)
    if len(q_off) == 0:
        z = np.zeros(0, dtype=np.int32)
        if _raw:
            return (z,) * 7
        return InitHits(z, z, z, z, z, z, z, z)
    if _raw:
        # caller merges hits from another pass (second disc template)
        # before the diagonal replay (run_seeding_two_templates)
        return (
            q_off, s_off, np.clip(ctx, 0, n_ctx - 1),
            ug_q, ug_s, ug_len, ug_score,
        )
    right_run = None
    if window_size > 0:
        if lut.lut_word_size >= word_size or lut.disc_offsets is not None:
            # na_ungapped.c:512 fast return (see run_seeding)
            right_run = np.zeros(len(q_off), np.int32)
        else:
            right_run = compute_right_runs(
                np.asarray(query_buffer), np.asarray(subject2),
                np.asarray(subject_valid),
                q_off.astype(np.int64), s_off.astype(np.int64),
                word_size,
            )
    return _finish_init_hits(
        q_off, s_off, np.clip(ctx, 0, n_ctx - 1),
        ug_q, ug_s, ug_len, ug_score,
        word_cutoffs, subject_starts, word_size,
        window_size=window_size, right_run=right_run,
        scan_range=scan_range,
        concat_qlen=int(context_offsets[n_ctx]) - 2,
        approx_ctx=approx_ctx,
    )
