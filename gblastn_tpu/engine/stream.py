"""Subject block streaming: DB-scale seeding under a fixed HBM budget.

The reference streams subjects through the engine in 5MB chunks with a
100bp overlap and merges chunk-crossing HSPs afterwards
(/root/reference/c++/src/algo/blast/core/blast_engine.c:220-305,
blast_hits.c:2545 ``Blast_HSPListsMerge``).  The TPU redesign removes
the merge entirely:

* the device holds ONE fixed-size block buffer (``block_bases`` core +
  a ``halo`` of real subject context on each side) instead of the whole
  database, so HBM use is O(block), not O(DB);
* each block owns a **disjoint** range of global stride positions — the
  scan's stride phase is global, so the seed set is identical to the
  unstreamed scan and no seed is ever found twice (no dedup/merge);
* extensions run inside the halo'd buffer; the few that stop at an
  artificial bound (buffer edge, or the Pallas WINDOW) are re-extended
  *exactly* on the host against the 2-bit packed database
  (``ungapped_extend_host``), so results are bit-identical to the
  unstreamed path;
* blocks upload 2-bit **packed** bytes and unpack on device
  (ops.seeding.block_arrays) — 4x less host->device traffic;
* all coordinates on device are buffer-local int32; the host re-bases
  them to global int64, so databases beyond 2^31 bases work (the
  device-resident path cannot index those at all).

Dispatch is depth-2 pipelined: block k+1's upload+compute is enqueued
before block k's single packed fetch, hiding transfer latency.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gblastn_tpu.engine.seeding import InitHits, _finish_init_hits
from gblastn_tpu.io.encoding import unpack_2na
from gblastn_tpu.ops.seeding import (
    seeding_pipeline_block,
    seeding_scan_mini,
)
from gblastn_tpu.utils.profiling import slog

CLIP = 1 << 30            # local-coordinate clip for subjects larger
                          # than the buffer (values only feed min())
_CAP_CACHE: dict[tuple, tuple[int, int]] = {}


def _round_up_pow2(n: int, lo: int = 256) -> int:
    """Half-step buckets {2^k, 3*2^(k-1)} (see engine.seeding)."""
    m = lo
    while m < n:
        if m + m // 2 >= n and m + m // 2 >= lo:
            return m + m // 2
        m *= 2
    return m


# ------------------------------------------------------------------ host ops
def unpack_range(packed: np.ndarray, p0: int, p1: int) -> np.ndarray:
    """2-bit codes for global base positions [p0, p1) (p0, p1 >= 0)."""
    b0, b1 = p0 >> 2, (p1 + 3) >> 2
    codes = unpack_2na(packed[b0:b1], (b1 - b0) * 4)
    return codes[p0 - 4 * b0: p1 - 4 * b0]


def _xdrop_dir_host(fetch, max_steps: int, x: int, chunk: int = 8192):
    """Exact host mirror of ops.seeding._xdrop_direction (reset-at-best
    accumulation of s_NuclUngappedExtendExact, na_ungapped.c:152).

    ``fetch(base, k)`` returns scores for steps base+1 .. base+k.
    Returns (best, best_pos) with best floored at 0 (pos 0 if best 0).
    """
    s = 0
    best = 0
    best_pos = 0
    base = 0
    while base < max_steps:
        k = min(chunk, max_steps - base)
        sc = fetch(base, k).astype(np.int64)
        cs = s + np.cumsum(sc)
        run = np.maximum.accumulate(cs)
        prev = np.empty_like(run)
        prev[0] = best
        if k > 1:
            np.maximum(best, run[:-1], out=prev[1:])
        dropped = (cs - prev) < -x
        any_drop = bool(dropped.any())
        stop = int(np.argmax(dropped)) if any_drop else k - 1
        live = cs[: stop + 1]
        m = int(live.max())
        if m > best:
            best = m
            best_pos = base + int(np.argmax(live == m)) + 1
        if any_drop:
            break
        s = int(cs[-1])
        base += k
    return best, best_pos


def ungapped_extend_host(
    query: np.ndarray,            # uint8[Q] BLASTNA with sentinels
    matrix16: np.ndarray,         # int32[16, 4] (device_matrix16)
    packed: np.ndarray,           # uint8 packed DB
    sub_start: np.ndarray,        # int64[n] subject start per seed
    sub_end: np.ndarray,          # int64[n] subject end per seed
    q_off: np.ndarray,
    s_off: np.ndarray,            # int64[n] global base positions
    x_drop: np.ndarray,
):
    """Exact bidirectional X-drop extension on host, straight off the
    packed database.  Used for the rare streamed seeds whose device
    extension stopped at a buffer edge; operation-identical to
    ops.seeding.ungapped_extend (asserted in tests/test_stream.py)."""
    Q = len(query)
    n = len(q_off)
    uq = np.zeros(n, np.int64)
    us = np.zeros(n, np.int64)
    ulen = np.zeros(n, np.int64)
    uscore = np.zeros(n, np.int64)
    m16 = matrix16.astype(np.int64)
    for i in range(n):
        qo = int(q_off[i])
        so = int(s_off[i])
        x = int(x_drop[i])
        max_l = min(qo, so - int(sub_start[i]))
        max_r = min(Q - qo, int(sub_end[i]) - so)

        def fetch_l(base, k, qo=qo, so=so):
            qseg = query[qo - base - k: qo - base][::-1].astype(np.int64)
            sseg = unpack_range(packed, so - base - k, so - base)[::-1]
            return m16[qseg, sseg.astype(np.int64)]

        def fetch_r(base, k, qo=qo, so=so):
            qseg = query[qo + base: qo + base + k].astype(np.int64)
            sseg = unpack_range(packed, so + base, so + base + k)
            return m16[qseg, sseg.astype(np.int64)]

        l_best, l_pos = _xdrop_dir_host(fetch_l, max_l, x)
        r_best, r_pos = _xdrop_dir_host(fetch_r, max_r, x)
        uq[i] = qo - l_pos
        us[i] = so - l_pos
        ulen[i] = l_pos + r_pos
        uscore[i] = l_best + r_best
    return uq, us, ulen, uscore


def compute_right_runs_packed(
    query: np.ndarray,            # uint8[Q] BLASTNA
    packed: np.ndarray,           # uint8 packed DB
    sub_end: np.ndarray,          # int64[n] owning subject's end per seed
    q_off: np.ndarray,
    s_off: np.ndarray,            # int64[n] global positions
    word_size: int,
) -> np.ndarray:
    """engine.seeding.compute_right_runs off the packed database (the
    two-hit double-word probe) — no full unpacked DB needed."""
    n = len(q_off)
    if n == 0:
        return np.zeros(0, np.int32)
    W = word_size
    k = np.arange(W, dtype=np.int64)
    qi = q_off.astype(np.int64)[:, None] + W + k
    si = s_off.astype(np.int64)[:, None] + W + k
    q_in = qi < len(query)
    qv = query[np.minimum(qi, len(query) - 1)]
    byte = packed[np.minimum(si >> 2, len(packed) - 1).astype(np.int64)]
    sv = (byte >> ((3 - (si & 3)) * 2).astype(np.uint8)) & 3
    match = (
        q_in
        & (si < sub_end[:, None])
        & (qv < 4)
        & (qv.astype(np.int64) == sv.astype(np.int64))
    )
    return np.cumprod(match, axis=1).sum(axis=1).astype(np.int32)


# -------------------------------------------------------------- device packs
@jax.jit
def _pack_stream(qs, ss, ok, f_q, f_len, f_score, bits,
                 max_l, max_r, n_overflow, n_raw):
    """One flat int32[6 * cap + 2] device->host transfer per block
    (the engine.seeding._pack_seeds trick: s-start needs no slot, ctx
    is recomputed on host, small fields share a bitfield; max_l/max_r
    stay whole rows -- the halo escalation needs them and they exceed
    bitfield range).

    The XLA block path extends UNCLAMPED within the buffer, so on long
    queries the 12/13-bit fields can overflow; those lanes get the
    always-escalate bit and the host recomputes them exactly (the same
    path that handles halo-edge stops)."""
    l_ext = qs - f_q
    wide = (l_ext > 0xFFF) | (f_len > 0x1FFF)
    d = (
        ok.astype(jnp.int32)
        | (((bits.astype(jnp.int32) | wide.astype(jnp.int32)) & 7) << 1)
        | (jnp.clip(l_ext, 0, 0xFFF) << 4)
        | (jnp.clip(f_len, 0, 0x1FFF) << 16)
    )
    return jnp.concatenate([
        qs, ss, f_score, d, max_l, max_r,
        jnp.stack([n_overflow.astype(jnp.int32),
                   n_raw.astype(jnp.int32)]),
    ])


@functools.partial(
    jax.jit,
    static_argnames=(
        "scan_step", "lut_word", "word_size", "cmax", "n_scan",
        "hit_cap", "seed_cap", "out_cap", "pos_base_static",
        "disc_offsets", "idx_table_size",
    ),
)
def _xla_block_packed(
    packed, local_starts, local_ends, lut_offsets, lut_positions,
    query, matrix16, ctx_offsets, x_dropoffs, pos_base, pos_end,
    mask_starts=None, mask_ends=None, q_allowed=None, idx_words=None,
    *, scan_step, lut_word, word_size, cmax, n_scan, hit_cap, seed_cap,
    out_cap, pos_base_static=None, disc_offsets=None, idx_table_size=0,
):
    if q_allowed is not None:
        # indexed megablast: the block's slice of the DATABASE index
        # replaces the subject scan; offsets rebuild on device from the
        # word-sorted codes (engine.seeding.offsets_on_device)
        from gblastn_tpu.engine.seeding import offsets_on_device
        from gblastn_tpu.ops.seeding import (
            block_arrays,
            seeding_scan_mini,
            ungapped_extend,
        )

        s2, sval = block_arrays(packed, local_starts, local_ends)
        idx_offsets = offsets_on_device(idx_words, idx_table_size)
        (qs, ss, ok, _ctx, xd, max_l, max_r, n_overflow, n_raw,
         _nh, _ns) = seeding_scan_mini(
            s2, sval, idx_offsets, lut_positions, query,
            ctx_offsets, x_dropoffs, local_starts, local_ends,
            pos_base, pos_end, mask_starts, mask_ends,
            q_allowed=q_allowed,
            scan_step=scan_step, lut_word=lut_word, word_size=word_size,
            cmax=cmax, n_scan=n_scan, hit_cap=hit_cap,
            seed_cap=seed_cap, out_cap=out_cap,
        )
        uq, _us, ulen, uscore, _t, bl, br = ungapped_extend(
            query, s2, sval, matrix16, qs, ss, ok, xd,
            return_bounds=True,
        )
        bound_bits = bl.astype(jnp.int32) * 2 + br.astype(jnp.int32) * 4
        return _pack_stream(qs, ss, ok, uq, ulen, uscore, bound_bits,
                            max_l, max_r, n_overflow, n_raw)
    outs = seeding_pipeline_block(
        packed, local_starts, local_ends, lut_offsets, lut_positions,
        query, matrix16, ctx_offsets, x_dropoffs, pos_base, pos_end,
        mask_starts, mask_ends,
        scan_step=scan_step, lut_word=lut_word, word_size=word_size,
        cmax=cmax, n_scan=n_scan, hit_cap=hit_cap, seed_cap=seed_cap,
        out_cap=out_cap, pos_base_static=pos_base_static,
        disc_offsets=disc_offsets,
    )
    (qs, ss, ok, _ctx, uq, _us, ulen, uscore, bound_bits,
     max_l, max_r, n_overflow, n_raw) = outs
    return _pack_stream(qs, ss, ok, uq, ulen, uscore, bound_bits,
                        max_l, max_r, n_overflow, n_raw)


@functools.partial(
    jax.jit,
    static_argnames=(
        "scan_step", "lut_word", "word_size", "cmax", "n_scan",
        "hit_cap", "seed_cap", "out_cap", "alive_cap",
        "pos_base_static", "disc_offsets", "idx_table_size",
    ),
)
def _pallas_block_packed(
    packed, local_starts, local_ends, lut_offsets, lut_positions,
    query, query_p, query_nib, table64, ctx_offsets, x_dropoffs,
    pos_base, pos_end, mask_starts=None, mask_ends=None,
    q_allowed=None, idx_words=None,
    *, scan_step, lut_word, word_size, cmax, n_scan, hit_cap, seed_cap,
    out_cap, alive_cap, pos_base_static=None, disc_offsets=None,
    idx_table_size=0,
):
    """The whole per-block device program as ONE dispatch: 2-bit
    unpack + guard-padded Pallas forms, subject-word packing, scan +
    mini-extension, the phase-0/window ungapped stage, and the packed
    output -- previously ~5 separate dispatches, each paying a tunnel
    round trip per block."""
    from gblastn_tpu.engine.seeding import _pallas_alive_only
    from gblastn_tpu.ops.pallas_ungapped import (
        ungapped_extend_pallas_prepared,
    )
    from gblastn_tpu.ops.seeding import (
        block_arrays_pallas,
        pack_subject_words,
    )

    s2, sval, s_p = block_arrays_pallas(packed, local_starts,
                                        local_ends)
    subject_w = pack_subject_words(packed)
    if q_allowed is not None:
        # indexed megablast: offsets rebuild from the block's index
        # slice; the query walk replaces the subject scan
        from gblastn_tpu.engine.seeding import offsets_on_device

        lut_offsets = offsets_on_device(idx_words, idx_table_size)
    (qs, ss, ok, _ctx, xd, max_l, max_r, n_overflow, n_raw,
     _nh, _ns) = (
        seeding_scan_mini(
            s2, sval, lut_offsets, lut_positions,
            query, ctx_offsets, x_dropoffs, local_starts, local_ends,
            pos_base, pos_end, mask_starts, mask_ends,
            query_nib, subject_w, q_allowed,
            scan_step=scan_step, lut_word=lut_word,
            word_size=word_size, cmax=cmax, n_scan=n_scan,
            hit_cap=hit_cap, seed_cap=seed_cap, out_cap=out_cap,
            pos_base_static=pos_base_static,
            disc_offsets=disc_offsets,
        )
    )
    if alive_cap:
        (f_q, _f_s, f_len, f_score, f_tr, n_alive) = (
            _pallas_alive_only(
                query_p, s_p, table64, query_nib, subject_w,
                qs, ss, ok, xd, max_l, max_r,
                word_size=word_size, alive_cap=alive_cap,
            )
        )
        # overflow = alive lanes BEYOND the compaction cap (the old
        # form added the raw alive count, which could never clear by
        # growing caps and looped any block with a clamp-surviving
        # extension into the retry ceiling)
        n_overflow = n_overflow + jnp.maximum(n_alive - alive_cap, 0)
    else:
        f_q, _f_s, f_len, f_score, f_tr = (
            ungapped_extend_pallas_prepared(
                (query_p, s_p), table64,
                qs, ss, ok, xd, max_l, max_r,
            )
        )
    return _pack_stream(qs, ss, ok, f_q, f_len, f_score, f_tr,
                        max_l, max_r, n_overflow, n_raw)


def _block_index_slices(db, db_index, plan):
    """Per-block (words_padded, positions_local, count) slices of the
    database word index, cached on the db. Block k owns global
    scan-grid positions [k*B, min((k+1)*B, npos)) -- the same disjoint
    partition the streamed scan uses -- so a stable position-range
    filter of the word-sorted index arrays yields per-block sub-indices
    whose union is exactly the whole index (and hence the scan's seed
    set). Pad words carry table_size so the on-device offsets rebuild
    drops them (engine.seeding.offsets_on_device)."""
    key = (plan.B, plan.halo, db_index.lut_word, db_index.word_size)
    cache = getattr(db, "_stream_index_cache", None)
    if cache is not None and cache[0] == key:
        return cache[1]
    pos = db_index.positions.astype(np.int64)
    words = db_index.words
    raw = []
    nmax = 1
    for k in range(plan.n_blocks):
        g0 = plan.slices[k][0]
        lo = k * plan.B
        hi = min((k + 1) * plan.B, plan.npos)
        m = (pos >= lo) & (pos < hi)
        raw.append(((pos[m] - g0).astype(np.int32), words[m]))
        nmax = max(nmax, int(m.sum()))
    cap = _round_up_pow2(nmax, 1024)
    out = []
    for pk, wk in raw:
        wp = np.full(cap, db_index.table_size, np.int32)
        pp = np.zeros(cap, np.int32)
        wp[: len(wk)] = wk
        pp[: len(pk)] = pk
        out.append((wp, pp, len(pk)))
    db._stream_index_cache = (key, out)
    return out


# --------------------------------------------------------------- orchestrator
class _BlockPlan:
    """Static per-search geometry of the stream."""

    def __init__(self, db, *, block_bases: int, halo: int, lut_word: int,
                 scan_step: int, mask_intervals=None):
        import math

        # B is a multiple of lcm(1024, scan_step) so every block's
        # first scan position sits at local offset exactly `halo` --
        # a STATIC value, which unlocks the strided-slice fast path in
        # ops.seeding.scan_block (pos_base_static)
        align = math.lcm(1024, scan_step)
        self.B = max(block_bases - block_bases % align, align)
        self.halo = max(halo - halo % 4, 256)
        self.s_buf = self.B + 2 * self.halo
        s_pad = db.padded_length
        self.npos = s_pad - lut_word + 1
        self.n_blocks = (s_pad + self.B - 1) // self.B
        self.n_scan = self.B // scan_step + 1
        self.scan_step = scan_step
        starts = db.starts
        ends = db.starts + db.lengths
        # per-block subject slice [a, b) and the max count for bucketing
        self.slices = []
        kmax = 1
        for k in range(self.n_blocks):
            g0 = k * self.B - self.halo
            a = int(np.searchsorted(ends, g0, side="right"))
            b = int(np.searchsorted(starts, g0 + self.s_buf, side="left"))
            self.slices.append((g0, a, b))
            kmax = max(kmax, b - a)
        self.kmax = _round_up_pow2(kmax, 16)
        # db soft-mask intervals: per-block slice bounds + bucketed cap
        self.mask_intervals = mask_intervals
        if mask_intervals is not None and len(mask_intervals):
            mi = np.asarray(mask_intervals, np.int64)
            self.mask_intervals = mi
            self.mask_slices = []
            mmax = 1
            for k in range(self.n_blocks):
                g0 = self.slices[k][0]
                lo = int(np.searchsorted(mi[:, 1], max(g0, 0), "right"))
                hi = int(np.searchsorted(mi[:, 0], g0 + self.s_buf,
                                         "left"))
                self.mask_slices.append((lo, hi))
                mmax = max(mmax, hi - lo)
            self.mcap = _round_up_pow2(mmax, 16)
        else:
            self.mask_intervals = None

    def block_inputs(self, db, k: int):
        """(packed_bytes[s_buf/4], local_starts, local_ends, pos_base,
        pos_end) for block k, or None if the block has no scan work."""
        g0, a, b = self.slices[k]
        if b <= a:
            return None
        p_lo = ((max(k * self.B, 0) + self.scan_step - 1)
                // self.scan_step) * self.scan_step
        p_hi = min((k + 1) * self.B, self.npos)
        if p_lo >= p_hi:
            return None
        nbytes = self.s_buf // 4
        buf = np.zeros(nbytes, np.uint8)
        src0 = max(g0, 0) >> 2
        src1 = min((g0 + self.s_buf) >> 2, len(db.packed))
        if src1 > src0:
            dst0 = src0 - (g0 >> 2)
            buf[dst0: dst0 + (src1 - src0)] = db.packed[src0:src1]
        ls = np.full(self.kmax, np.iinfo(np.int32).max, np.int32)
        le = np.full(self.kmax, np.iinfo(np.int32).max, np.int32)
        ls[: b - a] = np.clip(db.starts[a:b] - g0, -CLIP, CLIP)
        le[: b - a] = np.clip(
            db.starts[a:b] + db.lengths[a:b] - g0, -CLIP, CLIP
        )
        if self.mask_intervals is None:
            masks = (None, None)
        else:
            mlo, mhi = self.mask_slices[k]
            ms = np.full(self.mcap, CLIP, np.int32)
            me = np.full(self.mcap, CLIP, np.int32)
            ms[: mhi - mlo] = np.clip(
                self.mask_intervals[mlo:mhi, 0] - g0, -CLIP, CLIP
            )
            me[: mhi - mlo] = np.clip(
                self.mask_intervals[mlo:mhi, 1] - g0, -CLIP, CLIP
            )
            masks = (ms, me)
        return (buf, ls, le, np.int32(p_lo - g0), np.int32(p_hi - g0),
                masks)


def run_seeding_streamed(
    db,
    *,
    query_dev: jnp.ndarray,         # uint8[Qcap] device query
    query_host: np.ndarray,         # uint8[Qcap] same, host
    lut_offsets_dev: jnp.ndarray,
    lut_positions_dev: jnp.ndarray,
    matrix16: np.ndarray,           # int32[16, 4] (device_matrix16)
    context_offsets: np.ndarray,
    word_cutoffs: np.ndarray,
    x_dropoffs: np.ndarray,
    word_size: int,
    lut_word: int,
    scan_step: int,
    cmax: int,
    window_size: int = 0,
    scan_range: int = 0,
    block_bases: int = 1 << 27,
    halo: int = 4096,
    hit_cap: int = 16384,
    seed_cap: int = 16384,
    use_pallas: bool | None = None,
    mask_intervals: np.ndarray | None = None,  # int64[n, 2] absolute
    disc_offsets: tuple[int, ...] | None = None,
    approx_ctx: dict | None = None,
    db_index=None,                 # lut.dbindex.DbIndex (-use_index)
    q_allowed: np.ndarray | None = None,   # bool[Qcap], indexed mode
    _raw: bool = False,   # return pre-replay hit arrays (two templates)
) -> InitHits:
    """Streamed seeding over the whole database; same InitHits contract
    as engine.seeding.run_seeding (asserted equal in tests).

    With ``db_index`` set (-use_index), each block consumes its slice of
    the database word index instead of scanning the block: the index's
    positions partition over the blocks' disjoint global scan-grid
    ownership (word-sorted order survives the stable range filter), so
    the block-wise seed union is exactly the resident indexed set --
    which is itself exactly the scan set (lut/dbindex.py)."""
    span = disc_offsets[-1] + 1 if disc_offsets else lut_word
    plan = _BlockPlan(
        db, block_bases=block_bases, halo=halo, lut_word=span,
        scan_step=scan_step, mask_intervals=mask_intervals,
    )
    idx_slices = None
    q_allowed_dev = None
    if db_index is not None:
        assert disc_offsets is None and db_index.lut_word == lut_word
        idx_slices = _block_index_slices(db, db_index, plan)
        q_allowed_dev = jnp.asarray(q_allowed)
        cmax = 4
        while cmax < max(db_index.max_chain, 1):
            cmax *= 2
    if use_pallas is None:
        # decide off the actual placement of the device arrays: the
        # axon TPU plugin registers itself as the default backend even
        # when computations are routed to CPU (tests)
        use_pallas = (
            next(iter(query_dev.devices())).platform == "tpu"
        )
    m16_dev = jnp.asarray(matrix16)
    table64_dev = None
    query_p = None
    query_nib = None
    if use_pallas:
        from gblastn_tpu.ops.pallas_ungapped import (
            make_table64, prepare_query,
        )
        from gblastn_tpu.ops.seeding import pack_query_nibbles

        table64_dev = jnp.asarray(make_table64(matrix16))
        query_p = jax.jit(prepare_query)(query_dev)
        if disc_offsets is None:
            query_nib = pack_query_nibbles(query_dev)

    n_ctx = len(word_cutoffs)
    ctx_cap = 64
    while ctx_cap < n_ctx:
        ctx_cap *= 2
    ctx_off_np = np.full(ctx_cap + 1, np.iinfo(np.int32).max, np.int32)
    ctx_off_np[: n_ctx + 1] = context_offsets[: n_ctx + 1]
    xdrop_np = np.ones(ctx_cap, np.int32)
    xdrop_np[:n_ctx] = x_dropoffs
    ctx_off_dev = jnp.asarray(ctx_off_np)
    xdrop_dev = jnp.asarray(xdrop_np)

    import os as _os

    phase0 = _os.environ.get("GBLASTN_TPU_PHASE0", "1") != "0"
    alive_cap = max(seed_cap // 8, 4096)
    cap_key = ("stream", plan.s_buf, int(query_host.shape[0]), word_size,
               db_index is not None)
    cached = _CAP_CACHE.get(cap_key)
    if cached:
        hit_cap = max(hit_cap, cached[0])
        seed_cap = max(seed_cap, cached[1])
        if len(cached) > 2:
            alive_cap = max(alive_cap, cached[2])
    caps = [hit_cap, seed_cap, alive_cap]

    # device block cache: the packed block buffers are BATCH-INVARIANT
    # (they depend only on the db and the plan geometry), and the
    # tunnel's ~20 ms/MB upload makes re-shipping them per query batch
    # the whole streamed-path cost. Blocks stay device-resident across
    # batches up to GBLASTN_TPU_STREAM_CACHE_MB of packed bytes
    # (0.25 B/base -- a 3 Gbase db caches in ~750 MB of HBM); past the
    # budget, blocks re-upload per batch (true streaming).
    mi = mask_intervals
    cache_key = (
        plan.B, plan.halo, plan.kmax, getattr(plan, "mcap", 0),
        None if mi is None or not len(mi) else
        (len(mi), int(mi[0][0]), int(mi[-1][1])),
        None if db_index is None else (db_index.lut_word, len(idx_slices[0][0])),
    )
    dev_cache = getattr(db, "_stream_dev_cache", None)
    if dev_cache is None or dev_cache.get("key") != cache_key:
        dev_cache = {"key": cache_key, "blocks": {}, "bytes": 0}
        db._stream_dev_cache = dev_cache
    cache_budget = int(_os.environ.get(
        "GBLASTN_TPU_STREAM_CACHE_MB", "4096"
    )) << 20

    def dev_inputs(k, inputs):
        ent = dev_cache["blocks"].get(k)
        if ent is not None:
            return ent
        buf, ls, le, pos_base, pos_end, (mstarts, mends) = inputs
        if idx_slices is None:
            iw_d = ip_d = None
            idx_bytes = 0
        else:
            wp, pp, _n = idx_slices[k]
            iw_d, ip_d = jnp.asarray(wp), jnp.asarray(pp)
            idx_bytes = wp.nbytes + pp.nbytes
        ent = (
            jnp.asarray(buf), jnp.asarray(ls), jnp.asarray(le),
            jnp.int32(pos_base), jnp.int32(pos_end), int(pos_base),
            jnp.asarray(mstarts) if mstarts is not None else None,
            jnp.asarray(mends) if mends is not None else None,
            iw_d, ip_d,
        )
        if dev_cache["bytes"] + buf.nbytes + idx_bytes <= cache_budget:
            dev_cache["blocks"][k] = ent
            dev_cache["bytes"] += buf.nbytes + idx_bytes
        return ent

    idx_table = 0 if db_index is None else db_index.table_size
    n_scan_q = (
        plan.n_scan if db_index is None
        else int(query_host.shape[0]) - lut_word + 1
    )

    def dispatch(k, inputs):
        (packed_d, ls_d, le_d, pos_base, pos_end, pos_base_s,
         ms_d, me_d, iw_d, ip_d) = dev_inputs(k, inputs)
        if use_pallas:
            return _pallas_block_packed(
                packed_d, ls_d, le_d, lut_offsets_dev,
                (lut_positions_dev if ip_d is None else ip_d),
                query_dev, query_p, query_nib,
                table64_dev, ctx_off_dev, xdrop_dev,
                pos_base, pos_end, ms_d, me_d, q_allowed_dev, iw_d,
                scan_step=scan_step, lut_word=lut_word,
                word_size=word_size, cmax=cmax, n_scan=n_scan_q,
                hit_cap=caps[0], seed_cap=caps[1],
                out_cap=caps[1] // 2, alive_cap=(
                    caps[2] if phase0 and query_nib is not None else 0
                ),
                pos_base_static=pos_base_s,
                disc_offsets=disc_offsets,
                idx_table_size=idx_table,
            )
        return _xla_block_packed(
            packed_d, ls_d, le_d, lut_offsets_dev,
            (lut_positions_dev if ip_d is None else ip_d),
            query_dev, m16_dev, ctx_off_dev, xdrop_dev,
            pos_base, pos_end, ms_d, me_d, q_allowed_dev, iw_d,
            scan_step=scan_step, lut_word=lut_word, word_size=word_size,
            cmax=cmax, n_scan=n_scan_q, hit_cap=caps[0],
            seed_cap=caps[1], out_cap=caps[1] // 2,
            pos_base_static=pos_base_s, disc_offsets=disc_offsets,
            idx_table_size=idx_table,
        )

    per_block: list[dict | None] = [None] * plan.n_blocks
    total_raw = 0

    def collect(k, inputs, out_dev):
        nonlocal total_raw
        while True:
            flat = np.asarray(out_dev)
            cap = (len(flat) - 2) // 6
            n_overflow = int(flat[6 * cap])
            if n_overflow == 0:
                break
            caps[0] *= 2
            caps[1] *= 2
            caps[2] *= 2
            if caps[0] > 1 << 23:
                raise RuntimeError(
                    "streamed seeding capacity overflow did not clear"
                )
            out_dev = dispatch(k, inputs)
        total_raw += int(flat[6 * cap + 1])
        d = flat[3 * cap: 4 * cap]
        sel = np.nonzero(d & 1)[0]
        if not len(sel):
            return
        g0 = plan.slices[k][0]
        qs_s = flat[:cap][sel]
        ss_s = flat[cap: 2 * cap][sel]
        d_s = d[sel]
        l_ext = (d_s >> 4) & 0xFFF
        per_block[k] = {
            "g0": g0,
            "qs": qs_s,
            "ss": ss_s,
            "ctx": np.clip(
                np.searchsorted(ctx_off_np, qs_s, side="right") - 1,
                0, ctx_cap - 1,
            ).astype(np.int32),
            "uq": qs_s - l_ext,
            "us": ss_s - l_ext,
            "ulen": (d_s >> 16) & 0x1FFF,
            "uscore": flat[2 * cap: 3 * cap][sel],
            "bits": (d_s >> 1) & 7,
            "maxl": flat[4 * cap: 5 * cap][sel],
            "maxr": flat[5 * cap: 6 * cap][sel],
        }

    # blocks in flight: deeper pipelining hides the per-block host prep
    # and the tunnel's dispatch/fetch round trips behind device compute
    depth = max(int(_os.environ.get("GBLASTN_TPU_STREAM_DEPTH", "3")), 1)
    with slog.time("device.seeding.stream"):
        pending = []
        for k in range(plan.n_blocks):
            if k in dev_cache["blocks"]:
                # device-resident block from an earlier batch: skip the
                # 32 MB host buffer rebuild entirely (dev_inputs
                # ignores inputs on a cache hit)
                inputs = None
            else:
                inputs = plan.block_inputs(db, k)
                if inputs is None:
                    continue
                if idx_slices is not None and idx_slices[k][2] == 0:
                    continue   # no indexed positions in this block
            pending.append((k, inputs, dispatch(k, inputs)))
            if len(pending) > depth - 1:
                collect(*pending.pop(0))
        for item in pending:
            collect(*item)

    slog.diagnostics.lookup_hits += total_raw
    _CAP_CACHE[cap_key] = (caps[0], caps[1], caps[2])

    blocks = [b for b in per_block if b is not None]
    if not blocks:
        z = np.zeros(0, dtype=np.int32)
        if _raw:
            return (z,) * 7
        return InitHits(z, z, z, z, z, z, z, z)

    def cat(key, base=None):
        if base is None:
            return np.concatenate([b[key] for b in blocks])
        return np.concatenate(
            [b[key].astype(np.int64) + b[base] for b in blocks]
        )

    qs = cat("qs")
    ss_g = cat("ss", "g0")
    ctx = cat("ctx")
    uq = cat("uq").astype(np.int64)
    us_g = cat("us", "g0")
    ulen = cat("ulen").astype(np.int64)
    uscore = cat("uscore").astype(np.int64)
    bits = cat("bits")
    maxl = cat("maxl")
    maxr = cat("maxr")
    slog.diagnostics.init_extends += len(qs)

    # escalation: seeds whose walk stopped at an artificial bound
    # (buffer edge / Pallas WINDOW) rather than a true sequence end
    starts = db.starts
    ends = starts + db.lengths
    oid = np.searchsorted(starts, ss_g, side="right") - 1
    sub_start = starts[oid]
    sub_end = ends[oid]
    Q = len(query_host)
    true_l = np.minimum(qs.astype(np.int64), ss_g - sub_start)
    true_r = np.minimum(Q - qs.astype(np.int64), sub_end - ss_g)
    suspect = (
        ((bits & 1) != 0)
        | (((bits & 2) != 0) & (true_l > maxl))
        | (((bits & 4) != 0) & (true_r > maxr))
    )
    tidx = np.nonzero(suspect)[0]
    if len(tidx):
        with slog.time("host.stream_escalate"):
            n_ctx_real = len(x_dropoffs)
            xd_seed = np.asarray(x_dropoffs)[
                np.clip(ctx[tidx], 0, n_ctx_real - 1)
            ]
            e_q, e_s, e_len, e_score = ungapped_extend_host(
                query_host, matrix16, db.packed,
                sub_start[tidx], sub_end[tidx],
                qs[tidx], ss_g[tidx], xd_seed,
            )
            uq[tidx] = e_q
            us_g[tidx] = e_s
            ulen[tidx] = e_len
            uscore[tidx] = e_score

    if _raw:
        # caller merges hits from another pass (second disc template)
        # before the diagonal replay (run_seeding_two_templates)
        return (
            qs.astype(np.int64), ss_g, np.clip(ctx, 0, n_ctx - 1),
            uq, us_g, ulen, uscore,
        )
    right_run = None
    if window_size > 0:
        if lut_word >= word_size or disc_offsets is not None:
            # na_ungapped.c:512 fast return (see engine.seeding)
            right_run = np.zeros(len(qs), np.int32)
        else:
            right_run = compute_right_runs_packed(
                query_host, db.packed, sub_end, qs, ss_g, word_size,
            )
    return _finish_init_hits(
        qs.astype(np.int64), ss_g, np.clip(ctx, 0, n_ctx - 1),
        uq, us_g, ulen, uscore,
        word_cutoffs, db.starts, word_size,
        window_size=window_size, right_run=right_run,
        scan_range=scan_range,
        concat_qlen=int(context_offsets[n_ctx]) - 2,
        approx_ctx=approx_ctx,
    )
