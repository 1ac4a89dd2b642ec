"""Multi-chip execution: DB-sharded seeding over a device mesh.

TPU-native replacement for the reference's intra-node parallelism
(reference: N CPrelimSearchThreads sharing one BlastSeqSrc iterator +
one mutex-locked HSP stream, /root/reference/c++/src/algo/blast/api/
prelim_stage.cpp:139 and gpu_blast/gpu_blastn_pre_search_engine.cpp:
1244-1248; multi-GPU checkout gpu_blast_multi_gpu_utils.cpp:105-154).

Design (SURVEY.md §5 "distributed communication backend"):
* the subject database is sharded by contiguous base ranges over a 1-D
  ``db`` mesh axis (each chip holds one slice + the replicated lookup
  table and query block);
* the full seeding stage (scan -> seed compaction -> mini-extension ->
  survivor compaction -> X-drop ungapped extension) runs per shard
  under ``shard_map`` — fully data-parallel, no collectives in the hot
  loop.  On TPU the ungapped stage is the Pallas window kernel, exactly
  as on the single-chip path;
* each shard emits a device-compacted fixed-capacity seed tensor
  [D, out_cap] (not the dense [D, n_scan*cmax] fan-out); the merge the
  reference does through a locked stream becomes one gather of those
  small tensors, after which ranking happens once.  Under
  ``jax.distributed`` (multi-host) the gather is a DCN
  ``process_allgather`` of the same compacted tensors;
* per-shard overflow counters propagate to the host, which doubles the
  capacities and retries — the same escalation contract as the
  single-chip path;
* scan positions keep the GLOBAL stride phase (each global stride
  position is owned by exactly one shard), so the seed set is identical
  to the single-chip scan;
* extensions that stop at a shard-buffer edge (or the Pallas WINDOW)
  rather than a true sequence end are re-extended exactly on the host,
  so shard boundaries cause NO admission drift (the reference truncates
  at its chunk overlap instead, blast_engine.c:220-305).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.4.35 exports shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

from gblastn_tpu.ops.seeding import (
    block_arrays,
    seeding_scan_mini,
    ungapped_extend,
)

CTX = 1024  # flanking context bases per shard edge (extensions running
            # past it escalate to the exact host extension)


def init_distributed() -> None:
    """Initialize ``jax.distributed`` for multi-host (DCN) meshes.

    Env contract (idempotent; a no-op when unset or already live):
      GBLASTN_TPU_COORDINATOR=host:port   coordinator address
      GBLASTN_TPU_NUM_PROCESSES=N         world size
      GBLASTN_TPU_PROCESS_ID=i            this host's rank
    On TPU pods with standard launchers, plain
    ``jax.distributed.initialize()`` autodetects instead (pass
    GBLASTN_TPU_COORDINATOR=auto). After init, ``jax.devices()``
    is the GLOBAL device list and make_mesh spans hosts; the
    per-shard seed gather rides DCN via process_allgather
    (run_sharded_seeding).
    """
    import os

    coord = os.environ.get("GBLASTN_TPU_COORDINATOR")
    if not coord:
        return
    if getattr(init_distributed, "_done", False):
        return
    if coord == "auto":
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["GBLASTN_TPU_NUM_PROCESSES"]),
            process_id=int(os.environ["GBLASTN_TPU_PROCESS_ID"]),
        )
    init_distributed._done = True


def _put(arr, mesh: Mesh, spec: P):
    """Device-put a host array with an explicit mesh sharding.

    Single-process: plain upload (jit shards it). Multi-host: every
    process holds the full host array (shards are cheap relative to
    the packed DB), so the global array is assembled per-shard via
    make_array_from_callback."""
    if jax.process_count() == 1:
        return jnp.asarray(arr)
    sharding = jax.sharding.NamedSharding(mesh, spec)
    a = np.asarray(arr)
    return jax.make_array_from_callback(
        a.shape, sharding, lambda idx: a[idx]
    )


def make_mesh(n_devices: int | None = None, axis: str = "db") -> Mesh:
    init_distributed()
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        # fall back to the virtual CPU mesh (xla_force_host_platform_
        # device_count) when the accelerator platform has too few chips
        cpu = jax.devices("cpu")
        if len(cpu) >= n:
            devs = cpu
    if len(devs) < n:
        raise ValueError(f"need {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]), (axis,))


def shard_subject(
    subject2: np.ndarray,
    subject_valid: np.ndarray,
    n_shards: int,
    ctx: int = CTX,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Split the subject code array into equal shards with flanking
    context. Returns (subject2_sh [D, L], valid_sh [D, L],
    base_offsets [D], core) with L = ctx + core + ctx; local position p
    maps to global base_offsets[d] + p (front context of shard 0 is
    invalid padding)."""
    S = len(subject2)
    core = -(-S // n_shards)  # ceil
    L = ctx + core + ctx
    sub = np.zeros((n_shards, L), dtype=subject2.dtype)
    val = np.zeros((n_shards, L), dtype=bool)
    bases = np.zeros(n_shards, dtype=np.int64)
    for d in range(n_shards):
        a = d * core - ctx          # global start of the local window
        b = min(a + L, S)
        lo = max(a, 0)
        off = lo - a                # leading pad when a < 0
        if lo < S:
            sub[d, off: off + b - lo] = subject2[lo:b]
            val[d, off: off + b - lo] = subject_valid[lo:b]
        bases[d] = a
    return sub, val, bases, core


def shard_subject_packed(
    packed: np.ndarray,
    S: int,
    n_shards: int,
    ctx: int = CTX,
) -> tuple[np.ndarray, np.ndarray, int, int]:
    """Split the 2-bit PACKED buffer into per-shard byte windows
    (0.25 B/base -- the persistent device form; int8 codes and the
    validity mask derive in-program under shard_map, mirroring the
    resident path packed-only residency). Returns
    (packed_sh [D, L//4] uint8, base_offsets [D], core, L)."""
    core = -(-S // n_shards)
    core += (-core) % 4                 # byte-aligned shard starts
    L = ctx + core + ctx                # ctx is a multiple of 4
    if L >= 2**31:
        raise ValueError(
            f"shard window of {L} bases exceeds int32 scan "
            "coordinates; raise GBLASTN_TPU_SHARDS"
        )
    nb = len(packed)
    out = np.zeros((n_shards, L // 4), dtype=np.uint8)
    bases = np.zeros(n_shards, dtype=np.int64)
    for d in range(n_shards):
        a = d * core - ctx
        bases[d] = a
        ab = a // 4
        bb = min(ab + L // 4, nb)
        lo = max(ab, 0)
        off = lo - ab
        if lo < nb:
            out[d, off: off + bb - lo] = packed[lo:bb]
    return out, bases, core, L


def _shard_bounds(
    subject_starts: np.ndarray,
    subject_lengths: np.ndarray,
    bases: np.ndarray,
    L: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Buffer-local (clipped int32) subject intervals per shard, padded
    to a common power-of-two K with INT32_MAX (sorted)."""
    starts = np.asarray(subject_starts, dtype=np.int64)
    ends = starts + np.asarray(subject_lengths, dtype=np.int64)
    slices = []
    kmax = 1
    for g0 in bases:
        a = int(np.searchsorted(ends, g0, side="right"))
        b = int(np.searchsorted(starts, g0 + L, side="left"))
        slices.append((a, b))
        kmax = max(kmax, b - a)
    k = 16
    while k < kmax:
        k *= 2
    clip = 1 << 30
    ls = np.full((len(bases), k), np.iinfo(np.int32).max, np.int32)
    le = np.full((len(bases), k), np.iinfo(np.int32).max, np.int32)
    for d, (a, b) in enumerate(slices):
        if b > a:
            ls[d, : b - a] = np.clip(starts[a:b] - bases[d], -clip, clip)
            le[d, : b - a] = np.clip(ends[a:b] - bases[d], -clip, clip)
    return ls, le


def _shard_masks(
    mask_intervals: np.ndarray | None,
    bases: np.ndarray,
    L: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-shard buffer-local soft-mask interval arrays [D, M] (sorted,
    padded with a large sentinel); trivial all-sentinel arrays when no
    masking is requested, so the compiled step has ONE code path."""
    D = len(bases)
    clip = 1 << 30
    if mask_intervals is None or len(mask_intervals) == 0:
        ms = np.full((D, 16), clip, np.int32)
        return ms, ms.copy()
    mi = np.asarray(mask_intervals, np.int64)
    slices = []
    mmax = 1
    for g0 in bases:
        lo = int(np.searchsorted(mi[:, 1], max(int(g0), 0), "right"))
        hi = int(np.searchsorted(mi[:, 0], int(g0) + L, "left"))
        slices.append((lo, hi))
        mmax = max(mmax, hi - lo)
    m = 16
    while m < mmax:
        m *= 2
    ms = np.full((D, m), clip, np.int32)
    me = np.full((D, m), clip, np.int32)
    for d, (lo, hi) in enumerate(slices):
        if hi > lo:
            ms[d, : hi - lo] = np.clip(mi[lo:hi, 0] - bases[d],
                                       -clip, clip)
            me[d, : hi - lo] = np.clip(mi[lo:hi, 1] - bases[d],
                                       -clip, clip)
    return ms, me


@functools.lru_cache(maxsize=64)
def make_sharded_seeding(
    mesh: Mesh,
    *,
    scan_step: int,
    lut_word: int,
    word_size: int,
    cmax: int,
    n_scan: int,
    hit_cap: int,
    seed_cap: int,
    out_cap: int,
    use_pallas: bool,
    chunk: int = 64,
    disc_offsets: tuple[int, ...] | None = None,
    idx_table_size: int = 0,   # > 0: indexed megablast (-use_index)
    packed_mode: bool = False,
):
    """Build the jitted DB-sharded seeding step.

    Maps (subject2_sh [D,L], valid_sh [D,L], local_starts/ends [D,K],
    pos_base/pos_end [D], query [Q], score data, ctx_offsets, x_dropoffs)
    to device-compacted per-shard tensors [D, out_cap]:
    (q_off, s_off_local, ok, ctx, q_start, s_start, length, score,
    bound_bits, max_l, max_r) plus [D] overflow/raw counters.

    With ``idx_table_size`` > 0, ``lut_pos`` carries each shard's slice
    of the DATABASE index ([D, P] local positions; ``lut_off`` the
    word-sorted codes [D, P]) and ``q_allowed`` replaces the subject
    scan with the indexed query walk (ops.seeding.indexed_scan_block) --
    the per-shard sub-indices partition the global index over the
    shards' disjoint scan-grid ownership, so the merged seed set is
    bit-identical to the resident indexed path."""
    axis = mesh.axis_names[0]
    indexed = idx_table_size > 0

    def one_shard(subject2, valid, ls, le, pos_base, pos_end, ms, me,
                  query, lut_off, lut_pos, ctx_off, xdrops, score_data,
                  q_allowed=None):
        if packed_mode:
            # the persistent device array is the 2-bit packed window;
            # int8 codes + validity derive in-program (the resident
            # path's packed-only residency, per shard)
            subject2, valid = block_arrays(subject2, ls, le)
        if indexed:
            from gblastn_tpu.engine.seeding import offsets_on_device

            lut_off = offsets_on_device(lut_off, idx_table_size)
        (qs, ss, ok, ctx, xd, max_l, max_r, n_ov, n_raw,
         _nh, _ns) = seeding_scan_mini(
            subject2, valid, lut_off, lut_pos, query, ctx_off, xdrops,
            ls, le, pos_base, pos_end, ms, me, q_allowed=q_allowed,
            scan_step=scan_step, lut_word=lut_word, word_size=word_size,
            cmax=cmax, n_scan=n_scan, hit_cap=hit_cap, seed_cap=seed_cap,
            out_cap=out_cap, disc_offsets=disc_offsets,
        )
        if use_pallas:
            from gblastn_tpu.ops.pallas_ungapped import (
                prepare_subject,
                ungapped_extend_pallas_prepared,
            )

            query_p, table64 = score_data
            sub_p = prepare_subject(subject2)
            uq, us, ulen, uscore, bits = ungapped_extend_pallas_prepared(
                (query_p, sub_p), table64, qs, ss, ok, xd, max_l, max_r,
            )
        else:
            (matrix16,) = score_data
            uq, us, ulen, uscore, _t, bl, br = ungapped_extend(
                query, subject2, valid, matrix16, qs, ss, ok, xd,
                chunk=chunk, return_bounds=True,
            )
            bits = bl.astype(jnp.int32) * 2 + br.astype(jnp.int32) * 4
        return (qs, ss, ok.astype(jnp.int32), ctx, uq, us, ulen, uscore,
                bits.astype(jnp.int32), max_l, max_r,
                n_ov[None], n_raw[None])

    score_spec = (
        (P(None, None), P(None)) if use_pallas else (P(None, None),)
    )
    lut_spec = (
        (P(axis, None), P(axis, None)) if indexed
        else (P(None), P(None))
    )

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None),
                  P(axis, None), P(axis), P(axis), P(axis, None),
                  P(axis, None), P(None)) + lut_spec + (
                  P(None), P(None), score_spec)
                 + ((P(None),) if indexed else ()),
        out_specs=(P(axis, None),) * 11 + (P(axis), P(axis)),
    )
    def step(sub_sh, val_sh, ls_sh, le_sh, pos_base, pos_end,
             ms_sh, me_sh, query, lut_off, lut_pos, ctx_off, xdrops,
             score_data, *qal):
        out = one_shard(
            sub_sh[0], val_sh[0], ls_sh[0], le_sh[0],
            pos_base[0], pos_end[0], ms_sh[0], me_sh[0],
            query,
            lut_off[0] if indexed else lut_off,
            lut_pos[0] if indexed else lut_pos,
            ctx_off, xdrops, score_data,
            q_allowed=qal[0] if indexed else None,
        )
        return tuple(o[None] for o in out)

    return jax.jit(step)


def run_sharded_seeding(
    mesh: Mesh,
    subject2: np.ndarray,
    subject_valid: np.ndarray,
    query: np.ndarray,
    lut_offsets: np.ndarray,
    lut_positions: np.ndarray,
    matrix16: np.ndarray,
    *,
    subject_starts: np.ndarray,
    subject_lengths: np.ndarray,
    ctx_offsets: np.ndarray,     # int32[n_ctx + 1]
    x_dropoffs: np.ndarray,      # int32[n_ctx] per-context raw X-drop
    scan_step: int,
    lut_word: int,
    word_size: int,
    cmax: int = 8,
    hit_cap: int = 16384,
    seed_cap: int = 16384,
    use_pallas: bool | None = None,
    mask_intervals: np.ndarray | None = None,  # int64[n, 2] absolute
    disc_offsets: tuple[int, ...] | None = None,
    db_index=None,                # lut.dbindex.DbIndex (-use_index)
    q_allowed: np.ndarray | None = None,   # bool[Q], indexed mode
    packed: np.ndarray | None = None,      # uint8[S/4] 2-bit buffer
    device_cache: dict | None = None,      # per-DB persistent arrays
):
    """Shard, run, retry on overflow, escalate edge truncations, and
    return exact host seed arrays (q_off, s_off int64 global, ctx,
    q_start, s_start, length, score), compacted (valid seeds only).

    With ``packed`` (and optionally ``device_cache``), each shard's
    persistent device array is its 2-bit PACKED window, uploaded ONCE
    per (db, mesh) and cached across query batches -- int8 codes and
    validity derive in-program under shard_map (the packed-only
    residency of the resident path; reference: per-GPU cached device
    subject arrays, gpu_blastn_MB_and_smallNa.cu:63-152). Without it,
    the legacy unpacked upload runs per call."""
    from gblastn_tpu.utils.profiling import slog

    n = mesh.devices.size
    packed_mode = packed is not None
    S_total = len(subject2)
    if packed_mode:
        ck = ("packed_shards", n, S_total, CTX)
        cached = (device_cache or {}).get(ck)
        if cached is None:
            sub_np, bases, core, L = shard_subject_packed(
                packed, S_total, n
            )
            sub_dev = _put(sub_np, mesh, P(mesh.axis_names[0], None))
            val_dev = _put(
                np.zeros((n, 8), np.uint8), mesh,
                P(mesh.axis_names[0], None),
            )
            cached = (sub_dev, val_dev, bases, core, L)
            if device_cache is not None:
                device_cache[ck] = cached
        sub_dev, val_dev, bases, core, L = cached
    else:
        sub, val, bases, core = shard_subject(
            subject2, subject_valid, n
        )
        L = sub.shape[1]
        if L >= 2**31:
            raise ValueError(
                f"shard window of {L} bases exceeds int32 scan "
                "coordinates; raise GBLASTN_TPU_SHARDS"
            )
    ls, le = _shard_bounds(subject_starts, subject_lengths, bases, L)
    if use_pallas is None:
        use_pallas = mesh.devices.flat[0].platform == "tpu"

    S = len(subject2)
    span = disc_offsets[-1] + 1 if disc_offsets else lut_word
    npos = S - span + 1
    pos_base = np.zeros(n, np.int32)
    pos_end = np.zeros(n, np.int32)
    for d in range(n):
        p_lo = ((d * core + scan_step - 1) // scan_step) * scan_step
        p_hi = min((d + 1) * core, npos)
        pos_base[d] = p_lo - bases[d]
        pos_end[d] = max(p_hi - bases[d], pos_base[d])
    n_scan = core // scan_step + 1

    idx_table_size = 0
    if db_index is not None:
        # indexed megablast: slice the database index over the shards'
        # disjoint global scan-grid ownership (the same [d*core,
        # (d+1)*core) partition the scan's pos_base/pos_end encode);
        # stable range filtering keeps word-sorted order, so per-shard
        # offsets rebuild on device exactly as on the resident path
        idx_table_size = db_index.table_size
        n_scan = len(query) - lut_word + 1
        cmax = 4
        while cmax < max(db_index.max_chain, 1):
            cmax *= 2
        posg = db_index.positions.astype(np.int64)
        sel = []
        pmax = 1
        for d in range(n):
            lo = ((d * core + scan_step - 1) // scan_step) * scan_step
            hi = min((d + 1) * core, npos)
            m = (posg >= lo) & (posg < hi)
            sel.append(m)
            pmax = max(pmax, int(m.sum()))
        pcap = 1024
        while pcap < pmax:
            pcap *= 2
        idx_w = np.full((n, pcap), idx_table_size, np.int32)
        idx_p = np.zeros((n, pcap), np.int32)
        for d, m in enumerate(sel):
            k = int(m.sum())
            idx_w[d, :k] = db_index.words[m]
            idx_p[d, :k] = (posg[m] - bases[d]).astype(np.int32)
        lut_offsets, lut_positions = idx_w, idx_p

    if use_pallas:
        from gblastn_tpu.ops.pallas_ungapped import (
            make_table64, prepare_query,
        )

        score_data = (
            jax.jit(prepare_query)(jnp.asarray(query)),
            jnp.asarray(make_table64(matrix16)),
        )
    else:
        score_data = (jnp.asarray(matrix16),)

    axis = mesh.axis_names[0]
    if jax.process_count() > 1:  # pragma: no cover - multi-host only
        score_data = tuple(
            _put(np.asarray(s), mesh, P()) for s in score_data
        )
    ms, me = _shard_masks(mask_intervals, bases, L)
    lut_sp = P(axis, None) if db_index is not None else P()
    if packed_mode:
        sub_arg, val_arg = sub_dev, val_dev
    else:
        sub_arg = _put(sub, mesh, P(axis, None))
        val_arg = _put(val, mesh, P(axis, None))
    args = (
        sub_arg, val_arg,
        _put(ls, mesh, P(axis, None)), _put(le, mesh, P(axis, None)),
        _put(pos_base, mesh, P(axis)), _put(pos_end, mesh, P(axis)),
        _put(ms, mesh, P(axis, None)), _put(me, mesh, P(axis, None)),
        _put(query, mesh, P()), _put(lut_offsets, mesh, lut_sp),
        _put(lut_positions, mesh, lut_sp),
        _put(ctx_offsets, mesh, P()),
        _put(x_dropoffs, mesh, P()), score_data,
    )
    if db_index is not None:
        args = args + (_put(np.asarray(q_allowed), mesh, P()),)

    while True:
        step = make_sharded_seeding(
            mesh, scan_step=scan_step, lut_word=lut_word,
            word_size=word_size, cmax=cmax, n_scan=n_scan,
            hit_cap=hit_cap, seed_cap=seed_cap, out_cap=seed_cap // 2,
            use_pallas=use_pallas, disc_offsets=disc_offsets,
            idx_table_size=idx_table_size, packed_mode=packed_mode,
        )
        out = step(*args)
        if jax.process_count() > 1:  # pragma: no cover - multi-host
            from jax.experimental import multihost_utils

            # tiled: the per-shard rows concatenate along axis 0 into
            # the same [D, cap] layout the single-process path sees
            host = [
                np.asarray(
                    multihost_utils.process_allgather(o, tiled=True)
                )
                for o in out
            ]
        else:
            host = [np.asarray(o) for o in out]
        if int(host[11].max()) == 0:
            break
        hit_cap *= 2
        seed_cap *= 2
        if hit_cap > 1 << 23:
            raise RuntimeError(
                "sharded seeding capacity overflow did not clear"
            )
    slog.diagnostics.lookup_hits += int(host[12].sum())

    (qs, ss, okm, ctx, uq, us, ulen, uscore, bits, maxl, maxr) = host[:11]
    ok = okm.astype(bool)
    d_idx, lane = np.nonzero(ok)
    base_of = bases[d_idx]
    qs = qs[d_idx, lane].astype(np.int64)
    ss_g = ss[d_idx, lane].astype(np.int64) + base_of
    ctx = ctx[d_idx, lane]
    uq = uq[d_idx, lane].astype(np.int64)
    us_g = us[d_idx, lane].astype(np.int64) + base_of
    ulen = ulen[d_idx, lane].astype(np.int64)
    uscore = uscore[d_idx, lane].astype(np.int64)
    bits = bits[d_idx, lane]
    maxl = maxl[d_idx, lane].astype(np.int64)
    maxr = maxr[d_idx, lane].astype(np.int64)

    # exact escalation of artificial-bound stops (shard edge / WINDOW)
    starts = np.asarray(subject_starts, dtype=np.int64)
    ends = starts + np.asarray(subject_lengths, dtype=np.int64)
    oid = np.searchsorted(starts, ss_g, side="right") - 1
    Q = len(query)
    true_l = np.minimum(qs, ss_g - starts[oid])
    true_r = np.minimum(Q - qs, ends[oid] - ss_g)
    suspect = (
        ((bits & 1) != 0)
        | (((bits & 2) != 0) & (true_l > maxl))
        | (((bits & 4) != 0) & (true_r > maxr))
    )
    tidx = np.nonzero(suspect)[0]
    if len(tidx):
        with slog.time("host.shard_escalate"):
            n_ctx = len(x_dropoffs)
            xd_seed = np.asarray(x_dropoffs)[
                np.clip(ctx[tidx], 0, n_ctx - 1)
            ]
            e_q, e_s, e_len, e_score = _host_extend_arrays(
                np.asarray(query), matrix16, subject2, subject_valid,
                starts[oid[tidx]], ends[oid[tidx]],
                qs[tidx], ss_g[tidx], xd_seed,
            )
            uq[tidx] = e_q
            us_g[tidx] = e_s
            ulen[tidx] = e_len
            uscore[tidx] = e_score
    return qs, ss_g, ctx, uq, us_g, ulen, uscore


def _host_extend_arrays(
    query, matrix16, subject2, subject_valid,
    sub_start, sub_end, q_off, s_off, x_drop,
):
    """Exact host X-drop extension over the unpacked subject arrays
    (the sharded-path twin of engine.stream.ungapped_extend_host)."""
    from gblastn_tpu.engine.stream import _xdrop_dir_host

    Q = len(query)
    n = len(q_off)
    uq = np.zeros(n, np.int64)
    us = np.zeros(n, np.int64)
    ulen = np.zeros(n, np.int64)
    uscore = np.zeros(n, np.int64)
    m16 = matrix16.astype(np.int64)
    s2 = subject2.astype(np.int64)
    for i in range(n):
        qo = int(q_off[i])
        so = int(s_off[i])
        x = int(x_drop[i])
        max_l = min(qo, so - int(sub_start[i]))
        max_r = min(Q - qo, int(sub_end[i]) - so)

        def fetch_l(base, k, qo=qo, so=so):
            qseg = query[qo - base - k: qo - base][::-1].astype(np.int64)
            sseg = s2[so - base - k: so - base][::-1]
            return m16[qseg, sseg]

        def fetch_r(base, k, qo=qo, so=so):
            qseg = query[qo + base: qo + base + k].astype(np.int64)
            sseg = s2[so + base: so + base + k]
            return m16[qseg, sseg]

        l_best, l_pos = _xdrop_dir_host(fetch_l, max_l, x)
        r_best, r_pos = _xdrop_dir_host(fetch_r, max_r, x)
        uq[i] = qo - l_pos
        us[i] = so - l_pos
        ulen[i] = l_pos + r_pos
        uscore[i] = l_best + r_best
    return uq, us, ulen, uscore
