"""End-to-end nucleotide search: the TPU analog of CLocalBlast::Run.

Pipeline (reference: /root/reference/c++/src/algo/blast/api/local_blast.cpp:172
and core/blast_engine.c):

  query block -> lookup table -> derived params
    -> device seeding (scan / mini-ext / X-drop ungapped; gblastn_tpu.ops)
    -> host prelim gapped extension (greedy score-only)
    -> per-query hitlist collection (hitlist_size capping)
    -> traceback (greedy with traceback + ambiguity rescoring)
    -> per-query e-value ranking.

Coordinates in the returned HSPs are context-local (query) and
subject-local; the formatter converts to 1-based plus-strand output.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from gblastn_tpu.engine.gapped import run_gapped_prelim
from gblastn_tpu.engine.seeding import (
    SeedingDeviceData,
    allowed_bits,
    run_seeding,
)
from gblastn_tpu.hits import (
    HSPList,
    HitList,
    hitlist_update,
    sort_by_evalue,
    sort_hsplists_by_evalue,
)
from gblastn_tpu.io.fasta import FastaRecord
from gblastn_tpu.io.query import QueryBlock, build_query_block
from gblastn_tpu.io.seqdb import SequenceDB
from gblastn_tpu.lut.builder import build_lookup_table, unmasked_locations
from gblastn_tpu.params.derived import SearchParams, derive_params
from gblastn_tpu.params.options import SearchOptions
from gblastn_tpu.stats.karlin import nucl_score_matrix
from gblastn_tpu.traceback.stage import traceback_from_hsplist
from gblastn_tpu.utils.profiling import slog

NEG_CLIP = -(1 << 24)


def device_matrix16(reward: int, penalty: int) -> np.ndarray:
    """BLASTNA x 2na score submatrix, sentinel rows clipped so int32
    accumulation in the device X-drop scan cannot overflow."""
    m = nucl_score_matrix(reward, penalty)[:, :4].astype(np.int64)
    return np.clip(m, NEG_CLIP, None).astype(np.int32)


def _pad_lut_host(lut):
    """(pos_padded, pw_padded) host arrays for a CSR table, padded to a
    pow2 bucket (shape-stable kernels). pw pad slots carry table_size
    so the on-device offsets rebuild drops them (mode='drop')."""
    positions = (
        lut.positions if len(lut.positions) else np.zeros(1, np.int32)
    )
    pcap = 1024
    while pcap < len(positions):
        pcap *= 2
    pos_padded = np.zeros(pcap, dtype=np.int32)
    pos_padded[: len(positions)] = positions
    pw_padded = None
    if lut.position_words is not None:
        pw_padded = np.full(pcap, lut.table_size, dtype=np.int32)
        pw_padded[: len(lut.positions)] = lut.position_words
    return pos_padded, pw_padded


def _upload_lut(lut):
    """(lut_offsets_dev, pos_padded) device upload for a CSR table.

    The dense offsets table at lut width 12 is 4^12+1 int32 = 67MB --
    uploading it per batch costs more than the whole device stage over
    the tunnel, so on accelerators the O(n_positions) word codes ship
    instead and the table is rebuilt on device."""
    pos_padded, pw_padded = _pad_lut_host(lut)
    if jax.default_backend() != "cpu" and pw_padded is not None:
        from gblastn_tpu.engine.seeding import offsets_on_device

        lut_offsets_dev = offsets_on_device(
            jnp.asarray(pw_padded), lut.table_size
        )
    else:
        lut_offsets_dev = jnp.asarray(lut.counts_offsets)
    return lut_offsets_dev, pos_padded


def _second_template_dev(dev, lut2):
    """SeedingDeviceData sharing the subject/query device arrays but
    carrying the second disc template's CSR table."""
    import dataclasses as _dc

    if dev.host_qbuf is not None:
        # blob path: the table ships inside the batch blob
        from gblastn_tpu.engine.seeding import allowed_bits

        return _dc.replace(
            dev,
            lut_pos_host=allowed_bits(
                lut2.positions, len(dev.host_qbuf)
            ),
            lut_n_pos=len(lut2.positions),
            lut_table_size=lut2.table_size,
        )
    offs, pos_padded = _upload_lut(lut2)
    return _dc.replace(
        dev, lut_offsets=offs, lut_positions=jnp.asarray(pos_padded)
    )


def _build_gapped_filter(qblock, params, db, device_arrays=None):
    """Device banded-DP gapped pre-filter context, or None when off.

    GBLASTN_TPU_GAPPED_FILTER: auto (default: on when the backend is a
    TPU), 1 (force), 0 (off), interpret (Pallas interpret mode, for
    CPU equivalence tests). Queries longer than the kernel's row budget
    disable the filter (every candidate would flag FLAG_ROWS and fall
    back to host anyway)."""
    import os

    mode = os.environ.get("GBLASTN_TPU_GAPPED_FILTER", "auto")
    interpret = mode == "interpret"
    if mode in ("0", "off"):
        return None
    if mode == "auto":
        # gate on where the seeding arrays actually live, not on the
        # registered backend (the axon plugin registers itself even
        # when computations are routed to CPU -- CLAUDE.md notes)
        if device_arrays is None:
            return None
        if next(iter(device_arrays.devices())).platform != "tpu":
            return None
    if not params.options.gapped:
        return None

    from gblastn_tpu.engine.gapped import build_device_gapped

    maxlen = max((c.length for c in qblock.contexts), default=0)
    rows = 256
    while rows < maxlen + 192:
        rows *= 2
    if rows > 4096:
        return None
    # the fused-direction operand addresses the reversed half at
    # offset ~len(fwd); starts must stay below 2^31 (int32 prefetch)
    if 2 * (db.padded_length + rows + 16384) >= 2**31:
        return None

    cache = getattr(db, "_gapped_subject_cache", None)
    if cache is None or cache[0] != rows:
        from gblastn_tpu.ops.pallas_gapped import prepare_gapped_subject

        with slog.time("setup.gapped_subject"):
            sub_ops = prepare_gapped_subject(
                jnp.asarray(db.unpacked().astype(np.int8)), rows
            )
            jax.block_until_ready(sub_ops[0])
        cache = (rows, sub_ops)
        db._gapped_subject_cache = cache
    # s_len is the length of the array the padded forms were built
    # from (reversed-offset mapping), i.e. the padded buffer
    return build_device_gapped(
        qblock, params, cache[1], rows, db.padded_length,
        interpret=interpret,
    )


def _warn_once(db, key: str, msg: str) -> None:
    import sys

    seen = getattr(db, "_warned", None)
    if seen is None:
        seen = set()
        db._warned = seen
    if key not in seen:
        seen.add(key)
        print(f"gblastn_tpu: {msg}", file=sys.stderr)


def _resolve_db_index(db, options):
    """Load + validate the -use_index database index, or None.

    The loaded index is cached on the db object; every reason to fall
    back to the scan path is warned once per database (the reference
    treats a missing index the same way, CIndexedDbException handling
    in mb_indexed_lookup.c)."""
    if not options.use_index:
        return None
    from gblastn_tpu.lut.dbindex import (
        INDEX_SUFFIX,
        index_compatible,
        load_db_index,
    )

    cached = getattr(db, "_db_index_cache", None)
    if cached is None:
        name = options.index_name or getattr(db, "_source_path", None)
        if name is None:
            _warn_once(db, "idx", "-use_index: no -index_name and the "
                       "database has no on-disk path; scanning instead")
            db._db_index_cache = False
            return None
        try:
            cached = load_db_index(str(name))
        except FileNotFoundError:
            _warn_once(
                db, "idx",
                f"-use_index: index {name}{INDEX_SUFFIX} not found "
                "(build one with makembindex); scanning instead",
            )
            cached = False
        except Exception as e:  # malformed file
            _warn_once(db, "idx", f"-use_index: cannot load index: {e}; "
                       "scanning instead")
            cached = False
        db._db_index_cache = cached
    if cached is False:
        return None
    reason = index_compatible(cached, db, options.word_size)
    if reason is not None:
        _warn_once(db, "idx", f"-use_index: {reason}; scanning instead")
        return None
    return cached


@dataclass
class QueryResult:
    """Finished results for one query: HSP lists by subject, ranked."""

    query_index: int
    hsplists: list[HSPList] = field(default_factory=list)


@dataclass
class BlastResults:
    qblock: QueryBlock
    params: SearchParams
    queries: list[QueryResult] = field(default_factory=list)
    # per-context inclusive (from, to) masked ranges in concatenated-
    # buffer coordinates (dust/windowmasker/lcase/repeats), or None
    masks: list[list[tuple[int, int]]] | None = None


@dataclass
class PrelimResult:
    """Handoff between the prelim stage and traceback (the HSP stream
    boundary of the reference, CLocalBlast::PrelimSearchRun ->
    TraceBackRun split added by G-BLASTN, local_blast.cpp:293/:383)."""

    qblock: QueryBlock
    params: SearchParams
    hitlists: list[HitList]
    masks: list[list[tuple[int, int]]] | None = None


def prelim_search(
    records: list[FastaRecord],
    db: SequenceDB,
    options: SearchOptions,
    interrupt_fn=None,
) -> PrelimResult:
    """Device seeding + host prelim gapped stage + hitlist collection.

    ``interrupt_fn`` (optional, () -> bool) is polled at stage
    boundaries; returning True raises SearchInterrupted (the
    TInterruptFnPtr contract, utils.interrupt)."""
    gen = prelim_search_steps(records, db, options, interrupt_fn)
    try:
        while True:
            next(gen)
    except StopIteration as e:
        return e.value


def prelim_search_steps(
    records: list[FastaRecord],
    db: SequenceDB,
    options: SearchOptions,
    interrupt_fn=None,
):
    """Generator form of prelim_search: yields exactly ONCE, right
    after the device seeding chain is DISPATCHED (resident TPU path) --
    nothing has been fetched yet, so a pipelining caller can run host
    work for the previous batch while the device executes
    (engine.pipeline). Other device paths yield before their compute.
    The PrelimResult arrives as StopIteration.value."""
    from gblastn_tpu.utils.cache import enable_compilation_cache
    from gblastn_tpu.utils.interrupt import check

    enable_compilation_cache()
    options.validate()
    check(interrupt_fn)
    with slog.time("setup.query_block"):
        qblock = build_query_block(records, options.strand)
    ctx_offsets = qblock.context_offsets()
    ctx_lengths = [c.length for c in qblock.contexts]

    loc_ranges = None       # per-context clamped -query_loc (a, b)
    if options.query_loc is not None:
        # -query_loc: statistics use the restricted range lengths (the
        # reference's BlastQueryInfo context lengths are range lengths)
        a0, b0 = options.query_loc
        loc_ranges = []
        for c in qblock.contexts:
            a = min(max(a0, 0), c.length)
            b = min(max(b0, a), c.length)
            loc_ranges.append((a, b))
        params = derive_params(
            options, [b - a for a, b in loc_ranges],
            db.total_length, db.num_seqs,
        )
    else:
        params = derive_params(
            options, ctx_lengths, db.total_length, db.num_seqs
        )

    masks = None
    if options.dust:
        from gblastn_tpu.masking.dust import query_dust_masks

        with slog.time("setup.dust"):
            masks = query_dust_masks(
                qblock, options.dust_level, options.dust_window,
                options.dust_linker, query_loc=options.query_loc,
            )
    if options.window_masker_db:
        from gblastn_tpu.masking.winmask import (
            WindowMaskerStats,
            query_window_masks,
        )

        with slog.time("setup.window_masker"):
            stats = WindowMaskerStats.load(options.window_masker_db)
            wm_masks = query_window_masks(qblock, stats)
        if masks is None:
            masks = wm_masks
        else:
            masks = [
                sorted(a + b) for a, b in zip(masks, wm_masks)
            ]
    if options.lcase_masking:
        from gblastn_tpu.masking.lcase import query_lcase_masks

        lc_masks = query_lcase_masks(qblock, records)
        if masks is None:
            masks = lc_masks
        else:
            masks = [
                sorted(a + b) for a, b in zip(masks, lc_masks)
            ]
    if options.filtering_db:
        from gblastn_tpu.masking.repeats import (
            load_repeat_db,
            query_repeat_masks,
        )

        with slog.time("setup.repeat_filter"):
            rep_masks = query_repeat_masks(
                qblock, records, load_repeat_db(options.filtering_db)
            )
        if masks is None:
            masks = rep_masks
        else:
            masks = [
                sorted(a + b) for a, b in zip(masks, rep_masks)
            ]
    if loc_ranges is not None:
        # sentinel-fence the range: bases outside [start, stop) become
        # sentinels, so seeding skips them and every extension stops at
        # the range edge exactly like a context boundary -- coordinates
        # stay full-sequence, as the reference reports them
        for c, (a, b) in zip(qblock.contexts, loc_ranges):
            L = c.length
            lo, hi = (a, b) if c.frame >= 0 else (L - b, L - a)
            qblock.buffer[c.offset: c.offset + lo] = 15
            qblock.buffer[c.offset + hi: c.offset + L] = 15

    locations = unmasked_locations(qblock.buffer, ctx_offsets, masks)

    if masks is not None and not options.mask_at_hash:
        # -soft_masking false: render masked bases as N for the whole
        # search (BlastSetUp_MaskQuery, blast_filter.c:991); the
        # original letters stay available as buffer_nomask for identity
        # counts (sequence_nomask) and report display
        qblock.buffer_nomask = qblock.buffer.copy()
        for ctx_masks in masks:
            for a, b in ctx_masks:
                qblock.buffer[a: b + 1] = 14

    # indexed megablast (-use_index): resolve the database index before
    # the lookup table so the LUT width can be forced to the index's
    # (the seed set is bit-identical to a scan at that width; see
    # lut/dbindex.py). Unusable index -> warn once and scan normally.
    db_index = _resolve_db_index(db, options)
    if db_index is not None and options.template_length:
        _warn_once(
            db, "idx-disc",
            "-use_index does not apply to discontiguous megablast; "
            "scanning instead",
        )
        db_index = None

    lut2 = None   # second-template table (coding_and_optimal)
    with slog.time("setup.lookup_table"):
        if options.template_length:
            from gblastn_tpu.lut.builder import build_disc_lookup_table

            lut = build_disc_lookup_table(
                qblock.buffer, locations, options.word_size,
                options.template_length,
                "coding" if options.template_type == "coding_and_optimal"
                else options.template_type,
            )
            if options.template_type == "coding_and_optimal":
                lut2 = build_disc_lookup_table(
                    qblock.buffer, locations, options.word_size,
                    options.template_length, "optimal",
                )
        else:
            lut = build_lookup_table(
                qblock.buffer, locations, options.word_size,
                db_index.lut_word if db_index is not None
                else options.lut_word_size
            )

    n_ctx = len(qblock.contexts)
    word_cutoffs = np.array(
        [params.contexts[c].word_cutoff_score for c in range(n_ctx)],
        dtype=np.int32,
    )
    x_dropoffs = np.array(
        [params.contexts[c].x_dropoff_ungapped for c in range(n_ctx)],
        dtype=np.int32,
    )

    # pad the per-batch device arrays to bucketed sizes so consecutive
    # batches reuse compiled kernels (shape-stable XLA programs); the
    # pad region is sentinel bytes / never-indexed positions
    qbuf = qblock.buffer
    qcap = 32768
    while qcap < len(qbuf):
        qcap *= 2
    qbuf_padded = np.full(qcap, 15, dtype=np.uint8)
    qbuf_padded[: len(qbuf)] = qbuf
    pos_padded, pw_padded = _pad_lut_host(lut)
    # device LUT upload is lazy: the TPU resident path ships the LUT
    # inside the single batch blob instead (engine.seeding), so only
    # the streamed / indexed / CPU paths pay the separate upload
    _lut_dev: list = []

    def _lut_dev_get():
        if not _lut_dev:
            _lut_dev.append(_upload_lut(lut))
        return _lut_dev[0]

    m16 = device_matrix16(options.reward, options.penalty)
    # lazy query upload: the TPU blob path ships the query inside the
    # batch blob, so the separate 1MB-class transfer only happens for
    # the streamed / indexed / CPU paths (or a phase-2 escalation)
    _qdev: list = []

    def _qdev_get():
        if not _qdev:
            _qdev.append(jnp.asarray(qbuf_padded))
        return _qdev[0]

    # the LUT builder knows the longest chain, so the scan's per-word
    # fan-out capacity never needs the overflow-retry recompile; bucket
    # to powers of two to bound the number of compiled variants
    cmax = 4
    while cmax < max(lut.max_positions_per_word, 1):
        cmax *= 2
    if lut2 is not None:
        # two-template disc: both templates run at the wider capacity
        while cmax < max(lut2.max_positions_per_word, 1):
            cmax *= 2

    import os

    try:
        n_shards = int(os.environ.get("GBLASTN_TPU_SHARDS", "0"))
    except ValueError:
        import sys

        print("gblastn_tpu: ignoring non-numeric GBLASTN_TPU_SHARDS",
              file=sys.stderr)
        n_shards = 0
    if (n_shards == 0 and jax.default_backend() == "tpu"
            and len(jax.devices()) > 1):
        n_shards = len(jax.devices())
    avail = len(jax.devices())
    if n_shards > avail:
        # explicit GBLASTN_TPU_SHARDS above the accelerator count:
        # fall back to the virtual CPU mesh (the same fallback
        # make_mesh applies), so forced sharding works on the
        # 8-device CPU test mesh where jax.devices() is the single
        # tunnel TPU
        try:
            avail = max(avail, len(jax.devices("cpu")))
        except RuntimeError:
            pass
    n_shards = min(n_shards, avail)

    # subject streaming: above the threshold the DB no longer fits
    # device-resident and blocks are streamed through a fixed buffer
    # instead (engine.stream). With packed-only residency (0.25 B/base
    # persistent; transient ~3 B/base per dispatch) a 1 Gbase database
    # is comfortably resident; past 2^31 bases the scan's int32
    # coordinates force streaming regardless (block-local coords).
    stream_env = os.environ.get("GBLASTN_TPU_STREAM", "")
    stream_threshold = int(
        os.environ.get("GBLASTN_TPU_STREAM_THRESHOLD", str(1 << 30))
    )
    stream_threshold = min(stream_threshold, (1 << 31) - (1 << 20))
    use_stream = (
        n_shards <= 1
        and stream_env != "0"
        and (stream_env == "1" or db.padded_length > stream_threshold)
    )
    # database-side masking (-db_soft_mask / -db_hard_mask): masked
    # subject ranges are excluded from scanning; hard masking also
    # renders them as N on the host re-evaluation path (masksubj.inl
    # s_DetermineScanningOffsets semantics)
    db_mask_ivs = None
    if (options.db_soft_mask is not None
            and options.db_hard_mask is not None):
        raise ValueError(
            "-db_soft_mask and -db_hard_mask are mutually exclusive"
        )
    mask_algo = (
        options.db_soft_mask if options.db_soft_mask is not None
        else options.db_hard_mask
    )
    if mask_algo is not None:
        db_mask_ivs = db.mask_intervals(int(mask_algo))
        if options.db_hard_mask is not None:
            db.apply_hard_mask(int(mask_algo))

    mask_starts = mask_ends = None
    if db_mask_ivs is not None and len(db_mask_ivs):
        # bucketed int32 (starts, ends) with a huge sorted sentinel so
        # the compiled scan variant count stays logarithmic in M
        m = 16
        while m < len(db_mask_ivs):
            m *= 2
        sent = np.iinfo(np.int32).max - 64
        mask_starts = np.full(m, sent, np.int32)
        mask_ends = np.full(m, sent, np.int32)
        mask_starts[: len(db_mask_ivs)] = db_mask_ivs[:, 0]
        mask_ends[: len(db_mask_ivs)] = db_mask_ivs[:, 1]

    # approximate-ungapped gate data (s_NuclUngappedExtend semantics):
    # the replays demote exact-passing seeds whose byte-quantized score
    # misses the reduced cutoff, as the reference does for word >= 11
    from gblastn_tpu.params.derived import nucl_score_table_packed

    approx_ctx = {
        "query": qbuf_padded,
        "concat_end": len(qblock.buffer) - 1,
        "packed": db.packed,
        "subject_ends": np.asarray(db.starts)
        + np.asarray(db.lengths),
        "x_dropoffs": x_dropoffs,
        "reduced": np.array(
            [params.contexts[c].reduced_nucl_cutoff
             for c in range(n_ctx)], np.int64,
        ),
        "table": nucl_score_table_packed(
            options.reward, options.penalty
        ),
    }

    device_gapped = None   # banded-DP rejection filter (device path only)
    q_allowed_np = None
    if db_index is not None and (n_shards > 1 or use_stream):
        # streamed/sharded indexed megablast: the index partitions over
        # the blocks'/shards' disjoint scan-grid ownership, so the seed
        # set stays bit-identical to the resident indexed path
        q_allowed_np = np.zeros(qcap, dtype=bool)
        q_allowed_np[lut.positions] = True
    if n_shards > 1:
        # multi-chip: DB-sharded seeding over the device mesh
        from gblastn_tpu.engine.seeding import run_seeding_sharded
        from gblastn_tpu.parallel.dist import make_mesh

        mesh = getattr(db, "_mesh_cache", None)
        if mesh is None or mesh.devices.size != n_shards:
            mesh = make_mesh(n_shards)
            db._mesh_cache = mesh
        shard_kw = dict(
            word_size=lut.word_size,
            subject_starts=db.starts,
            subject_lengths=db.lengths,
            context_offsets=ctx_offsets,
            word_cutoffs=word_cutoffs,
            x_dropoffs=x_dropoffs,
            cmax=cmax,
            window_size=options.window_size,
            scan_range=options.off_diagonal_range,
            mask_intervals=db_mask_ivs,
            approx_ctx=approx_ctx,
            db_index=db_index,
            q_allowed=q_allowed_np,
        )
        # host finishing still reads unpacked codes (replay, right
        # runs); the DEVICE upload is the packed buffer, cached across
        # batches (reference: per-GPU cached device subject arrays,
        # gpu_blastn_MB_and_smallNa.cu:63-152)
        sub2_host = db._cached_fetch(
            ("unpacked_i8",), lambda: db.unpacked().astype(np.int8)
        )
        valid_host = db._cached_fetch(
            ("valid_mask",), db.valid_mask
        )
        shard_cache = getattr(db, "_shard_device_cache", None)
        if shard_cache is None:
            shard_cache = {}
            db._shard_device_cache = shard_cache
        shard_args = (
            mesh, sub2_host, valid_host, qbuf_padded,
        )
        shard_kw["packed"] = db.packed_padded()
        shard_kw["device_cache"] = shard_cache
        m16_shard = device_matrix16(options.reward, options.penalty)
        yield
        with slog.time("device.seeding"):
            if lut2 is not None:
                from gblastn_tpu.engine.seeding import (
                    merge_two_template_raw,
                )

                raw1 = run_seeding_sharded(
                    *shard_args, lut, m16_shard, _raw=True, **shard_kw,
                )
                raw2 = run_seeding_sharded(
                    *shard_args, lut2, m16_shard, _raw=True, **shard_kw,
                )
                init = merge_two_template_raw(
                    raw1, raw2,
                    word_cutoffs=word_cutoffs,
                    subject_starts=db.starts,
                    word_size=lut.word_size,
                    window_size=options.window_size,
                    scan_range=options.off_diagonal_range,
                    context_offsets=ctx_offsets,
                    approx_ctx=approx_ctx,
                )
            else:
                init = run_seeding_sharded(
                    *shard_args, lut, m16_shard, **shard_kw,
                )
    elif use_stream:
        from gblastn_tpu.engine.stream import run_seeding_streamed

        stream_kw = dict(
            query_dev=_qdev_get(),
            query_host=qbuf_padded,
            matrix16=m16,
            context_offsets=ctx_offsets,
            word_cutoffs=word_cutoffs,
            x_dropoffs=x_dropoffs,
            word_size=lut.word_size,
            lut_word=lut.lut_word_size,
            scan_step=lut.scan_step,
            cmax=cmax,
            window_size=options.window_size,
            scan_range=options.off_diagonal_range,
            approx_ctx=approx_ctx,
            block_bases=int(os.environ.get(
                "GBLASTN_TPU_BLOCK_BASES", str(1 << 27)
            )),
            halo=int(os.environ.get("GBLASTN_TPU_BLOCK_HALO", "4096")),
            mask_intervals=db_mask_ivs,
            db_index=db_index,
            q_allowed=q_allowed_np,
        )
        yield
        with slog.time("device.seeding"):
            if lut2 is not None:
                from gblastn_tpu.engine.seeding import (
                    merge_two_template_raw,
                )

                offs2, pos2 = _upload_lut(lut2)
                raw1 = run_seeding_streamed(
                    db,
                    lut_offsets_dev=_lut_dev_get()[0],
                    lut_positions_dev=jnp.asarray(pos_padded),
                    disc_offsets=lut.disc_offsets,
                    _raw=True, **stream_kw,
                )
                raw2 = run_seeding_streamed(
                    db,
                    lut_offsets_dev=offs2,
                    lut_positions_dev=jnp.asarray(pos2),
                    disc_offsets=lut2.disc_offsets,
                    _raw=True, **stream_kw,
                )
                init = merge_two_template_raw(
                    raw1, raw2,
                    word_cutoffs=word_cutoffs,
                    subject_starts=db.starts,
                    word_size=lut.word_size,
                    window_size=options.window_size,
                    scan_range=options.off_diagonal_range,
                    context_offsets=ctx_offsets,
                    approx_ctx=approx_ctx,
                )
            else:
                init = run_seeding_streamed(
                    db,
                    lut_offsets_dev=_lut_dev_get()[0],
                    lut_positions_dev=jnp.asarray(pos_padded),
                    disc_offsets=lut.disc_offsets,
                    **stream_kw,
                )
    else:
        # the subject arrays are per-database and immutable: upload
        # once and cache on the db object (the role of G-BLASTN's
        # per-oid cached device arrays,
        # gpu_blastn_MB_and_smallNa.cu:63-152). The PERSISTENT tier is
        # the 2-bit packed buffer alone (0.25 B/base; packed_padded is
        # a PAD-aligned heap copy, never the raw memmap -- the CPU
        # backend zero-copy aliases numpy buffers); the blob path
        # derives every other subject form inside the seeding program.
        base_cache = getattr(db, "_device_cache", None)
        if base_cache is None or len(base_cache) != 3:
            with slog.time("setup.subject_upload"):
                base_cache = (
                    jnp.asarray(db.packed_padded()),
                    jnp.asarray(np.asarray(db.starts)),
                    jnp.asarray(
                        np.asarray(db.starts) + np.asarray(db.lengths)
                    ),
                )
                jax.block_until_ready(base_cache)
            db._device_cache = base_cache
        packed_dev, starts_dev, ends_dev = base_cache

        from gblastn_tpu.ops.pallas_ungapped import make_table64
        from gblastn_tpu.ops.seeding import pack_query_nibbles

        # per-(reward, penalty) device score tables, cached per DB so a
        # batch does not pay two tiny uploads (each a tunnel round trip)
        mt_cache = getattr(db, "_matrix_device_cache", None)
        if mt_cache is None:
            mt_cache = {}
            db._matrix_device_cache = mt_cache
        mt_key = (options.reward, options.penalty)
        if mt_key not in mt_cache:
            mt_cache[mt_key] = (
                jnp.asarray(m16), jnp.asarray(make_table64(m16))
            )
        m16_dev, table64_dev = mt_cache[mt_key]

        use_blob = (
            db_index is None
            and pw_padded is not None
            and not os.environ.get("GBLASTN_TPU_FORCE_XLA")
            and (
                next(iter(packed_dev.devices())).platform == "tpu"
                or os.environ.get("GBLASTN_TPU_FORCE_BLOB") == "1"
            )
        )
        # packed-only residency is a TPU HBM optimization; the CPU
        # legs (incl. FORCE_BLOB interpret mode) always materialize
        packed_only = (
            use_blob
            and next(iter(packed_dev.devices())).platform == "tpu"
        )
        mat = (None,) * 4
        if not packed_only:
            # non-blob legs need the materialized subject arrays
            mat = getattr(db, "_device_cache_mat", None)
            if mat is None:
                with slog.time("setup.subject_material"):
                    if next(iter(
                        packed_dev.devices()
                    )).platform == "tpu":
                        # derive on device from the packed tier
                        from gblastn_tpu.engine.seeding import (
                            _derive_material_jit,
                        )

                        mat = _derive_material_jit(
                            packed_dev, starts_dev, ends_dev
                        )
                    else:
                        # CPU: build from host arrays (no HBM to
                        # economize, and the on-device derive program
                        # has destabilized XLA:CPU -- see the blob
                        # fusion note in engine/seeding.py)
                        from gblastn_tpu.ops.pallas_ungapped import (
                            prepare_subject,
                        )
                        from gblastn_tpu.ops.seeding import (
                            pack_subject_words,
                        )

                        sub2 = jnp.asarray(
                            db.unpacked().astype(np.int8)
                        )
                        mat = (
                            sub2,
                            jnp.asarray(db.valid_mask()),
                            pack_subject_words(
                                jnp.asarray(db.packed_padded())
                            ),
                            prepare_subject(sub2),
                        )
                    jax.block_until_ready(mat)
                db._device_cache_mat = mat

        q_allowed_dev = None
        if db_index is not None:
            # database-index device arrays are per-DB immutable: upload
            # once and cache (offsets rebuilt on device from the sorted
            # word codes, as for the query LUT)
            from gblastn_tpu.engine.seeding import offsets_on_device

            idx_dev = getattr(db, "_index_device_cache", None)
            if idx_dev is None:
                with slog.time("setup.index_upload"):
                    if jax.default_backend() != "cpu":
                        idx_offsets_dev = offsets_on_device(
                            jnp.asarray(db_index.words),
                            db_index.table_size,
                        )
                    else:
                        idx_offsets_dev = jnp.asarray(db_index.offsets())
                    idx_dev = (
                        idx_offsets_dev,
                        jnp.asarray(db_index.positions),
                    )
                    jax.block_until_ready(idx_dev)
                db._index_device_cache = idx_dev
            q_allowed_np = np.zeros(qcap, dtype=bool)
            q_allowed_np[lut.positions] = True
            q_allowed_dev = jnp.asarray(q_allowed_np)
            cmax = 4
            while cmax < max(db_index.max_chain, 1):
                cmax *= 2

        dev = SeedingDeviceData(
            query=(None if use_blob else _qdev_get()),
            subject2=mat[0],
            subject_valid=mat[1],
            lut_offsets=(
                idx_dev[0] if db_index is not None
                else None if use_blob else _lut_dev_get()[0]
            ),
            lut_positions=(
                idx_dev[1] if db_index is not None
                else None if use_blob else jnp.asarray(pos_padded)
            ),
            matrix16=m16_dev,
            pallas_subject=mat[3],
            table64=table64_dev,
            query_nib=(
                None if use_blob else pack_query_nibbles(_qdev_get())
            ),
            subject_w=mat[2],
            q_allowed=q_allowed_dev,
            subject_starts_dev=starts_dev,
            subject_ends_dev=ends_dev,
            packed_dev=(packed_dev if packed_only else None),
            host_qbuf=(qbuf_padded if use_blob else None),
            lut_pos_host=(
                allowed_bits(lut.positions, qcap) if use_blob else None
            ),
            lut_n_pos=len(lut.positions),
            lut_table_size=lut.table_size,
        )
        if options.window_size > 0:
            host_sub = getattr(db, "_host_cache", None)
            if host_sub is None:
                host_sub = (db.unpacked().astype(np.int8), db.valid_mask())
                db._host_cache = host_sub
            dev.host_query = qbuf_padded
            dev.host_subject2, dev.host_valid = host_sub

        seed_kw = dict(
            word_size=lut.word_size,
            lut_word=lut.lut_word_size,
            scan_step=lut.scan_step,
            subject_starts=db.starts,
            subject_lengths=db.lengths,
            context_offsets=ctx_offsets,
            word_cutoffs=word_cutoffs,
            x_dropoffs=x_dropoffs,
            cmax=cmax,
            window_size=options.window_size,
            scan_range=options.off_diagonal_range,
            mask_starts=mask_starts,
            mask_ends=mask_ends,
            approx_ctx=approx_ctx,
        )
        with slog.time("device.seeding"):
            if lut2 is not None:
                from gblastn_tpu.engine.seeding import (
                    run_seeding_two_templates,
                )

                dev2 = _second_template_dev(dev, lut2)
                yield
                init = run_seeding_two_templates(
                    dev, dev2, lut.disc_offsets, lut2.disc_offsets,
                    **seed_kw,
                )
            else:
                from gblastn_tpu.engine.seeding import run_seeding_steps

                sgen = run_seeding_steps(
                    dev, disc_offsets=lut.disc_offsets, **seed_kw,
                )
                next(sgen)   # device chain dispatched
                yield        # caller overlap point
                try:
                    while True:
                        next(sgen)
                except StopIteration as e:
                    init = e.value
        # the device band-DP filter costs one ~fixed dispatch (~0.3s
        # over the tunnel); the native host walk extends ~1.4k
        # candidates in that time, so small candidate sets skip the
        # filter entirely (GBLASTN_TPU_GAPPED_FILTER=1 forces it on)
        filter_min = int(os.environ.get(
            "GBLASTN_TPU_GAPPED_FILTER_MIN", "2000"
        ))
        device_gapped = None
        if (len(init) >= filter_min
                or os.environ.get("GBLASTN_TPU_GAPPED_FILTER")
                in ("1", "interpret")):
            device_gapped = _build_gapped_filter(
                qblock, params, db,
                device_arrays=(
                    dev.packed_dev if dev.packed_dev is not None
                    else dev.subject2
                ),
            )
    slog.diagnostics.good_init_extends += len(init)
    check(interrupt_fn)

    if options.gapped:
        with slog.time("host.prelim_gapped"):
            prelim_lists = run_gapped_prelim(
                init, qblock, db.get_sequence_2na_cached, db.starts, params,
                device_gapped=device_gapped,
                subject_lengths=db.lengths,
            )
    else:
        from gblastn_tpu.engine.ungapped import run_ungapped_prelim

        with slog.time("host.prelim_ungapped"):
            prelim_lists = run_ungapped_prelim(
                init, qblock, db.starts, db.lengths, params
            )
    slog.diagnostics.good_gapped += sum(len(l.hsps) for l in prelim_lists)

    # split per-subject lists by query and collect per-query hitlists
    # (the role of the HSP stream writer + Blast_HitListUpdate); the
    # best-hit / culling writers replace the default collector when
    # configured (hspfilter_besthit.c / hspfilter_culling.c)
    hitlist_size = options.max_target_seqs or options.hitlist_size
    hitlists = [
        HitList(hitlist_size=hitlist_size) for _ in range(qblock.num_queries)
    ]
    besthit = culling = None
    if options.best_hit_overhang > 0 or options.best_hit_score_edge > 0:
        from gblastn_tpu.hspfilters import BestHitWriter

        besthit = BestHitWriter(
            qblock.num_queries,
            options.best_hit_overhang or 0.1,
            options.best_hit_score_edge or 0.1,
        )
    elif options.culling_limit > 0:
        from gblastn_tpu.hspfilters import CullingWriter

        culling = CullingWriter(
            len(qblock.contexts), options.culling_limit
        )

    with slog.time("host.collect"):
        if besthit is not None or culling is not None:
            writer = besthit if besthit is not None else culling
            for lst in prelim_lists:
                by_query: dict[int, HSPList] = {}
                for h in lst.hsps:
                    qi = qblock.contexts[h.context].query_index
                    by_query.setdefault(
                        qi, HSPList(oid=lst.oid)
                    ).hsps.append(h)
                for sub in by_query.values():
                    writer.add_hsplist(sub, qblock)
            for qi in range(qblock.num_queries):
                if besthit is not None:
                    kept = besthit.export(qi)
                else:
                    kept = culling.export_query(qblock, qi)
                for sub in kept:
                    from gblastn_tpu.hits import sort_by_score

                    sort_by_score(sub.hsps)
                    hitlist_update(hitlists[qi], sub)
        else:
            for lst in prelim_lists:
                by_query: dict[int, HSPList] = {}
                for h in lst.hsps:
                    qi = qblock.contexts[h.context].query_index
                    by_query.setdefault(
                        qi, HSPList(oid=lst.oid)
                    ).hsps.append(h)
                for qi, sub in by_query.items():
                    hitlist_update(hitlists[qi], sub)

    return PrelimResult(qblock=qblock, params=params, hitlists=hitlists,
                        masks=masks)


def finish_search(
    prelim: PrelimResult,
    db: SequenceDB,
    options: SearchOptions,
    interrupt_fn=None,
) -> BlastResults:
    """Traceback + final ranking over a prelim result."""
    from gblastn_tpu.utils.interrupt import check

    qblock = prelim.qblock
    params = prelim.params
    hitlists = prelim.hitlists
    hitlist_size = options.max_target_seqs or options.hitlist_size

    matrix = nucl_score_matrix(options.reward, options.penalty)
    results = BlastResults(qblock=qblock, params=params,
                           masks=prelim.masks)
    subj_cache: dict[int, np.ndarray] = {}

    def _finish_one(lst):
        if options.gapped:
            traceback_from_hsplist(
                lst, qblock, subj_cache[lst.oid], matrix, params
            )
        else:
            from gblastn_tpu.engine.ungapped import (
                finish_ungapped_hsplist,
            )

            finish_ungapped_hsplist(
                lst, qblock, subj_cache[lst.oid], matrix,
                params, int(db.lengths[lst.oid]),
            )

    nthreads = max(int(getattr(options, "num_threads", 1) or 1), 1)
    with slog.time("host.traceback"):
        if nthreads > 1:
            # -num_threads: per-HSPList traceback fan-out (the role of
            # the reference's traceback worker threads,
            # gpu_blast/work_thread.cpp:86-107). The native aligners
            # run through ctypes, which releases the GIL for the
            # duration of each C call, so Python threads genuinely
            # overlap the C work; results are deterministic because
            # each task mutates only its own HSPList and assembly
            # happens in the original order below. Subjects prefetch
            # serially first (the cache dict is not thread-safe).
            from concurrent.futures import ThreadPoolExecutor

            all_lists = []
            for hl in hitlists:
                for lst in hl.hsplists:
                    if lst.oid not in subj_cache:
                        subj_cache[lst.oid] = (
                            db.get_sequence_blastna_cached(lst.oid)
                        )
                    all_lists.append(lst)
            check(interrupt_fn)
            with ThreadPoolExecutor(max_workers=nthreads) as pool:
                list(pool.map(_finish_one, all_lists))
        for qi, hl in enumerate(hitlists):
            check(interrupt_fn)
            qres = QueryResult(query_index=qi)
            for lst in hl.hsplists:
                if nthreads <= 1:
                    if lst.oid not in subj_cache:
                        subj_cache[lst.oid] = (
                            db.get_sequence_blastna_cached(lst.oid)
                        )
                    _finish_one(lst)
                if lst.hsps:
                    qres.hsplists.append(lst)
            # final ranking (Blast_HSPResultsSortByEvalue)
            for lst in qres.hsplists:
                sort_by_evalue(lst.hsps)
                lst.best_evalue = min(h.evalue for h in lst.hsps)
            sort_hsplists_by_evalue(qres.hsplists)
            del qres.hsplists[hitlist_size:]
            slog.diagnostics.final_hsps += sum(
                len(l.hsps) for l in qres.hsplists
            )
            results.queries.append(qres)
    return results


def search(
    records: list[FastaRecord],
    db: SequenceDB,
    options: SearchOptions,
    interrupt_fn=None,
) -> BlastResults:
    """Run a complete gapped nucleotide search end to end.

    Queries longer than the task chunk size are transparently split
    into overlapping chunks and the results stitched back
    (engine.split, the role of split_query_cxx.cpp)."""
    from gblastn_tpu.engine.split import (
        chunk_size_for_task,
        merge_chunk_prelim,
        overlap_size,
        split_records,
    )

    chunk = chunk_size_for_task(options.task.value)
    recs2, info, any_split = split_records(
        records, chunk, overlap_size()
    )
    if not any_split:
        return finish_search(
            prelim_search(records, db, options, interrupt_fn),
            db, options, interrupt_fn,
        )

    # merge at the PRELIM stage (BlastHSPStreamMerge semantics): chunk
    # HSPs remap to original coordinates, boundary HSPs concatenate,
    # and the traceback runs over the ORIGINAL query block so merged
    # boxes re-extend exactly as unsplit ones (blast_hits.c:2545)
    sub = prelim_search(recs2, db, options, interrupt_fn)
    qblock_orig = build_query_block(records, options.strand)
    n_ctx_per_query = 2 if options.strand == "both" else 1
    hitlist_size = options.max_target_seqs or options.hitlist_size
    params_orig = derive_params(
        options, [c.length for c in qblock_orig.contexts],
        db.total_length, db.num_seqs,
    )
    merged = merge_chunk_prelim(
        sub, info, len(records), n_ctx_per_query,
        qblock_orig, params_orig, options.gapped, overlap_size(),
        hitlist_size,
    )
    return finish_search(merged, db, options, interrupt_fn)
