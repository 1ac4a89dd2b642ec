"""Multi-chip execution: DB-sharded seeding over a device mesh.

TPU-native replacement for the reference's intra-node parallelism
(reference: N CPrelimSearchThreads sharing one BlastSeqSrc iterator +
one mutex-locked HSP stream, /root/reference/c++/src/algo/blast/api/
prelim_stage.cpp:139 and gpu_blast/gpu_blastn_pre_search_engine.cpp:
1244-1248; multi-GPU checkout gpu_blast_multi_gpu_utils.cpp:105-154).

Design (SURVEY.md §5 "distributed communication backend"):
* the packed subject database is sharded by contiguous base ranges over
  a 1-D ``db`` mesh axis (each chip holds one slice + the replicated
  lookup table and query block);
* seeding (scan -> mini-extension -> X-drop ungapped extension) runs
  per shard under ``shard_map`` -- fully data-parallel, no collectives
  in the hot loop;
* each shard emits a fixed-capacity seed tensor; the merge the
  reference does through a locked stream becomes a host gather of the
  per-shard tensors, after which ranking happens once.

Shard layout: every shard holds ``[CTX context | core | CTX lookahead]``
bases. Scan positions cover only the core (each global position is
owned by exactly one shard); the flanking context lets mini-extension
and the ungapped X-drop run across the boundary. Extensions reaching
further than CTX truncate at the shard edge -- the same semantics as
the reference's subject chunk boundaries (DBSEQ_CHUNK_OVERLAP = 100,
blast_engine.c:220-305); CTX defaults to 256, and the later host gapped
stage always sees the whole subject, so only ungapped-cutoff admission
is affected, exactly as in the reference.
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

from gblastn_tpu.ops.seeding import mini_extend, scan_block, ungapped_extend

CTX = 256  # flanking context bases per shard edge


def make_mesh(n_devices: int | None = None, axis: str = "db") -> Mesh:
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
    bases = np.zeros(n_shards, dtype=np.int32)
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


def make_sharded_seeding(
    mesh: Mesh,
    *,
    scan_step: int,
    lut_word: int,
    word_size: int,
    cmax: int,
    n_scan: int,
    chunk: int = 64,
):
    """Build the jitted DB-sharded seeding step.

    Maps (subject2_sh [D,L], valid_sh [D,L], base_off [D], query [Q],
    lut_offsets, lut_positions, matrix16 [16,4], x_drop scalar) to
    per-shard fixed-capacity seed tensors [D, n_scan*cmax]:
    (q_off, s_off_global, ok, q_start_g, s_start_g, length, score).
    """
    axis = mesh.axis_names[0]

    def one_shard(subject2, valid, base, query, lut_off, lut_pos,
                  matrix16, x_drop):
        q_off, s_off, ok, _dropped = scan_block(
            subject2, valid, lut_off, lut_pos,
            scan_step=scan_step, lut_word=lut_word, word_size=word_size,
            cmax=cmax, n_scan=n_scan, pos_base=CTX,
        )
        q_adj, s_adj, ok2 = mini_extend(
            query, subject2, valid, q_off, s_off, ok,
            lut_word=lut_word, word_size=word_size,
        )
        xd = jnp.broadcast_to(x_drop, q_adj.shape)
        uq, us, ulen, uscore, _trunc = ungapped_extend(
            query, subject2, valid, matrix16, q_adj, s_adj, ok2, xd,
            chunk=chunk,
        )
        return (q_adj, s_adj + base, ok2, uq, us + base, ulen, uscore)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis), P(None),
                  P(None), P(None), P(None, None), P()),
        out_specs=(P(axis, None),) * 7,
    )
    def step(sub_sh, val_sh, base_sh, query, lut_off, lut_pos, matrix16,
             x_drop):
        out = one_shard(
            sub_sh[0], val_sh[0], base_sh[0], query, lut_off, lut_pos,
            matrix16, x_drop,
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
    x_drop: int,
    *,
    scan_step: int,
    lut_word: int,
    word_size: int,
    cmax: int = 8,
):
    """Shard, run, and return host seed arrays (q_off, s_off, valid,
    q_start, s_start, length, score) in global subject coordinates,
    concatenated across shards."""
    n = mesh.devices.size
    sub, val, bases, core = shard_subject(subject2, subject_valid, n)
    n_scan = max((core - 1) // scan_step + 1, 1)
    step = make_sharded_seeding(
        mesh, scan_step=scan_step, lut_word=lut_word, word_size=word_size,
        cmax=cmax, n_scan=n_scan,
    )
    out = step(
        jnp.asarray(sub), jnp.asarray(val), jnp.asarray(bases),
        jnp.asarray(query), jnp.asarray(lut_offsets),
        jnp.asarray(lut_positions), jnp.asarray(matrix16),
        jnp.asarray(x_drop, jnp.int32),
    )
    return tuple(np.asarray(o).reshape(-1) for o in out)
