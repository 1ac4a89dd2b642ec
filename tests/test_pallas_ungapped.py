"""Pallas ungapped-extension kernel vs the XLA implementation."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from gblastn_tpu.engine.search import device_matrix16
from gblastn_tpu.ops.pallas_ungapped import (
    WINDOW,
    make_table64,
    ungapped_extend_pallas,
)
from gblastn_tpu.ops.seeding import ungapped_extend


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(515)
    S = 20000
    subject = rng.integers(0, 4, S).astype(np.int8)
    # query: 3 contexts worth of material copied from the subject with
    # mutations, sentinel-separated
    parts = [np.full(1, 15, np.uint8)]
    anchors = []
    cursor = 1
    for start, length in [(3000, 800), (9000, 400), (15000, 1200)]:
        seg = subject[start: start + length].astype(np.uint8).copy()
        for p in np.flatnonzero(rng.random(length) < 0.03):
            seg[p] = (seg[p] + 1) % 4
        anchors.append((cursor, start, length))
        parts.append(seg)
        parts.append(np.full(1, 15, np.uint8))
        cursor += length + 1
    query = np.concatenate(parts)
    mat = device_matrix16(1, -2)
    return query, subject, mat, anchors


def gather_seeds(anchors, rng, n_per=30):
    q_off, s_off = [], []
    for qc, sc, length in anchors:
        offs = rng.integers(28, length - 28, n_per)
        for o in offs:
            q_off.append(qc + o)
            s_off.append(sc + o)
    return np.array(q_off, np.int32), np.array(s_off, np.int32)


def test_pallas_matches_xla(problem):
    query, subject, mat, anchors = problem
    rng = np.random.default_rng(8)
    q_off, s_off = gather_seeds(anchors, rng)
    n = len(q_off)
    cap = 128
    pad = cap - n % cap if n % cap else 0
    q_off = np.concatenate([q_off, np.zeros(pad, np.int32)])
    s_off = np.concatenate([s_off, np.zeros(pad, np.int32)])
    valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    xd = np.full(len(q_off), 22, np.int32)

    ref = ungapped_extend(
        jnp.asarray(query), jnp.asarray(subject),
        jnp.asarray(np.ones(len(subject), bool)), jnp.asarray(mat),
        jnp.asarray(q_off), jnp.asarray(s_off), jnp.asarray(valid),
        jnp.asarray(xd),
    )
    got = ungapped_extend_pallas(
        jnp.asarray(query), jnp.asarray(subject),
        jnp.asarray(make_table64(mat)),
        jnp.asarray(q_off), jnp.asarray(s_off), jnp.asarray(valid),
        jnp.asarray(xd),
        jnp.asarray(s_off),                       # whole-buffer subject
        jnp.asarray(len(subject) - s_off),
        interpret=True,
    )
    names = ["q_start", "s_start", "length", "score"]
    for k in range(4):
        np.testing.assert_array_equal(
            np.asarray(got[k])[:n], np.asarray(ref[k])[:n],
            err_msg=names[k],
        )
    # bit 0 = WINDOW overrun; higher bits are bound-stop info only
    assert not (np.asarray(got[4])[:n] & 1).any()


def test_pallas_subject_boundary_clamp(problem):
    query, subject, mat, anchors = problem
    # pretend the subject ends 10 bases right of the seed: the clamp
    # must stop the extension there
    qc, sc, length = anchors[0]
    q_off = np.array([qc + 100], np.int32)
    s_off = np.array([sc + 100], np.int32)
    valid = np.array([True])
    xd = np.array([22], np.int32)
    got = ungapped_extend_pallas(
        jnp.asarray(query), jnp.asarray(subject),
        jnp.asarray(make_table64(mat)),
        jnp.asarray(q_off), jnp.asarray(s_off), jnp.asarray(valid),
        jnp.asarray(xd),
        jnp.asarray(np.array([5], np.int32)),
        jnp.asarray(np.array([10], np.int32)),
        interpret=True,
    )
    ln = int(np.asarray(got[2])[0])
    assert ln <= 15
    assert int(np.asarray(got[3])[0]) <= 15


def test_pallas_truncation_flag(problem):
    query, subject, mat, anchors = problem
    # a seed inside a long exact run > WINDOW: plant one
    rng = np.random.default_rng(99)
    S2 = WINDOW * 4
    subj = rng.integers(0, 4, S2).astype(np.int8)
    q = np.concatenate([
        np.full(1, 15, np.uint8),
        subj[100: 100 + 2 * WINDOW + 500].astype(np.uint8),
        np.full(1, 15, np.uint8),
    ])
    # seed near the start: the right extension has > WINDOW live steps
    q_off = np.array([1 + 50], np.int32)
    s_off = np.array([100 + 50], np.int32)
    got = ungapped_extend_pallas(
        jnp.asarray(q), jnp.asarray(subj),
        jnp.asarray(make_table64(mat)),
        jnp.asarray(q_off), jnp.asarray(s_off),
        jnp.asarray(np.array([True])),
        jnp.asarray(np.array([22], np.int32)),
        jnp.asarray(s_off), jnp.asarray(S2 - s_off),
        interpret=True,
    )
    assert bool(np.asarray(got[4])[0] & 1)


def test_lane_chunking_matches_single_call(problem, monkeypatch):
    """n > MAX_LANES splits into multiple pallas calls (SMEM limit on
    scalar-prefetch arrays); results must equal the unchunked path."""
    import gblastn_tpu.ops.pallas_ungapped as pu

    query, subject, mat, anchors = problem
    rng = np.random.default_rng(77)
    q_off, s_off = gather_seeds(anchors, rng, n_per=6)
    n = len(q_off)
    pad = (-n) % 128
    q_off = np.concatenate([q_off, np.zeros(pad, np.int32)])
    s_off = np.concatenate([s_off, np.zeros(pad, np.int32)])
    valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    xd = np.full(len(q_off), 22, np.int32)
    args = (
        jnp.asarray(query), jnp.asarray(subject),
        jnp.asarray(make_table64(mat)),
        jnp.asarray(q_off), jnp.asarray(s_off), jnp.asarray(valid),
        jnp.asarray(xd), jnp.asarray(s_off),
        jnp.asarray(len(subject) - s_off),
    )
    ref = ungapped_extend_pallas(*args, interpret=True)
    monkeypatch.setattr(pu, "MAX_LANES", 16)
    got = pu.ungapped_extend_pallas(*args, interpret=True)
    for k in range(5):
        np.testing.assert_array_equal(
            np.asarray(got[k])[:n], np.asarray(ref[k])[:n]
        )
