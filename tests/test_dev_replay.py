"""Device two-hit replay + device approx-ungapped gate vs host twins.

The device ops reimplement, as data-parallel XLA programs, the two
sequential host stages that dense-seed (blastn word-11) batches
round-trip ~1M lanes to the host for:

- ``ops.seeding.diag_replay_device`` twins the per-diagonal replay
  ``engine.seeding.two_hit_diag_filter`` (reference
  s_BlastnDiagTableExtendInitialHit, na_ungapped.c:612-755).
- ``ops.seeding.approx_gate_device`` twins the approximate-ungapped
  demotion gate ``engine.approx.compute_approx_info`` (reference
  s_NuclUngappedExtend, na_ungapped.c:263), clamped: seeds whose walk
  does not resolve within the clamp are reported unresolved and the
  engine falls back to the host gate.

Both must be bit-exact where they claim resolution -- these tests fuzz
them against the host oracles.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from gblastn_tpu.engine.approx import compute_approx_info
from gblastn_tpu.engine.seeding import (
    diag_table_mask,
    two_hit_diag_filter,
)
from gblastn_tpu.io.encoding import pack_2na
from gblastn_tpu.ops.seeding import (
    approx_gate_device,
    pack_subject_words,
    diag_replay_device,
)
from gblastn_tpu.params.derived import nucl_score_table_packed


def make_qbytes(query: np.ndarray) -> np.ndarray:
    """Truncated-byte packing of query codes at every buffer position
    (the C's 4-codes-per-byte with ambiguity overflow bleeding into
    neighboring slots, engine.approx.approx_ungapped_one)."""
    q = query.astype(np.int32)
    return (
        (q[:-3] << 6) | (q[1:-2] << 4) | (q[2:-1] << 2) | q[3:]
    ) & 0xFF


def random_two_hit_case(rng, n_lanes, *, n_oid=3, window=40, word=11,
                        chain_max=30, diag_mask=0):
    starts = np.array([0, 50_000, 121_000], np.int64)[:n_oid]
    qs = np.zeros(n_lanes, np.int32)
    ss = np.zeros(n_lanes, np.int32)
    oid = np.zeros(n_lanes, np.int32)
    ok = rng.random(n_lanes) < 0.8
    i = 0
    while i < n_lanes:
        # a chain of seeds sharing one (oid, diag): spacing around the
        # window so pair admissions, skips, and resets all occur
        o = int(rng.integers(0, n_oid))
        d = int(rng.integers(0, 3000))
        q0 = int(rng.integers(1, 500))
        ln = int(rng.integers(1, chain_max))
        s = q0 + d
        for _ in range(min(ln, n_lanes - i)):
            qs[i] = s - d
            ss[i] = s + starts[o]
            oid[i] = o
            i += 1
            s += int(rng.integers(1, window + word))
    perm = rng.permutation(n_lanes)
    qs, ss, oid, ok = qs[perm], ss[perm], oid[perm], ok[perm]
    rr = rng.integers(0, word + 4, n_lanes).astype(np.int32)
    rr[rng.random(n_lanes) < 0.1] = word  # double words
    cutoff = np.full(n_lanes, 22, np.int32)
    score = rng.integers(0, 44, n_lanes).astype(np.int32)
    l_ext = rng.integers(0, 10, n_lanes).astype(np.int32)
    length = (l_ext + word + rng.integers(0, 40, n_lanes)).astype(
        np.int32
    )
    ug_s = ss - l_ext
    ug_end = ug_s + length
    base = starts[oid]
    s_loc = (ss - base).astype(np.int32)
    ug_s_loc = (ug_s - base).astype(np.int32)
    host = dict(q_off=qs, s_off=s_loc, oid=oid,
                ung_s_start=ug_s_loc, ung_length=length,
                ung_score=score, cutoff=cutoff, right_run=rr)
    dev = (qs, ss, ok, rr, oid, ug_end.astype(np.int32), score, cutoff)
    return host, dev, ok


class TestTwoHitReplayDevice:
    def _compare(self, rng, n_lanes, window, word, diag_mask, **kw):
        host, dev, ok = random_two_hit_case(
            rng, n_lanes, window=window, word=word,
            diag_mask=diag_mask, **kw,
        )
        # the host filter sees only valid lanes (the engine replays
        # post-compaction); the device filter masks them via ok
        keep = np.nonzero(ok)[0]
        saved_host = np.zeros(n_lanes, bool)
        saved_host[keep] = two_hit_diag_filter(
            host["q_off"][keep], host["s_off"][keep],
            host["oid"][keep], word, window,
            host["ung_s_start"][keep], host["ung_length"][keep],
            host["ung_score"][keep], host["cutoff"][keep],
            host["right_run"][keep],
            use_native=False, diag_mask=diag_mask,
        )
        args = tuple(jnp.asarray(a) for a in dev)
        saved_dev, n_ovf = diag_replay_device(
            *args, word_size=word, window=window, diag_mask=diag_mask,
        )
        assert int(n_ovf) == 0
        np.testing.assert_array_equal(np.asarray(saved_dev), saved_host)

    def test_parity_unmasked(self):
        rng = np.random.default_rng(711)
        for trial in range(6):
            self._compare(rng, 2048, 40, 11, 0)

    def test_parity_masked_aliasing(self):
        # a tiny pow2 mask forces distinct diagonals into the same
        # congruence class (blast_extend.c:57), the replay must alias
        rng = np.random.default_rng(712)
        for trial in range(6):
            self._compare(rng, 2048, 40, 11, 127)

    def test_parity_real_mask_and_word28(self):
        rng = np.random.default_rng(713)
        m = diag_table_mask(4000, 40)
        self._compare(rng, 4096, 40, 28, m)
        self._compare(rng, 4096, 16, 11, m)

    def test_long_chains_exercise_long_tier(self):
        # chains well beyond short_waves=8 must route to the long tier
        # and stay bit-exact
        rng = np.random.default_rng(714)
        self._compare(rng, 4096, 40, 11, 0, chain_max=200, n_oid=1)

    def test_big_invalid_tail_no_spurious_overflow(self):
        # the engine calls with [seed_cap]-padded arrays where only a
        # few leading lanes are real; pos_in_seg counts into the
        # invalid tail after the last head, which must NOT read as a
        # too-long segment (regression: n_overflow was spuriously 1)
        rng = np.random.default_rng(716)
        host, dev, ok = random_two_hit_case(
            rng, 300, window=40, word=11,
        )
        pad = 16384 - 300
        dev_p = tuple(
            np.concatenate([a, np.zeros(pad, a.dtype)]) for a in dev
        )
        args = list(jnp.asarray(a) for a in dev_p)
        args[2] = jnp.concatenate(
            [jnp.asarray(dev[2]), jnp.zeros(pad, bool)]
        )
        saved_dev, n_ovf = diag_replay_device(
            *args, word_size=11, window=40, diag_mask=2047,
        )
        assert int(n_ovf) == 0
        keep = np.nonzero(ok)[0]
        saved_host = np.zeros(300, bool)
        saved_host[keep] = two_hit_diag_filter(
            host["q_off"][keep], host["s_off"][keep],
            host["oid"][keep], 11, 40,
            host["ung_s_start"][keep], host["ung_length"][keep],
            host["ung_score"][keep], host["cutoff"][keep],
            host["right_run"][keep],
            use_native=False, diag_mask=2047,
        )
        np.testing.assert_array_equal(
            np.asarray(saved_dev)[:300], saved_host
        )
        assert not np.asarray(saved_dev)[300:].any()

    def test_dense_perfect_match_chains(self):
        # a perfect query-long match emits one seed per position:
        # ~1500 seeds spacing 1 on ONE diagonal (the config-2 bench
        # shape). The jump tier must replay it within the default
        # long_jump_cap (~len/word jumps) -- this overflowed the old
        # positional-wave tier at 1024
        rng = np.random.default_rng(717)
        n = 4096
        qs = np.zeros(n, np.int32)
        ss = np.zeros(n, np.int32)
        oid = np.zeros(n, np.int32)
        i = 0
        d = 7000
        while i < n:
            ln = min(1500, n - i)
            q0 = int(rng.integers(1, 100))
            for t in range(ln):
                qs[i] = q0 + t
                ss[i] = q0 + t + d
                i += 1
            d += 10_000
        ok = np.ones(n, bool)
        rr = np.full(n, 11, np.int32)
        cutoff = np.full(n, 22, np.int32)
        # high scores so saves (jump to ug_end) and skips both occur
        score = rng.integers(0, 44, n).astype(np.int32)
        length = (11 + rng.integers(0, 60, n)).astype(np.int32)
        ug_end = ss + length
        for window in (0, 40):
            saved_host = np.zeros(n, bool)
            if window:
                saved_host = two_hit_diag_filter(
                    qs, ss, oid, 11, window, ss, length, score,
                    cutoff, rr, use_native=False, diag_mask=0,
                )
            else:
                from gblastn_tpu.engine.seeding import (
                    one_hit_diag_filter,
                )
                saved_host = one_hit_diag_filter(
                    qs, ss, oid, 11, ss, length, score, cutoff,
                    use_native=False, diag_mask=0,
                )
            saved_dev, n_ovf = diag_replay_device(
                jnp.asarray(qs), jnp.asarray(ss), jnp.asarray(ok),
                jnp.asarray(rr), jnp.asarray(oid),
                jnp.asarray(ug_end.astype(np.int32)),
                jnp.asarray(score), jnp.asarray(cutoff),
                word_size=11, window=window, diag_mask=0,
            )
            assert int(n_ovf) == 0, window
            np.testing.assert_array_equal(
                np.asarray(saved_dev), saved_host, err_msg=str(window)
            )

    def test_overflow_reported(self):
        rng = np.random.default_rng(715)
        host, dev, ok = random_two_hit_case(
            rng, 2048, window=40, word=11, chain_max=400, n_oid=1,
        )
        args = tuple(jnp.asarray(a) for a in dev)
        _saved, n_ovf = diag_replay_device(
            *args, word_size=11, window=40, diag_mask=0,
            short_waves=4, long_jump_cap=8,
        )
        assert int(n_ovf) > 0


class TestOneHitReplayDevice:
    def _compare(self, rng, n_lanes, word, diag_mask, **kw):
        from gblastn_tpu.engine.seeding import one_hit_diag_filter

        host, dev, ok = random_two_hit_case(
            rng, n_lanes, window=40, word=word,
            diag_mask=diag_mask, **kw,
        )
        keep = np.nonzero(ok)[0]
        saved_host = np.zeros(n_lanes, bool)
        saved_host[keep] = one_hit_diag_filter(
            host["q_off"][keep], host["s_off"][keep],
            host["oid"][keep], word,
            host["ung_s_start"][keep], host["ung_length"][keep],
            host["ung_score"][keep], host["cutoff"][keep],
            use_native=False, diag_mask=diag_mask,
        )
        args = tuple(jnp.asarray(a) for a in dev)
        saved_dev, n_ovf = diag_replay_device(
            *args, word_size=word, window=0, diag_mask=diag_mask,
        )
        assert int(n_ovf) == 0
        np.testing.assert_array_equal(np.asarray(saved_dev), saved_host)

    def test_parity(self):
        rng = np.random.default_rng(720)
        for trial in range(4):
            self._compare(rng, 2048, 28, 0)
            self._compare(rng, 2048, 11, 127)

    def test_long_chains(self):
        rng = np.random.default_rng(721)
        self._compare(rng, 4096, 28, diag_table_mask(4000, 0),
                      chain_max=200, n_oid=1)


class TestApproxGateDevice:
    def _fixture(self, seed, S=6000, Q=3072, n=1200):
        rng = np.random.default_rng(seed)
        sub2 = rng.integers(0, 4, S).astype(np.uint8)
        packed = pack_2na(sub2)
        query = rng.integers(0, 4, Q).astype(np.uint8)
        query[0] = query[-1] = 15
        query[rng.integers(1, Q - 1, 20)] = 14
        for _ in range(30):
            qp = int(rng.integers(64, Q - 400))
            sp = int(rng.integers(64, S - 400))
            L = int(rng.integers(50, 350))
            query[qp: qp + L] = sub2[sp: sp + L]
        q_off = rng.integers(16, Q - 32, n).astype(np.int64)
        s_off = rng.integers(16, S - 32, n).astype(np.int64)
        need = rng.random(n) < 0.9
        table = nucl_score_table_packed(1, -2)
        return sub2, packed, query, q_off, s_off, need, table

    def test_parity_vs_host(self):
        for seed in (823, 824, 825):
            (sub2, packed, query, q_off, s_off, need,
             table) = self._fixture(seed)
            S, Q, n = len(sub2), len(query), len(q_off)
            xd, red = 22, 15
            host = compute_approx_info(
                query, Q - 1, packed,
                np.zeros(n, np.int64), np.full(n, S, np.int64),
                q_off, s_off, np.zeros(n, np.int32),
                np.array([xd], np.int32), np.array([red], np.int64),
                table, need, use_native=False,
            )
            h_dem, h_sc, h_q, h_s, h_r = host
            dem, a_q, a_s, a_end, total, resolved = (
                np.asarray(o) for o in approx_gate_device(
                    jnp.asarray(make_qbytes(query), jnp.int32),
                    pack_subject_words(jnp.asarray(packed)),
                    jnp.asarray(table, jnp.int32),
                    jnp.asarray(q_off, jnp.int32),
                    jnp.asarray(s_off, jnp.int32),
                    jnp.asarray(need),
                    jnp.full(n, xd, jnp.int32),
                    jnp.full(n, red, jnp.int32),
                    jnp.zeros(n, jnp.int32),
                    jnp.full(n, S, jnp.int32),
                    jnp.int32(Q - 1),
                )
            )
            r = resolved & need
            # the clamp must resolve nearly everything on real data
            assert r.sum() > 0.9 * need.sum()
            np.testing.assert_array_equal(dem[r], h_dem[r])
            assert dem.sum() > 0          # non-vacuous
            # demotion requires exactness: the substituted data must
            # match the host walk bit-for-bit
            d = np.nonzero(dem)[0]
            np.testing.assert_array_equal(total[d], h_sc[d])
            np.testing.assert_array_equal(a_q[d], h_q[d])
            np.testing.assert_array_equal(a_s[d], h_s[d])
            np.testing.assert_array_equal(
                a_end[d], h_s[d] + (h_r[d] - h_q[d] + 1)
            )

    def test_unresolved_seeds_fall_back(self):
        # a long perfect repeat defeats the clamp: the walk neither
        # drops nor finishes inside it -> unresolved, never misjudged
        rng = np.random.default_rng(900)
        S = 4096
        sub2 = np.tile(rng.integers(0, 4, 4).astype(np.uint8), S // 4)
        packed = pack_2na(sub2)
        Q = 2048
        query = np.zeros(Q, np.uint8)
        query[0] = query[-1] = 15
        query[1:-1] = np.tile(sub2[:4], (Q - 2) // 4 + 1)[: Q - 2]
        n = 64
        # phase-matched (q_off-1) % 4 == s_off % 4 so the repeat really
        # matches and the walk never drops
        q_off = np.full(n, Q // 2 + 1, np.int64)
        s_off = (np.arange(n) * 8 + S // 2).astype(np.int64)
        need = np.ones(n, bool)
        table = nucl_score_table_packed(1, -2)
        out = approx_gate_device(
            jnp.asarray(make_qbytes(query), jnp.int32),
            pack_subject_words(jnp.asarray(packed)),
            jnp.asarray(table, jnp.int32),
            jnp.asarray(q_off, jnp.int32),
            jnp.asarray(s_off, jnp.int32),
            jnp.asarray(need),
            jnp.full(n, 22, jnp.int32),
            jnp.full(n, 10_000, jnp.int32),   # unreachable cutoff
            jnp.zeros(n, jnp.int32),
            jnp.full(n, S, jnp.int32),
            jnp.int32(Q - 1),
        )
        dem, *_rest, resolved = (np.asarray(o) for o in out)
        assert not resolved.any()
        assert not dem.any()


class TestBeyond2G:
    """Seeds on a single subject PAST 2^31 bases must survive the
    replay: the int32 subject-local cast used to wrap negative and the
    machine skipped every wrapped seed (round-4 config-4 regression:
    zero hits beyond 2^31). The per-(oid, diagonal-class) rebase must
    reproduce the int64 python replay exactly."""

    def test_finish_init_hits_beyond_2g(self):
        from gblastn_tpu.engine.seeding import (
            _finish_init_hits,
            one_hit_diag_filter,
        )

        rng = np.random.default_rng(11)
        n = 400
        base = (1 << 31) + 12345
        # clusters of seeds on shared diagonals around and past 2^31
        qs = rng.integers(100, 30000, n).astype(np.int64)
        diag = rng.integers(0, 8, n) * 1000 + base
        ss = qs + diag
        ctx = np.zeros(n, np.int32)
        ug_q = qs - rng.integers(0, 50, n)
        ug_s = ss - (qs - ug_q)
        ug_len = rng.integers(28, 400, n).astype(np.int64)
        ug_score = rng.integers(0, 60, n).astype(np.int64)
        cutoffs = np.array([20], np.int32)
        starts = np.array([0], np.int64)

        hits = _finish_init_hits(
            qs, ss, ctx, ug_q, ug_s, ug_len, ug_score,
            cutoffs, starts, 28, window_size=0,
            concat_qlen=60000,
        )
        assert len(hits) > 0
        assert int(np.min(hits.s_off)) > (1 << 31)

        # expected: int64 python replay on GLOBAL coordinates
        saved = one_hit_diag_filter(
            qs, ss, np.zeros(n, np.int32), 28,
            ug_s, ug_len, ug_score,
            cutoffs[ctx], use_native=False, diag_mask=0,
        )
        assert len(hits) == int(saved.sum())
        got = set(zip(hits.q_off.tolist(), hits.s_off.tolist()))
        want = set(zip(qs[saved].tolist(), ss[saved].tolist()))
        assert got == want
