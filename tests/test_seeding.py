"""Device seeding stage vs the scalar oracle."""
import numpy as np
import pytest

from oracle_seeding import (
    matrix16x4,
    oracle_mini_extend,
    oracle_scan,
    oracle_seeding_pipeline,
    oracle_ungapped_exact,
)

import jax.numpy as jnp

from gblastn_tpu.engine.seeding import (
    SeedingDeviceData,
    one_hit_diag_filter,
    run_seeding,
)
from gblastn_tpu.io.fasta import FastaRecord
from gblastn_tpu.io.query import build_query_block
from gblastn_tpu.io.seqdb import SequenceDB
from gblastn_tpu.lut.builder import build_lookup_table, unmasked_locations
from gblastn_tpu.ops.seeding import (
    mini_extend,
    scan_block,
    ungapped_extend,
    unpack_2na_device,
)


def _rand_seq(rng, n):
    return "".join("ACGT"[i] for i in rng.integers(0, 4, n))


def _mutate(rng, s, rate):
    out = list(s)
    for i in range(len(out)):
        if rng.random() < rate:
            out[i] = "ACGT"[rng.integers(0, 4)]
    return "".join(out)


def _lut_dict(lut):
    """CSR -> {word: positions} for the oracle."""
    d = {}
    offs = lut.counts_offsets
    for wd in np.nonzero(np.diff(offs))[0]:
        d[int(wd)] = list(lut.positions[offs[wd]:offs[wd + 1]])
    return d


def _setup(rng, query_seqs, subject_seqs, word_size, lut_word):
    qb = build_query_block(
        [FastaRecord(f"q{i}", "", s.encode()) for i, s in enumerate(query_seqs)],
        strand="both",
    )
    db = SequenceDB.from_records(
        [FastaRecord(f"s{i}", "", s.encode()) for i, s in enumerate(subject_seqs)]
    )
    locs = unmasked_locations(qb.buffer, qb.context_offsets())
    lut = build_lookup_table(qb.buffer, locs, word_size, lut_word)
    return qb, db, lut


class TestScan:
    def test_vs_oracle(self):
        rng = np.random.default_rng(7)
        q = _rand_seq(rng, 300)
        s = _rand_seq(rng, 500) + q[50:120] + _rand_seq(rng, 300)
        qb, db, lut = _setup(rng, [q], [s], word_size=12, lut_word=6)
        sub2 = db.unpacked()
        valid = db.valid_mask()

        n_scan = (len(sub2) - lut.lut_word_size) // lut.scan_step + 1
        qo, so, v, dropped, _nh = scan_block(
            jnp.asarray(sub2.astype(np.int8)), jnp.asarray(valid),
            jnp.asarray(lut.counts_offsets), jnp.asarray(lut.positions),
            scan_step=lut.scan_step, lut_word=lut.lut_word_size,
            word_size=lut.word_size, cmax=16, n_scan=n_scan,
        )
        got = set(
            (int(a), int(b))
            for a, b, ok in zip(np.asarray(qo), np.asarray(so), np.asarray(v))
            if ok
        )
        want = set(
            oracle_scan(sub2, valid, _lut_dict(lut), lut.lut_word_size,
                        lut.scan_step)
        )
        assert int(dropped) == 0
        assert got == want
        assert len(want) > 0


class TestMiniExtend:
    def test_vs_oracle(self):
        rng = np.random.default_rng(3)
        q = _rand_seq(rng, 400)
        s = _rand_seq(rng, 200) + _mutate(rng, q, 0.05) + _rand_seq(rng, 100)
        W, w = 16, 8
        qb, db, lut = _setup(rng, [q], [s], W, w)
        sub2 = db.unpacked().astype(np.int8)
        valid = db.valid_mask()
        hits = oracle_scan(sub2, valid, _lut_dict(lut), w, lut.scan_step)
        assert hits
        qo = np.array([h[0] for h in hits], dtype=np.int32)
        so = np.array([h[1] for h in hits], dtype=np.int32)
        v = np.ones(len(hits), dtype=bool)
        qa, sa, ok = mini_extend(
            jnp.asarray(qb.buffer), jnp.asarray(sub2), jnp.asarray(valid),
            jnp.asarray(qo), jnp.asarray(so), jnp.asarray(v),
            lut_word=w, word_size=W,
        )
        qa, sa, ok = np.asarray(qa), np.asarray(sa), np.asarray(ok)
        for i, (q0, s0) in enumerate(hits):
            want = oracle_mini_extend(qb.buffer, sub2, valid, q0, s0, w, W)
            if want is None:
                assert not ok[i], (i, q0, s0)
            else:
                assert ok[i], (i, q0, s0, want)
                assert (qa[i], sa[i]) == want

    def test_subject_boundary_blocks_extension(self):
        # two subjects; a seed at the start of subject 2 must not extend
        # into subject 1's padding
        rng = np.random.default_rng(5)
        core = _rand_seq(rng, 20)
        q = core
        s1 = _rand_seq(rng, 130)
        s2 = core + _rand_seq(rng, 50)
        W, w = 16, 8
        qb, db, lut = _setup(rng, [q], [s1, s2], W, w)
        sub2 = db.unpacked().astype(np.int8)
        valid = db.valid_mask()
        start2 = int(db.starts[1])
        # seed: query offset of core+8 within context0 (offset 1)
        qo = np.array([1 + 8], dtype=np.int32)
        so = np.array([start2 + 8], dtype=np.int32)
        qa, sa, ok = mini_extend(
            jnp.asarray(qb.buffer), jnp.asarray(sub2), jnp.asarray(valid),
            jnp.asarray(qo), jnp.asarray(so), jnp.ones(1, bool),
            lut_word=w, word_size=W,
        )
        assert bool(np.asarray(ok)[0])
        assert int(np.asarray(sa)[0]) == start2  # stopped at subject start


class TestUngappedExtend:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_vs_oracle_random(self, seed):
        rng = np.random.default_rng(seed)
        q = _rand_seq(rng, 500)
        s = (_rand_seq(rng, 100) + _mutate(rng, q[:300], 0.1)
             + _rand_seq(rng, 200))
        qb, db, _ = _setup(rng, [q], [s], 12, 12)
        sub2 = db.unpacked().astype(np.int8)
        valid = db.valid_mask()
        mat = matrix16x4(1, -2)
        n = 64
        qo = rng.integers(1, 450, n).astype(np.int32)
        so = rng.integers(0, 500, n).astype(np.int32)
        xd = np.full(n, 11, dtype=np.int32)
        gq, gs, gl, gsc, _tr = ungapped_extend(
            jnp.asarray(qb.buffer), jnp.asarray(sub2), jnp.asarray(valid),
            jnp.asarray(mat), jnp.asarray(qo), jnp.asarray(so),
            jnp.ones(n, bool), jnp.asarray(xd), chunk=16,
        )
        gq, gs, gl, gsc = map(np.asarray, (gq, gs, gl, gsc))
        for i in range(n):
            want = oracle_ungapped_exact(
                qb.buffer, sub2, valid, mat, int(qo[i]), int(so[i]), 11
            )
            assert (gq[i], gs[i], gl[i], gsc[i]) == want, (i, qo[i], so[i])

    def test_long_perfect_extension(self):
        # a perfect long match must extend over many while-loop chunks
        rng = np.random.default_rng(9)
        core = _rand_seq(rng, 3000)
        qb, db, _ = _setup(rng, [core], [core], 12, 12)
        sub2 = db.unpacked().astype(np.int8)
        valid = db.valid_mask()
        mat = matrix16x4(1, -2)
        gq, gs, gl, gsc, _tr = ungapped_extend(
            jnp.asarray(qb.buffer), jnp.asarray(sub2), jnp.asarray(valid),
            jnp.asarray(mat),
            jnp.asarray(np.array([1 + 1500], np.int32)),
            jnp.asarray(np.array([1500], np.int32)),
            jnp.ones(1, bool), jnp.asarray(np.array([11], np.int32)),
            chunk=64,
        )
        assert int(np.asarray(gsc)[0]) == 3000
        assert int(np.asarray(gl)[0]) == 3000
        assert int(np.asarray(gq)[0]) == 1
        assert int(np.asarray(gs)[0]) == 0


class TestFullSeeding:
    @pytest.mark.parametrize("task", ["megablast", "blastn"])
    def test_pipeline_vs_oracle(self, task):
        rng = np.random.default_rng(11)
        if task == "megablast":
            W, w, reward, penalty = 28, 11, 1, -2
        else:
            W, w, reward, penalty = 11, 8, 2, -3
        q1 = _rand_seq(rng, 600)
        q2 = _rand_seq(rng, 300)
        s1 = (_rand_seq(rng, 150) + _mutate(rng, q1[100:400], 0.03)
              + _rand_seq(rng, 150))
        s2 = _mutate(rng, q2, 0.08) + _rand_seq(rng, 400)
        qb, db, lut = _setup(rng, [q1, q2], [s1, s2], W, w)
        sub2 = db.unpacked().astype(np.int8)
        valid = db.valid_mask()
        mat = matrix16x4(reward, penalty)
        ctx_offs = qb.context_offsets()
        n_ctx = len(qb.contexts)
        cutoffs = np.full(n_ctx, 20 if task == "megablast" else 22, np.int32)
        xdrops = np.full(n_ctx, 11 if task == "megablast" else 22, np.int32)

        dev = SeedingDeviceData(
            query=jnp.asarray(qb.buffer),
            subject2=jnp.asarray(sub2),
            subject_valid=jnp.asarray(valid),
            lut_offsets=jnp.asarray(lut.counts_offsets),
            lut_positions=jnp.asarray(lut.positions),
            matrix16=jnp.asarray(mat),
        )
        got = run_seeding(
            dev, word_size=W, lut_word=lut.lut_word_size,
            scan_step=lut.scan_step,
            subject_starts=np.asarray(db.starts),
            context_offsets=ctx_offs,
            word_cutoffs=cutoffs, x_dropoffs=xdrops,
        )
        want = oracle_seeding_pipeline(
            qb.buffer, sub2, valid, _lut_dict(lut), lut.lut_word_size, W,
            lut.scan_step, mat, np.asarray(db.starts), ctx_offs,
            cutoffs, xdrops,
        )
        got_set = set(
            zip(got.q_start.tolist(), got.s_start.tolist(),
                got.length.tolist(), got.score.tolist())
        )
        want_set = set(
            (h["q_start"], h["s_start"], h["length"], h["score"])
            for h in want
        )
        assert len(want) > 0
        assert got_set == want_set
        # score-order sorted: scores non-increasing
        assert all(np.diff(got.score) <= 0) or len(got) < 2


class TestDiagFilter:
    def test_explored_area(self):
        # second seed inside the ungapped extent of a saved first seed
        q_off = np.array([10, 28], dtype=np.int32)
        s_off = np.array([100, 118], dtype=np.int32)
        oid = np.zeros(2, dtype=np.int32)
        saved = one_hit_diag_filter(
            q_off, s_off, oid, word_size=28,
            ung_s_start=np.array([90, 110]),
            ung_length=np.array([60, 40]),
            ung_score=np.array([50, 30]),
            cutoff=np.array([20, 20]),
        )
        assert list(saved) == [True, False]

    def test_failed_seed_blocks_smaller_region(self):
        # failed first seed blocks only up to s_off + word
        q_off = np.array([10, 28], dtype=np.int32)
        s_off = np.array([100, 130], dtype=np.int32)
        oid = np.zeros(2, dtype=np.int32)
        saved = one_hit_diag_filter(
            q_off, s_off, oid, word_size=28,
            ung_s_start=np.array([90, 110]),
            ung_length=np.array([60, 80]),
            ung_score=np.array([10, 30]),
            cutoff=np.array([20, 20]),
        )
        assert list(saved) == [False, True]


class TestScatteredSurvivors:
    def test_decoy_seeds_before_match(self):
        """Mini-extension kills decoy seeds interleaved before the true
        match; the survivor compaction must select by mask, not prefix
        (regression: prefix slicing dropped late survivors)."""
        rng = np.random.default_rng(1234)
        W, w = 28, 11
        # subject: noise + many copies of an 11-mer decoy + true region
        core = rng.integers(0, 4, 11)
        decoy = np.concatenate([
            np.concatenate([core, rng.integers(0, 4, 25)])
            for _ in range(40)
        ])
        true_region = rng.integers(0, 4, 200)
        subject = np.concatenate(
            [rng.integers(0, 4, 500), decoy, rng.integers(0, 4, 300),
             true_region, rng.integers(0, 4, 200)]
        ).astype(np.uint8)
        true_start = 500 + len(decoy) + 300

        # query: the decoy 11-mer alone (cannot extend to 28) plus the
        # full true region
        query_seq = "".join(
            "ACGT"[i] for i in np.concatenate([core, true_region])
        )
        from gblastn_tpu.io.fasta import FastaRecord
        from gblastn_tpu.io.seqdb import SequenceDB
        from gblastn_tpu.engine.search import search
        from gblastn_tpu.params.options import megablast_options

        genome = "".join("ACGT"[i] for i in subject)
        db = SequenceDB.from_records([FastaRecord("g", "", genome)])
        res = search(
            [FastaRecord("q", "", query_seq)], db,
            megablast_options(dust=False),
        )
        assert res.queries[0].hsplists, "true match lost behind decoys"
        h = res.queries[0].hsplists[0].hsps[0]
        assert h.s_off <= true_start <= h.s_end
        assert h.num_ident >= 195


class TestMiniExtendPacked:
    """mini_extend_packed must be operation-identical to mini_extend
    (packed-word gathers replacing byte gathers)."""

    def _setup(self, seed=0, n_subj=3):
        import numpy as np

        from gblastn_tpu.io.fasta import FastaRecord
        from gblastn_tpu.io.seqdb import SequenceDB

        rng = np.random.default_rng(seed)
        recs = []
        for i in range(n_subj):
            n = int(rng.integers(300, 2000))
            s = "".join("ACGT"[c] for c in rng.integers(0, 4, n))
            recs.append(FastaRecord(f"s{i}", "", s))
        db = SequenceDB.from_records(recs, title="t")
        # query with sentinels and an ambiguity code
        qlen = 4096
        q = rng.integers(0, 4, qlen).astype(np.uint8)
        q[::311] = 15      # sentinels
        q[100] = 14        # N
        # plant exact copies of subject stretches so extensions succeed
        sub2 = db.unpacked()
        for k in range(40):
            so = int(rng.integers(40, db.padded_length - 80))
            qo = int(rng.integers(40, qlen - 80))
            q[qo: qo + 60] = sub2[so: so + 60]
        return db, q, rng

    def test_equivalence_fuzz(self):
        import jax.numpy as jnp
        import numpy as np

        from gblastn_tpu.ops.seeding import (
            mini_extend,
            mini_extend_packed,
            pack_query_nibbles,
            pack_subject_words,
        )

        db, q, rng = self._setup()
        sub2 = jnp.asarray(db.unpacked().astype(np.int8))
        valid = jnp.asarray(db.valid_mask())
        qd = jnp.asarray(q)
        qnib = pack_query_nibbles(qd)
        sw = pack_subject_words(jnp.asarray(db.packed))
        starts = db.starts
        ends = db.starts + db.lengths

        n = 512
        s_off = rng.integers(0, db.padded_length - 1, n)
        q_off = rng.integers(0, len(q) - 1, n)
        # bias half the seeds onto planted matches: scan for word hits
        ok_in = np.ones(n, bool)
        oid = np.clip(
            np.searchsorted(starts, s_off, side="right") - 1, 0,
            len(starts) - 1,
        )
        lo = jnp.asarray(starts[oid].astype(np.int32))
        hi = jnp.asarray(ends[oid].astype(np.int32))

        for lut_word, word_size in ((11, 28), (8, 11), (12, 28)):
            a = mini_extend(
                qd, sub2, valid, jnp.asarray(q_off.astype(np.int32)),
                jnp.asarray(s_off.astype(np.int32)), jnp.asarray(ok_in),
                lut_word=lut_word, word_size=word_size,
            )
            b = mini_extend_packed(
                qnib, sw, jnp.asarray(q_off.astype(np.int32)),
                jnp.asarray(s_off.astype(np.int32)), jnp.asarray(ok_in),
                lo, hi, lut_word=lut_word, word_size=word_size,
            )
            for x, y in zip(a, b):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_scan_mini_packed_path_equivalent(self):
        import jax.numpy as jnp
        import numpy as np

        from gblastn_tpu.io.query import build_query_block
        from gblastn_tpu.lut.builder import (
            build_lookup_table,
            unmasked_locations,
        )
        from gblastn_tpu.io.fasta import FastaRecord
        from gblastn_tpu.ops.seeding import (
            pack_query_nibbles,
            pack_subject_words,
            seeding_scan_mini,
        )

        db, q, rng = self._setup(seed=3)
        sub2_np = db.unpacked()
        genome = "".join("ACGT"[c] for c in sub2_np[:2000])
        reads = [FastaRecord("r0", "", genome[100:400]),
                 FastaRecord("r1", "", genome[900:1200])]
        qb = build_query_block(reads, "both")
        locs = unmasked_locations(qb.buffer, qb.context_offsets())
        lut = build_lookup_table(qb.buffer, locs, 28, 11)
        qbuf = np.full(32768, 15, np.uint8)
        qbuf[: len(qb.buffer)] = qb.buffer
        qd = jnp.asarray(qbuf)
        co = qb.context_offsets()
        ctx_off = np.full(65, np.iinfo(np.int32).max, np.int32)
        ctx_off[: len(co)] = co
        xd = np.full(64, 22, np.int32)
        n_scan = (db.padded_length - 11) // lut.scan_step + 1
        args = (
            jnp.asarray(sub2_np.astype(np.int8)),
            jnp.asarray(db.valid_mask()),
            jnp.asarray(lut.counts_offsets), jnp.asarray(lut.positions),
            qd, jnp.asarray(ctx_off), jnp.asarray(xd),
            jnp.asarray(db.starts), jnp.asarray(db.starts + db.lengths),
        )
        kw = dict(
            scan_step=lut.scan_step, lut_word=lut.lut_word_size,
            word_size=28, cmax=8, n_scan=n_scan, hit_cap=4096,
            seed_cap=4096, out_cap=2048, pos_base_static=0,
        )
        legacy = seeding_scan_mini(*args, **kw)
        packed = seeding_scan_mini(
            *args,
            query_nib=pack_query_nibbles(qd),
            subject_w=pack_subject_words(jnp.asarray(db.packed)),
            **kw,
        )
        for x, y in zip(legacy, packed):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestPhase0:
    """ungapped_phase0_packed: seeds it marks exact must carry the
    bit-identical full-extension result of ungapped_extend."""

    def test_exactness_fuzz(self):
        import jax.numpy as jnp
        import numpy as np

        from gblastn_tpu.engine.search import device_matrix16
        from gblastn_tpu.io.fasta import FastaRecord
        from gblastn_tpu.io.seqdb import SequenceDB
        from gblastn_tpu.ops.pallas_ungapped import make_table64
        from gblastn_tpu.ops.seeding import (
            pack_query_nibbles,
            pack_subject_words,
            ungapped_extend,
            ungapped_phase0_packed,
        )

        rng = np.random.default_rng(17)
        n_sub = 4
        recs = []
        for i in range(n_sub):
            ns = int(rng.integers(500, 3000))
            recs.append(FastaRecord(
                f"s{i}", "",
                "".join("ACGT"[c] for c in rng.integers(0, 4, ns)),
            ))
        db = SequenceDB.from_records(recs, title="t")
        sub2_np = db.unpacked()
        qlen = 8192
        q = rng.integers(0, 4, qlen).astype(np.uint8)
        q[::511] = 15
        q[50] = 6          # ambiguity code in the query
        # plant long exact matches so some seeds survive the clamp
        plants = []
        for _ in range(30):
            so = int(rng.integers(100, db.padded_length - 400))
            qo = int(rng.integers(100, qlen - 400))
            q[qo: qo + 300] = sub2_np[so: so + 300]
            plants.append((qo, so))

        for reward, penalty, word in ((1, -2, 28), (2, -3, 11)):
            m16 = device_matrix16(reward, penalty)
            t64 = jnp.asarray(make_table64(m16))
            qd = jnp.asarray(q)
            sub2 = jnp.asarray(sub2_np.astype(np.int8))
            valid = jnp.asarray(db.valid_mask())
            qnib = pack_query_nibbles(qd)
            sw = pack_subject_words(jnp.asarray(db.packed))

            n = 1024
            qs = rng.integers(0, qlen - 1, n).astype(np.int32)
            # subject positions on REAL bases (production seeds come
            # from the scan, which never yields pad positions)
            soid = rng.integers(0, db.num_seqs, n)
            ss = (
                db.starts[soid]
                + (rng.random(n) * db.lengths[soid]).astype(np.int64)
            ).astype(np.int32)
            # last 30 seeds sit ON planted correspondences (alive at
            # the clamp -> must be reported inexact)
            for k, (qo, so) in enumerate(plants):
                qs[n - 1 - k] = qo + 120
                ss[n - 1 - k] = so + 120
            ok = np.ones(n, bool)
            starts = db.starts
            ends = db.starts + db.lengths
            oid = np.clip(np.searchsorted(starts, ss, "right") - 1,
                          0, len(starts) - 1)
            max_l = np.minimum(np.minimum(qs, ss),
                               ss - starts[oid]).astype(np.int32)
            max_r = np.minimum(
                np.minimum(qlen - qs, db.padded_length - ss),
                ends[oid] - ss,
            ).astype(np.int32)
            max_l = np.maximum(max_l, 0)
            max_r = np.maximum(max_r, 0)
            xd = np.full(n, 22, np.int32)

            full = ungapped_extend(
                qd, sub2, valid, jnp.asarray(m16),
                jnp.asarray(qs), jnp.asarray(ss), jnp.asarray(ok),
                jnp.asarray(xd),
            )
            p0 = ungapped_phase0_packed(
                qnib, sw, t64, jnp.asarray(qs), jnp.asarray(ss),
                jnp.asarray(ok), jnp.asarray(xd),
                jnp.asarray(max_l), jnp.asarray(max_r),
                word_size=word,
            )
            fq, fs, flen, fscore = (np.asarray(x) for x in full[:4])
            pq, ps, plen, pscore, exact = (np.asarray(x) for x in p0)
            sel = exact
            assert sel.sum() > (n * 9) // 10, (
                "most random seeds must resolve within the clamp"
            )
            assert (~sel).sum() > 0, "planted seeds must stay alive"
            np.testing.assert_array_equal(pq[sel], fq[sel])
            np.testing.assert_array_equal(ps[sel], fs[sel])
            np.testing.assert_array_equal(plen[sel], flen[sel])
            np.testing.assert_array_equal(pscore[sel], fscore[sel])


class TestPackSeeds:
    def test_pack_unpack_roundtrip(self):
        from gblastn_tpu.engine.seeding import _pack_seeds, _unpack_seeds

        rng = np.random.default_rng(3)
        n = 512
        ctx_cap = 64
        ctx_off = np.full(ctx_cap + 1, np.iinfo(np.int32).max, np.int32)
        ctx_off[:5] = [0, 1000, 2100, 3300, 4600]
        qs = rng.integers(0, 4500, n).astype(np.int32)
        l_ext = rng.integers(0, 2049, n).astype(np.int32)
        r_ext = rng.integers(0, 2049, n).astype(np.int32)
        ss = rng.integers(3000, 1 << 24, n).astype(np.int32)
        ok = rng.random(n) < 0.7
        qs = np.where(ok, qs, 0).astype(np.int32)
        ss = np.where(ok, ss, 0).astype(np.int32)
        l_ext = np.where(ok, np.minimum(l_ext, qs), 0).astype(np.int32)
        r_ext = np.where(ok, r_ext, 0)
        score = np.where(ok, rng.integers(0, 6000, n), 0).astype(np.int32)
        tr = np.where(ok & (rng.random(n) < 0.1), 1, 0).astype(np.int32)
        f_q = qs - l_ext
        f_len = (l_ext + r_ext).astype(np.int32)

        flat = np.asarray(_pack_seeds(
            jnp.asarray(qs), jnp.asarray(ss), jnp.asarray(ok),
            jnp.asarray(f_q), jnp.asarray(f_len), jnp.asarray(score),
            jnp.asarray(tr),
            jnp.asarray(np.int32(7)), jnp.asarray(np.int32(12345)),
        ))
        (uqs, uss, fill, ctx, ug_q, ug_s, ug_len, ug_score, trunc,
         n_ov, n_raw, counts, rr) = _unpack_seeds(flat, ctx_off, ctx_cap)
        assert counts == (0, 0, 0, 0) and rr is None
        np.testing.assert_array_equal(uqs, qs)
        np.testing.assert_array_equal(uss, ss)
        np.testing.assert_array_equal(fill, ok)
        np.testing.assert_array_equal(trunc, tr.astype(bool))
        np.testing.assert_array_equal(ug_q, f_q)
        np.testing.assert_array_equal(ug_s, ss - l_ext)
        np.testing.assert_array_equal(ug_len, f_len)
        np.testing.assert_array_equal(ug_score, score)
        assert int(n_ov) == 7 and int(n_raw) == 12345
        # ctx must equal the device program's derivation
        expect_ctx = np.clip(
            np.searchsorted(ctx_off, qs, side="right") - 1, 0,
            ctx_cap - 1,
        )
        np.testing.assert_array_equal(ctx, expect_ctx)


class TestScanPVPath:
    """The presence-vector probe (gpu_blastn_mb_scan_kernel_v3.cuh:26
    role) must return exactly the dense-gather path's outputs --
    positions, starts, counts, fan-out, and overflow -- including with
    subject soft-mask intervals and at hit_cap overflow."""

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_pv_equals_dense(self, seed):
        rng = np.random.default_rng(seed)
        q = _rand_seq(rng, 3000)
        s = (_rand_seq(rng, 1500) + q[100:400] + _rand_seq(rng, 800)
             + q[2000:2300] + _rand_seq(rng, 1000))
        qb, db, lut = _setup(rng, [q], [s], word_size=12, lut_word=6)
        sub2 = db.unpacked().astype(np.int8)
        valid = db.valid_mask()
        n_scan = (len(sub2) - lut.lut_word_size) // lut.scan_step + 1

        mask_cases = [None]
        m0 = np.asarray(
            sorted(int(rng.integers(0, len(sub2) - 60)) for _ in range(4))
        )
        mask_cases.append((m0.astype(np.int32),
                           (m0 + 50).astype(np.int32)))
        for masks in mask_cases:
            for hit_cap in (1024, 8):       # 8 forces overflow
                kw = dict(
                    scan_step=lut.scan_step, lut_word=lut.lut_word_size,
                    word_size=lut.word_size, cmax=16, n_scan=n_scan,
                    hit_cap=hit_cap, pos_base_static=0,
                )
                if masks is not None:
                    kw["mask_starts"] = jnp.asarray(masks[0])
                    kw["mask_ends"] = jnp.asarray(masks[1])
                args = (
                    jnp.asarray(sub2), jnp.asarray(valid),
                    jnp.asarray(lut.counts_offsets),
                    jnp.asarray(lut.positions),
                )
                a = scan_block(*args, use_pv=True, **kw)
                b = scan_block(*args, use_pv=False, **kw)
                for x, y in zip(a, b):
                    np.testing.assert_array_equal(
                        np.asarray(x), np.asarray(y)
                    )
