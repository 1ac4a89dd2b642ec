"""Native C++ aligner vs the exact-parity Python oracle."""
from __future__ import annotations

import numpy as np
import pytest

from gblastn_tpu.gapped.greedy import (
    affine_greedy_align,
    affine_greedy_align_native,
)
from gblastn_tpu.native import native_available
from tests.test_greedy import mutate

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


@pytest.mark.parametrize("reward,penalty,go,ge,xdrop", [
    (1, 2, 0, 0, 54),    # megablast (non-affine after doubling)
    (2, 3, 5, 2, 60),    # blastn affine
    (1, 3, 2, 1, 40),
    (4, 5, 12, 8, 80),
])
@pytest.mark.parametrize("do_tb", [False, True])
def test_native_matches_python(reward, penalty, go, ge, xdrop, do_tb):
    rng = np.random.default_rng(606)
    for trial in range(40):
        n = int(rng.integers(20, 500))
        s = rng.integers(0, 4, n).astype(np.uint8)
        q = mutate(rng, s, 0.06, 0.03)
        for reverse in (False, True):
            py = affine_greedy_align(
                q, s, reverse, xdrop, reward, penalty, go, ge, do_tb,
                use_native=False,
            )
            nat = affine_greedy_align_native(
                q, s, reverse, xdrop, reward, penalty, go, ge, do_tb,
            )
            assert nat is not None
            assert nat.score_or_dist == py.score_or_dist, (trial, reverse)
            assert nat.seq1_align_len == py.seq1_align_len
            assert nat.seq2_align_len == py.seq2_align_len
            assert (nat.seed.start_q, nat.seed.start_s,
                    nat.seed.match_length) == (
                py.seed.start_q, py.seed.start_s, py.seed.match_length)
            if do_tb:
                assert nat.edit_ops == py.edit_ops, (trial, reverse)


def test_native_ambiguity_codes():
    # query codes >= 4 always mismatch, in both implementations
    q = np.array([0, 1, 2, 3, 14, 0, 1, 2, 3, 0, 1, 2], dtype=np.uint8)
    s = np.array([0, 1, 2, 3, 0, 0, 1, 2, 3, 0, 1, 2], dtype=np.uint8)
    py = affine_greedy_align(q, s, False, 40, 1, 2, 0, 0, True,
                             use_native=False)
    nat = affine_greedy_align_native(q, s, False, 40, 1, 2, 0, 0, True)
    assert nat.score_or_dist == py.score_or_dist
    assert nat.edit_ops == py.edit_ops


def test_native_empty_sequences():
    e = np.zeros(0, dtype=np.uint8)
    s = np.arange(4, dtype=np.uint8)
    nat = affine_greedy_align_native(e, s, False, 40, 1, 2, 0, 0, True)
    assert nat.seq1_align_len == 0 and nat.seq2_align_len == 0


class TestNativeDP:
    @pytest.mark.parametrize("go,ge,xdrop", [(5, 2, 60), (4, 1, 40)])
    @pytest.mark.parametrize("score_only", [True, False])
    def test_dp_matches_python(self, go, ge, xdrop, score_only):
        from gblastn_tpu.gapped.dynprog import (
            semi_gapped_align,
            semi_gapped_align_native,
        )
        from gblastn_tpu.stats.karlin import nucl_score_matrix

        mat = nucl_score_matrix(2, -3)
        rng = np.random.default_rng(404)
        for trial in range(30):
            n = int(rng.integers(20, 300))
            s = rng.integers(0, 4, n).astype(np.uint8)
            q = mutate(rng, s, 0.07, 0.03)
            a = np.concatenate([[0], q]).astype(np.uint8)
            b = np.concatenate([[0], s]).astype(np.uint8)
            M, N = len(q), len(s)
            for rev in (False, True):
                py = semi_gapped_align(
                    a, b, M, N, mat, go, ge, xdrop, rev, score_only,
                    use_native=False,
                )
                nat = semi_gapped_align_native(
                    a, b, M, N, mat, go, ge, xdrop, rev, score_only,
                )
                assert nat is not None
                assert nat[:3] == py[:3], (trial, rev)
                if not score_only:
                    assert nat[3] == py[3], (trial, rev)


class TestReevaluateNativeParity:
    """native/reevaluate.cpp vs the Python walk, fuzzed edit scripts."""

    def test_fuzz(self):
        import numpy as np
        from gblastn_tpu.hits import HSP, OP_DEL, OP_INS, OP_SUB
        from gblastn_tpu.native import native_available
        from gblastn_tpu.stats.karlin import nucl_score_matrix
        from gblastn_tpu.traceback.stage import (
            reevaluate_with_ambiguities_gapped,
        )

        if not native_available():
            import pytest

            pytest.skip("native toolchain unavailable")
        rng = np.random.default_rng(123)
        matrix = nucl_score_matrix(1, -2)
        for trial in range(60):
            # random subject + query copied with noise and ambiguities
            S = int(rng.integers(300, 1200))
            s = rng.integers(0, 4, S).astype(np.uint8)
            for p in np.flatnonzero(rng.random(S) < 0.02):
                s[p] = int(rng.integers(4, 15))  # ambiguity codes
            q = s.copy()
            for p in np.flatnonzero(rng.random(S) < 0.05):
                q[p] = (q[p] + 1) % 4
            # random edit script around the middle
            q_off = s_off = int(rng.integers(10, 40))
            esp = []
            total = int(rng.integers(50, S - 100))
            left = total
            while left > 0:
                kind = int(rng.integers(0, 8))
                if kind < 6 or not esp:
                    n = int(rng.integers(1, min(left, 60) + 1))
                    esp.append((OP_SUB, n))
                    left -= n
                elif kind == 6:
                    esp.append((OP_DEL, int(rng.integers(1, 4))))
                else:
                    esp.append((OP_INS, int(rng.integers(1, 4))))

            def run(native):
                h = HSP(q_off=q_off, q_end=0, s_off=s_off, s_end=0,
                        score=0, context=0)
                h.edit_script = list(esp)
                deleted = reevaluate_with_ambiguities_gapped(
                    h, q, s, matrix, cutoff_score=20, reward=1,
                    penalty=-2, gap_open=0, gap_extend=0,
                    use_native=native,
                )
                return deleted, h.score, h.q_off, h.q_end, h.s_off, \
                    h.s_end, tuple(h.edit_script)

            a = run(True)
            b = run(False)
            assert a == b, f"trial {trial}: {a} != {b}"


class TestDiagFilterNativeParity:
    """native/diagfilter.cpp vs the Python replay loops, fuzzed seeds."""

    def _random_seeds(self, rng, n, n_oid=3, s_span=5000, q_span=2000):
        q_off = rng.integers(0, q_span, n).astype(np.int32)
        s_off = rng.integers(0, s_span, n).astype(np.int32)
        oid = rng.integers(0, n_oid, n).astype(np.int32)
        length = rng.integers(11, 80, n).astype(np.int32)
        ung_s = np.maximum(s_off - rng.integers(0, 30, n), 0).astype(
            np.int32)
        score = rng.integers(0, 60, n).astype(np.int32)
        cutoff = np.full(n, 22, np.int32)
        return q_off, s_off, oid, ung_s, length, score, cutoff

    def test_one_hit_fuzz(self):
        from gblastn_tpu.engine.seeding import one_hit_diag_filter

        rng = np.random.default_rng(77)
        for trial in range(20):
            n = int(rng.integers(0, 800))
            q, s, o, us, ul, sc, cu = self._random_seeds(rng, n)
            a = one_hit_diag_filter(q, s, o, 28, us, ul, sc, cu,
                                    use_native=True)
            b = one_hit_diag_filter(q, s, o, 28, us, ul, sc, cu,
                                    use_native=False)
            assert np.array_equal(a, b), trial

    def test_two_hit_fuzz(self):
        from gblastn_tpu.engine.seeding import two_hit_diag_filter

        rng = np.random.default_rng(78)
        for trial in range(20):
            n = int(rng.integers(0, 800))
            q, s, o, us, ul, sc, cu = self._random_seeds(rng, n)
            rr = rng.integers(0, 23, n).astype(np.int32)
            a = two_hit_diag_filter(q, s, o, 11, 40, us, ul, sc, cu, rr,
                                    use_native=True)
            b = two_hit_diag_filter(q, s, o, 11, 40, us, ul, sc, cu, rr,
                                    use_native=False)
            assert np.array_equal(a, b), trial


class TestNativePrelimWalk:
    """native/prelim.cpp per-subject walk vs the Python loop in
    engine/gapped.py (identical saved HSPs, any option set)."""

    def _workload(self, rng, options, n_queries=6, qlen=300, glen=5000):
        from gblastn_tpu.engine.seeding import InitHits
        from gblastn_tpu.io.fasta import FastaRecord
        from gblastn_tpu.io.query import build_query_block
        from gblastn_tpu.params.derived import derive_params

        genome2 = rng.integers(0, 4, glen).astype(np.uint8)
        letters = "ACGT"
        records, seg_starts = [], []
        for i in range(n_queries):
            start = int(rng.integers(0, glen - qlen))
            seg = genome2[start: start + qlen].copy()
            mut = rng.random(qlen) < 0.03
            seg[mut] = rng.integers(0, 4, mut.sum())
            records.append(FastaRecord(
                f"q{i}", "", "".join(letters[c] for c in seg)
            ))
            seg_starts.append(start)
        qblock = build_query_block(records)
        params = derive_params(
            options, [c.length for c in qblock.contexts], glen, 1
        )

        ctxs, uqs, uss, lens, scores, qoffs, soffs = (
            [], [], [], [], [], [], []
        )
        for i in range(n_queries):
            for _ in range(30):
                ctx_id = 2 * i + int(rng.random() < 0.3)
                ctx = qblock.contexts[ctx_id]
                ln = int(rng.integers(12, 29))
                k = int(rng.integers(0, ctx.length - ln))
                s_start = seg_starts[i] + k
                if ctx_id % 2 == 1 or s_start + ln > glen:
                    s_start = int(rng.integers(0, glen - ln))
                ctxs.append(ctx_id)
                uqs.append(ctx.offset + k)
                uss.append(s_start)
                lens.append(ln)
                scores.append(
                    options.reward * ln - int(rng.integers(0, 5))
                )
                half = int(rng.integers(0, ln))
                qoffs.append(ctx.offset + k + half)
                soffs.append(s_start + half)
        init = InitHits(
            q_off=np.array(qoffs), s_off=np.array(soffs),
            q_start=np.array(uqs), s_start=np.array(uss),
            length=np.array(lens), score=np.array(scores),
            context=np.array(ctxs), oid=np.zeros(len(ctxs), np.int32),
        )
        order = np.argsort(-init.score, kind="stable")
        return qblock, genome2, init, order, params

    @pytest.mark.parametrize("task", ["megablast", "blastn"])
    @pytest.mark.parametrize("with_reject", [False, True])
    def test_walk_fuzz(self, task, with_reject):
        from gblastn_tpu.engine.gapped import get_gapped_score_one_subject
        from gblastn_tpu.params.options import (
            blastn_options,
            megablast_options,
        )

        rng = np.random.default_rng(91 if task == "megablast" else 92)
        options = (
            megablast_options() if task == "megablast"
            else blastn_options()
        )
        for trial in range(6):
            qblock, genome2, init, order, params = self._workload(
                rng, options
            )
            reject = None
            if with_reject:
                reject = rng.random(len(init)) < 0.25
            py = get_gapped_score_one_subject(
                qblock, genome2, 0, order, init, params, reject,
                use_native=False,
            )
            nat = get_gapped_score_one_subject(
                qblock, genome2, 0, order, init, params, reject,
                use_native=True,
            )
            assert len(py) == len(nat), (trial, len(py), len(nat))
            for a, b in zip(py, nat):
                assert (
                    a.q_off, a.q_end, a.s_off, a.s_end, a.score,
                    a.context, a.q_frame, a.q_gapped_start,
                    a.s_gapped_start,
                ) == (
                    b.q_off, b.q_end, b.s_off, b.s_end, b.score,
                    b.context, b.q_frame, b.q_gapped_start,
                    b.s_gapped_start,
                ), trial

    def test_walk_empty(self):
        from gblastn_tpu.engine.gapped import _walk_native
        from gblastn_tpu.engine.seeding import InitHits
        from gblastn_tpu.io.fasta import FastaRecord
        from gblastn_tpu.io.query import build_query_block
        from gblastn_tpu.params.derived import derive_params
        from gblastn_tpu.params.options import megablast_options

        qblock = build_query_block([FastaRecord("q", "", "ACGT" * 50)])
        opts = megablast_options()
        params = derive_params(
            opts, [c.length for c in qblock.contexts], 1000, 1
        )
        z = np.zeros(0, np.int64)
        init = InitHits(z, z, z, z, z, z, z.astype(np.int32), z)
        out = _walk_native(
            qblock, np.zeros(1000, np.uint8), 0, z, init, params, None
        )
        assert out == []


class TestNativeGreedyTraceback:
    """Fused gblastn_greedy_gapped_traceback vs the Python two-call
    driver (combine + reduce_gaps)."""

    @pytest.mark.parametrize("reward,penalty,go,ge,xdrop", [
        (1, -2, 0, 0, 110),   # megablast non-affine, doubled units
        (2, -3, 5, 2, 60),
        (1, -3, 2, 1, 40),
    ])
    def test_traceback_fuzz(self, reward, penalty, go, ge, xdrop):
        from gblastn_tpu.gapped.greedy import greedy_gapped_alignment

        rng = np.random.default_rng(515)
        for trial in range(60):
            n = int(rng.integers(60, 600))
            s = rng.integers(0, 4, n + 200).astype(np.uint8)
            q = mutate(rng, s[100: 100 + n], 0.05, 0.02)
            # occasional ambiguity codes in both rows
            for arr in (q, s):
                amb = rng.random(len(arr)) < 0.002
                arr[amb] = 14
            q_off = len(q) // 2
            s_off = 100 + q_off
            py = greedy_gapped_alignment(
                q, s, xdrop, reward, penalty, go, ge, q_off, s_off,
                do_traceback=True, use_native=False,
            )
            nat = greedy_gapped_alignment(
                q, s, xdrop, reward, penalty, go, ge, q_off, s_off,
                do_traceback=True, use_native=True,
            )
            assert (py.score, py.q_start, py.q_end, py.s_start,
                    py.s_end) == (
                nat.score, nat.q_start, nat.q_end, nat.s_start,
                nat.s_end), trial
            assert py.edit_script == nat.edit_script, trial


class TestNativeDPTraceback:
    """Fused gblastn_dp_gapped_traceback vs the Python driver."""

    @pytest.mark.parametrize("go,ge,xdrop", [(5, 2, 100), (4, 1, 60)])
    def test_dp_traceback_fuzz(self, go, ge, xdrop):
        from gblastn_tpu.gapped.dynprog import (
            gapped_alignment_with_traceback,
        )
        from gblastn_tpu.stats.karlin import nucl_score_matrix

        mat = nucl_score_matrix(2, -3)
        rng = np.random.default_rng(616)
        for trial in range(50):
            n = int(rng.integers(60, 500))
            s = rng.integers(0, 4, n + 200).astype(np.uint8)
            q = mutate(rng, s[100: 100 + n], 0.05, 0.02)
            for arr in (q, s):
                amb = rng.random(len(arr)) < 0.002
                arr[amb] = 14
            q_start = len(q) // 2
            s_start = 100 + q_start
            py = gapped_alignment_with_traceback(
                q, s, mat, go, ge, xdrop, q_start, s_start,
                use_native=False,
            )
            nat = gapped_alignment_with_traceback(
                q, s, mat, go, ge, xdrop, q_start, s_start,
                use_native=True,
            )
            assert (py.score, py.q_start, py.q_end, py.s_start,
                    py.s_end) == (
                nat.score, nat.q_start, nat.q_end, nat.s_start,
                nat.s_end), trial
            assert py.edit_script == nat.edit_script, trial

    def test_dp_traceback_at_sequence_edge(self):
        from gblastn_tpu.gapped.dynprog import (
            gapped_alignment_with_traceback,
        )
        from gblastn_tpu.stats.karlin import nucl_score_matrix

        mat = nucl_score_matrix(2, -3)
        rng = np.random.default_rng(617)
        s = rng.integers(0, 4, 80).astype(np.uint8)
        q = s[20:].copy()
        # seed at the very last base: right pass is skipped
        py = gapped_alignment_with_traceback(
            q, s, mat, 5, 2, 100, len(q) - 1, 79, use_native=False,
        )
        nat = gapped_alignment_with_traceback(
            q, s, mat, 5, 2, 100, len(q) - 1, 79, use_native=True,
        )
        assert (py.score, py.q_start, py.q_end, py.s_start, py.s_end,
                py.edit_script) == (
            nat.score, nat.q_start, nat.q_end, nat.s_start, nat.s_end,
            nat.edit_script)


class TestApproxNative:
    def test_approx_ungapped_parity(self):
        """Native gblastn_approx_ungapped == Python approx walk, over
        random seeds (planted similarity so both directions extend)."""
        from gblastn_tpu.engine.approx import compute_approx_info
        from gblastn_tpu.io.encoding import pack_2na
        from gblastn_tpu.params.derived import nucl_score_table_packed

        rng = np.random.default_rng(823)
        S, Q, n = 6000, 3072, 800
        sub2 = rng.integers(0, 4, S).astype(np.uint8)
        packed = pack_2na(sub2)
        query = rng.integers(0, 4, Q).astype(np.uint8)
        query[0] = query[-1] = 15
        # ambiguity codes overflow their 2-bit slot, as in the C
        query[rng.integers(1, Q - 1, 20)] = 14
        for _ in range(30):
            qp = int(rng.integers(64, Q - 400))
            sp = int(rng.integers(64, S - 400))
            L = int(rng.integers(50, 350))
            query[qp: qp + L] = sub2[sp: sp + L]
        q_off = rng.integers(16, Q - 32, n).astype(np.int64)
        s_off = rng.integers(16, S - 32, n).astype(np.int64)
        args = (
            query, Q - 1, packed,
            np.zeros(n, np.int64), np.full(n, S, np.int64),
            q_off, s_off, np.zeros(n, np.int32),
            np.array([22], np.int32), np.array([15], np.int64),
            nucl_score_table_packed(1, -2), rng.random(n) < 0.9,
        )
        if not native_available():
            pytest.skip("native toolchain unavailable")
        py = compute_approx_info(*args, use_native=False)
        nat = compute_approx_info(*args, use_native=True)
        for a, b in zip(py, nat):
            np.testing.assert_array_equal(a, b)

    def test_diag_order_matches_lexsort(self):
        """Native comparator sort == np.lexsort((q, s, diag, oid)),
        including duplicate keys and masked (aliased) diagonals."""
        from gblastn_tpu.engine.seeding import _native_diag_order

        rng = np.random.default_rng(911)
        n = 50_000
        q = rng.integers(0, 5000, n).astype(np.int32)
        s = rng.integers(0, 200_000, n).astype(np.int32)
        oid = rng.integers(0, 7, n).astype(np.int32)
        # force exact duplicate rows to exercise the stability tiebreak
        q[1000:1200] = q[0]; s[1000:1200] = s[0]; oid[1000:1200] = oid[0]
        for mask in (0, 1023):
            diag = s.astype(np.int64) - q.astype(np.int64)
            if mask:
                diag = diag & mask
            ref = np.lexsort((q, s, diag, oid))
            nat = _native_diag_order(q, s, oid, mask)
            if nat is None:
                return
            np.testing.assert_array_equal(ref, nat)
