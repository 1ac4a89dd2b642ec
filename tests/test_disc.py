"""Discontiguous megablast: templates, LUT build, scan, engine e2e."""
from __future__ import annotations

import numpy as np
import pytest

from gblastn_tpu.lut.builder import build_disc_lookup_table
from gblastn_tpu.lut.templates import (
    DISC_TEMPLATES,
    compute_disc_index,
    disc_template_offsets,
)

ALL_KEYS = sorted(DISC_TEMPLATES)


def test_template_inventory():
    # 12 templates: {11,12} x {16,18,21} x {coding,optimal}
    assert len(DISC_TEMPLATES) == 12
    for (w, L, kind), offs in DISC_TEMPLATES.items():
        assert len(offs) == w
        assert offs[0] == 0 and offs[-1] == L - 1
        assert list(offs) == sorted(set(offs))


@pytest.mark.parametrize("key", ALL_KEYS)
def test_index_matches_accumulator_oracle(key):
    # compute_disc_index must agree with a direct base-gather: the
    # window bases, newest in low bits, indexed via the offsets
    w, L, kind = key
    rng = np.random.default_rng(hash(key) % 2**31)
    offs = DISC_TEMPLATES[key]
    for _ in range(50):
        bases = rng.integers(0, 4, L)
        accum = 0
        for b in bases:            # oldest first: ends newest-low
            accum = (accum << 2) | int(b)
        idx = compute_disc_index(accum, w, L, kind)
        expect = 0
        for r, j in enumerate(offs):
            expect |= int(bases[j]) << (2 * (w - 1 - r))
        assert idx == expect


def test_disc_lut_build_matches_naive():
    rng = np.random.default_rng(5)
    buf = rng.integers(0, 4, 400).astype(np.uint8)
    buf[50] = 14           # ambiguity
    buf[200] = 15          # sentinel
    locs = [(0, 179), (181, 399)]
    for key in ((11, 18, "coding"), (12, 21, "optimal")):
        w, L, kind = key
        lut = build_disc_lookup_table(buf, locs, w, L, kind)
        offs = disc_template_offsets(w, L, kind)
        naive = []
        for a, b in locs:
            if b - a + 1 < L:
                continue
            for s in range(a, b - L + 2):
                if np.all(buf[s: s + L] < 4):
                    code = 0
                    for r, j in enumerate(offs):
                        code |= int(buf[s + j]) << (2 * (w - 1 - r))
                    naive.append((code, s))
        naive.sort()
        assert lut.num_positions == len(naive)
        assert lut.scan_step == 1 and lut.word_size == L
        assert lut.lut_word_size == w
        got = sorted(zip(lut.position_words.tolist(),
                         lut.positions.tolist()))
        assert got == naive
        # CSR offsets consistent
        for code, s in naive:
            lo = lut.counts_offsets[code]
            hi = lut.counts_offsets[code + 1]
            assert s in lut.positions[lo:hi]


def test_disc_scan_block_matches_numpy():
    import jax.numpy as jnp

    from gblastn_tpu.ops.seeding import scan_block

    rng = np.random.default_rng(9)
    w, L, kind = 11, 18, "coding"
    offs = disc_template_offsets(w, L, kind)
    genome = rng.integers(0, 4, 600).astype(np.int8)
    # the query contains a planted copy so real seeds exist
    qbuf = np.full(260, 15, np.uint8)
    qbuf[1:251] = genome[100:350].astype(np.uint8)
    lut = build_disc_lookup_table(qbuf, [(1, 250)], w, L, kind)

    valid = np.ones(600, bool)
    valid[580:] = False
    q_off, s_off, take, dropped, _nh = scan_block(
        jnp.asarray(genome), jnp.asarray(valid),
        jnp.asarray(lut.counts_offsets), jnp.asarray(
            lut.positions if len(lut.positions) else np.zeros(1, np.int32)
        ),
        scan_step=1, lut_word=w, word_size=L, cmax=8,
        n_scan=600 - L + 1, hit_cap=0, pos_base_static=0,
        disc_offsets=offs,
    )
    got = set()
    for q, s, t in zip(np.asarray(q_off), np.asarray(s_off),
                       np.asarray(take)):
        if t:
            got.add((int(q), int(s)))
    # numpy oracle
    expect = set()
    for s in range(600 - L + 1):
        if not np.all(valid[s: s + L]):
            continue
        code = 0
        for r, j in enumerate(offs):
            code |= int(genome[s + j]) << (2 * (w - 1 - r))
        lo, hi = lut.counts_offsets[code], lut.counts_offsets[code + 1]
        for q in lut.positions[lo:hi]:
            expect.add((int(q), s))
    assert int(dropped) == 0
    assert got == expect and len(expect) > 200


def _wobble(rng, frag: str, third=0.45, other=0.02) -> str:
    B = "ACGT"
    out = list(frag)
    for p in range(len(out)):
        r = third if p % 3 == 2 else other
        if rng.random() < r:
            out[p] = B[(B.index(out[p]) + 1 + int(rng.integers(0, 3))) % 4]
    return "".join(out)


class TestDiscEngine:
    @pytest.fixture(scope="class")
    def genome(self):
        rng = np.random.default_rng(31)
        return "".join("ACGT"[i] for i in rng.integers(0, 4, 30000))

    @pytest.mark.parametrize(
        "tt", ["coding", "optimal", "coding_and_optimal"]
    )
    def test_diverged_match_found(self, genome, tt):
        from gblastn_tpu.engine.search import search
        from gblastn_tpu.io.fasta import FastaRecord
        from gblastn_tpu.io.seqdb import SequenceDB
        from gblastn_tpu.params.options import (
            dc_megablast_options,
            megablast_options,
        )

        rng = np.random.default_rng(41)
        q = _wobble(rng, genome[8000:8400])
        db = SequenceDB.from_records(
            [FastaRecord("chr", "", genome)], title="t"
        )
        rec = [FastaRecord("q", "", q)]
        res = search(rec, db, dc_megablast_options(
            evalue=1e-5, template_type=tt,
        ))
        hsps = [h for qq in res.queries for lst in qq.hsplists
                for h in lst.hsps]
        assert hsps, tt
        best = max(h.score for h in hsps)
        assert best > 200
        # contiguous megablast word 28 finds nothing on this divergence
        res28 = search(rec, db, megablast_options(evalue=1e-5))
        assert not any(
            lst.hsps for qq in res28.queries for lst in qq.hsplists
        )

    def test_cli_dc_megablast(self, genome, tmp_path):
        from gblastn_tpu.cli.main import main

        rng = np.random.default_rng(43)
        q = tmp_path / "q.fa"
        q.write_text(">d1\n" + _wobble(rng, genome[5000:5400]) + "\n")
        ref = tmp_path / "ref.fa"
        ref.write_text(">chr1 c\n" + genome + "\n")
        assert main(["makedb", "-in", str(ref), "-out",
                     str(tmp_path / "db"), "-title", "t"]) == 0
        out = tmp_path / "o.tsv"
        assert main([
            "blastn", "-query", str(q), "-db", str(tmp_path / "db"),
            "-task", "dc-megablast", "-template_length", "21",
            "-template_type", "optimal", "-out", str(out),
        ]) == 0
        rows = [ln.split("\t") for ln in out.read_text().splitlines()]
        assert rows and rows[0][0] == "d1" and rows[0][1] == "chr1"

    def test_template_flags_require_dc_task(self, tmp_path):
        from gblastn_tpu.cli.main import main

        q = tmp_path / "q.fa"
        q.write_text(">x\nACGTACGTACGT\n")
        with pytest.raises(SystemExit):
            main(["blastn", "-query", str(q), "-db", "nowhere",
                  "-task", "megablast", "-template_length", "18"])

    def test_option_validation(self):
        from gblastn_tpu.params.options import dc_megablast_options

        with pytest.raises(ValueError):
            dc_megablast_options(template_length=17).validate()
        with pytest.raises(ValueError):
            dc_megablast_options(word_size=13).validate()
        with pytest.raises(ValueError):
            dc_megablast_options(template_type="weird").validate()
        dc_megablast_options(
            word_size=12, template_length=21
        ).validate()
