"""IO (encoding, fasta, seqdb, query block) and lookup-table tests."""
import numpy as np
import pytest

from gblastn_tpu.io.encoding import (
    blastna_to_seq,
    pack_2na,
    reverse_complement_blastna,
    seq_to_blastna,
    unpack_2na,
)
from gblastn_tpu.io.fasta import FastaRecord, batch_records, parse_fasta
from gblastn_tpu.io.query import build_query_block
from gblastn_tpu.io.seqdb import SequenceDB
from gblastn_tpu.lut.builder import (
    build_lookup_table,
    choose_lut_width,
    unmasked_locations,
)


def _rng_seq(n, seed=0):
    rng = np.random.default_rng(seed)
    return bytes(bytes("ACGT"[i] for i in rng.integers(0, 4, n)), "ascii") \
        if False else "".join("ACGT"[i] for i in rng.integers(0, 4, n))


class TestEncoding:
    def test_roundtrip(self):
        s = "ACGTRYMKWSBDHVN"
        codes = seq_to_blastna(s)
        assert blastna_to_seq(codes) == s

    def test_lowercase_and_u(self):
        assert list(seq_to_blastna("acgu")) == [0, 1, 2, 3]

    def test_revcomp(self):
        codes = seq_to_blastna("AACGT")
        assert blastna_to_seq(reverse_complement_blastna(codes)) == "ACGTT"
        # ambiguity complement: R (A/G) -> Y (C/T)
        assert blastna_to_seq(reverse_complement_blastna(seq_to_blastna("R"))) == "Y"

    def test_pack_unpack(self):
        rng = np.random.default_rng(1)
        codes = rng.integers(0, 4, 37).astype(np.uint8)
        assert np.array_equal(unpack_2na(pack_2na(codes), 37), codes)


class TestFasta:
    def test_parse(self, tmp_path):
        p = tmp_path / "q.fa"
        p.write_text(">q1 first query\nACGT\nACGT\n>q2\nTTTT\n")
        recs = list(parse_fasta(p))
        assert [r.seq_id for r in recs] == ["q1", "q2"]
        assert recs[0].title == "first query"
        assert recs[0].sequence == b"ACGTACGT"

    def test_batching(self):
        recs = [FastaRecord(f"q{i}", "", b"A" * 100) for i in range(10)]
        batches = list(batch_records(recs, 250))
        assert [len(b) for b in batches] == [3, 3, 3, 1]


class TestSeqDB:
    def _db(self):
        recs = [
            FastaRecord("s1", "subject one", b"ACGT" * 100),
            FastaRecord("s2", "", b"TTGCA" * 50),
            FastaRecord("s3", "", b"ACGTN" * 20 + b"GGGG"),
        ]
        return SequenceDB.from_records(recs, title="testdb")

    def test_roundtrip(self):
        db = self._db()
        assert db.num_seqs == 3
        assert db.total_length == 400 + 250 + 104
        s2 = db.get_sequence_2na(1)
        assert blastna_to_seq(s2) == "TTGCA" * 50
        # ambiguity restoration
        s3 = db.get_sequence_blastna(2)
        assert blastna_to_seq(s3) == "ACGTN" * 20 + "GGGG"

    def test_starts_aligned(self):
        db = self._db()
        assert all(s % 128 == 0 for s in db.starts)

    def test_save_load(self, tmp_path):
        db = self._db()
        db.save(tmp_path / "db")
        db2 = SequenceDB.load(tmp_path / "db")
        assert db2.ids == db.ids
        assert np.array_equal(db2.packed, db.packed)
        assert blastna_to_seq(db2.get_sequence_blastna(2)) == "ACGTN" * 20 + "GGGG"

    def test_shard(self):
        db = self._db()
        shards = db.shard(2)
        assert sum(s.num_seqs for s in shards) == 3
        assert shards[0].ids + shards[1].ids == db.ids
        # shard contents match originals
        k = 0
        for sh in shards:
            for i in range(sh.num_seqs):
                assert np.array_equal(
                    sh.get_sequence_blastna(i), db.get_sequence_blastna(k)
                )
                k += 1

    def test_oid_of_position(self):
        db = self._db()
        pos = np.array([0, int(db.starts[1]) + 5, int(db.starts[2])])
        assert list(db.oid_of_position(pos)) == [0, 1, 2]


class TestQueryBlock:
    def test_contexts_both_strands(self):
        recs = [FastaRecord("q1", "", b"ACGTACGTAA"),
                FastaRecord("q2", "", b"GGGCCC")]
        qb = build_query_block(recs, strand="both")
        assert len(qb.contexts) == 4
        assert qb.buffer[0] == 15
        c0 = qb.contexts[0]
        assert blastna_to_seq(qb.buffer[c0.offset:c0.offset + c0.length]) == "ACGTACGTAA"
        c1 = qb.contexts[1]
        assert blastna_to_seq(qb.buffer[c1.offset:c1.offset + c1.length]) == "TTACGTACGT"
        # sentinels between all contexts and at both ends
        offs = qb.context_offsets()
        for c in qb.contexts:
            assert qb.buffer[c.offset - 1] == 15
            assert qb.buffer[c.offset + c.length] == 15
        assert offs[-1] == len(qb.buffer)

    def test_plus_only(self):
        qb = build_query_block([FastaRecord("q", "", b"ACGT")], strand="plus")
        assert len(qb.contexts) == 1
        assert qb.contexts[0].frame == 1


class TestLookupTable:
    def test_width_choice(self):
        assert choose_lut_width(28, 1000) == 8
        assert choose_lut_width(28, 50_000) == 11
        assert choose_lut_width(28, 500_000) == 12
        assert choose_lut_width(11, 1000) == 8
        assert choose_lut_width(11, 50_000) == 11  # G-BLASTN modification
        assert choose_lut_width(8, 10_000) == 8

    def test_positions_simple(self):
        # query: single context "ACGTACGT", word=4, lut word=4
        qb = build_query_block([FastaRecord("q", "", b"ACGTACGT")], strand="plus")
        locs = unmasked_locations(qb.buffer, qb.context_offsets())
        lut = build_lookup_table(qb.buffer, locs, word_size=4, lut_word_size=4)
        # ACGT appears at buffer offsets 1 and 5
        acgt = (0 << 6) | (1 << 4) | (2 << 2) | 3
        lo, hi = lut.counts_offsets[acgt], lut.counts_offsets[acgt + 1]
        assert sorted(lut.positions[lo:hi]) == [1, 5]
        # CGTA at offsets 2
        cgta = (1 << 6) | (2 << 4) | (3 << 2) | 0
        lo, hi = lut.counts_offsets[cgta], lut.counts_offsets[cgta + 1]
        assert list(lut.positions[lo:hi]) == [2]
        assert lut.scan_step == 1

    def test_ambiguity_skipped(self):
        qb = build_query_block([FastaRecord("q", "", b"ACGTNACGTACG")], strand="plus")
        locs = unmasked_locations(qb.buffer, qb.context_offsets())
        lut = build_lookup_table(qb.buffer, locs, word_size=4, lut_word_size=4)
        # words overlapping the N (buffer offset 5) must be absent
        total = lut.num_positions
        # positions: offsets 1 (ACGT), 6..9 (ACGT,CGTA,GTAC,TACG) = 5 words
        assert total == 5
        assert 2 not in list(lut.positions)  # CGTN invalid

    def test_short_location_skipped(self):
        # unmasked region shorter than full word size contributes nothing
        qb = build_query_block([FastaRecord("q", "", b"ACGTAC")], strand="plus")
        locs = unmasked_locations(qb.buffer, qb.context_offsets())
        lut = build_lookup_table(qb.buffer, locs, word_size=8, lut_word_size=4)
        assert lut.num_positions == 0

    def test_scan_step(self):
        qb = build_query_block([FastaRecord("q", "", b"A" * 64)], strand="plus")
        locs = unmasked_locations(qb.buffer, qb.context_offsets())
        lut = build_lookup_table(qb.buffer, locs, word_size=28, lut_word_size=11)
        assert lut.scan_step == 18

    def test_masked_locations(self):
        qb = build_query_block([FastaRecord("q", "", b"ACGT" * 10)], strand="plus")
        masks = [[(5, 12)], []]  # buffer coords; ctx1 (minus) unmasked
        locs = unmasked_locations(qb.buffer, qb.context_offsets(),
                                  masks=[masks[0], []])
        # first context split into [1,4] and [13,40]
        assert (1, 4) in locs and (13, 40) in locs

    def test_sentinel_never_indexed(self):
        qb = build_query_block(
            [FastaRecord("a", "", b"ACGTACGT"), FastaRecord("b", "", b"ACGTACGT")],
            strand="both",
        )
        locs = unmasked_locations(qb.buffer, qb.context_offsets())
        lut = build_lookup_table(qb.buffer, locs, word_size=4, lut_word_size=4)
        for p in lut.positions:
            w = qb.buffer[p:p + 4]
            assert (w < 4).all()


class TestLutNativeParity:
    def test_fuzz_native_vs_numpy(self):
        import numpy as np
        from gblastn_tpu.lut.builder import build_lookup_table
        from gblastn_tpu.native import native_available

        if not native_available():
            import pytest

            pytest.skip("native toolchain unavailable")
        rng = np.random.default_rng(44)
        for trial in range(25):
            n = int(rng.integers(50, 4000))
            buf = rng.integers(0, 4, n).astype(np.uint8)
            for p in np.flatnonzero(rng.random(n) < 0.03):
                buf[p] = int(rng.integers(4, 16))
            # random disjoint locations
            cuts = np.sort(rng.integers(0, n, 6))
            locations = []
            for i in range(0, len(cuts) - 1, 2):
                if cuts[i + 1] > cuts[i]:
                    locations.append((int(cuts[i]), int(cuts[i + 1])))
            if not locations:
                locations = [(0, n - 1)]
            word = int(rng.choice([11, 16, 28]))
            a = build_lookup_table(buf, locations, word, 0,
                                   use_native=True)
            b = build_lookup_table(buf, locations, word, 0,
                                   use_native=False)
            assert a.lut_word_size == b.lut_word_size
            assert a.max_positions_per_word == b.max_positions_per_word
            np.testing.assert_array_equal(a.counts_offsets,
                                          b.counts_offsets)
            np.testing.assert_array_equal(a.positions, b.positions)
