"""NCBI BLAST db volume reader/writer (.nin/.nhr/.nsq + .nal)."""
from __future__ import annotations

import struct

import numpy as np
import pytest

from gblastn_tpu.io.encoding import blastna_to_seq, seq_to_blastna
from gblastn_tpu.io.fasta import FastaRecord
from gblastn_tpu.io.ncbidb import (
    encode_defline_set,
    load_ncbi_db,
    parse_defline_set,
    parse_index,
    read_volume_records,
    resolve_db,
    write_volume,
)
from gblastn_tpu.io.seqdb import SequenceDB

BASES = "ACGT"


def rand_seq(rng, n):
    return "".join(BASES[i] for i in rng.integers(0, 4, n))


@pytest.fixture()
def vol(tmp_path):
    rng = np.random.default_rng(3)
    seqs = [
        ("s1", "first sequence", rand_seq(rng, 1003)),   # remainder 3
        ("s2", "second", rand_seq(rng, 640)),            # remainder 0
        ("s3", "with Ns", rand_seq(rng, 200) + "N" * 25
         + rand_seq(rng, 77) + "RY" + rand_seq(rng, 10)),
        ("s4", "", "ACGTACG"),                           # tiny, remainder 3
    ]
    recs = [FastaRecord(i, t, s.encode()) for i, t, s in seqs]
    write_volume(tmp_path / "testvol", recs, title="test volume")
    return tmp_path / "testvol", seqs


def test_index_fields(vol):
    prefix, seqs = vol
    idx = parse_index(prefix.with_suffix(".nin"))
    assert idx["version"] == 4
    assert idx["title"] == "test volume"
    assert idx["num"] == 4
    assert idx["total"] == sum(len(s) for _, _, s in seqs)
    assert idx["maxlen"] == max(len(s) for _, _, s in seqs)
    assert len(idx["hdr"]) == 5 and len(idx["seq"]) == 5


def test_round_trip_sequences(vol):
    prefix, seqs = vol
    got = list(read_volume_records(prefix))
    assert len(got) == len(seqs)
    for (sid, title, codes), (eid, etitle, eseq) in zip(got, seqs):
        assert sid == eid
        assert title == etitle
        assert blastna_to_seq(codes) == eseq


def test_defline_ber_round_trip():
    blob = encode_defline_set("NC_0001.1", "a chromosome", taxid=9606)
    parsed = parse_defline_set(blob)
    assert parsed == [("NC_0001.1", "a chromosome", 9606)]


def test_new_format_ambiguity(tmp_path):
    """Hand-build a sequence blob using the NEW (Int8) ambiguity format
    (runs > 16 bases in one segment) and check the reader applies it."""
    rng = np.random.default_rng(9)
    seq = rand_seq(rng, 100)
    codes = seq_to_blastna(seq)
    from gblastn_tpu.io.encoding import blastna_to_2na, pack_2na

    codes2, _ = blastna_to_2na(codes)
    # length 100 is a multiple of 4: a whole extra byte carries the
    # zero remainder count (sequence_files.txt)
    packed = np.concatenate([pack_2na(codes2), np.zeros(1, np.uint8)])
    # one 40-base N run at offset 20: value 15, len-1=39
    w0 = (15 << 28) | (39 << 16)
    w1 = 20
    amb = struct.pack(">I", 0x80000000 | 2) + struct.pack(">II", w0, w1)
    seq_blob = packed.tobytes() + amb
    hdr = encode_defline_set("amb1", "new-format ambiguity")
    num = 1
    tb = b"t"
    db = b"date" + b"\x00" * 3
    head = struct.pack(">ii", 4, 0)
    head += struct.pack(">i", len(tb)) + tb
    head += struct.pack(">i", len(db)) + db
    head += struct.pack(">i", num)
    head += struct.pack("<q", 100)
    head += struct.pack(">i", 100)
    # order: hdr[2], seq[2], amb[2] -> amb[0]=end of packed data
    arrays = np.array(
        [0, len(hdr), 0, len(seq_blob), len(packed), len(seq_blob)],
        dtype=">u4",
    )
    (tmp_path / "amb.nin").write_bytes(head + arrays.tobytes())
    (tmp_path / "amb.nhr").write_bytes(hdr)
    (tmp_path / "amb.nsq").write_bytes(seq_blob)
    (sid, title, got), = read_volume_records(tmp_path / "amb")
    assert sid == "amb1"
    text = blastna_to_seq(got)
    assert text[20:60] == "N" * 40
    assert text[:20] == seq[:20] and text[60:] == seq[60:]


def test_alias_resolution(tmp_path, vol):
    prefix, seqs = vol
    rng = np.random.default_rng(5)
    extra = [FastaRecord("x1", "extra", rand_seq(rng, 333).encode())]
    write_volume(tmp_path / "vol2", extra, title="second volume")
    (tmp_path / "combo.nal").write_text(
        "# combined db\nTITLE combined title\n"
        f"DBLIST testvol vol2\n"
    )
    vols, title = resolve_db(tmp_path / "combo")
    assert [v.name for v in vols] == ["testvol", "vol2"]
    assert title == "combined title"
    db = load_ncbi_db(tmp_path / "combo")
    assert db.num_seqs == 5
    assert db.ids == ["s1", "s2", "s3", "s4", "x1"]
    assert db.title == "combined title"


def test_seqdb_load_fallback_and_search(tmp_path):
    """SequenceDB.load on an NCBI-format path; then run a real search
    against it and find a planted match."""
    rng = np.random.default_rng(12)
    genome = rand_seq(rng, 30000)
    write_volume(
        tmp_path / "g", [FastaRecord("chrZ", "z", genome.encode())],
        title="ncbi-format genome",
    )
    db = SequenceDB.load(tmp_path / "g")
    assert db.ids == ["chrZ"]
    assert int(db.lengths[0]) == 30000

    from gblastn_tpu.engine.search import search
    from gblastn_tpu.params.options import megablast_options

    res = search(
        [FastaRecord("q", "", genome[11000:11400].encode())],
        db, megablast_options(),
    )
    h = res.queries[0].hsplists[0].hsps[0]
    assert h.num_ident == 400
    assert h.s_off == 11000 and h.s_end == 11400


def test_v5_round_trip(tmp_path, vol):
    """A v5 volume (LMDB name field in the .nin header) reads back
    identically to its v4 twin, including ambiguity restoration."""
    _, seqs = vol
    recs = [FastaRecord(i, t, s.encode()) for i, t, s in seqs]
    write_volume(tmp_path / "v5vol", recs, title="v5 volume", version=5)
    idx = parse_index((tmp_path / "v5vol").with_suffix(".nin"))
    assert idx["version"] == 5
    assert idx["lmdb"] == "v5vol.ndb"
    assert idx["title"] == "v5 volume"
    assert idx["num"] == 4
    got = list(read_volume_records(tmp_path / "v5vol"))
    for (sid, title, codes), (eid, etitle, eseq) in zip(got, seqs):
        assert sid == eid and title == etitle
        assert blastna_to_seq(codes) == eseq


def test_v5_header_without_lmdb_string(tmp_path, vol):
    """Defensive layout probe: a version-5 header laid out exactly like
    v4 (no LMDB string) still parses -- the reader validates the field
    layout against the offset-array length instead of trusting it."""
    prefix, seqs = vol
    nin = prefix.with_suffix(".nin").read_bytes()
    hacked = struct.pack(">i", 5) + nin[4:]
    (tmp_path / "h.nin").write_bytes(hacked)
    idx = parse_index(tmp_path / "h.nin")
    assert idx["version"] == 5 and idx["lmdb"] == ""
    assert idx["num"] == 4
    assert idx["title"] == "test volume"


def test_v5_search_end_to_end(tmp_path):
    """Search straight through a v5 database path."""
    rng = np.random.default_rng(77)
    genome = rand_seq(rng, 20000)
    write_volume(
        tmp_path / "g5", [FastaRecord("chr5", "five", genome.encode())],
        title="v5 genome", version=5,
    )
    db = SequenceDB.load(tmp_path / "g5")
    assert db.ids == ["chr5"]

    from gblastn_tpu.engine.search import search
    from gblastn_tpu.params.options import megablast_options

    res = search(
        [FastaRecord("q", "", genome[4000:4300].encode())],
        db, megablast_options(),
    )
    h = res.queries[0].hsplists[0].hsps[0]
    assert h.s_off == 4000 and h.s_end == 4300
