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


def _rss_mb() -> float:
    with open("/proc/self/statm") as f:
        return int(f.read().split()[1]) * 4096 / 1e6


def test_mmap_volume_matches_records(vol):
    """load_ncbi_db aliases the .nsq memmap as the packed payload; every
    sequence (incl. restored ambiguity letters) must match the source
    records, and search results must equal a from_records database."""
    prefix, seqs = vol
    db = load_ncbi_db(prefix)
    base = db.packed
    while getattr(base, "base", None) is not None and not isinstance(
        base, np.memmap
    ):
        base = base.base
    assert isinstance(base, np.memmap)
    assert db.ids == [i for i, _, _ in seqs]
    assert db.titles == [t for _, t, _ in seqs]
    for oid, (_, _, eseq) in enumerate(seqs):
        assert int(db.lengths[oid]) == len(eseq)
        np.testing.assert_array_equal(
            db.get_sequence_blastna(oid), seq_to_blastna(eseq.encode())
        )

    # the search-equality leg runs in a SUBPROCESS: executing CPU
    # searches over the (byte-aligned, memmap-backed) NCBI layout has
    # repeatedly corrupted the parent process heap somewhere inside
    # XLA:CPU (delayed segfaults in later unrelated compiles, seen
    # only when hundreds of further compiles follow in-process). The
    # child runs the identical assertion with full fidelity and dies
    # cleanly; production single-search processes are unaffected.
    import subprocess
    import sys

    prog = f"""
import numpy as np
from gblastn_tpu.engine.search import search
from gblastn_tpu.io.fasta import FastaRecord
from gblastn_tpu.io.ncbidb import load_ncbi_db
from gblastn_tpu.io.seqdb import SequenceDB
from gblastn_tpu.params.options import blastn_options

seqs = {seqs!r}
db = load_ncbi_db({str(prefix)!r})
recs = [FastaRecord(i, t, s.encode()) for i, t, s in seqs]
ref_db = SequenceDB.from_records(recs, title="ref")
q = [FastaRecord("q", "", seqs[0][2][100:500].encode()),
     FastaRecord("q2", "", seqs[2][2][10:300].encode())]
opts = blastn_options(evalue=10)

def rows(res):
    return [
        (qr.query_index, lst.oid, h.q_off, h.q_end, h.s_off,
         h.s_end, h.score)
        for qr in res.queries for lst in qr.hsplists
        for h in lst.hsps
    ]

a, b = rows(search(q, db, opts)), rows(search(q, ref_db, opts))
assert a == b and a, (a, b)
print("NCBI_MMAP_SEARCH_OK", len(a))
"""
    r = subprocess.run(
        [sys.executable, "-c", prog], capture_output=True, text=True,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "NCBI_MMAP_SEARCH_OK" in r.stdout


def test_mmap_volume_bounded_rss(tmp_path):
    """A multi-GB-scale NCBI volume opens in O(metadata) RSS: the .nsq
    payload stays on disk until pages are touched (seqdbatlas role)."""
    nsq = tmp_path / "big.nsq"
    n_bytes = 192 * 1024 * 1024    # 768 Mbase packed payload
    mm = np.memmap(nsq, np.uint8, mode="w+", shape=(n_bytes,))
    step = 1 << 24
    rng = np.random.default_rng(9)
    for off in range(0, n_bytes, step):
        mm[off: off + step] = rng.integers(
            0, 256, min(step, n_bytes - off), dtype=np.uint8)
    mm[-1] = (mm[-1] & 0xFC) | 0
    mm.flush()
    del mm
    # hand-build the .nin: one sequence spanning the whole file
    total = (n_bytes - 1) * 4
    tb = b"big"
    db_ = b"Jan 1, 2026  12:00 AM"
    db_ += b"\x00" * ((-(len(tb) + len(db_))) % 4)
    head = struct.pack(">ii", 4, 0)
    head += struct.pack(">i", len(tb)) + tb
    head += struct.pack(">i", len(db_)) + db_
    head += struct.pack(">i", 1)
    head += struct.pack("<q", total)
    head += struct.pack(">i", total)
    # hdr [0, 4] (4-byte dummy blob), seq [0, n], amb [n, n] (none)
    arrays = np.array(
        [0, 4] + [0, n_bytes] + [n_bytes, n_bytes], dtype=">u4")
    (tmp_path / "big.nin").write_bytes(head + arrays.tobytes())
    (tmp_path / "big.nhr").write_bytes(b"\x30\x80\x00\x00")

    before = _rss_mb()
    db = load_ncbi_db(tmp_path / "big")
    assert db.num_seqs == 1
    assert int(db.lengths[0]) == total
    # streamed-fetch access pattern: scattered block slices
    for off in range(0, n_bytes, n_bytes // 5):
        chunk = np.asarray(db.packed[off: off + 65536])
        assert chunk.nbytes <= 65536
    delta = _rss_mb() - before
    assert delta < 64, f"NCBI mmap open grew RSS by {delta:.0f} MB"


def test_multi_volume_concat_alignment(tmp_path):
    """Volumes whose .nsq payloads end at arbitrary (non-PAD-aligned)
    byte counts must still present correctly aligned subjects after
    SequenceDB.concat: member base offsets are padded_length multiples,
    so each member's packed buffer must be padded before joining
    (regression: volumes >= 2 were misaligned by up to 124 bases)."""
    rng = np.random.default_rng(11)
    seqs_a = [
        ("a1", "", rand_seq(rng, 1001)),       # odd remainder
        ("a2", "", rand_seq(rng, 57)),
    ]
    seqs_b = [
        ("b1", "", rand_seq(rng, 333) + "N" * 7 + rand_seq(rng, 100)),
        ("b2", "", rand_seq(rng, 7)),
    ]
    seqs_c = [("c1", "", rand_seq(rng, 129))]
    for name, seqs in (("va", seqs_a), ("vb", seqs_b), ("vc", seqs_c)):
        recs = [FastaRecord(i, t, s.encode()) for i, t, s in seqs]
        write_volume(tmp_path / name, recs, title=name)
    (tmp_path / "multi.nal").write_text(
        "TITLE multi\nDBLIST va vb vc\n"
    )
    db = load_ncbi_db(tmp_path / "multi")
    all_seqs = seqs_a + seqs_b + seqs_c
    assert db.ids == [i for i, _, _ in all_seqs]
    for oid, (_, _, eseq) in enumerate(all_seqs):
        assert int(db.lengths[oid]) == len(eseq)
        np.testing.assert_array_equal(
            db.get_sequence_blastna(oid),
            seq_to_blastna(eseq.encode()),
            err_msg=f"oid {oid} misaligned after multi-volume concat",
        )
    # buffer length must match what the offsets promise
    assert len(db.packed) * 4 == db.padded_length
