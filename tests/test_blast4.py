"""Blast4 strategy/archive object layer + ASN.1 text parser tests."""
import os

import numpy as np
import pytest

from gblastn_tpu.hits import HSP, OP_SUB
from gblastn_tpu.io.encoding import IUPACNA_TO_BLASTNA
from gblastn_tpu.objects.asn1 import (
    Named,
    named_get,
    parse_text,
    real_value,
    to_ber,
    to_text,
)
from gblastn_tpu.objects.blast4 import (
    _pack_ncbi4na,
    bioseq,
    bioseq_set,
    blast4_archive,
    blast4_mask,
    blast4_request,
    ka_block,
    queue_search_request,
    search_results_reply,
    strategy_to_args,
)
from gblastn_tpu.objects.seqalign import seq_align
from gblastn_tpu.params.options import megablast_options

GOLDEN = ("/root/reference/c++/src/algo/blast/unit_tests/api/data/"
          "archive.multiple_queries.asn")


def _encode(s: str) -> np.ndarray:
    return IUPACNA_TO_BLASTNA[np.frombuffer(s.encode(), np.uint8)]


def _request(opts):
    seqs = [bioseq("q1", "first query", _encode("ACGTACGTAC"))]
    return blast4_request(
        "tester",
        queue_search_request(
            program="blastn", service="megablast",
            queries=bioseq_set(seqs), subject_db="testdb",
            paramset="megablast", options=opts,
        ),
    )


def test_pack_ncbi4na():
    # A=1 C=2 G=4 T=8, two bases per byte, high nibble first
    assert _pack_ncbi4na(_encode("ACGT")) == bytes([0x12, 0x48])
    assert _pack_ncbi4na(_encode("AN")) == bytes([0x1F])
    assert _pack_ncbi4na(_encode("ACG")) == bytes([0x12, 0x40])


def test_parse_text_roundtrip_request():
    opts = megablast_options()
    txt = to_text("Blast4-request", _request(opts))
    name, val = parse_text(txt)
    assert name == "Blast4-request"
    assert named_get(val, "ident") == "tester"
    body = named_get(val, "body")
    assert body.name == "queue-search"
    qs = body.value
    assert named_get(qs, "program") == "blastn"
    subject = named_get(qs, "subject")
    assert subject.name == "database" and subject.value == "testdb"
    seqset = named_get(named_get(qs, "queries").value, "seq-set")
    inst = named_get(seqset[0].value, "inst")
    assert named_get(inst, "length") == 10
    assert named_get(inst, "seq-data").value == _pack_ncbi4na(
        _encode("ACGTACGTAC")
    )


def test_strategy_recovery():
    opts = megablast_options(
        evalue=0.001, word_size=20, reward=2, penalty=-3,
        gap_open=5, gap_extend=2, window_size=40, strand="plus",
        use_index=True, index_name="idx/path",
    )
    txt = to_text("Blast4-request", _request(opts))
    args = strategy_to_args(txt)
    assert args["db"] == "testdb"
    assert args["task"] == "megablast"
    assert args["evalue"] == pytest.approx(0.001)
    assert args["word_size"] == 20
    assert args["reward"] == 2
    assert args["penalty"] == -3
    assert args["gapopen"] == 5
    assert args["gapextend"] == 2
    assert args["window_size"] == 40
    assert args["strand"] == "plus"
    assert args["ungapped"] is False
    assert args["use_index"] == "true"
    assert args["index_name"] == "idx/path"


def test_archive_roundtrip_with_masks():
    opts = megablast_options()
    h = HSP(q_off=0, q_end=10, s_off=5, s_end=15, score=20,
            evalue=1e-5, bit_score=20.0, num_ident=10,
            edit_script=[(OP_SUB, 10)])
    results = search_results_reply(
        alignments=[seq_align(h, "q1", "s1", 10)],
        masks=[blast4_mask("q1", [(3, 8)])],
        ka_blocks=[ka_block(1.33, 0.62, 1.12, False),
                   ka_block(1.28, 0.46, 0.85, True)],
        search_stats=["Matrix: blastn matrix:1 -2", ""],
    )
    arch = blast4_archive(_request(opts), results)
    txt = to_text("Blast4-archive", arch)
    name, val = parse_text(txt)
    assert name == "Blast4-archive"
    res = named_get(val, "results")
    aligns = named_get(res, "alignments")
    assert len(aligns) == 1
    # mask intervals: half-open (3, 8) -> from 3 to 7 inclusive
    masks = named_get(res, "masks")
    loc = named_get(masks[0], "locations")[0]
    assert loc.name == "packed-int"
    iv = loc.value[0]
    assert named_get(iv, "from") == 3
    assert named_get(iv, "to") == 7
    assert named_get(masks[0], "frame") == "plus1"
    ka = named_get(res, "ka-blocks")
    assert real_value(named_get(ka[0], "lambda")) == pytest.approx(1.33)
    assert named_get(ka[1], "gapped") is True
    # BER form also encodes without error and is non-trivial
    assert len(to_ber(arch)) > 200


def test_parse_text_string_escapes_and_wrapping():
    txt = 'X ::= {\n  title "line one\n two ""quoted""",\n  n 3\n}\n'
    _, val = parse_text(txt)
    assert named_get(val, "title") == 'line one two "quoted"'
    assert named_get(val, "n") == 3


@pytest.mark.skipif(not os.path.exists(GOLDEN),
                    reason="reference golden data not present")
def test_parse_reference_golden_archive():
    name, val = parse_text(open(GOLDEN).read())
    assert name == "Blast4-archive"
    req = named_get(val, "request")
    body = named_get(req, "body")
    assert body.name == "queue-search"
    qs = body.value
    assert named_get(qs, "program") == "blastn"
    seqset = named_get(named_get(qs, "queries").value, "seq-set")
    assert len(seqset) == 3
    assert named_get(named_get(seqset[0].value, "inst"), "length") == 292
    res = named_get(val, "results")
    assert len(named_get(res, "alignments")) == 47
    ka = named_get(res, "ka-blocks")
    assert real_value(named_get(ka[0], "lambda")) == pytest.approx(
        0.636951, rel=1e-6
    )
    # recover CLI args from a real NCBI-exported request
    args = strategy_to_args(open(GOLDEN).read())
    assert args["db"] == "nt"
    assert args["word_size"] == 11
    assert args["penalty"] == -3


def test_blast_formatter_roundtrip(tmp_path):
    """search -> -outfmt 11 archive -> blast_formatter == direct run."""
    from gblastn_tpu.cli.main import main

    rng = np.random.default_rng(81)
    g = "".join("ACGT"[i] for i in rng.integers(0, 4, 20000))
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    frag = g[6000:6400]
    frag = frag[:150] + frag[153:]        # deletion -> gapped script
    rc = "".join(comp[c] for c in reversed(frag))
    ref = tmp_path / "ref.fa"
    ref.write_text(">chr1 archive chrom\n" + g + "\n")
    qfile = tmp_path / "q.fa"
    qfile.write_text(f">am\n{rc}\n>ap\n{g[11000:11350]}\n")
    db_prefix = tmp_path / "db"
    assert main(["makedb", "-in", str(ref), "-out", str(db_prefix),
                 "-title", "archdb"]) == 0
    arc = tmp_path / "run.11"
    direct = tmp_path / "direct.tsv"
    assert main([
        "blastn", "-query", str(qfile), "-db", str(db_prefix),
        "-outfmt", "11", "-out", str(arc),
    ]) == 0
    assert main([
        "blastn", "-query", str(qfile), "-db", str(db_prefix),
        "-outfmt", "6", "-out", str(direct),
    ]) == 0
    refmt = tmp_path / "refmt.tsv"
    assert main([
        "blast_formatter", "-archive", str(arc),
        "-outfmt", "6", "-out", str(refmt),
    ]) == 0
    assert refmt.read_text() == direct.read_text()

    # sequence-dependent fields re-fetch the archived database
    d2 = tmp_path / "d2.tsv"
    r2 = tmp_path / "r2.tsv"
    ofmt = "6 qseqid sstrand stitle slen qcovhsp btop qseq sseq"
    assert main([
        "blastn", "-query", str(qfile), "-db", str(db_prefix),
        "-outfmt", ofmt, "-out", str(d2),
    ]) == 0
    assert main([
        "blast_formatter", "-archive", str(arc),
        "-outfmt", ofmt, "-out", str(r2),
    ]) == 0
    assert r2.read_text() == d2.read_text()

    # CSV mode
    r10 = tmp_path / "r10.csv"
    assert main([
        "blast_formatter", "-archive", str(arc),
        "-outfmt", "10 qseqid evalue bitscore", "-out", str(r10),
    ]) == 0
    assert "," in r10.read_text().splitlines()[0]

    # non-tabular kinds render through the shared writer stack and must
    # be byte-identical to the direct run (pairwise, anchored, XML).
    # SAM is compared with EV tags clamped: the archive stores e-values
    # below 1e-180 as 0 (s_BuildScoreList, blast_seqalign.cpp:935), so a
    # replay cannot recover them -- the reference behaves the same.
    for fmt in ("0", "1", "4", "5", "17"):
        dd = tmp_path / f"dd.{fmt}"
        rr = tmp_path / f"rr.{fmt}"
        assert main([
            "blastn", "-query", str(qfile), "-db", str(db_prefix),
            "-outfmt", fmt, "-out", str(dd),
        ]) == 0
        assert main([
            "blast_formatter", "-archive", str(arc),
            "-outfmt", fmt, "-out", str(rr),
        ]) == 0
        a, b = rr.read_text(), dd.read_text()
        if fmt == "17":
            import re
            a = re.sub(r"EV:f:\S+", "EV:f:*", a)
            b = re.sub(r"EV:f:\S+", "EV:f:*", b)
        assert a == b, fmt
