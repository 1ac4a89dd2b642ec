"""CLI end-to-end: every output format through the real entry point.

The XML writer unit tests passed while the CLI never wired outfmt 5
into its emit loop -- these tests run the actual command path so the
format dispatch itself is covered.
"""
from __future__ import annotations

import sys
from xml.dom import minidom

import numpy as np
import pytest

from gblastn_tpu.cli.main import main

BASES = "ACGT"


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(55)
    genome = "".join(BASES[i] for i in rng.integers(0, 4, 20000))
    (tmp / "db.fa").write_text(f">chr1 test chromosome\n{genome}\n")
    q = genome[5000:5400]
    (tmp / "q.fa").write_text(f">read1 a read\n{q}\n")
    assert main(["makedb", "-in", str(tmp / "db.fa"),
                 "-out", str(tmp / "db"), "-title", "clidb"]) == 0
    return tmp


def run_blastn(tmp, *extra):
    out = tmp / "out.txt"
    rc = main([
        "blastn", "-query", str(tmp / "q.fa"), "-db", str(tmp / "db"),
        "-out", str(out), *extra,
    ])
    assert rc == 0
    return out.read_text()


def test_outfmt6(setup):
    text = run_blastn(setup, "-outfmt", "6")
    line = text.strip().splitlines()[0].split("\t")
    assert line[0] == "read1" and line[1] == "chr1"
    assert line[2] == "100.00" and line[3] == "400"


def test_outfmt7_commented(setup):
    text = run_blastn(setup, "-outfmt", "7")
    assert "# Query: read1" in text
    assert "# 1 hits found" in text


def test_outfmt0_pairwise(setup):
    text = run_blastn(setup, "-outfmt", "0")
    assert "Query= read1" in text
    assert "> chr1" in text
    assert "Identities = 400/400" in text


def test_outfmt5_xml(setup):
    text = run_blastn(setup, "-outfmt", "5")
    doc = minidom.parseString(text)
    assert len(doc.getElementsByTagName("Iteration")) == 1
    assert len(doc.getElementsByTagName("Hsp")) == 1
    val = doc.getElementsByTagName("Hsp_identity")[0].firstChild.data
    assert val == "400"


def test_outfmt17_sam(setup):
    text = run_blastn(setup, "-outfmt", "17")
    assert text.startswith("@HD")
    assert "@SQ\tSN:chr1\tLN:20000" in text
    body = [l for l in text.splitlines() if not l.startswith("@")]
    assert body and body[0].split("\t")[2] == "chr1"


def test_subject_mode(setup):
    tmp = setup
    out = tmp / "out2.txt"
    rc = main([
        "blastn", "-query", str(tmp / "q.fa"),
        "-subject", str(tmp / "db.fa"), "-out", str(out),
        "-outfmt", "6",
    ])
    assert rc == 0
    assert out.read_text().split("\t")[1] == "chr1"


def test_blastdbcmd_info(setup, capsys):
    rc = main(["blastdbcmd", "-db", str(setup / "db"), "-info"])
    assert rc == 0
    assert "20,000" in capsys.readouterr().out


def test_dustmasker(setup, tmp_path, capsys):
    fa = tmp_path / "d.fa"
    rng = np.random.default_rng(3)
    rand = "".join(BASES[i] for i in rng.integers(0, 4, 300))
    fa.write_text(f">s1\n{rand}{'AT' * 40}{rand[::-1]}\n")
    rc = main(["dustmasker", "-in", str(fa), "-outfmt", "interval"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.startswith(">s1")
    a, _, b = out.splitlines()[1].partition(" - ")
    # the AT-repeat run (300..379) must be inside the masked interval
    assert int(a) <= 300 and int(b) >= 370


def test_outfmt6_extended_fields(setup, tmp_path):
    # a minus-strand query with a planted 3-base deletion exercises
    # btop/qseq/sseq orientation and the gap convention
    genome_line = (setup / "db.fa").read_text().splitlines()
    genome = "".join(genome_line[1:])
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    frag = genome[8000:8400]
    frag = frag[:200] + frag[203:]            # deletion vs subject
    rc = "".join(comp[c] for c in reversed(frag))
    q = tmp_path / "ext_q.fa"
    q.write_text(f">m1\n{rc}\n")
    out = tmp_path / "ext.tsv"
    rcde = main([
        "blastn", "-query", str(q), "-db", str(setup / "db"),
        "-out", str(out),
        "-outfmt", "6 qseqid sacc stitle sstrand frames positive ppos "
                   "qcovs qcovhsp btop qseq sseq",
    ])
    assert rcde == 0
    f = out.read_text().strip().split("\t")
    (qseqid, sacc, stitle, sstrand, frames, positive, ppos,
     qcovs, qcovhsp, btop, qseq, sseq) = f
    assert qseqid == "m1" and sacc == "chr1"
    assert stitle == "chr1 test chromosome"
    assert sstrand == "minus" and frames == "1/-1"
    assert positive == "397" and ppos == "99.25"
    assert qcovs == "100" and qcovhsp == "100"
    # alignment strings: query row has the 3-base gap, subject row none
    assert len(qseq) == len(sseq) == 400
    assert qseq.count("-") == 3 and sseq.count("-") == 0
    # NCBI orientation: rows align the query in ITS OWN plus strand
    # (the FASTA sequence as given), so the subject row is the reverse
    # complement of the genome segment
    assert qseq.replace("-", "") == rc
    assert sseq == "".join(comp[c] for c in reversed(genome[8000:8400]))
    # btop must encode exactly the returned rows: 397 identities in
    # runs plus the three query-gap pairs, in row order
    expect = []
    run = 0
    for qc, sc in zip(qseq, sseq):
        if qc == sc:
            run += 1
            continue
        if run:
            expect.append(str(run))
            run = 0
        expect.append(qc + sc)
    if run:
        expect.append(str(run))
    assert btop == "".join(expect)
    assert btop.count("-") == 3
    assert sum(int(x) for x in
               __import__("re").findall(r"\d+", btop)) == 397


def test_outfmt7_extended_header_and_qcovs_merge(setup, tmp_path):
    genome_line = (setup / "db.fa").read_text().splitlines()
    genome = "".join(genome_line[1:])
    # two disjoint HSPs from the same subject: qcovs merges both spans
    q = tmp_path / "two.fa"
    q.write_text(">t1\n" + genome[1000:1200] +
                 "TTTTACCGGTTAACCGGAATT" * 5 + genome[4000:4200] + "\n")
    out = tmp_path / "two.tsv"
    assert main([
        "blastn", "-query", str(q), "-db", str(setup / "db"),
        "-out", str(out), "-task", "blastn",
        "-outfmt", "7 qseqid qstart qend qcovs qcovhsp",
    ]) == 0
    text = out.read_text()
    assert "# Fields: query id, q. start, q. end, % query coverage " \
           "per subject, % query coverage per hsp" in text
    rows = [l.split("\t") for l in text.splitlines()
            if l and not l.startswith("#")]
    assert len(rows) >= 2
    qcovs = {r[3] for r in rows}
    assert len(qcovs) == 1          # same subject -> same merged value
    assert all(int(r[4]) <= int(r[3]) for r in rows)


def test_seqidlist_restriction(setup, tmp_path):
    # build a 3-subject db; restrict to one id / exclude one id
    genome_line = (setup / "db.fa").read_text().splitlines()
    genome = "".join(genome_line[1:])
    multi = tmp_path / "multi.fa"
    multi.write_text(
        ">s1 first\n" + genome[:4000] + "\n"
        ">s2 second\n" + genome[4000:8000] + "\n"
        ">s3 third\n" + genome[8000:12000] + "\n"
    )
    dbp = tmp_path / "mdb"
    assert main(["makedb", "-in", str(multi), "-out", str(dbp),
                 "-title", "m"]) == 0
    # query matches s2 and s3
    q = tmp_path / "q.fa"
    q.write_text(">a\n" + genome[5000:5300] + "\n"
                 ">b\n" + genome[9000:9300] + "\n")
    lst = tmp_path / "ids.txt"
    lst.write_text("s2\n")
    out = tmp_path / "r.tsv"
    assert main(["blastn", "-query", str(q), "-db", str(dbp),
                 "-seqidlist", str(lst), "-out", str(out),
                 "-outfmt", "6 qseqid sseqid"]) == 0
    rows = [l.split("\t") for l in out.read_text().splitlines()]
    assert rows and all(r[1] == "s2" for r in rows)
    assert {r[0] for r in rows} == {"a"}

    assert main(["blastn", "-query", str(q), "-db", str(dbp),
                 "-negative_seqidlist", str(lst), "-out", str(out),
                 "-outfmt", "6 qseqid sseqid"]) == 0
    rows = [l.split("\t") for l in out.read_text().splitlines()]
    assert rows and all(r[1] != "s2" for r in rows)
    assert {r[0] for r in rows} == {"b"}

    # restricted search == direct search of the subset database
    sub = tmp_path / "sub.fa"
    sub.write_text(">s2 second\n" + genome[4000:8000] + "\n")
    sdbp = tmp_path / "sdb"
    assert main(["makedb", "-in", str(sub), "-out", str(sdbp),
                 "-title", "m"]) == 0
    direct = tmp_path / "direct.tsv"
    assert main(["blastn", "-query", str(q), "-db", str(sdbp),
                 "-out", str(direct), "-outfmt", "6"]) == 0
    restricted = tmp_path / "restricted.tsv"
    assert main(["blastn", "-query", str(q), "-db", str(dbp),
                 "-seqidlist", str(lst), "-out", str(restricted),
                 "-outfmt", "6"]) == 0
    assert restricted.read_text() == direct.read_text()


def test_query_loc_restriction(setup, tmp_path):
    # a query whose halves match two distant genome loci: restricting
    # to one half must (a) search only that half, (b) report FULL-query
    # coordinates, (c) use the restricted length for statistics --
    # identical e-values/bit scores to searching the slice directly
    genome_line = (setup / "db.fa").read_text().splitlines()
    genome = "".join(genome_line[1:])
    left, right = genome[2000:2300], genome[9000:9300]
    q = tmp_path / "loc.fa"
    q.write_text(">two\n" + left + right + "\n")
    out = tmp_path / "loc.tsv"
    fmt = "6 qseqid qstart qend sstart send evalue bitscore"
    assert main(["blastn", "-query", str(q), "-db", str(setup / "db"),
                 "-query_loc", "301-600", "-out", str(out),
                 "-outfmt", fmt]) == 0
    rows = [l.split("\t") for l in out.read_text().splitlines()]
    assert len(rows) == 1
    # full-sequence coordinates for the right half
    assert rows[0][1] == "301" and rows[0][2] == "600"
    assert rows[0][3] == "9001" and rows[0][4] == "9300"

    # statistics match a direct search of the slice
    qs = tmp_path / "slice.fa"
    qs.write_text(">two\n" + right + "\n")
    out2 = tmp_path / "slice.tsv"
    assert main(["blastn", "-query", str(qs), "-db", str(setup / "db"),
                 "-out", str(out2), "-outfmt", fmt]) == 0
    rows2 = [l.split("\t") for l in out2.read_text().splitlines()]
    assert len(rows2) == 1
    assert rows[0][5:] == rows2[0][5:]          # evalue + bit score
    # minus-strand query restriction: revcomp the same construct
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    rc = "".join(comp[c] for c in reversed(left + right))
    qm = tmp_path / "locm.fa"
    qm.write_text(">twom\n" + rc + "\n")
    out3 = tmp_path / "locm.tsv"
    assert main(["blastn", "-query", str(qm), "-db", str(setup / "db"),
                 "-query_loc", "1-300", "-out", str(out3),
                 "-outfmt", fmt]) == 0
    rows3 = [l.split("\t") for l in out3.read_text().splitlines()]
    assert len(rows3) == 1
    assert rows3[0][1] == "1" and rows3[0][2] == "300"
    assert rows3[0][3] == "9300" and rows3[0][4] == "9001"


def test_subject_loc_restriction(setup, tmp_path):
    # -subject_loc (bl2seq): search only the range, report full-subject
    # coordinates and full slen, statistics from the range length --
    # identical e-values/bit scores to searching the slice directly
    genome_line = (setup / "db.fa").read_text().splitlines()
    genome = "".join(genome_line[1:])
    q = tmp_path / "q.fa"
    q.write_text(
        ">in\n" + genome[6000:6400] + "\n"
        ">outr\n" + genome[12000:12300] + "\n"
    )
    s = tmp_path / "s.fa"
    s.write_text(">subj\n" + genome + "\n")
    fmt = "6 qseqid sstart send evalue bitscore slen"
    out = tmp_path / "sl.tsv"
    assert main(["blastn", "-query", str(q), "-subject", str(s),
                 "-subject_loc", "5001-10000", "-out", str(out),
                 "-outfmt", fmt]) == 0
    rows = [l.split("\t") for l in out.read_text().splitlines()]
    assert {r[0] for r in rows} == {"in"}       # outr is out of range
    assert rows[0][1] == "6001" and rows[0][2] == "6400"
    assert rows[0][5] == str(len(genome))       # slen = full length

    # statistics match a direct bl2seq search of the slice
    ss = tmp_path / "slice.fa"
    ss.write_text(">subj\n" + genome[5000:10000] + "\n")
    out2 = tmp_path / "sl2.tsv"
    assert main(["blastn", "-query", str(q), "-subject", str(ss),
                 "-out", str(out2), "-outfmt", fmt]) == 0
    rows2 = [l.split("\t") for l in out2.read_text().splitlines()]
    assert len(rows2) == 1
    assert rows[0][3:5] == rows2[0][3:5]        # evalue + bit score

    # -subject_loc with -db is a usage error
    with pytest.raises(SystemExit):
        main(["blastn", "-query", str(q), "-db", str(setup / "db"),
              "-subject_loc", "1-10"])


def test_gilist_restriction(setup, tmp_path):
    # -gilist / -negative_gilist: GI-keyed oid restriction, text and
    # NCBI binary list formats (seqdbcommon.cpp:821)
    genome_line = (setup / "db.fa").read_text().splitlines()
    genome = "".join(genome_line[1:])
    s = tmp_path / "gidb.fa"
    s.write_text(
        ">gi|101|gb|AA1.1| first\n" + genome[:8000] + "\n"
        ">gi|202|gb|BB1.1| second\n" + genome[8000:16000] + "\n"
        ">plain third\n" + genome[16000:] + "\n"
    )
    dbp = tmp_path / "gidb"
    assert main(["makedb", "-in", str(s), "-out", str(dbp),
                 "-title", "g"]) == 0
    q = tmp_path / "q.fa"
    q.write_text(
        ">a\n" + genome[2000:2400] + "\n"
        ">b\n" + genome[10000:10400] + "\n"
        ">c\n" + genome[18000:18400] + "\n"
    )

    lst = tmp_path / "gis.txt"
    lst.write_text("# keep the first subject\n101\n")
    out = tmp_path / "gi.tsv"
    assert main(["blastn", "-query", str(q), "-db", str(dbp),
                 "-gilist", str(lst), "-out", str(out),
                 "-outfmt", "6 qseqid sseqid"]) == 0
    rows = [l.split("\t") for l in out.read_text().splitlines()]
    assert rows and {r[1] for r in rows} == {"gi|101|gb|AA1.1|"}

    # binary list format: -1 marker, big-endian count, big-endian GIs
    blst = tmp_path / "gis.bgl"
    blst.write_bytes(
        (-1).to_bytes(4, "big", signed=True)
        + (2).to_bytes(4, "big")
        + (101).to_bytes(4, "big") + (202).to_bytes(4, "big")
    )
    out2 = tmp_path / "gineg.tsv"
    assert main(["blastn", "-query", str(q), "-db", str(dbp),
                 "-negative_gilist", str(blst), "-out", str(out2),
                 "-outfmt", "6 qseqid sseqid"]) == 0
    rows2 = [l.split("\t") for l in out2.read_text().splitlines()]
    assert rows2 and {r[1] for r in rows2} == {"plain"}

    # only one id restriction at a time
    with pytest.raises(SystemExit):
        main(["blastn", "-query", str(q), "-db", str(dbp),
              "-gilist", str(lst), "-seqidlist", str(lst)])


def test_subject_loc_out_of_range_errors(setup, tmp_path):
    # a -subject_loc entirely past the subject's end is an options
    # error, not a silent empty search
    genome_line = (setup / "db.fa").read_text().splitlines()
    genome = "".join(genome_line[1:])
    q = tmp_path / "q.fa"
    q.write_text(">q\n" + genome[100:400] + "\n")
    s = tmp_path / "s.fa"
    s.write_text(">subj\n" + genome[:5000] + "\n")
    with pytest.raises(SystemExit, match="outside subject"):
        main(["blastn", "-query", str(q), "-subject", str(s),
              "-subject_loc", "90001-95000"])


def test_id_restriction_requires_db(setup, tmp_path):
    # the reference declares -gilist/-seqidlist incompatible with
    # -subject; combined with -subject_loc a subset would also desync
    # the display db
    genome_line = (setup / "db.fa").read_text().splitlines()
    genome = "".join(genome_line[1:])
    q = tmp_path / "q.fa"
    q.write_text(">q\n" + genome[100:400] + "\n")
    s = tmp_path / "s.fa"
    s.write_text(">subj\n" + genome[:5000] + "\n")
    lst = tmp_path / "ids.txt"
    lst.write_text("subj\n")
    with pytest.raises(SystemExit, match="requires\\s+-db"):
        main(["blastn", "-query", str(q), "-subject", str(s),
              "-seqidlist", str(lst)])


def test_gi_list_tolerant_text_forms(tmp_path):
    # CRLF, leading blank lines, tabs, and a UTF-8 BOM are all text GI
    # lists (the reference classifies everything without the 0xFF
    # binary marker as text, seqdbcommon.cpp:821)
    from gblastn_tpu.io.seqdb import read_gi_list

    p = tmp_path / "gis.txt"
    p.write_bytes(b"\xef\xbb\xbf\r\n\t101\r\n  202 # trailing\r\n")
    assert read_gi_list(p) == {101, 202}
    bad = tmp_path / "bad.txt"
    bad.write_bytes(b"101\nnot-a-gi\n")
    with pytest.raises(ValueError, match="bad line"):
        read_gi_list(bad)


def test_blastdbcmd_entry_batch_and_outfmt(setup, tmp_path, capsys):
    # -entry_batch file of ids + -outfmt %-specifiers
    # (blastdbcmd.cpp x_ProcessEntry format substitution)
    genome_line = (setup / "db.fa").read_text().splitlines()
    genome = "".join(genome_line[1:])
    s = tmp_path / "m.fa"
    s.write_text(
        ">s1 first\n" + genome[:900] + "\n"
        ">s2 second\n" + genome[900:2100] + "\n"
        ">s3 third\n" + genome[2100:2400] + "\n"
    )
    dbp = tmp_path / "mdb"
    assert main(["makedb", "-in", str(s), "-out", str(dbp)]) == 0
    batch = tmp_path / "ids.txt"
    batch.write_text("s3\ns1\n")
    assert main(["blastdbcmd", "-db", str(dbp), "-entry_batch",
                 str(batch), "-outfmt", "%a %l %t"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert out == ["s3 300 third", "s1 900 first"]

    # %s with -range and 100%% escape
    assert main(["blastdbcmd", "-db", str(dbp), "-entry", "s2",
                 "-range", "1-10", "-outfmt", "%a:%s 100%%"]) == 0
    out2 = capsys.readouterr().out.strip()
    assert out2 == f"s2:{genome[900:910]} 100%"
