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
