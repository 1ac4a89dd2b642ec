"""Cooperative cancellation, id index (ISAM role), alias databases,
and blastdbcheck."""
import numpy as np
import pytest

from gblastn_tpu.engine.search import search
from gblastn_tpu.io.fasta import FastaRecord
from gblastn_tpu.io.seqdb import SequenceDB
from gblastn_tpu.params.options import megablast_options
from gblastn_tpu.utils.interrupt import SearchInterrupted


def _genome(n=6000, seed=11):
    rng = np.random.default_rng(seed)
    return "".join("ACGT"[i] for i in rng.integers(0, 4, n))


def test_interrupt_immediate():
    g = _genome()
    db = SequenceDB.from_records([FastaRecord("s1", "", g)], title="t")
    recs = [FastaRecord("q1", "", g[1000:1300])]
    with pytest.raises(SearchInterrupted):
        search(recs, db, megablast_options(), interrupt_fn=lambda: True)


def test_interrupt_mid_pipeline():
    from gblastn_tpu.engine.pipeline import run_pipelined_search

    g = _genome()
    db = SequenceDB.from_records([FastaRecord("s1", "", g)], title="t")
    batches = [
        [FastaRecord(f"q{i}", "", g[500 * i: 500 * i + 300])]
        for i in range(4)
    ]
    calls = []
    trip = [False]

    def on_results(res):
        calls.append(res)
        trip[0] = True          # request stop after first result

    with pytest.raises(SearchInterrupted):
        run_pipelined_search(
            iter(batches), db, megablast_options(), on_results,
            interrupt_fn=lambda: trip[0],
        )
    assert 1 <= len(calls) < 4


def test_oid_of_id_index():
    recs = [
        FastaRecord("gi|123|ref|NM_000001.1", "", "ACGTACGTACGT"),
        FastaRecord("plainid", "", "ACGTACGTACGT"),
    ]
    db = SequenceDB.from_records(recs, title="t")
    assert db.oid_of_id("plainid") == 1
    assert db.oid_of_id("gi|123|ref|NM_000001.1") == 0
    # bare accession pieces resolve too
    assert db.oid_of_id("NM_000001.1") == 0
    assert db.oid_of_id("123") == 0
    assert db.oid_of_id("nope") is None


def test_alias_concat_and_search(tmp_path):
    from gblastn_tpu.cli.main import main

    g1, g2 = _genome(4000, 1), _genome(4000, 2)
    for name, g in (("a", g1), ("b", g2)):
        (tmp_path / f"{name}.fa").write_text(f">{name}1\n{g}\n")
        assert main([
            "makedb", "-in", str(tmp_path / f"{name}.fa"),
            "-out", str(tmp_path / name),
        ]) == 0
    assert main([
        "blastdb_aliastool",
        "-dblist", f"{tmp_path / 'a'} {tmp_path / 'b'}",
        "-out", str(tmp_path / "both"), "-title", "combined",
    ]) == 0
    db = SequenceDB.load(tmp_path / "both")
    assert db.num_seqs == 2
    assert db.ids == ["a1", "b1"]
    assert db.total_length == 8000
    # a query from each member hits the right subject
    res = search(
        [FastaRecord("qa", "", g1[100:400]),
         FastaRecord("qb", "", g2[100:400])],
        db, megablast_options(evalue=1e-3, dust=False),
    )
    sids = [
        db.ids[l.oid] for r in res.queries for l in r.hsplists
    ]
    assert "a1" in sids and "b1" in sids


def test_blastdbcheck(tmp_path, capsys):
    from gblastn_tpu.cli.main import main

    (tmp_path / "r.fa").write_text(">s1\n" + _genome(3000) + "\n")
    assert main([
        "makedb", "-in", str(tmp_path / "r.fa"),
        "-out", str(tmp_path / "db"),
    ]) == 0
    assert main([
        "blastdbcheck", "-db", str(tmp_path / "db"), "-full",
    ]) == 0
    assert "ok" in capsys.readouterr().out


def test_blastdbcheck_detects_corruption(tmp_path, capsys):
    import json

    from gblastn_tpu.cli.main import main

    (tmp_path / "r.fa").write_text(
        ">s1\n" + _genome(3000) + "\n>s2\n" + _genome(1000, 5) + "\n"
    )
    assert main([
        "makedb", "-in", str(tmp_path / "r.fa"),
        "-out", str(tmp_path / "db"),
    ]) == 0
    mpath = tmp_path / "db" / "manifest.json"
    m = json.loads(mpath.read_text())
    m["ids"] = ["s1", "s1"]          # duplicate ids
    mpath.write_text(json.dumps(m))
    assert main(["blastdbcheck", "-db", str(tmp_path / "db")]) == 1
    assert "duplicate" in capsys.readouterr().err
