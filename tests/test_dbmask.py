"""Database-side soft/hard masking (-db_soft_mask / -db_hard_mask).

Reference semantics: masked subject ranges are excluded from word
scanning (masksubj.inl s_DetermineScanningOffsets) while soft-masked
bases still participate in extensions; hard masking additionally
renders masked residues as N for scoring.
"""
import numpy as np
import pytest

from gblastn_tpu.engine.search import search
from gblastn_tpu.io.fasta import FastaRecord
from gblastn_tpu.io.maskdata import read_interval_masks
from gblastn_tpu.io.seqdb import SequenceDB
from gblastn_tpu.params.options import megablast_options


def _mkgenome(n=24000, seed=7):
    rng = np.random.default_rng(seed)
    return "".join("ACGT"[i] for i in rng.integers(0, 4, n))


@pytest.fixture(scope="module")
def masked_db():
    g = _mkgenome()
    db = SequenceDB.from_records(
        [FastaRecord("s1", "subject", g)], title="t"
    )
    # mask the region around [8000, 9000)
    db.add_mask_set(55, "repeat", "test", {"s1": [(8000, 9000)]})
    return db, g


def test_soft_mask_suppresses_masked_hits(masked_db):
    db, g = masked_db
    recs = [
        FastaRecord("q_in", "", g[8200:8500]),    # inside masked range
        FastaRecord("q_out", "", g[2000:2300]),   # outside
    ]
    opts = megablast_options(evalue=1e-3, dust=False)
    base = search(recs, db, opts)
    hits = {r.query_index: sum(len(l.hsps) for l in r.hsplists)
            for r in base.queries}
    assert hits[0] >= 1 and hits[1] >= 1

    masked = search(recs, db, opts.replace(db_soft_mask=55))
    mhits = {r.query_index: sum(len(l.hsps) for l in r.hsplists)
             for r in masked.queries}
    assert mhits[0] == 0, "seeds inside masked range must not scan"
    assert mhits[1] >= 1, "unmasked hits unaffected"


def test_soft_mask_extension_crosses_boundary(masked_db):
    # a query matching [7800, 8100): seeds exist left of the masked
    # range; extension must still run THROUGH it (soft semantics) and
    # produce the full-length alignment
    db, g = masked_db
    recs = [FastaRecord("q_span", "", g[7700:8200])]
    opts = megablast_options(evalue=1e-3, dust=False,
                             db_soft_mask=55)
    res = search(recs, db, opts)
    hsps = [h for l in res.queries[0].hsplists for h in l.hsps]
    assert hsps, "seed outside mask must still hit"
    best = max(hsps, key=lambda h: h.score)
    # alignment extends well into the masked region
    assert best.s_end - best.s_off >= 450


def test_hard_mask_renders_n(masked_db):
    db, _ = masked_db
    db2 = SequenceDB.from_records(
        [FastaRecord("s1", "subject", _mkgenome())], title="t"
    )
    db2.add_mask_set(55, "repeat", "test", {"s1": [(100, 200)]})
    db2.apply_hard_mask(55)
    seq = db2.get_sequence_blastna(0)
    assert (seq[100:200] == 14).all()
    assert (seq[:100] != 14).all()


def test_unknown_algo_raises(masked_db):
    db, g = masked_db
    recs = [FastaRecord("q", "", g[2000:2300])]
    with pytest.raises(KeyError):
        search(recs, db, megablast_options(db_soft_mask=99))


def test_mask_save_load_roundtrip(tmp_path, masked_db):
    db, _ = masked_db
    db.save(tmp_path / "db")
    db2 = SequenceDB.load(tmp_path / "db")
    assert 55 in db2.masks
    m = db2.masks[55]
    assert m.program == "repeat"
    base = int(db2.starts[0])
    assert m.intervals.tolist() == [[base + 8000, base + 9000]]


def test_streamed_soft_mask_equivalent(masked_db, monkeypatch):
    db, g = masked_db
    monkeypatch.setenv("GBLASTN_TPU_STREAM", "1")
    monkeypatch.setenv("GBLASTN_TPU_BLOCK_BASES", "8192")
    monkeypatch.setenv("GBLASTN_TPU_BLOCK_HALO", "1024")
    recs = [
        FastaRecord("q_in", "", g[8200:8500]),
        FastaRecord("q_out", "", g[2000:2300]),
    ]
    opts = megablast_options(evalue=1e-3, dust=False, db_soft_mask=55)
    res = search(recs, db, opts)
    hits = {r.query_index: sum(len(l.hsps) for l in r.hsplists)
            for r in res.queries}
    assert hits[0] == 0 and hits[1] >= 1


def test_interval_mask_file_roundtrip(tmp_path):
    f = tmp_path / "m.intervals"
    f.write_text(">s1 some title\n10 - 19\n30 - 39\n>s2\n0 - 4\n")
    masks = read_interval_masks(f)
    assert masks == {"s1": [(10, 20), (30, 40)], "s2": [(0, 5)]}


def test_cli_mask_flow(tmp_path, capsys):
    from gblastn_tpu.cli.main import main

    g = _mkgenome(8000, seed=3)
    fa = tmp_path / "ref.fa"
    fa.write_text(">s1\n" + g + "\n")
    mask = tmp_path / "m.intervals"
    mask.write_text(">s1\n3000 - 3999\n")
    assert main([
        "makedb", "-in", str(fa), "-out", str(tmp_path / "db"),
        "-mask_data", str(mask), "-mask_id", "40",
    ]) == 0
    # -info lists the algorithm
    assert main([
        "blastdbcmd", "-db", str(tmp_path / "db"), "-info",
    ]) == 0
    infostr = capsys.readouterr().out
    assert "40" in infostr and "repeat" in infostr

    q = tmp_path / "q.fa"
    q.write_text(">q1\n" + g[3200:3500] + "\n")
    out = tmp_path / "hits.tsv"
    assert main([
        "blastn", "-query", str(q), "-db", str(tmp_path / "db"),
        "-outfmt", "6", "-db_soft_mask", "40", "-out", str(out),
        "-dust", "no",
    ]) == 0
    assert out.read_text().strip() == ""


def test_convert2blastmask(tmp_path, capsys):
    from gblastn_tpu.cli.main import main

    fa = tmp_path / "lc.fa"
    fa.write_text(">s1\nACGTacgtACGTacgtacgtACGT\n")
    outf = tmp_path / "m.intervals"
    assert main([
        "convert2blastmask", "-in", str(fa), "-out", str(outf),
    ]) == 0
    masks = read_interval_masks(outf)
    assert masks == {"s1": [(4, 8), (12, 20)]}


def test_sharded_soft_mask_equivalent(masked_db, monkeypatch):
    db, g = masked_db
    monkeypatch.setenv("GBLASTN_TPU_SHARDS", "4")
    recs = [
        FastaRecord("q_in", "", g[8200:8500]),
        FastaRecord("q_out", "", g[2000:2300]),
    ]
    opts = megablast_options(evalue=1e-3, dust=False, db_soft_mask=55)
    res = search(recs, db, opts)
    hits = {r.query_index: sum(len(l.hsps) for l in r.hsplists)
            for r in res.queries}
    assert hits[0] == 0 and hits[1] >= 1
