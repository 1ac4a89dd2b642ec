"""Indexed megablast (-use_index / makembindex, lut/dbindex.py).

The load-bearing property is seed-set exactness: a database index built
at the search's (lut_word, scan_step) must make ``indexed_scan_block``
produce the SAME raw seed set as the subject scan (``scan_block``), so
everything downstream -- and the final output bytes -- is identical to
a scan run at the same LUT width (reference contrast: the dbindex
subsystem's results are documented as only "similar" to scanning,
algo/blast/dbindex/).
"""
from __future__ import annotations

import numpy as np
import pytest

from gblastn_tpu.engine.search import search
from gblastn_tpu.io.fasta import FastaRecord
from gblastn_tpu.io.seqdb import SequenceDB
from gblastn_tpu.lut.dbindex import (
    build_db_index,
    index_compatible,
    load_db_index,
    save_db_index,
)
from gblastn_tpu.params.options import megablast_options

BASES = "ACGT"


def _genome(rng, n):
    return "".join(BASES[i] for i in rng.integers(0, 4, n))


def _reads(rng, genome, num, qlen, mut=0.02):
    out = []
    for i in range(num):
        s = int(rng.integers(0, len(genome) - qlen))
        read = list(genome[s: s + qlen])
        for p in np.flatnonzero(rng.random(qlen) < mut):
            read[p] = BASES[(BASES.index(read[p]) + 1
                             + int(rng.integers(0, 3))) % 4]
        out.append(FastaRecord(f"r{i}", "", "".join(read)))
    return out


@pytest.fixture(scope="module")
def workload(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("dbindex")
    rng = np.random.default_rng(31)
    genome = _genome(rng, 60000)
    db = SequenceDB.from_records(
        [FastaRecord("c1", "", genome[:40000]),
         FastaRecord("c2", "", genome[40000:])],
        title="idxdb",
    )
    db.save(tmp / "db")
    db = SequenceDB.load(tmp / "db")   # sets _source_path
    index = build_db_index(db, 28, 12)
    save_db_index(index, str(tmp / "db"))
    queries = _reads(rng, genome, 12, 700)
    return tmp, db, index, queries, genome


def _flat_hits(results):
    out = []
    for q in results.queries:
        for lst in q.hsplists:
            for h in lst.hsps:
                out.append((
                    q.query_index, lst.oid, h.context, h.q_off,
                    h.q_end, h.s_off, h.s_end,
                    h.score, round(h.evalue, 6),
                ))
    return sorted(out)


def test_raw_seed_set_equivalence(workload):
    import jax.numpy as jnp

    from gblastn_tpu.io.query import build_query_block
    from gblastn_tpu.lut.builder import (
        build_lookup_table,
        unmasked_locations,
    )
    from gblastn_tpu.ops.seeding import indexed_scan_block, scan_block

    _tmp, db, index, queries, _genome_ = workload
    qb = build_query_block(queries, "both")
    locs = unmasked_locations(qb.buffer, qb.context_offsets())
    lut = build_lookup_table(qb.buffer, locs, 28, index.lut_word)
    qcap = 32768
    while qcap < len(qb.buffer):
        qcap *= 2
    qbuf = np.full(qcap, 15, np.uint8)
    qbuf[: len(qb.buffer)] = qb.buffer

    sub2 = jnp.asarray(db.unpacked().astype(np.int8))
    valid = jnp.asarray(db.valid_mask())
    n_scan_s = (sub2.shape[0] - lut.lut_word_size) // lut.scan_step + 1
    q1, s1, t1, _, _nh1 = scan_block(
        sub2, valid, jnp.asarray(lut.counts_offsets),
        jnp.asarray(lut.positions),
        scan_step=lut.scan_step, lut_word=lut.lut_word_size,
        word_size=28, cmax=max(lut.max_positions_per_word, 4),
        n_scan=n_scan_s, hit_cap=0,
    )
    t1 = np.asarray(t1)
    seeds_scan = set(
        zip(np.asarray(q1)[t1].tolist(), np.asarray(s1)[t1].tolist())
    )

    q_allowed = np.zeros(qcap, bool)
    q_allowed[lut.positions] = True
    q2, s2, t2, _, _nh2 = indexed_scan_block(
        jnp.asarray(qbuf), jnp.asarray(q_allowed),
        jnp.asarray(index.offsets()), jnp.asarray(index.positions),
        lut_word=index.lut_word, cmax=max(index.max_chain, 4),
        n_scan=qcap - index.lut_word + 1, hit_cap=0,
    )
    t2 = np.asarray(t2)
    seeds_idx = set(
        zip(np.asarray(q2)[t2].tolist(), np.asarray(s2)[t2].tolist())
    )
    assert seeds_scan and seeds_idx == seeds_scan


def test_roundtrip_and_compat(workload):
    tmp, db, index, _queries, _g = workload
    idx2 = load_db_index(str(tmp / "db"))
    assert idx2.word_size == index.word_size
    assert idx2.lut_word == index.lut_word
    assert np.array_equal(idx2.positions, index.positions)
    assert np.array_equal(idx2.words, index.words)
    assert index_compatible(idx2, db, 28) is None
    assert index_compatible(idx2, db, 11) is not None
    other = SequenceDB.from_records(
        [FastaRecord("x", "", "ACGT" * 100)], title="other"
    )
    assert index_compatible(idx2, other, 28) is not None


def test_search_indexed_equals_scan(workload):
    _tmp, db, index, queries, _g = workload
    base = megablast_options(
        evalue=1e-5, max_target_seqs=20, lut_word_size=index.lut_word
    )
    ref = search(queries, db, base)
    res = search(queries, db, base.replace(use_index=True))
    assert _flat_hits(res) == _flat_hits(ref)
    assert len(_flat_hits(ref)) >= len(queries)
    # cached index reused on a second batch
    res2 = search(queries[:5], db, base.replace(use_index=True))
    ref2 = search(queries[:5], db, base)
    assert _flat_hits(res2) == _flat_hits(ref2)


def test_search_indexed_with_db_soft_mask(workload):
    tmp, db, index, queries, _g = workload
    db2 = SequenceDB.load(tmp / "db")
    db2.add_mask_set(10, "dust", "test", {
        "c1": [(1000, 3000)], "c2": [(1000, 4000)],
    })
    base = megablast_options(
        evalue=1e-5, max_target_seqs=20,
        lut_word_size=index.lut_word, db_soft_mask=10,
    )
    ref = search(queries, db2, base)
    res = search(queries, db2, base.replace(use_index=True))
    assert _flat_hits(res) == _flat_hits(ref)


def test_use_index_fallbacks(workload, capsys):
    tmp, db, index, queries, _g = workload
    base = megablast_options(evalue=1e-5, max_target_seqs=20)
    # wrong word size for the index -> warn + identical to plain scan
    ref = search(queries, db, base.replace(word_size=24))
    db_fresh = SequenceDB.load(tmp / "db")
    res = search(
        queries, db_fresh, base.replace(word_size=24, use_index=True)
    )
    assert _flat_hits(res) == _flat_hits(ref)
    assert "scanning instead" in capsys.readouterr().err
    # missing index file -> warn + identical results
    db3 = SequenceDB.load(tmp / "db")
    res = search(queries, db3, base.replace(
        use_index=True, index_name=str(tmp / "nonexistent")
    ))
    assert _flat_hits(res) == _flat_hits(search(queries, db3, base))
    assert "not found" in capsys.readouterr().err


def test_search_indexed_blastn_word11(workload):
    from gblastn_tpu.params.options import blastn_options

    tmp, _db, _index, _queries, genome = workload
    db = SequenceDB.load(tmp / "db")
    index = build_db_index(db, 11)          # lut 11, stride 1
    save_db_index(index, str(tmp / "db11"))
    rng = np.random.default_rng(5)
    queries = _reads(rng, genome, 6, 400, mut=0.05)
    base = blastn_options(
        evalue=1e-3, max_target_seqs=20, lut_word_size=11
    )
    ref = search(queries, db, base)
    res = search(queries, db, base.replace(
        use_index=True, index_name=str(tmp / "db11")
    ))
    assert _flat_hits(res) == _flat_hits(ref)
    assert _flat_hits(ref)


def test_cli_makembindex_and_use_index(tmp_path, capsys):
    from gblastn_tpu.cli.main import main

    rng = np.random.default_rng(77)
    genome = _genome(rng, 30000)
    (tmp_path / "ref.fa").write_text(f">chrA test\n{genome}\n")
    (tmp_path / "q.fa").write_text(f">probe\n{genome[8000:8500]}\n")
    assert main(["makedb", "-in", str(tmp_path / "ref.fa"),
                 "-out", str(tmp_path / "db"), "-title", "t"]) == 0
    assert main(["makembindex", "-input", str(tmp_path / "db")]) == 0
    assert "Built index" in capsys.readouterr().err
    out = tmp_path / "hits.tsv"
    assert main([
        "blastn", "-query", str(tmp_path / "q.fa"),
        "-db", str(tmp_path / "db"), "-outfmt", "6",
        "-use_index", "true", "-out", str(out),
    ]) == 0
    line = out.read_text().strip().splitlines()[0].split("\t")
    assert line[0] == "probe" and line[1] == "chrA"
    assert line[2] == "100.00" and line[3] == "500"


def test_search_indexed_streamed_equals_resident(workload, monkeypatch):
    """-use_index on the subject-block-streamed path: per-block index
    slices over the blocks' disjoint scan-grid ownership must reproduce
    the resident indexed (== scan) output bit-identically."""
    tmp, db, index, queries, _g = workload
    base = megablast_options(
        evalue=1e-5, max_target_seqs=20, lut_word_size=index.lut_word
    )
    ref = search(queries, db, base)          # resident scan
    db_s = SequenceDB.load(tmp / "db")       # fresh device/idx caches
    monkeypatch.setenv("GBLASTN_TPU_STREAM", "1")
    monkeypatch.setenv("GBLASTN_TPU_BLOCK_BASES", "16384")
    res = search(queries, db_s, base.replace(use_index=True))
    assert _flat_hits(res) == _flat_hits(ref)
    assert _flat_hits(ref)
    # second batch reuses the cached per-block index slices
    res2 = search(queries[:4], db_s, base.replace(use_index=True))
    ref2 = search(queries[:4], db, base)
    assert _flat_hits(res2) == _flat_hits(ref2)


def test_search_indexed_streamed_with_db_soft_mask(workload, monkeypatch):
    tmp, _db, index, queries, _g = workload
    db_m = SequenceDB.load(tmp / "db")
    db_m.add_mask_set(10, "dust", "test", {
        "c1": [(1000, 3000)], "c2": [(1000, 4000)],
    })
    base = megablast_options(
        evalue=1e-5, max_target_seqs=20,
        lut_word_size=index.lut_word, db_soft_mask=10,
    )
    ref = search(queries, db_m, base)        # resident scan + mask
    db_s = SequenceDB.load(tmp / "db")
    db_s.add_mask_set(10, "dust", "test", {
        "c1": [(1000, 3000)], "c2": [(1000, 4000)],
    })
    monkeypatch.setenv("GBLASTN_TPU_STREAM", "1")
    monkeypatch.setenv("GBLASTN_TPU_BLOCK_BASES", "16384")
    res = search(queries, db_s, base.replace(use_index=True))
    assert _flat_hits(res) == _flat_hits(ref)


def test_search_indexed_sharded_equals_resident(workload, monkeypatch):
    """-use_index on the DB-sharded multi-chip path (4-device virtual
    CPU mesh): per-shard index slices must reproduce the resident
    output bit-identically."""
    tmp, db, index, queries, _g = workload
    base = megablast_options(
        evalue=1e-5, max_target_seqs=20, lut_word_size=index.lut_word
    )
    ref = search(queries, db, base)
    db_s = SequenceDB.load(tmp / "db")
    monkeypatch.setenv("GBLASTN_TPU_SHARDS", "4")
    res = search(queries, db_s, base.replace(use_index=True))
    assert _flat_hits(res) == _flat_hits(ref)
    assert _flat_hits(ref)
