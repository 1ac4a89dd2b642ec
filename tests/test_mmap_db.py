"""Bounded-memory (mmap) native DB volumes.

The reference memory-maps database volumes through a bounded atlas
(seqdbatlas.cpp) so an NT-scale search does not need O(DB) host RAM.
Our native db stores the packed buffer as a raw packed.npy that
SequenceDB.load memory-maps: opening the db and touching a slice must
page in only what is read, and every access path (subject fetch,
streamed block fetch, blastdbcmd) must behave identically to the
in-memory form.
"""
from __future__ import annotations

import numpy as np
import pytest

from gblastn_tpu.io.fasta import FastaRecord
from gblastn_tpu.io.seqdb import SequenceDB


def rss_mb() -> float:
    with open("/proc/self/statm") as f:
        return int(f.read().split()[1]) * 4096 / 1e6


def test_load_is_mmap_and_equal(tmp_path):
    rng = np.random.default_rng(5)
    seqs = ["".join("ACGT"[i] for i in rng.integers(0, 4, 5000))
            for _ in range(4)]
    db = SequenceDB.from_records(
        [FastaRecord(f"s{k}", f"t{k}", s) for k, s in enumerate(seqs)],
        title="mm",
    )
    db.save(tmp_path / "db")
    db2 = SequenceDB.load(tmp_path / "db")
    # np.asarray re-wraps the memmap as a base-class ndarray VIEW; the
    # storage must still be the mapping, not an owned copy
    base = db2.packed
    while base.base is not None and not isinstance(base, np.memmap):
        base = base.base
    assert isinstance(base, np.memmap)
    assert not db2.packed.flags.owndata
    np.testing.assert_array_equal(np.asarray(db2.packed), db.packed)
    for oid in range(4):
        np.testing.assert_array_equal(
            db2.get_sequence_2na(oid), db.get_sequence_2na(oid)
        )
        np.testing.assert_array_equal(
            db2.get_sequence_blastna(oid), db.get_sequence_blastna(oid)
        )


def test_legacy_npz_layout_still_loads(tmp_path):
    rng = np.random.default_rng(6)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 3000))
    db = SequenceDB.from_records([FastaRecord("a", "", seq)], title="x")
    db.save(tmp_path / "db")
    # rewrite as the pre-mmap layout: packed inside arrays.npz
    arrays = dict(np.load(tmp_path / "db" / "arrays.npz"))
    arrays["packed"] = db.packed
    np.savez_compressed(tmp_path / "db" / "arrays.npz", **arrays)
    (tmp_path / "db" / "packed.npy").unlink()
    db2 = SequenceDB.load(tmp_path / "db")
    np.testing.assert_array_equal(db2.packed, db.packed)
    np.testing.assert_array_equal(
        db2.get_sequence_2na(0), db.get_sequence_2na(0)
    )


def test_multi_gb_scale_open_is_bounded(tmp_path):
    """Opening a large db and reading a block must not materialize the
    packed buffer (RSS delta a small fraction of the file size)."""
    n_bytes = 256 * 1024 * 1024          # 1 Gbase packed
    total = n_bytes * 4
    path = tmp_path / "big"
    path.mkdir()
    # write the packed payload straight to disk (building it through
    # from_records would materialize gigabytes of ASCII)
    big = np.lib.format.open_memmap(
        path / "packed.npy", mode="w+", dtype=np.uint8,
        shape=(n_bytes,),
    )
    step = 1 << 24
    rng = np.random.default_rng(7)
    for off in range(0, n_bytes, step):
        big[off: off + step] = rng.integers(
            0, 256, min(step, n_bytes - off), dtype=np.uint8
        )
    expected_tail = np.asarray(big[-4096:]).copy()
    del big
    import json

    (path / "manifest.json").write_text(json.dumps({
        "format_version": 1, "title": "big", "num_seqs": 1,
        "total_length": total - 8, "pad": 128,
        "ids": ["chr"], "titles": [""], "masks": {},
    }))
    np.savez_compressed(
        path / "arrays.npz",
        starts=np.array([0], np.int64),
        lengths=np.array([total - 8], np.int64),
        ambig_pos=np.zeros(0, np.int64),
        ambig_code=np.zeros(0, np.uint8),
    )
    before = rss_mb()
    db = SequenceDB.load(path)
    # touch scattered slices (streamed-fetch access pattern)
    for off in range(0, n_bytes, n_bytes // 7):
        chunk = np.asarray(db.packed[off: off + 65536])
        assert chunk.nbytes <= 65536
    np.testing.assert_array_equal(
        np.asarray(db.packed[-4096:]), expected_tail
    )
    delta = rss_mb() - before
    assert delta < 64, f"load+slices grew RSS by {delta:.0f} MB"
    assert db.total_length == total - 8


def test_blastdbcmd_on_mmap_db(tmp_path, capsys):
    from gblastn_tpu.cli.main import main

    rng = np.random.default_rng(8)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 900))
    db = SequenceDB.from_records(
        [FastaRecord("q1", "first", seq)], title="mm2"
    )
    db.save(tmp_path / "db")
    rc = main(["blastdbcmd", "-db", str(tmp_path / "db"),
               "-entry", "q1"])
    assert rc == 0
    out = capsys.readouterr().out
    body = "".join(out.splitlines()[1:])
    assert body == seq
