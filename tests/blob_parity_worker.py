"""Blob-path parity checks, run as a SUBPROCESS of the suite.

These compile the largest interpret-mode Pallas programs of the whole
suite (the FORCE_BLOB fused finisher); compiling them late in a
long-lived pytest process has segfaulted XLA:CPU repeatedly (round 5),
while a fresh process passes -- so test_search_e2e spawns this worker
(the same containment as the NCBI search-equality test, CLAUDE.md).

Each check_* mirrors a former TestBlobPathParity test verbatim.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

# The axon TPU tunnel plugin registers itself regardless of
# JAX_PLATFORMS and becomes the default backend (CLAUDE.md): route
# default computations to CPU exactly as tests/conftest.py does, or
# the "non-blob" legs below silently take the TPU blob path.
import jax  # noqa: E402

try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except RuntimeError:
    pass

from gblastn_tpu.engine.search import search
from gblastn_tpu.io.fasta import FastaRecord
from gblastn_tpu.io.seqdb import SequenceDB
from gblastn_tpu.params.options import blastn_options, megablast_options


def rand_seq(rng, n):
    return "".join("ACGT"[i] for i in rng.integers(0, 4, n))


def revcomp(s):
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    return "".join(comp[c] for c in reversed(s))


"""The TPU production seeding path (single-blob upload + fused
finisher, Pallas in interpret mode off-TPU) must produce exactly
the hits of the standard path (GBLASTN_TPU_FORCE_BLOB=1 covers the
code the bench runs on real hardware)."""

def check_blob_equals_default(genome):
    rng = np.random.default_rng(99)
    recs = []
    for k in range(6):
        st = int(rng.integers(0, len(genome) - 800))
        frag = list(genome[st: st + 700])
        for p in np.flatnonzero(rng.random(700) < 0.03):
            frag[p] = "ACGT"[("ACGT".index(frag[p]) + 1
                              + int(rng.integers(0, 3))) % 4]
        seq = "".join(frag)
        if k % 3 == 2:
            seq = revcomp(seq)
        recs.append(FastaRecord(f"b{k}", "", seq))
    options = megablast_options(evalue=1e-3)

    def rows(res):
        return sorted(
            (q.query_index, lst.oid, h.q_off, h.q_end, h.s_off,
             h.s_end, h.score, h.num_ident,
             tuple(h.edit_script or ()))
            for q in res.queries for lst in q.hsplists
            for h in lst.hsps
        )

    # fresh DB objects: the device caches key off the db instance
    db2 = SequenceDB.from_records(
        [FastaRecord("chr1", "", genome)], title="blobdb"
    )
    a = rows(search(recs, db2, options))
    os.environ.__setitem__("GBLASTN_TPU_FORCE_BLOB", "1")
    db3 = SequenceDB.from_records(
        [FastaRecord("chr1", "", genome)], title="blobdb"
    )
    b = rows(search(recs, db3, options))
    assert a == b and len(a) >= 6

def check_blob_two_hit_equals_default(genome):
    """blastn word-11 two-hit: the device admission superset +
    right-run row (engine.seeding._finish_seeds_jit window>0) must
    reproduce the default path's hits exactly."""
    from gblastn_tpu.params.options import blastn_options

    rng = np.random.default_rng(4242)
    recs = []
    for k in range(6):
        st = int(rng.integers(0, len(genome) - 900))
        frag = list(genome[st: st + 800])
        for p in np.flatnonzero(rng.random(800) < 0.08):
            frag[p] = "ACGT"[("ACGT".index(frag[p]) + 1
                              + int(rng.integers(0, 3))) % 4]
        seq = "".join(frag)
        if k % 2:
            seq = revcomp(seq)
        recs.append(FastaRecord(f"t{k}", "", seq))
    options = blastn_options(evalue=1e-2, window_size=40)

    def rows(res):
        return sorted(
            (q.query_index, lst.oid, h.q_off, h.q_end, h.s_off,
             h.s_end, h.score, h.num_ident,
             tuple(h.edit_script or ()))
            for q in res.queries for lst in q.hsplists
            for h in lst.hsps
        )

    db2 = SequenceDB.from_records(
        [FastaRecord("chr1", "", genome)], title="blobdb"
    )
    from gblastn_tpu.engine.search import search as s2
    a = rows(s2(recs, db2, options))
    os.environ.__setitem__("GBLASTN_TPU_FORCE_BLOB", "1")
    db3 = SequenceDB.from_records(
        [FastaRecord("chr1", "", genome)], title="blobdb"
    )
    b = rows(s2(recs, db3, options))
    assert a == b and len(a) >= 4

def check_dev_replay_engages_and_matches(genome):
    """The device two-hit replay fast path (approx gate + replay on
    device, saved-seeds-only fetch) must (a) actually engage on the
    blob path and (b) reproduce the host-replay results exactly --
    both against GBLASTN_TPU_DEV_REPLAY=0 (full fetch + host
    replay) and the default non-blob path."""
    import gblastn_tpu.engine.seeding as es
    from gblastn_tpu.params.options import blastn_options

    rng = np.random.default_rng(777)
    recs = []
    for k in range(8):
        st = int(rng.integers(0, len(genome) - 900))
        frag = list(genome[st: st + 800])
        for p in np.flatnonzero(rng.random(800) < 0.07):
            frag[p] = "ACGT"[("ACGT".index(frag[p]) + 1
                              + int(rng.integers(0, 3))) % 4]
        seq = "".join(frag)
        if k % 2:
            seq = revcomp(seq)
        recs.append(FastaRecord(f"r{k}", "", seq))
    options = blastn_options(evalue=1e-2, window_size=40)

    def rows(res):
        return sorted(
            (q.query_index, lst.oid, h.q_off, h.q_end, h.s_off,
             h.s_end, h.score, h.num_ident,
             tuple(h.edit_script or ()))
            for q in res.queries for lst in q.hsplists
            for h in lst.hsps
        )

    def fresh_db():
        return SequenceDB.from_records(
            [FastaRecord("chr1", "", genome)], title="blobdb"
        )

    calls = {"fast": 0}
    orig = es._finish_saved_hits

    def counting(*a, **k):
        calls["fast"] += 1
        return orig(*a, **k)

    es._finish_saved_hits = counting
    base = rows(search(recs, fresh_db(), options))
    assert calls["fast"] == 0    # non-blob path: no device replay

    os.environ.__setitem__("GBLASTN_TPU_FORCE_BLOB", "1")
    fast = rows(search(recs, fresh_db(), options))
    assert calls["fast"] > 0     # the fast path really engaged
    assert fast == base and len(base) >= 4

    os.environ.__setitem__("GBLASTN_TPU_DEV_REPLAY", "0")
    calls["fast"] = 0
    off = rows(search(recs, fresh_db(), options))
    assert calls["fast"] == 0
    assert off == base

def check_dev_replay_one_hit_megablast(genome):
    """One-hit (window_size == 0) device replay: megablast and
    blastn default both take it on the blob path; results must
    equal the host replay bit-for-bit."""
    import gblastn_tpu.engine.seeding as es
    from gblastn_tpu.params.options import blastn_options

    rng = np.random.default_rng(888)
    recs = []
    for k in range(6):
        st = int(rng.integers(0, len(genome) - 900))
        frag = list(genome[st: st + 700])
        for p in np.flatnonzero(rng.random(700) < 0.05):
            frag[p] = "ACGT"[("ACGT".index(frag[p]) + 1
                              + int(rng.integers(0, 3))) % 4]
        seq = "".join(frag)
        if k % 2:
            seq = revcomp(seq)
        recs.append(FastaRecord(f"o{k}", "", seq))

    def rows(res):
        return sorted(
            (q.query_index, lst.oid, h.q_off, h.q_end, h.s_off,
             h.s_end, h.score, h.num_ident,
             tuple(h.edit_script or ()))
            for q in res.queries for lst in q.hsplists
            for h in lst.hsps
        )

    def fresh_db():
        return SequenceDB.from_records(
            [FastaRecord("chr1", "", genome)], title="blobdb"
        )

    calls = {"fast": 0}
    orig = es._finish_saved_hits

    def counting(*a, **k):
        calls["fast"] += 1
        return orig(*a, **k)

    es._finish_saved_hits = counting
    for options in (
        megablast_options(evalue=1e-3),
        blastn_options(evalue=1e-2),      # one-hit blastn word 11
    ):
        calls["fast"] = 0
        base = rows(search(recs, fresh_db(), options))
        assert calls["fast"] == 0
        os.environ.__setitem__("GBLASTN_TPU_FORCE_BLOB", "1")
        fast = rows(search(recs, fresh_db(), options))
        assert calls["fast"] > 0
        assert fast == base and len(base) >= 4
        os.environ.pop("GBLASTN_TPU_FORCE_BLOB")


def main():
    rng = np.random.default_rng(42)
    genome = rand_seq(rng, 20000)
    for name, fn in sorted(globals().items()):
        if name.startswith("check_"):
            os.environ.pop("GBLASTN_TPU_FORCE_BLOB", None)
            os.environ.pop("GBLASTN_TPU_DEV_REPLAY", None)
            fn(genome)
            print(f"{name}: OK", flush=True)
    print("ALL-OK")


if __name__ == "__main__":
    main()
