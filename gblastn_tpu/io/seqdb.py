"""TPU-native sequence database: 2-bit packed, block-padded, shardable.

Plays the role of the reference's BLAST database (CSeqDB reader /
CWriteDB writer, /root/reference/c++/src/objtools/blast/seqdb_reader and
seqdb_writer) re-designed for array processing:

* all subjects live in ONE concatenated 2-bit packed buffer;
* each subject starts at a base offset that is a multiple of ``PAD`` so a
  packed byte never spans two subjects and device blocks slice cleanly;
* ambiguous input bases are deterministically randomized in the packed data
  (as makeblastdb does) and recorded in side arrays so scores can be
  re-evaluated against the true bases (role of
  Blast_HSPListReevaluateWithAmbiguitiesGapped, blast_hits.c);
* ``shard()`` splits the database into length-balanced contiguous slices for
  placement on a device mesh.

On disk: a directory holding ``manifest.json`` + ``arrays.npz``.
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass
from pathlib import Path
from typing import Iterable, Sequence

import numpy as np

from gblastn_tpu.io.encoding import (
    blastna_to_2na,
    pack_2na,
    seq_to_blastna,
    unpack_2na,
)
from gblastn_tpu.io.fasta import FastaRecord, parse_fasta

# Subject starts are aligned to this many bases (multiple of 4 so packed
# bytes don't straddle subjects; 128 keeps device blocks lane-aligned).
PAD = 128

FORMAT_VERSION = 1


@dataclass(frozen=True)
class DBInfo:
    title: str
    num_seqs: int
    total_length: int  # sum of true (unpadded) lengths
    max_length: int


class SequenceDB:
    """In-memory database over a packed 2-bit buffer."""

    def __init__(
        self,
        packed: np.ndarray,           # uint8, concatenated padded subjects
        starts: np.ndarray,           # int64[num_seqs] base offset of subject i
        lengths: np.ndarray,          # int64[num_seqs] true length of subject i
        ids: list[str],
        titles: list[str] | None = None,
        ambig_pos: np.ndarray | None = None,   # int64[n] absolute base positions
        ambig_code: np.ndarray | None = None,  # uint8[n] original BLASTNA codes
        title: str = "",
    ):
        self.packed = np.asarray(packed, dtype=np.uint8)
        self.starts = np.asarray(starts, dtype=np.int64)
        self.lengths = np.asarray(lengths, dtype=np.int64)
        self.ids = list(ids)
        self.titles = list(titles) if titles is not None else [""] * len(ids)
        self.ambig_pos = (
            np.asarray(ambig_pos, dtype=np.int64)
            if ambig_pos is not None else np.zeros(0, dtype=np.int64)
        )
        self.ambig_code = (
            np.asarray(ambig_code, dtype=np.uint8)
            if ambig_code is not None else np.zeros(0, dtype=np.uint8)
        )
        self.title = title

    # ------------------------------------------------------------------ build
    @classmethod
    def from_records(
        cls, records: Iterable[FastaRecord], title: str = ""
    ) -> "SequenceDB":
        ids: list[str] = []
        titles: list[str] = []
        lengths: list[int] = []
        starts: list[int] = []
        packed_parts: list[np.ndarray] = []
        ambig_pos_parts: list[np.ndarray] = []
        ambig_code_parts: list[np.ndarray] = []
        cursor = 0
        for oid, rec in enumerate(records):
            codes = seq_to_blastna(rec.sequence)
            codes2, ambig = blastna_to_2na(codes, seed=oid)
            n = len(codes2)
            # Always keep at least one pad base between subjects so the
            # device validity mask separates them (pad plays the role of
            # the sentinel byte in the reference's unpacked sequences).
            pad = (-n) % PAD or PAD
            if pad:
                codes2 = np.concatenate([codes2, np.zeros(pad, dtype=np.uint8)])
            packed_parts.append(pack_2na(codes2))
            ids.append(rec.seq_id)
            titles.append(rec.title)
            lengths.append(n)
            starts.append(cursor)
            if ambig.any():
                idx = np.nonzero(ambig)[0]
                ambig_pos_parts.append(idx + cursor)
                ambig_code_parts.append(codes[idx])
            cursor += n + pad
        if not ids:
            raise ValueError("empty database")
        return cls(
            packed=np.concatenate(packed_parts),
            starts=np.array(starts, dtype=np.int64),
            lengths=np.array(lengths, dtype=np.int64),
            ids=ids,
            titles=titles,
            ambig_pos=(np.concatenate(ambig_pos_parts)
                       if ambig_pos_parts else None),
            ambig_code=(np.concatenate(ambig_code_parts)
                        if ambig_code_parts else None),
            title=title,
        )

    @classmethod
    def from_fasta(cls, path, title: str = "") -> "SequenceDB":
        return cls.from_records(parse_fasta(path), title=title or str(path))

    # ------------------------------------------------------------------ props
    @property
    def num_seqs(self) -> int:
        return len(self.ids)

    @property
    def total_length(self) -> int:
        return int(self.lengths.sum())

    @property
    def padded_length(self) -> int:
        return len(self.packed) * 4

    def info(self) -> DBInfo:
        return DBInfo(
            title=self.title,
            num_seqs=self.num_seqs,
            total_length=self.total_length,
            max_length=int(self.lengths.max()),
        )

    # ------------------------------------------------------------------ access
    def get_sequence_2na(self, oid: int) -> np.ndarray:
        """Unpacked 2-bit codes of one subject (uint8)."""
        start = int(self.starts[oid])
        n = int(self.lengths[oid])
        b0 = start // 4
        b1 = (start + n + 3) // 4
        return unpack_2na(self.packed[b0:b1], n)

    def get_sequence_blastna(self, oid: int) -> np.ndarray:
        """Subject in BLASTNA codes with true ambiguity codes restored."""
        seq = self.get_sequence_2na(oid).copy()
        if len(self.ambig_pos):
            start = int(self.starts[oid])
            n = int(self.lengths[oid])
            sel = (self.ambig_pos >= start) & (self.ambig_pos < start + n)
            seq[self.ambig_pos[sel] - start] = self.ambig_code[sel]
        return seq

    def unpacked(self) -> np.ndarray:
        """Whole padded buffer as 2-bit codes (uint8[padded_length])."""
        return unpack_2na(self.packed, self.padded_length)

    def valid_mask(self) -> np.ndarray:
        """bool[padded_length]: True for real subject bases, False for pad.

        Pad bases separate subjects and act as extension sentinels on
        device (the unpacked-sequence sentinel byte of the reference).
        """
        mask = np.zeros(self.padded_length, dtype=bool)
        for s, n in zip(self.starts, self.lengths):
            mask[int(s): int(s) + int(n)] = True
        return mask

    def oid_of_position(self, base_pos: np.ndarray) -> np.ndarray:
        """Map absolute base positions in the packed space to subject oids."""
        return np.searchsorted(self.starts, base_pos, side="right") - 1

    # ------------------------------------------------------------------ shard
    def shard(self, n_shards: int) -> list["SequenceDB"]:
        """Split into ``n_shards`` length-balanced contiguous oid ranges."""
        if n_shards <= 0:
            raise ValueError("n_shards must be positive")
        cum = np.concatenate([[0], np.cumsum(self.lengths)])
        total = cum[-1]
        bounds = [0]
        for k in range(1, n_shards):
            target = total * k / n_shards
            b = int(np.searchsorted(cum, target))
            bounds.append(min(max(b, bounds[-1]), self.num_seqs))
        bounds.append(self.num_seqs)
        shards = []
        for a, b in zip(bounds[:-1], bounds[1:]):
            shards.append(self._slice_oids(a, b))
        return shards

    def _slice_oids(self, a: int, b: int) -> "SequenceDB":
        if a >= b:
            # Empty shard: keep a single empty placeholder buffer.
            return SequenceDB(
                packed=np.zeros(PAD // 4, dtype=np.uint8),
                starts=np.zeros(0, dtype=np.int64),
                lengths=np.zeros(0, dtype=np.int64),
                ids=[], titles=[], title=self.title,
            )
        base0 = int(self.starts[a])
        end = (
            int(self.starts[b]) if b < self.num_seqs else self.padded_length
        )
        sel = (self.ambig_pos >= base0) & (self.ambig_pos < end)
        return SequenceDB(
            packed=self.packed[base0 // 4: end // 4],
            starts=self.starts[a:b] - base0,
            lengths=self.lengths[a:b],
            ids=self.ids[a:b],
            titles=self.titles[a:b],
            ambig_pos=self.ambig_pos[sel] - base0,
            ambig_code=self.ambig_code[sel],
            title=self.title,
        )

    # ------------------------------------------------------------------ disk
    def save(self, path) -> None:
        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)
        manifest = {
            "format_version": FORMAT_VERSION,
            "title": self.title,
            "num_seqs": self.num_seqs,
            "total_length": self.total_length,
            "pad": PAD,
            "ids": self.ids,
            "titles": self.titles,
        }
        (path / "manifest.json").write_text(json.dumps(manifest))
        np.savez_compressed(
            path / "arrays.npz",
            packed=self.packed,
            starts=self.starts,
            lengths=self.lengths,
            ambig_pos=self.ambig_pos,
            ambig_code=self.ambig_code,
        )

    @classmethod
    def load(cls, path) -> "SequenceDB":
        path = Path(path)
        if not (path / "manifest.json").exists():
            # fall back to NCBI BLAST database format (.nin/.nal),
            # so makeblastdb-built dbs work directly
            from gblastn_tpu.io.ncbidb import is_ncbi_db, load_ncbi_db

            if is_ncbi_db(path):
                return load_ncbi_db(path)
            raise FileNotFoundError(
                f"{path}: no native db (manifest.json) and no NCBI "
                "BLAST db (.nin/.nal) found"
            )
        manifest = json.loads((path / "manifest.json").read_text())
        arrays = np.load(path / "arrays.npz")
        return cls(
            packed=arrays["packed"],
            starts=arrays["starts"],
            lengths=arrays["lengths"],
            ids=manifest["ids"],
            titles=manifest["titles"],
            ambig_pos=arrays["ambig_pos"],
            ambig_code=arrays["ambig_code"],
            title=manifest["title"],
        )
