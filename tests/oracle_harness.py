"""Harness for the NCBI parity oracle (oracle/driver.c).

The oracle is the reference's UNMODIFIED C engine (compiled from
/root/reference/c++/src/algo/blast/core by oracle/build.py) driven over
FASTA inputs. This module runs it and parses its output into structures
directly comparable with gblastn_tpu's final HSPs, turning the
reference's headline guarantee — output identity with NCBI-BLAST 2.2.28
(reference README.md:4) — into an executable test oracle.
"""
from __future__ import annotations

import subprocess
from dataclasses import dataclass, field
from pathlib import Path

from oracle.build import ensure_oracle


@dataclass(frozen=True)
class OracleHSP:
    query_index: int
    context: int
    oid: int
    q_off: int
    q_end: int
    s_off: int
    s_end: int
    score: int
    num_ident: int
    bit_score: float
    evalue: float
    ops: tuple[tuple[int, int], ...]
    # reference-computed tabular fields (Blast_HSPCalcLengthAndGaps +
    # Blast_HSPGetAdjustedOffsets); None on old driver output
    tabular: tuple[int, ...] | None = None


@dataclass
class OracleRun:
    queries: list[tuple[str, int]] = field(default_factory=list)
    subjects: list[tuple[str, int]] = field(default_factory=list)
    hsps: list[OracleHSP] = field(default_factory=list)
    diag: dict[str, int] = field(default_factory=dict)
    cutoffs: dict[str, int] = field(default_factory=dict)

    def by_query(self, qi: int) -> list[OracleHSP]:
        return [h for h in self.hsps if h.query_index == qi]


def dust_intervals_for_queries(
    queries: list[tuple[str, str]]
) -> list[tuple[int, int, int]]:
    """Compute default-dust mask intervals (0-based half-open, plus
    strand) for each query with our dust module — the same locations the
    reference's C++ layer computes via CSymDustMasker and injects into
    its C core (dust_filter.cpp:Blast_FindDustFilterLoc)."""
    from gblastn_tpu.io.encoding import seq_to_blastna
    from gblastn_tpu.masking.dust import dust_mask

    out = []
    for qi, (_rid, seq) in enumerate(queries):
        for s, e in dust_mask(seq_to_blastna(seq)):
            out.append((qi, s, e + 1))
    return out


def run_oracle(
    query_fa: str,
    subject_fa: str,
    tmp_path: Path,
    task: str = "megablast",
    qmask: list[tuple[int, int, int]] | None = None,
    **opts,
) -> OracleRun:
    """Run the oracle on FASTA text. Extra options are passed through as
    ``-key value`` CLI flags (e.g. ``evalue=1e-5``, ``dust="no"``,
    ``word_size=11``); ``ungapped=True`` becomes a bare ``-ungapped``.
    ``qmask`` is a list of (query_index, start, end) half-open masked
    intervals (dust locations) injected via the driver's -qmask."""
    exe = ensure_oracle()
    qf = tmp_path / "oracle_q.fa"
    sf = tmp_path / "oracle_s.fa"
    qf.write_text(query_fa)
    sf.write_text(subject_fa)
    cmd = [str(exe), "-query", str(qf), "-subject", str(sf), "-task", task]
    if qmask:
        mf = tmp_path / "oracle_qmask.txt"
        mf.write_text(
            "".join(f"{qi} {s} {e}\n" for qi, s, e in qmask)
        )
        cmd += ["-qmask", str(mf)]
    for k, v in opts.items():
        if isinstance(v, bool):
            if v:
                cmd.append(f"-{k}")
        else:
            cmd += [f"-{k}", str(v)]
    res = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    if res.returncode != 0:
        raise RuntimeError(f"oracle failed: {res.stderr}")
    return parse_oracle_output(res.stdout)


def parse_oracle_output(text: str) -> OracleRun:
    run = OracleRun()
    for line in text.splitlines():
        parts = line.rstrip("\n").split("\t")
        if parts[0] == "QUERY":
            run.queries.append((parts[2], int(parts[3])))
        elif parts[0] == "SUBJ":
            run.subjects.append((parts[2], int(parts[3])))
        elif parts[0] == "HSP":
            ops: tuple[tuple[int, int], ...] = ()
            if parts[12] != "-":
                ops = tuple(
                    (int(op), int(num))
                    for op, num in (x.split(":") for x in parts[12].split(","))
                )
            run.hsps.append(
                OracleHSP(
                    query_index=int(parts[1]),
                    context=int(parts[2]),
                    oid=int(parts[3]),
                    q_off=int(parts[4]),
                    q_end=int(parts[5]),
                    s_off=int(parts[6]),
                    s_end=int(parts[7]),
                    score=int(parts[8]),
                    num_ident=int(parts[9]),
                    bit_score=float(parts[10]),
                    evalue=float(parts[11]),
                    ops=ops,
                    tabular=(
                        tuple(int(x) for x in parts[13:20])
                        if len(parts) >= 20 else None
                    ),
                )
            )
        elif parts[0] == "DIAG":
            run.diag = {
                "lookup_hits": int(parts[1]),
                "init_extends": int(parts[2]),
                "good_init_extends": int(parts[3]),
                "gapped_extensions": int(parts[4]),
                "good_gapped_extensions": int(parts[5]),
            }
        elif parts[0] == "CUTOFF":
            run.cutoffs = {
                "x_drop_ungapped": int(parts[1]),
                "x_drop_gap": int(parts[2]),
                "x_drop_gap_final": int(parts[3]),
                "ungapped_cutoff": int(parts[4]),
                "cutoff_score": int(parts[5]),
            }
    return run


def engine_hsp_key(qi: int, oid: int, hsp, strand: str = "both") -> tuple:
    """Comparison key for one of OUR engine's final HSPs.

    Under -strand restriction our engine compresses to one context per
    query while the oracle keeps the 2-per-query numbering with the
    excluded context invalid, so the strand bit comes from the option.
    """
    return (
        qi,
        (hsp.context % 2) if strand == "both"
        else (0 if strand == "plus" else 1),
        oid,
        hsp.q_off,
        hsp.q_end,
        hsp.s_off,
        hsp.s_end,
        hsp.score,
        hsp.num_ident,
        tuple(hsp.edit_script or ()),
    )


def oracle_hsp_key(h: OracleHSP) -> tuple:
    return (
        h.query_index,
        h.context % 2,
        h.oid,
        h.q_off,
        h.q_end,
        h.s_off,
        h.s_end,
        h.score,
        h.num_ident,
        h.ops,
    )
