"""Tabular report writer (-outfmt 6/7), byte-compatible with NCBI BLAST.

Reimplements the tabular path of the reference formatter (reference:
/root/reference/c++/src/objtools/align_format/tabular.cpp and
align_format_util.cpp:669 ``CAlignFormatUtil::GetScoreString``):

* e-value / bit-score strings reproduce the exact snprintf bucket rules;
* percent identity is fixed 2-decimal (tabular.hpp:382);
* mismatches = align_length - num_ident - gaps (tabular.hpp:420);
* gap opens / gaps / align length follow Blast_HSPCalcLengthAndGaps
  (blast_hits.c:941);
* default fields are the "std" set of -outfmt '6'/'7';
* outfmt 7 comment blocks follow CBlastTabularInfo::PrintHeader
  (tabular.cpp:1043).

Coordinates are printed 1-based; minus-strand HSPs report plus-strand
query coordinates with subject start > end, as blastn does.
"""
from __future__ import annotations

from dataclasses import dataclass, field

from gblastn_tpu.hits import HSP, OP_DEL, OP_INS

DEFAULT_FIELDS = [
    "qseqid", "sseqid", "pident", "length", "mismatch", "gapopen",
    "qstart", "qend", "sstart", "send", "evalue", "bitscore",
]

FIELD_HEADER_NAMES = {
    "qseqid": "query id",
    "sseqid": "subject id",
    "pident": "% identity",
    "length": "alignment length",
    "mismatch": "mismatches",
    "gapopen": "gap opens",
    "qstart": "q. start",
    "qend": "q. end",
    "sstart": "s. start",
    "send": "s. end",
    "evalue": "evalue",
    "bitscore": "bit score",
    "score": "score",
    "nident": "identical",
    "gaps": "gaps",
    "qlen": "query length",
    "slen": "subject length",
    "sstrand": "subject strand",
    "frames": "query/sbjct frames",
}

PROGRAM_VERSION = "GBLASTN-TPU 0.1.0"


def evalue_string(evalue: float) -> str:
    """GetScoreString e-value buckets (align_format_util.cpp:694-714)."""
    if evalue < 1.0e-180:
        return "0.0"
    if evalue < 1.0e-99:
        return f"{evalue:.0e}"
    if evalue < 0.0009:
        return f"{evalue:.0e}"
    if evalue < 0.1:
        return f"{evalue:.3f}"
    if evalue < 1.0:
        return f"{evalue:.2f}"
    if evalue < 10.0:
        return f"{evalue:.1f}"
    return f"{evalue:5.0f}"


def bit_score_string(bit_score: float) -> str:
    """GetScoreString bit-score buckets (align_format_util.cpp:716-724)."""
    if bit_score > 9999:
        return f"{bit_score:.3e}"
    if bit_score > 99.9:
        return f"{int(bit_score):4d}"
    return f"{bit_score:4.1f}"


def calc_length_and_gaps(hsp: HSP) -> tuple[int, int, int]:
    """Blast_HSPCalcLengthAndGaps (blast_hits.c:941).
    Returns (align_length, gaps, gap_opens)."""
    length = hsp.q_end - hsp.q_off
    s_length = hsp.s_end - hsp.s_off
    gap_opens = 0
    gaps = 0
    if hsp.edit_script:
        for op, num in hsp.edit_script:
            if op == OP_DEL:
                length += num
                gaps += num
                gap_opens += 1
            elif op == OP_INS:
                gap_opens += 1
                gaps += num
    elif s_length > length:
        length = s_length
    return length, gaps, gap_opens


@dataclass
class TabularHit:
    """One formatted alignment line's raw values."""

    qseqid: str
    sseqid: str
    num_ident: int
    align_length: int
    gaps: int
    gap_opens: int
    qstart: int
    qend: int
    sstart: int
    send: int
    evalue: float
    bit_score: float
    score: int = 0
    qlen: int = 0
    slen: int = 0
    sstrand: str = "plus"
    q_frame: int = 1


def hsp_to_tabular(
    hsp: HSP,
    qseqid: str,
    sseqid: str,
    query_length: int,
    subject_length: int,
) -> TabularHit:
    """Convert a finished HSP (context-local coords) to report values."""
    align_length, gaps, gap_opens = calc_length_and_gaps(hsp)
    if hsp.q_frame >= 0:
        qstart = hsp.q_off + 1
        qend = hsp.q_end
        sstart = hsp.s_off + 1
        send = hsp.s_end
        strand = "plus"
    else:
        # minus-strand context: query coords flip to plus-strand
        # original coordinates, subject prints reversed
        qstart = query_length - hsp.q_end + 1
        qend = query_length - hsp.q_off
        sstart = hsp.s_end
        send = hsp.s_off + 1
        strand = "minus"
    return TabularHit(
        qseqid=qseqid, sseqid=sseqid,
        num_ident=hsp.num_ident, align_length=align_length,
        gaps=gaps, gap_opens=gap_opens,
        qstart=qstart, qend=qend, sstart=sstart, send=send,
        evalue=hsp.evalue, bit_score=hsp.bit_score, score=hsp.score,
        qlen=query_length, slen=subject_length,
        sstrand=strand, q_frame=1 if hsp.q_frame >= 0 else -1,
    )


def format_field(hit: TabularHit, name: str) -> str:
    if name == "qseqid":
        return hit.qseqid
    if name == "sseqid":
        return hit.sseqid
    if name == "pident":
        p = (
            hit.num_ident / hit.align_length * 100
            if hit.align_length > 0 else 0.0
        )
        return f"{p:.2f}"
    if name == "length":
        return str(hit.align_length)
    if name == "mismatch":
        return str(hit.align_length - hit.num_ident - hit.gaps)
    if name == "gapopen":
        return str(hit.gap_opens)
    if name == "gaps":
        return str(hit.gaps)
    if name == "nident":
        return str(hit.num_ident)
    if name == "qstart":
        return str(hit.qstart)
    if name == "qend":
        return str(hit.qend)
    if name == "sstart":
        return str(hit.sstart)
    if name == "send":
        return str(hit.send)
    if name == "evalue":
        return evalue_string(hit.evalue)
    if name == "bitscore":
        return bit_score_string(hit.bit_score)
    if name == "score":
        return str(hit.score)
    if name == "qlen":
        return str(hit.qlen)
    if name == "slen":
        return str(hit.slen)
    if name == "sstrand":
        return hit.sstrand
    raise ValueError(f"unsupported tabular field {name!r}")


@dataclass
class TabularWriter:
    """outfmt 6 (plain) / 7 (commented) / 10 (CSV) writer.

    outfmt 10 prints the identical field strings joined by ','
    (CBlastTabularInfo::Print with the eComma delimiter,
    tabular.cpp:121-129, :925-933) with no comment lines."""

    out: object                     # file-like
    fields: list[str] = field(default_factory=lambda: list(DEFAULT_FIELDS))
    commented: bool = False         # outfmt 7
    dbname: str = ""
    program: str = PROGRAM_VERSION
    delimiter: str = "\t"           # ',' for outfmt 10

    def write_query_results(
        self, query_id: str, query_title: str, hits: list[TabularHit]
    ) -> None:
        if self.commented:
            self.out.write(f"# {self.program}\n")
            title = query_title or query_id
            self.out.write(f"# Query: {title}\n")
            self.out.write(f"# Database: {self.dbname}\n")
            if hits:
                names = ", ".join(FIELD_HEADER_NAMES[f] for f in self.fields)
                self.out.write(f"# Fields: {names}\n")
            self.out.write(f"# {len(hits)} hits found\n")
        for h in hits:
            self.out.write(
                self.delimiter.join(
                    format_field(h, f) for f in self.fields
                ) + "\n"
            )

    def finalize(self, num_queries: int) -> None:
        if self.commented:
            self.out.write(f"# BLAST processed {num_queries} queries\n")
