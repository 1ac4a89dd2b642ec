"""Seq-align object layer + ASN.1 writers (outfmt 8/9/10/11 support)."""
from __future__ import annotations

import numpy as np

from gblastn_tpu.hits import HSP, OP_DEL, OP_INS, OP_SUB
from gblastn_tpu.io.ncbidb import _ber_parse
from gblastn_tpu.objects.asn1 import (
    Int,
    Real,
    Str,
    _real_parts,
    to_ber,
    to_text,
)
from gblastn_tpu.objects.seqalign import (
    collect_segments,
    seq_align,
    seq_annot,
)


def _hsp(minus=False, script=None):
    return HSP(
        q_off=10, q_end=40, s_off=100, s_end=130 + (
            sum(n for op, n in script if op == OP_DEL)
            - sum(n for op, n in script if op == OP_INS)
            if script else 0
        ),
        score=55, context=1 if minus else 0,
        q_frame=-1 if minus else 1,
        evalue=3.5e-20, bit_score=102.4, num_ident=28,
        edit_script=script,
    )


def test_real_parts():
    assert _real_parts(0.0) == (0, 0)
    m, e = _real_parts(970.0)
    assert m * 10.0 ** e == 970.0
    m, e = _real_parts(3.5e-20)
    assert abs(m * 10.0 ** e - 3.5e-20) < 1e-30
    m, e = _real_parts(-0.25)
    assert m * 10.0 ** e == -0.25


def test_collect_segments_plus_with_gaps():
    # 10 sub, 2 ins (query), 10 sub, 3 del (subject), 10 sub
    script = [(OP_SUB, 10), (OP_INS, 2), (OP_SUB, 10),
              (OP_DEL, 3), (OP_SUB, 10)]
    h = HSP(q_off=5, q_end=37, s_off=50, s_end=83, score=1,
            edit_script=script)
    starts, lens, strands = collect_segments(h, 100)
    assert lens == [10, 2, 10, 3, 10]
    assert starts == [
        5, 50,      # sub
        15, -1,     # ins: query advances, subject gap
        17, 60,     # sub
        -1, 70,     # del
        17 + 10, 73,
    ]
    # gap rows take the other row's strand except in segment 0
    # (blast_seqalign.cpp:223,236)
    assert [s.name for s in strands[0::2]] == ["plus"] * 5
    assert [s.name for s in strands[1::2]] == ["plus"] * 5


def test_collect_segments_leading_gap_unknown_strand():
    # a leading gap segment's gapped row has strand unknown
    script = [(OP_DEL, 4), (OP_SUB, 10)]
    h = HSP(q_off=0, q_end=10, s_off=20, s_end=34, score=1,
            edit_script=script)
    _, _, strands = collect_segments(h, 100)
    assert [s.name for s in strands] == [
        "unknown", "plus", "plus", "plus"
    ]


def test_collect_segments_minus_strand():
    # minus-strand context: starts convert to plus coordinates
    script = [(OP_SUB, 20)]
    h = HSP(q_off=10, q_end=30, s_off=100, s_end=120, score=1,
            q_frame=-1, edit_script=script)
    starts, lens, strands = collect_segments(h, 50)
    assert starts == [50 - 10 - 20, 100]
    assert [s.name for s in strands] == ["minus", "plus"]


def test_seq_align_text_shape():
    h = _hsp(script=[(OP_SUB, 30)])
    txt = to_text("Seq-align", seq_align(h, "q1", "ref", 200))
    assert txt.startswith("Seq-align ::= {\n")
    assert "type partial" in txt
    assert 'id str "score"' in txt
    assert "value int 55" in txt
    assert 'local str "q1"' in txt
    assert "segs denseg" in txt
    assert "strands {\n" in txt


def test_seq_annot_ber_roundtrip():
    h = _hsp(script=[(OP_SUB, 30)])
    annot = seq_annot(
        [seq_align(h, "q1", "ref", 200)],
        task="megablast", db_title="testdb",
    )
    blob = to_ber(annot)
    _, tag, constructed, children, off = _ber_parse(blob, 0)
    assert off == len(blob)

    # Seq-annot SEQUENCE with members [desc]=3 and [data]=4
    assert tag == 16 and constructed
    assert [c[1] for c in children] == [3, 4]
    # data member wraps the CHOICE: align [1] -> SET OF Seq-align
    data_choice = children[1][3][0]
    assert data_choice[1] == 1 and data_choice[2]
    aligns = data_choice[3][0]
    assert aligns[1] == 17           # SET OF
    sa = aligns[3][0]
    assert sa[1] == 16
    # Seq-align members: type(0), dim(1), score(2), segs(3)
    assert [c[1] for c in sa[3]] == [0, 1, 2, 3]


def test_ber_primitives():
    _, tag, _, content, _ = _ber_parse(to_ber(Int(-300)), 0)
    assert tag == 2
    assert int.from_bytes(content, "big", signed=True) == -300
    _, tag, _, content, _ = _ber_parse(to_ber(Str("hello")), 0)
    assert tag == 26 and content == b"hello"
    _, tag, _, content, _ = _ber_parse(to_ber(Real(1.5e-30)), 0)
    assert tag == 9
    assert content[0:1] == b"\x03"
    assert float(content[1:].decode()) == 1.5e-30


def test_csv_delimiter():
    import io

    from gblastn_tpu.format.tabular import TabularHit, TabularWriter

    out = io.StringIO()
    w = TabularWriter(out=out, delimiter=",")
    h = TabularHit(
        qseqid="q1", sseqid="s1", num_ident=50, align_length=50,
        gaps=0, gap_opens=0, qstart=1, qend=50, sstart=1, send=50,
        evalue=1e-20, bit_score=93.0, score=50, qlen=50, slen=100,
    )
    w.write_query_results("q1", "q1", [h])
    line = out.getvalue().strip()
    assert line.count(",") == 11
    assert line.startswith("q1,s1,100.00,50,")
