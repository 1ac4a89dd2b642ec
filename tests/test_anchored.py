"""Query-anchored views (-outfmt 1/2/3/4, format/anchored.py)."""
import io

import numpy as np

from gblastn_tpu.format.anchored import AnchoredWriter
from gblastn_tpu.hits import HSP, OP_DEL, OP_INS, OP_SUB
from gblastn_tpu.io.encoding import seq_to_blastna
from gblastn_tpu.stats.karlin import ungapped_karlin_block

KBP = ungapped_karlin_block(1, -2)


def _render(hsps_by_subject, qseq, show_identities, flat,
            subject_seqs=None):
    out = io.StringIO()
    w = AnchoredWriter(out=out, show_identities=show_identities,
                       flat=flat, dbname="testdb")
    q = seq_to_blastna(qseq.encode())
    hits = []
    for i, (sid, hsps) in enumerate(hsps_by_subject):
        sseq = subject_seqs[sid]
        hits.append((sid, "", len(sseq), hsps,
                     seq_to_blastna(sseq.encode())))
    w.write_query_results(
        "q1", "q1 test", len(qseq), hits,
        lambda ctx: q, KBP, KBP, 1000,
    )
    return out.getvalue()


def test_identities_as_dots():
    #         0123456789
    qseq = "ACGTACGTACGTACGTACGT"
    sseq = "ACGTACGAACGTACGTACGT"          # one mismatch at pos 7
    h = HSP(q_off=0, q_end=20, s_off=0, s_end=20, score=30,
            evalue=1e-9, bit_score=30.0, num_ident=19,
            edit_script=[(OP_SUB, 20)])
    txt = _render([("s1", [h])], qseq, True, False,
                  {"s1": sseq})
    lines = [l for l in txt.splitlines() if l.startswith(("q1", "s1"))]
    assert "ACGTACGTACGTACGTACGT" in lines[0]
    # subject row: dots except the mismatch position
    assert ".......A............" in lines[1]
    assert lines[1].split()[1] == "1"
    assert lines[1].split()[-1] == "20"


def test_no_identities_letters():
    qseq = "ACGTACGTACGTACGTACGT"
    h = HSP(q_off=0, q_end=20, s_off=0, s_end=20, score=30,
            evalue=1e-9, bit_score=30.0, num_ident=20,
            edit_script=[(OP_SUB, 20)])
    txt = _render([("s1", [h])], qseq, False, False, {"s1": qseq})
    lines = [l for l in txt.splitlines() if l.startswith("s1")]
    assert "ACGTACGTACGTACGTACGT" in lines[0]


def test_master_gap_expansion_vs_flat():
    # subject inserts 2 bases after query position 10
    qseq = "ACGTACGTACGTACGTACGT"
    sseq = qseq[:10] + "TT" + qseq[10:]
    script = [(OP_SUB, 10), (OP_DEL, 2), (OP_SUB, 10)]
    h = HSP(q_off=0, q_end=20, s_off=0, s_end=22, score=25,
            evalue=1e-8, bit_score=25.0, num_ident=20,
            edit_script=script)
    # mode 2 (anchored, letters): master gains two '-' columns
    txt = _render([("s1", [h])], qseq, False, False, {"s1": sseq})
    qline = next(l for l in txt.splitlines() if l.startswith("q1 "))
    assert "ACGTACGTAC--GTACGTACGT" in qline
    sline = next(l for l in txt.splitlines() if l.startswith("s1"))
    assert "ACGTACGTACTTGTACGTACGT" in sline
    assert sline.split()[-1] == "22"
    # mode 4 (flat): master unexpanded, insertion hidden, but subject
    # end coordinate still accounts for the hidden bases
    txt = _render([("s1", [h])], qseq, False, True, {"s1": sseq})
    qline = next(l for l in txt.splitlines() if l.startswith("q1 "))
    assert "ACGTACGTACGTACGTACGT" in qline
    sline = next(l for l in txt.splitlines() if l.startswith("s1"))
    assert "ACGTACGTACGTACGTACGT" in sline
    assert sline.split()[-1] == "22"


def test_query_gap_dash():
    # subject deletes 3 query bases (OP_INS consumes query)
    qseq = "ACGTACGTACGTACGTACGT"
    sseq = qseq[:8] + qseq[11:]
    script = [(OP_SUB, 8), (OP_INS, 3), (OP_SUB, 9)]
    h = HSP(q_off=0, q_end=20, s_off=0, s_end=17, score=20,
            evalue=1e-7, bit_score=20.0, num_ident=17,
            edit_script=script)
    txt = _render([("s1", [h])], qseq, False, False, {"s1": sseq})
    sline = next(l for l in txt.splitlines() if l.startswith("s1"))
    assert "ACGTACGT---TACGTACGT"[:8] in sline
    assert "---" in sline
    assert sline.split()[-1] == "17"


def test_minus_strand_descending_coords():
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    qseq = "ACGTTGCAACGTTGCAACGT"
    sseq = "".join(comp[c] for c in reversed(qseq))
    # minus-context HSP: query coords context-local (revcomped query)
    h = HSP(q_off=0, q_end=20, s_off=0, s_end=20, score=30,
            evalue=1e-9, bit_score=30.0, num_ident=20,
            q_frame=-1, context=1, edit_script=[(OP_SUB, 20)])
    txt = _render_minus(qseq, sseq, h)
    sline = next(l for l in txt.splitlines() if l.startswith("s1"))
    parts = sline.split()
    assert int(parts[1]) == 20 and int(parts[-1]) == 1  # descending
    # displayed subject = revcomp(sseq) = qseq -> all dots in mode 1
    assert "." * 20 in sline


def _render_minus(qseq, sseq, h):
    out = io.StringIO()
    w = AnchoredWriter(out=out, show_identities=True, flat=False,
                       dbname="testdb")
    q_plus = seq_to_blastna(qseq.encode())
    from gblastn_tpu.io.encoding import reverse_complement_blastna

    q_minus = reverse_complement_blastna(q_plus)

    def get_query(ctx):
        return q_plus if ctx == 0 else q_minus

    hits = [("s1", "", len(sseq), [h], seq_to_blastna(sseq.encode()))]
    w.write_query_results("q1", "q1", len(qseq), hits, get_query,
                          KBP, KBP, 1000)
    return out.getvalue()


def test_multiple_rows_stack():
    qseq = "ACGTACGTACGTACGTACGT"
    h1 = HSP(q_off=0, q_end=20, s_off=0, s_end=20, score=30,
             evalue=1e-9, bit_score=30.0, num_ident=20,
             edit_script=[(OP_SUB, 20)])
    h2 = HSP(q_off=5, q_end=15, s_off=2, s_end=12, score=15,
             evalue=1e-4, bit_score=15.0, num_ident=10,
             edit_script=[(OP_SUB, 10)])
    txt = _render([("s1", [h1]), ("s2", [h2])], qseq, True, False,
                  {"s1": qseq, "s2": "GG" + qseq[5:15] + "AAAA"})
    lines = txt.splitlines()
    i_q = next(i for i, l in enumerate(lines) if l.startswith("q1 "))
    assert lines[i_q + 1].startswith("s1")
    assert lines[i_q + 2].startswith("s2")
    # s2 only covers query 6..15; padded with spaces elsewhere
    s2 = lines[i_q + 2]
    assert s2.split()[1] == "3" and s2.split()[-1] == "12"


def test_cli_outfmt_1(tmp_path):
    import numpy as np

    from gblastn_tpu.cli.main import main

    rng = np.random.default_rng(5)
    g = "".join("ACGT"[i] for i in rng.integers(0, 4, 5000))
    (tmp_path / "r.fa").write_text(">s1\n" + g + "\n")
    (tmp_path / "q.fa").write_text(">q1\n" + g[1000:1300] + "\n")
    assert main(["makedb", "-in", str(tmp_path / "r.fa"),
                 "-out", str(tmp_path / "db")]) == 0
    outf = tmp_path / "o.txt"
    assert main(["blastn", "-query", str(tmp_path / "q.fa"),
                 "-db", str(tmp_path / "db"), "-outfmt", "1",
                 "-out", str(outf), "-dust", "no"]) == 0
    txt = outf.read_text()
    assert "Query= q1" in txt
    assert "." * 60 in txt          # identity dots
    assert "Lambda" in txt


def test_overlapping_inserts_share_columns():
    """CAlnMix-equivalent merge rule for the query-anchored MSA
    (VERDICT round-4 item 9): when two subjects insert at the SAME
    query position, the master expands by max(insert lengths) gap
    columns (shared, not concatenated), and each subject's insert run
    renders LEFT-ALIGNED within those columns, padded with dashes.
    This pins the exact rendering rule the views implement (the
    reference funnels Seq-aligns through CAlnMix/showalign.cpp, which
    merges coincident inserts into shared columns the same way)."""
    qseq = "ACGTACGTACGTACGTACGT"
    s1 = qseq[:10] + "TT" + qseq[10:]
    s2 = qseq[:10] + "AAA" + qseq[10:]
    h1 = HSP(q_off=0, q_end=20, s_off=0, s_end=22, score=25,
             evalue=1e-8, bit_score=25.0, num_ident=20,
             edit_script=[(OP_SUB, 10), (OP_DEL, 2), (OP_SUB, 10)])
    h2 = HSP(q_off=0, q_end=20, s_off=0, s_end=23, score=24,
             evalue=1e-7, bit_score=24.0, num_ident=20,
             edit_script=[(OP_SUB, 10), (OP_DEL, 3), (OP_SUB, 10)])
    txt = _render([("s1", [h1]), ("s2", [h2])], qseq, False, False,
                  {"s1": s1, "s2": s2})
    qline = next(l for l in txt.splitlines() if l.startswith("q1 "))
    s1line = next(l for l in txt.splitlines() if l.startswith("s1"))
    s2line = next(l for l in txt.splitlines() if l.startswith("s2"))
    # master: ONE shared run of max(2, 3) = 3 gap columns
    assert "ACGTACGTAC---GTACGTACGT" in qline
    # the 2-base insert left-aligns in the shared columns
    assert "ACGTACGTACTT-GTACGTACGT" in s1line
    assert "ACGTACGTACAAAGTACGTACGT" in s2line
    # subject end coordinates include the inserted bases
    assert s1line.split()[-1] == "22"
    assert s2line.split()[-1] == "23"
