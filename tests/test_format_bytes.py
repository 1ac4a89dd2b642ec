"""Byte-level parity of the tabular number rendering vs the REFERENCE.

The engine oracle (tests/test_oracle_parity.py) proves bit-identical
HSPs -- scores, e-values as doubles, coordinates. What it cannot prove
is that our TEXT rendering of those numbers matches the reference's
formatted bytes (-outfmt 6/7): the snprintf bucket chain of
``CAlignFormatUtil::GetScoreString``
(/root/reference/c++/src/objtools/align_format/align_format_util.cpp:669)
and the fixed-precision percent-identity of
``CBlastTabularInfo::x_PrintPercentIdentical``
(/root/reference/c++/include/objtools/align_format/tabular.hpp:382, via
``NStr::DoubleToString(x, 2)`` == ``%.2f``,
/root/reference/c++/src/corelib/ncbistr.cpp:2196).

This test closes that gap WITHOUT copying reference code: it PARSES the
threshold/format chain out of the reference source at test time,
generates a tiny C renderer from the parsed table, compiles it with the
host toolchain (the same glibc snprintf the reference app would use),
sweeps boundary values +-ulp plus a dense log-uniform sample, and
requires our Python renderer to produce identical bytes for every one.
Any drift -- in the reference file, in our renderer, or between glibc
and Python float formatting -- fails the test.

Reference-certified fixed points (from the reference's own unit test,
unit_tests/blast_format/blastfmtutil_unit_test.cpp:187-188) are also
asserted directly.
"""
from __future__ import annotations

import math
import re
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from gblastn_tpu.format.tabular import bit_score_string, evalue_string

REF = Path(
    "/root/reference/c++/src/objtools/align_format/align_format_util.cpp"
)


def _parse_score_string_chains():
    """Extract the ordered (threshold, format) chains for the e-value
    and bit-score buckets from GetScoreString's source text."""
    text = REF.read_text()
    m = re.search(
        r"void CAlignFormatUtil::GetScoreString\(.*?\n\}\n",
        text, re.S,
    )
    assert m, "GetScoreString not found in reference source"
    body = m.group(0)

    # e-value chain: if (evalue < X) snprintf(..., "FMT"[, evalue]);
    ev = re.findall(
        r'(?:if|else if)\s*\(evalue\s*<\s*([0-9.eE+-]+)\)\s*\{\s*'
        r'snprintf\(evalue_buf,\s*sizeof\(evalue_buf\),\s*"([^"]+)"',
        body,
    )
    # final else bucket
    ev_else = re.search(
        r'\}\s*else\s*\{\s*\n?\s*'
        r'snprintf\(evalue_buf,\s*sizeof\(evalue_buf\),\s*"([^"]+)"',
        body,
    )
    assert len(ev) >= 6 and ev_else, f"unexpected e-value chain: {ev}"

    # bit-score chain: > thresholds with an optional (long) cast
    bs = re.findall(
        r'(?:if|else if)\s*\(bit_score\s*>\s*([0-9.eE+-]+)\)\s*\{\s*'
        r'snprintf\(bit_score_buf,\s*sizeof\(bit_score_buf\),\s*"([^"]+)",'
        r'\s*(\(long\))?\s*bit_score\)',
        body,
    )
    assert len(bs) == 2, f"unexpected bit-score chain: {bs}"
    # final bucket uses kBitScoreFormat (non-CTOOLKIT default)
    kfmt = re.search(r'kBitScoreFormat\("([^"]+)"\)', body)
    assert kfmt, "kBitScoreFormat not found"
    return ev, ev_else.group(1), bs, kfmt.group(1)


def _build_renderer(tmpdir: Path) -> Path:
    ev, ev_else, bs, bs_else = _parse_score_string_chains()

    lines = []
    first = True
    for thresh, fmt in ev:
        kw = "if" if first else "else if"
        first = False
        if "%" in fmt:
            lines.append(
                f'    {kw} (e < {thresh}) '
                f'snprintf(eb, sizeof eb, "{fmt}", e);'
            )
        else:
            lines.append(
                f'    {kw} (e < {thresh}) '
                f'snprintf(eb, sizeof eb, "{fmt}");'
            )
    lines.append(f'    else snprintf(eb, sizeof eb, "{ev_else}", e);')
    ev_code = "\n".join(lines)

    bs_lines = []
    first = True
    for thresh, fmt, cast in bs:
        kw = "if" if first else "else if"
        first = False
        bs_lines.append(
            f'    {kw} (b > {thresh}) '
            f'snprintf(bb, sizeof bb, "{fmt}", {cast or ""}b);'
        )
    bs_lines.append(f'    else snprintf(bb, sizeof bb, "{bs_else}", b);')
    bs_code = "\n".join(bs_lines)

    src = tmpdir / "render.c"
    src.write_text(
        "#include <stdio.h>\n"
        "int main(void) {\n"
        "  double e, b, p;\n"
        "  char eb[100], bb[100];\n"
        '  while (scanf("%la %la %la", &e, &b, &p) == 3) {\n'
        f"{ev_code}\n"
        f"{bs_code}\n"
        # pident: NStr::DoubleToString(x, 2) == "%.*f" with precision 2
        # (ncbistr.cpp:2196, fDoubleFixed default)
        '    printf("%s\\t%s\\t%.2f\\n", eb, bb, p);\n'
        "  }\n"
        "  return 0;\n"
        "}\n"
    )
    exe = tmpdir / "render"
    subprocess.run(
        ["gcc", "-O1", "-o", str(exe), str(src)],
        check=True, capture_output=True,
    )
    return exe


def _ulp_neighbors(x: float) -> list[float]:
    return [
        np.nextafter(x, -np.inf), x, np.nextafter(x, np.inf),
    ]


@pytest.fixture(scope="module")
def renderer(tmp_path_factory):
    if not REF.exists():
        pytest.skip("reference tree unavailable")
    return _build_renderer(tmp_path_factory.mktemp("fmt"))


def test_reference_certified_fixed_points():
    """Expectations hard-coded in the reference's own unit test
    (blastfmtutil_unit_test.cpp:187-188)."""
    assert evalue_string(217774e-146) == "2e-141"
    assert bit_score_string(503.263) == " 503"


def test_score_string_bytes_vs_reference_chain(renderer):
    rng = np.random.default_rng(42)

    evalues = [0.0, 5e-324, 1e-300, 1e-200, 1e-181]
    for b in (1.0e-180, 1.0e-99, 0.0009, 0.1, 1.0, 10.0):
        evalues += _ulp_neighbors(b)
    evalues += [9.9999999e-100, 9.4999e-4, 8.9999e-4, 0.0995, 0.09949,
                0.9949, 0.99501, 9.949, 9.951, 10.5, 99.5, 1e5, 2.5,
                217774e-146]
    evalues += list(10.0 ** rng.uniform(-185, 3, 3000))

    bits = [0.0, 1.0, 23.3, 99.89999, 99.95]
    for b in (99.9, 9999.0):
        bits += _ulp_neighbors(b)
    bits += [9999.5, 10000.4, 12345.678, 503.263, 4.5, 99.849, 99.851]
    bits += list(10.0 ** rng.uniform(-1, 4.6, 3000))

    pid_pairs = [(i, n) for n in range(1, 40) for i in range(n + 1)]
    pid_pairs += [
        (int(i), int(n))
        for n, i in zip(
            rng.integers(1, 100000, 2500),
            rng.integers(0, 100000, 2500),
        )
        if i <= n
    ]
    pidents = [100.0 * i / n if n > 0 else 0.0 for i, n in pid_pairs]

    n = max(len(evalues), len(bits), len(pidents))
    evalues += [1.0] * (n - len(evalues))
    bits += [50.0] * (n - len(bits))
    pidents += [100.0] * (n - len(pidents))

    feed = "\n".join(
        f"{e.hex() if isinstance(e, float) else float(e).hex()} "
        f"{float(b).hex()} {float(p).hex()}"
        for e, b, p in zip(evalues, bits, pidents)
    )
    out = subprocess.run(
        [str(renderer)], input=feed.encode(),
        capture_output=True, check=True,
    ).stdout.decode()
    rows = out.splitlines()
    assert len(rows) == n

    bad = []
    for (e, b, p), row in zip(zip(evalues, bits, pidents), rows):
        ce, cb, cp = row.split("\t")
        pe, pb = evalue_string(float(e)), bit_score_string(float(b))
        pp = f"{float(p):.2f}"
        if (pe, pb, pp) != (ce, cb, cp):
            bad.append((e, b, p, (ce, cb, cp), (pe, pb, pp)))
    assert not bad, (
        f"{len(bad)} rendering mismatches vs reference chain; first 5: "
        f"{bad[:5]}"
    )


def test_outfmt6_bytes_vs_oracle(renderer, tmp_path):
    """End-to-end -outfmt 6 byte parity on a mini DB: every tabular line
    our CLI renderer emits must byte-equal a line assembled ENTIRELY
    from reference-computed numbers -- engine doubles and tabular field
    values from the oracle (the reference's own Blast_HSPCalcLengthAndGaps
    + Blast_HSPGetAdjustedOffsets), text-rendered through the C chain
    parsed out of the reference formatter source."""
    import io

    from gblastn_tpu.engine.search import search
    from gblastn_tpu.format.render import ResultRenderer
    from gblastn_tpu.io.fasta import FastaRecord
    from gblastn_tpu.io.seqdb import SequenceDB
    from gblastn_tpu.params.options import megablast_options

    from tests.oracle_harness import run_oracle

    rng = np.random.default_rng(5150)
    bases = "ACGT"

    def rand_seq(n):
        return "".join(bases[i] for i in rng.integers(0, 4, n))

    def mutate(s, sub=0.03, indel=0.004):
        out = []
        for c in s:
            r = rng.random()
            if r < indel / 2:
                continue
            if r < indel:
                out.append(bases[rng.integers(0, 4)])
            if rng.random() < sub:
                c = bases[(bases.index(c) + 1 + rng.integers(0, 3)) % 4]
            out.append(c)
        return "".join(out)

    comp = str.maketrans("ACGT", "TGCA")
    g1, g2 = rand_seq(8000), rand_seq(6000)
    subjects = [("subj1", g1), ("subj2", g2)]
    queries = []
    for k in range(12):
        src = g1 if k % 2 else g2
        st = int(rng.integers(0, len(src) - 700))
        frag = mutate(src[st: st + int(rng.integers(150, 700))])
        if k % 3 == 2:
            frag = frag.translate(comp)[::-1]
        queries.append((f"q{k}", frag))

    options = megablast_options(evalue=10, dust=False)
    db = SequenceDB.from_records(
        [FastaRecord(rid, "", s) for rid, s in subjects], title="minidb"
    )
    res = search([FastaRecord(rid, "", s) for rid, s in queries], db,
                 options)
    buf = io.StringIO()
    rend = ResultRenderer(6, None, buf, db, options, "minidb",
                          "megablast")
    rend.emit(res)
    ours = buf.getvalue().splitlines()

    orun = run_oracle(
        "".join(f">{rid}\n{s}\n" for rid, s in queries),
        "".join(f">{rid}\n{s}\n" for rid, s in subjects),
        tmp_path, task="megablast", evalue=10, dust="no",
    )
    assert orun.hsps and all(h.tabular for h in orun.hsps)

    feed = "\n".join(
        f"{h.evalue.hex()} {h.bit_score.hex()} "
        f"{(h.num_ident / h.tabular[0] * 100).hex()}"
        for h in orun.hsps
    )
    rendered = subprocess.run(
        [str(renderer)], input=feed.encode(),
        capture_output=True, check=True,
    ).stdout.decode().splitlines()

    expected = []
    for h, row in zip(orun.hsps, rendered):
        ce, cb, cp = row.split("\t")
        aln_len, gaps, gap_opens, qs1, qe1, ss1, se1 = h.tabular
        expected.append(
            f"{queries[h.query_index][0]}\t{subjects[h.oid][0]}\t{cp}\t"
            f"{aln_len}\t{aln_len - h.num_ident - gaps}\t{gap_opens}\t"
            f"{qs1}\t{qe1}\t{ss1}\t{se1}\t{ce}\t{cb}"
        )

    assert sorted(ours) == sorted(expected), (
        "formatted-byte mismatch:\n  ours-only: "
        f"{sorted(set(ours) - set(expected))[:4]}\n  oracle-only: "
        f"{sorted(set(expected) - set(ours))[:4]}"
    )
    assert len(ours) == len(expected)


def test_full_tabular_line_bytes(renderer):
    """Whole-line byte check: std 12-field lines rendered by our writer
    equal lines assembled from the C-rendered number fields + integer
    fields (which are plain %d on both sides)."""
    from gblastn_tpu.format.tabular import (
        DEFAULT_FIELDS,
        TabularHit,
        format_field,
    )

    rng = np.random.default_rng(7)
    cases = []
    for _ in range(500):
        length = int(rng.integers(20, 5000))
        ident = int(rng.integers(max(0, length - 300), length + 1))
        gaps = int(rng.integers(0, 20))
        gopen = int(rng.integers(0, min(gaps, 5) + 1))
        ev = float(10.0 ** rng.uniform(-185, 2))
        bits = float(10.0 ** rng.uniform(0.5, 4.3))
        cases.append((length, ident, gaps, gopen, ev, bits))

    feed = "\n".join(
        f"{e.hex()} {b.hex()} "
        f"{(100.0 * i / l).hex()}"
        for l, i, g, go, e, b in cases
    )
    out = subprocess.run(
        [str(renderer)], input=feed.encode(),
        capture_output=True, check=True,
    ).stdout.decode().splitlines()

    for (l, i, g, go, ev, bits), crow in zip(cases, out):
        ce, cb, cp = crow.split("\t")
        hit = TabularHit(
            qseqid="q1", sseqid="s1", num_ident=i, align_length=l,
            gaps=g, gap_opens=go, qstart=11, qend=11 + l - 1,
            sstart=301, send=301 + l - 1, evalue=ev, bit_score=bits,
        )
        line = "\t".join(
            format_field(hit, f) for f in DEFAULT_FIELDS
        )
        expected = (
            f"q1\ts1\t{cp}\t{l}\t{l - i - g}\t{go}\t11\t{11 + l - 1}"
            f"\t301\t{301 + l - 1}\t{ce}\t{cb}"
        )
        assert line == expected, (line, expected)


def test_default_fields_and_delimiters_match_reference():
    """The std field list and the outfmt 6/7/10 delimiters are parsed
    from the reference source, not hand-maintained: DEFAULT_FIELDS must
    equal kDfltArgTabularOutputFmt (format_flags.cpp) token for token,
    and the writer delimiters must match the eTab/eComma/eSpace switch
    (tabular.cpp CBlastTabularInfo ctor)."""
    from gblastn_tpu.format.tabular import DEFAULT_FIELDS, TabularWriter

    ff = Path(
        "/root/reference/c++/src/objtools/align_format/format_flags.cpp"
    )
    if not ff.exists():
        pytest.skip("reference tree unavailable")
    m = re.search(
        r'kDfltArgTabularOutputFmt\s*=\s*((?:"[^"]*"\s*)+);',
        ff.read_text(),
    )
    assert m, "kDfltArgTabularOutputFmt not found"
    spec = "".join(re.findall(r'"([^"]*)"', m.group(1)))
    ref_fields = spec.split()
    # our spelling normalizes nothing: the token list must match 1:1
    assert list(DEFAULT_FIELDS) == ref_fields

    tab = Path(
        "/root/reference/c++/src/objtools/align_format/tabular.cpp"
    )
    delims = dict(re.findall(
        r"case (e\w+): m_FieldDelimiter = '(.)'; break;",
        tab.read_text(),
    ))
    default_m = re.search(
        r"default: m_FieldDelimiter = '\\?(.)';", tab.read_text()
    )
    assert default_m and default_m.group(1) == "t"   # eTab -> '\t'
    assert delims.get("eComma") == ","
    import io

    assert TabularWriter(out=io.StringIO()).delimiter == "\t"


def test_pairwise_header_semantics_from_reference():
    """The outfmt-0 per-HSP header lines follow the reference stream
    literally: parse the ostream pieces and the GetPercentMatch
    rounding out of showalign.cpp / align_format_util.cpp and check
    our renderer's bytes for a value sweep (199/200 must print 99%,
    never 100%; the bit-score keeps its 4-wide padding)."""
    sa = Path(
        "/root/reference/c++/src/objtools/align_format/showalign.cpp"
    )
    au = Path(
        "/root/reference/c++/src/objtools/align_format/"
        "align_format_util.cpp"
    )
    if not sa.exists():
        pytest.skip("reference tree unavailable")
    text = sa.read_text()
    # the identity line literals
    m = re.search(
        r'out<<" Identities = "<<match<<"/"<<\(aln_stop\+1\)'
        r'<<" \("<<identity<<"%"<<"\)"', text)
    assert m, "identity stream literal changed in reference"
    assert 'out<<" Score = "<<bit_score_buf<<" ";' in text
    assert 'out<<"bits ("<<aln_vec_info->score<<"),"<<"  ";' in text

    # GetPercentMatch: exact -> 100 else min(99, round-half-up)
    gm = re.search(
        r"GetPercentMatch\(int numerator, int denominator\)\s*\{\s*"
        r"if \(numerator == denominator\)\s*return 100;.*?"
        r"0\.5 \+ 100\.0\*.*?min\(99, retval\)",
        au.read_text(), re.S)
    assert gm, "GetPercentMatch body changed in reference"

    from gblastn_tpu.format.tabular import percent_match

    def ref_percent(n, d):
        if n == d:
            return 100
        return min(99, int(0.5 + 100.0 * n / d))

    for d in list(range(1, 300)) + [1000, 4096]:
        for n in range(0, d + 1, max(1, d // 37)):
            assert percent_match(n, d) == ref_percent(n, d), (n, d)
    assert percent_match(199, 200) == 99
    assert percent_match(200, 200) == 100

    # rendered line bytes for a sweep of score/identity values
    import io

    from gblastn_tpu.format.tabular import (
        bit_score_string,
        evalue_string,
    )

    for bits, raw, ev, ident, alen, gaps in [
        (503.263, 278, 217774e-146, 199, 200, 1),
        (23.4, 12, 0.49, 12, 12, 0),
        (1002.7, 555, 0.0, 995, 1000, 3),
    ]:
        line = (
            f" Score = {bit_score_string(bits)} bits ({raw}),  "
            f"Expect = {evalue_string(ev).strip()}\n"
            f" Identities = {ident}/{alen} "
            f"({percent_match(ident, alen)}%),"
            f" Gaps = {gaps}/{alen} ({percent_match(gaps, alen)}%)\n"
        )
        # reference-assembled expectation from the parsed pieces
        exp = (
            " Score = " + bit_score_string(bits) + " " + "bits ("
            + str(raw) + ")," + "  " + "Expect" + " = "
            + evalue_string(ev) + "\n"
            + " Identities = " + str(ident) + "/" + str(alen)
            + " (" + str(ref_percent(ident, alen)) + "%)"
            + ", Gaps = " + str(gaps) + "/" + str(alen)
            + " (" + str(ref_percent(gaps, alen)) + "%)" + "\n"
        )
        assert line == exp
