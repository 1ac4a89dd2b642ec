"""Generic ASN.1 value tree with NCBI text + binary (BER) writers.

Replaces the role of the NCBI serial library's object streams for the
subset of types the BLAST formatters emit (reference:
/root/reference/c++/src/serial/objostrasn.cpp (text) and
objostrasnb.cpp (binary)):

* text form follows CObjectOStreamAsn: 2-space indents, `{` on the
  member line, enum names bare, strings doubled-quote escaped, REAL as
  ``{ mantissa, 10, exponent }`` (WriteDouble2, objostrasn.cpp:159);
* binary form follows CObjectOStreamAsnBinary: constructed values use
  indefinite lengths (0x80 ... 00 00), SEQUENCE/SET-OF tag 0x30/0x31,
  members and CHOICE alternatives wrapped in context-specific
  constructed tags by definition order, VisibleString tag 26, REAL as
  tag 9 with an ISO-6093 NR3 decimal payload (WriteDouble2,
  objostrasnb.cpp:662-703).

The node model carries the definition-order tag of every member, so
encoders need no schema: builders (objects.seqalign) hard-code the tag
numbers from the reference .asn modules they cite.
"""
from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class Int:
    value: int


@dataclass
class Real:
    value: float


@dataclass
class Str:
    value: str


@dataclass
class Bool:
    value: bool


@dataclass
class Enum:
    """ENUMERATED (or named INTEGER in text form): prints the name,
    encodes the value."""

    name: str
    value: int
    integer: bool = False    # INTEGER with named values, not ENUMERATED


@dataclass
class Member:
    """A SEQUENCE member or CHOICE alternative: ``tag`` is the
    zero-based definition-order context tag."""

    name: str
    tag: int
    value: object


@dataclass
class Seq:
    members: list = field(default_factory=list)   # list[Member]


@dataclass
class Choice:
    alt: Member = None


@dataclass
class Of:
    """SET OF / SEQUENCE OF."""

    items: list = field(default_factory=list)
    set_of: bool = True


# ------------------------------------------------------------------ text

def _real_parts(v: float) -> tuple[int, int]:
    """(mantissa, exponent) with value == mantissa * 10**exponent
    (DoubleToString_Ecvt convention, 15 significant digits)."""
    if v == 0.0:
        return 0, 0
    s = f"{abs(v):.14e}"            # d.14 digits e+xx
    mant_s, exp_s = s.split("e")
    digits = mant_s.replace(".", "").rstrip("0") or "0"
    e1 = int(exp_s)
    mant = int(digits)
    if v < 0:
        mant = -mant
    return mant, e1 - (len(digits) - 1)


def _quote(s: str) -> str:
    return '"' + s.replace('"', '""') + '"'


def _text(node, indent: int, out: list) -> None:
    pad = "  " * indent
    if isinstance(node, Int):
        out.append(str(node.value))
    elif isinstance(node, Bool):
        out.append("TRUE" if node.value else "FALSE")
    elif isinstance(node, Real):
        m, e = _real_parts(node.value)
        out.append("{ %d, 10, %d }" % (m, e))
    elif isinstance(node, Str):
        out.append(_quote(node.value))
    elif isinstance(node, Enum):
        out.append(node.name)
    elif isinstance(node, Choice):
        out.append(node.alt.name + " ")
        _text(node.alt.value, indent, out)
    elif isinstance(node, Seq):
        out.append("{\n")
        for i, mem in enumerate(node.members):
            out.append("  " * (indent + 1) + mem.name + " ")
            _text(mem.value, indent + 1, out)
            out.append(",\n" if i + 1 < len(node.members) else "\n")
        out.append(pad + "}")
    elif isinstance(node, Of):
        if not node.items:
            out.append("{\n" + pad + "}")
            return
        out.append("{\n")
        for i, item in enumerate(node.items):
            out.append("  " * (indent + 1))
            _text(item, indent + 1, out)
            out.append(",\n" if i + 1 < len(node.items) else "\n")
        out.append(pad + "}")
    else:
        raise TypeError(f"unknown ASN.1 node {node!r}")


def to_text(type_name: str, node) -> str:
    out = [type_name + " ::= "]
    _text(node, 0, out)
    out.append("\n")
    return "".join(out)


# ------------------------------------------------------------------ binary

def _len_bytes(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    b = n.to_bytes((n.bit_length() + 7) // 8, "big")
    return bytes([0x80 | len(b)]) + b


def _prim(tag: int, content: bytes) -> bytes:
    return bytes([tag]) + _len_bytes(len(content)) + content


def _ctx(tag: int, inner: bytes) -> bytes:
    """Context-specific constructed, indefinite length (the NCBI
    member/alternative wrapper, objostrasnb.cpp:1000)."""
    if tag < 31:
        head = bytes([0xA0 | tag])
    else:
        head = bytes([0xBF, tag])     # high-tag-number form, tag < 128
    return head + b"\x80" + inner + b"\x00\x00"


def _int_content(v: int) -> bytes:
    n = 1
    while not -(1 << (8 * n - 1)) <= v < (1 << (8 * n - 1)):
        n += 1
    return v.to_bytes(n, "big", signed=True)


def to_ber(node) -> bytes:
    if isinstance(node, Int):
        return _prim(0x02, _int_content(node.value))
    if isinstance(node, Bool):
        return _prim(0x01, b"\xff" if node.value else b"\x00")
    if isinstance(node, Real):
        if node.value == 0.0:
            return _prim(0x09, b"")
        txt = f"{node.value:.15g}".encode("ascii")
        return _prim(0x09, b"\x03" + txt)
    if isinstance(node, Str):
        return _prim(0x1A, node.value.encode("ascii", "replace"))
    if isinstance(node, Enum):
        tag = 0x02 if node.integer else 0x0A
        return _prim(tag, _int_content(node.value))
    if isinstance(node, Choice):
        return _ctx(node.alt.tag, to_ber(node.alt.value))
    if isinstance(node, Seq):
        inner = b"".join(
            _ctx(m.tag, to_ber(m.value)) for m in node.members
        )
        return b"\x30\x80" + inner + b"\x00\x00"
    if isinstance(node, Of):
        inner = b"".join(to_ber(i) for i in node.items)
        head = b"\x31\x80" if node.set_of else b"\x30\x80"
        return head + inner + b"\x00\x00"
    raise TypeError(f"unknown ASN.1 node {node!r}")
