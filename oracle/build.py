"""Build the NCBI parity oracle from the reference C core.

Compiles the UNMODIFIED pure-C BLAST engine from
/root/reference/c++/src/algo/blast/core (see SURVEY.md §1 layer 5: the C
core's only external dependency is corelib/ncbitype.h, satisfied here by
oracle/shim/ncbiconf.h) plus our driver (oracle/driver.c) into
``oracle_blastn``, cached under ~/.cache/gblastn_tpu/oracle.

Usage:
    python -m oracle.build           # or: python oracle/build.py
    from oracle.build import ensure_oracle; path = ensure_oracle()

No reference source code is copied anywhere — objects are compiled
straight out of the read-only reference tree.
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import sys
from pathlib import Path

REFERENCE_CORE = Path("/root/reference/c++/src/algo/blast/core")
REFERENCE_INCLUDE = Path("/root/reference/c++/include")
# Plain-C support libraries the core links against: score-matrix tables
# (util/tables) and composition adjustment (protein-only at runtime, but
# referenced by blast_traceback/blast_kappa at link time).
REFERENCE_EXTRA_DIRS = [
    Path("/root/reference/c++/src/util/tables"),
    Path("/root/reference/c++/src/algo/blast/composition_adjustment"),
]
HERE = Path(__file__).resolve().parent

EXCLUDE = set()

CACHE_DIR = Path(
    os.environ.get("GBLASTN_TPU_CACHE", Path.home() / ".cache" / "gblastn_tpu")
) / "oracle"


def _fingerprint() -> str:
    h = hashlib.sha256()
    h.update((HERE / "driver.c").read_bytes())
    h.update((HERE / "shim" / "ncbiconf.h").read_bytes())
    h.update(b"v2-ndebug")
    return h.hexdigest()[:16]


def ensure_oracle(quiet: bool = True) -> Path:
    """Build (if needed) and return the oracle_blastn binary path.

    Raises FileNotFoundError when the reference tree is unavailable.
    """
    if not REFERENCE_CORE.is_dir():
        raise FileNotFoundError(f"reference core not found at {REFERENCE_CORE}")

    exe = CACHE_DIR / f"oracle_blastn-{_fingerprint()}"
    if exe.exists():
        return exe

    CACHE_DIR.mkdir(parents=True, exist_ok=True)
    # key the object cache on the fingerprint so cflags changes (e.g.
    # the NDEBUG switch) can never link against stale objects
    objdir = CACHE_DIR / f"obj-{_fingerprint()}"
    objdir.mkdir(exist_ok=True)

    cflags = [
        "-O2",
        # Production NCBI-BLAST ships Release builds (NDEBUG), and the
        # parity target is what users run. Without NDEBUG the debug-only
        # ASSERT at greedy_align.c:1206 aborts on legal inputs where an
        # indel pair is cheaper than a mismatch (e.g. reward/penalty
        # 2/-7 with gap costs 2/2 -- a supported combination,
        # blast_stat.c blastn_values_2_7): the affine greedy traceback
        # emits a zero-length substitution run there, which
        # GapPrelimEditBlockAdd handles as a no-op. Release blastn
        # produces well-defined output on such inputs (pinned by
        # tests/test_oracle_parity.py::test_cheap_gap_greedy_traceback).
        "-DNDEBUG",
        "-fcommon",
        f"-I{HERE / 'shim'}",
        f"-I{REFERENCE_INCLUDE}",
        f"-I{REFERENCE_CORE}",
    ]

    sources = [
        src
        for d in [REFERENCE_CORE, *REFERENCE_EXTRA_DIRS]
        for src in sorted(d.glob("*.c"))
        if src.name not in EXCLUDE
    ]
    sources.append(HERE / "shim" / "mtlock_stub.c")

    objs = []
    for src in sources:
        obj = objdir / (src.stem + ".o")
        if not obj.exists() or obj.stat().st_mtime < src.stat().st_mtime:
            cmd = ["gcc", "-c", *cflags, str(src), "-o", str(obj)]
            res = subprocess.run(cmd, capture_output=True, text=True)
            if res.returncode != 0:
                raise RuntimeError(f"compile failed for {src.name}:\n{res.stderr}")
        objs.append(str(obj))

    drv_obj = objdir / "driver.o"
    cmd = ["gcc", "-c", *cflags, str(HERE / "driver.c"), "-o", str(drv_obj)]
    res = subprocess.run(cmd, capture_output=True, text=True)
    if res.returncode != 0:
        raise RuntimeError(f"compile failed for driver.c:\n{res.stderr}")

    lib = CACHE_DIR / "libblastcore.a"
    subprocess.run(["ar", "rcs", str(lib), *objs], check=True)

    tmp = exe.with_suffix(".tmp")
    res = subprocess.run(
        ["gcc", str(drv_obj), str(lib), "-lm", "-o", str(tmp)],
        capture_output=True,
        text=True,
    )
    if res.returncode != 0:
        raise RuntimeError(f"link failed:\n{res.stderr}")
    tmp.rename(exe)
    if not quiet:
        print(f"oracle built: {exe}")
    return exe


def ensure_culltest(quiet: bool = True) -> Path:
    """Build (if needed) the standalone culling/best-hit writer
    harness (oracle/culltest.c) against the same compiled core."""
    if not REFERENCE_CORE.is_dir():
        raise FileNotFoundError(
            f"reference core not found at {REFERENCE_CORE}"
        )
    ensure_oracle(quiet=quiet)   # builds libblastcore.a + objects
    h = hashlib.sha256()
    h.update((HERE / "culltest.c").read_bytes())
    fp = h.hexdigest()[:16]
    exe = CACHE_DIR / f"oracle_culltest-{fp}"
    if exe.exists():
        return exe
    objdir = CACHE_DIR / f"obj-{_fingerprint()}"
    cflags = [
        "-O2", "-DNDEBUG", "-fcommon",
        f"-I{HERE / 'shim'}",
        f"-I{REFERENCE_INCLUDE}",
        f"-I{REFERENCE_CORE}",
    ]
    obj = objdir / "culltest.o"
    cmd = ["gcc", "-c", *cflags, str(HERE / "culltest.c"), "-o",
           str(obj)]
    res = subprocess.run(cmd, capture_output=True, text=True)
    if res.returncode != 0:
        raise RuntimeError(f"compile failed for culltest.c:\n{res.stderr}")
    lib = CACHE_DIR / "libblastcore.a"
    tmp = exe.with_suffix(".tmp")
    res = subprocess.run(
        ["gcc", str(obj), str(lib), "-lm", "-o", str(tmp)],
        capture_output=True, text=True,
    )
    if res.returncode != 0:
        raise RuntimeError(f"link failed:\n{res.stderr}")
    tmp.rename(exe)
    return exe


if __name__ == "__main__":
    print(ensure_oracle(quiet=False))
