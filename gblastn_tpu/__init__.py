"""gblastn-tpu: TPU-native nucleotide BLAST with G-BLASTN capabilities.

Public API:

    from gblastn_tpu import SequenceDB, search, megablast_options

    db = SequenceDB.from_fasta("genome.fa")
    results = search(queries, db, megablast_options())

See README.md for the architecture and PARITY.md for the component
inventory against the reference (OpenHero/gblastn).
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy imports keep `import gblastn_tpu` light (no jax init)
    if name in ("search", "prelim_search", "finish_search",
                "BlastResults"):
        from gblastn_tpu.engine import search as _s

        return getattr(_s, name)
    if name == "SequenceDB":
        from gblastn_tpu.io.seqdb import SequenceDB

        return SequenceDB
    if name in ("SearchOptions", "megablast_options", "blastn_options",
                "options_for_task"):
        from gblastn_tpu.params import options as _o

        return getattr(_o, name)
    if name == "run_pipelined_search":
        from gblastn_tpu.engine.pipeline import run_pipelined_search

        return run_pipelined_search
    raise AttributeError(f"module 'gblastn_tpu' has no attribute {name!r}")
