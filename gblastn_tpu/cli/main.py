"""blastn-compatible command-line interface.

TPU-native replacement for the reference blastn application (reference:
/root/reference/c++/src/app/blast/blastn_app.cpp and the CLI arg surface
declared in src/algo/blast/blastinput/blast_args.cpp /
cmdline_flags.cpp). Supported argument names match blastn where the
feature exists; G-BLASTN's GPU flags map to TPU equivalents:

  -use_gpu/-gpu_id      -> accepted, mapped to TPU device selection
  -mode {0,1,2}         -> accepted (pipeline modes; 1 = sequential)
  -query_list           -> file with one query FASTA path per line

Usage:
  gblastn-tpu makedb  -in ref.fa -out db_dir [-title T]
                      [-mask_data m.intervals -mask_id 10]
  gblastn-tpu blastn  -query q.fa -db db_dir [-task megablast]
                      [-evalue 10] [-max_target_seqs 500]
                      [-outfmt 0|5|6|7|8|9|10|11|17] [-out out.tsv]
                      [-strand both] [-word_size N] [-reward N]
                      [-penalty N] [-gapopen N] [-gapextend N]
                      [-query_list list.txt] [-db_soft_mask ID]
  gblastn-tpu blastdbcmd | dustmasker | windowmasker |
              convert2blastmask | blastdb_aliastool | blastdbcheck |
              makembindex
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

from gblastn_tpu.io.fasta import (
    BATCH_SIZE_BLASTN,
    BATCH_SIZE_MEGABLAST,
    FastaRecord,
    batch_records,
    parse_fasta,
)
from gblastn_tpu.io.seqdb import SequenceDB
from gblastn_tpu.params.options import options_for_task


def _add_blastn_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("-query", help="query FASTA file", default=None)
    p.add_argument("-query_list", default=None,
                   help="file listing query FASTA paths (G-BLASTN)")
    p.add_argument("-db", default=None,
                   help="database (makedb dir or NCBI .nin/.nal prefix)")
    p.add_argument("-subject", default=None,
                   help="subject FASTA (bl2seq mode, instead of -db)")
    p.add_argument("-lcase_masking", action="store_true",
                   help="mask lowercase query letters")
    p.add_argument("-out", default="-", help="output file (default stdout)")
    p.add_argument("-task", default="megablast",
                   choices=["megablast", "blastn", "dc-megablast",
                            "blastn-short", "vecscreen"])
    p.add_argument("-template_type", default=None,
                   choices=["coding", "optimal", "coding_and_optimal"],
                   help="discontiguous template type (dc-megablast)")
    p.add_argument("-template_length", type=int, default=None,
                   choices=[16, 18, 21],
                   help="discontiguous template length (dc-megablast)")
    p.add_argument("-evalue", type=float, default=10.0)
    p.add_argument("-word_size", type=int, default=0)
    p.add_argument("-window_size", type=int, default=None,
                   help="two-hit window; 0 (default) = one-hit")
    p.add_argument("-off_diagonal_range", type=int, default=0,
                   help="number of off-diagonals to search for the "
                        "2nd hit (two-hit mode)")
    p.add_argument("-ungapped", action="store_true",
                   help="ungapped search (sum-statistics e-values)")
    p.add_argument("-use_index", default=None,
                   help="true = resolve seeds against a prebuilt "
                        "database word index (makembindex) instead of "
                        "scanning the database")
    p.add_argument("-index_name", default=None,
                   help="database index path (default: <db>.tix.npz)")
    p.add_argument("-old_style_index", default=None,
                   help="accepted for compatibility (this framework "
                        "has one index format)")
    p.add_argument("-version", action="version",
                   version="blastn: 2.2.28+ (gblastn-tpu 0.1.0)")
    p.add_argument("-reward", type=int, default=0)
    p.add_argument("-penalty", type=int, default=0)
    p.add_argument("-gapopen", type=int, default=None)
    p.add_argument("-gapextend", type=int, default=None)
    p.add_argument("-max_target_seqs", type=int, default=None)
    p.add_argument("-num_alignments", type=int, default=None)
    p.add_argument("-outfmt", default="6")
    p.add_argument("-line_length", type=int, default=60,
                   help="alignment line length (outfmt 0-4)")
    p.add_argument("-num_descriptions", type=int, default=500,
                   help="one-line summary count (outfmt 0-4)")
    p.add_argument("-html", action="store_true",
                   help="wrap report output in HTML (outfmt 0-4)")
    p.add_argument("-parse_deflines", action="store_true",
                   help="parse query/subject deflines (accepted for "
                        "compatibility; ids are always the first "
                        "defline token here)")
    p.add_argument("-show_gis", action="store_true",
                   help="show NCBI GIs in deflines (accepted for "
                        "compatibility; local dbs carry no GIs)")
    p.add_argument("-query_loc", default=None,
                   help="location on the query sequence "
                        "(format: start-stop, 1-based inclusive)")
    p.add_argument("-subject_loc", default=None,
                   help="location on the subject sequence, bl2seq mode "
                        "only (format: start-stop, 1-based inclusive)")
    p.add_argument("-strand", default="both",
                   choices=["both", "plus", "minus"])
    p.add_argument("-perc_identity", type=float, default=0.0)
    p.add_argument("-best_hit_overhang", type=float, default=0.0)
    p.add_argument("-best_hit_score_edge", type=float, default=0.0)
    p.add_argument("-culling_limit", type=int, default=0)
    p.add_argument("-dbsize", type=int, default=0,
                   help="effective database length override")
    p.add_argument("-searchsp", type=int, default=0,
                   help="effective search space override")
    p.add_argument("-dust", default="yes")
    p.add_argument("-soft_masking", default="true",
                   help="true (default): query filters apply to "
                        "seeding only; false: masked bases become N "
                        "for the whole search")
    p.add_argument("-window_masker_db", default=None)
    p.add_argument("-window_masker_taxid", type=int, default=None,
                   help="resolve the windowmasker statistics from "
                        "$WINDOW_MASKER_PATH/<taxid>/wmasker.obinary "
                        "(or .oascii), like the reference")
    p.add_argument("-filtering_db", default=None,
                   help="repeats database for query masking")
    p.add_argument("-gilist", default=None,
                   help="restrict the search to database sequences "
                        "whose deflines carry a GI in this list "
                        "(NCBI text or binary GI list)")
    p.add_argument("-negative_gilist", default=None,
                   help="exclude database sequences whose deflines "
                        "carry a GI in this list")
    p.add_argument("-seqidlist", default=None,
                   help="restrict the search to database sequences "
                        "whose ids are listed in this file")
    p.add_argument("-negative_seqidlist", default=None,
                   help="exclude database sequences whose ids are "
                        "listed in this file")
    p.add_argument("-db_soft_mask", type=int, default=None,
                   help="database masking algorithm id: masked subject "
                        "ranges are excluded from seeding")
    p.add_argument("-db_hard_mask", type=int, default=None,
                   help="database masking algorithm id: masked subject "
                        "ranges excluded from seeding and rendered N")
    p.add_argument("-xdrop_ungap", type=float, default=None,
                   help="X-dropoff (bits) for ungapped extensions")
    p.add_argument("-xdrop_gap", type=float, default=None,
                   help="X-dropoff (bits) for preliminary gapped "
                        "extensions")
    p.add_argument("-xdrop_gap_final", type=float, default=None,
                   help="X-dropoff (bits) for final gapped alignment")
    p.add_argument("-gap_trigger", type=float, default=None,
                   help="score (bits) to trigger gapped extension "
                        "(ungapped cutoff ceiling)")
    p.add_argument("-max_hsps_per_subject", type=int, default=0,
                   help="max HSPs kept per subject sequence (0 = all)")
    p.add_argument("-no_greedy", action="store_true",
                   help="megablast: use non-greedy dynamic programming "
                        "extension")
    p.add_argument("-min_raw_gapped_score", type=int, default=0,
                   help="minimum raw gapped score for saved HSPs")
    p.add_argument("-num_threads", type=int, default=1)
    # G-BLASTN compatibility flags, mapped to TPU equivalents
    p.add_argument("-use_gpu", default=None, help="alias of -use_tpu")
    p.add_argument("-use_tpu", default="true")
    p.add_argument("-gpu_id", type=int, default=0, help="alias of -tpu_id")
    p.add_argument("-tpu_id", type=int, default=0)
    p.add_argument("-mode", type=int, default=1, choices=[0, 1, 2])
    # pipeline stage thread counts (G-BLASTN flags; reference
    # spellings from cmdline_flags.cpp:228-237 accepted as aliases)
    p.add_argument("-prepare_thread", "-pre_t_num", type=int, default=1)
    p.add_argument("-prelim_thread", "-prelim_t_num", type=int,
                   default=1)
    p.add_argument("-trace_thread", "-trace_t_num", type=int, default=2)
    p.add_argument("-print_thread", "-print_t_num", type=int, default=1)
    p.add_argument("-logfile", default=None,
                   help="write the stage timing report here")
    p.add_argument("-export_search_strategy", default=None,
                   help="save the search request (query/db/options)")
    p.add_argument("-import_search_strategy", default=None,
                   help="recover a saved search request")


def _parse_loc(flag: str, text: str) -> tuple[int, int]:
    """Parse a 1-based 'start-stop' range flag (-query_loc,
    -subject_loc); SystemExit with an options error on bad input."""
    try:
        s, _, e = text.partition("-")
        start, stop = int(s), int(e)
        if start < 1 or stop < start:
            raise ValueError
    except ValueError:
        raise SystemExit(
            f"BLAST options error: {flag} must be start-stop "
            "(1-based, start <= stop)"
        )
    return start, stop


def _build_options(args):
    overrides = {}
    if args.word_size:
        overrides["word_size"] = args.word_size
    if args.reward:
        overrides["reward"] = args.reward
    if args.penalty:
        overrides["penalty"] = args.penalty
    if args.gapopen is not None:
        overrides["gap_open"] = args.gapopen
    if args.gapextend is not None:
        overrides["gap_extend"] = args.gapextend
    mts = args.max_target_seqs or args.num_alignments
    if mts:
        overrides["max_target_seqs"] = mts
        overrides["hitlist_size"] = mts
    overrides["evalue"] = args.evalue
    overrides["strand"] = args.strand
    overrides["percent_identity"] = args.perc_identity
    if args.best_hit_overhang:
        overrides["best_hit_overhang"] = args.best_hit_overhang
    if args.best_hit_score_edge:
        overrides["best_hit_score_edge"] = args.best_hit_score_edge
    if args.culling_limit:
        overrides["culling_limit"] = args.culling_limit
    if args.num_threads and args.num_threads > 1:
        overrides["num_threads"] = args.num_threads
    if args.dbsize:
        overrides["db_length_override"] = args.dbsize
    if args.searchsp:
        overrides["searchsp_override"] = args.searchsp
    parts = str(args.dust).split()
    if len(parts) == 3 and all(x.lstrip("-").isdigit() for x in parts):
        overrides["dust"] = True
        overrides["dust_level"] = int(parts[0])
        overrides["dust_window"] = int(parts[1])
        overrides["dust_linker"] = int(parts[2])
    else:
        overrides["dust"] = args.dust in ("yes", "true", "T")
    if args.window_masker_db:
        overrides["window_masker_db"] = args.window_masker_db
    elif args.window_masker_taxid is not None:
        # WindowMaskerTaxidToDb (winmask_filter.cpp:428): try the
        # binary unit counts first, then ascii, under
        # $WINDOW_MASKER_PATH/<taxid>/
        import os

        base = Path(os.environ.get("WINDOW_MASKER_PATH", "."))
        tdir = base / str(args.window_masker_taxid)
        for name in ("wmasker.obinary", "wmasker.oascii"):
            if (tdir / name).exists():
                overrides["window_masker_db"] = str(tdir / name)
                break
        else:
            raise SystemExit(
                "BLAST options error: no windowmasker statistics for "
                f"taxid {args.window_masker_taxid} under {base}"
            )
    if str(args.soft_masking).lower() in ("false", "f", "no", "0"):
        overrides["mask_at_hash"] = False
    if args.filtering_db:
        overrides["filtering_db"] = args.filtering_db
    if args.window_size is not None:
        overrides["window_size"] = args.window_size
    if args.off_diagonal_range:
        overrides["off_diagonal_range"] = args.off_diagonal_range
    if args.query_loc:
        start, stop = _parse_loc("-query_loc", args.query_loc)
        overrides["query_loc"] = (start - 1, stop)
    if args.db_soft_mask is not None:
        overrides["db_soft_mask"] = args.db_soft_mask
    if args.db_hard_mask is not None:
        overrides["db_hard_mask"] = args.db_hard_mask
    if args.ungapped:
        overrides["gapped"] = False
    if args.lcase_masking:
        overrides["lcase_masking"] = True
    if str(args.use_index).lower() in ("true", "t", "yes", "1"):
        overrides["use_index"] = True
        if args.index_name:
            overrides["index_name"] = args.index_name
    if args.xdrop_ungap is not None:
        overrides["x_dropoff_ungapped"] = args.xdrop_ungap
    if args.xdrop_gap is not None:
        overrides["gap_x_dropoff"] = args.xdrop_gap
    if args.xdrop_gap_final is not None:
        overrides["gap_x_dropoff_final"] = args.xdrop_gap_final
    if args.gap_trigger is not None:
        overrides["gap_trigger"] = args.gap_trigger
    if args.max_hsps_per_subject:
        overrides["max_hsps_per_subject"] = args.max_hsps_per_subject
    if args.min_raw_gapped_score:
        overrides["cutoff_score"] = args.min_raw_gapped_score
    if args.no_greedy:
        from gblastn_tpu.params.options import ExtensionMethod

        overrides["extension_method"] = ExtensionMethod.DYN_PROG
    if args.template_type is not None:
        overrides["template_type"] = args.template_type
    if args.template_length is not None:
        overrides["template_length"] = args.template_length
    if (args.task != "dc-megablast"
            and (args.template_type is not None
                 or args.template_length is not None)):
        raise SystemExit(
            "BLAST options error: -template_type/-template_length "
            "require -task dc-megablast"
        )
    return options_for_task(args.task, **overrides)


def _parse_outfmt(outfmt: str):
    parts = outfmt.split()
    kind = int(parts[0])
    fields = parts[1:] or None
    if kind not in (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 17):
        raise SystemExit(
            f"-outfmt {kind} not supported "
            "(0 pairwise, 1-4 query-anchored, 5 XML, 6/7 tabular, "
            "8/9 ASN.1, 10 CSV, 11 archive, 17 SAM)"
        )
    return kind, fields


def run_blastn(argv) -> int:
    p = argparse.ArgumentParser(prog="gblastn-tpu blastn", add_help=True)
    _add_blastn_args(p)
    args = p.parse_args(argv)
    # import jax lazily so `makedb` works without device init
    from gblastn_tpu.engine.search import search

    if args.import_search_strategy:
        # RecoverSearchStrategy (blastn_app.cpp:423, search_strategy.cpp)
        text = Path(args.import_search_strategy).read_text()
        if text.lstrip().startswith("{"):
            # legacy JSON strategy files
            import json

            saved_args = json.loads(text).get("args", {})
        else:
            from gblastn_tpu.objects.blast4 import strategy_to_args

            saved_args = strategy_to_args(text)
        for k, v in saved_args.items():
            if getattr(args, k, None) in (None, 0, 0.0, "both", "megablast",
                                          "6", "yes", 10.0, "true", 1,
                                          False):
                setattr(args, k, v)

    if not args.query and not args.query_list:
        p.error("one of -query / -query_list is required")

    options = _build_options(args)
    try:
        options.validate()
        if options.gapped:
            # fail fast on unsupported gap-cost/scoring combos, with
            # the reference's own message (BLAST_PrintAllowedValues,
            # blast_stat.c) instead of a late traceback
            from gblastn_tpu.stats.tables import gapped_karlin_block

            gapped_karlin_block(
                options.reward, options.penalty,
                options.gap_open, options.gap_extend,
            )
    except ValueError as e:
        print(f"BLAST options error: {e}", file=sys.stderr)
        return 1

    if args.export_search_strategy:
        # SaveSearchStrategy (blastn_app.cpp:593): a Blast4-request
        # ASN.1 text with the queries embedded as a Bioseq-set
        from gblastn_tpu.io.encoding import IUPACNA_TO_BLASTNA
        from gblastn_tpu.objects.asn1 import to_text
        from gblastn_tpu.objects.blast4 import (
            bioseq,
            bioseq_set,
            blast4_request,
            queue_search_request,
        )

        seqs = []
        strat_files = []
        if args.query_list:
            strat_files = [
                ln.strip()
                for ln in Path(args.query_list).read_text().splitlines()
                if ln.strip()
            ]
        elif args.query:
            strat_files = [args.query]
        for qfile in strat_files:
            for rec in parse_fasta(qfile):
                seqs.append(bioseq(
                    rec.seq_id, rec.title,
                    IUPACNA_TO_BLASTNA[
                        np.frombuffer(rec.sequence, dtype=np.uint8)
                    ],
                ))
        request = blast4_request(
            "blastn: 2.2.28+ (gblastn-tpu)",
            queue_search_request(
                program="blastn",
                service=(
                    "megablast" if args.task == "megablast" else "plain"
                ),
                queries=bioseq_set(seqs),
                subject_db=args.db or args.subject or "",
                paramset=args.task,
                options=options,
            ),
        )
        Path(args.export_search_strategy).write_text(
            to_text("Blast4-request", request)
        )
    subj_shift = None     # per-oid coordinate shift under -subject_loc
    display_db = None     # full-length db for rendering (slen, bases)
    if args.subject:
        if args.db:
            raise SystemExit("use either -db or -subject, not both")
        if args.subject_loc:
            # -subject_loc (bl2seq only): the engine searches the
            # sliced subject -- stats, cutoffs, and the packed-byte
            # phase of the approximate ungapped gate all see the range
            # length, as the reference's SetupSubjects does for an
            # interval Seq-loc -- and final coordinates are remapped to
            # the full sequence (s_RemapToSubjectLoc,
            # blast_seqalign.cpp:1276)
            start, stop = _parse_loc("-subject_loc", args.subject_loc)
            recs = list(parse_fasta(args.subject))
            display_db = SequenceDB.from_records(
                recs, title=args.subject
            )
            subj_shift = []
            sliced = []
            for rec in recs:
                a = min(start - 1, len(rec.sequence))
                b = min(stop, len(rec.sequence))
                if a >= b:
                    # reference CBlastOptions validation rejects an
                    # interval outside the sequence; don't search an
                    # empty slice silently
                    raise SystemExit(
                        "BLAST options error: -subject_loc "
                        f"{args.subject_loc} is outside subject "
                        f"'{rec.seq_id}' (length {len(rec.sequence)})"
                    )
                subj_shift.append(a)
                sliced.append(
                    FastaRecord(rec.seq_id, rec.title,
                                rec.sequence[a:b])
                )
            db = SequenceDB.from_records(sliced, title=args.subject)
        else:
            db = SequenceDB.from_fasta(args.subject, title=args.subject)
    elif args.db:
        if args.subject_loc:
            raise SystemExit(
                "BLAST options error: -subject_loc requires -subject"
            )
        db = SequenceDB.load(args.db)
    else:
        raise SystemExit("one of -db or -subject is required")
    id_restrictions = [
        f for f in ("gilist", "negative_gilist", "seqidlist",
                    "negative_seqidlist")
        if getattr(args, f)
    ]
    if len(id_restrictions) > 1:
        raise SystemExit(
            "BLAST options error: use only one of -gilist, "
            "-negative_gilist, -seqidlist, -negative_seqidlist"
        )
    if id_restrictions and args.subject:
        # the reference declares these incompatible with -subject
        # (blast_args.cpp SetArgumentDescriptions dependencies); with
        # -subject_loc a subset_oids here would also desync the
        # display db / coordinate shifts
        raise SystemExit(
            f"BLAST options error: -{id_restrictions[0]} requires "
            "-db (incompatible with -subject)"
        )
    if args.gilist or args.negative_gilist:
        from gblastn_tpu.io.seqdb import read_gi_list, seq_id_gi

        try:
            gis = read_gi_list(args.gilist or args.negative_gilist)
        except ValueError as e:
            raise SystemExit(f"BLAST options error: {e}")
        negative = args.negative_gilist is not None
        keep = [
            i for i, sid in enumerate(db.ids)
            if ((g := seq_id_gi(sid)) is not None and g in gis)
            != negative
        ]
        if not keep:
            raise SystemExit(
                "gilist restriction removes every database sequence"
            )
        db = db.subset_oids(keep)
    if args.seqidlist or args.negative_seqidlist:
        listed = {
            ln.strip()
            for ln in Path(
                args.seqidlist or args.negative_seqidlist
            ).read_text().splitlines()
            if ln.strip()
        }
        negative = args.negative_seqidlist is not None
        keep = [
            i for i, sid in enumerate(db.ids)
            if (sid in listed) != negative
        ]
        missing = listed - set(db.ids)
        if missing:
            print(
                "gblastn_tpu: warning: seqidlist ids not in the "
                f"database: {', '.join(sorted(missing)[:5])}",
                file=sys.stderr,
            )
        if not keep:
            raise SystemExit(
                "seqidlist restriction removes every database sequence"
            )
        db = db.subset_oids(keep)
    kind, fields = _parse_outfmt(args.outfmt)

    query_files = []
    if args.query_list:
        for line in Path(args.query_list).read_text().splitlines():
            line = line.strip()
            if line:
                query_files.append(line)
    else:
        query_files.append(args.query)

    if kind == 9:   # binary ASN.1 writes bytes
        out = (
            sys.stdout.buffer if args.out == "-"
            else open(args.out, "wb")
        )
    else:
        out = sys.stdout if args.out == "-" else open(args.out, "w")
    try:
        from gblastn_tpu.format.render import ResultRenderer

        html = args.html and kind in (0, 1, 2, 3, 4)
        if html:
            # the classic -html wrapper (CBlastFormat HTML prologue)
            out.write("<HTML>\n<HEAD><TITLE>BLAST Search Results"
                      "</TITLE></HEAD>\n<BODY>\n<PRE>\n")
        renderer = ResultRenderer(
            kind, fields, out, display_db or db, options,
            dbname=args.db or args.subject or "", task=args.task,
            line_length=args.line_length,
            num_descriptions=args.num_descriptions,
        )

        batch_size = (
            BATCH_SIZE_MEGABLAST if args.task == "megablast"
            else BATCH_SIZE_BLASTN
        )
        t0 = time.time()

        def emit(results):
            if subj_shift is not None:
                for q in results.queries:
                    for lst in q.hsplists:
                        off = subj_shift[lst.oid]
                        if off:
                            for h in lst.hsps:
                                h.s_off += off
                                h.s_end += off
            renderer.emit(results)

        def all_batches():
            for qfile in query_files:
                yield from batch_records(parse_fasta(qfile), batch_size)

        # cooperative cancellation: first Ctrl-C requests a clean stop
        # at the next stage boundary (partial output stays valid), a
        # second Ctrl-C aborts immediately (TInterruptFnPtr contract)
        import signal
        import threading

        from gblastn_tpu.utils.interrupt import SearchInterrupted

        stop_req = threading.Event()

        def _on_sigint(signum, frame):
            if stop_req.is_set():
                raise KeyboardInterrupt
            stop_req.set()
            print(
                "gblastn_tpu: interrupt requested -- stopping at the "
                "next stage boundary (Ctrl-C again to abort now)",
                file=sys.stderr,
            )

        try:
            prev_handler = signal.signal(signal.SIGINT, _on_sigint)
        except ValueError:       # not the main thread (e.g. tests)
            prev_handler = None
        interrupted = False
        try:
            if args.mode == 1:
                # Method1: sequential per-batch loop (blastn_app.cpp:500)
                for batch in all_batches():
                    emit(search(batch, db, options,
                                interrupt_fn=stop_req.is_set))
            else:
                # Method2/3: pipelined stages (blastn_app.cpp:725/:991)
                from gblastn_tpu.engine.pipeline import (
                    run_pipelined_search,
                )

                run_pipelined_search(
                    all_batches(), db, options, emit,
                    trace_threads=max(args.trace_thread, 1),
                    interrupt_fn=stop_req.is_set,
                )
        except SearchInterrupted:
            interrupted = True
            print(
                "gblastn_tpu: search interrupted after "
                f"{renderer.num_queries} queries; output above is "
                "complete for those queries",
                file=sys.stderr,
            )
        finally:
            if prev_handler is not None:
                signal.signal(signal.SIGINT, prev_handler)
        renderer.finalize()
        if html:
            out.write("</PRE>\n</BODY>\n</HTML>\n")
        print(
            f"# {renderer.num_queries} queries in "
            f"{time.time() - t0:.2f}s",
            file=sys.stderr,
        )
        if args.logfile:
            from gblastn_tpu.utils.profiling import slog

            with open(args.logfile, "w") as lf:
                lf.write(slog.report() + "\n")
        if interrupted:
            return 130
    finally:
        if out is not sys.stdout:
            out.close()
    return 0


def run_makedb(argv) -> int:
    p = argparse.ArgumentParser(prog="gblastn-tpu makedb")
    p.add_argument("-in", dest="input", required=True,
                   help="input FASTA file")
    p.add_argument("-out", required=True, help="output database directory")
    p.add_argument("-title", default="")
    p.add_argument("-blastdb_version", type=int, default=0,
                   help="4 or 5 = also write an NCBI volume "
                        "(<out>.nin/.nhr/.nsq) next to the native db; "
                        "prefer 4 for NCBI-tool interop (our v5 volumes "
                        "omit the LMDB id sidecar)")
    p.add_argument("-mask_data", default=None,
                   help="comma-separated interval mask files "
                        "(dustmasker/windowmasker/convert2blastmask "
                        "output) stored as db mask columns")
    p.add_argument("-mask_id", default=None,
                   help="comma-separated algorithm ids for -mask_data "
                        "files (default: dust=10, windowmasker=30, "
                        "repeat=40, other=100+)")
    p.add_argument("-mask_desc", default=None,
                   help="comma-separated algorithm descriptions")
    args = p.parse_args(argv)
    db = SequenceDB.from_fasta(args.input, title=args.title or args.input)
    if args.mask_data:
        from gblastn_tpu.io.maskdata import read_interval_masks

        files = args.mask_data.split(",")
        ids = (
            [int(x) for x in args.mask_id.split(",")]
            if args.mask_id else []
        )
        descs = args.mask_desc.split(",") if args.mask_desc else []
        for i, f in enumerate(files):
            algo = ids[i] if i < len(ids) else 100 + i
            desc = descs[i] if i < len(descs) else Path(f).name
            program = {10: "dust", 20: "seg", 30: "windowmasker",
                       40: "repeat"}.get(algo, "other")
            db.add_mask_set(
                algo, program, desc, read_interval_masks(f)
            )
            print(
                f"Mask data {f}: algorithm id {algo} ({program})",
                file=sys.stderr,
            )
    db.save(args.out)
    if args.blastdb_version in (4, 5):
        from gblastn_tpu.io.fasta import parse_fasta
        from gblastn_tpu.io.ncbidb import write_volume

        write_volume(args.out, list(parse_fasta(args.input)),
                     title=args.title or args.input,
                     version=args.blastdb_version)
    elif args.blastdb_version:
        p.error("only -blastdb_version 4 or 5 is supported")
    info = db.info()
    print(
        f"Built database {args.out}: {info.num_seqs} sequences, "
        f"{info.total_length} bases",
        file=sys.stderr,
    )
    return 0


def run_makembindex(argv) -> int:
    """makembindex analog (reference: src/app/blastdb/makembindex.cpp,
    algo/blast/dbindex/): build the on-disk database word index that
    `-use_index true` resolves seeds against (lut/dbindex.py)."""
    p = argparse.ArgumentParser(prog="gblastn-tpu makembindex")
    p.add_argument("-input", "-db", dest="db", required=True,
                   help="database directory (makedb output)")
    p.add_argument("-output", dest="output", default=None,
                   help="index path (default: <db>.tix.npz)")
    p.add_argument("-word_size", type=int, default=28,
                   help="full word size the index serves (default 28, "
                        "traditional megablast)")
    p.add_argument("-lut_word", type=int, default=0,
                   help="indexed width (default: 12, or word_size if "
                        "smaller); searches force their LUT width to "
                        "this so indexed results are bit-identical to "
                        "a scan at the same width")
    args = p.parse_args(argv)
    from gblastn_tpu.lut.dbindex import build_db_index, save_db_index

    db = SequenceDB.load(args.db)
    t0 = time.time()
    index = build_db_index(db, args.word_size, args.lut_word)
    path = save_db_index(index, args.output or args.db)
    print(
        f"Built index {path}: word_size {index.word_size}, lut_word "
        f"{index.lut_word}, stride {index.stride}, "
        f"{len(index.positions)} positions, max chain "
        f"{index.max_chain}, {time.time() - t0:.1f}s",
        file=sys.stderr,
    )
    return 0


def run_dustmasker(argv) -> int:
    """dustmasker app analog (reference: src/app/dustmasker)."""
    p = argparse.ArgumentParser(prog="gblastn-tpu dustmasker")
    p.add_argument("-in", dest="input", required=True)
    p.add_argument("-out", default="-")
    p.add_argument("-level", type=int, default=20)
    p.add_argument("-window", type=int, default=64)
    p.add_argument("-linker", type=int, default=1)
    p.add_argument("-outfmt", default="interval",
                   choices=["interval", "fasta"])
    args = p.parse_args(argv)

    from gblastn_tpu.io.encoding import seq_to_blastna
    from gblastn_tpu.masking.dust import dust_mask

    out = sys.stdout if args.out == "-" else open(args.out, "w")
    try:
        for rec in parse_fasta(args.input):
            codes = seq_to_blastna(rec.sequence)
            intervals = dust_mask(
                codes, args.level, args.window, args.linker
            )
            if args.outfmt == "interval":
                title = (rec.seq_id + " " + rec.title).strip()
                out.write(f">{title}\n")
                for a, b in intervals:
                    out.write(f"{a} - {b}\n")
            else:
                # masked-to-lowercase FASTA
                seq = bytearray(
                    rec.sequence if isinstance(rec.sequence, bytes)
                    else rec.sequence.encode()
                )
                for a, b in intervals:
                    seq[a: b + 1] = seq[a: b + 1].lower()
                title = (rec.seq_id + " " + rec.title).strip()
                out.write(f">{title}\n")
                text = seq.decode()
                for i in range(0, len(text), 60):
                    out.write(text[i: i + 60] + "\n")
    finally:
        if out is not sys.stdout:
            out.close()
    return 0


def run_windowmasker(argv) -> int:
    """windowmasker app analog: -mk_counts stage and masking stage
    (reference: src/app/winmasker)."""
    p = argparse.ArgumentParser(prog="gblastn-tpu windowmasker")
    p.add_argument("-mk_counts", action="store_true",
                   help="generate unit counts statistics")
    p.add_argument("-in", dest="input", required=True)
    p.add_argument("-out", required=True)
    p.add_argument("-ustat", default=None,
                   help="statistics file (masking stage)")
    p.add_argument("-unit", type=int, default=0)
    p.add_argument("-t_high", type=int, default=0)
    p.add_argument("-t_low", type=int, default=0)
    p.add_argument("-outfmt", default="interval")
    p.add_argument("-sformat", default="ascii",
                   choices=["ascii", "binary", "oascii", "obinary"],
                   help="counts statistics format for -mk_counts "
                        "(all four NCBI formats load and write)")
    args = p.parse_args(argv)

    from gblastn_tpu.io.encoding import seq_to_blastna
    from gblastn_tpu.masking.winmask import (
        WindowMaskerStats,
        generate_counts,
        window_mask,
    )

    if args.mk_counts:
        seqs = [
            seq_to_blastna(rec.sequence)
            for rec in parse_fasta(args.input)
        ]
        stats = generate_counts(
            seqs, unit_size=args.unit,
            t_high_override=args.t_high, t_low_override=args.t_low,
        )
        save = {
            "binary": stats.save_binary,
            "oascii": stats.save_oascii,
            "obinary": stats.save_obinary,
        }.get(args.sformat, stats.save_ascii)
        save(args.out)
        print(
            f"windowmasker: unit={stats.unit_size} t_low={stats.t_low} "
            f"t_extend={stats.t_extend} t_threshold={stats.t_threshold} "
            f"t_high={stats.t_high} units={len(stats.units)}",
            file=sys.stderr,
        )
        return 0

    if not args.ustat:
        p.error("masking stage requires -ustat")
    stats = WindowMaskerStats.load(args.ustat)
    with open(args.out, "w") as out:
        for rec in parse_fasta(args.input):
            intervals = window_mask(seq_to_blastna(rec.sequence), stats)
            out.write(f">{rec.seq_id} {rec.title}".rstrip() + "\n")
            for a, b in intervals:
                out.write(f"{a} - {b}\n")
    return 0


def run_aliastool(argv) -> int:
    """blastdb_aliastool analog (reference:
    src/app/blastdb/blastdb_aliastool.cpp): present several databases
    as one. Native db dirs get an ``alias.json`` directory; NCBI-style
    prefixes get a ``.nal`` text alias (both load transparently)."""
    p = argparse.ArgumentParser(prog="gblastn-tpu blastdb_aliastool")
    p.add_argument("-dblist", required=True,
                   help="space-separated member database paths")
    p.add_argument("-out", required=True, dest="out",
                   help="alias database name")
    p.add_argument("-title", default="")
    p.add_argument("-dbtype", default="nucl", choices=["nucl"])
    args = p.parse_args(argv)

    members = args.dblist.split()
    native = all(
        (Path(m) / "manifest.json").exists()
        or (Path(m) / "alias.json").exists()
        for m in members
    )
    if native:
        import json

        outdir = Path(args.out)
        outdir.mkdir(parents=True, exist_ok=True)
        (outdir / "alias.json").write_text(json.dumps({
            "title": args.title or args.out,
            "dblist": members,
        }))
        # validate it loads
        db = SequenceDB.load(outdir)
        print(
            f"Created alias {args.out}: {len(members)} members, "
            f"{db.num_seqs} sequences, {db.total_length} bases",
            file=sys.stderr,
        )
    else:
        # NCBI-style .nal text alias (ncbidb.py reads these natively)
        nal = Path(str(args.out) + ".nal")
        nal.write_text(
            f"TITLE {args.title or args.out}\n"
            f"DBLIST {' '.join(members)}\n"
        )
        print(f"Created alias file {nal}", file=sys.stderr)
    return 0


def run_blastdbcheck(argv) -> int:
    """blastdbcheck analog (reference: src/app/blastdb/blastdbcheck.cpp):
    verify database integrity."""
    p = argparse.ArgumentParser(prog="gblastn-tpu blastdbcheck")
    p.add_argument("-db", required=True)
    p.add_argument("-full", action="store_true",
                   help="also decode every sequence")
    args = p.parse_args(argv)

    issues: list[str] = []
    try:
        db = SequenceDB.load(args.db)
    except Exception as e:
        print(f"{args.db}: LOAD FAILED: {e}", file=sys.stderr)
        return 2
    n = db.num_seqs
    if len(db.starts) != n or len(db.lengths) != n or len(db.titles) != n:
        issues.append("metadata array lengths disagree")
    if len(set(db.ids)) != n:
        issues.append("duplicate sequence ids")
    if n and (np.diff(db.starts) <= 0).any():
        issues.append("subject starts not strictly increasing")
    ends = db.starts + db.lengths
    if n and (ends > db.padded_length).any():
        issues.append("subject extends past packed buffer")
    if n and (np.asarray(db.starts) % 4).any():
        issues.append("subject start not byte-aligned")
    if len(db.ambig_pos) != len(db.ambig_code):
        issues.append("ambiguity arrays disagree")
    if len(db.ambig_pos) and (
        (db.ambig_pos < 0) | (db.ambig_pos >= db.padded_length)
    ).any():
        issues.append("ambiguity position out of range")
    for algo, m in db.masks.items():
        iv = m.intervals
        if len(iv) and (
            (iv[:, 0] >= iv[:, 1]).any()
            or (iv[:, 1] > db.padded_length).any()
            or (np.diff(iv[:, 0]) < 0).any()
        ):
            issues.append(f"mask column {algo}: bad intervals")
    if args.full:
        for oid in range(n):
            seq = db.get_sequence_blastna(oid)
            if len(seq) != int(db.lengths[oid]):
                issues.append(f"oid {oid}: decode length mismatch")
            elif (seq > 15).any():
                issues.append(f"oid {oid}: invalid residue code")
    status = "ok" if not issues else "FAILED"
    print(
        f"{args.db}: {n} sequences, {db.total_length} bases, "
        f"{len(db.masks)} mask column(s): {status}"
    )
    for msg in issues:
        print(f"  {msg}", file=sys.stderr)
    return 0 if not issues else 1


def run_convert2blastmask(argv) -> int:
    """convert2blastmask analog: extract lowercase-masked ranges from a
    FASTA file into makedb -mask_data interval files (reference:
    src/app/blastdb/convert2blastmask.cpp)."""
    p = argparse.ArgumentParser(prog="gblastn-tpu convert2blastmask")
    p.add_argument("-in", dest="input", required=True,
                   help="lowercase-masked FASTA")
    p.add_argument("-out", default="-")
    p.add_argument("-masking_algorithm", default="other",
                   help="algorithm name recorded for provenance")
    p.add_argument("-masking_options", default="")
    args = p.parse_args(argv)

    from gblastn_tpu.io.maskdata import (
        lowercase_halfopen,
        write_interval_masks,
    )

    masks = {}
    for rec in parse_fasta(args.input):
        ivs = lowercase_halfopen(rec.sequence)
        if ivs:
            masks[rec.seq_id] = ivs
    out = sys.stdout if args.out == "-" else open(args.out, "w")
    try:
        write_interval_masks(out, masks)
    finally:
        if out is not sys.stdout:
            out.close()
    return 0


def run_blastdbcmd(argv) -> int:
    """blastdbcmd analog: DB info and sequence retrieval (reference:
    src/app/blastdb/blastdbcmd.cpp)."""
    p = argparse.ArgumentParser(prog="gblastn-tpu blastdbcmd")
    p.add_argument("-db", required=True)
    p.add_argument("-info", action="store_true")
    p.add_argument("-entry", default=None,
                   help="comma-separated sequence ids, or 'all'")
    p.add_argument("-entry_batch", default=None,
                   help="file with one sequence id per line")
    p.add_argument("-range", dest="range_", default=None,
                   help="1-based inclusive range a-b")
    p.add_argument("-strand", default="plus", choices=["plus", "minus"])
    p.add_argument("-outfmt", default="%f",
                   help="output format: %%f FASTA (default), or a "
                        "line per sequence with %%a id, %%t title, "
                        "%%l length, %%o oid, %%g gi, %%s sequence")
    p.add_argument("-out", default="-")
    args = p.parse_args(argv)

    from gblastn_tpu.io.encoding import (
        blastna_to_seq,
        reverse_complement_blastna,
    )

    db = SequenceDB.load(args.db)
    out = sys.stdout if args.out == "-" else open(args.out, "w")
    try:
        if args.info or not (args.entry or args.entry_batch):
            info = db.info()
            out.write(f"Database: {info.title}\n")
            out.write(
                f"\t{info.num_seqs:,} sequences; "
                f"{info.total_length:,} total bases\n\n"
            )
            out.write(f"Longest sequence: {info.max_length:,} bases\n")
            if db.masks:
                out.write("\nAvailable filtering algorithms applied "
                          "to database sequences:\n\n")
                out.write("Algorithm ID  Algorithm name      "
                          "Algorithm options\n")
                for algo, m in sorted(db.masks.items()):
                    out.write(
                        f"{algo:>12}  {m.program:<18}  {m.options}\n"
                    )
            return 0
        ids: list[str] = []
        if args.entry:
            ids.extend(args.entry.split(","))
        if args.entry_batch:
            ids.extend(
                ln.strip()
                for ln in Path(args.entry_batch).read_text().splitlines()
                if ln.strip()
            )
        if args.entry == "all":
            oids = list(range(db.num_seqs))
        else:
            # O(log n) per id via the sorted index (ISAM role)
            oids = []
            missing = []
            for sid in ids:
                oid = db.oid_of_id(sid)
                if oid is None:
                    missing.append(sid)
                else:
                    oids.append(oid)
            if missing:
                print(
                    f"Error: {','.join(missing)}: not found",
                    file=sys.stderr,
                )
                return 1
        from gblastn_tpu.io.seqdb import seq_id_gi

        for oid in oids:
            seq = db.get_sequence_blastna(oid)
            lo, hi = 1, len(seq)
            if args.range_:
                a, b = args.range_.split("-")
                lo, hi = int(a), int(b)
            seq = seq[lo - 1: hi]
            if args.strand == "minus":
                seq = reverse_complement_blastna(seq)
            if args.outfmt == "%f":
                title = (db.ids[oid] + " " + db.titles[oid]).strip()
                out.write(f">{title}\n")
                text = blastna_to_seq(seq)
                for i in range(0, len(text), 80):
                    out.write(text[i: i + 80] + "\n")
            else:
                # custom format line (blastdbcmd.cpp x_ProcessEntry
                # %-specifier substitution)
                gi = seq_id_gi(db.ids[oid])
                line = args.outfmt
                subs = {
                    "%a": db.ids[oid],
                    "%i": db.ids[oid],
                    "%t": db.titles[oid] or "N/A",
                    "%l": str(int(db.lengths[oid])),
                    "%o": str(oid),
                    "%g": str(gi) if gi is not None else "N/A",
                    "%s": blastna_to_seq(seq),
                }
                line = line.replace("%%", "\x00")
                for k, v in subs.items():
                    line = line.replace(k, v)
                out.write(line.replace("\x00", "%") + "\n")
        return 0
    finally:
        if out is not sys.stdout:
            out.close()


def run_blast_formatter(argv) -> int:
    """blast_formatter: re-render a -outfmt 11 archive (reference:
    src/app/blast/blast_formatter.cpp) as tabular 6/7/10."""
    import argparse

    p = argparse.ArgumentParser(prog="gblastn-tpu blast_formatter")
    p.add_argument("-archive", required=True,
                   help="Blast4-archive file (-outfmt 11 output)")
    p.add_argument("-outfmt", default="6")
    p.add_argument("-line_length", type=int, default=60,
                   help="alignment line length (outfmt 0-4)")
    p.add_argument("-num_descriptions", type=int, default=500,
                   help="one-line summary count (outfmt 0-4)")
    p.add_argument("-out", default="-")
    args = p.parse_args(argv)

    from gblastn_tpu.format.formatter import format_archive

    text = open(args.archive).read()
    out = sys.stdout if args.out == "-" else open(args.out, "w")
    try:
        return format_archive(
            text, out, args.outfmt,
            line_length=args.line_length,
            num_descriptions=args.num_descriptions,
        )
    finally:
        if out is not sys.stdout:
            out.close()


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    cmd, rest = argv[0], argv[1:]
    if cmd == "blastn":
        return run_blastn(rest)
    if cmd in ("makedb", "makeblastdb"):
        return run_makedb(rest)
    if cmd == "windowmasker":
        return run_windowmasker(rest)
    if cmd == "blastdbcmd":
        return run_blastdbcmd(rest)
    if cmd == "dustmasker":
        return run_dustmasker(rest)
    if cmd == "convert2blastmask":
        return run_convert2blastmask(rest)
    if cmd == "blastdb_aliastool":
        return run_aliastool(rest)
    if cmd == "blastdbcheck":
        return run_blastdbcheck(rest)
    if cmd == "makembindex":
        return run_makembindex(rest)
    if cmd == "blast_formatter":
        return run_blast_formatter(rest)
    # default: treat as blastn args directly
    return run_blastn(argv)


if __name__ == "__main__":
    sys.exit(main())
