"""Pipelined batch execution: overlap device seeding with host stages.

The TPU counterpart of G-BLASTN's pipeline mode (reference:
/root/reference/c++/src/app/blast/blastn_app.cpp Method2 :725-989 and
Method3 :991-1261; stage threads work_thread.cpp:16-156 with blocking
work queues thread_work_queue.hpp:110-162).

The reference overlaps stages with THREADS. Here the overlap is a
single-threaded interleave over async device dispatch instead:

* for batch k, ``prelim_search_steps`` runs query setup + LUT build and
  DISPATCHES the device seeding chain (one blob upload + two async
  dispatches, engine.seeding), then suspends without fetching;
* while the device executes batch k, the caller runs the host finish
  stage (traceback + filtering + formatting callback) for batch k-1;
* resuming the generator fetches batch k's packed seeds (by then
  usually ready) and completes its host prelim stages.

Why not threads: every host<->device operation of the TPU transport
needs the GIL, so a Python-heavy worker thread (traceback) starves the
dispatching thread -- measured 918 -> 68 q/s with a GIL-holding spin
thread. Single-threaded interleave keeps one dispatching thread (the
safe PJRT contract) and still overlaps the ~60% of batch time the
device chain takes with the ~40% the host stages take. On the pure-CPU
backend there is no async device to overlap, so the interleave
degrades gracefully to sequential order (never slower).

Output order is submission order by construction.
"""
from __future__ import annotations

from typing import Callable, Iterable

from gblastn_tpu.engine.search import (
    BlastResults,
    finish_search,
    prelim_search_steps,
)
from gblastn_tpu.io.fasta import FastaRecord
from gblastn_tpu.io.seqdb import SequenceDB
from gblastn_tpu.params.options import SearchOptions


def _drive(gen):
    try:
        while True:
            next(gen)
    except StopIteration as e:
        return e.value


def run_pipelined_search(
    batches: Iterable[list[FastaRecord]],
    db: SequenceDB,
    options: SearchOptions,
    on_results: Callable[[BlastResults], None],
    trace_threads: int = 2,   # kept for CLI compatibility; unused
    queue_depth: int = 2,     # kept for CLI compatibility; unused
    interrupt_fn=None,
) -> int:
    """Stream query batches through the interleaved pipeline; calls
    ``on_results`` for every batch in submission order. Returns the
    number of batches processed. Exceptions in any stage propagate;
    ``interrupt_fn`` is polled at stage boundaries (utils.interrupt)."""
    del trace_threads, queue_depth
    done = 0
    pending_gen = None      # batch k-1: dispatched, not yet fetched
    pending_finish = None   # batch k-2: prelim done, awaiting finish
    for batch in batches:
        gen = prelim_search_steps(batch, db, options, interrupt_fn)
        next(gen)          # setup + device dispatch for batch k
        if pending_finish is not None:
            # traceback/formatting of batch k-2 runs while the device
            # executes the k-1 and k seeding chains
            on_results(
                finish_search(pending_finish, db, options, interrupt_fn)
            )
            done += 1
        if pending_gen is not None:
            # fetch batch k-1 (its chain is ahead of k in the device
            # FIFO, so this rarely waits) + its host prelim stages
            pending_finish = _drive(pending_gen)
        pending_gen = gen
    if pending_finish is not None:
        on_results(
            finish_search(pending_finish, db, options, interrupt_fn)
        )
        done += 1
    if pending_gen is not None:
        prelim = _drive(pending_gen)
        on_results(finish_search(prelim, db, options, interrupt_fn))
        done += 1
    return done
