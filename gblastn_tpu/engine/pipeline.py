"""Pipelined batch execution: overlap device seeding with host traceback.

The TPU counterpart of G-BLASTN's pipeline mode (reference:
/root/reference/c++/src/app/blast/blastn_app.cpp Method2 :725-989 and
Method3 :991-1261; stage threads work_thread.cpp:16-156 with blocking
work queues thread_work_queue.hpp:110-162):

* the CALLING thread runs ``prelim_search`` (device seeding + host
  gapped score-only) for batch i+1 while trace workers run
  ``finish_search`` (native traceback + filtering) for batch i -- the
  device dispatch and the ctypes aligner release the GIL, so the stages
  genuinely overlap;
* device work deliberately stays on the caller's thread: the TPU
  tunnel transport stalls device dispatches issued from secondary
  threads (measured 20x seeding inflation when prelim ran on a worker
  thread; the CPU backend shows no such effect), and keeping a single
  dispatching thread is the safe contract for PJRT clients generally;
* a printer thread re-orders results by batch index before the
  ``on_results`` callback, so output order is identical to sequential
  mode;
* queue capacities bound memory exactly like the reference's blocking
  work_queue<T>.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable

from gblastn_tpu.engine.search import (
    BlastResults,
    finish_search,
    prelim_search,
)
from gblastn_tpu.io.fasta import FastaRecord
from gblastn_tpu.io.seqdb import SequenceDB
from gblastn_tpu.params.options import SearchOptions

_STOP = object()


def run_pipelined_search(
    batches: Iterable[list[FastaRecord]],
    db: SequenceDB,
    options: SearchOptions,
    on_results: Callable[[BlastResults], None],
    trace_threads: int = 2,
    queue_depth: int = 2,
    interrupt_fn=None,
) -> int:
    """Stream query batches through the two-stage pipeline; calls
    ``on_results`` for every batch in submission order. Returns the
    number of batches processed. Exceptions in any stage propagate;
    ``interrupt_fn`` is polled between batches in every stage
    (utils.interrupt contract)."""
    prelim_q: queue.Queue = queue.Queue(maxsize=queue_depth)
    result_q: queue.Queue = queue.Queue()
    errors: list[BaseException] = []
    done = [0]

    def trace_worker():
        while True:
            item = prelim_q.get()
            if item is _STOP:
                result_q.put(_STOP)
                return
            idx, prelim = item
            try:
                results = finish_search(prelim, db, options, interrupt_fn)
            except BaseException as e:  # noqa: BLE001 - propagated below
                errors.append(e)
                result_q.put(_STOP)
                return
            result_q.put((idx, results))

    def print_worker():
        # reorder by batch index (PrintThread's process_num accounting
        # keeps output ordered in the reference)
        pending: dict[int, BlastResults] = {}
        next_idx = 0
        stops = 0
        while stops < trace_threads:
            item = result_q.get()
            if item is _STOP:
                stops += 1
                continue
            idx, results = item
            pending[idx] = results
            while next_idx in pending:
                try:
                    on_results(pending.pop(next_idx))
                except BaseException as e:  # noqa: BLE001
                    errors.append(e)
                    return
                next_idx += 1
                done[0] += 1
        while next_idx in pending:   # stragglers after a worker error
            on_results(pending.pop(next_idx))
            next_idx += 1
            done[0] += 1

    threads = [
        threading.Thread(target=trace_worker, daemon=True)
        for _ in range(trace_threads)
    ]
    threads.append(threading.Thread(target=print_worker, daemon=True))
    for t in threads:
        t.start()

    # prelim stage on the calling thread (see module docstring)
    try:
        for idx, batch in enumerate(batches):
            if errors:
                break
            prelim = prelim_search(batch, db, options, interrupt_fn)
            prelim_q.put((idx, prelim))
    except BaseException as e:  # noqa: BLE001
        errors.append(e)
    finally:
        for _ in range(trace_threads):
            prelim_q.put(_STOP)
    for t in threads:
        t.join()
    if errors:
        raise errors[0]
    return done[0]
