"""Batching producer (A27) — the SDK-side linger/batch machinery
(``sdk/src/batching.rs:21-36``, ``sdk/src/producer.rs:63-80``):
records submitted individually are coalesced into batches bounded by
linger time, record count (≤1000), and metered bytes (≤1 MiB); every
submit returns a future that resolves to the record's assigned
position once its batch's append acks.

Admission control: submits block while un-acked metered bytes (queued
+ in-flight batches) exceed the producer's window — 5 MiB by default,
floored at 1 MiB — matching the SDK's un-acked-bytes semaphore
(``sdk/src/producer.rs:63-80``; server analogue
``lite/src/backend/streamer.rs:815-838``). Without it a submit burst
queues unboundedly in driver memory.
"""

from __future__ import annotations

import threading
from concurrent.futures import Future

from s2_spark.model import (
    MAX_BATCH_METERED_BYTES,
    MAX_BATCH_RECORDS,
    Record,
)
from s2_spark.store import StreamStore

MIN_UNACKED_WINDOW_BYTES = 1 << 20  # 1 MiB floor (sdk/src/producer.rs:66)
DEFAULT_UNACKED_WINDOW_BYTES = 5 << 20  # 5 MiB default (sdk/src/producer.rs:63)


class Producer:
    def __init__(
        self,
        store: StreamStore,
        basin: str,
        stream: str,
        linger_ms: float = 5.0,
        max_batch_records: int = MAX_BATCH_RECORDS,
        max_batch_bytes: int = MAX_BATCH_METERED_BYTES,
        max_unacked_bytes: int = DEFAULT_UNACKED_WINDOW_BYTES,
    ):
        self.store = store
        self.basin = basin
        self.stream = stream
        self.linger_s = linger_ms / 1000.0
        # batch bounds beyond the hard caps would pass every record at
        # submit time and then fail the whole batch at commit — reject
        # the misconfiguration up front (validate-early, like the
        # un-acked window below)
        if not (1 <= int(max_batch_records) <= MAX_BATCH_RECORDS):
            raise ValueError(
                f"max_batch_records must be in 1..{MAX_BATCH_RECORDS}, "
                f"got {int(max_batch_records)}"
            )
        if not (1 <= int(max_batch_bytes) <= MAX_BATCH_METERED_BYTES):
            raise ValueError(
                f"max_batch_bytes must be in 1..{MAX_BATCH_METERED_BYTES}, "
                f"got {int(max_batch_bytes)}"
            )
        self.max_records = int(max_batch_records)
        self.max_bytes = int(max_batch_bytes)
        if int(max_unacked_bytes) < MIN_UNACKED_WINDOW_BYTES:
            # the SDK rejects sub-1MiB windows rather than clamping
            # (sdk/src/producer.rs with_max_unacked_bytes validation)
            raise ValueError(
                f"max_unacked_bytes must be >= {MIN_UNACKED_WINDOW_BYTES} "
                f"(1 MiB), got {int(max_unacked_bytes)}"
            )
        self.max_unacked_bytes = int(max_unacked_bytes)
        self._pending: list[tuple[Record, Future]] = []
        self._pending_bytes = 0
        self._unacked_bytes = 0  # queued + batches whose append hasn't returned
        self._lock = threading.Lock()
        self._unacked_cv = threading.Condition(self._lock)
        self._timer: threading.Timer | None = None
        self._closed = False
        # commit-ordering tickets: a batch's ticket is issued at TAKE
        # time (under the producer lock, so ticket order == submission
        # order), and commits run strictly in ticket order — without
        # this, a linger-timer flush racing a fill flush could win the
        # store's per-stream writer lock first and put a later batch's
        # records at earlier seq_nums (the SDK's ordered-pipelined-acks
        # contract, sdk/src/producer.rs)
        self._next_ticket = 0
        self._turn = 0
        self._turn_cv = threading.Condition()

    def submit(self, record: Record) -> Future:
        """Queue one record; returns a Future resolving to its assigned
        seq_num. Flushes when the batch fills (count/bytes) or after the
        linger window. Blocks while the un-acked window is full — the
        caller experiences backpressure instead of unbounded queueing."""
        record.validate()
        fut: Future = Future()
        size = record.metered_size()
        while True:
            stale = None
            batch = None
            admitted = False
            with self._unacked_cv:
                if self._closed:
                    raise RuntimeError("producer closed")
                # un-acked window admission (the `> 0` guard admits a lone
                # record wider than the window rather than deadlocking)
                window_full = (
                    self._unacked_bytes > 0
                    and self._unacked_bytes + size > self.max_unacked_bytes
                )
                if not window_full:
                    admitted = True
                    self._unacked_bytes += size
                    if (
                        len(self._pending) + 1 > self.max_records
                        or self._pending_bytes + size > self.max_bytes
                    ):
                        batch = self._take_locked()  # full: flush, then queue
                    try:
                        self._pending.append((record, fut))
                        self._pending_bytes += size
                        if self._timer is None:
                            timer = threading.Timer(self.linger_s, self.flush)
                            timer.daemon = True
                            timer.start()  # can raise: thread exhaustion
                            self._timer = timer  # only a RUNNING timer kept
                    except BaseException:
                        # roll back this record's admission and, if a
                        # batch was taken above, un-issue its ticket and
                        # restore its records — an issued ticket that
                        # never reaches _commit stalls _turn forever, so
                        # every later commit and close() would deadlock.
                        # The lock is held since the take, so no other
                        # ticket can have been issued in between.
                        if self._pending and self._pending[-1][1] is fut:
                            self._pending.pop()
                            self._pending_bytes -= size
                        self._unacked_bytes -= size
                        if batch is not None:
                            ticket, taken_records = batch
                            assert self._next_ticket == ticket + 1
                            self._next_ticket = ticket
                            self._pending = taken_records + self._pending
                            self._pending_bytes += sum(
                                r.metered_size() for r, _ in taken_records
                            )
                        if self._pending and self._timer is None:
                            # best-effort: re-arm the linger so the
                            # restored records' futures don't stall
                            # until an unrelated submit/flush/close —
                            # if thread creation is still failing
                            # there's nothing more to arm with
                            try:
                                timer = threading.Timer(
                                    self.linger_s, self.flush
                                )
                                timer.daemon = True
                                timer.start()
                                self._timer = timer
                            except Exception:
                                pass
                        self._unacked_cv.notify_all()
                        raise
                elif self._pending_bytes > 0:
                    # queued-but-unflushed bytes may be the sole occupant
                    # of the window; flush them now instead of stalling up
                    # to the full linger on bytes nothing else will move
                    stale = self._take_locked()
                else:
                    self._unacked_cv.wait()
            if stale is not None:
                self._commit(stale)  # frees window bytes, then re-check
                continue
            if admitted:
                if batch:
                    self._commit(batch)
                return fut

    def _take_locked(self):
        """Take the pending batch with a commit-order ticket; None when
        nothing is pending (no ticket is burned — every issued ticket
        MUST reach _commit or the turn sequence would stall)."""
        if not self._pending:
            return None
        batch = self._pending
        self._pending = []
        self._pending_bytes = 0
        if self._timer is not None:
            self._timer.cancel()
            self._timer = None
        ticket = self._next_ticket
        self._next_ticket += 1
        return ticket, batch

    def _commit(self, taken) -> None:
        ticket, batch = taken
        # strict ticket order: earlier-taken batches append first, so
        # stream order always equals submission order
        with self._turn_cv:
            while self._turn != ticket:
                self._turn_cv.wait()
        records = [r for r, _ in batch]
        size = sum(r.metered_size() for r in records)
        try:
            try:
                try:
                    ack = self.store.append(self.basin, self.stream, records)
                finally:
                    # acked OR failed: either way the bytes are no longer
                    # in flight — release blocked submitters
                    with self._unacked_cv:
                        self._unacked_bytes -= size
                        self._unacked_cv.notify_all()
            except Exception as e:  # fail every future in the batch
                for _, fut in batch:
                    if not fut.done():
                        fut.set_exception(e)
                return
            for i, (_, fut) in enumerate(batch):
                if not fut.done():
                    fut.set_result(ack.start_seq + i)
        finally:
            with self._turn_cv:
                self._turn = ticket + 1
                self._turn_cv.notify_all()

    def flush(self) -> None:
        with self._lock:
            taken = self._take_locked()
        if taken:
            self._commit(taken)

    def close(self) -> None:
        """Drain-then-close: no submit admitted after this returns, the
        pending batch (if any) is committed, and every in-flight
        linger-timer commit has completed — futures handed out before
        close() are all resolved when it returns."""
        with self._unacked_cv:
            self._closed = True  # set BEFORE taking: no submit sneaks in
            taken = self._take_locked()
            drain_to = self._next_ticket
            self._unacked_cv.notify_all()  # wake blocked submitters → raise
        if taken:
            self._commit(taken)
        with self._turn_cv:
            while self._turn < drain_to:
                self._turn_cv.wait()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
