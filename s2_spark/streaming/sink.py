"""S2 append sink — foreachBatch with per-stream ordered commits.

The reference serializes appends per stream in an actor and acks in
order (``lite/src/backend/streamer.rs:306-324``, ``append.rs:96-220``).
In Structured Streaming the analogue is a ``foreachBatch`` sink: each
micro-batch is sequenced against the current tails with a per-stream
window (single shuffle on the stream key — the repartition IS the
single-writer-per-stream discipline) and committed atomically.

**Exactly-once across retries** needs sink-side idempotence —
foreachBatch alone is at-least-once (a crash after the append but
before Spark's checkpoint commit replays the epoch). The sink keeps a
tiny epoch log under ``{base_dir}/_sink_epochs/{sink_id}``:

- before appending, an ``<epoch>.intent`` marker records, per touched
  stream: the pre-append tail, the batch's record count, and a digest
  of the batch's FIRST record (headers+body — the sequencing-stable
  fields; the stored timestamp may differ from the input's);
- after appending, the epoch is marked done and the intent removed;
- a replayed epoch already marked done is skipped outright;
- a replayed epoch with only ``intent`` present decides per stream
  whether the crashed attempt's append committed by PROBING STORAGE,
  not by tail movement: the crashed attempt computed its seqs from the
  recorded tails, so if it landed at all, its first record for stream
  k sits exactly at seq ``tails[k]``. A digest match there proves the
  commit; a differing record there is a foreign append (a second
  producer, or retention's in-band trim-command records — both advance
  the tail WITHOUT our records landing, the round-6 design's silent
  data-loss hole) and the replay proceeds. Per-stream verdicts repair
  even a cross-stream partial commit (re-append only the streams whose
  records never landed). Two states refuse to guess and raise
  :class:`ExactlyOnceUnverifiable` instead of silently choosing: the
  evidence record was compacted away, or a digest match with a tail
  short of ``tails[k]+counts[k]`` (would contradict the per-stream
  write atomicity the sink relies on — one sequenced task file per
  stream per batch).

**Epoch-log compaction**: markers would otherwise accumulate forever
(a 1 s-trigger query creates ~86k files/day). The log keeps a single
``_watermark`` file — "every epoch ≤ W is done" — advanced over each
contiguous run of ``.done`` markers, which are then deleted; the
steady-state file count is O(1). Epoch ids come from Spark's
checkpoint and are monotone per query; starting a FRESH checkpoint
over an old store must use a fresh ``sink_id`` (the log is meaningless
across checkpoint resets — same rule as before compaction, when stale
``.done`` files would equally have masked re-used epoch ids).

The batch DataFrame is persisted across ``bulk_append``'s two passes
(admission aggregation, then the sequencing write): without it a
nondeterministic upstream could yield different rows to the write than
the admission pass counted, corrupting seq assignment.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from s2_spark.store import StreamStore

_KEY_SEP = "\x00"


class ExactlyOnceUnverifiable(RuntimeError):
    """Raised when a crashed epoch's commit status cannot be decided
    from storage evidence — replaying could double-append, skipping
    could lose data. Loud beats silent either-way-wrong."""


def _record_digest(headers, body) -> str:
    """Length-prefixed canonical digest of the sequencing-stable record
    fields. ``headers`` is an iterable of (name, value) byte pairs (or
    Rows with those fields); ``body`` bytes-like or None."""
    h = hashlib.sha256()
    for hdr in headers or []:
        name = bytes(hdr["name"] or b"")
        val = bytes(hdr["value"] or b"")
        h.update(len(name).to_bytes(4, "big"))
        h.update(name)
        h.update(len(val).to_bytes(4, "big"))
        h.update(val)
    b = bytes(body or b"")
    h.update(len(b).to_bytes(8, "big"))
    h.update(b)
    return h.hexdigest()


class EpochLog:
    """Bounded exactly-once marker log: ``_watermark`` (all epochs ≤ W
    done) + ``.done`` markers only for epochs past the contiguous
    prefix. All writes are tmp+rename (atomic on one filesystem)."""

    def __init__(self, dir_: str):
        self.dir = dir_

    # -- paths ---------------------------------------------------------
    def done_path(self, epoch_id: int) -> str:
        return os.path.join(self.dir, f"{epoch_id}.done")

    def intent_path(self, epoch_id: int) -> str:
        return os.path.join(self.dir, f"{epoch_id}.intent")

    def _wm_path(self) -> str:
        return os.path.join(self.dir, "_watermark")

    # -- reads ---------------------------------------------------------
    def watermark(self) -> int:
        try:
            with open(self._wm_path()) as f:
                return int(f.read().strip())
        except (OSError, ValueError):
            return -1

    def is_done(self, epoch_id: int) -> bool:
        return epoch_id <= self.watermark() or os.path.exists(
            self.done_path(epoch_id)
        )

    def marker_count(self) -> int:
        """Diagnostic: live ``.done`` files (bounded by compaction)."""
        try:
            return sum(1 for f in os.listdir(self.dir) if f.endswith(".done"))
        except OSError:
            return 0

    # -- writes --------------------------------------------------------
    def _write_atomic(self, path: str, text: str) -> None:
        os.makedirs(self.dir, exist_ok=True)
        with open(path + ".tmp", "w") as f:
            f.write(text)
        os.rename(path + ".tmp", path)

    def write_intent(self, epoch_id: int, payload: dict) -> None:
        self._write_atomic(self.intent_path(epoch_id), json.dumps(payload))

    def mark_done(self, epoch_id: int) -> None:
        self._write_atomic(self.done_path(epoch_id), "")
        self._compact()

    def _compact(self) -> None:
        """Fold the contiguous done prefix into the watermark, then
        drop every marker at/below it. Crash-safe at any point: a crash
        after the marker write keeps the marker; after the watermark
        write but before the deletes, the stale markers are ≤ W and the
        next compaction removes them."""
        wm = self.watermark()
        new = wm
        while os.path.exists(self.done_path(new + 1)):
            new += 1
        if new > wm:
            self._write_atomic(self._wm_path(), str(new))
        if new >= 0:
            try:
                entries = os.listdir(self.dir)
            except OSError:
                return
            for f in entries:
                if not f.endswith(".done"):
                    continue
                try:
                    e = int(f[: -len(".done")])
                except ValueError:
                    continue
                if e <= new:
                    try:
                        os.remove(os.path.join(self.dir, f))
                    except OSError:
                        pass


def append_sink(
    store: StreamStore, order_col: str = "ingest_order", sink_id: str = "default"
):
    """Build a foreachBatch function appending into ``store``.

    Input batches need columns: basin, stream, timestamp (nullable ms),
    headers, body, and ``order_col`` (per-stream arrival order within
    the batch — e.g. the source offset). ``sink_id`` namespaces the
    epoch log when several queries write into one store.
    """
    log = EpochLog(os.path.join(store.base_dir, "_sink_epochs", sink_id))

    def _committed_streams(before: dict) -> dict[str, bool]:
        """Per-stream verdict for a crashed attempt: did its append
        land? Decided by the storage probe described in the module
        docstring, never by tail movement alone."""
        tails, counts, digests = before["tails"], before["counts"], before["digests"]
        verdicts: dict[str, bool] = {}
        keys = [tuple(k.split(_KEY_SEP, 1)) for k in tails]
        store._ensure_states(keys)
        for b, s in keys:
            k = f"{b}{_KEY_SEP}{s}"
            t0 = tails[k]
            tail_now = store._st(b, s).tail_seq
            if tail_now <= t0:
                verdicts[k] = False  # nothing landed past the recorded tail
                continue
            row = (
                store.records_df()
                .filter(
                    (F.col("basin") == b)
                    & (F.col("stream") == s)
                    & (F.col("seq_num") == t0)
                )
                .select("headers", "body")
                .collect()
            )
            if not row:
                raise ExactlyOnceUnverifiable(
                    f"epoch replay: record at seq {t0} of {b}/{s} was "
                    "compacted/trimmed away before the crashed attempt "
                    "could be verified — cannot decide committed vs not"
                )
            if _record_digest(row[0]["headers"], row[0]["body"]) == digests[k]:
                if tail_now < t0 + counts[k]:
                    raise ExactlyOnceUnverifiable(
                        f"epoch replay: {b}/{s} shows the crashed "
                        f"attempt's first record at seq {t0} but only "
                        f"{tail_now - t0} of its {counts[k]} records — "
                        "partial within-stream commit contradicts the "
                        "sink's per-stream write atomicity"
                    )
                verdicts[k] = True
            else:
                # a foreign record (second producer, or retention's
                # in-band trim commands) consumed seq t0: the crashed
                # attempt never committed for this stream
                verdicts[k] = False
        return verdicts

    def commit(batch_df: DataFrame, epoch_id: int) -> None:
        if log.is_done(epoch_id):
            return  # replay of a fully committed epoch
        intent = log.intent_path(epoch_id)
        batch_df = batch_df.persist()
        try:
            if batch_df.isEmpty():
                log.mark_done(epoch_id)
                return
            replay_only: list[str] | None = None
            if os.path.exists(intent):
                # crashed attempt: decide per stream from storage
                with open(intent) as f:
                    before = json.load(f)
                if before.get("v") != 2:
                    # pre-digest intent (round-6 format): tail movement
                    # is not attributable — refuse to guess
                    keys = [tuple(k.split(_KEY_SEP, 1)) for k in before]
                    store._ensure_states(keys)
                    if any(
                        store._st(b, s).tail_seq > before[f"{b}{_KEY_SEP}{s}"]
                        for b, s in keys
                    ):
                        raise ExactlyOnceUnverifiable(
                            "epoch replay: legacy (v1) intent with moved "
                            "tails — upgrade wrote no record digests, so "
                            "the advance cannot be attributed"
                        )
                    # tails unmoved: the crashed attempt wrote nothing
                else:
                    verdicts = _committed_streams(before)
                    if all(verdicts.values()):
                        log.mark_done(epoch_id)
                        os.remove(intent)
                        return
                    replay_only = [k for k, ok in verdicts.items() if not ok]
                    if len(replay_only) == len(verdicts):
                        replay_only = None  # nothing landed: full replay
            else:
                # one pass discovers the keys AND the evidence the
                # replay path needs: per-stream count and first-record
                # digest (min_by on the order column)
                agg = (
                    batch_df.groupBy("basin", "stream")
                    .agg(
                        F.count("*").alias("n"),
                        F.min_by(
                            F.struct("headers", "body"), F.col(order_col)
                        ).alias("first"),
                    )
                    .collect()
                )
                keys = [(r["basin"], r["stream"]) for r in agg]
                store._ensure_states(keys)
                before = {
                    "v": 2,
                    "tails": {},
                    "counts": {},
                    "digests": {},
                }
                for r in agg:
                    k = f"{r['basin']}{_KEY_SEP}{r['stream']}"
                    before["tails"][k] = store._st(r["basin"], r["stream"]).tail_seq
                    before["counts"][k] = r["n"]
                    before["digests"][k] = _record_digest(
                        r["first"]["headers"], r["first"]["body"]
                    )
                log.write_intent(epoch_id, before)
            to_append = batch_df
            if replay_only is not None:
                # cross-stream partial commit: re-append only the
                # streams whose records never landed
                to_append = batch_df.filter(
                    F.concat_ws(_KEY_SEP, "basin", "stream").isin(replay_only)
                )
            store.bulk_append(to_append, order_col=order_col)
            log.mark_done(epoch_id)
            os.remove(intent)
        finally:
            batch_df.unpersist()

    return commit


def write_stream_to_store(
    df: DataFrame,
    store: StreamStore,
    checkpoint_dir: str,
    order_col: str = "ingest_order",
    trigger: dict | None = None,
    sink_id: str = "default",
):
    """Wire a streaming DataFrame into the store (A2 append session)."""
    writer = (
        df.writeStream.foreachBatch(append_sink(store, order_col, sink_id))
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
