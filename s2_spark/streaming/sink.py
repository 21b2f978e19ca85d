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

- before appending, an ``<epoch>.intent`` marker records each touched
  stream's tail;
- after appending, ``<epoch>.done`` is created and the intent removed;
- a replayed epoch with ``done`` present is skipped outright;
- a replayed epoch with only ``intent`` present compares current tails
  to the recorded ones: any advance means the crashed attempt's append
  DID commit (the sink is the single writer of its streams — the
  documented discipline), so the epoch is marked done and skipped;
  otherwise the append never landed and the replay proceeds.

The batch DataFrame is persisted across ``bulk_append``'s two passes
(admission aggregation, then the sequencing write): without it a
nondeterministic upstream could yield different rows to the write than
the admission pass counted, corrupting seq assignment.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

from s2_spark.store import StreamStore

_KEY_SEP = "\x00"


def append_sink(
    store: StreamStore, order_col: str = "ingest_order", sink_id: str = "default"
):
    """Build a foreachBatch function appending into ``store``.

    Input batches need columns: basin, stream, timestamp (nullable ms),
    headers, body, and ``order_col`` (per-stream arrival order within
    the batch — e.g. the source offset). ``sink_id`` namespaces the
    epoch log when several queries write into one store.
    """
    epochs_dir = os.path.join(store.base_dir, "_sink_epochs", sink_id)

    def _mark_done(epoch_id: int) -> None:
        os.makedirs(epochs_dir, exist_ok=True)
        path = os.path.join(epochs_dir, f"{epoch_id}.done")
        with open(path + ".tmp", "w") as f:
            f.write("")
        os.rename(path + ".tmp", path)

    def commit(batch_df: DataFrame, epoch_id: int) -> None:
        done = os.path.join(epochs_dir, f"{epoch_id}.done")
        intent = os.path.join(epochs_dir, f"{epoch_id}.intent")
        if os.path.exists(done):
            return  # replay of a fully committed epoch
        batch_df = batch_df.persist()
        try:
            if batch_df.isEmpty():
                _mark_done(epoch_id)
                return
            if os.path.exists(intent):
                # crashed attempt: did its append land?
                with open(intent) as f:
                    before = json.load(f)
                keys = [tuple(k.split(_KEY_SEP, 1)) for k in before]
                store._ensure_states(keys)
                if any(
                    store._st(b, s).tail_seq > before[f"{b}{_KEY_SEP}{s}"]
                    for b, s in keys
                ):
                    _mark_done(epoch_id)
                    os.remove(intent)
                    return
            else:
                keys = [
                    (r["basin"], r["stream"])
                    for r in batch_df.select("basin", "stream").distinct().collect()
                ]
                store._ensure_states(keys)
                before = {
                    f"{b}{_KEY_SEP}{s}": store._st(b, s).tail_seq for b, s in keys
                }
                os.makedirs(epochs_dir, exist_ok=True)
                with open(intent + ".tmp", "w") as f:
                    json.dump(before, f)
                os.rename(intent + ".tmp", intent)
            store.bulk_append(batch_df, order_col=order_col)
            _mark_done(epoch_id)
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
