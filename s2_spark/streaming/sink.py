"""S2 append sink — foreachBatch with per-stream ordered commits.

The reference serializes appends per stream in an actor and acks in
order (``lite/src/backend/streamer.rs:306-324``, ``append.rs:96-220``).
In Structured Streaming the analogue is a ``foreachBatch`` sink: each
micro-batch is sequenced against the current tails with a per-stream
window (single shuffle on the stream key — the repartition IS the
single-writer-per-stream discipline) and committed atomically; the
checkpoint gives exactly-once across retries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from s2_spark.store import StreamStore


def append_sink(store: StreamStore, order_col: str = "ingest_order"):
    """Build a foreachBatch function appending into ``store``.

    Input batches need columns: basin, stream, timestamp (nullable ms),
    headers, body, and ``order_col`` (per-stream arrival order within
    the batch — e.g. the source offset).
    """

    def commit(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        store.bulk_append(batch_df, order_col=order_col)

    return commit


def write_stream_to_store(
    df: DataFrame,
    store: StreamStore,
    checkpoint_dir: str,
    order_col: str = "ingest_order",
    trigger: dict | None = None,
):
    """Wire a streaming DataFrame into the store (A2 append session)."""
    writer = (
        df.writeStream.foreachBatch(append_sink(store, order_col))
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
