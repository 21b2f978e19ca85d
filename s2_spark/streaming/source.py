"""S2 streaming source — a Spark 4 Python Data Source.

Re-expresses the reference's read-session / live-tail machinery
(``lite/src/backend/read.rs:183-240``) in Structured Streaming terms:

- **offsets** = ``{ "basin\\0stream": next_seq_num }`` — exactly the
  per-stream positions the reference encodes in SSE ``Last-Event-Id``
  (``api/src/v1/stream/sse.rs:10-73``); Spark checkpoints them, so a
  restarted query resumes where it left off (A14/A28).
- **latestOffset** = the tails scan (``check_tail``, A15).
- **partitions** = one input split per stream per micro-batch — the
  per-stream single-reader discipline; N streams read in parallel
  across executors.
- **read()** runs executor-side over pyarrow with filter pushdown on
  ``(basin, stream, seq_num)`` — the catch-up scan with key-range
  pruning (``read.rs:111-131``).

Caught-up live tailing = successive micro-batches where ``partitions``
returns only streams whose tail advanced (heartbeat ≡ empty progress).
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition

from s2_spark.model import RECORD_SCHEMA

SEP = "\x00"


class _StreamSlice(InputPartition):
    def __init__(self, path: str, basin: str, stream: str, start: int, end: int):
        self.path = path
        self.basin = basin
        self.stream = stream
        self.start = start
        self.end = end


def _tails(path: str) -> dict[str, int]:
    """Per-stream next_seq from storage — driver-side tails scan using
    parquet column statistics where possible (only the seq-key columns
    are ever materialized)."""
    import pyarrow.dataset as ds

    if not os.path.isdir(path):
        return {}
    try:
        dataset = ds.dataset(path, format="parquet")
    except (FileNotFoundError, OSError):
        return {}
    tails: dict[str, int] = {}
    for batch in dataset.to_batches(columns=["basin", "stream", "seq_num"]):
        if batch.num_rows == 0:
            continue
        basins = batch.column(0).to_pylist()
        streams = batch.column(1).to_pylist()
        seqs = batch.column(2).to_pylist()
        for b, s, q in zip(basins, streams, seqs):
            k = f"{b}{SEP}{s}"
            if q + 1 > tails.get(k, 0):
                tails[k] = q + 1
    return tails


class S2StreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.path = options["path"]
        self.basin = options.get("basin")
        self.stream = options.get("stream")
        self.start_seq = int(options.get("startseq", 0))
        # admission control / backpressure (the reference's in-flight
        # bytes semaphore, streamer.rs:815-838): cap how far each
        # stream's offset advances per micro-batch
        self.max_per_trigger = int(options.get("maxrecordspertrigger", 0))

    def _filtered(self, tails: dict[str, int]) -> dict[str, int]:
        out = {}
        for k, v in tails.items():
            b, s = k.split(SEP, 1)
            if self.basin and b != self.basin:
                continue
            if self.stream and s != self.stream:
                continue
            out[k] = v
        return out

    def initialOffset(self) -> dict:
        # start of the log (or a requested seq) for every known stream;
        # streams discovered later start at 0 via partitions()
        return {k: self.start_seq for k in self._filtered(_tails(self.path))}

    def latestOffset(self) -> dict:
        # Note: with rate limiting we still report true tails here and
        # clamp in latestOffset-vs-start at partition planning; Spark's
        # DataSourceStreamReader contract applies offsets as reported,
        # so clamping must happen where the end offset is produced.
        tails = self._filtered(_tails(self.path))
        if self.max_per_trigger > 0:
            committed = getattr(self, "_last_committed", {})
            tails = {
                k: min(v, committed.get(k, self.start_seq) + self.max_per_trigger)
                for k, v in tails.items()
            }
        return tails

    def partitions(self, start: dict, end: dict):
        # advance the rate-limit baseline here: partitions() sees every
        # planned batch's end offsets even when commit() isn't invoked
        if self.max_per_trigger > 0:
            prev = getattr(self, "_last_committed", {})
            self._last_committed = {**prev, **end}
        parts = []
        for k, e in end.items():
            s = start.get(k, self.start_seq)
            if e > s:
                b, st = k.split(SEP, 1)
                parts.append(_StreamSlice(self.path, b, st, s, e))
        # Spark requires ≥1 partition per batch; emit an empty slice as
        # the heartbeat (read.rs:383-391) when no stream advanced.
        if not parts:
            parts.append(_StreamSlice(self.path, "", "", 0, 0))
        return parts

    def commit(self, end: dict) -> None:
        # offsets live in the checkpoint; remember the high-water mark so
        # rate limiting advances window-by-window
        self._last_committed = dict(end)

    def read(self, partition: _StreamSlice):
        if partition.end <= partition.start:
            return
        import pyarrow.dataset as ds

        dataset = ds.dataset(partition.path, format="parquet")
        flt = (
            (ds.field("basin") == partition.basin)
            & (ds.field("stream") == partition.stream)
            & (ds.field("seq_num") >= partition.start)
            & (ds.field("seq_num") < partition.end)
        )
        table = dataset.to_table(filter=flt)
        # deliver in seq order (total order per stream)
        table = table.sort_by("seq_num")
        for row in table.to_pylist():
            headers = [(h["name"], h["value"]) for h in (row["headers"] or [])]
            yield (
                row["basin"],
                row["stream"],
                row["seq_num"],
                row["timestamp"],
                headers,
                row["body"],
            )


class S2StreamDataSource(DataSource):
    """spark.readStream.format("s2").option("path", dir).load()"""

    @classmethod
    def name(cls) -> str:
        return "s2"

    def schema(self):
        return RECORD_SCHEMA

    def streamReader(self, schema):
        return S2StreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(S2StreamDataSource)
