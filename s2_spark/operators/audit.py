"""Ops audit meta-stream — the missing input for the read-side metric
sets (A26). The reference declares ReadOps / ReadThroughput / BasinOps
alongside the append/storage sets (``api/src/v1/metrics.rs:110-130``),
which implies the serving layer records every read and control-plane
operation somewhere aggregatable. Here that record is an explicit
meta-stream owned by the store: one row per served operation, buffered
driver-side and flushed to parquet under ``{base_dir}/_audit`` (the
underscore prefix keeps it invisible to the records table's parquet
listing, like ``_meta``).

Design constraints:

- **Logging must not cost a Spark job.** ``log()`` is a dict append;
  parquet writes happen only at the flush threshold (default 4096
  rows) or an explicit :meth:`flush` — a follow session polling at
  20 ms never touches the cluster for audit's sake.
- **Aggregation is a DataFrame.** :meth:`df` returns the full audit
  relation (flushed + buffered); the metric sets in
  ``operators/metrics.py`` are plain groupBys over it, sharing the
  bucketing machinery with the append sets.
- At real scale the audit stream is itself an S2 stream (the engine
  eating its own dog food); the parquet dir stands in for that here
  with the same append-only discipline.
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import DataFrame, SparkSession

AUDIT_SCHEMA = (
    "timestamp long, op string, basin string, stream string, "
    "records long, bytes long"
)

#: data-plane read RPCs — the ReadOps set counts these
READ_OPS = ("read", "read_session")
#: control-plane basin RPCs — the BasinOps set counts these. (Internal
#: admission lookups — ensure_stream_for / resolve_config — are NOT
#: logged: only client-shaped operations count, so a hot append path
#: doesn't inflate BasinOps with its own config resolution.)
BASIN_OPS = (
    "create_stream",
    "delete_stream",
    "reconfigure_stream",
    "list_streams",
)


class OpsAudit:
    """Driver-buffered, parquet-backed operation log."""

    def __init__(
        self,
        spark: SparkSession,
        audit_dir: str,
        clock,
        flush_threshold: int = 4096,
    ):
        self.spark = spark
        self.dir = audit_dir
        self._clock = clock
        self.flush_threshold = flush_threshold
        self._buf: list[tuple] = []
        self._mu = threading.Lock()
        self._flushed_any = os.path.isdir(audit_dir) and any(
            f.endswith(".parquet") for f in os.listdir(audit_dir)
        )

    def log(
        self,
        op: str,
        basin: str,
        stream: str | None = None,
        records: int | None = None,
        nbytes: int | None = None,
    ) -> None:
        with self._mu:
            self._buf.append(
                (self._clock(), op, basin, stream, records, nbytes)
            )
            need_flush = len(self._buf) >= self.flush_threshold
        if need_flush:
            self.flush()

    def flush(self) -> None:
        """Write buffered rows as one parquet append (one Spark job)."""
        with self._mu:
            rows, self._buf = self._buf, []
        if not rows:
            return
        df = self.spark.createDataFrame(rows, AUDIT_SCHEMA)
        df.coalesce(1).write.mode("append").parquet(self.dir)
        self._flushed_any = True

    def df(self) -> DataFrame:
        """The audit relation: everything flushed plus the current
        buffer (buffer rides as a small union — metric queries see ops
        immediately without forcing a write)."""
        with self._mu:
            rows = list(self._buf)
        parts = []
        if self._flushed_any:
            parts.append(self.spark.read.schema(AUDIT_SCHEMA).parquet(self.dir))
        if rows:
            parts.append(self.spark.createDataFrame(rows, AUDIT_SCHEMA))
        if not parts:
            return self.spark.createDataFrame([], AUDIT_SCHEMA)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out
