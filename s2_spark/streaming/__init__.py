"""Structured Streaming layer — the S2 connector surface.

- ``source``: Python Data Source (Spark 4) streaming reader whose
  offsets are per-stream seq_nums — the checkpointed equivalent of the
  reference's SSE ``Last-Event-Id`` resume (api/src/v1/stream/sse.rs).
- ``sink``: foreachBatch per-stream ordered-commit append sink — the
  actor's serialized write discipline (lite/src/backend/streamer.rs).
- ``state``: stateful in-band fence/trim application
  (applyInPandasWithState keyed by stream).
- ``ops``: windowed/watermarked/session aggregations + dedup + enrich,
  the streaming halves of the Q-STR* contract.
"""

from s2_spark.streaming.sink import append_sink  # noqa: F401
from s2_spark.streaming.source import S2StreamDataSource, register  # noqa: F401
