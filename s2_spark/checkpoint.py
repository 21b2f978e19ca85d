"""Lineage-truncation barriers with a session-level durability knob.

Several operators (dedup diamonds, SemDeDup assignment, recall-report
corpora, the chunked-prefix totals) eagerly truncate lineage so an
expensive subtree evaluates ONCE even when multiple downstream
consumers reference it (Spark reuses exchanges, not scans). The fast
mechanism is ``localCheckpoint``: blocks live in executor storage with
NO replication, so an executor loss makes the truncated lineage
unrecoverable and fails the job mid-query. That is the right local
default and a real fault-tolerance trade at cluster scale (guide §5),
so the durability is a SESSION-LEVEL knob instead of a hard-coded
call:

    spark.conf.set("s2spark.checkpoint.mode", "local")       # default
    spark.conf.set("s2spark.checkpoint.mode", "replicated")
    spark.conf.set("s2spark.checkpoint.mode", "reliable")
    spark.conf.set("s2spark.checkpoint.dir", "hdfs://.../ckpt")

- ``local``: ``localCheckpoint`` at Spark's default storage level
  (memory+disk, 1 replica). Fastest; an executor loss kills the query
  (acceptable in local mode, where executor == the application).
- ``replicated``: ``localCheckpoint`` at MEMORY_AND_DISK_2 — every
  block lives on two executors, so the query survives any single
  executor loss at the cost of one extra copy of each barrier's rows.
- ``reliable``: ``DataFrame.checkpoint`` into the SparkContext
  checkpoint dir (``s2spark.checkpoint.dir`` is applied if the context
  has none) — survives arbitrary executor loss; costs one write+read
  of the barrier's rows to shared storage. Checkpoint files are owned
  by the caller (Spark auto-cleans only with
  ``spark.cleaner.referenceTracking.cleanCheckpoints=true``).

All three modes produce the same physical plan shape downstream (the
barrier scans materialized blocks/files); values are identical — the
knob changes durability, never results.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

MODE_KEY = "s2spark.checkpoint.mode"
DIR_KEY = "s2spark.checkpoint.dir"


def barrier(df: DataFrame, eager: bool = True) -> DataFrame:
    """Truncate ``df``'s lineage per the session's durability knob."""
    spark = df.sparkSession
    mode = spark.conf.get(MODE_KEY, "local")
    if mode == "local":
        return df.localCheckpoint(eager=eager)
    if mode == "replicated":
        return df.localCheckpoint(
            eager=eager, storageLevel=StorageLevel.MEMORY_AND_DISK_2
        )
    if mode == "reliable":
        sc = spark.sparkContext
        if sc.getCheckpointDir() is None:
            ckpt_dir = spark.conf.get(DIR_KEY, None)
            if ckpt_dir is None:
                raise RuntimeError(
                    f"{MODE_KEY}=reliable needs a checkpoint dir: call "
                    f"SparkContext.setCheckpointDir or set {DIR_KEY}"
                )
            sc.setCheckpointDir(ckpt_dir)
        return df.checkpoint(eager=eager)
    raise ValueError(
        f"{MODE_KEY} must be local | replicated | reliable, got {mode!r}"
    )
