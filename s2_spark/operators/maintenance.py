"""Background maintenance jobs — the ``lite/src/backend/bgtasks/``
analogues, as scheduled Spark batch jobs:

- :func:`retention_sweep` — age-based TTL deletes (A17,
  ``stream_trim.rs`` TTL path; reference default 7 days).
- :func:`delete_on_empty_sweep` — fully-trimmed streams older than
  min_age get a terminal trim + deletion (A18, ``stream_doe.rs:50-143``).
- :func:`basin_deletion_sweep` — deleting a basin deletes its streams
  then the basin (A20, ``basin_deletion.rs:23-150``).

Each sweep is decoupled from the data plane exactly like the
reference's 60s-tick tasks: reads the catalog + tails, mutates
metadata, and delegates physical deletes to the store's compaction.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from s2_spark.catalog import Catalog
from s2_spark.model import trim_record
from s2_spark.store import StreamStore


def retention_sweep(store: StreamStore, now_ms: int | None = None) -> int:
    """Advance trim points past expired records for every stream with a
    finite retention age; returns number of streams trimmed. Physical
    deletion happens at the next compaction."""
    now_ms = now_ms or store._clock()
    trimmed = 0
    expiry = store.records_df().groupBy("basin", "stream").agg(
        F.max("seq_num").alias("max_seq")
    )
    bounds = {(r["basin"], r["stream"]): r["max_seq"] for r in expiry.collect()}
    for (basin, stream), _max_seq in bounds.items():
        try:
            cfg = store.catalog.resolve_config(basin, stream)
        except Exception:
            continue
        age = cfg.retention_age_secs or 0
        if age <= 0:
            continue
        cutoff_ts = now_ms - age * 1000
        first_live = (
            store.records_df()
            .filter(
                (F.col("basin") == basin)
                & (F.col("stream") == stream)
                & (F.col("timestamp") >= cutoff_ts)
            )
            .agg(F.min("seq_num").alias("s"))
            .first()["s"]
        )
        st = store._st(basin, stream)
        target = first_live if first_live is not None else st.tail_seq
        if target > st.trim_point:
            st.trim_point = target
            trimmed += 1
    return trimmed


def delete_on_empty_sweep(store: StreamStore, now_ms: int | None = None) -> list[str]:
    """Streams configured with delete_on_empty whose live range is empty
    and whose age exceeds min_age get deleted (terminal trim + catalog
    delete) — stream_doe.rs eligibility (streamer.rs:448-511)."""
    now_ms = now_ms or store._clock()
    deleted = []
    # one distributed pass: visible envelope-record count per stream
    # ("empty" = every data record is at/below the trim point; command
    # records riding the log don't keep a stream alive)
    from s2_spark.model import is_command_col

    trims = store.spark.createDataFrame(
        [(b, s, st.trim_point) for (b, s), st in store._state.items()] or [("", "", 0)],
        "basin string, stream string, trim_point long",
    )
    live = (
        store.records_df()
        .join(F.broadcast(trims), ["basin", "stream"], "left")
        .filter(
            (F.col("seq_num") >= F.coalesce("trim_point", F.lit(0)))
            & ~is_command_col()
        )
        .groupBy("basin", "stream")
        .agg(F.count("*").alias("n"))
    )
    live_counts = {(r["basin"], r["stream"]): r["n"] for r in live.collect()}
    for (basin, stream), meta in list(store.catalog.streams.items()):
        if meta.deleted_at is not None:
            continue
        cfg = store.catalog.resolve_config(basin, stream)
        min_age = cfg.delete_on_empty_min_age_secs or 0
        if min_age <= 0:
            continue
        st = store._st(basin, stream)
        fully_trimmed = st.tail_seq > 0 and live_counts.get((basin, stream), 0) == 0
        old_enough = now_ms - meta.created_at >= min_age * 1000
        if fully_trimmed and old_enough:
            # terminal trim (u64::MAX clamps to tail) then delete
            store.append(basin, stream, [trim_record((1 << 64) - 1)])
            store.catalog.delete_stream(basin, stream)
            deleted.append(f"{basin}/{stream}")
    return deleted


def deletion_purge_sweep(store: StreamStore) -> list[str]:
    """Complete pending deletions: physically drop trimmed/expired data
    (compaction rewrite), then purge deleted basin/stream metadata so
    the names become creatable again — the final step of the
    reference's async deletion tasks. Until this runs, create on a
    deleted name raises DeletionPending."""
    if store._has_data():
        store.apply_trim_and_retention()
    return store.catalog.purge_deleted()


def basin_deletion_sweep(store: StreamStore) -> list[str]:
    """Finish async basin deletions: delete every live stream of a
    deleted basin (resumable-cursor semantics in the reference; one
    pass here)."""
    finished = []
    for name, meta in store.catalog.basins.items():
        if meta.deleted_at is None:
            continue
        for (basin, stream), smeta in list(store.catalog.streams.items()):
            if basin == name and smeta.deleted_at is None:
                smeta.deleted_at = store._clock()
                st = store._st(basin, stream)
                st.trim_point = st.tail_seq
                finished.append(f"{basin}/{stream}")
    return finished
