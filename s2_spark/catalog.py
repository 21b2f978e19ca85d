"""Catalog — basins/streams metadata with three-layer config resolution
(stream → basin default → system default), mirroring the reference's
``Maybe<>``-merge semantics (``common/src/config.rs:150-165``) as
``coalesce`` over config fields.

Metadata is tiny (like the reference's KV meta tables) and lives
driver-side; ``*_df()`` materializes DataFrame views for relational use
(listing joins, reconciliation jobs). At 100 TB the data plane scales
with executors; the catalog stays a small control-plane table exactly
as in the reference.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, replace
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from s2_spark.model import AlreadyExists, BasinNotFound, S2Error, StreamNotFound

# name validation (common/src/basin.rs:23-79, common/src/stream.rs:28-47)
_BASIN_RE = re.compile(r"^[a-z0-9]([a-z0-9-]{6,46})[a-z0-9]$")

DEFAULT_RETENTION_AGE_SECS = 7 * 24 * 3600  # common/src/config.rs:79-84


@dataclass(frozen=True)
class StreamConfig:
    """Per-stream config (common/src/config.rs:108-114). ``None`` means
    "unset — inherit from the next layer"."""

    storage_class: Optional[str] = None  # standard | express
    retention_age_secs: Optional[int] = None  # None=inherit; 0=infinite
    timestamping_mode: Optional[str] = None  # client-prefer|client-require|arrival
    timestamping_uncapped: Optional[bool] = None
    delete_on_empty_min_age_secs: Optional[int] = None

    def merge_over(self, base: "StreamConfig") -> "StreamConfig":
        """coalesce(self, base) per field — the Maybe<> merge."""
        return StreamConfig(
            *(
                getattr(self, f) if getattr(self, f) is not None else getattr(base, f)
                for f in (
                    "storage_class",
                    "retention_age_secs",
                    "timestamping_mode",
                    "timestamping_uncapped",
                    "delete_on_empty_min_age_secs",
                )
            )
        )


SYSTEM_DEFAULT = StreamConfig(
    storage_class="standard",
    retention_age_secs=DEFAULT_RETENTION_AGE_SECS,
    timestamping_mode="client-prefer",
    timestamping_uncapped=False,
    delete_on_empty_min_age_secs=0,
)


@dataclass(frozen=True)
class BasinConfig:
    """Basin config + stream defaults (common/src/config.rs:1-25)."""

    default_stream_config: StreamConfig = StreamConfig()
    create_stream_on_append: bool = False
    create_stream_on_read: bool = False


@dataclass
class BasinMeta:
    name: str
    config: BasinConfig
    created_at: int  # ms
    deleted_at: Optional[int] = None


@dataclass
class StreamMeta:
    basin: str
    name: str
    config: StreamConfig
    created_at: int
    deleted_at: Optional[int] = None


def validate_basin_name(name: str) -> None:
    if not (8 <= len(name) <= 48) or not _BASIN_RE.match(name):
        raise S2Error(f"invalid basin name {name!r}")


def validate_stream_name(name: str) -> None:
    if not (1 <= len(name.encode()) <= 512) or name in (".", ".."):
        raise S2Error(f"invalid stream name {name!r}")


class Catalog:
    def __init__(self, spark: SparkSession, clock=None):
        import time

        self.spark = spark
        self._clock = clock or (lambda: int(time.time() * 1000))
        self.basins: dict[str, BasinMeta] = {}
        self.streams: dict[tuple[str, str], StreamMeta] = {}

    # --- basins (A20) --------------------------------------------------

    def create_basin(self, name: str, config: BasinConfig | None = None) -> BasinMeta:
        validate_basin_name(name)
        if name in self.basins and self.basins[name].deleted_at is None:
            raise AlreadyExists(name)
        meta = BasinMeta(name, config or BasinConfig(), self._clock())
        self.basins[name] = meta
        return meta

    def get_basin(self, name: str) -> BasinMeta:
        meta = self.basins.get(name)
        if meta is None or meta.deleted_at is not None:
            raise BasinNotFound(name)
        return meta

    def delete_basin(self, name: str) -> None:
        self.get_basin(name).deleted_at = self._clock()

    def reconfigure_basin(self, name: str, config: BasinConfig) -> BasinMeta:
        meta = self.get_basin(name)
        meta.config = config
        return meta

    # --- streams (A22/A23) ----------------------------------------------

    def create_stream(
        self, basin: str, name: str, config: StreamConfig | None = None
    ) -> StreamMeta:
        validate_stream_name(name)
        self.get_basin(basin)
        key = (basin, name)
        if key in self.streams and self.streams[key].deleted_at is None:
            raise AlreadyExists(f"{basin}/{name}")
        meta = StreamMeta(basin, name, config or StreamConfig(), self._clock())
        self.streams[key] = meta
        return meta

    def get_stream(self, basin: str, name: str) -> StreamMeta:
        meta = self.streams.get((basin, name))
        if meta is None or meta.deleted_at is not None:
            raise StreamNotFound(f"{basin}/{name}")
        return meta

    def delete_stream(self, basin: str, name: str) -> None:
        self.get_stream(basin, name).deleted_at = self._clock()

    def reconfigure_stream(self, basin: str, name: str, config: StreamConfig) -> StreamMeta:
        meta = self.get_stream(basin, name)
        meta.config = config
        return meta

    def resolve_config(self, basin: str, name: str) -> StreamConfig:
        """stream → basin default → system default (config.rs:150-165)."""
        stream_cfg = self.get_stream(basin, name).config
        basin_cfg = self.get_basin(basin).config.default_stream_config
        return stream_cfg.merge_over(basin_cfg.merge_over(SYSTEM_DEFAULT))

    def ensure_stream_for(self, basin: str, name: str, op: str) -> StreamMeta:
        """Auto-create on append/read when the basin allows it
        (lite/src/backend/core.rs:326-405)."""
        try:
            return self.get_stream(basin, name)
        except StreamNotFound:
            bc = self.get_basin(basin).config
            allowed = (op == "append" and bc.create_stream_on_append) or (
                op == "read" and bc.create_stream_on_read
            )
            if not allowed:
                raise
            return self.create_stream(basin, name)

    # --- listing (A21): prefix + start_after + limit ---------------------

    def list_streams(
        self, basin: str, prefix: str = "", start_after: str = "", limit: int = 1000
    ) -> tuple[list[str], bool]:
        limit = min(limit, 1000)
        names = sorted(
            n
            for (b, n), m in self.streams.items()
            if b == basin and m.deleted_at is None and n.startswith(prefix) and n > start_after
        )
        return names[:limit], len(names) > limit

    def list_basins(
        self, prefix: str = "", start_after: str = "", limit: int = 1000
    ) -> tuple[list[str], bool]:
        limit = min(limit, 1000)
        names = sorted(
            n
            for n, m in self.basins.items()
            if m.deleted_at is None and n.startswith(prefix) and n > start_after
        )
        return names[:limit], len(names) > limit

    # --- DataFrame views -------------------------------------------------

    def streams_df(self) -> DataFrame:
        rows = [
            (m.basin, m.name, m.created_at, m.deleted_at)
            for m in self.streams.values()
        ]
        return self.spark.createDataFrame(
            rows or [(None, None, None, None)],
            "basin string, stream string, created_at long, deleted_at long",
        ).filter("basin is not null")

    def basins_df(self) -> DataFrame:
        rows = [(m.name, m.created_at, m.deleted_at) for m in self.basins.values()]
        return self.spark.createDataFrame(
            rows or [(None, None, None)],
            "basin string, created_at long, deleted_at long",
        ).filter("basin is not null")
