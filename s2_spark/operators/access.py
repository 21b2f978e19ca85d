"""Access-token scopes (A24 — ``common/src/access.rs:163-245``) modeled
the way SURVEY.md §1.1 prescribes: a token is a set of resource
matchers (exact / prefix, for basins and streams) × an operation group
set, evaluated either as a driver-side check (API admission) or as a
Column predicate (filtering listings/scans to what the token can see).

Not an auth system — the analytic-engine rendering of the reference's
scope algebra.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

# op groups (access.rs op enum collapsed to the r/w groups)
READ_OPS = {"read", "check_tail", "list_streams", "list_basins"}
WRITE_OPS = {"append", "trim", "fence", "create_stream", "delete_stream"}


@dataclass(frozen=True)
class ResourceMatcher:
    """exact name or prefix match (access.rs resource sets)."""

    pattern: str
    prefix: bool = False

    def matches(self, name: str) -> bool:
        return name.startswith(self.pattern) if self.prefix else name == self.pattern

    def column(self, col: Column) -> Column:
        return col.startswith(self.pattern) if self.prefix else col == self.pattern


@dataclass(frozen=True)
class AccessToken:
    """id ≤96 bytes; basin/stream matchers × op groups with expiry."""

    token_id: str
    basins: tuple[ResourceMatcher, ...] = (ResourceMatcher("", prefix=True),)
    streams: tuple[ResourceMatcher, ...] = (ResourceMatcher("", prefix=True),)
    can_read: bool = True
    can_write: bool = False
    expires_at_ms: int | None = None

    def __post_init__(self):
        if len(self.token_id.encode()) > 96:
            raise ValueError("token id > 96 bytes")

    def allows(self, op: str, basin: str, stream: str | None = None, now_ms: int = 0) -> bool:
        if self.expires_at_ms is not None and now_ms >= self.expires_at_ms:
            return False
        if op in READ_OPS and not self.can_read:
            return False
        if op in WRITE_OPS and not self.can_write:
            return False
        if op not in READ_OPS | WRITE_OPS:
            return False
        if not any(m.matches(basin) for m in self.basins):
            return False
        if stream is not None and not any(m.matches(stream) for m in self.streams):
            return False
        return True

    def scope_filter(
        self, basin_col: str = "basin", stream_col: str = "stream"
    ) -> Column:
        """Predicate limiting a records/streams DataFrame to the token's
        visible scope — pushed down like any other filter."""
        b = F.lit(False)
        for m in self.basins:
            b = b | m.column(F.col(basin_col))
        s = F.lit(False)
        for m in self.streams:
            s = s | m.column(F.col(stream_col))
        return b & s
