"""Shared helpers for suite queries (determinism contract plumbing)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_ms(col: Column | str) -> Column:
    """Timestamp → epoch milliseconds (BIGINT), flooring like DuckDB's
    ``epoch_ms``. Cast through TIMESTAMP so NTZ-read parquet columns
    are interpreted in the (UTC) session zone."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_millis(c.cast("timestamp"))


def r4(col: Column) -> Column:
    """DOUBLE determinism contract: round to 4 places, using DuckDB's
    rule (half-away-from-zero on the scaled binary double). Spark's own
    ``F.round`` goes through BigDecimal of the double's shortest decimal
    repr and disagrees at ``.xxxx5`` boundaries (observed on f3_math at
    sf0.01: 86684.10495 → Spark 86684.105, DuckDB 86684.1049)."""
    return F.signum(col) * F.floor(F.abs(col) * 10000 + F.lit(0.5)) / 10000
