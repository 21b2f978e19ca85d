"""DuckDB-oracle comparison harness, mirroring the driver's check:
row count + column names + order-insensitive value comparison."""

from __future__ import annotations

import math
import os

import duckdb

from s2_spark.tables import TABLE_NAMES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # cells are pre-rounded to 4 places by the determinism contract;
        # normalize away representation noise far below that
        return round(v, 6)
    return v


def _normalize(df_pandas):
    cols = sorted(df_pandas.columns)
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in df_pandas[cols].itertuples(index=False, name=None)
    ]
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return cols, rows


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    got = spark_df.toPandas()
    want = con.execute(sql).fetchdf()
    gcols, grows = _normalize(got)
    wcols, wrows = _normalize(want)
    assert gcols == wcols, f"column mismatch: spark={gcols} duckdb={wcols}"
    assert len(grows) == len(wrows), f"row count: spark={len(grows)} duckdb={len(wrows)}"
    for i, (g, w) in enumerate(zip(grows, wrows)):
        assert g == w, f"row {i} differs:\n  spark={g}\n  duck ={w}"
