"""Record wire encodings (``api/src/data.rs:42-84``,
``api/src/v1/stream/json.rs``): the JSON representation with raw vs
base64 body/header encodings, as DataFrame transforms (to_json /
from_json + base64/unbase64 — all JVM-side).

The reference emits records as
``{"seq_num": n, "timestamp": t, "headers": [[name, value], ...],
"body": ...}`` where byte fields are UTF-8 raw or base64 per the
requested format.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

JSON_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("seq_num", T.LongType()),
        T.StructField("timestamp", T.LongType()),
        T.StructField(
            "headers",
            T.ArrayType(T.ArrayType(T.StringType())),
        ),
        T.StructField("body", T.StringType()),
    ]
)


def _b64_headers(headers: Column) -> Column:
    return F.transform(headers, lambda h: F.array(F.base64(h["name"]), F.base64(h["value"])))


def _utf8_checked(col: Column, what: str) -> Column:
    """Cast bytes → string, ERRORING on non-UTF-8 instead of silently
    substituting U+FFFD: the reference rejects non-UTF-8 payloads in
    raw mode (api/src/v1/stream/json.rs), and a lossy replacement would
    corrupt the roundtrip without any signal. Detection is re-encode ==
    original (replacement chars re-encode differently) — all JVM-side."""
    s = col.cast("string")
    return F.when(
        col.isNull() | (F.encode(s, "UTF-8") == col), s
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"raw JSON encoding requires UTF-8 {what}; got 0x"),
                F.hex(col),
            )
        ).cast("string")
    )


def _raw_headers(headers: Column) -> Column:
    return F.transform(
        headers,
        lambda h: F.array(
            _utf8_checked(h["name"], "header name"),
            _utf8_checked(h["value"], "header value"),
        ),
    )


def encode_json(records: DataFrame, base64_encoding: bool = True) -> DataFrame:
    """records → (basin, stream, seq_num, json) with body/headers in the
    requested encoding. base64 is lossless for arbitrary bytes; raw
    requires UTF-8 payloads and ERRORS on anything else, matching the
    reference's contract — never a silent lossy replacement."""
    enc_body = (
        F.base64("body")
        if base64_encoding
        else _utf8_checked(F.col("body"), "body")
    )
    enc_hdrs = _b64_headers(F.col("headers")) if base64_encoding else _raw_headers(F.col("headers"))
    payload = F.to_json(
        F.struct(
            F.col("seq_num"),
            F.col("timestamp"),
            enc_hdrs.alias("headers"),
            enc_body.alias("body"),
        )
    )
    return records.select("basin", "stream", "seq_num", payload.alias("json"))


def decode_json(df: DataFrame, base64_encoding: bool = True) -> DataFrame:
    """(basin, stream, json) → canonical record columns (roundtrip of
    :func:`encode_json`)."""
    parsed = F.from_json("json", JSON_RECORD_SCHEMA)
    if base64_encoding:
        hdrs = F.transform(
            parsed["headers"],
            lambda h: F.struct(
                F.unbase64(h[0]).alias("name"), F.unbase64(h[1]).alias("value")
            ),
        )
        body = F.unbase64(parsed["body"])
    else:
        hdrs = F.transform(
            parsed["headers"],
            lambda h: F.struct(
                h[0].cast("binary").alias("name"), h[1].cast("binary").alias("value")
            ),
        )
        body = parsed["body"].cast("binary")
    return df.select(
        "basin",
        "stream",
        parsed["seq_num"].alias("seq_num"),
        parsed["timestamp"].alias("timestamp"),
        hdrs.alias("headers"),
        body.alias("body"),
    )
