"""Scalar function families (SURVEY.md §2.B Q-F*) — string/date/math/
array/map/json/binary/hash. These back S2's name validation + prefix
listing (A21), interval bucketing (A26), raw/base64 record encodings
(``api/src/data.rs:42-84``) and the stream-id / bench chain hashes
(``lite/src/stream_id.rs``, ``cli/src/bench.rs``).

All expressions are built-in ``pyspark.sql.functions`` — JVM-side,
inside whole-stage codegen; no Python UDFs in this family.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from s2_spark.registry import query
from s2_spark.suite._util import epoch_ms, r4
from s2_spark.tables import t


@query(
    "f1_string",
    oracle=(
        "SELECT c_name, upper(c_mktsegment) AS seg, substr(c_name, 1, 8) AS p8, "
        "CAST(length(c_name) AS BIGINT) AS ln FROM customer "
        "WHERE c_name LIKE 'Customer%' ORDER BY c_custkey"
    ),
    doc="string fns + prefix LIKE (name validation / listing, A21)",
)
def f1(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_name").startswith("Customer"))
        .orderBy("c_custkey")
        .select(
            "c_name",
            F.upper("c_mktsegment").alias("seg"),
            F.substring("c_name", 1, 8).alias("p8"),
            F.length("c_name").cast("long").alias("ln"),
        )
    )


@query(
    "f2_datetime",
    oracle=(
        "SELECT event_id, epoch_ms(date_trunc('day', ts)) AS day_ms, "
        "CAST(extract(hour FROM ts) AS BIGINT) AS hr FROM events ORDER BY event_id"
    ),
    doc="date_trunc / extract — metrics interval buckets (A26)",
)
def f2(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")
    return (
        e.select(
            "event_id",
            epoch_ms(F.date_trunc("day", ts)).alias("day_ms"),
            F.hour(ts).cast("long").alias("hr"),
        )
        .orderBy("event_id")
    )


@query(
    "f3_math",
    oracle=(
        "SELECT l_orderkey, l_linenumber, "
        "round(l_extendedprice * (1-l_discount) * (1+l_tax), 4) AS chg, "
        "CAST(floor(l_quantity) AS BIGINT) AS fq, "
        "abs(l_discount - 0.05) < 1e-9 AS d5 "
        # ORDER BY every output column: the fixtures hold duplicate
        # (l_orderkey, l_linenumber) pairs, so a two-key order is not
        # total and a LIMIT cutting a tie group could select different
        # row multisets per engine (judge co-execution, r13)
        "FROM lineitem ORDER BY 1, 2, 3, 4, 5 LIMIT 500"
    ),
    doc="arithmetic / round / floor / abs",
)
def f3(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    chg = F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            r4(chg).alias("chg"),
            F.floor("l_quantity").cast("long").alias("fq"),
            (F.abs(F.col("l_discount") - 0.05) < 1e-9).alias("d5"),
        )
        .orderBy("l_orderkey", "l_linenumber", "chg", "fq", "d5")
        .limit(500)
    )


@query(
    "f4_array",
    oracle=(
        "SELECT event_id, CAST(length(string_split(props, ' ')) AS BIGINT) AS nparts "
        "FROM events ORDER BY event_id LIMIT 500"
    ),
    doc="array ops — header-list model shape (§1.2)",
)
def f4(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    return (
        e.orderBy("event_id")
        .select(
            "event_id",
            F.size(F.split("props", " ")).cast("long").alias("nparts"),
        )
        .limit(500)
    )


@query(
    "f5_map_struct",
    oracle=(
        "SELECT event_id, "
        "map_from_entries(list_value(struct_pack(k:='type', v:=event_type)))['type'][1] AS tp "
        "FROM events ORDER BY event_id LIMIT 100"
    ),
    doc="map/struct construction + key extraction",
)
def f5(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    m = F.map_from_entries(
        F.array(F.struct(F.lit("type").alias("k"), F.col("event_type").alias("v")))
    )
    return (
        e.orderBy("event_id")
        .select("event_id", F.element_at(m, "type").alias("tp"))
        .limit(100)
    )


@query(
    "f6_json",
    oracle=(
        "SELECT event_id, json_extract_string(props_json, '$.k') AS jk FROM "
        "(SELECT event_id, '{\"k\":\"' || event_type || '\"}' AS props_json FROM events) "
        "ORDER BY event_id LIMIT 100"
    ),
    doc="JSON extract — API JSON record encoding (A1/A7, api/src/v1/stream/json.rs)",
)
def f6(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    props_json = F.concat(F.lit('{"k":"'), F.col("event_type"), F.lit('"}'))
    return (
        e.orderBy("event_id")
        .select("event_id", F.get_json_object(props_json, "$.k").alias("jk"))
        .limit(100)
    )


@query(
    "f7_base64",
    oracle=(
        "SELECT event_id, to_base64(encode(event_type)) AS b64 FROM events "
        "ORDER BY event_id LIMIT 100"
    ),
    doc="raw/base64 body encodings (api/src/data.rs:42-84); unbase64 roundtrip asserted in tests",
)
def f7(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    return (
        e.orderBy("event_id")
        .select("event_id", F.base64(F.col("event_type").cast("binary")).alias("b64"))
        .limit(100)
    )


@query(
    "f8_hash",
    oracle=(
        "SELECT event_id, md5(event_type) AS h FROM events ORDER BY event_id LIMIT 100"
    ),
    doc="hashing — stream_id (BLAKE3 in reference, lite/src/stream_id.rs:21-34) / bench chain hash; sha2 + xxhash64 engine-side",
)
def f8(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    return (
        e.orderBy("event_id")
        .select("event_id", F.md5(F.col("event_type").cast("binary")).alias("h"))
        .limit(100)
    )
