"""Scalar-function tier F1-F5: datetime, writetime/TTL, JSON, collections,
strings.

The reference's native scalar surface is tiny (`[C* cql3/functions/TimeFcts,
BytesConversionFcts, CastFcts]`, unverified — SURVEY.md §2.8); Spark's
built-in function library is the superset. Everything here is JVM-side
whole-stage-codegen — no Python UDFs in any of these paths.

Cell metadata (writetime/TTL) follows the §1.2 modeling decision: shadow
columns synthesized from the events fixture (ts → __writetime, constant
TTL), making WRITETIME()/TTL() plain projections.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_spark.catalog import Catalog
from cassandra_spark.registry import query

# 30-day TTL used by the fixture synthesis (seconds, as in CQL `USING TTL`).
FIXTURE_TTL_S = 30 * 24 * 3600


def with_cell_metadata(events: DataFrame, ttl_s: int = FIXTURE_TTL_S) -> DataFrame:
    """Synthesize Cassandra cell metadata over the events table
    (FIXTURES.md "W-tier synthesis"): __writetime_value = µs epoch of ts,
    __ttl_value = constant TTL. Sources that really carry per-cell metadata
    (e.g. a Cassandra connector) would produce these columns natively."""
    return events.withColumns(
        {
            "__writetime_value": F.unix_micros(F.col("ts")),
            "__ttl_value": F.lit(ttl_s).cast("int"),
        }
    )


@query(
    "f1_datetime",
    oracle="""
    SELECT event_id,
           CAST(ts AS DATE) AS event_date,
           CAST(year(ts) AS INTEGER) AS y,
           CAST(month(ts) AS INTEGER) AS m,
           CAST(day(ts) AS INTEGER) AS d,
           CAST(hour(ts) AS INTEGER) AS h,
           date_trunc('day', ts) AS day_start,
           epoch_us(ts) // 1000000 AS unix_s,
           CAST(ts AS DATE) + 7 AS plus_week
    FROM events WHERE user_id = 3
    """,
)
def f1_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CQL toDate/toTimestamp/toUnixTimestamp + 4.0 date arithmetic
    (`[C* cql3/functions/TimeFcts, OperationFcts]`) via native temporal fns."""
    cat = Catalog(spark, sf_dir)
    return cat.events.filter(F.col("user_id") == 3).select(
        "event_id",
        F.to_date("ts").alias("event_date"),
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.date_trunc("day", F.col("ts")).alias("day_start"),
        F.unix_timestamp("ts").alias("unix_s"),
        F.date_add(F.to_date("ts"), 7).alias("plus_week"),
    )


@query(
    "f2_writetime_ttl",
    oracle=f"""
    SELECT event_id, user_id,
           epoch_us(ts) AS writetime_value,
           CAST({FIXTURE_TTL_S} AS INTEGER) AS ttl_value,
           epoch_us(ts) + CAST({FIXTURE_TTL_S} AS BIGINT) * 1000000
             AS live_until_us
    FROM events WHERE user_id < 5
    """,
)
def f2_writetime_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WRITETIME(col) / TTL(col) as projections over the §1.2 shadow columns
    — the query-visible face of LWW cell metadata
    (`[C* db/rows/Cell, db/LivenessInfo]`)."""
    cat = Catalog(spark, sf_dir)
    cells = with_cell_metadata(cat.events)
    return cells.filter(F.col("user_id") < 5).select(
        "event_id",
        "user_id",
        F.col("__writetime_value").alias("writetime_value"),
        F.col("__ttl_value").alias("ttl_value"),
        (
            F.col("__writetime_value")
            + F.col("__ttl_value").cast("bigint") * F.lit(1000000)
        ).alias("live_until_us"),
    )


@query(
    "f3_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
           json_extract_string(props, '$.missing') AS missing_val
    FROM events WHERE user_id = 7
    """,
)
def f3_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CQL fromJson/SELECT JSON (`[C* cql3/Json.java]`) via get_json_object;
    missing-path extraction must be NULL (not error) on both engines."""
    cat = Catalog(spark, sf_dir)
    return cat.events.filter(F.col("user_id") == 7).select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
        F.get_json_object("props", "$.missing").alias("missing_val"),
    )


@query(
    "f6_select_json",
    oracle="""
    SELECT event_id,
           '{"event_id":' || event_id || ',"event_type":"' || event_type
             || '","user_id":' || user_id || '}' AS row_json
    FROM events WHERE user_id = 7
    """,
)
def f6_select_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT JSON (`[C* cql3/Json.java]` row→JSON direction): serialize
    each row to a JSON string via to_json(struct(...)). The oracle builds
    the identical compact string by concatenation — integer/string columns
    only, so formatting is engine-independent."""
    cat = Catalog(spark, sf_dir)
    return cat.events.filter(F.col("user_id") == 7).select(
        "event_id",
        F.to_json(F.struct("event_id", "event_type", "user_id")).alias(
            "row_json"
        ),
    )


@query(
    "r10_static_column",
    oracle="""
    SELECT user_id, event_id, event_type,
           first_value(event_type) OVER (
             PARTITION BY user_id ORDER BY ts DESC, event_id ASC
           ) AS latest_type_static
    FROM events WHERE user_id IN (3, 7)
    """,
)
def r10_static_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static column read (`[C* schema/ColumnMetadata#isStatic]`): one
    per-partition value visible on every row. Modeled as first_value over
    the partition window in clustering order (-ts, event_id) — here 'the
    partition's newest event_type' plays the static cell."""
    cat = Catalog(spark, sf_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").asc()
    )
    return cat.events.filter(F.col("user_id").isin(3, 7)).select(
        "user_id",
        "event_id",
        "event_type",
        F.first("event_type").over(w).alias("latest_type_static"),
    )


@query(
    "f4_collections",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words,
           string_split(text, ' ')[1] AS first_word,
           string_split(text, ' ')[3] AS third_word,
           array_to_string(string_split(text, ' ')[1:3], '_') AS head3,
           list_contains(string_split(text, ' '), 'merge') AS has_merge
    FROM documents WHERE doc_id < 100
    """,
)
def f4_collections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection ops: element access, slices, size, membership — CQL's
    list/set surface (`[C* cql3/Lists, Sets, Maps]`) over tokenized text."""
    cat = Catalog(spark, sf_dir)
    words = F.split(F.col("text"), " ")
    return cat.documents.filter(F.col("doc_id") < 100).select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.element_at(words, 1).alias("first_word"),
        F.element_at(words, 3).alias("third_word"),
        F.concat_ws("_", F.slice(words, 1, 3)).alias("head3"),
        F.array_contains(words, "merge").alias("has_merge"),
    )


@query(
    "f5_strings",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           substr(c_name, 1, 8) AS name_prefix,
           CAST(length(c_name) AS INTEGER) AS name_len,
           concat(c_mktsegment, ':', c_name) AS seg_name,
           regexp_extract(c_name, '([0-9]+)', 1) AS name_digits,
           replace(c_mktsegment, 'E', '*') AS seg_mangled
    FROM customer WHERE c_custkey < 80
    """,
)
def f5_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String extension tier (upstream has only SASI LIKE): the standard
    portable string kernel."""
    cat = Catalog(spark, sf_dir)
    return cat.customer.filter(F.col("c_custkey") < 80).select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.concat_ws("", F.col("c_mktsegment"), F.lit(":"), F.col("c_name")).alias(
            "seg_name"
        ),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
        F.regexp_replace("c_mktsegment", "E", "*").alias("seg_mangled"),
    )
