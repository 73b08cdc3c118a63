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


# --- f7: timeuuid function family ------------------------------------------
#
# CQL's v1-UUID time functions (`[C* cql3/functions/TimeFcts — now,
# minTimeuuid, maxTimeuuid, toTimestamp(timeuuid), unverified]`). The
# engine models timeuuid as its canonical 36-char string (§1.2) and
# implements the functions with the real v1 bit layout: a 60-bit count of
# 100 ns intervals since the Gregorian epoch (1582-10-15), split
# time_low(32) / time_mid(16) / time_hi(12)|version(4). minTimeuuid pins
# clock-seq/node to fixed bytes, exactly like the reference's min/max
# sentinel uuids. Range predicates on timeuuids decompose to timestamp
# range predicates (SURVEY §1.2).

GREGORIAN_OFFSET_100NS = 122_192_928_000_000_000


def min_timeuuid(ts_col: F.Column) -> F.Column:
    """Deterministic v1 timeuuid (min clock-seq/node sentinel) from a
    timestamp column — CQL minTimeuuid(ts) / the value side of now()."""
    t = F.unix_micros(ts_col) * 10 + F.lit(GREGORIAN_OFFSET_100NS)
    hx = lambda c, n: F.lpad(F.lower(F.hex(c)), n, "0")  # noqa: E731
    time_low = hx(t.bitwiseAND(F.lit(0xFFFFFFFF)), 8)
    time_mid = hx(F.shiftright(t, 32).bitwiseAND(F.lit(0xFFFF)), 4)
    time_hi = hx(
        F.shiftright(t, 48).bitwiseAND(F.lit(0x0FFF)).bitwiseOR(F.lit(0x1000)), 4
    )
    return F.concat_ws(
        "-", time_low, time_mid, time_hi, F.lit("8000"), F.lit("000000000000")
    )


def timeuuid_timestamp(uuid_col: F.Column) -> F.Column:
    """CQL toTimestamp(timeuuid): parse the v1 bit layout back out of the
    canonical string — a REAL extraction (hex-parse via conv), not a
    stashed copy of the source timestamp."""
    field = lambda a, b: F.conv(F.substring(uuid_col, a, b), 16, 10).cast(  # noqa: E731
        "bigint"
    )
    t = (
        field(1, 8)  # time_low
        + F.shiftleft(field(10, 4), 32)  # time_mid
        + F.shiftleft(field(15, 4).bitwiseAND(F.lit(0x0FFF)), 48)  # time_hi sans version
    )
    return F.timestamp_micros(
        ((t - F.lit(GREGORIAN_OFFSET_100NS)) / 10).cast("bigint")
    )


def _duck_min_timeuuid(ts_expr: str) -> str:
    t = f"(epoch_us({ts_expr}) * 10 + {GREGORIAN_OFFSET_100NS})"
    return (
        f"concat(lower(lpad(to_hex({t} & 4294967295), 8, '0')), '-', "
        f"lower(lpad(to_hex(({t} >> 32) & 65535), 4, '0')), '-', "
        f"lower(lpad(to_hex((({t} >> 48) & 4095) | 4096), 4, '0')), "
        f"'-8000-000000000000')"
    )


@query(
    "f7_timeuuid",
    oracle=f"""
    SELECT event_id,
           {_duck_min_timeuuid('ts')} AS tu,
           ts AS ts_back
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      AND ts <= TIMESTAMP '2024-01-12 00:00:00'
    """,
)
def f7_timeuuid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """timeuuid family end-to-end: construct minTimeuuid(ts) with the real
    v1 bit layout, then recover the timestamp by PARSING the uuid string
    back (toTimestamp) — the oracle pins tu to an independent DuckDB
    construction and ts_back to identity, so a bit-layout error on either
    side is a hash mismatch. The WHERE is the min/maxTimeuuid range
    predicate decomposed to its timestamp range (SURVEY §1.2)."""
    cat = Catalog(spark, sf_dir)
    tu = min_timeuuid(F.col("ts"))
    return (
        cat.events
        .filter(
            (F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp"))
            & (F.col("ts") <= F.lit("2024-01-12 00:00:00").cast("timestamp"))
        )
        .select(
            "event_id",
            tu.alias("tu"),
            timeuuid_timestamp(tu).alias("ts_back"),
        )
    )
