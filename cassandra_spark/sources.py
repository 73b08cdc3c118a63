"""Source seam: where table bytes come from (SURVEY.md §2.1 Src1/Src2).

Src1 (parquet) is the live path — `catalog.load_table` — standing in for
SSTable scans. Src2 is the sanctioned bulk path to a live cluster
(`BASELINE.json:7` [local]: "Bulk read/write via Cassandra connector"):
the open-source spark-cassandra-connector's DataSource V2 format
`org.apache.spark.sql.cassandra`. That jar cannot exist in this offline
container, so this module is a *design seam*: the real call, constructed
correctly, gated behind availability detection — swap in the packaged jar
(`--packages com.datastax.spark:spark-cassandra-connector_2.13:3.5.x`)
and the same function goes live, DSv2 predicate/projection pushdown and
token-range-aligned input partitions included.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CASSANDRA_FORMAT = "org.apache.spark.sql.cassandra"


def connector_available(spark: SparkSession) -> bool:
    """True iff the spark-cassandra-connector classes are reachable from
    the classloader Spark resolves data sources with. Utils.classForName
    consults the context/Spark classloader, so jars added via
    ``spark.jars`` / ``--packages`` count (py4j's root ``Class.forName``
    would only see the launch classpath and miss them)."""
    probe = "com.datastax.spark.connector.datasource.CassandraCatalog"
    try:
        spark._jvm.org.apache.spark.util.Utils.classForName(  # type: ignore[union-attr]
            probe, True, False
        )
        return True
    except Exception:
        pass
    try:
        spark._jvm.java.lang.Class.forName(probe)  # type: ignore[union-attr]
        return True
    except Exception:
        return False


def read_cassandra_table(
    spark: SparkSession, keyspace: str, table: str
) -> DataFrame:
    """Bulk-read a live Cassandra table (Src2). The connector maps token
    ranges to input partitions, so the scan is already co-partitioned the
    way the W-tier merges want; filters on partition/clustering keys push
    down to CQL server-side."""
    if not connector_available(spark):
        raise NotImplementedError(
            "spark-cassandra-connector not on the classpath (offline "
            "container); submit with --packages com.datastax.spark:"
            "spark-cassandra-connector_2.13:3.5.1 to enable"
        )
    return (
        spark.read.format(CASSANDRA_FORMAT)
        .options(keyspace=keyspace, table=table)
        .load()
    )


def write_cassandra_table(
    df: DataFrame, keyspace: str, table: str, mode: str = "append"
) -> None:
    """Bulk-write (Snk via Src2). Append is the only mode that maps to
    Cassandra semantics (every write is an upsert — W1); overwrite would
    imply a truncate the connector guards behind confirm.truncate."""
    if not connector_available(df.sparkSession):
        raise NotImplementedError(
            "spark-cassandra-connector not on the classpath (offline "
            "container); submit with --packages com.datastax.spark:"
            "spark-cassandra-connector_2.13:3.5.1 to enable"
        )
    (
        df.write.format(CASSANDRA_FORMAT)
        .options(keyspace=keyspace, table=table)
        .mode(mode)
        .save()
    )
