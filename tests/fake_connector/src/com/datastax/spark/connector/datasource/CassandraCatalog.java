package com.datastax.spark.connector.datasource;

/**
 * TEST DOUBLE — NOT the DataStax spark-cassandra-connector.
 *
 * cassandra_spark/sources.py detects connector availability by probing
 * for this class name on the JVM classpath. This empty marker makes
 * {@code connector_available()} return true in offline CI so the seam's
 * read/write orchestration executes end-to-end against the in-memory
 * fake in {@code org.apache.spark.sql.cassandra.DefaultSource}.
 */
public final class CassandraCatalog {
    private CassandraCatalog() {}
}
