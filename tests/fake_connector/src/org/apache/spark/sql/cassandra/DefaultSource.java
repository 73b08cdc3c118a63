package org.apache.spark.sql.cassandra;

import java.util.ArrayList;
import java.util.Arrays;
import java.util.HashMap;
import java.util.HashSet;
import java.util.Iterator;
import java.util.List;
import java.util.Map;
import java.util.Set;

import org.apache.spark.sql.catalyst.InternalRow;
import org.apache.spark.sql.connector.catalog.SupportsRead;
import org.apache.spark.sql.connector.catalog.SupportsWrite;
import org.apache.spark.sql.connector.catalog.Table;
import org.apache.spark.sql.connector.catalog.TableCapability;
import org.apache.spark.sql.connector.catalog.TableProvider;
import org.apache.spark.sql.connector.expressions.Transform;
import org.apache.spark.sql.connector.read.Batch;
import org.apache.spark.sql.connector.read.InputPartition;
import org.apache.spark.sql.connector.read.PartitionReader;
import org.apache.spark.sql.connector.read.PartitionReaderFactory;
import org.apache.spark.sql.connector.read.Scan;
import org.apache.spark.sql.connector.read.ScanBuilder;
import org.apache.spark.sql.connector.write.BatchWrite;
import org.apache.spark.sql.connector.write.DataWriter;
import org.apache.spark.sql.connector.write.DataWriterFactory;
import org.apache.spark.sql.connector.write.LogicalWriteInfo;
import org.apache.spark.sql.connector.write.PhysicalWriteInfo;
import org.apache.spark.sql.connector.write.Write;
import org.apache.spark.sql.connector.write.WriteBuilder;
import org.apache.spark.sql.connector.write.WriterCommitMessage;
import org.apache.spark.sql.types.StructType;
import org.apache.spark.sql.util.CaseInsensitiveStringMap;

/**
 * TEST DOUBLE for the DataStax spark-cassandra-connector's DataSource
 * V2 format {@code org.apache.spark.sql.cassandra}. Implements the same
 * contract surface cassandra_spark/sources.py drives — a TableProvider
 * keyed by the {@code keyspace}/{@code table} options, batch read and
 * append-mode batch write — over an in-JVM store, so the seam's code
 * paths execute offline. Rows travel inside serializable partitions /
 * commit messages, so it also works when writers run on executors;
 * the authoritative store lives on the driver (fine for a test double).
 */
public class DefaultSource implements TableProvider {

    // --- the in-JVM store ---------------------------------------------
    static final Map<String, List<InternalRow>> ROWS = new HashMap<>();
    static final Map<String, StructType> SCHEMAS = new HashMap<>();

    static String key(Map<String, String> options) {
        String ks = options.get("keyspace");
        String t = options.get("table");
        if (ks == null || t == null) {
            throw new IllegalArgumentException(
                "the cassandra format requires keyspace and table options");
        }
        return ks + "." + t;
    }

    @Override
    public StructType inferSchema(CaseInsensitiveStringMap options) {
        String k = key(options);
        synchronized (DefaultSource.class) {
            StructType s = SCHEMAS.get(k);
            if (s == null) {
                throw new IllegalArgumentException("unknown table " + k);
            }
            return s;
        }
    }

    @Override
    public Table getTable(StructType schema, Transform[] partitioning,
                          Map<String, String> properties) {
        return new FakeTable(key(properties), schema);
    }

    @Override
    public boolean supportsExternalMetadata() {
        return true;
    }

    // --- table ---------------------------------------------------------
    static class FakeTable implements Table, SupportsRead, SupportsWrite {
        final String k;
        final StructType schema;

        FakeTable(String k, StructType schema) {
            this.k = k;
            this.schema = schema;
        }

        @Override
        public String name() {
            return k;
        }

        @Override
        @SuppressWarnings("deprecation")
        public StructType schema() {
            return schema;
        }

        @Override
        public Set<TableCapability> capabilities() {
            return new HashSet<>(Arrays.asList(
                TableCapability.BATCH_READ, TableCapability.BATCH_WRITE));
        }

        @Override
        public ScanBuilder newScanBuilder(CaseInsensitiveStringMap opts) {
            final List<InternalRow> snapshot;
            synchronized (DefaultSource.class) {
                snapshot = new ArrayList<>(
                    ROWS.getOrDefault(k, new ArrayList<>()));
            }
            final StructType s = schema;
            return new ScanBuilder() {
                @Override
                public Scan build() {
                    return new FakeScan(s, snapshot);
                }
            };
        }

        @Override
        public WriteBuilder newWriteBuilder(LogicalWriteInfo info) {
            final String kk = k;
            final StructType s = info.schema();
            return new WriteBuilder() {
                @Override
                public Write build() {
                    return new Write() {
                        @Override
                        public BatchWrite toBatch() {
                            return new FakeBatchWrite(kk, s);
                        }
                    };
                }
            };
        }
    }

    // --- read path ------------------------------------------------------
    static class RowsPartition implements InputPartition {
        final List<InternalRow> rows;

        RowsPartition(List<InternalRow> rows) {
            this.rows = rows;
        }
    }

    static class FakeScan implements Scan, Batch {
        final StructType schema;
        final List<InternalRow> rows;

        FakeScan(StructType schema, List<InternalRow> rows) {
            this.schema = schema;
            this.rows = rows;
        }

        @Override
        public StructType readSchema() {
            return schema;
        }

        @Override
        public Batch toBatch() {
            return this;
        }

        @Override
        public InputPartition[] planInputPartitions() {
            return new InputPartition[] {new RowsPartition(rows)};
        }

        @Override
        public PartitionReaderFactory createReaderFactory() {
            return new FakeReaderFactory();
        }
    }

    // a STATIC factory: anonymous classes would capture the enclosing
    // (non-serializable) scan and fail task serialization
    static class FakeReaderFactory implements PartitionReaderFactory {
        @Override
        public PartitionReader<InternalRow> createReader(InputPartition p) {
            final Iterator<InternalRow> it =
                ((RowsPartition) p).rows.iterator();
            return new PartitionReader<InternalRow>() {
                InternalRow cur;

                @Override
                public boolean next() {
                    if (it.hasNext()) {
                        cur = it.next();
                        return true;
                    }
                    return false;
                }

                @Override
                public InternalRow get() {
                    return cur;
                }

                @Override
                public void close() {}
            };
        }
    }

    // --- write path -------------------------------------------------------
    static class RowsMessage implements WriterCommitMessage {
        final List<InternalRow> rows;

        RowsMessage(List<InternalRow> rows) {
            this.rows = rows;
        }
    }

    // STATIC stateless factory, same serialization reason as the reader
    static class FakeWriterFactory implements DataWriterFactory {
        @Override
        public DataWriter<InternalRow> createWriter(
                int partitionId, long taskId) {
            final List<InternalRow> buf = new ArrayList<>();
            return new DataWriter<InternalRow>() {
                @Override
                public void write(InternalRow row) {
                    buf.add(row.copy());
                }

                @Override
                public WriterCommitMessage commit() {
                    return new RowsMessage(buf);
                }

                @Override
                public void abort() {}

                @Override
                public void close() {}
            };
        }
    }

    static class FakeBatchWrite implements BatchWrite {
        final String k;
        final StructType schema;

        FakeBatchWrite(String k, StructType schema) {
            this.k = k;
            this.schema = schema;
        }

        @Override
        public DataWriterFactory createBatchWriterFactory(
                PhysicalWriteInfo info) {
            return new FakeWriterFactory();
        }

        @Override
        public void commit(WriterCommitMessage[] messages) {
            synchronized (DefaultSource.class) {
                List<InternalRow> all =
                    ROWS.computeIfAbsent(k, x -> new ArrayList<>());
                for (WriterCommitMessage m : messages) {
                    all.addAll(((RowsMessage) m).rows);
                }
                SCHEMAS.put(k, schema);
            }
        }

        @Override
        public void abort(WriterCommitMessage[] messages) {}
    }
}
