"""Connector-seam integration against a compiled DSv2 test double
(tests/fake_connector/): the fake registers the connector's format name
``org.apache.spark.sql.cassandra`` and availability-marker class, so
sources.py's read/write orchestration executes end-to-end offline —
format resolution, keyspace/table options, append-mode batch write,
batch read — with NO change to the production seam code.

The double compiles at test time with the session's own Spark jars
(javac ships with the container's JDK); the scenario runs in a
subprocess SparkSession because the jar must be on the JVM classpath at
launch — the shared test session can't add it retroactively.
"""

from __future__ import annotations

import glob
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(REPO, "tests", "fake_connector", "src")
BUILD = "/tmp/cassandra_spark_fake_connector"
JAR = os.path.join(BUILD, "fake-cassandra-connector.jar")


def _build_jar() -> str:
    """Compile + jar the double, cached on the sources' mtime."""
    import pyspark

    srcs = sorted(glob.glob(os.path.join(SRC, "**", "*.java"), recursive=True))
    assert srcs, "fake connector sources missing"
    newest = max(os.path.getmtime(s) for s in srcs)
    if os.path.exists(JAR) and os.path.getmtime(JAR) >= newest:
        return JAR
    classes = os.path.join(BUILD, "classes")
    shutil.rmtree(classes, ignore_errors=True)
    os.makedirs(classes, exist_ok=True)
    jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    cp = ":".join(glob.glob(os.path.join(jars, "*.jar")))
    subprocess.run(
        ["javac", "-cp", cp, "-d", classes, *srcs],
        check=True, capture_output=True, text=True,
    )
    subprocess.run(
        ["jar", "cf", JAR, "."], cwd=classes,
        check=True, capture_output=True, text=True,
    )
    return JAR


_SCENARIO = r"""
import sys
sys.path.insert(0, @REPO@)
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.jars", @JAR@)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
from cassandra_spark import sources

assert sources.connector_available(spark), "marker class not visible"
df = spark.createDataFrame(
    [(1, "a", 2.5), (2, "b", 7.0)], "k bigint, name string, score double"
)
sources.write_cassandra_table(df, "prod", "events")
# append semantics: a second write adds rows (W1 upsert-shaped sink)
sources.write_cassandra_table(
    spark.createDataFrame([(3, "c", 0.5)], "k bigint, name string, score double"),
    "prod", "events",
)
back = sources.read_cassandra_table(spark, "prod", "events")
rows = sorted(tuple(r) for r in back.collect())
assert rows == [(1, "a", 2.5), (2, "b", 7.0), (3, "c", 0.5)], rows
assert dict(back.dtypes) == {"k": "bigint", "name": "string", "score": "double"}
# unknown table surfaces the provider's error, not a silent empty scan
try:
    sources.read_cassandra_table(spark, "prod", "nope")
    raise SystemExit("BUG: unknown table did not raise")
except Exception as e:
    assert "unknown table prod.nope" in str(e), str(e)[:200]
print("SCENARIO-OK")
spark.stop()
"""


@pytest.mark.skipif(
    shutil.which("javac") is None or shutil.which("jar") is None,
    reason="no JDK toolchain to build the connector double",
)
def test_sources_read_write_through_fake_connector():
    jar = _build_jar()
    code = _SCENARIO.replace("@REPO@", repr(REPO)).replace("@JAR@", repr(jar))
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "SCENARIO-OK" in r.stdout, r.stdout[-2000:]


def test_connector_gate_without_jar(spark):
    """The shared session has no connector jar: availability is False and
    both directions raise the documented NotImplementedError gate."""
    from cassandra_spark import sources

    assert not sources.connector_available(spark)
    with pytest.raises(NotImplementedError, match="connector"):
        sources.read_cassandra_table(spark, "ks", "t")
    with pytest.raises(NotImplementedError, match="connector"):
        sources.write_cassandra_table(
            spark.range(1).toDF("k"), "ks", "t"
        )
