"""Source seam: connector detection and the gated error path (SURVEY.md
§2.1 Src2 — jar absent in this container by design)."""

from __future__ import annotations

import pytest

from cassandra_spark.catalog import Catalog
from cassandra_spark.sources import (
    connector_available,
    read_cassandra_table,
    write_cassandra_table,
)
from tests.conftest import SF_SMOKE


def test_connector_absent_detected(spark):
    assert connector_available(spark) is False


def test_read_seam_raises_with_instructions(spark):
    with pytest.raises(NotImplementedError, match="--packages"):
        read_cassandra_table(spark, "ks", "t")


def test_write_seam_raises_with_instructions(spark):
    df = Catalog(spark, SF_SMOKE).nation
    with pytest.raises(NotImplementedError, match="--packages"):
        write_cassandra_table(df, "ks", "t")
