"""Format-parity: the same table read through parquet, ORC and JSON-lines
must produce identical rows — correctness independent of container format.
"""

from __future__ import annotations

import pytest

from self_healing_data_pipeline_agent_spark.sources.formats import (
    SUPPORTED_FORMATS,
    convert_table,
    read_table_as,
)
from self_healing_data_pipeline_agent_spark.sources.tables import load_table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("fmt", [f for f in SUPPORTED_FORMATS if f != "parquet"])
@pytest.mark.parametrize("table", ["events", "nation", "orders"])
def test_format_roundtrip_identical(spark, sf_dir, tmp_path, fmt, table):
    base = _rows(load_table(spark, sf_dir, table))
    path = convert_table(spark, sf_dir, table, fmt, tmp_path)
    back = read_table_as(spark, sf_dir, table, fmt, path)
    assert back.schema == load_table(spark, sf_dir, table).schema
    assert _rows(back) == base


def test_query_result_format_independent(spark, sf_dir, tmp_path):
    """An aggregation over the ORC copy equals the same aggregation over
    the parquet original — the engine's answers don't depend on the
    container."""
    from pyspark.sql import functions as F

    src = load_table(spark, sf_dir, "events")
    path = convert_table(spark, sf_dir, "events", "orc", tmp_path)
    orc = read_table_as(spark, sf_dir, "events", "orc", path)

    def agg(df):
        return sorted(
            tuple(r)
            for r in df.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.max("ts").alias("max_ts"))
            .collect()
        )

    assert agg(orc) == agg(src)


def test_unsupported_format_raises(spark, sf_dir, tmp_path):
    with pytest.raises(ValueError, match="unsupported"):
        convert_table(spark, sf_dir, "nation", "avro", tmp_path)
