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


def test_csv_roundtrip_preserves_empty_string_vs_null(spark, tmp_path):
    """ADVICE r5: Spark's CSV defaults fold '' -> NULL on read.  The pinned
    nullValue sentinel must keep them distinct through a write+read hop."""
    from pyspark.sql import Row

    from self_healing_data_pipeline_agent_spark.sources.formats import (
        _csv_reader,
        _csv_writer,
    )

    df = spark.createDataFrame(
        [
            Row(k=1, s="plain"),
            Row(k=2, s=""),
            Row(k=3, s=None),
            Row(k=4, s="has,comma and \"quotes\""),
        ]
    )
    path = str(tmp_path / "t.csv")
    _csv_writer(df).csv(path)
    back = _csv_reader(spark, df.schema).csv(path)
    got = {r.k: r.s for r in back.collect()}
    want = {r.k: r.s for r in df.collect()}
    assert got == want
