"""Multi-format table interchange: the same tables, any Spark-native
format.

The reference ingests CSV only (``src/etl_pipeline.py:37-50``); a warehouse
at scale also speaks parquet, ORC and JSON-lines, and correctness must not
depend on the container format.  ``convert_table`` rewrites a catalog table
into another format; ``read_table_as`` loads it back with the ORIGINAL
schema enforced, so lossy containers (JSON has no int32/date physical
types) round-trip bit-identically instead of silently re-inferring.

Format notes (scale view):
- **parquet** — the default: columnar, footer zone maps (the engine's
  statistics source, see ``tables.parquet_column_spans``), predicate
  pushdown.
- **orc** — columnar peer with built-in bloom-filter support; Spark-native,
  zero extra dependencies.  The right choice when the warehouse is
  Hive/ORC-standardized.
- **json** (lines) — row-oriented interchange; 5-10x the scan cost of the
  columnar formats and no pushdown, so it is an EDGE format (landing /
  export), never the warehouse layout.  Schema must be supplied on read —
  inference is a full extra pass at 100 TB and can widen types.
- **csv** — the reference's native ingest format (src/etl_pipeline.py:37-50)
  and the least self-describing: no types at all, so schema-enforced read
  is mandatory.  Doubles survive because Spark writes the shortest
  round-trippable decimal repr; timestamps get the same pinned ISO format
  as JSON.  NULL and the empty string are distinguished by pinning
  ``nullValue`` to a sentinel (``\\N``) on BOTH write and read — Spark's
  default maps every empty field back to null, which silently drifts
  empty-string cells on any table that has them.  Known residual
  limitation: embedded newlines inside string cells need ``multiLine``
  reads (not enabled here — it forbids input splitting, wrong at scale);
  the CSV hop is lossless for newline-free cells only.  Landing/export
  only.
"""

from __future__ import annotations

import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from .tables import load_table

SUPPORTED_FORMATS = ("parquet", "orc", "json", "csv")

ORACLES: dict[str, str] = {}

_JSON_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

# CSV null sentinel: lets NULL round-trip distinctly from '' (ADVICE r5).
_CSV_NULL = "\\N"


def _csv_writer(df: DataFrame):
    # NULL -> the \N sentinel; empty string keeps Spark's default quoted ""
    # representation, so the two stay distinct on read (the default READER
    # would fold both to null).  Residual caveat: a string cell whose exact
    # text equals the sentinel reads back as NULL — pick the sentinel away
    # from the data domain (the reference's CSVs never contain \N).
    return (
        df.write.mode("overwrite")
        .option("header", "true")
        .option("timestampFormat", _JSON_TS_FMT)
        .option("nullValue", _CSV_NULL)
    )


def _csv_reader(spark: SparkSession, schema):
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("timestampFormat", _JSON_TS_FMT)
        .option("nullValue", _CSV_NULL)
    )


def convert_table(
    spark: SparkSession,
    sf_dir: str | Path,
    name: str,
    fmt: str,
    dest: str | Path,
) -> str:
    """Rewrite catalog table ``name`` into ``fmt`` under ``dest``;
    returns the written path."""
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; use {SUPPORTED_FORMATS}")
    out = str(Path(dest) / f"{name}.{fmt}")
    df = load_table(spark, sf_dir, name)
    if fmt == "json":
        # JSON has no native timestamp type: serialize deterministically
        # (ISO-8601, UTC session zone) so the read side can cast back.
        df.write.mode("overwrite").option(
            "timestampFormat", _JSON_TS_FMT
        ).json(out)
    elif fmt == "csv":
        _csv_writer(df).csv(out)
    else:
        getattr(df.write.mode("overwrite"), fmt)(out)
    return out


def read_table_as(
    spark: SparkSession,
    sf_dir: str | Path,
    name: str,
    fmt: str,
    path: str | Path,
) -> DataFrame:
    """Read a converted table back with the canonical schema enforced
    (taken from the original catalog table, not re-inferred)."""
    schema = load_table(spark, sf_dir, name).schema
    reader = spark.read.schema(schema)
    if fmt == "json":
        return reader.option("timestampFormat", _JSON_TS_FMT).json(str(path))
    if fmt == "csv":
        return _csv_reader(spark, schema).csv(str(path))
    return getattr(reader, fmt)(str(path))


def q_format_interchange(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip the supplier dimension parquet -> ORC -> JSON-lines ->
    CSV and return the final frame; the oracle reads the ORIGINAL
    parquet, so a hash match proves ALL THREE container hops are
    bit-lossless (columnar peer, row-oriented edge format, AND the
    reference's typeless native CSV) under schema-enforced reads — the
    format-fidelity claim as a driver-checked record instead of
    pytest-only.  The reference ingests CSV into a single warehouse
    format (src/etl_pipeline.py:37-50); a 100 TB deployment must move
    tables across formats without value drift.

    Scale shape: three narrow write+scan passes over a broadcast-sized
    dimension, no shuffle; the same plan applies to any catalog table.
    """
    tmp = tempfile.mkdtemp(prefix="fmt_interchange_")
    schema = load_table(spark, sf_dir, "supplier").schema
    orc_path = convert_table(spark, sf_dir, "supplier", "orc", tmp)
    orc_df = read_table_as(spark, sf_dir, "supplier", "orc", orc_path)
    json_path = str(Path(tmp) / "supplier_from_orc.json")
    orc_df.write.mode("overwrite").option(
        "timestampFormat", _JSON_TS_FMT
    ).json(json_path)
    json_df = (
        spark.read.schema(schema)
        .option("timestampFormat", _JSON_TS_FMT)
        .json(json_path)
    )
    csv_path = str(Path(tmp) / "supplier_from_json.csv")
    _csv_writer(json_df).csv(csv_path)
    return _csv_reader(spark, schema).csv(csv_path)


ORACLES["format_interchange"] = "SELECT * FROM supplier"
