"""Parquet table catalog for the analytic query surface.

The driver's testdata is a TPC-H-ish star schema plus ``events`` /
``documents`` / ``embeddings`` (one parquet per table).  Reads go through
``spark.read.parquet`` so Catalyst gets predicate pushdown, column pruning
and partition pruning for free — at 100 TB these scans are the dominant cost
and pruning is the first-order optimization.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast in any realistic deployment.
BROADCAST_TABLES = {"region", "nation", "supplier", "part", "customer"}


def load_table(spark: SparkSession, sf_dir: str | Path, name: str) -> DataFrame:
    return spark.read.parquet(str(Path(sf_dir) / f"{name}.parquet"))


def load_tables(
    spark: SparkSession, sf_dir: str | Path, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str | Path) -> None:
    """Register every table as a temp view for the SQL surface."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
