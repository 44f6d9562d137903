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
from pyspark.sql import functions as F

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


def events_ts_unit(sf_dir: str | Path) -> str:
    """Probe the events parquet FOOTER for the physical unit of ``ts``.

    Returns ``"us"`` (TIMESTAMP(MICROS), possibly NTZ) or ``"ns"``
    (TIMESTAMP(NANOS)).  The testdata has shipped BOTH variants across
    driver rounds — reading nanos as micros (or vice versa) compresses or
    stretches event time 1000x, which silently breaks every event-time
    operator far from the cause.  One metadata-only probe per load keeps
    batch (`load_table`) and streaming (`streaming/events.py`) readers on
    the same interpretation; an unrecognized variant fails loudly here
    rather than downstream.
    """
    import pyarrow.parquet as pq

    target = Path(sf_dir) / "events.parquet"
    fp = target if target.is_file() else sorted(target.glob("**/*.parquet"))[0]
    field = pq.ParquetFile(str(fp)).schema_arrow.field("ts")
    unit = getattr(field.type, "unit", None)
    if unit in ("us", "ns"):
        return unit
    raise ValueError(
        f"events.ts has unrecognized type {field.type!r} (expected a "
        "timestamp of unit us/ns) — testdata format changed; update "
        "events_ts_unit/load_table and re-verify event-time queries"
    )


def load_table(spark: SparkSession, sf_dir: str | Path, name: str) -> DataFrame:
    path = str(Path(sf_dir) / f"{name}.parquet")
    if name == "events":
        # Normalize every ts variant to the session TIMESTAMP type.  The
        # NTZ->timestamp cast is bit-identical ONLY under a UTC session
        # zone (session.py pins it); assert rather than silently shift.
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC", (
            "events.ts normalization requires spark.sql.session.timeZone=UTC "
            "(use session.get_spark)"
        )
        unit = events_ts_unit(sf_dir)
        if unit == "ns":
            # nanos -> read as long, truncate to micros (the same
            # narrowing DuckDB/Arrow apply).  The legacy flag is required
            # for Spark to surface INT64-nanos at all; it only affects
            # TIMESTAMP(NANOS) columns, which appear nowhere else in the
            # testdata, so leaving it set is benign.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(path).withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        else:
            df = spark.read.parquet(path).withColumn(
                "ts", F.col("ts").cast("timestamp")
            )
        return df.select("event_id", "ts", "user_id", "event_type", "value", "props")
    return spark.read.parquet(path)


def parquet_column_spans(
    sf_dir: str | Path, name: str, cols: list[str]
) -> dict[str, tuple[float, float]] | None:
    """(min, max) per column from parquet FOOTER statistics — a
    metadata-only read, no data scan.  This is the zone-map trick every
    warehouse uses: at 100 TB the footers of all files are kilobytes per
    file and readable in parallel, while an extra ``agg(min, max)`` pass
    is a second complete scan of the fact table.

    Returns None if any requested column lacks min/max stats (caller
    falls back to a scan) or has nulls only.
    """
    import pyarrow.parquet as pq

    target = Path(sf_dir) / f"{name}.parquet"
    files = [target] if target.is_file() else sorted(target.glob("**/*.parquet"))
    spans: dict[str, tuple[float, float]] = {}
    for fp in files:
        md = pq.ParquetFile(str(fp)).metadata
        idx = {
            md.row_group(0).column(i).path_in_schema: i
            for i in range(md.row_group(0).num_columns)
        }
        for col in cols:
            if col not in idx:
                return None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[col]).statistics
                if st is None or not st.has_min_max:
                    return None
                mn, mx = float(st.min), float(st.max)
                if col in spans:
                    spans[col] = (min(spans[col][0], mn), max(spans[col][1], mx))
                else:
                    spans[col] = (mn, mx)
    return spans if len(spans) == len(cols) else None


def load_tables(
    spark: SparkSession, sf_dir: str | Path, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str | Path) -> None:
    """Register every table as a temp view for the SQL surface."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
