"""Table maintenance: small-file compaction and layout optimization.

The reference's sink rewrites one tiny table per run (truncate + load,
src/etl_job.py:75-80) so file layout never matters there.  At 100 TB,
append-mode ingestion (our incident log, any streaming sink) accretes
thousands of small files per partition and scan throughput collapses on
file-open overhead; periodic compaction is the standard fix (what Delta
``OPTIMIZE`` / Iceberg ``rewrite_data_files`` run as a Spark job anyway).

Implemented engine-level, format-agnostic: size-targeted repartition +
rewrite, with optional sort-within-partitions on a skipping key so parquet
row-group min/max stats stay selective (the poor man's Z-ORDER for a
single key).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024  # the usual HDFS/parquet sweet spot


def table_file_stats(spark: SparkSession, path: str) -> dict[str, int]:
    """(n_files, total_bytes) of a parquet table from the `_metadata`
    hidden column — distributed file listing, no driver-side walk."""
    row = (
        spark.read.parquet(path)
        .select(
            F.col("_metadata.file_path").alias("f"),
            F.col("_metadata.file_size").alias("sz"),
        )
        .groupBy("f")
        .agg(F.first("sz").alias("sz"))
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("sz").alias("total_bytes"),
        )
        .collect()[0]
    )
    return {"n_files": row["n_files"], "total_bytes": row["total_bytes"]}


def compact_parquet_table(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    order_by: str | None = None,
) -> dict[str, int]:
    """Rewrite ``src_path`` into ``dst_path`` with size-targeted files.

    File count = ceil(total_bytes / target) — computed from actual table
    bytes, not row counts, so compaction behaves identically whether the
    input is many tiny files or a few huge ones.  With ``order_by``, rows
    are range-partitioned then sorted within files on that key, so every
    output file owns a tight min/max range and predicate scans prune at
    the row-group level.

    Returns before/after file stats.  Writes to a NEW path: object-store
    reality is copy-then-swap (atomic pointer flip in the table format's
    commit log); rewriting in place while reading is not a thing.
    """
    before = table_file_stats(spark, src_path)
    n_out = max(1, math.ceil(before["total_bytes"] / target_file_bytes))
    df: DataFrame = spark.read.parquet(src_path)
    if order_by:
        df = df.repartitionByRange(n_out, F.col(order_by)).sortWithinPartitions(
            order_by
        )
    else:
        df = df.repartition(n_out)
    df.write.mode("overwrite").parquet(dst_path)
    after = table_file_stats(spark, dst_path)
    return {
        "files_before": before["n_files"],
        "files_after": after["n_files"],
        "bytes": before["total_bytes"],
    }
