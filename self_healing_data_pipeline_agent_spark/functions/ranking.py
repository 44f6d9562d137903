"""Distributed global ranking: assign every row its rank within a group
WITHOUT sorting the whole group in one task.

``row_number() OVER (PARTITION BY g ORDER BY x)`` funnels each group into a
single task — with 3 groups and 600 M rows that is 3 sort tasks no matter
how many executors exist.  The classic fix (and what this module provides):

1. range-repartition rows by (g, x) into P partitions — the only shuffle;
2. rank locally inside each (g, partition) slice — P parallel sorts;
3. count rows per (g, partition), prefix-sum those counts per group — a
   tiny P×groups table, broadcast back;
4. global rank = partition offset + local rank.

Ties that straddle a partition boundary get an arbitrary order *between
equal values* — rank->value lookups (percentiles, top-k thresholds) are
unaffected because equal values are interchangeable at equal ranks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_RANK_PARTITIONS = 32


def with_global_rank(
    df: DataFrame,
    group: str,
    order_col: str,
    partitions: int = DEFAULT_RANK_PARTITIONS,
    rank_col: str = "rn",
    group_size_col: str | None = None,
) -> DataFrame:
    """Returns ``df.select(group, order_col)`` + a 0-based ``rank_col``:
    the row's global rank within its group ordered by ``order_col``.

    ``group_size_col``: optionally also attach the group's total row
    count — it falls out of the offset computation for free (total sum
    over the slice counts), saving callers a separate groupBy job.
    """
    sliced = (
        df.select(group, order_col)
        .repartitionByRange(partitions, F.col(group), F.col(order_col))
        .withColumn("_pid", F.spark_partition_id())
    )
    w_local = Window.partitionBy(group, "_pid").orderBy(order_col)
    local = sliced.withColumn("_local_rn", F.row_number().over(w_local))
    # per-slice counts -> per-group prefix sums = slice offsets (tiny)
    counts = sliced.groupBy(group, "_pid").agg(F.count(F.lit(1)).alias("_n"))
    w_prefix = (
        Window.partitionBy(group)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_total = Window.partitionBy(group)
    offset_cols = [
        F.col(group), F.col("_pid"),
        F.coalesce(F.sum("_n").over(w_prefix), F.lit(0)).alias("_offset"),
    ]
    if group_size_col:
        offset_cols.append(F.sum("_n").over(w_total).alias(group_size_col))
    offsets = counts.select(*offset_cols)
    return (
        local.join(F.broadcast(offsets), [group, "_pid"])
        .withColumn(rank_col, F.col("_offset") + F.col("_local_rn") - F.lit(1))
        .drop("_pid", "_local_rn", "_offset")
    )
