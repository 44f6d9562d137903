"""Plan-inspection helpers: assert that the physical plan has the shape we
designed for (pushdown reached the scan, dims broadcast, no stray shuffles).

Used by tests so plan regressions fail CI rather than shipping as silent
100×-at-scale slowdowns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if a parquet scan in the plan pushed down a filter containing
    ``fragment``."""
    plan = formatted_plan(df)
    return "PushedFilters" in plan and fragment in plan


def count_exchanges(df: DataFrame) -> int:
    """Number of SEMANTIC shuffle exchanges in the physical plan.
    Excluded as the cheap/deliberate kind: broadcasts, and ``spread()``'s
    round-robin rebalance — a data-independent fan-out that exists only
    because the one-file test parquet starts every scan at 1 partition;
    it also renders multiple times once a cached relation embeds it, so
    counting it would measure plan printing, not data movement.

    The exclusion is SCOPED to spread()'s signature (r11/r12 ADVICE):
    a round-robin exchange is skipped only when BOTH hold on its line —
    the partition count equals ``defaultParallelism`` (the count
    spread() always asks for) AND the shuffle-origin tag is
    ``REPARTITION_BY_NUM`` (what ``repartition(n)`` emits; Spark 4.1
    renders ``Exchange RoundRobinPartitioning(N), REPARTITION_BY_NUM``).
    Anchoring on the origin tag instead of a trailing comma means an
    explain-format drift, or a same-count exchange from a DIFFERENT
    origin (e.g. an AQE rebalance), still counts.  Residual blind spot:
    an unintended ``repartition(defaultParallelism)`` is excluded too.
    Counted in simple mode where each semantic node renders exactly
    once."""
    simple = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "simple"
    )
    _dp = df.sparkSession.sparkContext.defaultParallelism
    spread_sig = f"roundrobinpartitioning({_dp})"

    def _is_spread(line: str) -> bool:
        low = line.lower()
        return spread_sig in low and "repartition_by_num" in low

    return sum(
        1
        for line in simple.splitlines()
        if "Exchange" in line
        and "BroadcastExchange" not in line
        and not _is_spread(line)
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)
