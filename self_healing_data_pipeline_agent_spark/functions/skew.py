"""Skew-mitigation helpers: salted two-level aggregation and salted
broadcast joins.

AQE's skew-join splitting handles sort-merge joins automatically, but two
shapes still need explicit salting at 100 TB:

- **aggregation on a hot key** (one user_id with 1% of all events): every
  row of the hot key lands in one reducer.  ``salted_agg`` spreads the key
  over N salts, aggregates partials per (key, salt), then merges the N
  partial rows per key — turning one straggler task into N parallel ones
  at the cost of an extra (tiny) shuffle over N·distinct(keys) rows.
- **broadcast-side explosion**: replicating the small side N times lets a
  skewed probe side stay salted through the join (``explode_salts``).

Only algebraic aggregates (sum/count/min/max — anything with a merge
function) can be salted this way; that is exactly the class Spark itself
can partial-aggregate, asserted here by accepting (partial, merge) expr
pairs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def with_salt(df: DataFrame, n_salts: int = DEFAULT_SALTS) -> DataFrame:
    """Add a uniform ``_salt`` column in [0, n_salts).  Derived from a
    per-row hash (not rand()) so retried tasks salt deterministically —
    a re-run can never double-count under task retries."""
    cols = [F.col(c) for c in df.columns]
    return df.withColumn(
        "_salt", F.pmod(F.hash(*cols), F.lit(n_salts))
    )


def explode_salts(small: DataFrame, n_salts: int = DEFAULT_SALTS) -> DataFrame:
    """Replicate the (broadcastable) small side once per salt so it can
    join a salted big side on (key, _salt)."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    return small.select("*", salts)


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: dict[str, Column],
    merge_aggs: dict[str, Column],
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Two-level skew-safe aggregation.

    ``partial_aggs``: output_name -> aggregate over raw rows (stage 1,
    grouped by keys + _salt).  ``merge_aggs``: output_name -> aggregate
    over stage-1 partial rows (stage 2, grouped by keys).  E.g. a mean is
    (sum, count) partials merged as sum(sum)/sum(count).
    """
    salted = with_salt(df, n_salts)
    stage1 = salted.groupBy(*keys, "_salt").agg(
        *[expr.alias(name) for name, expr in partial_aggs.items()]
    )
    return stage1.groupBy(*keys).agg(
        *[expr.alias(name) for name, expr in merge_aggs.items()]
    )
