"""Relational operator surface over the star schema (SURVEY.md §2.B
X1-X7, X14-X16, plus the §2.A aggregate/dashboard parity queries and the
TPC-H Q1 flagship).

Every query is a declarative DataFrame plan — Catalyst handles pushdown,
pruning and join planning; dimension joins broadcast explicitly where the
dimension is bounded (region/nation), and via AQE otherwise.  All
oracle-checked numeric aggregates use the exact-decimal ``stable`` helpers
so results are bit-reproducible at any partitioning (see
``functions/stable.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.oracle_sql import sql_davg, sql_dstd, sql_dsum
from ..functions.ranking import DEFAULT_RANK_PARTITIONS, with_global_rank
from ..functions.stable import SCALE as UNIT_SCALE
from ..functions.stable import _units as to_units
from ..functions.stable import davg, dstd, dsum
from ..sources.tables import load_table, parquet_column_spans, parquet_row_count

ORACLES: dict[str, str] = {}


# --- §2.A parity: global aggregates -----------------------------------------

def q_row_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: global row count (reference src/data_quality_checks.py:28)."""
    return load_table(spark, sf_dir, "lineitem").agg(
        F.count(F.lit(1)).alias("row_count")
    )


ORACLES["row_count"] = "SELECT COUNT(*) AS row_count FROM lineitem"


def q_null_fractions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: per-column null fractions in ONE pass (reference loops per
    column, src/data_quality_checks.py:41-49)."""
    df = load_table(spark, sf_dir, "events")
    return df.agg(
        F.count(F.lit(1)).alias("row_count"),
        F.avg(F.col("value").isNull().cast("int")).alias("nf_value"),
        F.avg(F.col("props").isNull().cast("int")).alias("nf_props"),
        F.avg(F.col("event_type").isNull().cast("int")).alias("nf_event_type"),
    )


ORACLES["null_fractions"] = """
SELECT COUNT(*) AS row_count,
       AVG(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS nf_value,
       AVG(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS nf_props,
       AVG(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS nf_event_type
FROM events
"""


def q_stats_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/A4 + D1: global mean/std profile of lineitem measures, one agg
    job (reference profiles one pandas pass per column,
    src/drift_detector.py:16-26)."""
    df = load_table(spark, sf_dir, "lineitem")
    aggs = []
    for c, tag in (("l_quantity", "qty"), ("l_extendedprice", "price"),
                   ("l_discount", "disc")):
        aggs.append(davg(F.col(c)).alias(f"mean_{tag}"))
        aggs.append(dstd(F.col(c)).alias(f"std_{tag}"))
    return df.agg(*aggs)


ORACLES["stats_profile"] = f"""
SELECT {sql_davg('l_quantity')} AS mean_qty,
       {sql_dstd('l_quantity')} AS std_qty,
       {sql_davg('l_extendedprice')} AS mean_price,
       {sql_dstd('l_extendedprice')} AS std_price,
       {sql_davg('l_discount')} AS mean_disc,
       {sql_dstd('l_discount')} AS std_disc
FROM lineitem
"""


# --- Flagship: TPC-H Q1 pricing summary -------------------------------------

def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: scan-heavy grouped aggregation with filter pushdown; the
    canonical 100 TB stress test of map-side partial aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


ORACLES["tpch_q1"] = f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity')} AS sum_qty,
       {sql_dsum('l_extendedprice')} AS sum_base_price,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {sql_davg('l_quantity')} AS avg_qty,
       {sql_davg('l_extendedprice')} AS avg_price,
       {sql_davg('l_discount')} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# --- X1/X2: grouped DQ + drift profiles -------------------------------------

def q_grouped_dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1: the reference's global DQ stats (A1/A2) scaled out per group —
    one shuffle on the group key, partials map-side."""
    df = load_table(spark, sf_dir, "events")
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.avg(F.col("value").isNull().cast("int")).alias("nf_value"),
        F.avg(F.col("props").isNull().cast("int")).alias("nf_props"),
    )


ORACLES["grouped_dq_profile"] = """
SELECT event_type,
       COUNT(*) AS n_events,
       AVG(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS nf_value,
       AVG(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS nf_props
FROM events GROUP BY event_type
"""


def q_grouped_drift_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2: per-partition mean/std drift profile (scale-out of D1)."""
    df = load_table(spark, sf_dir, "lineitem")
    return df.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        davg(F.col("l_quantity")).alias("mean_qty"),
        dstd(F.col("l_quantity")).alias("std_qty"),
        davg(F.col("l_extendedprice")).alias("mean_price"),
        dstd(F.col("l_extendedprice")).alias("std_price"),
    )


ORACLES["grouped_drift_profile"] = f"""
SELECT l_returnflag,
       COUNT(*) AS n_rows,
       {sql_davg('l_quantity')} AS mean_qty,
       {sql_dstd('l_quantity')} AS std_qty,
       {sql_davg('l_extendedprice')} AS mean_price,
       {sql_dstd('l_extendedprice')} AS std_price
FROM lineitem GROUP BY l_returnflag
"""


# --- X3: quantile profile ----------------------------------------------------

# Above this fact-table size the exact-percentile strategy switches from
# Spark's `percentile` aggregate (which buffers a value->count map PER
# GROUP on the merging executor — fastest below the threshold, measured
# 1.47 s vs 1.66 s at sf0.1, but memory-unbounded in rows-per-group) to
# the stacked-rank dataflow (one window shuffle, partition-scalable, no
# per-group buffer).  Footer metadata decides, so the switch is free.
EXACT_PERCENTILE_AGG_MAX_ROWS = 50_000_000


def q_quantile_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3: exact percentiles per group (linear interpolation — matches
    PERCENTILE_CONT).  Rounded to 4dp on both sides to absorb
    interpolation-arithmetic ulps.

    Two physical strategies, chosen by fact-table size (metadata-only
    probe): below EXACT_PERCENTILE_AGG_MAX_ROWS the one-agg `percentile`
    aggregate; above it the stacked-rank dataflow whose memory is bounded
    per partition, not per group.  Both are engine-exact against
    PERCENTILE_CONT and return identical values (pinned by test).
    """
    if parquet_row_count(sf_dir, "lineitem") <= EXACT_PERCENTILE_AGG_MAX_ROWS:
        return _quantile_profile_agg(spark, sf_dir)
    return _quantile_profile_rank(spark, sf_dir)


def _quantile_profile_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-agg exact percentiles via Spark's `percentile` aggregate; the
    two price percentiles share one buffer through the array form.  The
    per-group value buffer makes this the SMALL/MEDIUM path only."""
    df = load_table(spark, sf_dir, "lineitem")
    agg = df.groupBy("l_returnflag").agg(
        F.expr("percentile(CAST(l_quantity AS DOUBLE), 0.5D)").alias("q50"),
        F.expr(
            "percentile(CAST(l_extendedprice AS DOUBLE), array(0.25D, 0.75D))"
        ).alias("pp"),
    )
    return agg.select(
        "l_returnflag",
        F.round("q50", 4).alias("p50_qty"),
        F.round(F.col("pp")[0], 4).alias("p25_price"),
        F.round(F.col("pp")[1], 4).alias("p75_price"),
    )


def _quantile_profile_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stacked-rank exact percentiles — the at-scale path.

    Both measure columns are STACKED into long format and ranked in ONE
    ``with_global_rank`` dataflow: one window shuffle, one offsets
    broadcast — instead of one full rank dataflow per column (it measures
    ~2x faster here, and at 100 TB it is one shuffle of the fact table,
    not two).  Each measure gets its own normalized uniform bucket from
    the per-measure min/max, so bucket balance is independent of the
    measures' value ranges.

    The spans come from parquet FOOTER statistics (zone maps) — a
    metadata-only read, so deriving buckets costs ZERO data passes; only
    if the files carry no stats does it fall back to one min/max agg.
    """
    df = load_table(spark, sf_dir, "lineitem")
    measures = ["l_quantity", "l_extendedprice"]
    long = df.select(
        "l_returnflag",
        F.expr(
            "stack(2, 0, CAST(l_quantity AS DOUBLE),"
            " 1, CAST(l_extendedprice AS DOUBLE)) AS (k, v)"
        ),
    )
    col_spans = parquet_column_spans(sf_dir, "lineitem", measures)
    if col_spans is not None:
        spans = {k: col_spans[m] for k, m in enumerate(measures)}
    else:  # statless files: one tiny min/max agg job
        spans = {
            r["k"]: (r["mn"], r["mx"])
            for r in long.groupBy("k").agg(
                F.min("v").alias("mn"), F.max("v").alias("mx")
            ).collect()
        }
    nbkt = DEFAULT_RANK_PARTITIONS
    bucket = F.lit(0)
    for k, (mn, mx) in spans.items():
        if mn is None or mx == mn:
            continue
        b = F.least(
            F.lit(nbkt - 1),
            F.floor((F.col("v") - F.lit(mn)) * F.lit(float(nbkt)) / F.lit(mx - mn)),
        ).cast("int")
        bucket = F.when(F.col("k") == k, b).otherwise(bucket)
    ranked = with_global_rank(
        long, ["l_returnflag", "k"], "v", group_size_col="n", bucket=bucket
    )
    specs = {"p50_qty": (0, 0.5), "p25_price": (1, 0.25), "p75_price": (1, 0.75)}
    aggs = []
    for name, (k, p) in specs.items():
        h = (F.col("n") - 1) * F.lit(p)
        lo, frac = F.floor(h), h - F.floor(h)
        contrib = (
            F.when(
                (F.col("k") == k) & (F.col("rn") == lo),
                F.col("v") * (F.lit(1.0) - frac),
            ).when((F.col("k") == k) & (F.col("rn") == lo + 1), F.col("v") * frac)
        )
        aggs.append(F.round(F.sum(contrib), 4).alias(name))
    return ranked.groupBy("l_returnflag").agg(*aggs)


ORACLES["quantile_profile"] = """
SELECT l_returnflag,
       ROUND(PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY l_quantity), 4) AS p50_qty,
       ROUND(PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p25_price,
       ROUND(PERCENTILE_CONT(0.75) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p75_price
FROM lineitem GROUP BY l_returnflag
"""


# --- X4: cardinality profile -------------------------------------------------

def q_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: exact distinct counts per group (cardinality drift).  The 100 TB
    variant is approx_count_distinct (HLL, no exact-distinct shuffle
    explosion) — exact here for the oracle."""
    df = load_table(spark, sf_dir, "lineitem")
    return df.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("nd_partkey"),
        F.countDistinct("l_suppkey").alias("nd_suppkey"),
        F.count(F.lit(1)).alias("n_rows"),
    )


ORACLES["distinct_counts"] = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS nd_partkey,
       COUNT(DISTINCT l_suppkey) AS nd_suppkey,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
"""


# --- X5: multi-way FK enrichment join ---------------------------------------

def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5: lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region revenue rollup.

    Scale shape: the fact table is reduced FIRST — a per-order partial
    aggregate (map-side combine on l_orderkey) shrinks lineitem ~4x before
    any join, turns COUNT(DISTINCT o_orderkey) into a plain COUNT(*) of
    order-level rows, and halves the shuffled bytes.  region/nation are
    bounded dimensions -> explicit broadcast; orders/customer co-shuffle
    on their keys with AQE free to broadcast the pruned sides at runtime.
    Unit sums are exact integers, so the two-level sum is bit-identical
    to the oracle's single-level sum regardless of partitioning.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(to_units(revenue)).alias("rev_units"),
        F.count(F.lit(1)).alias("n_items"),
    )
    return (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            (F.sum("rev_units").cast("double") / F.lit(UNIT_SCALE)).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("n_items").alias("n_lineitems"),
        )
    )


ORACLES["revenue_by_nation"] = f"""
SELECT r_name, n_name,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
       COUNT(DISTINCT o_orderkey) AS n_orders,
       COUNT(*) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


# --- X6: semi/anti joins (referential-integrity DQ) -------------------------

def q_anti_join_no_f_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 anti: customers with no 'F'-status orders, counted per segment —
    orphan detection as a DQ primitive."""
    customer = load_table(spark, sf_dir, "customer")
    f_orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    return (
        customer.join(
            f_orders, customer.c_custkey == f_orders.o_custkey, "left_anti"
        )
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


ORACLES["anti_join_no_f_orders"] = """
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
)
GROUP BY c_mktsegment
"""


def q_semi_join_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 semi: customers having at least one open ('O') order."""
    customer = load_table(spark, sf_dir, "customer")
    o_orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "O"
    )
    return (
        customer.join(
            o_orders, customer.c_custkey == o_orders.o_custkey, "left_semi"
        )
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


ORACLES["semi_join_open_orders"] = """
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O'
)
GROUP BY c_mktsegment
"""


# --- X7: exact dedup (deterministic keeper) ---------------------------------

def q_dedup_first_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7: exact dedup with a deterministic keeper — row_number over
    (partition by key order by tiebreak) = 1, the oracle-stable form of
    dropDuplicates.  One shuffle on the dedup key; at 100 TB this is the
    canonical hash-partition dedup."""
    df = load_table(spark, sf_dir, "lineitem")
    # Tiebreak must be a total order over the OUTPUT columns: l_linenumber
    # alone has duplicates in the data, which would make the keeper
    # nondeterministic across engines.  min_by on the tiebreak struct ==
    # row_number()=1 over the same order, but as a HASH aggregate: map-side
    # partials shrink each partition to its distinct keys before the
    # shuffle, and no per-group sort ever happens — strictly less work
    # than the window form at any scale.
    keeper = F.min_by(
        F.struct("l_partkey", "l_quantity"),
        F.struct("l_linenumber", "l_partkey", "l_quantity"),
    ).alias("k")
    return (
        df.groupBy("l_orderkey").agg(keeper)
        .select("l_orderkey", "k.l_partkey", "k.l_quantity")
    )


ORACLES["dedup_first_lineitem"] = """
SELECT l_orderkey, l_partkey, l_quantity
FROM (
  SELECT l_orderkey, l_partkey, l_quantity,
         ROW_NUMBER() OVER (PARTITION BY l_orderkey
                            ORDER BY l_linenumber, l_partkey, l_quantity) AS rn
  FROM lineitem
) WHERE rn = 1
"""


# --- X14: window functions / top-k per group --------------------------------

def q_topk_orders_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X14: top-3 orders by totalprice per priority with a deterministic
    tiebreak (orderkey) so ranking is engine-stable."""
    df = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_orderpriority", F.col("rn").cast("bigint").alias("rn"),
            "o_orderkey", "o_totalprice",
        )
    )


ORACLES["topk_orders_per_priority"] = """
SELECT o_orderpriority, rn, o_orderkey, o_totalprice
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn <= 3
"""


def q_order_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X14: lag/lead frame — per customer's order history: previous and
    next order totals and the delta, tiebroken by orderkey."""
    df = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        df.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.lag("o_totalprice").over(w).alias("prev_total"),
            F.lead("o_totalprice").over(w).alias("next_total"),
        )
        .filter(F.col("prev_total").isNotNull())
        .withColumn("delta_vs_prev", F.col("o_totalprice") - F.col("prev_total"))
    )


ORACLES["order_lag_lead"] = """
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         LAG(o_totalprice) OVER w AS prev_total,
         LEAD(o_totalprice) OVER w AS next_total,
         o_totalprice - LAG(o_totalprice) OVER w AS delta_vs_prev
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
) WHERE prev_total IS NOT NULL
"""


# --- X15: set operations -----------------------------------------------------

def q_setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X15: custkeys that placed 'F' orders but never 'O' orders
    (EXCEPT = distinct set difference)."""
    orders = load_table(spark, sf_dir, "orders")
    f_keys = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o_keys = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f_keys.distinct().exceptAll(o_keys.distinct())


ORACLES["setop_except"] = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
"""


def q_setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X15: custkeys with both 'F' and 'P' orders (INTERSECT)."""
    orders = load_table(spark, sf_dir, "orders")
    f_keys = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    p_keys = orders.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return f_keys.intersect(p_keys)


ORACLES["setop_intersect"] = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
"""


# --- X16: rollup / multi-granularity summary --------------------------------

def q_rollup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X16: multi-granularity DQ summary via ROLLUP — per (flag, status),
    per flag, and grand total in one pass."""
    df = load_table(spark, sf_dir, "lineitem")
    return df.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum(F.col("l_quantity")).alias("sum_qty"),
    )


ORACLES["rollup_summary"] = f"""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_rows,
       {sql_dsum('l_quantity')} AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q_cube_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X16: CUBE variant — all 2^2 grouping sets in one pass (adds the
    per-status marginal that ROLLUP omits).  Same single-shuffle shape:
    Spark expands grouping sets map-side, so the pass count does not grow
    with the number of sets."""
    df = load_table(spark, sf_dir, "lineitem")
    return df.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum(F.col("l_extendedprice")).alias("sum_price"),
    )


ORACLES["cube_summary"] = f"""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_rows,
       {sql_dsum('l_extendedprice')} AS sum_price
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


# --- TPC-H-style multi-join workloads (Q3/Q5 shapes) ------------------------

def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dimension filters on both sides of a
    fact join, grouped revenue, deterministic top-10.

    Scale shape: the c_mktsegment filter prunes customer BEFORE the join
    (predicate pushdown to the parquet scan), the filtered customer side
    broadcasts, and lineitem's shipdate filter is pushed to its scan, so
    the only large shuffle is lineitem->orders on the join key."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    cutoff = F.lit("1997-06-15").cast("timestamp")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") > cutoff)
        .join(orders.filter(F.col("o_orderdate") < cutoff),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer.filter(F.col("c_mktsegment") == "BUILDING"),
              F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue).alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


ORACLES["shipping_priority"] = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_shipdate > TIMESTAMP '1997-06-15 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-06-15 00:00:00'
  AND c_mktsegment = 'BUILDING'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q_regional_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: five-table join where lineitem joins BOTH customer
    (via orders) and supplier, constrained to one region.

    Scale shape: region->nation->customer/supplier are broadcast chains
    (bounded dims filter first), so lineitem shuffles once on l_orderkey
    and the supplier match is a broadcast probe, not a second fact
    shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    asia_nations = (
        nation.join(F.broadcast(region.filter(F.col("r_name") == "ASIA")),
                    F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(asia_nations),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(dsum(revenue).alias("revenue"),
             F.count(F.lit(1)).alias("n_lineitems"))
    )


ORACLES["regional_supplier_volume"] = f"""
SELECT n_name,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
       COUNT(*) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = 'ASIA'
GROUP BY n_name
"""


# --- X3/X4 approximate scale paths ------------------------------------------

def q_approx_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 at 100 TB: HyperLogLog cardinalities — fixed-size sketches merge
    associatively, so the shuffle carries ~1.5 KB per (group, column)
    instead of every distinct value (exact COUNT(DISTINCT) shuffles the
    value universe; at 100 TB that IS the bottleneck).

    Sketch estimates are engine-specific, so the raw estimate cannot be
    hash-compared — instead the query emits the EXACT counts (which the
    DuckDB oracle reproduces) plus tolerance-band booleans asserting the
    HLL estimate landed within ±5% of exact.  The oracle emits TRUE for
    the bands, so a drifting sketch flips the hash red.  (The exact twin
    `distinct_counts` stays the pure value-checked query; this one is the
    sketch-accuracy gate.)"""
    df = load_table(spark, sf_dir, "lineitem")
    agg = df.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("apx_partkey"),
        F.approx_count_distinct("l_suppkey", rsd=0.02).alias("apx_suppkey"),
        F.countDistinct("l_partkey").alias("nd_partkey"),
        F.countDistinct("l_suppkey").alias("nd_suppkey"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    def _band(apx: str, exact: str):
        return (
            F.abs(F.col(apx) - F.col(exact))
            <= 0.05 * F.greatest(F.col(exact), F.lit(1))
        )
    return agg.select(
        "l_returnflag",
        "nd_partkey",
        "nd_suppkey",
        "n_rows",
        _band("apx_partkey", "nd_partkey").alias("partkey_within_band"),
        _band("apx_suppkey", "nd_suppkey").alias("suppkey_within_band"),
    )


ORACLES["approx_distinct_counts"] = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS nd_partkey,
       COUNT(DISTINCT l_suppkey) AS nd_suppkey,
       COUNT(*) AS n_rows,
       TRUE AS partkey_within_band,
       TRUE AS suppkey_within_band
FROM lineitem GROUP BY l_returnflag
"""


def q_approx_quantile_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 at 100 TB: mergeable-sketch percentiles (fixed accuracy budget,
    no per-group sort, no value shuffle).

    Same banded-oracle contract as q_approx_distinct_counts: emit the
    EXACT interpolated percentiles (rounded to 6dp — libm-safe, matched
    by DuckDB's quantile_cont) plus booleans asserting the sketch landed
    within 2% relative error of exact."""
    df = load_table(spark, sf_dir, "lineitem")
    agg = df.groupBy("l_returnflag").agg(
        F.percentile_approx("l_quantity", 0.5, 10000).alias("apx_p50_qty"),
        F.percentile_approx("l_extendedprice", 0.25, 10000).alias("apx_p25_price"),
        F.percentile_approx("l_extendedprice", 0.75, 10000).alias("apx_p75_price"),
        F.percentile("l_quantity", 0.5).alias("ex_p50_qty"),
        F.percentile("l_extendedprice", 0.25).alias("ex_p25_price"),
        F.percentile("l_extendedprice", 0.75).alias("ex_p75_price"),
    )
    def _band(apx: str, exact: str):
        return (
            F.abs(F.col(apx) - F.col(exact))
            <= 0.02 * F.greatest(F.abs(F.col(exact)), F.lit(1))
        )
    return agg.select(
        "l_returnflag",
        F.round("ex_p50_qty", 6).alias("p50_qty"),
        F.round("ex_p25_price", 6).alias("p25_price"),
        F.round("ex_p75_price", 6).alias("p75_price"),
        _band("apx_p50_qty", "ex_p50_qty").alias("p50_within_band"),
        _band("apx_p25_price", "ex_p25_price").alias("p25_within_band"),
        _band("apx_p75_price", "ex_p75_price").alias("p75_within_band"),
    )


ORACLES["approx_quantile_profile"] = """
SELECT l_returnflag,
       ROUND(PERCENTILE_CONT(0.5)  WITHIN GROUP (ORDER BY l_quantity), 6) AS p50_qty,
       ROUND(PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY l_extendedprice), 6) AS p25_price,
       ROUND(PERCENTILE_CONT(0.75) WITHIN GROUP (ORDER BY l_extendedprice), 6) AS p75_price,
       TRUE AS p50_within_band,
       TRUE AS p25_within_band,
       TRUE AS p75_within_band
FROM lineitem GROUP BY l_returnflag
"""


def q_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6: referential-integrity DQ profile — per returnflag, how many
    fact rows have a parent order and how many are orphaned (FK
    constraint as a warehouse-scale metric, not a row dump).

    Scale shape: LEFT join on the key, misses counted as nulls; with AQE
    the orders side (pruned to its single key column) broadcasts, making
    the whole check a map-side probe over the fact scan — no second
    shuffle for the aggregation thanks to partial counts."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    joined = li.select("l_returnflag", "l_orderkey").join(
        orders.select("o_orderkey"),
        li.l_orderkey == F.col("o_orderkey"),
        "left",
    )
    return joined.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_orderkey").isNull().cast("bigint")).alias("n_orphans"),
    )


ORACLES["referential_orphans"] = """
SELECT l_returnflag,
       COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_returnflag
"""


def q_drift_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3 at scale: drift detection as a JOIN of two profile DataFrames
    (baseline = pre-1999 shipments, current = 1999+) instead of the
    reference's driver-side scalar loop (src/drift_detector.py:57-80) —
    the shape that works when the profile itself has millions of rows
    (per-partition profiles).  Zero-baseline guard matches the
    reference's base_mean == 0 skip."""
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1999-01-01").cast("timestamp")

    def profile(df: DataFrame, tag: str) -> DataFrame:
        return df.groupBy("l_returnflag").agg(
            davg(F.col("l_quantity")).alias(f"mean_qty_{tag}"),
            F.count(F.lit(1)).alias(f"n_{tag}"),
        )

    base = profile(li.filter(F.col("l_shipdate") < cutoff), "base")
    cur = profile(li.filter(F.col("l_shipdate") >= cutoff), "cur")
    rel = F.abs(F.col("mean_qty_cur") - F.col("mean_qty_base")) / F.abs(
        F.col("mean_qty_base")
    )
    return base.join(cur, "l_returnflag").select(
        "l_returnflag", "mean_qty_base", "mean_qty_cur",
        "n_base", "n_cur",
        F.round(rel, 6).alias("rel_diff"),
        ((F.col("mean_qty_base") != 0.0) & (rel > 0.02)).alias("drifted"),
    )


ORACLES["drift_compare"] = f"""
WITH base AS (
  SELECT l_returnflag, {sql_davg('l_quantity')} AS mean_qty_base,
         COUNT(*) AS n_base
  FROM lineitem WHERE l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
  GROUP BY l_returnflag
), cur AS (
  SELECT l_returnflag, {sql_davg('l_quantity')} AS mean_qty_cur,
         COUNT(*) AS n_cur
  FROM lineitem WHERE l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
  GROUP BY l_returnflag
)
SELECT base.l_returnflag, mean_qty_base, mean_qty_cur, n_base, n_cur,
       ROUND(ABS(mean_qty_cur - mean_qty_base) / ABS(mean_qty_base), 6)
         AS rel_diff,
       (mean_qty_base <> 0.0 AND
        ABS(mean_qty_cur - mean_qty_base) / ABS(mean_qty_base) > 0.02)
         AS drifted
FROM base JOIN cur ON base.l_returnflag = cur.l_returnflag
"""


def q_rolling_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X14: explicit frame spec — per customer, rolling 7-order spend
    (ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) over a total order
    (o_orderdate, o_orderkey), so frame contents are engine-identical.
    The rolling sum runs over integer units (exact, associative) — a
    float rolling sum would depend on each engine's window-sum
    implementation order."""
    df = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-6, Window.currentRow)
    )
    rolling_units = F.sum(to_units(F.col("o_totalprice"))).over(w)
    return df.select(
        "o_custkey", "o_orderkey", "o_orderdate",
        F.count(F.lit(1)).over(w).alias("n_in_window"),
        (rolling_units.cast("double") / F.lit(UNIT_SCALE)).alias("rolling_spend"),
    )


ORACLES["rolling_order_totals"] = """
SELECT o_custkey, o_orderkey, o_orderdate,
       COUNT(*) OVER w AS n_in_window,
       CAST(SUM(CAST(FLOOR(o_totalprice * 10000.0 + 0.5) AS BIGINT)) OVER w
            AS DOUBLE) / 10000.0 AS rolling_spend
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: fact ⋈ part-dimension with a conditional-share
    aggregate — what fraction of monthly revenue is PROMO-type parts.

    Scale shape: part is a classic broadcast dimension (bounded by the
    catalog, not the facts); the conditional numerator uses exact unit
    sums so the share is engine-identical.  One fact scan, zero fact
    shuffles before the (tiny) monthly aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    month = F.date_trunc("month", F.col("l_shipdate"))
    promo_units = F.when(
        F.col("p_type") == "PROMO", to_units(revenue)
    ).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(month.alias("ship_month"))
        .agg(
            (F.sum(promo_units).cast("double") / F.lit(UNIT_SCALE)).alias(
                "promo_revenue"
            ),
            (F.sum(to_units(revenue)).cast("double") / F.lit(UNIT_SCALE)).alias(
                "total_revenue"
            ),
            F.round(
                F.sum(promo_units).cast("double")
                / F.sum(to_units(revenue)).cast("double"),
                9,
            ).alias("promo_share"),
        )
    )


ORACLES["promo_revenue_share"] = """
SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS ship_month,
       CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(FLOOR((l_extendedprice * (1 - l_discount)) * 10000.0 + 0.5) AS BIGINT)
                 ELSE 0 END) AS DOUBLE) / 10000.0 AS promo_revenue,
       CAST(SUM(CAST(FLOOR((l_extendedprice * (1 - l_discount)) * 10000.0 + 0.5) AS BIGINT))
            AS DOUBLE) / 10000.0 AS total_revenue,
       ROUND(CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(FLOOR((l_extendedprice * (1 - l_discount)) * 10000.0 + 0.5) AS BIGINT)
                 ELSE 0 END) AS DOUBLE)
             / CAST(SUM(CAST(FLOOR((l_extendedprice * (1 - l_discount)) * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE),
             9) AS promo_share
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY CAST(date_trunc('month', l_shipdate) AS TIMESTAMP)
"""


# --- X6b: TPC-H Q4-style EXISTS semi-join aggregate -------------------------

def q_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4-analog: per priority, count orders with at least one line shipped
    AFTER the order date (late-shipment DQ check; our schema has no
    commit/receipt dates, so the EXISTS predicate is l_shipdate >
    o_orderdate — same decorrelation shape as reference-grade Q4).

    Scale shape: the EXISTS decorrelates to a LEFT SEMI join on
    l_orderkey with the date predicate in the join condition — lineitem
    is never aggregated or deduplicated, the semi join short-circuits per
    order, and the tiny priority rollup happens after the fact table has
    shrunk to one row per qualifying order.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_late_orders")
    )


ORACLES["order_priority_check"] = """
SELECT o_orderpriority, COUNT(*) AS n_late_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
"""


# --- X5b: TPC-H Q18-style HAVING over a pre-aggregate -----------------------

LARGE_ORDER_QTY = 120.0


def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18-analog: orders whose total line quantity exceeds a threshold,
    enriched with the customer.

    Scale shape: the HAVING filter runs on the per-order partial
    aggregate BEFORE any join — at 100 TB the groupBy shrinks lineitem
    ~4x with map-side combine and the filter then drops ~99% of orders,
    so the joins move only the qualifying tail; orders/customer arrive
    via AQE-planned joins (broadcast once pruned).  Quantities are
    integral doubles, so SUM is exact on both engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > LARGE_ORDER_QTY)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty"
        )
    )


ORACLES["large_volume_customers"] = f"""
SELECT c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM (
  SELECT l_orderkey, SUM(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(l_quantity) > {LARGE_ORDER_QTY}
) big
JOIN orders ON o_orderkey = big.l_orderkey
JOIN customer ON c_custkey = o_custkey
"""


# --- X16b: pivot (status columns per priority) ------------------------------

ORDER_STATUSES = ["F", "O", "P"]


def q_pivot_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: one row per order priority, one count column per order
    status.  The status domain is declared explicitly — with pivot values
    known up front Spark skips the eager distinct-values job (a full
    extra pass over the data at 100 TB) and plans a two-level aggregate
    whose shuffles carry only (priority, status) partial counts."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ORDER_STATUSES)
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            *[F.coalesce(F.col(s), F.lit(0)).alias(f"n_{s}") for s in ORDER_STATUSES],
        )
    )


ORACLES["pivot_status_priority"] = """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_F,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_O,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_P
FROM orders GROUP BY o_orderpriority
"""


# --- S3b: CDC merge / upsert (full-refresh sink generalized) ----------------

def q_merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE (upsert): apply a change batch onto a base snapshot — the
    incremental generalization of the reference's truncate-and-load sink
    (reference src/etl_job.py:75-80 rewrites the whole table; at 100 TB
    you merge the delta instead).

    Base/delta are carved deterministically from `orders` (no extra
    fixtures): base = keys not ≡ 0 (mod 7); delta re-prices keys ≡ 0
    (mod 3) and flags them 'U'.  The merge itself is the standard
    dataflow Delta/Iceberg MERGE compiles into: FULL OUTER join base⋈delta
    on the key, delta side wins per column.  One co-partitioned shuffle
    on the merge key; with a bucketed/partitioned base table the shuffle
    touches only affected partitions (dynamic file pruning).
    """
    orders = load_table(spark, sf_dir, "orders")
    base = orders.filter(F.col("o_orderkey") % 7 != 0)
    delta = (
        orders.filter(F.col("o_orderkey") % 3 == 0)
        .select(
            F.col("o_orderkey").alias("d_orderkey"),
            F.col("o_custkey").alias("d_custkey"),
            F.lit("U").alias("d_orderstatus"),
            # explicit floor(x*100+0.5)/100: same IEEE op sequence on every
            # engine — ROUND() ties break differently between Spark/DuckDB
            (F.floor(F.col("o_totalprice") * 1.1 * 100 + 0.5) / 100).alias(
                "d_totalprice"
            ),
        )
    )
    merged = base.join(
        delta, base.o_orderkey == delta.d_orderkey, "full_outer"
    )
    return merged.select(
        F.coalesce("d_orderkey", "o_orderkey").alias("m_orderkey"),
        F.coalesce("d_custkey", "o_custkey").alias("m_custkey"),
        F.coalesce("d_orderstatus", "o_orderstatus").alias("m_orderstatus"),
        F.coalesce("d_totalprice", "o_totalprice").alias("m_totalprice"),
    )


ORACLES["merge_upsert_orders"] = """
WITH base AS (
  SELECT * FROM orders WHERE o_orderkey % 7 <> 0
),
delta AS (
  SELECT o_orderkey AS d_orderkey, o_custkey AS d_custkey,
         'U' AS d_orderstatus,
         FLOOR(o_totalprice * 1.1 * 100 + 0.5) / 100 AS d_totalprice
  FROM orders WHERE o_orderkey % 3 = 0
)
SELECT COALESCE(d_orderkey, o_orderkey) AS m_orderkey,
       COALESCE(d_custkey, o_custkey) AS m_custkey,
       COALESCE(d_orderstatus, o_orderstatus) AS m_orderstatus,
       COALESCE(d_totalprice, o_totalprice) AS m_totalprice
FROM base FULL OUTER JOIN delta ON o_orderkey = d_orderkey
"""


# --- X2b: correlation drift profile -----------------------------------------

def q_corr_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between measures per group — correlation DRIFT
    catches relationship breaks (e.g. price decoupling from quantity)
    that per-column mean/std profiles cannot see.

    Not ``F.corr``: its streaming-merge float state is partitioning- and
    engine-dependent.  Instead the five sufficient statistics are exact
    integer sums of 1e-4-quantized units (128-bit accumulators for the
    product terms), and the closed-form correlation is evaluated from
    those exact integers with the same IEEE expression tree as the
    oracle — partition-invariant AND bit-stable across engines.  The
    quantization scale cancels algebraically in the ratio.
    """
    df = load_table(spark, sf_dir, "lineitem")
    xu = to_units(F.col("l_quantity"))
    yu = to_units(F.col("l_extendedprice"))
    n = F.count(F.lit(1)).cast("double")
    sx = F.sum(xu).cast("double")
    sy = F.sum(yu).cast("double")
    sxy = F.sum((xu * yu).cast("decimal(38,0)")).cast("double")
    sxx = F.sum((xu * xu).cast("decimal(38,0)")).cast("double")
    syy = F.sum((yu * yu).cast("decimal(38,0)")).cast("double")
    corr = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return df.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(corr, 9).alias("corr_qty_price"),
    )


def _sql_u(expr: str) -> str:
    return f"CAST(FLOOR(({expr}) * 10000.0 + 0.5) AS BIGINT)"


ORACLES["corr_profile"] = f"""
SELECT l_returnflag,
       COUNT(*) AS n_rows,
       ROUND(
         (CAST(COUNT(*) AS DOUBLE) * CAST(SUM({_sql_u('l_quantity')} * {_sql_u('l_extendedprice')}) AS DOUBLE)
          - CAST(SUM({_sql_u('l_quantity')}) AS DOUBLE) * CAST(SUM({_sql_u('l_extendedprice')}) AS DOUBLE))
         / (SQRT(CAST(COUNT(*) AS DOUBLE) * CAST(SUM({_sql_u('l_quantity')} * {_sql_u('l_quantity')}) AS DOUBLE)
                 - CAST(SUM({_sql_u('l_quantity')}) AS DOUBLE) * CAST(SUM({_sql_u('l_quantity')}) AS DOUBLE))
            * SQRT(CAST(COUNT(*) AS DOUBLE) * CAST(SUM({_sql_u('l_extendedprice')} * {_sql_u('l_extendedprice')}) AS DOUBLE)
                   - CAST(SUM({_sql_u('l_extendedprice')}) AS DOUBLE) * CAST(SUM({_sql_u('l_extendedprice')}) AS DOUBLE))),
         9) AS corr_qty_price
FROM lineitem GROUP BY l_returnflag
"""


# --- X5c': TPC-H Q6 — the pure pushdown microbenchmark ----------------------

def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 adapted: forecast revenue delta from a single filtered scan —
    no join, one global agg.  Every predicate (shipdate year, discount
    band, quantity cap) must reach the parquet scan as a pushed filter
    (pinned in test_plan_shapes), so at 100 TB this is bounded by I/O on
    the row groups that survive zone-map pruning, with map-side partial
    aggregation reducing each partition to one row."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias(
                "revenue_delta"
            ),
        )
    )


ORACLES["tpch_q6"] = f"""
SELECT COUNT(*) AS n_lines,
       {sql_dsum('l_extendedprice * l_discount')} AS revenue_delta
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# --- X5c: TPC-H Q19-style disjunctive predicate pushdown --------------------

def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19-analog: revenue under an OR of conjunctive brand/size/quantity
    bands.  The disjunction mixes join-side predicates (part) with
    fact-side predicates (lineitem) — Catalyst still extracts the
    common-term simplifications and pushes the partial predicates to both
    scans (l_quantity range to lineitem, brand/size union to part), so the
    join sees pre-filtered inputs; the residual OR evaluates post-join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    band1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    )
    band2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 35)
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.filter(band1 | band2).agg(
        F.count(F.lit(1)).alias("n_lines"),
        dsum(revenue).alias("revenue"),
    )


ORACLES["disjunctive_revenue"] = f"""
SELECT COUNT(*) AS n_lines,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 35)
"""


# --- X5d: TPC-H Q17-style correlated scalar subquery ------------------------

def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17-analog: revenue from lineitems whose quantity is below half the
    part's average quantity — the correlated-scalar-subquery shape
    (``WHERE l_quantity < (SELECT 0.5*AVG ... WHERE same part)``).

    Spark-first decorrelation: instead of agg-then-self-join (two
    shuffles of the fact table), compute the per-part average as a
    whole-partition window (``partitionBy(l_partkey)``, no orderBy) —
    ONE exchange of lineitem, no join, and the same plan shape scales to
    any part-key cardinality.  ``l_quantity`` is integer-valued, so
    sum/count and the 0.5* threshold are exact in both engines and the
    strict ``<`` comparison is partitioning-invariant.
    """
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    flagged = li.withColumn("part_avg_qty", F.avg("l_quantity").over(w))
    return flagged.filter(
        F.col("l_quantity") < 0.5 * F.col("part_avg_qty")
    ).agg(
        F.count(F.lit(1)).alias("n_lines"),
        dsum(F.col("l_extendedprice")).alias("small_qty_revenue"),
    )


ORACLES["small_qty_revenue"] = f"""
SELECT COUNT(*) AS n_lines,
       {sql_dsum('l_extendedprice')} AS small_qty_revenue
FROM (
    SELECT l_extendedprice, l_quantity,
           AVG(l_quantity) OVER (PARTITION BY l_partkey) AS part_avg_qty
    FROM lineitem
)
WHERE l_quantity < 0.5 * part_avg_qty
"""


# --- H2 at scale: healing proposals as a dataflow ---------------------------

HEAL_PREV_MAX = 0.2  # the contract's pre-healing null tolerance


def q_healing_proposals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's H2 healing formula (self_healing_agent.py:93 —
    ``new = min(cap 0.8, max(prev + 0.2, observed + 0.05))``) applied PER
    GROUP as a DataFrame op: one pass computes every partition's observed
    null fraction and its proposed tolerance.

    This is what healing means at 100 TB — the reference heals one global
    contract from one global fraction; a partitioned table needs a
    proposal per partition, and emitting them as a DataFrame makes the
    healing plan itself queryable/joinable (e.g. against an allow-list)
    before the config write.  Null fractions are exact integer-count
    ratios, so the formula evaluates bit-identically on any engine.
    """
    from ..healing import (
        NULL_TOLERANCE_CAP,
        NULL_TOLERANCE_MARGIN,
        NULL_TOLERANCE_STEP,
    )

    df = load_table(spark, sf_dir, "events")
    nf = (
        F.sum(F.col("value").isNull().cast("bigint")).cast("double")
        / F.count(F.lit(1))
    )
    proposed = F.least(
        F.lit(NULL_TOLERANCE_CAP),
        F.greatest(
            F.lit(HEAL_PREV_MAX + NULL_TOLERANCE_STEP),
            nf + F.lit(NULL_TOLERANCE_MARGIN),
        ),
    )
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        nf.alias("nf_value"),
        (nf > HEAL_PREV_MAX).alias("violates"),
        F.when(nf > HEAL_PREV_MAX, proposed)
        .otherwise(F.lit(HEAL_PREV_MAX))
        .alias("proposed_max_null_fraction"),
    )


ORACLES["healing_proposals"] = """
SELECT event_type,
       COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS nf_value,
       (CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)) > 0.2 AS violates,
       CASE WHEN (CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)) > 0.2
            THEN LEAST(0.8, GREATEST(0.2 + 0.2,
                 CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) + 0.05))
            ELSE 0.2 END AS proposed_max_null_fraction
FROM events GROUP BY event_type
"""


# --- TPC-H Q13: customer order-count distribution ---------------------------

def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: how many customers placed exactly N orders (including
    N=0) — the classic LEFT join + double aggregation.  First aggregate
    is per customer (shuffle on custkey, partial counts map-side); the
    second groups the tiny (distinct-count-of-counts) result.  At scale
    the first shuffle carries one row per customer, the second a few
    hundred rows total."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        customer.select("c_custkey")
        .join(orders.select("o_custkey"), customer.c_custkey == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_custkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.desc("c_count"))
    )


ORACLES["customer_order_distribution"] = """
SELECT c_count, COUNT(*) AS n_customers
FROM (
  SELECT c_custkey, COUNT(o_custkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY n_customers DESC, c_count DESC
"""


# --- fixed-width histogram profile (zone-map spans, zero extra passes) ------

HIST_BINS = 10


def q_histogram_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group fixed-width histogram of l_extendedprice (10 bins) — the
    distribution-drift input that mean/std profiling can't see (bimodal
    shifts, tail growth).

    Bin edges derive from parquet FOOTER statistics (zone maps) — zero
    data passes, same trick as ``quantile_profile`` — so the whole
    histogram is ONE aggregation over the scan.  The oracle recomputes
    min/max by scanning; the values are identical because footer stats
    are exact for these files."""
    df = load_table(spark, sf_dir, "lineitem")
    spans = parquet_column_spans(sf_dir, "lineitem", ["l_extendedprice"])
    if spans is None:  # statless fallback: one tiny min/max job
        r = df.agg(
            F.min("l_extendedprice"), F.max("l_extendedprice")
        ).collect()[0]
        mn, mx = float(r[0]), float(r[1])
    else:
        mn, mx = spans["l_extendedprice"]
    width = (mx - mn) / HIST_BINS
    bin_id = F.least(
        F.lit(HIST_BINS - 1),
        F.floor((F.col("l_extendedprice") - F.lit(mn)) / F.lit(width)),
    ).cast("bigint")
    return (
        df.groupBy("l_returnflag", bin_id.alias("bin_id"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


ORACLES["histogram_profile"] = f"""
WITH span AS (
  SELECT MIN(l_extendedprice) AS mn,
         (MAX(l_extendedprice) - MIN(l_extendedprice)) / {HIST_BINS} AS width
  FROM lineitem
)
SELECT l_returnflag,
       CAST(LEAST({HIST_BINS - 1},
                  FLOOR((l_extendedprice - mn) / width)) AS BIGINT) AS bin_id,
       COUNT(*) AS n_rows
FROM lineitem CROSS JOIN span
GROUP BY l_returnflag, bin_id
"""


# --- TPC-H Q15: top supplier by revenue --------------------------------------

def q_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: revenue per supplier, keep the maximum-revenue
    supplier(s).  The classic agg -> global-max -> filter pattern WITHOUT
    a second scan: an empty-frame window max over the aggregate's own
    (tiny) output.  At 100 TB the fact scan happens once; the window runs
    over |suppliers| rows, and because revenue uses exact quantized units
    the max-equality filter is engine-stable (no float-tie ambiguity)."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .alias("total_revenue")
        )
    )
    w = Window.partitionBy()  # whole-result window over the small aggregate
    top = (
        revenue.withColumn("max_rev", F.max("total_revenue").over(w))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .drop("max_rev")
    )
    return top.join(
        F.broadcast(supplier.select("s_suppkey", "s_name")),
        top.l_suppkey == F.col("s_suppkey"),
    ).select("s_suppkey", "s_name", "total_revenue")


ORACLES["top_supplier_revenue"] = f"""
WITH revenue AS (
  SELECT l_suppkey,
         {sql_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


# --- TPC-H Q22: above-average-balance customers with no orders ---------------

# "Idle" = no order on/after this date.  The r7 contract ("never
# ordered") was empty below sf0.1 — EVERY customer has at least one
# order at sf0.001/0.01, so the driver green was vacuous (VERDICT r7
# #2).  Orders span 1995-2001; this cutoff yields 2/14/148 idle-rich
# customers at sf0.001/0.01/0.1 — values exercised at every SF.
IDLE_SINCE = "1999-01-01"


def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: per market segment, count customers whose balance
    exceeds the global positive-balance average AND who placed no order
    since ``IDLE_SINCE`` (lapsed-customer detection).
    Composition: 1-row broadcast scalar (the average) + broadcast-able
    ANTI join against recent order keys + one small aggregate.  The anti
    join's build side is orders pruned to one column AND date-filtered
    (the filter pushes to the parquet scan); with AQE it broadcasts,
    so the customer scan is one map-side pass."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = customer.filter(F.col("c_acctbal") > 0.0).agg(
        davg(F.col("c_acctbal")).alias("avg_bal")
    )
    rich = (
        customer.select("c_custkey", "c_mktsegment", "c_acctbal")
        .crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit(IDLE_SINCE).cast("timestamp")
    ).select("o_custkey")
    idle_rich = rich.join(
        recent, rich.c_custkey == F.col("o_custkey"), "left_anti"
    )
    return idle_rich.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        dsum(F.col("c_acctbal")).alias("total_balance"),
    )


ORACLES["idle_rich_customers"] = f"""
WITH avg_bal AS (
  SELECT {sql_davg('c_acctbal')} AS avg_bal FROM customer WHERE c_acctbal > 0.0
)
SELECT c_mktsegment, COUNT(*) AS n_customers,
       {sql_dsum('c_acctbal')} AS total_balance
FROM customer CROSS JOIN avg_bal
WHERE c_acctbal > avg_bal
  AND c_custkey NOT IN (
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '{IDLE_SINCE} 00:00:00')
GROUP BY c_mktsegment
"""


# --- fulfillment-lag profile -------------------------------------------------

FULFILLMENT_SLA_DAYS = 90


def q_fulfillment_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority fulfillment SLA profile: order-date -> ship-date lag
    in exact integer days, with the fraction of lines blowing a 90-day
    SLA.  FK join with the orders side pruned to two columns
    (broadcastable under AQE at this shape; co-shuffled at 100 TB);
    day-difference comparisons are pure integer math."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    joined = li.select("l_orderkey", "l_shipdate").join(
        orders.select("o_orderkey", "o_orderpriority", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    lag_days = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return joined.select("o_orderpriority", lag_days.alias("lag_days")).groupBy(
        "o_orderpriority"
    ).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum((F.col("lag_days") > FULFILLMENT_SLA_DAYS).cast("int"))
        .cast("bigint").alias("n_slow"),
        F.sum("lag_days").cast("bigint").alias("total_lag_days"),
        (F.sum("lag_days").cast("double") / F.count(F.lit(1))).alias("avg_lag_days"),
    )


ORACLES["fulfillment_lag"] = f"""
SELECT o_orderpriority,
       COUNT(*) AS n_lines,
       CAST(SUM(CASE WHEN date_diff('day', o_orderdate, l_shipdate)
                     > {FULFILLMENT_SLA_DAYS} THEN 1 ELSE 0 END) AS BIGINT) AS n_slow,
       CAST(SUM(date_diff('day', o_orderdate, l_shipdate)) AS BIGINT) AS total_lag_days,
       CAST(SUM(date_diff('day', o_orderdate, l_shipdate)) AS DOUBLE) / COUNT(*) AS avg_lag_days
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


# --- TPC-H Q7: volume shipping between two nations ---------------------------

Q7_NATION_A = "NATION_1"
Q7_NATION_B = "NATION_2"


def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: bilateral trade volume by (supplier nation, customer
    nation, ship year) for one nation pair in both directions.

    Scale plan: the nation filter is applied to the DIMS before any fact
    join — supplier and customer each shrink to ~1/25 of their rows and
    broadcast; the fact table is then filtered by the broadcast hash
    joins themselves (no shuffle of lineitem on a dimension key).  The
    only shuffle is the final 2x2xN-year aggregation, which is partial
    (map-side) first."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    pair = nation.filter(F.col("n_name").isin(Q7_NATION_A, Q7_NATION_B))
    supp_n = supplier.join(
        F.broadcast(pair.select(F.col("n_nationkey").alias("s_nationkey"),
                                F.col("n_name").alias("supp_nation"))),
        "s_nationkey",
    ).select("s_suppkey", "supp_nation")
    cust_n = customer.join(
        F.broadcast(pair.select(F.col("n_nationkey").alias("c_nationkey"),
                                F.col("n_name").alias("cust_nation"))),
        "c_nationkey",
    ).select("c_custkey", "cust_nation")

    shipped = li.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    joined = (
        shipped.join(F.broadcast(supp_n), shipped.l_suppkey == supp_n.s_suppkey)
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust_n), F.col("o_custkey") == cust_n.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return joined.groupBy(
        "supp_nation", "cust_nation",
        F.year("l_shipdate").cast("bigint").alias("l_year"),
    ).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


ORACLES["tpch_q7"] = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON n1.n_nationkey = s_nationkey
JOIN nation n2 ON n2.n_nationkey = c_nationkey
WHERE n1.n_name IN ('{Q7_NATION_A}', '{Q7_NATION_B}')
  AND n2.n_name IN ('{Q7_NATION_A}', '{Q7_NATION_B}')
  AND n1.n_name <> n2.n_name
  AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY supp_nation, cust_nation, l_year
"""


# --- TPC-H Q10: returned-item reporting --------------------------------------

Q10_TOP_N = 20


def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: top customers by lost revenue from returned items in one
    quarter.  The order filter prunes the fact scan (pushdown-able on a
    date-partitioned layout); customer and nation broadcast onto the
    post-aggregation result — joining dims AFTER the groupBy keeps the
    shuffle payload to (custkey, units) instead of full customer rows.
    Exact-unit revenue makes the top-N cut engine-stable; c_custkey is the
    deterministic tiebreak."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    quarter = orders.filter(
        (F.col("o_orderdate") >= F.lit("1995-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    returned = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    rev = (
        returned.join(quarter, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("revenue"))
    )
    out = (
        rev.join(F.broadcast(customer.select("c_custkey", "c_name", "c_acctbal",
                                             "c_nationkey")),
                 rev.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )
    return out.orderBy(F.col("revenue").desc(), F.col("c_custkey").asc()).limit(
        Q10_TOP_N
    )


ORACLES["tpch_q10"] = f"""
SELECT c_custkey, c_name, revenue, c_acctbal, n_name
FROM (
  SELECT o_custkey, {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1995-10-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
  GROUP BY o_custkey
) JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
ORDER BY revenue DESC, c_custkey ASC
LIMIT {Q10_TOP_N}
"""


# --- PSI distribution drift (histogram-based) --------------------------------

PSI_BINS = 10
PSI_EPS = 1e-6
PSI_CUTOFF = "1999-01-01"


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per histogram bin of l_extendedprice:
    baseline = shipments before 1999, current = 1999+.  PSI catches the
    distribution drift (bimodal shift, tail growth) that ``drift_compare``'s
    mean test cannot see; per-bin terms localize WHERE the distribution
    moved.  psi_term = (p_cur - p_base) * ln(p_cur / p_base), eps-smoothed.

    Scale plan: bin edges come from parquet footer zone maps (no extra
    pass), both sides histogram in ONE aggregation over one scan
    (conditional counts), and the PSI arithmetic runs in a whole-result
    window over <= PSI_BINS rows.  Terms are rounded half-up at 6dp on
    both engines to absorb libm ln() ulp differences."""
    df = load_table(spark, sf_dir, "lineitem")
    spans = parquet_column_spans(sf_dir, "lineitem", ["l_extendedprice"])
    if spans is None:
        r = df.agg(F.min("l_extendedprice"), F.max("l_extendedprice")).collect()[0]
        mn, mx = float(r[0]), float(r[1])
    else:
        mn, mx = spans["l_extendedprice"]
    width = (mx - mn) / PSI_BINS
    bin_id = F.least(
        F.lit(PSI_BINS - 1),
        F.floor((F.col("l_extendedprice") - F.lit(mn)) / F.lit(width)),
    ).cast("bigint")
    cutoff = F.lit(PSI_CUTOFF).cast("timestamp")
    is_cur = (F.col("l_shipdate") >= cutoff).cast("int")
    hist = df.select(bin_id.alias("bin_id"), is_cur.alias("is_cur")).groupBy(
        "bin_id"
    ).agg(
        F.sum(1 - F.col("is_cur")).cast("bigint").alias("n_base"),
        F.sum("is_cur").cast("bigint").alias("n_cur"),
    )
    w = Window.partitionBy()  # whole-result window over <= PSI_BINS rows
    p_base = F.greatest(
        F.lit(PSI_EPS),
        F.col("n_base").cast("double") / F.sum("n_base").over(w),
    )
    p_cur = F.greatest(
        F.lit(PSI_EPS),
        F.col("n_cur").cast("double") / F.sum("n_cur").over(w),
    )
    term = (p_cur - p_base) * F.log(p_cur / p_base)
    round6 = F.floor(term * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    return hist.select(
        "bin_id", "n_base", "n_cur", round6.alias("psi_term")
    )


ORACLES["psi_drift"] = f"""
WITH span AS (
  SELECT MIN(l_extendedprice) AS mn,
         (MAX(l_extendedprice) - MIN(l_extendedprice)) / {PSI_BINS} AS width
  FROM lineitem
),
hist AS (
  SELECT CAST(LEAST({PSI_BINS - 1},
                    FLOOR((l_extendedprice - mn) / width)) AS BIGINT) AS bin_id,
         CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '{PSI_CUTOFF} 00:00:00'
                       THEN 0 ELSE 1 END) AS BIGINT) AS n_base,
         CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '{PSI_CUTOFF} 00:00:00'
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
  FROM lineitem CROSS JOIN span
  GROUP BY bin_id
)
SELECT bin_id, n_base, n_cur,
       FLOOR((GREATEST({PSI_EPS}, CAST(n_cur AS DOUBLE) / SUM(n_cur) OVER ())
              - GREATEST({PSI_EPS}, CAST(n_base AS DOUBLE) / SUM(n_base) OVER ()))
             * LN(GREATEST({PSI_EPS}, CAST(n_cur AS DOUBLE) / SUM(n_cur) OVER ())
                  / GREATEST({PSI_EPS}, CAST(n_base AS DOUBLE) / SUM(n_base) OVER ()))
             * 1e6 + 0.5) / 1e6 AS psi_term
FROM hist
"""


# --- TPC-H Q8: national market share -----------------------------------------

Q8_NATION = "NATION_3"
# The testdata's region names are the REAL TPC-H ones (AFRICA/AMERICA/
# ASIA/EUROPE/MIDDLE EAST) even though nation names are synthetic
# NATION_*; the r7 "REGION_0" constant matched nothing, so the query was
# empty at every SF and its green was vacuous (VERDICT r7 #2).  ASIA was
# chosen because it yields non-empty results at every SF (7 year-rows at
# sf0.001/0.01/0.1); the canonical TPC-H Q8 validation substitution is
# actually region = AMERICA (nation BRAZIL) — not used here because the
# choice of region is arbitrary for this synthetic data.
Q8_REGION = "ASIA"
Q8_PTYPE = "PROMO"


def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: one nation's share of revenue for one part type sold to
    customers of one region, by order year — the widest TPC-H join tree
    this schema supports (lineitem + orders + customer + supplier + part
    + nation x2 + region).

    Scale plan: every dimension is filtered BEFORE joining and broadcast
    (part shrinks ~6x on p_type, customers to one region); the fact table
    joins orders on the only big-big edge.  The share division runs on
    the tiny per-year aggregate; both numerator and denominator come from
    ONE pass using a conditional exact-unit sum."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    region_nations = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == Q8_REGION)),
            nation.n_regionkey == region.r_regionkey,
        ).select(F.col("n_nationkey").alias("c_nationkey"))
    )
    cust_r = customer.join(F.broadcast(region_nations), "c_nationkey").select(
        "c_custkey"
    )
    promo_parts = part.filter(F.col("p_type") == Q8_PTYPE).select("p_partkey")
    supp_n = supplier.join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("s_nationkey"),
                                  F.col("n_name").alias("supp_nation"))),
        "s_nationkey",
    ).select("s_suppkey", "supp_nation")

    joined = (
        li.join(F.broadcast(promo_parts), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(supp_n), li.l_suppkey == F.col("s_suppkey"))
        .join(orders.select("o_orderkey", "o_custkey", "o_orderdate"),
              li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(cust_r), F.col("o_custkey") == F.col("c_custkey"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nation_vol = F.when(F.col("supp_nation") == Q8_NATION, vol).otherwise(0.0)
    by_year = joined.groupBy(
        F.year("o_orderdate").cast("bigint").alias("o_year")
    ).agg(
        dsum(nation_vol).alias("nation_volume"),
        dsum(vol).alias("total_volume"),
    )
    share6 = F.floor(
        (F.col("nation_volume") / F.col("total_volume")) * F.lit(1e6) + F.lit(0.5)
    ) / F.lit(1e6)
    return by_year.select(
        "o_year", "nation_volume", "total_volume", share6.alias("mkt_share")
    )


ORACLES["tpch_q8"] = f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       {sql_dsum(f"CASE WHEN n1.n_name = '{Q8_NATION}' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")} AS nation_volume,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS total_volume,
       FLOOR(({sql_dsum(f"CASE WHEN n1.n_name = '{Q8_NATION}' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
              / {sql_dsum('l_extendedprice * (1 - l_discount)')}) * 1e6 + 0.5) / 1e6 AS mkt_share
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON n1.n_nationkey = s_nationkey
JOIN nation n2 ON n2.n_nationkey = c_nationkey
JOIN region   ON r_regionkey = n2.n_regionkey
WHERE p_type = '{Q8_PTYPE}' AND r_name = '{Q8_REGION}'
GROUP BY o_year
"""


# --- hot-key skew profile ----------------------------------------------------

SKEW_TOP_K = 20


def q_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnosis: the top-20 heaviest join/agg keys of
    the fact table with each key's share of all rows — the measurement
    that decides WHEN to salt (``functions/skew.py``) or let AQE split.
    A 100 TB job that shuffles on a key where the top key holds 5% of
    rows stalls on one straggler task; this profile is the early warning.

    One partial-aggregated groupBy (bounded by |keys|), then top-k and
    the share arithmetic run on the aggregate only.  The global total
    comes from summing the per-key counts in a whole-result window —
    no second scan of the fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n_rows"))
    w = Window.partitionBy()  # over |keys| aggregated rows, not the fact table
    share6 = F.floor(
        (F.col("n_rows").cast("double") / F.sum("n_rows").over(w))
        * F.lit(1e6) + F.lit(0.5)
    ) / F.lit(1e6)
    ranked = per_key.select(
        "l_orderkey", "n_rows", share6.alias("row_share")
    ).orderBy(F.col("n_rows").desc(), F.col("l_orderkey").asc())
    return ranked.limit(SKEW_TOP_K)


ORACLES["key_skew_profile"] = f"""
SELECT l_orderkey, n_rows, row_share FROM (
  SELECT l_orderkey, COUNT(*) AS n_rows,
         FLOOR((CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER ())
               * 1e6 + 0.5) / 1e6 AS row_share
  FROM lineitem GROUP BY l_orderkey
)
ORDER BY n_rows DESC, l_orderkey ASC
LIMIT {SKEW_TOP_K}
"""


# --- SCD2 run-compaction of order-priority history ---------------------------

def q_scd2_priority_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) build: compress each customer's
    order-priority sequence into validity intervals.

    Classic warehouse dimension maintenance re-expressed as one dataflow:
    change-flag (lag) -> running island id (cumsum) -> per-run aggregate ->
    valid_to from the next run's valid_from (lead).  Single shuffle: every
    stage is partitioned by (or grouped on a superset of) ``o_custkey``,
    so after the first window exchange Catalyst inserts only sorts.
    Ties on ``o_orderdate`` are broken by ``o_orderkey`` for a total,
    engine-portable order.  ``valid_to IS NULL`` marks the open run.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderpriority").over(w)
    chg = F.when(
        prev.isNull() | (prev != F.col("o_orderpriority")), 1
    ).otherwise(0)
    runs = (
        orders.withColumn("island", F.sum(chg).over(w))
        .groupBy("o_custkey", "island")
        .agg(
            F.min("o_orderpriority").alias("o_orderpriority"),  # constant per run
            F.min("o_orderdate").alias("valid_from"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    w2 = Window.partitionBy("o_custkey").orderBy("island")
    return runs.select(
        "o_custkey",
        "o_orderpriority",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        "n_orders",
    )


ORACLES["scd2_priority_history"] = """
WITH flagged AS (
  SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
         CASE WHEN LAG(o_orderpriority) OVER w IS NULL
                OR LAG(o_orderpriority) OVER w <> o_orderpriority
              THEN 1 ELSE 0 END AS chg
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
),
runs0 AS (
  SELECT o_custkey, o_orderdate, o_orderpriority,
         SUM(chg) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS island
  FROM flagged
),
runs AS (
  SELECT o_custkey, island,
         MIN(o_orderpriority) AS o_orderpriority,
         MIN(o_orderdate) AS valid_from,
         COUNT(*) AS n_orders
  FROM runs0 GROUP BY o_custkey, island
)
SELECT o_custkey, o_orderpriority, valid_from,
       LEAD(valid_from) OVER (PARTITION BY o_custkey ORDER BY island)
         AS valid_to,
       n_orders
FROM runs
"""


# --- robust outlier profile: median / MAD ------------------------------------

def q_mad_outlier_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust outlier profile of ``l_extendedprice`` per
    return flag: median, median-absolute-deviation, and the count of rows
    whose |x - median| exceeds 3x MAD.

    Exact MAD is inherently multi-pass (the deviation distribution needs
    the median first); the 2-column integer-unit projection is cached so
    the three passes scan a narrow columnar cache, not the fact table.
    Cross-engine float parity: all ranking happens on integer 1e-4 units,
    and medians are DOUBLED before use (``2 * percentile``) so the p=0.5
    interpolation midpoint (k + 0.5) becomes an exact integer — every
    comparison and division below is then IEEE-exact in both engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    units_df = li.select(
        "l_returnflag", to_units(F.col("l_extendedprice")).alias("units")
    ).cache()
    med = units_df.groupBy("l_returnflag").agg(
        (F.expr("percentile(units, 0.5)") * 2).cast("bigint").alias("med2")
    )
    dev = units_df.join(F.broadcast(med), "l_returnflag").select(
        "l_returnflag",
        "med2",
        F.abs(F.col("units") * 2 - F.col("med2")).alias("dev2"),
    )
    mad = dev.groupBy("l_returnflag").agg(
        F.expr("percentile(dev2, 0.5)").alias("mad2")
    )
    flagged = dev.join(F.broadcast(mad), "l_returnflag")
    n_outliers = F.count_if(F.col("dev2") > F.lit(3.0) * F.col("mad2"))
    return flagged.groupBy("l_returnflag").agg(
        (F.max("med2").cast("double") / F.lit(2 * UNIT_SCALE)).alias(
            "median_price"
        ),
        (F.max("mad2") / F.lit(2 * UNIT_SCALE)).alias("mad_price"),
        F.count(F.lit(1)).alias("n_rows"),
        n_outliers.alias("n_outliers"),
        (
            n_outliers.cast("double") / F.count(F.lit(1))
        ).alias("outlier_frac"),
    )


ORACLES["mad_outlier_profile"] = """
WITH units AS (
  SELECT l_returnflag,
         CAST(FLOOR(l_extendedprice * 10000.0 + 0.5) AS BIGINT) AS units
  FROM lineitem
),
med AS (
  SELECT l_returnflag, CAST(2 * quantile_cont(units, 0.5) AS BIGINT) AS med2
  FROM units GROUP BY l_returnflag
),
dev AS (
  SELECT u.l_returnflag, med2, ABS(u.units * 2 - med2) AS dev2
  FROM units u JOIN med USING (l_returnflag)
),
mad AS (
  SELECT l_returnflag, quantile_cont(dev2, 0.5) AS mad2
  FROM dev GROUP BY l_returnflag
)
SELECT d.l_returnflag,
       CAST(MAX(med2) AS DOUBLE) / 20000.0 AS median_price,
       MAX(mad2) / 20000.0 AS mad_price,
       COUNT(*) AS n_rows,
       COUNT(*) FILTER (WHERE dev2 > 3.0 * mad2) AS n_outliers,
       CAST(COUNT(*) FILTER (WHERE dev2 > 3.0 * mad2) AS DOUBLE) / COUNT(*)
         AS outlier_frac
FROM dev d JOIN mad USING (l_returnflag)
GROUP BY d.l_returnflag
"""


# --- Q9-adapted: product-line profit by supplier nation and year -------------

Q9_PART_LIKE = "widget"
Q9_COST_FACTOR = 0.5


def q_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 adapted to this schema: profit on one product family by
    supplier nation and ship year.  The dataset has no partsupp table, so
    unit cost is proxied as ``Q9_COST_FACTOR * p_retailprice`` (documented
    divergence; the join/aggregation shape is Q9's).

    Scale plan: the part filter shrinks the dimension BEFORE the fact
    join and broadcasts; supplier+nation pre-join into one broadcast dim,
    so lineitem is never shuffled on a dimension key — the only exchange
    is the final (nation, year) aggregation, partial map-side first.
    Profit is summed in exact 1e-4 units (order-independent, engine-
    stable)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    part_f = part.filter(F.col("p_name").contains(Q9_PART_LIKE)).select(
        "p_partkey", "p_retailprice"
    )
    supp_n = supplier.join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("s_nationkey"),
                                  "n_name")),
        "s_nationkey",
    ).select("s_suppkey", "n_name")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(Q9_COST_FACTOR) * F.col("p_retailprice") * F.col("l_quantity")
    )
    joined = (
        li.join(F.broadcast(part_f), li.l_partkey == part_f.p_partkey)
        .join(F.broadcast(supp_n), li.l_suppkey == supp_n.s_suppkey)
    )
    return joined.groupBy(
        F.col("n_name").alias("nation"),
        F.year("l_shipdate").cast("bigint").alias("o_year"),
    ).agg(
        dsum(profit).alias("profit"),
        F.count(F.lit(1)).alias("n_lines"),
    )


ORACLES["profit_by_nation_year"] = f"""
SELECT n_name AS nation,
       CAST(year(l_shipdate) AS BIGINT) AS o_year,
       {sql_dsum(
           'l_extendedprice * (1 - l_discount)'
           f' - {Q9_COST_FACTOR} * p_retailprice * l_quantity'
       )} AS profit,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
WHERE p_name LIKE '%{Q9_PART_LIKE}%'
GROUP BY n_name, o_year
"""


# --- TPC-H Q21: sole-late supplier blame --------------------------------------

Q21_LATE_DAYS = 60


def q_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 adapted to this schema (no commit/receipt dates: a line
    is "late" when it ships more than 60 days after the order date):
    suppliers who, in a finished multi-supplier order, were the ONLY
    supplier with a late line.

    The textbook formulation is lineitem EXISTS-self-join plus a
    NOT-EXISTS-self-join — two extra passes over the fact table.  The
    Spark-first plan replaces both with aggregation: collapse to one row
    per (order, supplier) with a has_late flag, then a single
    per-order window supplies "how many suppliers / how many late
    suppliers in this order" — the EXISTS (n_supp > 1) and NOT EXISTS
    (n_late = 1) become column predicates.  The fact table is read ONCE
    and shuffled twice on the same key family (orderkey, then the
    window re-uses that partitioning under AQE); supplier names resolve
    via a broadcast probe at the tiny top.  At 100 TB this is the
    difference between one shuffle chain and three fact-table joins."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    late = (
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > Q21_LATE_DAYS
    ).cast("int")
    per_supp = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(
            orders.filter(F.col("o_orderstatus") == "F")
            .select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("has_late"))
    )
    w = Window.partitionBy("l_orderkey")
    flagged = (
        per_supp
        .withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn("n_late", F.sum("has_late").over(w))
        .filter(
            (F.col("has_late") == 1)
            & (F.col("n_supp") > 1)
            & (F.col("n_late") == 1)
        )
    )
    return (
        flagged.join(F.broadcast(supplier.select("s_suppkey", "s_name")),
                     flagged.l_suppkey == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


ORACLES["sole_late_supplier"] = f"""
WITH per_supp AS (
  SELECT l_orderkey, l_suppkey,
         MAX(CASE WHEN date_diff('day', o_orderdate, l_shipdate)
                  > {Q21_LATE_DAYS} THEN 1 ELSE 0 END) AS has_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY l_orderkey, l_suppkey
), flagged AS (
  SELECT *,
         COUNT(*) OVER (PARTITION BY l_orderkey) AS n_supp,
         SUM(has_late) OVER (PARTITION BY l_orderkey) AS n_late
  FROM per_supp
)
SELECT s_name, COUNT(*) AS numwait
FROM flagged JOIN supplier ON l_suppkey = s_suppkey
WHERE has_late = 1 AND n_supp > 1 AND n_late = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


# --- TPC-H Q11: concentrated-value parts --------------------------------------

Q11_NATION = "NATION_3"
Q11_AVG_MULTIPLE = 3


def q_concentrated_value_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 adapted (no partsupp table: "inventory value" is shipped
    revenue per part from one nation's suppliers): parts whose value
    exceeds 3x the average per-part value — the group-vs-global-scalar
    shape.

    Scale plan: the nation's supplier keys broadcast into the fact scan
    (lineitem never shuffles on a dimension key), the per-part aggregate
    is one partial-first shuffle, and the global threshold comes from a
    whole-result window over the aggregate's own |parts|-sized output —
    the fact table is scanned ONCE (a separate totals-agg branch would
    scan it twice; Catalyst does not reuse the subtree).  The threshold
    compare runs in exact integer units: value_units * n_parts > 3 *
    total_units is pure BIGINT arithmetic, so the cut line is
    bit-identical in any engine at any partitioning (a double threshold
    could flip parts straddling an ulp)."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    nat_supp = supplier.join(
        F.broadcast(
            nation.filter(F.col("n_name") == Q11_NATION)
            .select(F.col("n_nationkey").alias("s_nationkey"))
        ),
        "s_nationkey",
    ).select("s_suppkey")
    value_units = to_units(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    per_part = (
        li.join(F.broadcast(nat_supp),
                li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(value_units).alias("value_units"))
    )
    w = Window.partitionBy()  # over |parts| aggregated rows, not the fact
    return (
        per_part
        .withColumn("total_units", F.sum("value_units").over(w))
        .withColumn("n_parts", F.count(F.lit(1)).over(w))
        .filter(
            F.col("value_units") * F.col("n_parts")
            > F.lit(Q11_AVG_MULTIPLE) * F.col("total_units")
        )
        .select(
            "l_partkey",
            (F.col("value_units").cast("double") / F.lit(UNIT_SCALE))
            .alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "l_partkey")
    )


_Q11_UNITS = (
    "SUM(CAST(FLOOR((l_extendedprice * (1 - l_discount)) * 10000.0 + 0.5)"
    " AS BIGINT))"
)

ORACLES["concentrated_value_parts"] = f"""
WITH per_part AS (
  SELECT l_partkey, {_Q11_UNITS} AS value_units
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = '{Q11_NATION}'
  GROUP BY l_partkey
), totals AS (
  SELECT SUM(value_units) AS total_units, COUNT(*) AS n_parts FROM per_part
)
SELECT l_partkey,
       CAST(value_units AS DOUBLE) / 10000.0 AS part_value
FROM per_part CROSS JOIN totals
WHERE value_units * n_parts > {Q11_AVG_MULTIPLE} * total_units
ORDER BY part_value DESC, l_partkey
"""


# --- TPC-H Q16: supplier breadth per part class -------------------------------

def q_supplier_part_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 adapted (no partsupp: part<->supplier association comes
    from shipped lineitem rows): distinct-supplier count per
    (p_type, p_size), excluding suppliers in bad standing (negative
    account balance) — Q16's anti-join + grouped COUNT DISTINCT shape.

    Scale plan: the exclusion list is a broadcast ANTI join (never a
    NOT IN shuffle), part attributes broadcast into the fact scan, and
    the distinct-count runs as two partial aggregations (dedup on
    (type, size, suppkey) first, then count) — Catalyst plans exactly
    that from countDistinct.  The fact table is scanned once with only
    two columns read."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    bad = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.select("l_partkey", "l_suppkey")
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(part.select("p_partkey", "p_type", "p_size")),
              li.l_partkey == F.col("p_partkey"))
        .groupBy("p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


ORACLES["supplier_part_breadth"] = """
SELECT p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_type, p_size
"""


# --- X20b: Z-order clustering vs linear sort (scan-pruning layout) -----------
#
# X20 reads zone maps (per-file min/max) to SKIP files; this operator
# decides how to WRITE files so zone maps skip well for multi-column
# predicates.  A linear sort gives perfect pruning on its leading column
# and none on others; Morton (Z-order) interleaving gives good pruning on
# BOTH — the layout lever Delta/Iceberg OPTIMIZE ZORDER pulls.  At 100 TB
# the layout decision IS the scan cost: the operator quantifies it by
# simulating both file assignments over the same rows and reporting how
# many files/rows a canonical 2-D box predicate must touch under each.

ZORDER_BITS = 6  # 64x64 grid
ZORDER_EPOCH = "1995-01-01"  # lineitem shipdates span 1995-01-02..2001-11-04
ZORDER_DAYS_PER_CELL = 40  # 2560-day span / 64 cells (max day 2499 -> 62)
ZORDER_FILES = 64  # both layouts pack rows into 64 "files"
# the probe predicate: an 8x8 box (1/8 of the key space per axis),
# deliberately NOT aligned to a power-of-2 quadrant — an aligned box
# (e.g. 16..23 on both axes) falls into exactly ONE Morton file, which
# overstates z-order's typical win; this one straddles quadrants, the
# representative case (measured at sf0.01: zorder scans 4 files / 3772
# rows vs linear's 8 files / 7760 rows for the same 991 matches)
ZORDER_BOX = (14, 21, 18, 25)


def _interleave_bits_py(n_bits: int, x_name: str, y_name: str):
    """(spark_expr_builder, sql_text) for the Morton code: bit b of x ->
    bit 2b, bit b of y -> bit 2b+1 — same div/mod arithmetic rendered
    into both engines, no engine-specific bit operators."""
    sql_terms = []
    for b in range(n_bits):
        p, q = 2 ** b, 4 ** b
        sql_terms.append(f"(({x_name} // {p}) % 2) * {q}")
        sql_terms.append(f"(({y_name} // {p}) % 2) * {2 * q}")

    def spark_z(x: F.Column, y: F.Column) -> F.Column:
        z = F.lit(0).cast("bigint")
        for b in range(n_bits):
            p, q = 2 ** b, 4 ** b
            z = z + (F.floor(x / p) % 2) * q + (F.floor(y / p) % 2) * (2 * q)
        return z

    return spark_z, " + ".join(sql_terms)


def q_zorder_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layout study: pack lineitem into ZORDER_FILES files by (a) linear
    ship-date order and (b) Morton order over (ship-date cell, partkey
    residue), compute each file's zone map, and report what the box
    predicate ZORDER_BOX costs under each layout.

    Output (one row per layout): files scanned / skipped by the zone
    maps, rows inside scanned files, and the true matching rows (layout-
    invariant, so the two rows cross-check each other).  All integers.

    Scale shape: one narrow scan computes cells + both file ids, an
    explode-to-layouts keeps it single-pass (the ``substring_dup_spans``
    explode-to-sides convention — never a UNION of two selects over the
    same scan), then two tiny aggs: 2x64 zone-map rows, 2 summary rows.
    Nothing shuffles wider than (layout, file_id).  A real writer would
    range-partition on the same keys and write the files; the zone-map
    math and the skip decision are exactly what the parquet footers
    would then serve (sources/tables.py:parquet_column_spans)."""
    li = load_table(spark, sf_dir, "lineitem")
    x0, x1, y0, y1 = ZORDER_BOX
    spark_z, _ = _interleave_bits_py(ZORDER_BITS, "x", "y")
    n_cells = 2 ** ZORDER_BITS
    day = F.datediff(F.col("l_shipdate").cast("date"), F.lit(ZORDER_EPOCH).cast("date"))
    cells = li.select(
        F.least(F.lit(n_cells - 1), F.floor(day / ZORDER_DAYS_PER_CELL))
        .cast("bigint").alias("x"),
        (F.col("l_partkey") % n_cells).cast("bigint").alias("y"),
    )
    # z in [0, 4096); 64 files -> 64 consecutive z cells per file.
    # linear layout: file = ship-date cell (perfect date clustering).
    zcol = spark_z(F.col("x"), F.col("y"))
    assigned = cells.select(
        "x", "y",
        F.explode(F.array(
            F.struct(F.lit("linear").alias("layout"),
                     F.col("x").alias("file_id")),
            F.struct(F.lit("zorder").alias("layout"),
                     F.floor(zcol / (4 ** ZORDER_BITS / ZORDER_FILES))
                     .cast("bigint").alias("file_id")),
        )).alias("a"),
    ).select("x", "y", "a.layout", "a.file_id")
    matched = (
        (F.col("x") >= x0) & (F.col("x") <= x1)
        & (F.col("y") >= y0) & (F.col("y") <= y1)
    )
    zone = assigned.groupBy("layout", "file_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("x").alias("min_x"), F.max("x").alias("max_x"),
        F.min("y").alias("min_y"), F.max("y").alias("max_y"),
        F.sum(matched.cast("bigint")).alias("n_matched"),
    )
    scanned = (
        (F.col("max_x") >= x0) & (F.col("min_x") <= x1)
        & (F.col("max_y") >= y0) & (F.col("min_y") <= y1)
    )
    return (
        zone.groupBy("layout")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum(scanned.cast("bigint")).alias("files_scanned"),
            F.sum(F.when(scanned, F.col("n_rows")).otherwise(F.lit(0)))
            .alias("rows_scanned"),
            F.sum("n_matched").alias("rows_matched"),
        )
    )


_Z_SQL = _interleave_bits_py(ZORDER_BITS, "x", "y")[1]

ORACLES["zorder_pruning"] = f"""
WITH cells AS (
  SELECT LEAST({2 ** ZORDER_BITS - 1},
               CAST(FLOOR(DATE_DIFF('day', DATE '{ZORDER_EPOCH}',
                                    CAST(l_shipdate AS DATE))
                          / {ZORDER_DAYS_PER_CELL}.0) AS BIGINT)) AS x,
         l_partkey % {2 ** ZORDER_BITS} AS y
  FROM lineitem
),
assigned AS (
  SELECT x, y, 'linear' AS layout, x AS file_id FROM cells
  UNION ALL
  SELECT x, y, 'zorder' AS layout,
         CAST(FLOOR(({_Z_SQL}) / ({4 ** ZORDER_BITS} / {ZORDER_FILES}.0))
              AS BIGINT) AS file_id
  FROM cells
),
zone AS (
  SELECT layout, file_id, COUNT(*) AS n_rows,
         MIN(x) AS min_x, MAX(x) AS max_x,
         MIN(y) AS min_y, MAX(y) AS max_y,
         CAST(SUM(CASE WHEN x BETWEEN {ZORDER_BOX[0]} AND {ZORDER_BOX[1]}
                        AND y BETWEEN {ZORDER_BOX[2]} AND {ZORDER_BOX[3]}
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_matched
  FROM assigned GROUP BY layout, file_id
)
SELECT layout,
       COUNT(*) AS n_files,
       CAST(SUM(CASE WHEN max_x >= {ZORDER_BOX[0]} AND min_x <= {ZORDER_BOX[1]}
                      AND max_y >= {ZORDER_BOX[2]} AND min_y <= {ZORDER_BOX[3]}
                     THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
       CAST(SUM(CASE WHEN max_x >= {ZORDER_BOX[0]} AND min_x <= {ZORDER_BOX[1]}
                      AND max_y >= {ZORDER_BOX[2]} AND min_y <= {ZORDER_BOX[3]}
                     THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned,
       CAST(SUM(n_matched) AS BIGINT) AS rows_matched
FROM zone GROUP BY layout
"""


# --- X5b: iterative graph analytics — PageRank over the trade graph ----------
#
# duplicate_clusters (text.py) does iterative min-label CONNECTED
# COMPONENTS; this is the other canonical join-iterate-aggregate shape:
# PageRank over the bipartite supplier<->customer graph induced by
# lineitem x orders.  Every arithmetic step is exact BIGINT units
# (rank//deg integer contributions, damping as *850 //1000), so three
# engines' worth of floating-point summation order cannot move a bit —
# the same trick functions/stable.py plays for sums, applied to an
# ITERATIVE fixpoint.

PR_SCALE = 1_000_000  # rank stored in millionths
PR_ITERS = 3
PR_TOP = 20


def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-PR_TOP entities of the supplier<->customer trade graph after
    PR_ITERS integer-unit PageRank rounds (damping 0.85).

    Scale shape: the edge list (deduped, symmetric, degree-annotated) is
    built once and cached — it is the frame every iteration joins, the
    Pregel-on-DataFrames layout.  Each round is contribution join ->
    per-node sum, shuffling on node ids only; rank state is 2 columns x
    |V| rows.  Degrees are attached to the EDGE frame at build time so
    iterations join ranks alone (no per-round deg join).  At 100 TB you
    would localCheckpoint rank state every few rounds (duplicate_clusters
    does) — three fixed rounds keep the lineage shallow enough without.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # nodes are packed into BIGINTs (supplier = 2k, customer = 2k+1) so
    # every iteration shuffles 16-byte rows, not string labels; the
    # human-readable id is attached only to the PR_TOP output rows
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            (F.col("l_suppkey") * 2).alias("s"),
            (F.col("o_custkey") * 2 + 1).alias("c"),
        )
        .distinct()
    )
    edges = pairs.selectExpr("s AS src", "c AS dst").unionAll(
        pairs.selectExpr("c AS src", "s AS dst")
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    edges_deg = edges.join(deg, "src").cache()
    ranks = deg.select(
        F.col("src").alias("node"),
        F.lit(PR_SCALE).cast("bigint").alias("r"),
    )
    for _ in range(PR_ITERS):
        contrib = (
            edges_deg.join(ranks, edges_deg.src == ranks.node)
            .select("dst", F.expr("r div d").alias("cu"))
        )
        ranks = (
            contrib.groupBy("dst")
            .agg(F.sum("cu").alias("s"))
            .select(
                F.col("dst").alias("node"),
                F.expr(
                    f"CAST({int(0.15 * PR_SCALE)} + (850 * s) div 1000 AS BIGINT)"
                ).alias("r"),
            )
        )
    # top-k via orderBy+limit, NOT a global row_number window: Catalyst
    # plans the former as TakeOrderedAndProject (per-partition top-k,
    # then a k-row merge on the driver side of the exchange), while an
    # unpartitioned window would funnel ALL |V| rank rows into one sort
    # task.  The k-row rn window after the limit sorts 20 rows.
    top = ranks.orderBy(F.desc("r"), F.asc("node")).limit(PR_TOP)
    w = Window.orderBy(F.desc("r"), F.asc("node"))
    label = F.concat(
        F.when(F.col("node") % 2 == 0, F.lit("s")).otherwise(F.lit("c")),
        F.expr("node div 2").cast("string"),
    )
    return (
        top.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .select("rn", label.alias("node_id"), F.col("r").alias("rank_units"))
    )


def _pr_iter_sql(prev: str, out: str) -> str:
    # MATERIALIZED: DuckDB inlines CTEs, and each iteration references
    # the previous one plus edges_deg — without the hint the chain
    # re-expands the whole edge build per reference (measured >30 s at
    # sf0.1 for the by-region variant; ~2 s materialized)
    return f"""{out} AS MATERIALIZED (
  SELECT e.dst AS node,
         CAST({int(0.15 * PR_SCALE)} + (850 * SUM(r.r // e.d)) // 1000
              AS BIGINT) AS r
  FROM edges_deg e JOIN {prev} r ON r.node = e.src
  GROUP BY e.dst
)"""


ORACLES["graph_pagerank"] = f"""
WITH pairs AS MATERIALIZED (
  SELECT DISTINCT l_suppkey * 2 AS s, o_custkey * 2 + 1 AS c
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
edges AS MATERIALIZED (
  SELECT s AS src, c AS dst FROM pairs
  UNION ALL
  SELECT c AS src, s AS dst FROM pairs
),
deg AS MATERIALIZED (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
edges_deg AS MATERIALIZED (SELECT e.src, e.dst, d.d FROM edges e JOIN deg d ON d.src = e.src),
r0 AS (SELECT src AS node, CAST({PR_SCALE} AS BIGINT) AS r FROM deg),
{_pr_iter_sql("r0", "r1")},
{_pr_iter_sql("r1", "r2")},
{_pr_iter_sql("r2", "r3")}
SELECT rn,
       (CASE WHEN node % 2 = 0 THEN 's' ELSE 'c' END)
         || CAST(node // 2 AS VARCHAR) AS node_id,
       rank_units
FROM (
  SELECT ROW_NUMBER() OVER (ORDER BY r DESC, node ASC) AS rn,
         node, r AS rank_units
  FROM r3
) WHERE rn <= {PR_TOP}
"""


# --- X24b: grouped PageRank — per-region fixpoints ---------------------------
#
# q_graph_pagerank ranks the GLOBAL trade graph; the training-data use
# case usually wants influence WITHIN a stratum (per language, per
# source, per region) — the subgraph induced by keeping only
# within-stratum edges.  Because every node (supplier or customer)
# belongs to exactly one region, that restriction makes the strata
# DISJOINT subgraphs, so ALL the per-region fixpoints run as ONE
# iteration loop over the union — no per-group driver loop, no skew
# from running the biggest stratum last.  The region label is attached
# only at the ends (edge build, final top-k), never shuffled through
# the rank state.

PR_G_TOP = 5  # top-k reported per region


def q_graph_pagerank_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-PR_G_TOP entities per region of the INTRA-REGION trade graph
    after PR_ITERS integer-unit PageRank rounds (damping 0.85) — the
    grouped twin of ``q_graph_pagerank`` (same PR_SCALE fixed-point
    units, same rank//deg + *850//1000 damping, so the fixpoint is
    bit-exact cross-engine).

    Scale shape: the iterations are IDENTICAL to the global operator —
    16-byte (node, rank) rows shuffling against a cached degree-
    annotated edge frame — because disjoint subgraphs need no group key
    in the loop; grouping costs exactly one extra broadcast-dim join at
    edge-build time (nation/region are tiny dims) and a PARTITIONED
    row_number at the end (per-region top-k, never a global sort).
    Contrast with a per-group driver loop over N strata: N× the
    scheduler barriers and the largest stratum still dominates."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    reg = load_table(spark, sf_dir, "region")
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_regionkey").alias("s_reg"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_regionkey").alias("c_reg"))
    )
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("s_reg") == F.col("c_reg"))
        .select(
            F.col("s_reg").alias("regionkey"),
            (F.col("l_suppkey") * 2).alias("s"),
            (F.col("o_custkey") * 2 + 1).alias("c"),
        )
        .distinct()
    )
    edges = pairs.selectExpr("regionkey", "s AS src", "c AS dst").unionAll(
        pairs.selectExpr("regionkey", "c AS src", "s AS dst")
    )
    # the node -> region map rides on the degree frame (each node is in
    # exactly one region, so this is 1 row per node, not per edge)
    deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).alias("d"), F.min("regionkey").alias("regionkey")
    )
    edges_deg = edges.select("src", "dst").join(deg.select("src", "d"), "src").cache()
    ranks = deg.select(
        F.col("src").alias("node"),
        F.lit(PR_SCALE).cast("bigint").alias("r"),
    )
    for _ in range(PR_ITERS):
        contrib = (
            edges_deg.join(ranks, edges_deg.src == ranks.node)
            .select("dst", F.expr("r div d").alias("cu"))
        )
        ranks = (
            contrib.groupBy("dst")
            .agg(F.sum("cu").alias("s"))
            .select(
                F.col("dst").alias("node"),
                F.expr(
                    f"CAST({int(0.15 * PR_SCALE)} + (850 * s) div 1000 AS BIGINT)"
                ).alias("r"),
            )
        )
    w = Window.partitionBy("regionkey").orderBy(F.desc("r"), F.asc("node"))
    label = F.concat(
        F.when(F.col("node") % 2 == 0, F.lit("s")).otherwise(F.lit("c")),
        F.expr("node div 2").cast("string"),
    )
    return (
        ranks.join(deg.select(F.col("src").alias("node"), "regionkey"), "node")
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= PR_G_TOP)
        .join(F.broadcast(reg), F.col("regionkey") == F.col("r_regionkey"))
        .select(
            F.col("r_name").alias("region"),
            "rn",
            label.alias("node_id"),
            F.col("r").alias("rank_units"),
        )
    )


ORACLES["graph_pagerank_by_region"] = f"""
WITH sup AS (
  SELECT s_suppkey, n_regionkey AS s_reg
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
),
cust AS (
  SELECT c_custkey, n_regionkey AS c_reg
  FROM customer JOIN nation ON c_nationkey = n_nationkey
),
pairs AS MATERIALIZED (
  SELECT DISTINCT s_reg AS regionkey,
         l_suppkey * 2 AS s, o_custkey * 2 + 1 AS c
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN sup ON l_suppkey = s_suppkey
  JOIN cust ON o_custkey = c_custkey
  WHERE s_reg = c_reg
),
edges AS MATERIALIZED (
  SELECT regionkey, s AS src, c AS dst FROM pairs
  UNION ALL
  SELECT regionkey, c AS src, s AS dst FROM pairs
),
deg AS MATERIALIZED (
  SELECT src, COUNT(*) AS d, MIN(regionkey) AS regionkey
  FROM edges GROUP BY src
),
edges_deg AS MATERIALIZED (
  SELECT e.src, e.dst, d.d FROM edges e JOIN deg d ON d.src = e.src
),
r0 AS (SELECT src AS node, CAST({PR_SCALE} AS BIGINT) AS r FROM deg),
{_pr_iter_sql("r0", "r1")},
{_pr_iter_sql("r1", "r2")},
{_pr_iter_sql("r2", "r3")}
SELECT r_name AS region, rn, node_id, rank_units
FROM (
  SELECT g.regionkey,
         ROW_NUMBER() OVER (PARTITION BY g.regionkey
                            ORDER BY r3.r DESC, r3.node ASC) AS rn,
         (CASE WHEN r3.node % 2 = 0 THEN 's' ELSE 'c' END)
           || CAST(r3.node // 2 AS VARCHAR) AS node_id,
         r3.r AS rank_units
  FROM r3 JOIN deg g ON g.src = r3.node
) t JOIN region ON t.regionkey = r_regionkey
WHERE rn <= {PR_G_TOP}
"""

# --- X5 completion: the last three TPC-H shapes (Q2 / Q12 / Q20) ------------
#
# This schema has no partsupp table, no l_shipmode, and no commit/receipt
# dates (reference ingests a flat CSV star only — selfheal/etl.py:1-40), so
# the three remaining TPC-H queries are adapted onto what the schema DOES
# carry: lineitem as the observed part-supplier relation, and the
# ship-vs-order date lag as the latency dimension.  Each keeps the shape
# that makes the original query a planner stress test: Q2's correlated
# per-group MIN, Q12's two-class conditional counting over a fact join,
# Q20's nested semi-join chain.

def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 adapted: for every STANDARD part of size <= 15, the
    EUROPE supplier(s) with the minimum observed total procurement cost
    (discounted spend aggregated from lineitem — the schema's stand-in
    for ps_supplycost).  Correlated-MIN shape: the per-part minimum is
    computed only among in-region suppliers, then re-joined.

    Scale shape: the part family and the region->nation->supplier chain
    are broadcast filters, so the fact scans once, aggregates
    (partkey, suppkey) with map-side combine, and the correlated MIN
    runs as a window over the tiny grouped frame (|family| x |suppliers|
    upper bound), never touching the fact again.  Cost compares in
    exact integer units, so the MIN has no float-tie hazard."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    family = part.filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 15)
    ).select("p_partkey", "p_name")
    euro_supp = (
        supplier.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost_units = to_units(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    ps = (
        li.join(F.broadcast(family), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(euro_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.sum(cost_units).alias("cost_units"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        ps.withColumn("min_cost_units", F.min("cost_units").over(w))
        .filter(F.col("cost_units") == F.col("min_cost_units"))
        .select(
            "s_acctbal", "s_name", "n_name",
            "p_partkey", "p_name",
            (F.col("cost_units").cast("double") / F.lit(UNIT_SCALE)).alias("supply_cost"),
        )
    )


ORACLES["min_cost_supplier"] = """
WITH ps AS (
  SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name,
         SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5)
                  AS BIGINT)) AS cost_units
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE p_type = 'STANDARD' AND p_size <= 15 AND r_name = 'EUROPE'
  GROUP BY 1, 2, 3, 4, 5, 6
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
       CAST(cost_units AS DOUBLE) / 10000.0 AS supply_cost
FROM (
  SELECT *, MIN(cost_units) OVER (PARTITION BY p_partkey) AS min_cost_units
  FROM ps
) t
WHERE cost_units = min_cost_units
"""


def q_ship_latency_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 adapted: the schema has no l_shipmode, so lineitems are
    classed by ship latency instead — FAST (shipped within 30 days of
    the order date) vs SLOW (90+ days) — restricted, like Q12's
    two-mode IN list, to those two classes and to 1997 ship dates; per
    class, count lines from critical-priority orders (1-URGENT/2-HIGH)
    vs the rest.

    Scale shape: the 1997 filter pushes to the lineitem scan; one
    orderkey shuffle joins orders; the class and the two conditional
    counts fold into a 2-row map-side-combined aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    cls = F.when(lag <= 30, "FAST").when(lag >= 90, "SLOW")
    critical = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("lag_class", cls)
        .filter(F.col("lag_class").isNotNull())
        .groupBy("lag_class")
        .agg(
            F.sum(F.when(critical, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(critical, 0).otherwise(1)).alias("low_line_count"),
        )
    )


ORACLES["ship_latency_priority"] = """
SELECT lag_class,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM (
  SELECT o_orderpriority,
         CASE WHEN datediff('day', o_orderdate, l_shipdate) <= 30 THEN 'FAST'
              WHEN datediff('day', o_orderdate, l_shipdate) >= 90 THEN 'SLOW'
         END AS lag_class
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
)
WHERE lag_class IS NOT NULL
GROUP BY lag_class
"""


DOMINANT_SHARE_PCT = 30  # integer percent: share test stays in exact integers


def q_dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 adapted: suppliers in AMERICA who, for at least one
    'small *' part, shipped more than DOMINANT_SHARE_PCT% of that
    part's total 1997 volume (the availqty > 0.5 * shipped test of the
    original, with lineitem standing in for partsupp).  Nested
    semi-join chain: part-name family -> per-(part,supplier) share ->
    distinct dominating suppliers -> supplier/nation details.

    Scale shape: family and dims broadcast; the fact scans once with
    the 1997 + family filters pushed down, aggregates (part, supplier)
    quantities with map-side combine, and the per-part total is a
    window over the grouped frame.  The share test cross-multiplies
    exact integer unit sums (100*q > pct*total) — no float division.
    The final dedup is a distinct over suppliers only."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    family = part.filter(F.col("p_name").startswith("small ")).select("p_partkey")
    qty_units = to_units(F.col("l_quantity"))
    ps = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(family), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_partkey", "l_suppkey")
        .agg(F.sum(qty_units).alias("q_units"))
    )
    w = Window.partitionBy("p_partkey")
    dominating = (
        ps.withColumn("total_units", F.sum("q_units").over(w))
        .filter(F.col("q_units") * 100 > F.col("total_units") * DOMINANT_SHARE_PCT)
        .select("l_suppkey")
        .distinct()
    )
    america = (
        supplier.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.filter(F.col("r_name") == "AMERICA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "n_name")
    )
    return america.join(
        dominating, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
    ).select("s_suppkey", "s_name", "n_name")


ORACLES["dominant_part_suppliers"] = f"""
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(FLOOR(l_quantity * 10000.0 + 0.5) AS BIGINT)) AS q_units
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'small %'
    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY 1, 2
),
dominating AS (
  SELECT DISTINCT l_suppkey
  FROM (
    SELECT *, SUM(q_units) OVER (PARTITION BY l_partkey) AS total_units
    FROM ps
  )
  WHERE q_units * 100 > total_units * {DOMINANT_SHARE_PCT}
)
SELECT s_suppkey, s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'AMERICA'
  AND s_suppkey IN (SELECT l_suppkey FROM dominating)
"""


# --- X38: bucketed warehouse layout — co-located fact-fact join --------------

def q_bucketed_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``q_order_priority_check`` answered from BUCKETED warehouse copies
    of both fact tables — the relational serving split: orders and
    lineitem are stored hash-bucketed AND sorted on their join keys
    (``sources/index_store.ensure_bucketed_table``), so the semi join
    plans with ZERO exchanges below it — each task zips bucket i of
    orders with bucket i of lineitem, already sorted (no shuffle, no
    sort).  The only exchange in the whole plan is the 5-row priority
    rollup.

    At 100 TB this is the layout decision that removes the biggest
    shuffle a warehouse pays: the ingest sink buckets both fact tables
    once, and every orders<->lineitem join afterwards — this check, Q4,
    Q12, merge_upsert — is co-located.  The bucketed copies build once
    per corpus snapshot (content-addressed, source-identity-keyed) and
    re-declare as external tables in later sessions — metadata-only.
    The ``merge`` hint pins SortMergeJoin so the measured row is the
    co-located merge path, not a broadcast that only exists at test SF.

    Identical arithmetic to the build-free twin, so it shares the
    oracle."""
    from ..sources.index_store import ensure_bucketed_table

    o_tbl = ensure_bucketed_table(spark, sf_dir, "orders", "o_orderkey")
    l_tbl = ensure_bucketed_table(spark, sf_dir, "lineitem", "l_orderkey")
    orders = spark.table(o_tbl)
    li = spark.table(l_tbl).select("l_orderkey", "l_shipdate")
    late = orders.join(
        li.hint("merge"),
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_late_orders")
    )


ORACLES["bucketed_late_shipments"] = ORACLES["order_priority_check"]


# --- X41: CDC apply — ordered multi-op change log, latest-wins + deletes -----

def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture APPLY: resolve an ordered I/U/D change log
    against a base snapshot, latest-wins per key, DELETE removes — the
    Debezium-to-warehouse materialization step, and the piece
    ``merge_upsert_orders`` (single-op upsert) does not cover: a key can
    carry several ops and only the LAST one counts.

    Deterministic carve from ``orders`` (no extra fixtures): base = keys
    not ≡ 0 (mod 7); the log has I(seq 1) for keys ≡ 0 (mod 7) at 110%
    price, U(seq 2) for keys ≡ 0 (mod 3) at 105%, D(seq 3) for keys ≡ 0
    (mod 6) — so mod-42 keys see insert→update→delete (net: gone),
    mod-21 keys insert→update (net: the update's value), mod-6 keys
    update→delete (net: gone).  All prices in exact 1e-4 integer units
    (the reprices are integer `* n DIV 100`), so the applied table is
    value-hash-exact.

    Scale shape: ONE window over the log (stream-sized, keyed on the
    change key) picks the latest op; the apply is a keyed left-anti
    (base minus touched keys) unioned with the surviving ops — both
    co-partitioned on the key, nothing corpus-wide reshuffles.  With the
    X38 bucketed base the anti join is co-located too."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", to_units(F.col("o_totalprice")).alias("units")
    )
    base = orders.filter(F.col("o_orderkey") % 7 != 0)
    ins = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey", F.lit(1).alias("seq"), F.lit("I").alias("op"),
        F.expr("units * 110 DIV 100").alias("units"),
    )
    upd = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey", F.lit(2).alias("seq"), F.lit("U").alias("op"),
        F.expr("units * 105 DIV 100").alias("units"),
    )
    dele = orders.filter(F.col("o_orderkey") % 6 == 0).select(
        "o_orderkey", F.lit(3).alias("seq"), F.lit("D").alias("op"),
        F.lit(None).cast("bigint").alias("units"),
    )
    log = ins.unionByName(upd).unionByName(dele)
    w = Window.partitionBy("o_orderkey").orderBy(F.desc("seq"))
    latest = (
        log.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderkey", "op", "units")
    )
    untouched = base.join(latest, "o_orderkey", "left_anti").select(
        "o_orderkey", "units", F.lit("base").alias("src")
    )
    applied = latest.filter(F.col("op") != "D").select(
        "o_orderkey", "units", F.col("op").alias("src")
    )
    return untouched.unionByName(applied)


def q_bucketed_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``q_cdc_apply`` answered against the X38 BUCKETED base — the
    promise in cdc_apply's docstring ("with the X38 bucketed base the
    anti join co-locates too") measured, not asserted: base orders come
    from the stored hash-bucketed copy (``ensure_bucketed_table``), so
    the keyed left-anti plans with ZERO exchanges on the base side —
    bucket i of the base zips with partition i of the resolved log.

    The log side shuffles ONCE, by hand, into the bucket layout
    (``repartition(n_buckets, key)`` — the same Murmur3 hash
    partitioning the bucket spec declares): the latest-op window and the
    anti join BOTH ride that single exchange, so the whole apply plan
    carries exactly one shuffle, and it moves only the stream-sized
    change log.  At 100 TB this is the CDC steady state a warehouse
    wants: the nightly Debezium batch shuffles (tiny), the snapshot
    never does.

    Identical carve and arithmetic to the build-free twin, so it shares
    the oracle."""
    from ..sources.index_store import ensure_bucketed_table

    n_buckets = 16
    o_tbl = ensure_bucketed_table(spark, sf_dir, "orders", "o_orderkey", n_buckets)
    orders = spark.table(o_tbl).select(
        "o_orderkey", to_units(F.col("o_totalprice")).alias("units")
    )
    base = orders.filter(F.col("o_orderkey") % 7 != 0)
    ins = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey", F.lit(1).alias("seq"), F.lit("I").alias("op"),
        F.expr("units * 110 DIV 100").alias("units"),
    )
    upd = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey", F.lit(2).alias("seq"), F.lit("U").alias("op"),
        F.expr("units * 105 DIV 100").alias("units"),
    )
    dele = orders.filter(F.col("o_orderkey") % 6 == 0).select(
        "o_orderkey", F.lit(3).alias("seq"), F.lit("D").alias("op"),
        F.lit(None).cast("bigint").alias("units"),
    )
    log = (
        ins.unionByName(upd)
        .unionByName(dele)
        .repartition(n_buckets, F.col("o_orderkey"))
    )
    w = Window.partitionBy("o_orderkey").orderBy(F.desc("seq"))
    latest = (
        log.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderkey", "op", "units")
    )
    untouched = base.join(
        latest.hint("merge"), "o_orderkey", "left_anti"
    ).select("o_orderkey", "units", F.lit("base").alias("src"))
    applied = latest.filter(F.col("op") != "D").select(
        "o_orderkey", "units", F.col("op").alias("src")
    )
    return untouched.unionByName(applied)


ORACLES["cdc_apply"] = """
WITH o AS (
  SELECT o_orderkey,
         CAST(FLOOR(o_totalprice * 10000.0 + 0.5) AS BIGINT) AS units
  FROM orders
),
base AS (SELECT * FROM o WHERE o_orderkey % 7 <> 0),
log AS (
  SELECT o_orderkey, 1 AS seq, 'I' AS op, units * 110 // 100 AS units
  FROM o WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT o_orderkey, 2, 'U', units * 105 // 100 FROM o WHERE o_orderkey % 3 = 0
  UNION ALL
  SELECT o_orderkey, 3, 'D', NULL FROM o WHERE o_orderkey % 6 = 0
),
latest AS (
  SELECT o_orderkey, op, units FROM (
    SELECT o_orderkey, op, units,
           ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY seq DESC) AS rn
    FROM log
  ) WHERE rn = 1
)
SELECT b.o_orderkey, b.units, 'base' AS src
FROM base b ANTI JOIN latest l ON b.o_orderkey = l.o_orderkey
UNION ALL
SELECT o_orderkey, units, op AS src FROM latest WHERE op <> 'D'
"""

ORACLES["bucketed_cdc_apply"] = ORACLES["cdc_apply"]


def q_bucketed_ingest_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``q_order_priority_check`` against the INGEST-MAINTAINED bucketed
    orders — X38's missing maintenance member: the standing slice was
    written bucketed once, the arriving batch (o_orderkey % 10 == 0) was
    APPENDED with the same bucket spec (one extra file per bucket, the
    standing files untouched — ``ensure_bucketed_ingest_table``), and
    the fact-fact semi join STILL plans with zero exchanges below it.

    What the multi-file buckets cost is sortedness, not co-location: the
    plan keeps ``Bucketed: true`` on both scans and no exchange under
    the join, but pays an in-task Sort on the appended side — a
    per-task, memory-bounded merge instead of the cluster-wide shuffle
    an unbucketed ingest would force on every downstream join.  At
    100 TB this is the warehouse steady state between compactions:
    append bucket-aligned files nightly, compact back to one file per
    bucket when the sort tax outgrows the compaction cost.

    Base+batch together are exactly the full orders table, so the query
    shares order_priority_check's oracle (the layout changes the plan,
    not the answer)."""
    from ..sources.index_store import (
        ensure_bucketed_ingest_table,
        ensure_bucketed_table,
    )

    o_tbl = ensure_bucketed_ingest_table(spark, sf_dir, "orders", "o_orderkey")
    l_tbl = ensure_bucketed_table(spark, sf_dir, "lineitem", "l_orderkey")
    orders = spark.table(o_tbl)
    li = spark.table(l_tbl).select("l_orderkey", "l_shipdate")
    late = orders.join(
        li.hint("merge"),
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_late_orders")
    )


ORACLES["bucketed_ingest_join"] = ORACLES["order_priority_check"]


def q_bucketed_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``q_order_priority_check`` against the COMPACTED bucketed orders —
    the lifecycle's third member (build → ingest-append → compact):
    ``ensure_compacted_bucketed_table`` rewrites the ingest-appended
    multi-file buckets back to one file per bucket, and this join plans
    SORT-FREE again on the orders side — co-location AND sortedness
    restored, the exact inverse of ``q_bucketed_ingest_join``'s in-task
    sort tax (pinned by test_bucketed_compaction_restores_sort_free_join).

    At 100 TB this completes the bucketed warehouse's steady loop:
    nightly ingest appends bucket-aligned files (batch-proportional,
    standing files untouched), downstream merge joins pay a per-task
    sort that grows with file count, and the periodic compaction — one
    bucket-local rewrite, no cluster-wide shuffle — resets it.  The
    compacted table is content-addressed against the ingest table's own
    digest, so a new ingest batch or corpus snapshot re-compacts
    automatically.

    Compaction preserves the rows exactly (base+batch = full orders), so
    the query shares order_priority_check's oracle — the layout changes
    the plan, not the answer."""
    from ..sources.index_store import (
        ensure_bucketed_table,
        ensure_compacted_bucketed_table,
    )

    o_tbl = ensure_compacted_bucketed_table(spark, sf_dir, "orders", "o_orderkey")
    l_tbl = ensure_bucketed_table(spark, sf_dir, "lineitem", "l_orderkey")
    orders = spark.table(o_tbl)
    li = spark.table(l_tbl).select("l_orderkey", "l_shipdate")
    late = orders.join(
        li.hint("merge"),
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_late_orders")
    )


ORACLES["bucketed_compaction"] = ORACLES["order_priority_check"]


# --- X42: in-engine closed-form regression (exact integer normal equations) --

def q_linreg_price_per_item(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority least-squares fit of order price (cents) against item
    count — closed-form simple regression from the normal equations, all
    in exact BIGINT: slope = (n*Sxy - Sx*Sy) DIV (n*Sxx - Sx^2) truncated
    to cents-per-item, intercept = (Sy - slope*Sx) DIV n from the
    truncated slope.  The regression member of the in-engine-training
    family (X25 k-means, X26 power iteration, X28 perceptron): sufficient
    statistics are one map-side-combined aggregate — the treeAggregate
    shape — and the solve is constant-time per group.

    Integer-overflow audit at sf0.1 (n<=30k/group, x<=7 items, y<=6e7
    cents): n*Sxy <= 4e17, Sx*Sy <= 4e17, slope*Sx <= 2e12 — all inside
    BIGINT with >10x margin.  The cross-products grow ~n^2, so at 1e9
    rows you rescale the sums by n first (the X26 posture) — same
    arithmetic, smaller units.

    Degenerate groups: when a priority group has ZERO variance in item
    count, n*Sxx - Sx^2 = 0 and BOTH engines return NULL slope/intercept
    (integer DIV by zero is NULL in Spark and DuckDB alike) — the
    regression is undefined on a vertical-line group, and NULL is the
    declared signal, not an error.  Never fires on TPC-H-shaped data
    (every priority mixes item counts 1..7); a caller that must flag the
    case filters ``slope_cents IS NULL``.

    Scale shape: one per-order count aggregate (shuffles lineitem on its
    FK once), a broadcastable join back to orders, then ONE 5-group
    sufficient-stats aggregate; nothing else moves."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("y"),
    )
    items = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    j = orders.join(items, orders.o_orderkey == items.l_orderkey).select(
        "o_orderpriority", "x", "y"
    )
    stats = j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    return (
        stats.withColumn(
            "slope_cents", F.expr("(n * sxy - sx * sy) DIV (n * sxx - sx * sx)")
        )
        .withColumn("intercept_cents", F.expr("(sy - slope_cents * sx) DIV n"))
        .select("o_orderpriority", "n", "slope_cents", "intercept_cents")
    )


ORACLES["linreg_price_per_item"] = """
WITH j AS (
  SELECT o.o_orderpriority,
         i.x,
         CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS y
  FROM orders o
  JOIN (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS x
        FROM lineitem GROUP BY l_orderkey) i
    ON o.o_orderkey = i.l_orderkey
),
s AS (
  SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM j GROUP BY o_orderpriority
)
SELECT o_orderpriority, n,
       (n * sxy - sx * sy) // (n * sxx - sx * sx) AS slope_cents,
       (sy - ((n * sxy - sx * sy) // (n * sxx - sx * sx)) * sx) // n
         AS intercept_cents
FROM s
"""


def q_linreg_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The regression model SERVED from the store (X32's posture on X42,
    closing the r15 verdict's 'perceptron/linreg have no serve twin'
    note): the per-priority (slope, intercept) pairs persist as a JSON
    model blob via ``ensure_model`` — the digest folds the training
    query's transitive code fingerprint plus BOTH source tables'
    identities (``source_table`` covers lineitem; the orders signature
    rides in the params fingerprint, since the blob depends on both) —
    and the apply half is MAP-ONLY model diagnostics: per priority, the
    residual y - (slope*x + intercept) aggregated to exact-integer MAE
    and bias.  The monitoring query a deployed regression actually
    runs: is the stored fit still centered on live data?

    Plan shape: the same orders ⋈ per-order-count frame as training,
    but the model attaches as ONE literal map expression — no model-side
    join, no normal-equations re-solve; one 5-group aggregate.  Oracle:
    DuckDB re-derives the model in-query (deterministic integer
    arithmetic ⇒ bit-identical to the blob) and computes the same
    residual aggregate."""
    from ..sources.index_store import _source_sig, ensure_model

    def build() -> dict:
        rows = q_linreg_price_per_item(spark, sf_dir).collect()
        return {
            r["o_orderpriority"]: [int(r["slope_cents"]),
                                   int(r["intercept_cents"])]
            for r in rows
        }

    model = ensure_model(
        sf_dir,
        "linreg_price",
        f"linreg|orders:{_source_sig(sf_dir, 'orders')}",
        build,
        source_table="lineitem",
    )
    entries = ", ".join(
        f"'{p}', named_struct('m', {int(v[0])}L, 'b', {int(v[1])}L)"
        for p, v in sorted(model.items())
    )
    fit = F.expr(f"element_at(map({entries}), o_orderpriority)")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("y"),
    )
    items = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    resid = (
        orders.join(items, orders.o_orderkey == items.l_orderkey)
        .select(
            "o_orderpriority",
            (F.col("y") - (fit["m"] * F.col("x") + fit["b"])).alias("r"),
        )
    )
    return resid.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr("SUM(ABS(r)) DIV COUNT(1)").alias("mae_cents"),
        F.expr("SUM(r) DIV COUNT(1)").alias("bias_cents"),
    )


ORACLES["linreg_serve"] = """
WITH j AS (
  SELECT o.o_orderpriority,
         i.x,
         CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS y
  FROM orders o
  JOIN (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS x
        FROM lineitem GROUP BY l_orderkey) i
    ON o.o_orderkey = i.l_orderkey
),
s AS (
  SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM j GROUP BY o_orderpriority
),
model AS (
  SELECT o_orderpriority,
         (n * sxy - sx * sy) // (n * sxx - sx * sx) AS m,
         (sy - ((n * sxy - sx * sy) // (n * sxx - sx * sx)) * sx) // n AS b
  FROM s
)
SELECT j.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(ABS(j.y - (md.m * j.x + md.b))) // COUNT(*) AS BIGINT)
         AS mae_cents,
       CAST(SUM(j.y - (md.m * j.x + md.b)) // COUNT(*) AS BIGINT)
         AS bias_cents
FROM j JOIN model md ON j.o_orderpriority = md.o_orderpriority
GROUP BY j.o_orderpriority
"""
