"""Event-stream operators over the ``events`` table (SURVEY.md §2.B
X11-X13 + the §2.A dashboard query parity surface I2-I6).

Timestamps are processed in UTC (session-level setting) so event-time
semantics are identical on any cluster and match the DuckDB oracle.
Gap comparisons use integer epoch-micros — no float time math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.oracle_sql import sql_davg
from ..functions.stable import SCALE as UNIT_SCALE
from ..functions.stable import _units as to_units
from ..functions.stable import davg
from ..sources.tables import load_table

ORACLES: dict[str, str] = {}

SESSION_GAP_MICROS = 30 * 60 * 1_000_000  # 30 minutes


# --- §2.A dashboard parity (I2-I6) ------------------------------------------

def q_status_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I2: substring-containment counters in one aggregation (reference
    app/dashboard.py:29-32 counts statuses via str.contains)."""
    df = load_table(spark, sf_dir, "events")
    return df.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.col("event_type").contains("error").cast("int")).alias("n_error"),
        F.sum(F.col("event_type").contains("click").cast("int")).alias("n_click"),
        F.sum((F.col("event_type") == "purchase").cast("int")).alias("n_purchase"),
    )


ORACLES["status_metrics"] = """
SELECT COUNT(*) AS total,
       CAST(SUM(CASE WHEN event_type LIKE '%error%' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       CAST(SUM(CASE WHEN event_type LIKE '%click%' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase
FROM events
"""


def q_distinct_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I4: sorted distinct values (filter-dropdown query)."""
    df = load_table(spark, sf_dir, "events")
    return df.select("event_type").distinct().orderBy("event_type")


ORACLES["distinct_event_types"] = (
    "SELECT DISTINCT event_type FROM events ORDER BY event_type"
)


def q_recent_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I3+I5: equality filter + newest-first sort + limit, with a
    deterministic tiebreak so the top-100 set is engine-stable."""
    df = load_table(spark, sf_dir, "events")
    return (
        df.filter(F.col("event_type") == "error")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .select("event_id", "ts", "user_id", "value")
        .limit(100)
    )


ORACLES["recent_errors"] = """
SELECT event_id, ts, user_id, value
FROM events WHERE event_type = 'error'
ORDER BY ts DESC, event_id DESC LIMIT 100
"""


def q_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I6: point lookup by id — the pushed-down filter reaches the parquet
    scan (min/max row-group pruning at scale)."""
    df = load_table(spark, sf_dir, "events")
    return df.filter(F.col("event_id") == 42)


ORACLES["point_lookup"] = "SELECT * FROM events WHERE event_id = 42"


# --- X11: JSON extraction ----------------------------------------------------

def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X11: pull a typed value out of the JSON ``props`` payload and
    aggregate per type.  get_json_object is JVM-side (Jackson) — no UDF."""
    df = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").try_cast("bigint")
    return (
        df.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


ORACLES["json_extract"] = """
SELECT event_type,
       COUNT(k) AS n_with_k,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       MIN(k) AS min_k,
       MAX(k) AS max_k
FROM (SELECT event_type, TRY_CAST(props->>'$.k' AS BIGINT) AS k FROM events)
GROUP BY event_type
"""


# --- X12: tumbling event-time windows ---------------------------------------

def q_hourly_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12: tumbling 1-hour event-time aggregation.  ``F.window`` aligns to
    epoch-hour boundaries in UTC == date_trunc('hour').  Same code shape
    works under Structured Streaming with a watermark (see streaming/)."""
    df = load_table(spark, sf_dir, "events")
    return (
        df.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            davg(F.col("value")).alias("avg_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "avg_value")
    )


ORACLES["hourly_windows"] = f"""
SELECT date_trunc('hour', ts) AS window_start,
       COUNT(*) AS n_events,
       {sql_davg('value')} AS avg_value
FROM events GROUP BY date_trunc('hour', ts)
"""


# --- X13: gap-based sessionization ------------------------------------------

def _sessionize(df: DataFrame) -> DataFrame:
    """The ONE gap-sessionize -> per-session rollup dataflow, shared by
    the shuffle-planned and bucketed variants so their shared-oracle
    claim is structural: lag + cumulative sum of session-start flags
    over (ts, event_id) within user_id, gap compare in integer
    epoch-micros, then the per-(user, session) rollup."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros(F.col("ts"))
    prev_us = F.lag(ts_us).over(w)
    new_session = (
        prev_us.isNull() | ((ts_us - prev_us) > SESSION_GAP_MICROS)
    ).cast("int")
    with_session = df.select(
        "user_id", "event_id", "ts",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("session_id"),
    )
    return with_session.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X13: classic gap-based sessionization — lag + cumulative sum of
    session-start flags, then per-session rollup.  One shuffle on user_id;
    the window sort is per-user (bounded), so this scales horizontally with
    users.  Gap compare in integer epoch-micros."""
    return _sessionize(load_table(spark, sf_dir, "events"))


ORACLES["sessionization"] = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {SESSION_GAP_MICROS}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       COUNT(*) AS n_events,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end
FROM sessions GROUP BY user_id, session_id
"""


# --- As-of join: last-touch attribution -------------------------------------

def q_attribution_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join — for every purchase, the most recent click by the same
    user at-or-before it (last-touch attribution).  Spark has no native
    as-of join; the scalable composition is one tagged union + one
    ordered window carrying the last-seen click forward (``last`` with
    ignorenulls), so the cost is a single shuffle on user_id with a
    per-user sort — never the purchases x clicks join explosion.

    Deterministic total order (ts, event_id) makes the picked click
    engine-stable even under timestamp ties."""
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "user_id", "event_id", "ts", "event_type",
        F.when(F.col("event_type") == "click", F.col("ts")).alias("click_ts"),
        F.when(F.col("event_type") == "click", F.col("event_id")).alias("click_id"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.select(
        "user_id", "event_id", "ts", "event_type",
        F.last("click_ts", ignorenulls=True).over(w).alias("attr_click_ts"),
        F.last("click_id", ignorenulls=True).over(w).alias("attr_click_id"),
    )
    return (
        carried.filter(F.col("event_type") == "purchase")
        .filter(F.col("attr_click_id").isNotNull())
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "attr_click_id",
            "attr_click_ts",
            (F.unix_micros(F.col("ts"))
             - F.unix_micros(F.col("attr_click_ts"))).alias("gap_us"),
        )
    )


ORACLES["attribution_asof"] = """
WITH tagged AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN event_type = 'click' THEN ts END AS click_ts,
         CASE WHEN event_type = 'click' THEN event_id END AS click_id
  FROM events WHERE event_type IN ('click', 'purchase')
), carried AS (
  SELECT user_id, event_id, ts, event_type,
         LAST_VALUE(click_ts IGNORE NULLS) OVER w AS attr_click_ts,
         LAST_VALUE(click_id IGNORE NULLS) OVER w AS attr_click_id
  FROM tagged
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
       attr_click_id, attr_click_ts,
       epoch_us(ts) - epoch_us(attr_click_ts) AS gap_us
FROM carried
WHERE event_type = 'purchase' AND attr_click_id IS NOT NULL
"""


# --- X12b: sliding event-time windows ---------------------------------------

def q_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12: sliding 2-hour window, 1-hour slide.  Each event lands in
    exactly two windows; ``F.window`` materializes the assignment as a
    generated array (no self-join, no double scan).  The oracle makes the
    two alignments explicit: every event contributes to the hour it falls
    in and the hour before.  Same code shape streams with a watermark.
    """
    df = load_table(spark, sf_dir, "events")
    return (
        df.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            davg(F.col("value")).alias("avg_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "avg_value")
    )


ORACLES["sliding_windows"] = f"""
WITH assigned AS (
  SELECT date_trunc('hour', ts) AS window_start, value FROM events
  UNION ALL
  SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS window_start, value
  FROM events
)
SELECT window_start,
       COUNT(*) AS n_events,
       {sql_davg('value')} AS avg_value
FROM assigned GROUP BY window_start
"""


# --- X13b: multi-stage funnel ------------------------------------------------

def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-funnel analysis: view -> click -> purchase, stages ordered in
    event time per user (a click only counts after the user's first view,
    a purchase only after that first qualifying click).

    Scale shape: ONE shuffle.  The three stage timestamps are chained
    whole-partition window minimums over the same partitionBy(user_id) —
    each stage's conditional min may reference the previous stage's
    column, and because every window requires the identical distribution
    (and no ordering), Catalyst stacks all three Window operators behind
    a single exchange with no sorts.  The join formulation of the same
    funnel costs three grouped-min shuffles plus two joins.
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "click", "purchase"))
        .select("user_id", "ts", "event_type")
    )
    w = Window.partitionBy("user_id")
    fv = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    staged = ev.withColumn("fv", fv)
    fc = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") > F.col("fv")),
            F.col("ts"),
        )
    ).over(w)
    staged = staged.withColumn("fc", fc)
    fp = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("fc")),
            F.col("ts"),
        )
    ).over(w)
    staged = staged.withColumn("fp", fp)
    per_user = staged.select("user_id", "fv", "fc", "fp").distinct()
    return per_user.agg(
        F.count("fv").alias("n_view"),
        F.count("fc").alias("n_view_click"),
        F.count("fp").alias("n_full_funnel"),
    )


ORACLES["funnel_conversion"] = """
WITH views AS (
  SELECT user_id, MIN(ts) AS first_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
clicks AS (
  SELECT e.user_id, MIN(e.ts) AS first_click
  FROM events e JOIN views v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.first_view
  GROUP BY e.user_id
),
purchases AS (
  SELECT e.user_id, MIN(e.ts) AS first_purchase
  FROM events e JOIN clicks c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.first_click
  GROUP BY e.user_id
)
SELECT COUNT(v.first_view) AS n_view,
       COUNT(c.first_click) AS n_view_click,
       COUNT(p.first_purchase) AS n_full_funnel
FROM views v
LEFT JOIN clicks c ON v.user_id = c.user_id
LEFT JOIN purchases p ON v.user_id = p.user_id
"""


# --- X14b: time-RANGE window frame ------------------------------------------

def q_user_rolling_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame rolling aggregate: per user, events and exact-unit
    value in the trailing hour of EVENT TIME (RANGE BETWEEN 3600s
    PRECEDING AND CURRENT ROW over epoch seconds) — the time-based
    complement of the ROWS-frame query (rolling_order_totals).

    A RANGE frame is keyed by the ORDER BY value, not row position, so
    ties share a frame and gaps shrink it — semantics a ROWS frame cannot
    express.  One shuffle on user_id; per-user sort bounded by that
    user's events.  Value sums run in integer units (associative —
    engine-order-proof).
    """
    df = load_table(spark, sf_dir, "events")
    epoch = F.col("ts").cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch)
        .rangeBetween(-3600, Window.currentRow)
    )
    units = F.sum(to_units(F.coalesce(F.col("value"), F.lit(0.0)))).over(w)
    return df.select(
        "user_id", "event_id", epoch.alias("epoch_s"),
        F.count(F.lit(1)).over(w).alias("n_trailing_hour"),
        (units.cast("double") / F.lit(UNIT_SCALE)).alias("value_trailing_hour"),
    )


ORACLES["user_rolling_hour"] = """
SELECT user_id, event_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS epoch_s,
       COUNT(*) OVER w AS n_trailing_hour,
       CAST(SUM(CAST(FLOOR(COALESCE(value, 0.0) * 10000.0 + 0.5) AS BIGINT)) OVER w
            AS DOUBLE) / 10000.0 AS value_trailing_hour
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
"""


# --- skew-safe aggregation on a manufactured hot key ------------------------

def q_salted_hot_key_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level SALTED aggregation over a deliberately hot-keyed stream:
    ~70% of all events share one key (``pmod(event_id, 10) < 7`` ->
    'hot'), the long tail spreads over 100 user buckets — the classic
    power-law shape that makes a naive groupBy put most of a 100 TB table
    into ONE reducer task.

    ``functions/skew.py::salted_agg`` spreads every key over 16
    deterministic salts (stage 1: partial count + exact unit-sum per
    (key, salt)), then merges the ≤16 partial rows per key (stage 2, a
    shuffle over keys x salts rows only).  The result is identical to the
    direct groupBy — the oracle is the UNsalted SQL — but the largest
    stage-1 task is 1/16th of the hot key, not all of it.  Sums are
    quantized units (``functions/stable.py``) so the two-level summation
    order cannot change a single bit of the result.
    """
    from ..functions.skew import salted_agg

    df = load_table(spark, sf_dir, "events")
    key = F.when(
        F.pmod(F.col("event_id"), F.lit(10)) < 7, F.lit("hot")
    ).otherwise(
        F.concat(F.lit("u"), F.pmod(F.col("user_id"), F.lit(100)).cast("string"))
    )
    keyed = df.select(
        key.alias("agg_key"),
        to_units(F.coalesce(F.col("value"), F.lit(0.0))).alias("_units"),
    )
    return salted_agg(
        keyed,
        keys=["agg_key"],
        partial_aggs={
            "_n": F.count(F.lit(1)),
            "_s": F.sum("_units"),
        },
        merge_aggs={
            "n_events": F.sum("_n"),
            "total_value": F.sum("_s").cast("double") / F.lit(UNIT_SCALE),
        },
    )


ORACLES["salted_hot_key_agg"] = """
SELECT CASE WHEN event_id % 10 < 7 THEN 'hot'
            ELSE 'u' || CAST(user_id % 100 AS VARCHAR) END AS agg_key,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(COALESCE(value, 0.0) * 10000.0 + 0.5) AS BIGINT))
            AS DOUBLE) / 10000.0 AS total_value
FROM events
GROUP BY 1
"""


# --- skew-safe JOIN on the same manufactured hot key -------------------------

def q_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SALTED equi-join over the same hot-keyed stream as
    ``q_salted_hot_key_agg`` — the other half of ``functions/skew.py``
    (``with_salt`` + ``explode_salts``), which until r14 had no declared
    query exercising it: each event joins its key's profile row (first
    event id + key cardinality, derived from the stream itself — the
    reference-profile enrichment shape), with ~70% of all rows sharing
    ONE join key.

    A naive shuffle join puts every 'hot' row into a single reducer —
    the 100 TB straggler.  AQE's skew-split is the first-line fix but is
    ineligible in several real shapes (bucketed/co-partitioned scans,
    plans that must preserve partitioning for a downstream window, and
    shuffles shared by multiple consumers — measured on THIS shape:
    with skew thresholds forced down to 8KB/factor-2, the executed
    adaptive plan shows only ``AQEShuffleRead coalesced``, no skew
    split, because the probe-side exchange is co-consumed by the dim
    aggregate); salting is the deterministic fallback: the big side salts into
    SALT_N deterministic buckets (hash-derived, retry-safe), the small
    side replicates once per salt, and the join key becomes (key, _salt)
    — the hot key's rows spread over SALT_N tasks by construction.  The
    ``merge`` hint pins the SortMergeJoin so the measured plan is the
    at-scale path (a profile dimension with billions of user rows does
    not broadcast), not a test-SF broadcast.

    The salt changes the PLAN, never the values: the verification
    aggregate (per-key event count, the key's profile attributes passed
    through the join, exact unit sums) hash-matches the unsalted oracle
    SQL."""
    from ..functions.skew import explode_salts, with_salt

    df = load_table(spark, sf_dir, "events")
    key = F.when(
        F.pmod(F.col("event_id"), F.lit(10)) < 7, F.lit("hot")
    ).otherwise(
        F.concat(F.lit("u"), F.pmod(F.col("user_id"), F.lit(100)).cast("string"))
    )
    keyed = df.select(
        key.alias("agg_key"),
        "event_id",
        to_units(F.coalesce(F.col("value"), F.lit(0.0))).alias("units"),
    )
    dim = keyed.groupBy("agg_key").agg(
        F.min("event_id").alias("first_event"),
        F.count(F.lit(1)).alias("key_n"),
    )
    joined = with_salt(keyed).join(
        explode_salts(dim).hint("merge"), ["agg_key", "_salt"]
    )
    return joined.groupBy("agg_key").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.min("first_event").alias("first_event"),
        F.min("key_n").alias("key_n"),
        (F.sum("units").cast("double") / F.lit(UNIT_SCALE)).alias("total_value"),
    )


ORACLES["salted_skew_join"] = """
WITH keyed AS (
  SELECT CASE WHEN event_id % 10 < 7 THEN 'hot'
              ELSE 'u' || CAST(user_id % 100 AS VARCHAR) END AS agg_key,
         event_id,
         CAST(FLOOR(COALESCE(value, 0.0) * 10000.0 + 0.5) AS BIGINT) AS units
  FROM events
),
dim AS (
  SELECT agg_key, MIN(event_id) AS first_event, COUNT(*) AS key_n
  FROM keyed GROUP BY agg_key
)
SELECT k.agg_key,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(d.first_event) AS first_event,
       MIN(d.key_n) AS key_n,
       CAST(SUM(k.units) AS DOUBLE) / 10000.0 AS total_value
FROM keyed k JOIN dim d ON k.agg_key = d.agg_key
GROUP BY k.agg_key
"""


# --- z-score anomaly profile -------------------------------------------------

ZSCORE_CUTOFF = 3.0


def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type anomaly profile: count of events whose value is
    more than 3 sigma from the type mean — streaming-DQ's batch twin.

    ONE shuffle total: a whole-partition window (partitionBy event_type,
    no ordering — no sort) attaches each type's exact unit-sums to every
    row, the z-flag is a codegen'd comparison, and the same-key final
    aggregation reuses the window's hash partitioning (Exchange reuse:
    the second agg shuffles nothing new).  Mean/std use the quantized
    stable formulas so the flag boundary is engine-exact.
    """
    df = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("event_type")
    units = to_units(F.col("value"))
    s1 = F.sum(units).over(w).cast("double") / F.lit(UNIT_SCALE)
    s2 = (
        F.sum(units.cast("decimal(38,0)") * units.cast("decimal(38,0)")).over(w)
        .cast("double") / F.lit(UNIT_SCALE * UNIT_SCALE)
    )
    n = F.count(F.lit(1)).over(w)
    mean = s1 / n
    std = F.sqrt((s2 - s1 * s1 / n) / (n - F.lit(1)))
    z = (F.col("value") - mean) / std
    flagged = df.select(
        "event_type",
        (F.abs(z) > ZSCORE_CUTOFF).cast("int").alias("is_anomaly"),
    )
    return flagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("is_anomaly").cast("bigint").alias("n_anomalies"),
    )


ORACLES["anomaly_zscore"] = f"""
WITH stats AS (
  SELECT event_type, value,
         CAST(SUM(CAST(FLOOR(value * 10000.0 + 0.5) AS BIGINT)) OVER w AS DOUBLE)
           / 10000.0 AS s1,
         CAST(SUM(CAST(FLOOR(value * 10000.0 + 0.5) AS HUGEINT)
                  * CAST(FLOOR(value * 10000.0 + 0.5) AS HUGEINT)) OVER w AS DOUBLE)
           / 100000000.0 AS s2,
         COUNT(*) OVER w AS n
  FROM events WHERE value IS NOT NULL
  WINDOW w AS (PARTITION BY event_type)
)
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN ABS((value - s1 / n)
                 / SQRT((s2 - s1 * s1 / n) / (n - 1))) > {ZSCORE_CUTOFF}
            THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
FROM stats GROUP BY event_type
"""


# --- cohort retention --------------------------------------------------------

def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by their FIRST activity week
    (cohort), counted distinct per subsequent activity week — the
    warehouse query behind every retention curve.

    Two aggregations, both keyed on user_id first: the cohort assignment
    is a per-user min (one shuffle), the retention matrix a distinct
    count over (cohort_week, activity_week) pairs whose input is already
    one row per (user, week).  Weeks via date_trunc in UTC — identical
    bucketing in both engines."""
    df = load_table(spark, sf_dir, "events")
    user_weeks = df.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    cohorts = user_weeks.groupBy("user_id").agg(
        F.min("week").alias("cohort_week")
    )
    return (
        user_weeks.join(cohorts, "user_id")
        .groupBy("cohort_week", F.col("week").alias("activity_week"))
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


ORACLES["cohort_retention"] = """
WITH user_weeks AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
  FROM events
), cohorts AS (
  SELECT user_id, MIN(week) AS cohort_week FROM user_weeks GROUP BY user_id
)
SELECT c.cohort_week, u.week AS activity_week,
       COUNT(DISTINCT u.user_id) AS n_users
FROM user_weeks u JOIN cohorts c ON u.user_id = c.user_id
GROUP BY c.cohort_week, u.week
"""


# --- out-of-order arrival profile --------------------------------------------

def q_late_data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type out-of-order fraction: how many events carry a timestamp
    EARLIER than an event already seen for the same user (arrival order =
    event_id) — the measurement that sizes a streaming watermark.

    One window shuffle on (event_type): running max of ts over arrival
    order per (type, user) flags stragglers, then the same-key
    aggregation reuses the window's partitioning.  Integer epoch-micros
    comparisons only."""
    df = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type", "user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ts_us = F.unix_micros(F.col("ts"))
    max_seen = F.max(ts_us).over(w)
    late = (max_seen.isNotNull() & (ts_us < max_seen)).cast("int")
    flagged = df.select("event_type", late.alias("is_late"))
    return flagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("is_late").cast("bigint").alias("n_late"),
        (F.sum("is_late").cast("double") / F.count(F.lit(1))).alias("late_fraction"),
    )


ORACLES["late_data_profile"] = """
WITH flagged AS (
  SELECT event_type,
         CASE WHEN MAX(epoch_us(ts)) OVER (
                PARTITION BY event_type, user_id ORDER BY event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              ) > epoch_us(ts) THEN 1 ELSE 0 END AS is_late
  FROM events
)
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(is_late) AS BIGINT) AS n_late,
       CAST(SUM(is_late) AS DOUBLE) / COUNT(*) AS late_fraction
FROM flagged GROUP BY event_type
"""


# --- binned range join (temporal neighborhood) -------------------------------

NEIGHBOR_WINDOW_SEC = 300  # +-5 minutes


def q_error_context_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal-neighborhood range join: for every error event, count the
    click/view events by the same user within +-5 minutes — the "what was
    the user doing when it broke" query.  A big-to-big NON-EQUI join that
    naive engines plan as a nested-loop scan.

    Scale plan — the canonical BINNED range join: bucket time into
    window-sized bins; the error side expands to its 3 candidate bins
    (b-1, b, b+1), the context side keeps its single home bin, and the
    join becomes an EQUI join on (user_id, bin) followed by the exact
    |dt| <= window filter.  Every qualifying pair meets in exactly one
    bin (the context event's home bin), so no dedup is needed.  Shuffle
    cost is 3x one side's keys — linear, not quadratic; bin width = the
    range predicate's span keeps candidate fan-in minimal.  Integer
    epoch-micros only."""
    df = load_table(spark, sf_dir, "events")
    win_us = NEIGHBOR_WINDOW_SEC * 1_000_000
    ts_us = F.unix_micros(F.col("ts"))
    errors = df.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", ts_us.alias("err_us"),
        F.floor(ts_us / win_us).alias("bin"),
    )
    errors3 = errors.select(
        "event_id", "user_id", "err_us",
        F.explode(
            F.array(F.col("bin") - 1, F.col("bin"), F.col("bin") + 1)
        ).alias("bin"),
    )
    context = df.filter(F.col("event_type").isin("click", "view")).select(
        "user_id", ts_us.alias("ctx_us"),
        F.floor(ts_us / win_us).alias("bin"),
    )
    pairs = errors3.join(context, ["user_id", "bin"]).filter(
        F.abs(F.col("ctx_us") - F.col("err_us")) <= win_us
    )
    return (
        pairs.groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("n_context"))
    )


ORACLES["error_context_join"] = f"""
SELECT e.event_id, COUNT(*) AS n_context
FROM events e JOIN events c
  ON c.user_id = e.user_id
 AND c.event_type IN ('click', 'view')
 AND ABS(epoch_us(c.ts) - epoch_us(e.ts)) <= {NEIGHBOR_WINDOW_SEC * 1_000_000}
WHERE e.event_type = 'error'
GROUP BY e.event_id
"""


# --- gaps-and-islands: per-user activity streaks -----------------------------

def q_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user consecutive-active-day streaks (gaps-and-islands).

    Single-shuffle shape: ``groupBy(user)`` collects each user's distinct
    active days into one bounded array (cardinality is capped by the
    calendar span, not the event volume — at 100 TB a user still has at
    most a few thousand days), and every later stage — posexplode, the
    lag/cumsum island windows, the per-island and per-user re-aggregations
    — reuses that same hash(user) partitioning, so Catalyst inserts no
    further exchange: grouping keys (user, island) are a superset of the
    existing partitioning and windows are partitioned by user.

    Island id = running count of day-gaps > 1 within the user's ordered
    day sequence; streak length = island row count.
    """
    df = load_table(spark, sf_dir, "events")
    days = (
        df.select("user_id", F.to_date("ts").alias("day"))
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_set("day")).alias("days"))
    )
    d = days.select("user_id", F.posexplode("days").alias("pos", "day"))
    w = Window.partitionBy("user_id").orderBy("pos")
    gap_flag = F.when(
        F.datediff(F.col("day"), F.lag("day").over(w)) > 1, 1
    ).otherwise(0)
    islands = (
        d.withColumn("island", F.sum(gap_flag).over(w))
        .groupBy("user_id", "island")
        .agg(F.count(F.lit(1)).alias("streak_len"))
    )
    return islands.groupBy("user_id").agg(
        F.sum("streak_len").cast("bigint").alias("n_active_days"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("streak_len").alias("longest_streak"),
    )


ORACLES["activity_streaks"] = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
flagged AS (
  SELECT user_id, day,
         CASE WHEN date_diff('day',
                             LAG(day) OVER (PARTITION BY user_id ORDER BY day),
                             day) > 1
              THEN 1 ELSE 0 END AS gap_flag
  FROM days
),
islands AS (
  SELECT user_id, day,
         SUM(gap_flag) OVER (
           PARTITION BY user_id ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged
),
streaks AS (
  SELECT user_id, island, COUNT(*) AS streak_len
  FROM islands GROUP BY user_id, island
)
SELECT user_id,
       CAST(SUM(streak_len) AS BIGINT) AS n_active_days,
       COUNT(*) AS n_streaks,
       MAX(streak_len) AS longest_streak
FROM streaks GROUP BY user_id
"""


# --- sweep line: peak concurrent sessions per day ----------------------------

def q_session_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak number of concurrently-open sessions per day (sweep line over
    the gap-based session intervals of ``q_sessionization``).

    Distributed prefix-sum shape: each session emits +1 at its start and
    -1 at its (exclusive) end; the running sum is computed in TWO levels
    — a per-day partitioned window (parallel across days) plus a carry-in
    of prior-day net totals (a window over the tiny distinct-day
    relation) — instead of one global ordered window, which would funnel
    every delta through a single partition at 100 TB.  Peak per day =
    carry + max(within-day running).

    Determinism: deltas order by (ts, delta) so ends sort before starts
    at the same instant (touching sessions never overlap, zero-length
    sessions never count), and within equal (ts, delta) groups the
    running-sum multiset — hence its max — is order-invariant.
    """
    sess = q_sessionization(spark, sf_dir)
    starts = sess.select(
        F.to_date("session_start").alias("day"),
        F.col("session_start").alias("ts"),
        F.lit(1).alias("delta"),
    )
    ends = sess.select(
        F.to_date("session_end").alias("day"),
        F.col("session_end").alias("ts"),
        F.lit(-1).alias("delta"),
    )
    ev = starts.union(ends)
    w_run = (
        Window.partitionBy("day")
        .orderBy("ts", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    per_day = (
        ev.withColumn("running", F.sum("delta").over(w_run))
        .groupBy("day")
        .agg(
            F.max("running").alias("day_peak"),
            F.sum("delta").alias("day_delta"),
            F.count_if(F.col("delta") == 1).alias("n_starts"),
            F.count_if(F.col("delta") == -1).alias("n_ends"),
        )
    )
    w_carry = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    carry = F.coalesce(F.sum("day_delta").over(w_carry), F.lit(0))
    return per_day.select(
        "day",
        (carry + F.col("day_peak")).cast("bigint").alias("peak_concurrent"),
        "n_starts",
        "n_ends",
    )


ORACLES["session_concurrency"] = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {SESSION_GAP_MICROS}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, session_id, MIN(ts) AS session_start, MAX(ts) AS session_end
  FROM (
    SELECT user_id, ts,
           SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS session_id
    FROM flagged
  ) GROUP BY user_id, session_id
),
deltas AS (
  SELECT CAST(session_start AS DATE) AS day, session_start AS ts, 1 AS delta
  FROM sessions
  UNION ALL
  SELECT CAST(session_end AS DATE) AS day, session_end AS ts, -1 AS delta
  FROM sessions
),
run AS (
  SELECT day, delta,
         SUM(delta) OVER (ORDER BY ts, delta ROWS UNBOUNDED PRECEDING) AS running
  FROM deltas
)
SELECT day,
       CAST(MAX(running) AS BIGINT) AS peak_concurrent,
       COUNT(*) FILTER (WHERE delta = 1) AS n_starts,
       COUNT(*) FILTER (WHERE delta = -1) AS n_ends
FROM run GROUP BY day
"""


# --- X40: time-series regularization (hourly gap-fill + LOCF) ----------------

def q_event_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user REGULAR hourly series over each user's active span, with
    forward-fill: hours with no events get n_events = 0 and carry the
    last observed hourly value (LOCF) — the time-series regularization
    every downstream feature/monitoring job wants (feature stores train
    on dense grids, not event streams).

    Per (user, hour): n_events and the LAST event's value (ordered by
    (ts, event_id) — a total order, so "last" is engine-independent) in
    exact 1e-4 integer units.  The grid is each user's [min hour, max
    hour] span, so the first grid row always has an observation and the
    fill never sees a leading NULL.

    The per-hour "last" is ``max_by(units, struct(ts, event_id))`` IN
    the (user, hour) aggregate itself — struct comparison is
    lexicographic by field order, the same total order the oracle's
    ROW_NUMBER ranks by — so the rank-then-aggregate window pass the r13
    shape paid is gone: one shuffle stage fewer, value-identical (r13
    verdict item #7).

    Scale shape: one (user, hour) aggregate (map-side combined — max_by
    partials merge associatively, unlike a rank), a tiny per-user bounds
    agg whose `sequence()` explode is generated map-side, one keyed left
    join grid<-hourly, and ONE per-user window for the fill — nothing
    shuffles wider than user_id, and each user's state is bounded by
    their span, not the corpus."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "ts",
        "event_id",
        to_units(F.coalesce(F.col("value"), F.lit(0.0))).alias("units"),
    )
    hourly = ev.groupBy("user_id", "hour").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max_by("units", F.struct("ts", "event_id")).alias("last_units"),
    )
    grid = (
        hourly.groupBy("user_id")
        .agg(F.min("hour").alias("h0"), F.max("hour").alias("h1"))
        .select(
            "user_id",
            F.explode(
                F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour"),
        )
    )
    wfill = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["user_id", "hour"], "left")
        .select(
            "user_id",
            "hour",
            F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
            F.last("last_units", ignorenulls=True)
            .over(wfill)
            .cast("bigint")
            .alias("filled_units"),
        )
    )


ORACLES["event_gap_fill"] = """
WITH hourly AS (
  SELECT user_id, hour,
         COUNT(*) AS n_events,
         MAX(CASE WHEN rn = 1 THEN units END) AS last_units
  FROM (
    SELECT user_id, ts, date_trunc('hour', ts) AS hour,
           CAST(FLOOR(COALESCE(value, 0.0) * 10000.0 + 0.5) AS BIGINT)
             AS units,
           ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
  )
  GROUP BY user_id, hour
),
grid AS (
  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
  FROM (SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1
        FROM hourly GROUP BY user_id)
)
SELECT g.user_id, g.hour,
       CAST(COALESCE(h.n_events, 0) AS BIGINT) AS n_events,
       CAST(LAST_VALUE(h.last_units IGNORE NULLS) OVER (
           PARTITION BY g.user_id ORDER BY g.hour
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS filled_units
FROM grid g LEFT JOIN hourly h USING (user_id, hour)
"""


def q_bucketed_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``q_sessionization`` from a BUCKETED events copy — the layout's
    third payoff class after joins (X38) and aggregates
    (streaming_bucketed_ingest): WINDOW functions.  With events stored
    hash-bucketed on user_id, the per-user lag/cumsum window's
    ClusteredDistribution is already satisfied by the scan, and the
    downstream (user_id, session_id) rollup rides the same partitioning
    (user_id is a subset of its grouping keys) — the whole sessionize ->
    rollup pipeline plans with ZERO exchanges (pinned).  What remains is
    the per-user (ts, event_id) in-task sort the window needs anyway;
    nothing moves across the cluster.

    At 100 TB this is why an event warehouse buckets on user/entity id:
    every sessionization, funnel, attribution and rolling-window job —
    the entire X13/X14 family — runs shuffle-free off the stored layout,
    paying only bounded per-user sorts.  Identical arithmetic, so it
    shares sessionization's oracle."""
    from ..sources.index_store import ensure_bucketed_table

    e_tbl = ensure_bucketed_table(spark, sf_dir, "events", "user_id")
    return _sessionize(spark.table(e_tbl))


ORACLES["bucketed_sessionization"] = ORACLES["sessionization"]
