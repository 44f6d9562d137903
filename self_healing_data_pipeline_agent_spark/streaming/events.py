"""Structured Streaming over the events table (SURVEY.md §2.B X17):
file-source stream -> event-time tumbling windows with a watermark ->
append-mode sink.

Semantics under test: with a 2-hour watermark in append mode, only windows
whose end <= (max event time - 2h) are emitted — the late-data policy.  The
batch oracle applies the same cutoff analytically, so the streaming result
is *exactly* checkable against DuckDB (a strong batch-stream equivalence
check, not just rows-only).

Scale shape: the same plan runs unchanged against a real stream (Kafka /
files landing in object storage); state is per-window partial counts,
bounded by the watermark horizon; ``availableNow`` gives batch-like
backfill runs.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
    TimestampNTZType, TimestampType,
)

from ..sources.tables import events_ts_info

ORACLES: dict[str, str] = {}

WATERMARK = "2 hours"

# Temp dirs that must OUTLIVE the creating function (lazy DataFrames read
# them later) but not the process: profile-table snapshots and staged
# stream copies.  Registered for interpreter-exit cleanup so repeated
# parity sessions do not accumulate events-table copies in /tmp
# (r6 review finding).
_TMPDIRS: list[str] = []


def _session_tmpdir(prefix: str) -> str:
    import atexit
    import shutil

    d = tempfile.mkdtemp(prefix=prefix)
    if not _TMPDIRS:
        atexit.register(
            lambda: [shutil.rmtree(p, ignore_errors=True) for p in _TMPDIRS]
        )
    _TMPDIRS.append(d)
    return d


def _events_schema(ts_type) -> StructType:
    return StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", ts_type),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


def read_events_stream(
    spark: SparkSession,
    sf_dir: str,
    replay: bool = False,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source readStream over the events table with ``ts`` normalized
    to the session TIMESTAMP type — the streaming twin of
    ``sources.tables.load_table``, sharing its footer probe so batch and
    stream can never disagree on the timestamp unit (the r3 failure mode:
    the testdata migrated TIMESTAMP(NANOS)->TIMESTAMP(MICROS) and a
    hardcoded nanos reader compressed event time 1000x, silently breaking
    every watermark/window/interval-join downstream).

    readStream requires a declared schema AND a directory source; the
    single-file table is exposed through a symlinked staging dir (a real
    deployment streams a landing directory anyway).  ``replay=True``
    symlinks the file twice — the at-least-once redelivery shape used by
    the streaming-dedup check.  ``max_files_per_trigger`` splits the
    staged files across micro-batches (availableNow honors it), for
    checks that need MULTIPLE batches rather than one big one.
    """
    unit, tz_adjusted = events_ts_info(sf_dir)
    staging = _session_tmpdir("events_stream_")
    (Path(staging) / "events.parquet").symlink_to(Path(sf_dir) / "events.parquet")
    if replay:
        (Path(staging) / "events_replay.parquet").symlink_to(
            Path(sf_dir) / "events.parquet"
        )
    def _reader(schema):
        r = spark.readStream.schema(schema)
        if max_files_per_trigger:
            r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
        return r

    if unit == "ns":
        # INT64 nanos: surfaced as long via the nanosAsLong conf that
        # session.get_spark pins at build time; guard loudly on a foreign
        # session rather than mutating confs as a side effect.
        if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") != "true":
            raise RuntimeError(
                "events.parquet carries TIMESTAMP(NANOS): streaming it "
                "requires spark.sql.legacy.parquet.nanosAsLong=true "
                "(use session.get_spark, which pins it)"
            )
        return (
            _reader(_events_schema(LongType()))
            .parquet(staging)
            .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        )
    # MICROS: the declared schema must match the file's physical variant —
    # NTZ files are TimestampNTZType, UTC-adjusted files (timestamp[us,
    # tz=UTC]) are TimestampType.  Batch load_table absorbs the difference
    # via schema inference; a declared streaming schema cannot, so pick by
    # the probe's tz flag (a mismatched drop previously would have made
    # batch succeed while streaming misread).  The cast to the session
    # TIMESTAMP type is bit-identical under the pinned UTC zone either way.
    ts_type = TimestampType() if tz_adjusted else TimestampNTZType()
    return (
        _reader(_events_schema(ts_type))
        .parquet(staging)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )


def streaming_hourly_counts(
    spark: SparkSession, sf_dir: str, watermark: str = WATERMARK
) -> DataFrame:
    """Run the watermarked hourly-count stream to completion
    (``availableNow``) and return the appended result."""
    stream = read_events_stream(spark, sf_dir)
    windowed = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )
    name = f"hourly_counts_{uuid.uuid4().hex[:8]}"
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            windowed.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def q_streaming_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return streaming_hourly_counts(spark, sf_dir)


# Batch twin: append mode emits exactly the windows whose end has passed
# the final watermark (max event time - 2h).
ORACLES["streaming_hourly_counts"] = """
WITH horizon AS (SELECT MAX(ts) - INTERVAL 2 HOUR AS wm FROM events)
SELECT date_trunc('hour', ts) AS window_start, COUNT(*) AS n_events
FROM events, horizon
GROUP BY date_trunc('hour', ts), wm
HAVING date_trunc('hour', ts) + INTERVAL 1 HOUR <= wm
"""


# --- Custom stateful operator: gap-based session tracker --------------------

SESSION_GAP_MICROS = 30 * 60 * 1_000_000  # 30 minutes, matches batch X13

_SESSION_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampNTZType()),
        StructField("session_end", TimestampNTZType()),
        StructField("n_events", LongType()),
    ]
)

# per-user open-session state: (start_us, last_us, n_events)
_SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
    ]
)


def _fold_sessions(ts_us_sorted, prev):
    """Pure gap-sessionizer fold, shared by BOTH arbitrary-state APIs.

    ``prev`` is the open tail session ``(start_us, last_us, n)`` or None;
    returns ``(closed_sessions, new_open_tail)``.  O(1) state per key
    regardless of history length — the shape that scales to billions of
    users under a RocksDB state store.
    """
    rows = []
    if prev is not None:
        start_us, last_us, n = prev
    else:
        start_us = last_us = -1
        n = 0
    for t in ts_us_sorted:
        t = int(t)
        if start_us < 0:
            start_us, last_us, n = t, t, 1
        elif t - last_us > SESSION_GAP_MICROS:
            rows.append((start_us, last_us, n))
            start_us, last_us, n = t, t, 1
        else:
            last_us, n = t, n + 1
    return rows, (start_us, last_us, n)


def _sessions_frame(uid: int, rows):
    import pandas as pd

    return pd.DataFrame(
        {
            "user_id": [uid] * len(rows),
            "session_start": [pd.Timestamp(r[0], unit="us") for r in rows],
            "session_end": [pd.Timestamp(r[1], unit="us") for r in rows],
            "n_events": [r[2] for r in rows],
        }
    )


def _track_sessions(key, pdf_iter, state):
    """applyInPandasWithState kernel: per-user gap sessionizer.

    State carries the still-open tail session across micro-batches; each
    batch's events extend it or close it.  Closed sessions are emitted
    (append mode); the open tail stays in state — at stream end it is
    unreported, exactly like a live session that hasn't timed out yet.
    """
    import pandas as pd

    ev = pd.concat(list(pdf_iter), ignore_index=True)
    ev = ev.sort_values(["ts", "event_id"], kind="mergesort")
    # ts arrives pre-converted to epoch MICROS (unix_micros upstream) so
    # the kernel never depends on pandas' datetime64 resolution.
    rows, tail = _fold_sessions(
        ev["ts"].astype("int64"), state.get if state.exists else None
    )
    state.update(tail)
    yield _sessions_frame(int(key[0]), rows)


def stateful_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X17+: custom stateful streaming operator via applyInPandasWithState
    — the arbitrary-state API for operators Spark's built-ins can't
    express (session objects, not just windowed aggregates).

    Emits every session CLOSED by a later event within the stream; each
    user's final (still-open) session remains in state.  On this finite
    availableNow run that makes the result exactly batch-checkable: the
    oracle is batch sessionization minus each user's last session.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = read_events_stream(spark, sf_dir).select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts")
    )
    sessions = stream.groupBy("user_id").applyInPandasWithState(
        _track_sessions,
        outputStructType=_SESSION_OUT_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"stateful_sessions_{uuid.uuid4().hex[:8]}"
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            sessions.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def q_stateful_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stateful_sessions(spark, sf_dir)


# Batch twin: gap sessionization, excluding each user's LAST session (it
# is still open in operator state when the finite stream ends).
ORACLES["stateful_sessions"] = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {SESSION_GAP_MICROS}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
), rolled AS (
  SELECT user_id, session_id,
         MIN(ts) AS session_start,
         MAX(ts) AS session_end,
         COUNT(*) AS n_events,
         MAX(session_id) OVER (PARTITION BY user_id) AS last_session
  FROM numbered GROUP BY user_id, session_id
)
SELECT user_id, session_start, session_end, n_events
FROM rolled WHERE session_id < last_session
"""


def transform_with_state_available() -> bool:
    """``transformWithStateInPandas`` runs a protobuf-based state-server
    protocol between the JVM and the Python worker; without the protobuf
    package the worker crashes at startup.  Gate rather than crash.

    Environment probes (one per round, per the r12/r13 verdicts):
    ``google.protobuf`` absent through r16 (ModuleNotFoundError) — the
    TWS twin stays env-gated; kernel parity with the checked
    ``applyInPandasWithState`` variant is pinned below."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def stateful_sessions_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X17+: the SAME gap sessionizer on ``transformWithStateInPandas`` —
    Spark 4's arbitrary-state successor API: named typed state handles on
    a StatefulProcessor object, RocksDB-backed, with (unused here) timer
    and TTL support that ``applyInPandasWithState`` lacks.  Production
    would pick this API for new operators; keeping both variants green
    against ONE oracle pins that the two state APIs agree exactly.

    Requires the ``protobuf`` package (the API's Python<->JVM state
    protocol); registered as a query only where that dependency exists —
    this container lacks it, so the registered/oracle-checked sessionizer
    here is the ``applyInPandasWithState`` variant, and the two share the
    ``_fold_sessions`` kernel verbatim.
    """
    if not transform_with_state_available():
        raise ModuleNotFoundError(
            "transformWithStateInPandas needs the 'protobuf' package "
            "(google.protobuf) for its state-server protocol; use "
            "stateful_sessions (applyInPandasWithState, same kernel) here"
        )
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "open_session", _SESSION_STATE_SCHEMA
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            ev = pd.concat(list(rows), ignore_index=True)
            ev = ev.sort_values(["ts", "event_id"], kind="mergesort")
            prev = self._state.get() if self._state.exists() else None
            closed, tail = _fold_sessions(ev["ts"].astype("int64"), prev)
            self._state.update(tail)
            yield _sessions_frame(int(key[0]), closed)

        def close(self) -> None:
            pass

    # transformWithState requires the RocksDB state store — the provider
    # a real deployment runs anyway (incremental checkpoints, state far
    # beyond executor heap).
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    stream = read_events_stream(spark, sf_dir).select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts")
    )
    sessions = stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_SessionProcessor(),
        outputStructType=_SESSION_OUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
    name = f"stateful_sessions_tws_{uuid.uuid4().hex[:8]}"
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            sessions.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


# Register the query + oracle only where the API can actually run (the
# registry discovers q_-prefixed callables dynamically), so the declared
# correctness surface never contains an operator the environment cannot
# execute.  Same batch twin as the applyInPandasWithState variant: the
# two arbitrary-state APIs must produce identical sessions.
if transform_with_state_available():

    def q_stateful_sessions_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
        return stateful_sessions_tws(spark, sf_dir)

    ORACLES["stateful_sessions_tws"] = ORACLES["stateful_sessions"]


# --- Streaming DQ monitor ---------------------------------------------------

def streaming_dq_profile(
    spark: SparkSession, sf_dir: str, watermark: str = WATERMARK
) -> DataFrame:
    """The reference's DQ stats (row counts + null fractions,
    src/data_quality_checks.py) lifted onto the stream: per event-time
    hour, counts and per-column null fractions, emitted once the
    watermark closes the window.

    This is the 100 TB DQ deployment shape — quality metrics computed
    incrementally as data lands, not by rescanning the warehouse; state
    is one partial-agg row per open window."""
    stream = read_events_stream(spark, sf_dir)
    windowed = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.avg(F.col("value").isNull().cast("int")).alias("nf_value"),
            F.avg(F.col("props").isNull().cast("int")).alias("nf_props"),
        )
        .select(F.col("w.start").alias("window_start"),
                "n_events", "nf_value", "nf_props")
    )
    name = f"dq_profile_{uuid.uuid4().hex[:8]}"
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            windowed.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def q_streaming_dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return streaming_dq_profile(spark, sf_dir)


# Batch twin with the analytic watermark cutoff (append mode emits only
# windows whose end has passed max(ts) - 2h).
ORACLES["streaming_dq_profile"] = """
WITH horizon AS (SELECT MAX(ts) - INTERVAL 2 HOUR AS wm FROM events)
SELECT date_trunc('hour', ts) AS window_start,
       COUNT(*) AS n_events,
       AVG(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS nf_value,
       AVG(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS nf_props
FROM events, horizon
GROUP BY date_trunc('hour', ts), wm
HAVING date_trunc('hour', ts) + INTERVAL 1 HOUR <= wm
"""


# --- Streaming incident monitor ---------------------------------------------

def streaming_incident_metrics(spark: SparkSession, base_dir) -> DataFrame:
    """The dashboard's status counters (I2) computed INCREMENTALLY over
    the incident log as a stream: readStream on the append-mode incident
    table -> running counts per status, complete-mode sink.

    This is the reference's Streamlit-poll loop replaced by a standing
    streaming aggregation — new incident files are picked up per
    micro-batch, state is one row per status.  ``availableNow`` here
    drains what exists and stops (test/backfill mode); a deployment
    drops the trigger and leaves the query running."""
    from ..incidents import INCIDENT_SCHEMA, incidents_path

    stream = spark.readStream.schema(INCIDENT_SCHEMA).parquet(
        incidents_path(base_dir)
    )
    counts = (
        stream.groupBy("status").agg(F.count(F.lit(1)).alias("n"))
    )
    name = f"incident_metrics_{uuid.uuid4().hex[:8]}"
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            counts.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


# --- Stream-stream interval join ---------------------------------------------

JOIN_WINDOW_SEC = 300  # +-5 minutes, matches batch error_context_join


def streaming_error_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STREAM inner join with a time-range condition: error events
    joined to the click/view events of the same user within +-5 minutes,
    both sides unbounded streams.

    This is Spark's native interval join: the range predicate plus both
    watermarks lets the engine bound how long each side's rows stay in
    join state (a row is droppable once the other side's watermark passes
    its interval) — the stateful analogue of the batch binned range join
    ``error_context_join``.  On this finite ``availableNow`` run every
    match lands in-state before any eviction, so the result is EXACTLY
    the batch interval join — a strong batch-stream equivalence check."""

    def side():
        return read_events_stream(spark, sf_dir)

    errors = (
        side()
        .filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("err_id"),
            F.col("user_id").alias("err_user"),
            F.col("ts").alias("err_ts"),
        )
        .withWatermark("err_ts", WATERMARK)
    )
    context = (
        side()
        .filter(F.col("event_type").isin("click", "view"))
        .select(
            F.col("event_id").alias("ctx_id"),
            F.col("user_id").alias("ctx_user"),
            F.col("ts").alias("ctx_ts"),
        )
        .withWatermark("ctx_ts", WATERMARK)
    )
    joined = errors.join(
        context,
        (F.col("err_user") == F.col("ctx_user"))
        & (F.col("ctx_ts") >= F.col("err_ts") - F.expr(f"INTERVAL {JOIN_WINDOW_SEC} SECONDS"))
        & (F.col("ctx_ts") <= F.col("err_ts") + F.expr(f"INTERVAL {JOIN_WINDOW_SEC} SECONDS")),
    ).select("err_id", "ctx_id")
    name = f"error_context_{uuid.uuid4().hex[:8]}"
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def q_streaming_error_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    return streaming_error_context(spark, sf_dir)


# Batch twin: the exact interval join (finite stream, single micro-batch
# per side -> no state eviction before matching).
ORACLES["streaming_error_context"] = f"""
SELECT e.event_id AS err_id, c.event_id AS ctx_id
FROM events e JOIN events c
  ON c.user_id = e.user_id
 AND c.event_type IN ('click', 'view')
 AND ABS(epoch_us(c.ts) - epoch_us(e.ts)) <= {JOIN_WINDOW_SEC * 1_000_000}
WHERE e.event_type = 'error'
"""


def streaming_error_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every error event with its
    +-5-minute same-user click/view context, or a NULL context once the
    watermark PROVES none can arrive — the late-data-aware "unanswered
    error" detector, and the semantics that separates outer streaming
    joins from batch ones: a NULL row may only be emitted when the other
    side's event-time watermark has passed the row's entire match
    interval (earlier emission could be contradicted by a late match).

    The exactly-checkable boundary (empirically pinned at all three SFs):
    the engine's global watermark under the default ``min`` multiple-
    watermark policy is min(max err_ts, max ctx_ts) FLOORED TO MILLIS
    minus the 2h delay — the errors stream ends hours before the context
    stream in this data, so the ERROR side's max gates everything (a
    production lesson in disguise: one stalled input holds back every
    outer emission).  Matched pairs emit as they meet, unconstrained.

    100 TB shape: identical to the inner interval join — state per side
    bounded by watermark + interval; the outer semantics add only the
    eviction-time null emission, no extra state."""
    errors = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("err_id"),
            F.col("user_id").alias("err_user"),
            F.col("ts").alias("err_ts"),
        )
        .withWatermark("err_ts", WATERMARK)
    )
    context = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type").isin("click", "view"))
        .select(
            F.col("event_id").alias("ctx_id"),
            F.col("user_id").alias("ctx_user"),
            F.col("ts").alias("ctx_ts"),
        )
        .withWatermark("ctx_ts", WATERMARK)
    )
    joined = errors.join(
        context,
        (F.col("err_user") == F.col("ctx_user"))
        & (F.col("ctx_ts") >= F.col("err_ts") - F.expr(f"INTERVAL {JOIN_WINDOW_SEC} SECONDS"))
        & (F.col("ctx_ts") <= F.col("err_ts") + F.expr(f"INTERVAL {JOIN_WINDOW_SEC} SECONDS")),
        "left_outer",
    ).select("err_id", "ctx_id")
    name = f"error_orphans_{uuid.uuid4().hex[:8]}"
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def q_streaming_error_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return streaming_error_orphans(spark, sf_dir)


# Batch twin: matched pairs are the plain interval join; NULL rows are
# the unmatched errors whose whole match interval lies below the final
# global watermark = ms-floor(min of the two sides' max event times) - 2h
# (the engine tracks per-operator max event time in millis, and the
# default multipleWatermarkPolicy takes the min across inputs).  Strict
# '<' matches the engine's eviction predicate; with microsecond-random
# timestamps an exact ms-boundary tie would be a measure-zero data
# coincidence, and the parity suite would surface it loudly.
ORACLES["streaming_error_orphans"] = f"""
WITH wm AS (
  SELECT date_trunc('milliseconds',
           LEAST((SELECT MAX(ts) FROM events WHERE event_type = 'error'),
                 (SELECT MAX(ts) FROM events
                   WHERE event_type IN ('click', 'view'))))
         - INTERVAL 2 HOUR AS w
),
err AS (
  SELECT event_id AS err_id, user_id, ts FROM events
  WHERE event_type = 'error'
),
pairs AS (
  SELECT e.err_id, c.event_id AS ctx_id
  FROM err e JOIN events c
    ON c.user_id = e.user_id AND c.event_type IN ('click', 'view')
   AND ABS(epoch_us(c.ts) - epoch_us(e.ts)) <= {JOIN_WINDOW_SEC * 1_000_000}
)
SELECT err_id, ctx_id FROM pairs
UNION ALL
SELECT e.err_id, CAST(NULL AS BIGINT) AS ctx_id
FROM err e, wm
WHERE e.err_id NOT IN (SELECT err_id FROM pairs)
  AND e.ts + INTERVAL {JOIN_WINDOW_SEC} SECOND < wm.w
"""


# --- Streaming deduplication -------------------------------------------------

def streaming_dedup_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once ingestion under source replay: the staging directory
    contains the SAME events file twice (the classic at-least-once
    delivery shape — a redelivered batch), and ``dropDuplicates`` on the
    event id inside the watermark collapses the replay before the
    windowed aggregation.

    State for the dedup operator is bounded by the watermark horizon
    (ids older than max-event-time - 2h are evicted) — the property that
    makes streaming dedup viable at 100 TB/day, where an unbounded seen-id
    set would OOM.  The oracle is the ordinary hourly count: if dedup
    works, the double-delivered input counts once."""
    stream = read_events_stream(spark, sf_dir, replay=True)
    deduped = (
        stream.withWatermark("ts", WATERMARK)
        .dropDuplicates(["event_id", "ts"])
    )
    windowed = (
        deduped.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )
    name = f"dedup_hourly_{uuid.uuid4().hex[:8]}"
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            windowed.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def q_streaming_dedup_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return streaming_dedup_hourly(spark, sf_dir)


# Batch twin: the single-copy hourly count with the watermark cutoff —
# identical to streaming_hourly_counts' oracle BECAUSE dedup removed the
# double delivery.
ORACLES["streaming_dedup_hourly"] = """
WITH horizon AS (SELECT MAX(ts) - INTERVAL 2 HOUR AS wm FROM events)
SELECT date_trunc('hour', ts) AS window_start, COUNT(*) AS n_events
FROM events, horizon
GROUP BY date_trunc('hour', ts), wm
HAVING date_trunc('hour', ts) + INTERVAL 1 HOUR <= wm
"""


# --- Stream-static enrichment join -------------------------------------------

def streaming_enriched_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STATIC join: the event stream enriched against the static
    customer dimension (market segment), then counted per (segment,
    hour).  The static side is broadcast per micro-batch and re-read only
    when the dim table version changes — no state accumulates for it
    (unlike the stream-stream join's buffered sides).  This is the
    standard streaming enrichment deployment shape: facts stream, dims
    sit in the warehouse."""
    stream = read_events_stream(spark, sf_dir)
    customers = (
        spark.read.parquet(str(Path(sf_dir) / "customer.parquet"))
        .select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    )
    enriched = stream.join(F.broadcast(customers), "user_id")
    windowed = (
        enriched.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("c_mktsegment"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"),
                "c_mktsegment", "n_events")
    )
    name = f"enriched_counts_{uuid.uuid4().hex[:8]}"
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            windowed.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def q_streaming_enriched_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return streaming_enriched_counts(spark, sf_dir)


ORACLES["streaming_enriched_counts"] = """
WITH horizon AS (SELECT MAX(ts) - INTERVAL 2 HOUR AS wm FROM events)
SELECT date_trunc('hour', ts) AS window_start, c_mktsegment,
       COUNT(*) AS n_events
FROM events JOIN customer ON user_id = c_custkey, horizon
GROUP BY date_trunc('hour', ts), c_mktsegment, wm
HAVING date_trunc('hour', ts) + INTERVAL 1 HOUR <= wm
"""


# --- streaming cardinality profile: mergeable sketches in window state ------


def streaming_cardinality_profile(
    spark: SparkSession, sf_dir: str, watermark: str = WATERMARK
) -> DataFrame:
    """Distinct users per hourly window computed INSIDE the stream with an
    HLL sketch aggregate (X23 meets X17): the window's state is a fixed
    ~16 KB sketch instead of a per-user key set, so state size is constant
    in the number of users — the only way a distinct-count window survives
    a 100 TB stream.  The sketch agg is algebraic, so partial merges work
    across micro-batches exactly like batch map-side combine.

    At gate SF the per-window cardinality (<= 150 users) sits in the
    lgK=14 exact regime, so the estimate is value-checked against exact
    COUNT(DISTINCT) — the same contract as q_hll_distinct_profile.
    """
    stream = read_events_stream(spark, sf_dir)
    windowed = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(14))
            ).alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(F.col("w.start").alias("window_start"), "n_users", "n_events")
    )
    name = f"card_profile_{uuid.uuid4().hex[:8]}"
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            windowed.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def q_streaming_cardinality_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return streaming_cardinality_profile(spark, sf_dir)


ORACLES["streaming_cardinality_profile"] = """
WITH horizon AS (SELECT MAX(ts) - INTERVAL 2 HOUR AS wm FROM events)
SELECT date_trunc('hour', ts) AS window_start,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(*) AS n_events
FROM events, horizon
GROUP BY date_trunc('hour', ts), wm
HAVING date_trunc('hour', ts) + INTERVAL 1 HOUR <= wm
"""


# --- incremental sketch-profile maintenance (foreachBatch + HLL union) ------


def _commit_snapshot(
    store_dir: str, snapshot: str, merged: DataFrame, batch_id: int
) -> None:
    """Versioned-dir + symlink-swap atomic commit (the plain-filesystem
    miniature of a table format's commit).  Same PATTERN as
    streaming/merge.py's commit, which keeps its own implementation (it
    additionally seeds from a plain unversioned dir) — a protocol fix
    here must be mirrored there."""
    import os
    import shutil

    new_version = f"{snapshot}.v{batch_id}-{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(new_version)
    prev = os.readlink(snapshot) if os.path.islink(snapshot) else None
    link_tmp = f"{snapshot}.ln-{uuid.uuid4().hex[:8]}"
    os.symlink(os.path.basename(new_version), link_tmp)
    os.rename(link_tmp, snapshot)
    if prev:
        shutil.rmtree(os.path.join(store_dir, prev), ignore_errors=True)


def streaming_sketch_rollup(
    spark: SparkSession, sf_dir: str, store_dir: str | None = None
) -> DataFrame:
    """Maintain a DAILY distinct-users profile TABLE from a stream by
    union-merging HLL sketches in ``foreachBatch`` — the long-horizon
    streaming-cardinality pattern.  Windowed state (see
    ``streaming_cardinality_profile``) is bounded by the watermark; a
    profile TABLE keyed by day accretes forever, survives restarts, and
    merges new micro-batch sketches into stored ones with
    ``hll_union`` — no raw keys retained anywhere.

    Delivery semantics: the staged stream REPLAYS every event (two
    symlinks, one file per micro-batch), and the profile still converges
    to the exact distinct counts because HLL insertion is idempotent —
    re-observing an element cannot change the registers.  At-least-once
    delivery is therefore FREE for sketch profiles, where a COUNT(*)
    profile would need the dedup machinery of ``streaming_dedup_hourly``.

    The commit per batch is the same versioned-dir + symlink swap used by
    ``streaming/merge.py`` (a plain-filesystem miniature of a table
    format's atomic commit)."""
    import os
    import shutil

    stream = read_events_stream(
        spark, sf_dir, replay=True, max_files_per_trigger=1
    )
    # store_dir injectable so tests can assert the multi-batch merge path
    # actually ran (snapshot symlink ends at the batch-1 version)
    store_dir = store_dir or _session_tmpdir("sketch_profile_")
    snapshot = str(Path(store_dir) / "profile")

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        batch_sk = (
            batch_df.select(F.to_date("ts").alias("day"), "user_id")
            .groupBy("day")
            .agg(F.hll_sketch_agg("user_id", F.lit(14)).alias("sk"))
        )
        if os.path.exists(snapshot):
            base = spark.read.parquet(snapshot)
            d = batch_sk.select(
                F.col("day").alias("_d_day"), F.col("sk").alias("_d_sk")
            )
            merged = (
                base.join(d, base.day == d._d_day, "full_outer")
                .select(
                    F.coalesce("day", "_d_day").alias("day"),
                    F.when(
                        F.col("sk").isNotNull() & F.col("_d_sk").isNotNull(),
                        F.hll_union("sk", "_d_sk"),
                    )
                    .otherwise(F.coalesce("_d_sk", "sk"))
                    .alias("sk"),
                )
            )
        else:
            merged = batch_sk
        _commit_snapshot(store_dir, snapshot, merged, batch_id)

    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            stream.writeStream.foreachBatch(_apply)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.read.parquet(snapshot)
        .select("day", F.hll_sketch_estimate("sk").alias("n_users"))
    )


def q_streaming_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return streaming_sketch_rollup(spark, sf_dir)


# Exact oracle: per-day distinct users.  The stream delivered every event
# TWICE and the merged estimates still equal the exact counts (idempotent
# sketch insertion; per-day cardinality sits in the lgK=14 exact regime).
ORACLES["streaming_sketch_rollup"] = """
SELECT CAST(ts AS DATE) AS day, COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY CAST(ts AS DATE)
"""


# --- full profile-table maintenance: HLL + Theta + KLL per day ---------------


def streaming_profile_table(
    spark: SparkSession, sf_dir: str, store_dir: str | None = None
) -> DataFrame:
    """Maintain the FULL mergeable-sketch profile TABLE from a stream:
    one row per day carrying an HLL sketch (cheap cardinality), a Theta
    sketch (set algebra: churn/retention between any two stored rows) and
    a KLL sketch (quantile drift) of the day's events — the scale-out of
    the reference's whole drift loop (``src/drift_detector.py:29-87``
    recomputes profiles from raw data per run; here every profile
    question is answered from stored KB-sized summaries that union-merge
    as new partitions land, never re-scanning history).

    Replay semantics (the staged stream delivers every event TWICE):
    HLL and Theta are insertion-idempotent, so their estimates are exact
    under at-least-once delivery.  KLL is NOT idempotent — the doubled
    stream doubles its item count — but uniform duplication preserves
    every RANK (quantiles of a uniformly-doubled multiset are unchanged),
    so the profile exposes KLL *quantiles* and their rank contract, never
    KLL counts.  Exactly-once counts would use the foreachBatch
    batch-registry pattern of ``streaming/merge.py``.
    """
    import os

    from ..operators.sketches import HLL_LG_K, KLL_K, THETA_LG_K

    stream = read_events_stream(
        spark, sf_dir, replay=True, max_files_per_trigger=1
    )
    store_dir = store_dir or _session_tmpdir("profile_table_")
    snapshot = str(Path(store_dir) / "profile")

    def _merge_col(name: str, merge) -> "F.Column":
        a, b = F.col(name), F.col(f"_d_{name}")
        return (
            F.when(a.isNotNull() & b.isNotNull(), merge(a, b))
            .otherwise(F.coalesce(b, a))
            .alias(name)
        )

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        batch_sk = (
            batch_df.select(
                F.to_date("ts").alias("day"), "user_id", "value"
            )
            .groupBy("day")
            .agg(
                F.hll_sketch_agg("user_id", F.lit(HLL_LG_K)).alias("hll"),
                F.theta_sketch_agg("user_id", F.lit(THETA_LG_K)).alias("th"),
                F.kll_sketch_agg_double("value", F.lit(KLL_K)).alias("kll"),
            )
        )
        if os.path.exists(snapshot):
            base = spark.read.parquet(snapshot)
            d = batch_sk.select(
                F.col("day").alias("_d_day"),
                *[
                    F.col(c).alias(f"_d_{c}")
                    for c in ("hll", "th", "kll")
                ],
            )
            merged = base.join(d, base.day == d._d_day, "full_outer").select(
                F.coalesce("day", "_d_day").alias("day"),
                _merge_col("hll", F.hll_union),
                _merge_col(
                    "th",
                    lambda a, b: F.theta_union(a, b, F.lit(THETA_LG_K)),
                ),
                _merge_col("kll", F.kll_sketch_merge_double),
            )
        else:
            merged = batch_sk
        _commit_snapshot(store_dir, snapshot, merged, batch_id)

    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            stream.writeStream.foreachBatch(_apply)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.read.parquet(snapshot)


def q_streaming_churn_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day retention/churn plus quantile health answered PURELY
    from the incrementally-maintained profile table — the capstone that
    joins the sketch ring (X23) to the reference's drift loop: after each
    micro-batch the stored table can report, with NO scan of historical
    raw data, (a) exact daily active users (Theta, exact regime), (b)
    retained/churned/new vs the previous day (Theta set algebra on two
    stored rows), (c) whether the cheap HLL estimate agrees with Theta
    (accuracy contract), (d) whether the day's KLL median still ranks
    at ~0.5 against the day's raw values (rank contract, audit-side scan
    that production drops) and (e) whether the day's value distribution
    DRIFTED from the previous day's — the ``kll_quantile_drift`` decision
    rule applied to two STORED rows: the previous day's sketched median
    probed against today's sketched quantile window at
    0.5 +/- KLL_DAILY_DRIFT_THRESH.  The daily threshold is wider than
    the batch query's (0.35 vs 0.25) because a DAY of events is a small
    sample (~170 at the smallest SF) and a finer decision would not be
    margin-deterministic — the tripwire in tests/test_sketches.py
    re-derives the margins for every consecutive-day pair at every SF.

    The day-ordered window runs on ~one row per day (a 100 TB stream
    still yields one profile row per day), so the unpartitioned sort is
    bounded by the calendar, not the data."""
    from pyspark.sql import Window

    from ..operators.sketches import (
        HLL_REL_TOL,
        KLL_DAILY_DRIFT_THRESH,
        KLL_RANK_EPS,
    )
    from ..sources.tables import load_table

    store = streaming_profile_table(spark, sf_dir)
    w = Window.orderBy("day")
    th_est = F.theta_sketch_estimate("th")
    store = store.withColumn("prev_kll", F.lag("kll").over(w))
    prof = store.withColumn("prev_th", F.lag("th").over(w)).select(
        "day",
        th_est.alias("n_users"),
        (
            F.abs(F.hll_sketch_estimate("hll") - th_est)
            <= th_est * F.lit(HLL_REL_TOL)
        ).alias("hll_ok"),
        F.when(
            F.col("prev_th").isNotNull(),
            F.theta_sketch_estimate(F.theta_intersection("prev_th", "th")),
        ).alias("n_retained"),
        F.when(
            F.col("prev_th").isNotNull(),
            F.theta_sketch_estimate(F.theta_difference("prev_th", "th")),
        ).alias("n_churned"),
        F.when(
            F.col("prev_th").isNotNull(),
            F.theta_sketch_estimate(F.theta_difference("th", "prev_th")),
        ).alias("n_new"),
        F.kll_sketch_get_quantile_double("kll", F.lit(0.5)).alias("med"),
        F.when(
            F.col("prev_kll").isNotNull(),
            (
                F.kll_sketch_get_quantile_double("prev_kll", F.lit(0.5))
                < F.kll_sketch_get_quantile_double(
                    "kll", F.lit(0.5 - KLL_DAILY_DRIFT_THRESH)
                )
            )
            | (
                F.kll_sketch_get_quantile_double("prev_kll", F.lit(0.5))
                > F.kll_sketch_get_quantile_double(
                    "kll", F.lit(0.5 + KLL_DAILY_DRIFT_THRESH)
                )
            ),
        ).alias("median_drifted"),
    )
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "value"
    )
    ranks = (
        ev.join(F.broadcast(prof.select("day", "med")), "day")
        .groupBy("day")
        .agg(
            (
                F.abs(
                    F.avg((F.col("value") <= F.col("med")).cast("double"))
                    - F.lit(0.5)
                )
                <= F.lit(KLL_RANK_EPS)
            ).alias("med_rank_ok")
        )
    )
    return prof.join(ranks, "day").select(
        "day", "n_users", "hll_ok", "n_retained", "n_churned", "n_new",
        "med_rank_ok", "median_drifted",
    )


# Exact oracle: per-day distinct users and exact set algebra against the
# PREVIOUS existing day (LAG over the day sequence).  The stream delivered
# every event twice; Theta/HLL idempotence and KLL rank-invariance under
# uniform duplication make the profile's answers exact/contract-true
# anyway (per-day cardinality sits inside the Theta exact regime —
# tripwire in tests/test_sketches.py).  median_drifted makes the SAME
# decision from exact per-day medians/quantile windows that the profile
# makes from stored sketches (margin-deterministic, tripwire-asserted).
from ..operators.sketches import (  # noqa: E402 - oracle f-string needs it
    KLL_DAILY_DRIFT_THRESH as _DAILY_DRIFT_T,
)

ORACLES["streaming_churn_profile"] = f"""
WITH du AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id AS u FROM events
),
d AS (SELECT day, COUNT(*) AS n_users FROM du GROUP BY day),
seq AS (
  SELECT day, n_users, LAG(day) OVER (ORDER BY day) AS prev_day FROM d
),
q AS (
  SELECT CAST(ts AS DATE) AS day,
         quantile_disc(value, 0.5) AS med,
         quantile_disc(value, {0.5 - _DAILY_DRIFT_T}) AS win_lo,
         quantile_disc(value, {0.5 + _DAILY_DRIFT_T}) AS win_hi
  FROM events GROUP BY CAST(ts AS DATE)
)
SELECT s.day,
       s.n_users,
       TRUE AS hll_ok,
       CASE WHEN s.prev_day IS NULL THEN NULL ELSE
         (SELECT COUNT(*) FROM du a JOIN du b ON a.u = b.u
          WHERE a.day = s.prev_day AND b.day = s.day) END AS n_retained,
       CASE WHEN s.prev_day IS NULL THEN NULL ELSE
         (SELECT COUNT(*) FROM du a
          WHERE a.day = s.prev_day
            AND a.u NOT IN (SELECT u FROM du b WHERE b.day = s.day))
         END AS n_churned,
       CASE WHEN s.prev_day IS NULL THEN NULL ELSE
         (SELECT COUNT(*) FROM du b
          WHERE b.day = s.day
            AND b.u NOT IN (SELECT u FROM du a WHERE a.day = s.prev_day))
         END AS n_new,
       TRUE AS med_rank_ok,
       CASE WHEN s.prev_day IS NULL THEN NULL ELSE
         (qa.med < qb.win_lo OR qa.med > qb.win_hi) END AS median_drifted
FROM seq s
LEFT JOIN q qa ON qa.day = s.prev_day
JOIN q qb ON qb.day = s.day
"""


# --- native session windows (built-in merging-window state) ------------------


def streaming_session_windows(
    spark: SparkSession, sf_dir: str, watermark: str = WATERMARK
) -> DataFrame:
    """X17+: Spark's NATIVE session windows — ``F.session_window`` with a
    watermark in append mode, the built-in counterpart of the
    custom-state sessionizers (same 30-minute gap as
    ``stateful_sessions`` and batch X13).  The engine keeps ONE merging
    window per (user, open session) in the state store and finalizes a
    session when the watermark passes its window end (last event + gap)
    — the declarative path that survives a RocksDB-backed 100 TB stream
    without custom kernels.

    Append-mode cutoff semantics are batch-reproducible exactly like
    ``streaming_hourly_counts``: a session is emitted iff
    ``last_event + gap <= max_ts - watermark``, which the oracle applies
    analytically to batch gap-sessionization.  ``session_end`` is
    recovered as ``window.end - gap`` (the window end is last event +
    gap by definition), so the output schema matches the custom-state
    sessionizers'."""
    gap_expr = f"INTERVAL {SESSION_GAP_MICROS // 60_000_000} MINUTES"
    stream = read_events_stream(spark, sf_dir)
    sessions = (
        stream.withWatermark("ts", watermark)
        .groupBy(
            F.session_window(
                "ts", f"{SESSION_GAP_MICROS // 60_000_000} minutes"
            ).alias("w"),
            "user_id",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            (F.col("w.end") - F.expr(gap_expr)).alias("session_end"),
            "n_events",
        )
    )
    name = f"session_windows_{uuid.uuid4().hex[:8]}"
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            sessions.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def q_streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return streaming_session_windows(spark, sf_dir)


# Batch twin: gap sessionization emitted iff the session's window end
# (last event + gap) has passed the final watermark (max ts - 2h).
ORACLES["streaming_session_windows"] = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {SESSION_GAP_MICROS}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
), horizon AS (SELECT epoch_us(MAX(ts)) - 7200000000 AS wm_us FROM events)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       COUNT(*) AS n_events
FROM numbered, horizon
GROUP BY user_id, session_id, wm_us
HAVING epoch_us(MAX(ts)) + {SESSION_GAP_MICROS} <= wm_us
"""


# --- key-only dedup under timestamp-skewed redelivery ------------------------


def streaming_dedup_jittered(
    spark: SparkSession, sf_dir: str, watermark: str = WATERMARK
) -> DataFrame:
    """``dropDuplicatesWithinWatermark`` — key-only streaming dedup for
    the redelivery shape ``streaming_dedup_hourly`` cannot handle: the
    redelivered copy carries a DIFFERENT event time (ingest jitter), so
    exact (event_id, ts) matching sees two distinct rows.  The
    within-watermark variant dedups on ``event_id`` alone and expires
    state once the watermark passes first-seen + delay — bounded state,
    like the exact-match path.

    The staged replay adds +1 s to the second copy's ``ts`` — but only
    where that stays inside the event's hour (integer epoch-hour check),
    so whichever copy survives dedup lands in the SAME hourly window and
    the aggregated counts are deterministic; the oracle reproduces the
    watermark horizon from the jittered maximum analytically."""
    import os

    from ..sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    same_hour = (
        (F.unix_micros("ts") + F.lit(1_000_000))
        / F.lit(3_600_000_000)
    ).cast("long") == (
        F.unix_micros("ts") / F.lit(3_600_000_000)
    ).cast("long")
    jittered = ev.withColumn(
        "ts",
        F.when(same_hour, F.col("ts") + F.expr("INTERVAL 1 SECOND"))
        .otherwise(F.col("ts")),
    )
    staging = _session_tmpdir("events_jitter_")
    ev.write.parquet(os.path.join(staging, "copy1"))
    jittered.write.parquet(os.path.join(staging, "copy2"))
    stream = (
        spark.readStream.schema(ev.schema)
        .option("recursiveFileLookup", "true")
        .parquet(staging)
    )
    deduped = (
        stream.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    windowed = (
        deduped.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )
    name = f"dedup_jittered_{uuid.uuid4().hex[:8]}"
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            windowed.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def q_streaming_dedup_jittered(spark: SparkSession, sf_dir: str) -> DataFrame:
    return streaming_dedup_jittered(spark, sf_dir)


# Batch twin: single-copy hourly counts (key-only dedup collapses the
# jittered redelivery; the jitter never crosses an hour boundary, so the
# surviving copy's window is the original's).  The watermark horizon is
# the max over the JITTERED stream, reproduced analytically.
ORACLES["streaming_dedup_jittered"] = """
WITH j AS (
  SELECT ts,
         CASE WHEN (epoch_us(ts) + 1000000) // 3600000000
                   = epoch_us(ts) // 3600000000
              THEN ts + INTERVAL 1 SECOND ELSE ts END AS jts
  FROM events
),
horizon AS (SELECT MAX(jts) - INTERVAL 2 HOUR AS wm FROM j)
SELECT date_trunc('hour', ts) AS window_start, COUNT(*) AS n_events
FROM j, horizon
GROUP BY date_trunc('hour', ts), wm
HAVING date_trunc('hour', ts) + INTERVAL 1 HOUR <= wm
"""


# --- profile-table retention compaction --------------------------------------

# Day rows newer than this (relative to the table's max day) stay daily;
# everything older merges into ISO-week rows.  7 keeps ~a week of daily
# resolution over the ~30-day test stream — several multi-day weeks plus a
# daily tail, so both branches of the compaction are exercised at every SF.
PROFILE_RETAIN_DAYS = 7

# med_rank_ok threshold for COMPACTED periods.  Wider than the per-day
# KLL_RANK_EPS (0.04): a week row is the merge of up to 7 day sketches
# and KLL merge compounds rank error — measured max deviation 0.0217 at
# sf0.001 (vs <=0.01 for unmerged daily rows), which sits inside 2x of
# the daily threshold.  0.08 restores the tripwired >=2x headroom
# (tests/test_sketches.py::test_profile_compaction_flag_margins).
COMPACTION_RANK_EPS = 0.08


def streaming_profile_compaction(
    spark: SparkSession, sf_dir: str, store_dir: str | None = None
) -> DataFrame:
    """Retention compaction for the streaming profile table — the
    operation mergeable sketches exist to make possible (VERDICT r6 #7:
    ``streaming_profile_table`` grows one row per day forever).

    Day rows older than PROFILE_RETAIN_DAYS (relative to the table's own
    max day — derived from the committed snapshot, no wall clock) are
    union-merged into Monday-start week rows with the sketch-native
    aggregates (``hll_union_agg`` / ``theta_union_agg`` /
    ``kll_merge_agg_double``); newer rows pass through unchanged.  The
    merge never touches raw history: a 100 TB stream's compaction reads
    and writes only KB-sized sketch rows, one tiny groupBy on
    (period_start, granularity).

    Checked contract (exact or decision columns only, the X23 ring
    convention): per period — days merged, Theta-exact distinct users
    (weekly unions stay far inside the lgK=16 exact regime;
    tripwire-asserted in tests/test_sketches.py), an HLL-vs-Theta
    accuracy flag, and a KLL median rank audit against the day's raw
    values (the sketch VALUE is never hashed — KLL past its exact regime
    is randomized; rank contracts survive both the merge and the
    at-least-once replay's uniform duplication)."""
    from ..operators.sketches import HLL_REL_TOL

    est = compaction_estimates(spark, sf_dir, store_dir)
    return est.select(
        "period_start", "granularity", "n_days_merged",
        F.col("th_est").cast("bigint").alias("n_users"),
        (
            F.abs(F.col("hll_est") - F.col("th_est"))
            <= F.col("th_est") * F.lit(HLL_REL_TOL)
        ).alias("hll_ok"),
        (F.col("med_rank_dev") <= F.lit(COMPACTION_RANK_EPS))
        .alias("med_rank_ok"),
    )


def compaction_estimates(
    spark: SparkSession, sf_dir: str, store_dir: str | None = None
) -> DataFrame:
    """The compaction's pre-flag measurements: per compacted period, the
    Theta and HLL estimates, the merged-KLL median, and the median's
    rank deviation against the period's raw values.  Split out so the
    query's boolean contract AND the margin tripwires
    (tests/test_sketches.py) read the SAME pipeline — the flags must
    never be closer to their thresholds than the tripwire headroom, or a
    driver-side estimate drift could flip a hashed boolean with no local
    warning (the repo's margin-tripwire pattern)."""
    from ..operators.sketches import THETA_LG_K
    from ..sources.tables import load_table

    store = streaming_profile_table(spark, sf_dir, store_dir)
    maxd = store.agg(F.max("day").alias("maxd"))
    old = F.col("day") <= F.date_sub(F.col("maxd"), PROFILE_RETAIN_DAYS)
    keyed = store.crossJoin(F.broadcast(maxd)).select(
        F.when(old, F.trunc("day", "week")).otherwise(F.col("day"))
        .alias("period_start"),
        F.when(old, F.lit("week")).otherwise(F.lit("day"))
        .alias("granularity"),
        "hll", "th", "kll",
    )
    compacted = keyed.groupBy("period_start", "granularity").agg(
        F.count(F.lit(1)).alias("n_days_merged"),
        F.hll_union_agg("hll").alias("hll"),
        F.theta_union_agg("th", F.lit(THETA_LG_K)).alias("th"),
        F.kll_merge_agg_double("kll").alias("kll"),
    )
    prof = compacted.select(
        "period_start", "granularity", "n_days_merged",
        F.theta_sketch_estimate("th").alias("th_est"),
        F.hll_sketch_estimate("hll").alias("hll_est"),
        F.kll_sketch_get_quantile_double("kll", F.lit(0.5)).alias("med"),
    )
    # audit-side rank check of the merged KLL median against raw values
    # (production drops this scan; it is the correctness teeth here)
    ev = load_table(spark, sf_dir, "events").crossJoin(F.broadcast(maxd))
    ev_keyed = ev.select(
        F.when(
            F.to_date("ts") <= F.date_sub(F.col("maxd"), PROFILE_RETAIN_DAYS),
            F.trunc(F.to_date("ts"), "week"),
        ).otherwise(F.to_date("ts")).alias("period_start"),
        "value",
    )
    ranks = (
        ev_keyed.join(
            F.broadcast(prof.select("period_start", "med")), "period_start"
        )
        .groupBy("period_start")
        .agg(
            F.abs(
                F.avg((F.col("value") <= F.col("med")).cast("double"))
                - F.lit(0.5)
            ).alias("med_rank_dev")
        )
    )
    return prof.join(ranks, "period_start")


def q_streaming_profile_compaction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return streaming_profile_compaction(spark, sf_dir)


# Exact oracle from raw events: the compaction keying applied analytically
# (max day from the data), exact distinct users per period, and the two
# decision columns at their oracle-exact values (TRUE — the accuracy /
# rank contracts hold by construction; margins tripwired in
# tests/test_sketches.py).  The stream replayed every event twice: Theta /
# HLL idempotence and KLL rank-invariance under uniform duplication make
# the compacted answers exact anyway.
ORACLES["streaming_profile_compaction"] = f"""
WITH maxd AS (SELECT MAX(CAST(ts AS DATE)) AS m FROM events),
keyed AS (
  SELECT CASE WHEN CAST(ts AS DATE) <= m - {PROFILE_RETAIN_DAYS}
              THEN date_trunc('week', CAST(ts AS DATE))
              ELSE CAST(ts AS DATE) END AS period_start,
         CASE WHEN CAST(ts AS DATE) <= m - {PROFILE_RETAIN_DAYS}
              THEN 'week' ELSE 'day' END AS granularity,
         CAST(ts AS DATE) AS day, user_id
  FROM events, maxd
)
SELECT period_start, granularity,
       COUNT(DISTINCT day) AS n_days_merged,
       COUNT(DISTINCT user_id) AS n_users,
       TRUE AS hll_ok,
       TRUE AS med_rank_ok
FROM keyed GROUP BY period_start, granularity
"""


# --- second-tier compaction: week rows -> month rows -------------------------

# Week rows whose Monday is at least this many days behind the table's max
# day merge again into month rows.  21 leaves ~2 week rows in the month
# bucket and ~2 younger week rows untouched on the ~30-day test stream, so
# the month union, the week pass-through, and the day pass-through are all
# exercised at every SF.
PROFILE_RETAIN_WEEK_DAYS = 21

# med_rank_ok threshold for MONTH periods.  A month row is a union of
# ALREADY-merged week sketches — two KLL merge levels deep, which is the
# associativity 100-TB retention relies on (week files merged last
# quarter get re-merged into months this quarter without re-reading
# days).  Measured max deviation at the month tier: 0.0002 across
# sf0.001/0.01 (BELOW the single-merge week tier's 0.0217 — the month
# median sits on a larger merged sample, so its rank stabilizes), so the
# week tier's 0.08 flag threshold already carries far more than the
# mandated 2x headroom one level deeper; tripwired in
# tests/test_sketches.py::test_profile_compaction2_flag_margins.
COMPACTION2_RANK_EPS = COMPACTION_RANK_EPS


def compaction2_estimates(
    spark: SparkSession, sf_dir: str, store_dir: str | None = None
) -> DataFrame:
    """Two-level retention compaction measurements: day rows older than
    ``PROFILE_RETAIN_DAYS`` merge into week rows (level-1 sketch union),
    then week rows older than ``PROFILE_RETAIN_WEEK_DAYS`` merge into
    month rows (level-2 union over the ALREADY-merged week sketches —
    never re-reading day rows, which is the point of mergeability).
    Same split as ``compaction_estimates``: the query's boolean contract
    and the margin tripwires must read ONE pipeline."""
    from ..operators.sketches import THETA_LG_K
    from ..sources.tables import load_table

    store = streaming_profile_table(spark, sf_dir, store_dir)
    maxd = store.agg(F.max("day").alias("maxd"))
    old7 = F.col("day") <= F.date_sub(F.col("maxd"), PROFILE_RETAIN_DAYS)
    keyed1 = store.crossJoin(F.broadcast(maxd)).select(
        F.when(old7, F.trunc("day", "week")).otherwise(F.col("day"))
        .alias("p1"),
        F.when(old7, F.lit("week")).otherwise(F.lit("day")).alias("g1"),
        "hll", "th", "kll",
    )
    tier1 = keyed1.groupBy("p1", "g1").agg(
        F.count(F.lit(1)).alias("n_days_merged"),
        F.hll_union_agg("hll").alias("hll"),
        F.theta_union_agg("th", F.lit(THETA_LG_K)).alias("th"),
        F.kll_merge_agg_double("kll").alias("kll"),
    )
    old21 = (F.col("g1") == "week") & (
        F.col("p1") <= F.date_sub(F.col("maxd"), PROFILE_RETAIN_WEEK_DAYS)
    )
    keyed2 = tier1.crossJoin(F.broadcast(maxd)).select(
        F.when(old21, F.trunc("p1", "month")).otherwise(F.col("p1"))
        .alias("period_start"),
        F.when(old21, F.lit("month")).otherwise(F.col("g1"))
        .alias("granularity"),
        "n_days_merged", "hll", "th", "kll",
    )
    tier2 = keyed2.groupBy("period_start", "granularity").agg(
        F.sum("n_days_merged").cast("bigint").alias("n_days_merged"),
        F.count(F.lit(1)).alias("n_source_rows"),
        F.hll_union_agg("hll").alias("hll"),
        F.theta_union_agg("th", F.lit(THETA_LG_K)).alias("th"),
        F.kll_merge_agg_double("kll").alias("kll"),
    )
    prof = tier2.select(
        "period_start", "granularity", "n_days_merged", "n_source_rows",
        F.theta_sketch_estimate("th").alias("th_est"),
        F.hll_sketch_estimate("hll").alias("hll_est"),
        F.kll_sketch_get_quantile_double("kll", F.lit(0.5)).alias("med"),
    )
    # audit-side rank check against raw values under the COMPOSED keying
    # (production drops this scan; it is the correctness teeth here)
    ev = load_table(spark, sf_dir, "events").crossJoin(F.broadcast(maxd))
    day = F.to_date("ts")
    p1 = F.when(
        day <= F.date_sub(F.col("maxd"), PROFILE_RETAIN_DAYS),
        F.trunc(day, "week"),
    ).otherwise(day)
    is_week = day <= F.date_sub(F.col("maxd"), PROFILE_RETAIN_DAYS)
    p2 = F.when(
        is_week
        & (p1 <= F.date_sub(F.col("maxd"), PROFILE_RETAIN_WEEK_DAYS)),
        F.trunc(p1, "month"),
    ).otherwise(p1)
    ranks = (
        ev.select(p2.alias("period_start"), "value")
        .join(F.broadcast(prof.select("period_start", "med")), "period_start")
        .groupBy("period_start")
        .agg(
            F.abs(
                F.avg((F.col("value") <= F.col("med")).cast("double"))
                - F.lit(0.5)
            ).alias("med_rank_dev")
        )
    )
    return prof.join(ranks, "period_start")


def q_streaming_profile_compaction2(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Second-tier retention compaction of the streaming profile table:
    day -> week -> month, where the month union consumes only the merged
    WEEK sketches.  Re-merging already-merged sketches is the
    associativity property 100-TB retention depends on (day files union
    into weeks as they age, weeks into months a quarter later, all
    without re-reading raw history); the checked contract pins it with
    the X23 ring convention — exact/decision columns only: days and
    tier-1 rows merged per period, Theta-exact distinct users (month
    unions stay far inside the lgK=16 exact regime), the HLL-vs-Theta
    accuracy flag, and the merged-merged KLL median rank audit."""
    from ..operators.sketches import HLL_REL_TOL

    est = compaction2_estimates(spark, sf_dir)
    return est.select(
        "period_start", "granularity", "n_days_merged", "n_source_rows",
        F.col("th_est").cast("bigint").alias("n_users"),
        (
            F.abs(F.col("hll_est") - F.col("th_est"))
            <= F.col("th_est") * F.lit(HLL_REL_TOL)
        ).alias("hll_ok"),
        (F.col("med_rank_dev") <= F.lit(COMPACTION2_RANK_EPS))
        .alias("med_rank_ok"),
    )


# Exact analytic twin of the two-level keying from raw events (the
# decision columns at their oracle-exact values — margins tripwired in
# tests/test_sketches.py).  n_source_rows counts the tier-1 rows each
# final period consumed: distinct old-enough week starts for a month
# row, 1 for pass-through week and day rows.
ORACLES["streaming_profile_compaction2"] = f"""
WITH maxd AS (SELECT MAX(CAST(ts AS DATE)) AS m FROM events),
k1 AS (
  SELECT CASE WHEN CAST(ts AS DATE) <= m - {PROFILE_RETAIN_DAYS}
              THEN date_trunc('week', CAST(ts AS DATE))
              ELSE CAST(ts AS DATE) END AS p1,
         CASE WHEN CAST(ts AS DATE) <= m - {PROFILE_RETAIN_DAYS}
              THEN 'week' ELSE 'day' END AS g1,
         m, CAST(ts AS DATE) AS d, user_id
  FROM events, maxd
),
k2 AS (
  SELECT CASE WHEN g1 = 'week' AND p1 <= m - {PROFILE_RETAIN_WEEK_DAYS}
              THEN date_trunc('month', p1) ELSE p1 END AS period_start,
         CASE WHEN g1 = 'week' AND p1 <= m - {PROFILE_RETAIN_WEEK_DAYS}
              THEN 'month' ELSE g1 END AS granularity,
         p1, d, user_id
  FROM k1
)
SELECT period_start, granularity,
       COUNT(DISTINCT d) AS n_days_merged,
       COUNT(DISTINCT p1) AS n_source_rows,
       COUNT(DISTINCT user_id) AS n_users,
       TRUE AS hll_ok,
       TRUE AS med_rank_ok
FROM k2 GROUP BY period_start, granularity
"""


# --- X17+: state-store observability ----------------------------------------
#
# The streaming ring's other queries check VALUES; this one reports the
# engine's own per-operator state-store metrics — the 100 TB go/no-go
# signal for stateful streaming.  A stream-stream LEFT OUTER interval
# join retains both sides until the watermark clears the match interval
# (the r9 `streaming_error_orphans` addition), and a session-window agg
# retains one merging window per open session; if either's state size
# does not plateau once the watermark advances, the job eventually
# OOMs/spills no matter how many executors it gets.  The report is the
# quantity a deployment alerts on (rows retained at end-of-stream,
# lifetime update/remove churn, bytes); values come from
# StreamingQueryProgress.stateOperators, the same source the Spark UI
# renders.


def _progress_dicts(q) -> list[dict]:
    """recentProgress as plain dicts across PySpark's object/dict API
    variants."""
    import json as _json

    out = []
    for p in q.recentProgress:
        out.append(p if isinstance(p, dict) else _json.loads(p.json))
    return out


def _run_and_observe(df: DataFrame, prefix: str) -> list[dict]:
    name = f"{prefix}_{uuid.uuid4().hex[:8]}"
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return _progress_dicts(q)


def streaming_state_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per stateful operator of two representative stateful
    pipelines — the outer interval join and the native session-window
    agg: (pipeline, operator, state_rows_final, rows_updated_total,
    rows_removed_total, memory_used_bytes_final).

    ``state_rows_final`` is the state left after the final watermark
    advance — data-determined (what the watermark could not yet evict),
    not batching-determined; the churn totals sum the per-batch metrics
    over the run.  Registered rows-only (no SQL twin: the subject IS the
    engine's runtime state accounting, which a batch engine does not
    have); the row count is pinned by the operator count of the two
    plans, and tests assert the invariants that make the numbers
    meaningful (join retains rows, session state drains to the open
    tail, bytes > 0 for non-empty state)."""
    # pipeline 1: the LEFT OUTER interval join from streaming_error_orphans
    errors = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("err_id"),
            F.col("user_id").alias("err_user"),
            F.col("ts").alias("err_ts"),
        )
        .withWatermark("err_ts", WATERMARK)
    )
    context = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type").isin("click", "view"))
        .select(
            F.col("event_id").alias("ctx_id"),
            F.col("user_id").alias("ctx_user"),
            F.col("ts").alias("ctx_ts"),
        )
        .withWatermark("ctx_ts", WATERMARK)
    )
    joined = errors.join(
        context,
        (F.col("err_user") == F.col("ctx_user"))
        & (F.col("ctx_ts") >= F.col("err_ts") - F.expr(f"INTERVAL {JOIN_WINDOW_SEC} SECONDS"))
        & (F.col("ctx_ts") <= F.col("err_ts") + F.expr(f"INTERVAL {JOIN_WINDOW_SEC} SECONDS")),
        "left_outer",
    ).select("err_id", "ctx_id")
    # pipeline 2: native session windows (same plan as streaming_session_windows)
    gap_min = SESSION_GAP_MICROS // 60_000_000
    sessions = (
        read_events_stream(spark, sf_dir)
        .withWatermark("ts", WATERMARK)
        .groupBy(F.session_window("ts", f"{gap_min} minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )
    rows = []
    for pipeline, df in (("interval_join_outer", joined),
                         ("session_windows", sessions)):
        progresses = _run_and_observe(df, f"state_metrics_{pipeline}")
        final: dict[int, dict] = {}
        updated: dict[int, int] = {}
        removed: dict[int, int] = {}
        for p in progresses:
            for idx, op in enumerate(p.get("stateOperators", [])):
                final[idx] = op
                updated[idx] = updated.get(idx, 0) + int(op.get("numRowsUpdated", 0))
                removed[idx] = removed.get(idx, 0) + int(op.get("numRowsRemoved", 0))
        for idx in sorted(final):
            op = final[idx]
            rows.append((
                pipeline,
                str(op.get("operatorName", f"op{idx}")),
                int(op.get("numRowsTotal", 0)),
                updated[idx],
                removed[idx],
                int(op.get("memoryUsedBytes", 0)),
            ))
    schema = StructType([
        StructField("pipeline", StringType(), False),
        StructField("operator", StringType(), False),
        StructField("state_rows_final", LongType(), False),
        StructField("rows_updated_total", LongType(), False),
        StructField("rows_removed_total", LongType(), False),
        StructField("memory_used_bytes_final", LongType(), False),
    ])
    return spark.createDataFrame(rows, schema)


def q_streaming_state_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    return streaming_state_metrics(spark, sf_dir)


# --- X44+: streaming ingest INTO the bucketed warehouse -----------------------
#
# The lifecycle's front door.  X38/X44 assume an ingest process that
# appends bucket-aligned files to the warehouse (build -> ingest-append ->
# compact); this member IS that process, as a stream: every micro-batch
# lands as one parquet file per bucket with the table's own bucket spec,
# so the co-located joins and shuffle-free aggregates the bucketed layout
# buys are preserved CONTINUOUSLY — no rebuild between batches, no
# downstream replan.  Compaction (ensure_compacted_bucketed_table)
# periodically resets the per-bucket file count the appends accumulate.

BKT_INGEST_BUCKETS = 16

# one reusable tmpdir for the session's ingest table (cleaned at exit by
# _session_tmpdir's atexit hook; reset per invocation by the drop below)
_BKT_INGEST_STORE: list[str] = []


def streaming_bucketed_ingest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """foreachBatch ingest of the events stream into a BUCKETED table
    (bucketBy user_id — the analytical key every sessionization/
    enrichment downstream groups or joins on), EXACTLY-ONCE under
    at-least-once delivery: the staged stream redelivers every event
    (two micro-batches, each the full file), and each batch is
    anti-joined on event_id against the standing table before its
    append, so replayed events land zero times and the final table is
    value-identical to the batch source.

    Scale shape per micro-batch: the dedup probe is a keyed anti join
    (batch-sized left side; at 100 TB the standing side prunes to the
    batch's key range via the layout), and the append is
    repartition(n_buckets, user_id) -> one bucket-aligned file per
    bucket, batch-proportional, standing files untouched — the same
    append contract as ensure_bucketed_ingest_table, produced by a
    stream instead of a batch carve.  The payoff is measured in the
    returned aggregate: the per-user rollup plans with ZERO exchanges —
    the bucketed scan already satisfies the aggregation's hash
    distribution (pinned by test_streaming_bucketed_ingest_agg_shuffle_free).

    Delivery semantics vs the sketch rollup above: HLL merges are
    idempotent so replay is FREE there; a plain TABLE append is not —
    exactly-once needs the event_id dedup, which is what this member
    demonstrates (the foreachBatch-idempotency half of the streaming
    story; Delta/Iceberg's MERGE plays this role in production)."""
    stream = read_events_stream(
        spark, sf_dir, replay=True, max_files_per_trigger=1
    )
    # deterministic per-session table + data dir, so the reset below is
    # EFFECTIVE (r15 ADVICE: a fresh uuid name per invocation meant the
    # DROP could never match and bench's warmup + best-of-N sampling
    # left one full ingested copy per run in the catalog and on disk).
    # Dropping at the START of the next invocation keeps the returned
    # aggregate lazy — the previous caller has already consumed it.
    if not _BKT_INGEST_STORE:
        _BKT_INGEST_STORE.append(_session_tmpdir("bkt_stream_ingest_"))
    store = _BKT_INGEST_STORE[0]
    tbl = "stream_bkt_events_session"
    data = str(Path(store) / "data")
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    # the table is EXTERNAL (option("path", ...)), so DROP leaves its
    # files — remove the data dir explicitly or appends double up
    shutil.rmtree(data, ignore_errors=True)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        fresh = batch_df
        if spark.catalog.tableExists(tbl):
            standing = spark.table(tbl).select("event_id")
            fresh = batch_df.join(standing, "event_id", "left_anti")
        writer = (
            fresh.repartition(BKT_INGEST_BUCKETS, F.col("user_id"))
            .write.bucketBy(BKT_INGEST_BUCKETS, "user_id")
            .sortBy("user_id")
            .mode("append")
        )
        if not spark.catalog.tableExists(tbl):
            writer = writer.option("path", data)
        writer.saveAsTable(tbl)

    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            stream.writeStream.foreachBatch(_apply)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    from ..functions.stable import _units as to_units

    return (
        spark.table(tbl)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(to_units(F.coalesce(F.col("value"), F.lit(0.0))))
            .cast("bigint")
            .alias("value_units"),
        )
    )


def q_streaming_bucketed_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    return streaming_bucketed_ingest(spark, sf_dir)


# Exact oracle over the batch source: the stream delivered every event
# twice and the event_id dedup kept exactly one copy, so the ingested
# table's per-user rollup equals the plain batch aggregate.
ORACLES["streaming_bucketed_ingest"] = """
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(COALESCE(value, 0.0) * 10000 + 0.5) AS BIGINT))
            AS BIGINT) AS value_units
FROM events GROUP BY user_id
"""
