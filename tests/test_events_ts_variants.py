"""Both physical variants of events.ts must normalize identically.

The driver's testdata has shipped ``ts`` as parquet TIMESTAMP(NANOS)
(rounds 1-2) and TIMESTAMP(MICROS, NTZ) (round 3+).  The live testdata only
exercises one branch of the shared reader at a time, so the other branch
would rot silently — these tests synthesize BOTH variants from the same
rows and assert batch and streaming readers agree bit-for-bit.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from self_healing_data_pipeline_agent_spark.sources.tables import (
    events_ts_info,
    events_ts_unit,
    load_table,
)

ROWS = 10

# physical variants the testdata has shipped (or plausibly could):
# INT64 nanos, micros NTZ, micros UTC-adjusted.
VARIANTS = ("ns", "us", "us_tz")


def _events_frame(variant: str) -> pa.Table:
    unit = variant.split("_")[0]
    tz = "UTC" if variant.endswith("_tz") else None
    ts = pd.to_datetime(
        [f"2024-01-01 00:{m:02d}:00.123456" for m in range(ROWS)]
    ).astype(f"datetime64[{unit}]")
    return pa.table(
        {
            "event_id": pa.array(range(ROWS), pa.int64()),
            "ts": pa.array(ts, pa.timestamp(unit, tz=tz)),
            "user_id": pa.array([i % 3 for i in range(ROWS)], pa.int64()),
            "event_type": pa.array(
                ["click" if i % 2 else "error" for i in range(ROWS)]
            ),
            "value": pa.array([float(i) for i in range(ROWS)], pa.float64()),
            "props": pa.array(["{}"] * ROWS),
        }
    )


@pytest.fixture
def variant_dirs(tmp_path):
    """sf-style dirs with the SAME events, one per physical ts variant."""
    dirs = {}
    for variant in VARIANTS:
        d = tmp_path / variant
        d.mkdir()
        # version='2.6' keeps nanos as TIMESTAMP(NANOS) instead of
        # coercing — the exact shape rounds 1-2 shipped.
        pq.write_table(_events_frame(variant), d / "events.parquet", version="2.6")
        dirs[variant] = str(d)
    return dirs


def test_footer_probe_detects_all_variants(variant_dirs):
    assert events_ts_unit(variant_dirs["ns"]) == "ns"
    assert events_ts_unit(variant_dirs["us"]) == "us"
    assert events_ts_info(variant_dirs["ns"]) == ("ns", False)
    assert events_ts_info(variant_dirs["us"]) == ("us", False)
    assert events_ts_info(variant_dirs["us_tz"]) == ("us", True)


def test_probe_raises_on_unrecognized_ts(tmp_path):
    bad = pa.table({"event_id": pa.array([1], pa.int64()),
                    "ts": pa.array(["2024"], pa.string())})
    d = tmp_path / "bad"
    d.mkdir()
    pq.write_table(bad, d / "events.parquet")
    with pytest.raises(ValueError, match="unrecognized"):
        events_ts_unit(d)


def test_batch_loader_normalizes_all_variants_identically(spark, variant_dirs):
    rows = {
        v: sorted(
            tuple(r) for r in load_table(spark, variant_dirs[v], "events").collect()
        )
        for v in VARIANTS
    }
    assert rows["ns"] == rows["us"] == rows["us_tz"]
    # micros precision survives normalization (not truncated to seconds)
    assert rows["ns"][0][1].microsecond == 123456


def test_readers_do_not_mutate_session_confs(spark, variant_dirs):
    """No load path flips session confs as a side effect — nanosAsLong is
    pinned once by session.get_spark; readers only guard on it."""
    tracked = (
        "spark.sql.legacy.parquet.nanosAsLong",
        "spark.sql.session.timeZone",
    )
    before = {k: spark.conf.get(k) for k in tracked}
    assert before["spark.sql.legacy.parquet.nanosAsLong"] == "true"
    # non-events load, then every events variant (batch)
    load_table(spark, variant_dirs["ns"], "events").collect()
    load_table(spark, variant_dirs["us"], "events").collect()
    assert {k: spark.conf.get(k) for k in tracked} == before


def test_nanos_guard_raises_on_foreign_session_conf(spark, variant_dirs):
    """A session without the pinned conf must fail loudly on nanos data,
    not silently misread or mutate the conf."""
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    try:
        with pytest.raises(RuntimeError, match="nanosAsLong"):
            load_table(spark, variant_dirs["ns"], "events")
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def test_utc_guard_raises_not_asserts(spark, variant_dirs):
    """The UTC session-zone invariant survives `python -O` (RuntimeError,
    not a strippable assert)."""
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        with pytest.raises(RuntimeError, match="timeZone=UTC"):
            load_table(spark, variant_dirs["us"], "events")
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_streaming_reader_matches_batch_for_all_variants(spark, variant_dirs):
    from self_healing_data_pipeline_agent_spark.streaming.events import (
        streaming_hourly_counts,
    )

    for unit in VARIANTS:
        # watermark 0s: the finite availableNow run emits every closed
        # window; all ROWS events land in the single 00:00 hour, which
        # never closes (max event time is inside it) — so assert the
        # stream ran and emitted nothing, then widen with a batch check.
        result = streaming_hourly_counts(
            spark, variant_dirs[unit], watermark="0 seconds"
        ).collect()
        assert result == []


def test_streaming_window_emission_for_both_variants(spark, variant_dirs, tmp_path):
    """Spread events across 3 hours so append mode emits closed windows;
    both physical variants must produce the same windows and counts."""
    from self_healing_data_pipeline_agent_spark.streaming.events import (
        streaming_hourly_counts,
    )

    emitted = {}
    for variant in VARIANTS:
        unit = variant.split("_")[0]
        tz = "UTC" if variant.endswith("_tz") else None
        ts = pd.to_datetime(
            ["2024-01-01 00:10:00", "2024-01-01 00:50:00",
             "2024-01-01 01:30:00", "2024-01-01 02:45:00"]
        ).astype(f"datetime64[{unit}]")
        tbl = pa.table(
            {
                "event_id": pa.array(range(4), pa.int64()),
                "ts": pa.array(ts, pa.timestamp(unit, tz=tz)),
                "user_id": pa.array([0, 1, 0, 1], pa.int64()),
                "event_type": pa.array(["click"] * 4),
                "value": pa.array([0.0] * 4, pa.float64()),
                "props": pa.array(["{}"] * 4),
            }
        )
        d = tmp_path / f"spread_{variant}"
        d.mkdir()
        pq.write_table(tbl, d / "events.parquet", version="2.6")
        rows = streaming_hourly_counts(spark, str(d), watermark="0 seconds").collect()
        emitted[variant] = sorted((r["window_start"], r["n_events"]) for r in rows)

    assert emitted["ns"] == emitted["us"] == emitted["us_tz"]
    # hours 00 and 01 closed (max event time 02:45 past their end); 02 open
    starts = [w.strftime("%H") for w, _ in emitted["ns"]]
    counts = [n for _, n in emitted["ns"]]
    assert starts == ["00", "01"]
    assert counts == [2, 1]
