"""Testdata-drift tripwire.

Round 3 post-mortem: the driver's ``events.ts`` column silently migrated
from parquet TIMESTAMP(NANOS) to TIMESTAMP(MICROS) mid-round.  Batch
queries were fixed, but the streaming readers kept the nanos schema and
compressed event time 1000x — and three OFFICIALLY GREEN queries went
stale with no signal, because the correctness gate only re-checks the
first 50 registry entries per round.

This test pins the physical arrow type of every column of every testdata
table against a committed manifest.  A mismatch means the testdata format
changed again: fail LOUDLY at the start of the suite, before hundreds of
downstream oracle mismatches obscure the cause.

On failure: (1) audit every operator reading the changed column (event-time
ops for ts, text ops for documents, ANN for embeddings), (2) front-load the
affected queries in ``registry.QUERY_ORDER`` so their official record is
refreshed, (3) regenerate the manifest deliberately (the generator is in
this file's docstring below).

Regenerate with:
    python -c "
import json, pyarrow.parquet as pq
tables = ['region','nation','customer','supplier','part','orders',
          'lineitem','events','documents','embeddings']
m = {t: {f.name: str(f.type) for f in
         pq.ParquetFile(f'/root/testdata/sf0.001/{t}.parquet').schema_arrow}
     for t in tables}
print(json.dumps(m, indent=2))"
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import pyarrow.parquet as pq
import pytest

MANIFEST = Path(__file__).parent / "testdata_manifest.json"
SF_DIRS = ["sf0.001", "sf0.01", "sf0.1"]
TESTDATA_ROOT = Path(os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"))


def _actual_schema(sf: str, table: str) -> dict[str, str]:
    path = TESTDATA_ROOT / sf / f"{table}.parquet"
    fp = path if path.is_file() else sorted(path.glob("**/*.parquet"))[0]
    return {f.name: str(f.type) for f in pq.ParquetFile(str(fp)).schema_arrow}


@pytest.mark.parametrize("sf", SF_DIRS)
def test_testdata_schema_matches_manifest(sf):
    expected = json.loads(MANIFEST.read_text())["tables"]
    if not (TESTDATA_ROOT / sf).exists():
        pytest.skip(f"{sf} not present")
    drift = {}
    for table, cols in expected.items():
        actual = _actual_schema(sf, table)
        if actual != cols:
            drift[table] = {
                "expected": cols,
                "actual": actual,
            }
    assert not drift, (
        "TESTDATA FORMAT CHANGED — previously-green queries may now be "
        "silently wrong (see r3: events.ts nanos->micros broke the whole "
        "streaming ring while its official record stayed green).  "
        "Re-verify every operator touching the drifted columns, front-load "
        "the affected queries in registry.QUERY_ORDER, then regenerate "
        f"tests/testdata_manifest.json deliberately.  Drift: "
        f"{json.dumps(drift, indent=2)}"
    )


def test_events_ts_unit_probe_agrees_with_manifest():
    """The shared batch/streaming unit probe must see the manifest's unit —
    guards the probe itself against bit-rot if the manifest is updated."""
    from self_healing_data_pipeline_agent_spark.sources.tables import events_ts_unit

    manifest_ts = json.loads(MANIFEST.read_text())["tables"]["events"]["ts"]
    expected_unit = "us" if "[us" in manifest_ts else "ns"
    assert events_ts_unit(TESTDATA_ROOT / "sf0.001") == expected_unit


@pytest.mark.parametrize("sf", SF_DIRS)
def test_no_error_interval_ends_on_watermark_boundary(sf):
    """Guard for the streaming_error_orphans oracle's strict-'<' eviction
    model (streaming/events.py ORACLES): the batch twin hard-codes Spark
    watermark internals — ms-floored max event time, ``min`` multiple-
    watermark policy, strict '<' at the eviction boundary.  Those are
    empirically pinned today but version- and data-dependent: an error
    event whose +5-minute match-interval end landed EXACTLY on the
    ms-floored watermark would make null emission depend on which side
    of the tie the engine takes.  Assert the testdata never produces
    that tie, so a future flip would be a loud oracle mismatch (parity
    suite) rather than a silent coin-toss."""
    import duckdb

    if not (TESTDATA_ROOT / sf).exists():
        pytest.skip(f"{sf} not present")
    events = TESTDATA_ROOT / sf / "events.parquet"
    ties = duckdb.sql(f"""
        WITH wm AS (
          SELECT date_trunc('milliseconds',
                   LEAST((SELECT MAX(ts) FROM '{events}'
                           WHERE event_type = 'error'),
                         (SELECT MAX(ts) FROM '{events}'
                           WHERE event_type IN ('click', 'view'))))
                 - INTERVAL 2 HOUR AS w
        )
        SELECT COUNT(*) FROM '{events}' e, wm
        WHERE e.event_type = 'error'
          AND e.ts + INTERVAL 300 SECOND = wm.w
    """).fetchone()[0]
    assert ties == 0, (
        f"{ties} error event(s) end exactly on the ms-floored watermark — "
        "the streaming_error_orphans oracle's strict-'<' eviction model is "
        "ambiguous for them; re-pin the boundary against the running Spark "
        "version before trusting the official record."
    )
