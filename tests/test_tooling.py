"""Tests for the round tooling: the stale-green window audit and the
benchmark's failure guards.  Pure-Python (no Spark session needed)."""

from __future__ import annotations

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_script(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "scripts", f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_official_greens_tracks_latest_round():
    """A query green in multiple rounds must report its LATEST round; reds
    must not register.  Checked against the real CORRECTNESS files."""
    wa = _load_script("window_audit")
    greens = wa.official_greens()
    # known facts from the committed records
    assert greens["tpch_q1"] >= 1  # green since round 1
    assert greens["tpch_q7"] >= 3  # first green in round 3
    # the r3 streaming reds must NOT have an r3 green; r1/r2 greens may
    # exist for the stale trio, but the never-green ones are absent
    r3 = json.load(open(os.path.join(REPO, "CORRECTNESS_r03.json")))
    for name, rec in r3.items():
        if rec.get("hash_match") is False and name not in {
            k for k, v in greens.items() if v < 3
        }:
            assert greens.get(name) != 3, f"{name} red in r3 but counted green"


def test_window_audit_report_structure():
    wa = _load_script("window_audit")
    report = wa.audit()
    from self_healing_data_pipeline_agent_spark.registry import all_queries

    assert set(report) == set(all_queries())
    for name, entry in report.items():
        assert entry["status"] in ("fresh", "stale?", "never-green")
        assert isinstance(entry["position"], int)
    # the audit's own invariant: nothing untrustworthy outside the window
    outside = [
        n for n, e in report.items()
        if e["status"] in ("never-green", "stale?") and not e["in_window"]
    ]
    assert outside == [], f"untrustworthy queries outside window: {outside}"


def test_bench_duckdb_guard_skips_broken_oracle(monkeypatch):
    """One broken oracle must cost only its own row, not the comparison
    column."""
    sys.path.insert(0, REPO)
    import bench

    from self_healing_data_pipeline_agent_spark import registry

    real = registry.all_oracles()
    fake = dict(real)
    fake["row_count"] = "SELECT * FROM definitely_missing_table"
    monkeypatch.setattr(registry, "all_oracles", lambda: fake)
    timings = bench._bench_duckdb(
        ["row_count", "exact_dedup_docs"], "/root/testdata/sf0.001"
    )
    assert "row_count" not in timings
    assert "exact_dedup_docs" in timings
