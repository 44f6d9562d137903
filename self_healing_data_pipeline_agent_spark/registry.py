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
from .operators import sketches as _sketches
from .operators import text as _text
from .sources import formats as _formats
from .streaming import events as _streaming_events

QueryFn = Callable[[SparkSession, str], DataFrame]

_MODULES = [
    _relational, _events, _text, _similarity, _sketches, _multimodal,
    _streaming_events, _formats,
]

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
    # -- r7 rotation.  Priority 1: the char-LM bisect trio (VERDICT r6
    #    next-round #1) — the twice-red banded score, now whole-bit
    #    banded, plus its two new divergence-localizing twins --
    "char_lm_perplexity",
    "char_lm_doc_counts",
    "char_lm_model",
    # -- new operators in r7: cross-doc duplicated-substring spans
    #    (Lee et al. 2022-style), the per-source curation scorecard,
    #    and the streaming profile-table retention compaction --
    "substring_dup_spans",
    "substring_dup_coverage",
    "source_scorecard",
    "streaming_profile_compaction",
    "ann_int8_rerank",
    # -- 40 of the 46 r4-aged official records (VERDICT r6 next-round
    #    #2: no record should age past ~3 rounds).  All local-parity
    #    green today; the remaining SIX r4 records (distinct_counts,
    #    distinct_event_types, anti_join_no_f_orders,
    #    approx_distinct_counts, ann_ivf_topk, cohort_retention —
    #    untouched ops) plus the 44 r5 records must BOTH rotate in
    #    the r8 window: all 50 of its slots are spoken for, so r8 is a
    #    pure rotation round (next new-operator slot opens in r9).
    #    frequent_items_sketch and rolling_fingerprints re-enter: their
    #    r6-green spans were touched in r7 (docstring edit / one-pass
    #    window fuse), and the official record should describe the
    #    committed code. --
    "frequent_items_sketch",
    "rolling_fingerprints",
    "activity_streaks",
    "ann_lsh_topk",
    "anomaly_zscore",
    "approx_quantile_profile",
    "attribution_asof",
    "chunk_dedup",
    "corr_profile",
    "cube_summary",
    "customer_order_distribution",
    "decontaminate_docs",
    "dedup_first_lineitem",
    "dedup_keep_best",
    "disjunctive_revenue",
    "doc_fingerprints",
    "drift_compare",
    "duplicate_clusters",
    "error_context_join",
    "grouped_drift_profile",
    "incremental_dedup",
    "key_skew_profile",
    "mad_outlier_profile",
    "multimodal_features",
    "multimodal_frame_sample",
    "multimodal_resize",
    "normalize_text",
    "profit_by_nation_year",
    "psi_drift",
    "scd2_priority_history",
    "session_concurrency",
    "simhash_near_dup_blocked",
    "stateful_sessions",
    "stats_profile",
    "streaming_dedup_hourly",
    "streaming_dq_profile",
    "streaming_error_context",
    "streaming_hourly_counts",
    "topk_orders_per_priority",
    "tpch_q10",
    "tpch_q7",
    "tpch_q8",
    # Below the 50-entry window: everything else carries an r5 or r6
    # official green against current testdata and unchanged code.
    # scripts/window_audit.py tracks staleness; local parity re-verifies
    # the full surface each session at sf0.001+sf0.01.
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
