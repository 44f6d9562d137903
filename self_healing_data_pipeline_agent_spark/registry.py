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
    # -- r8 forced slots (VERDICT r7 items 1-3 + the two new rings).
    #    char_lm_perplexity: never-green r5-r7; the oracle's uncast
    #    SUM(tf) (DuckDB HUGEINT vs Spark BIGINT) is now CAST — the
    #    dtype_audit-confirmed root cause.  substring_dup_spans:
    #    positions recast to bigint (same dtype class, was driver-
    #    tolerated).  tpch_q8 / embedding_near_dup(+lsh) /
    #    idle_rich_customers / payload_dedup: the four vacuous
    #    empty-set greens, re-contracted to be non-empty at every SF
    #    (region constant, corpus-calibrated threshold, idle-since
    #    cutoff, block-level dedup) — each must re-green on VALUES. --
    "char_lm_perplexity",
    "substring_dup_spans",
    "tpch_q8",
    "embedding_near_dup",
    "embedding_near_dup_lsh",
    "idle_rich_customers",
    "payload_dedup",
    # -- new operators in r8: the codec registry's real-container path
    #    (pure-Python PPM P6 decode through the same gate real codecs
    #    use) and the second-tier retention compaction (month rows
    #    union ALREADY-merged week sketches — two KLL merge levels) --
    "multimodal_decode_ppm",
    "streaming_profile_compaction2",
    # -- caught by the r8 oracle-span upgrade of window_audit: the r7
    #    DUCK_CONTAM_CTES dedup rewrote this oracle AFTER its r6 green
    #    (values unchanged per local parity, but the fail-closed policy
    #    says the record must describe the committed contract) --
    "contamination_score",
    # -- the six r4 records deferred from the r7 rotation --
    "ann_ivf_topk",
    "anti_join_no_f_orders",
    "approx_distinct_counts",
    "cohort_retention",
    "distinct_counts",
    "distinct_event_types",
    # -- 34 of the 44 r5-aged records.  The 9 forced slots above
    #    displace: row_count, null_fractions, recent_errors,
    #    point_lookup, status_metrics, revenue_by_nation,
    #    rollup_summary, setop_except, setop_intersect, plus
    #    order_priority_check for the contamination_score slot — the simplest,
    #    most change-isolated queries in the r5 cohort (single-table
    #    scans/aggs and set ops untouched since r2; all local-parity
    #    green today).  They spill to r9 oldest-first per the rotation
    #    policy (no official record older than ~3 rounds after r9). --
    "chunk_with_overlap",
    "concentrated_value_parts",
    "curate_corpus",
    "customer_churn_sketch",
    "grouped_dq_profile",
    "healing_proposals",
    "hll_distinct_profile",
    "hourly_windows",
    "jaccard_pairs",
    "json_extract",
    "kll_quantile_bounds",
    "large_volume_customers",
    "late_data_profile",
    "merge_upsert_orders",
    "one_pass_profile",
    "order_lag_lead",
    "prefix_filter_jaccard",
    "promo_revenue_share",
    "quantile_profile",
    "regional_supplier_volume",
    "rolling_order_totals",
    "semantic_dedup",
    "semi_join_open_orders",
    "sessionization",
    "shipping_priority",
    "simhash_fingerprints",
    "simhash_near_dup",
    "sliding_windows",
    "sole_late_supplier",
    "supplier_part_breadth",
    "tfidf_top_terms",
    "theta_priority_overlap",
    "tpch_q6",
    "user_rolling_hour",
    # Below the 50-entry window: everything else carries an r6 or r7
    # official green against current testdata and unchanged code
    # (substring_dup_coverage stays out deliberately: its r7 record is
    # fresh, the spans dtype fix changes only an intermediate column's
    # width, and its output schema/values are pinned unchanged by local
    # parity).  scripts/window_audit.py tracks staleness; local parity
    # re-verifies the full surface each session at sf0.001+sf0.01.
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
