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
    # -- r16 new operators (never-green): MaxScore-safe pruned BM25
    #    serving (r15 verdict #3) — the doc-as-query twin shares
    #    bm25_topk's oracle (safe pruning must return the EXACT
    #    exhaustive top-k), the keyword twin has its own exhaustive
    #    oracle, and the stats report oracle-checks the scored/skipped
    #    dial for both regimes --
    "bm25_prune",
    "bm25_prune_kw",
    "bm25_prune_stats",
    # (also never-green): k-way boundary-respecting packing (verdict
    #    #5) — rank-striped snake assignment + prefix-fit, one shuffle —
    #    and the cross-packer waste report (chunk vs pairs vs kway, per
    #    lang, each leg derived from its own declared query's frame) --
    "pack_kway",
    "pack_waste_report",
    # (also never-green): the trained perceptron served map-only from a
    #    stored model blob (verdict #6 — the X32 posture on X28), and the
    #    regression twin (the verdict's missing-note named BOTH models):
    #    stored per-priority (slope, intercept) + map-only residual
    #    diagnostics --
    "perceptron_serve",
    "linreg_serve",
    # -- r16 fail-closed re-checks: implementations changed this round —
    #    streaming_bucketed_ingest (deterministic per-session table +
    #    effective reset, r15 ADVICE), image_band_tuning (eager 3-row
    #    report + study-cache unpersist, r15 ADVICE), bm25_serve (build
    #    moved into the shared _bm25_ensure_postings helper + build-cache
    #    unpersist), perceptron_lang_clf (training loop extracted into
    #    the shared _perc_train the serve twin stores) --
    "streaming_bucketed_ingest",
    "image_band_tuning",
    "bm25_serve",
    # -- the 40 r11-aged spill queries (r15 verdict #1 / the r15
    #    registry's own "r16 MUST-window" list): their official greens
    #    date to r11 against current testdata; re-earned here.
    #    perceptron_lang_clf doubles as the fourth fail-closed re-check
    #    (it is in this cohort anyway) --
    "approx_quantile_profile",
    "attribution_asof",
    "bloom_sized_decontaminate",
    "ccnet_ppl_buckets",
    "char_lm_doc_counts",
    "char_lm_model",
    "chunk_dedup",
    "corr_profile",
    "cube_summary",
    "customer_order_distribution",
    "decontaminate_docs",
    "dedup_first_lineitem",
    "dominant_part_suppliers",
    "dsir_select",
    "dsir_weights",
    "duplicate_clusters",
    "format_interchange",
    "fulfillment_lag",
    "graph_pagerank",
    "graph_pagerank_by_region",
    "heavy_hitters_by_lang",
    "histogram_profile",
    "kmeans_embeddings",
    "lang_guess",
    "leakage_safe_split",
    "min_cost_supplier",
    "minhash_band_tuning",
    "ngram_counts",
    "payload_stats",
    "perceptron_lang_clf",
    "pivot_status_priority",
    "pq_codebook",
    "quality_gates",
    "ship_latency_priority",
    "small_qty_revenue",
    "source_mix",
    "substring_dup_coverage",
    "top_supplier_revenue",
    "top_terms",
    "tpch_q1",
    # -- r12-aged filler (the oldest remaining official records after
    #    the r11 cohort clears; alphabetic enumeration of the r12
    #    cohort): 2 fit below; the rest (bpe_encode_serve,
    #    bpe_encode_stats, bpe_merges, ccnet_ppl_thresholds,
    #    dedup_keep_best, disjunctive_revenue, distinct_counts,
    #    doc_fingerprints, drift_compare, dsir_select_threshold,
    #    embedding_near_dup_mp, ...) spill to the r17 window — r17
    #    MUST-window those with whatever else ages out (no filler fits
    #    this round: new never-green operators took the last seats) --
    # Below the 50-entry window: everything else carries an r11-r15
    # official green against current testdata and unchanged code.
    # POLICY (r15 verdict #2): streaming_state_metrics is demoted below
    # the cut permanently — it has no SQL twin by nature, so the driver
    # records `err: no_oracle` every round and the slot can never earn a
    # green; its behavior is pinned by tests/ (pytest-only verification,
    # documented in SURVEY §5), and the seat is worth more as an aged
    # re-green.  scripts/window_audit.py tracks staleness (contract
    # fingerprints); local parity re-verifies the full surface each
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
