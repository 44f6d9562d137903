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
    # -- r17 (OPTIMIZATION round 2) window, fail-closed first:
    # (a) queries whose CONTRACT FINGERPRINT or operator internals
    #     changed this round (plan restructures: the single multi-
    #     carving passes; behavior-internal changes: kernel Lloyd
    #     training, the scored-frame cache, the prune-cache release —
    #     results all re-proven against their oracles at sf0.001+sf0.01
    #     by local parity before shipping, but the official record
    #     re-earns its green fail-closed) --
    "embedding_lsh_tuning",
    "minhash_band_tuning",
    "ccnet_ppl_thresholds",
    "ann_pq_adc_topk",
    "ann_pq_serve",
    "pq_codebook",
    "ann_ivf_kmeans_topk",
    "ann_ivf_kmeans_serve",
    "kmeans_embeddings",
    "cluster_representatives",
    "bm25_prune",
    "bm25_prune_kw",
    "bm25_prune_stats",
    # (b) the r11-aged official cohort (r16 verdict #4 — spilled from
    #     BOTH the r15 and r16 windows; their newest official green is
    #     r11 while local parity has re-verified them every session
    #     since).  kmeans_embeddings and minhash_band_tuning from that
    #     cohort already hold (a) seats above. --
    "chunk_dedup",
    "corr_profile",
    "cube_summary",
    "customer_order_distribution",
    "decontaminate_docs",
    "dedup_first_lineitem",
    "dominant_part_suppliers",
    "dsir_weights",
    "duplicate_clusters",
    "format_interchange",
    "fulfillment_lag",
    "graph_pagerank",
    "graph_pagerank_by_region",
    "heavy_hitters_by_lang",
    "histogram_profile",
    "lang_guess",
    "leakage_safe_split",
    "min_cost_supplier",
    "ngram_counts",
    "payload_stats",
    "pivot_status_priority",
    "quality_gates",
    "ship_latency_priority",
    "small_qty_revenue",
    "source_mix",
    "substring_dup_coverage",
    "top_supplier_revenue",
    "top_terms",
    "tpch_q1",
    # (c) remaining seats: the oldest r12-aged records, alphabetic
    #     (ccnet_ppl_thresholds from that cohort holds an (a) seat) --
    "bpe_encode_stats",
    "bpe_merges",
    "dedup_keep_best",
    "disjunctive_revenue",
    "distinct_counts",
    "doc_fingerprints",
    "drift_compare",
    "dsir_select_threshold",
    # Below the 50-entry window: everything else carries an r12-r16
    # official green against current testdata and unchanged code.
    # POLICY (r15 verdict #2): streaming_state_metrics stays demoted
    # below the cut permanently — no SQL twin by nature (`err:
    # no_oracle` every round); pinned by tests/ instead (SURVEY §5).
    # scripts/window_audit.py tracks staleness (contract fingerprints);
    # local parity re-verifies the full surface each session at two SFs.
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
