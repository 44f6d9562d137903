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
    # -- r16 (OPTIMIZATION round) window: the round's contract changes
    #    come first.  r16 moved the embedding family's interpreted HOF
    #    folds into Arrow/NumPy kernels (bit-identical arithmetic,
    #    functions/veckernels.py), deduped the bm25_prune exchanges, and
    #    fixed the fingerprint normalizer's bucketed-digest blind spot —
    #    every query whose committed contract fingerprint changed (plan
    #    hash: the kernels are MapInArrow nodes; the bucketed five: the
    #    normalizer now strips their mtime-derived digests) must re-earn
    #    its green in the window, fail-closed.
    # (a) never-green (the interrupted r16 build's 7 new operators) --
    "bm25_prune",
    "bm25_prune_kw",
    "bm25_prune_stats",
    "pack_kway",
    "pack_waste_report",
    "perceptron_serve",
    "linreg_serve",
    # (b) r16 optimization contract changes (kernel swaps, exchange
    #     dedup, PQ narrow code table; every one re-proven against its
    #     oracle at sf0.001+sf0.01 by the local parity suite first) --
    "ann_int8_rerank",
    "ann_ivf_kmeans_serve",
    "ann_ivf_kmeans_topk",
    "ann_ivf_topk",
    "ann_jl_rerank",
    "ann_jl_serve",
    "ann_lsh_serve",
    "ann_lsh_topk",
    "ann_pq_adc_topk",
    "ann_pq_serve",
    "cross_modal_dedup",
    "embedding_lsh_tuning",
    "embedding_near_dup",
    "embedding_near_dup_lsh",
    "embedding_near_dup_mp",
    "embedding_near_dup_serve",
    "hard_negative_mining",
    "knn_classify",
    "knn_cosine",
    "lsh_index_refresh",
    "pq_codebook",
    "semantic_dedup",
    "semantic_dedup_serve",
    # (c) the bucketed five: fingerprints churned by the r16 normalizer
    #     fix (derived-digest strip — no semantic change, but the audit
    #     cannot know that, so they re-earn greens fail-closed) --
    "bucketed_cdc_apply",
    "bucketed_compaction",
    "bucketed_ingest_join",
    "bucketed_late_shipments",
    "bucketed_sessionization",
    # (d) the interrupted build's fail-closed re-checks (implementations
    #     changed in its commits; carried over) + perceptron_lang_clf,
    #     whose training loop internals changed this round (mis-cache,
    #     array-indexed weight lookup — fingerprint-invariant because
    #     its plan is the driver-built trajectory frame, so it is
    #     windowed explicitly; it is also in the r11-aged cohort) --
    "streaming_bucketed_ingest",
    "image_band_tuning",
    "bm25_serve",
    "perceptron_lang_clf",
    # (e) inherited stale spans (window_audit): the interrupted build's
    #     commits modified these functions' source spans after their
    #     last official green (bm25_topk/bm25_index_refresh via the
    #     _bm25_ensure_postings extraction; bpe_encode_serve and
    #     dedup_rate_by_source via older in-span edits the audit dates
    #     past their records) — re-earned here, fail-closed --
    "bm25_topk",
    "bm25_index_refresh",
    "bpe_encode_serve",
    "dedup_rate_by_source",
    # -- remaining seats: the r11-aged cohort (r15 verdict #1), oldest
    #    official records first (alphabetic).  The rest of that cohort
    #    (dedup_first_lineitem, dominant_part_
    #    suppliers, dsir_select, dsir_weights, duplicate_clusters,
    #    format_interchange, fulfillment_lag, graph_pagerank,
    #    graph_pagerank_by_region, heavy_hitters_by_lang,
    #    histogram_profile, kmeans_embeddings, lang_guess,
    #    leakage_safe_split, min_cost_supplier, minhash_band_tuning,
    #    ngram_counts, payload_stats, pivot_status_priority,
    #    quality_gates, ship_latency_priority, small_qty_revenue,
    #    source_mix, substring_dup_coverage, top_supplier_revenue,
    #    top_terms, tpch_q1) spills to the r17 window — this round's
    #    contract changes take fail-closed priority over aged-but-
    #    unchanged records (local parity still re-verifies every pair
    #    at two SFs each session) --
    "approx_quantile_profile",
    "attribution_asof",
    "bloom_sized_decontaminate",
    "ccnet_ppl_buckets",
    "char_lm_doc_counts",
    "char_lm_model",
    # dsir_select: r11 green, span modified in 4240fb4d (pre-existing
    # staleness, same class as group (e)) — takes the seat chunk_dedup
    # (fresh-but-aged) would otherwise fill
    "dsir_select",
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
