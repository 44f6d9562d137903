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
    # -- r9 new operators (never-green, must be in-window): the JL
    #    random-projection ring (map-only 64->32 compression + the
    #    projected-candidate/exact-rerank ANN), the Morton-vs-linear
    #    layout study, the Bloom-bitset decontamination prefilter, the
    #    stream-stream LEFT OUTER interval join (watermark-gated null
    #    emission under the min multiple-watermark policy), integer-unit
    #    PageRank, the UniMax epoch waterfill, the cluster-aware
    #    split-hygiene report, and the real-container audio (RIFF/WAVE)
    #    and video (concatenated-P6 frame stream) decode kernels --
    "jl_projection",
    "ann_jl_rerank",
    "zorder_pruning",
    "bloom_decontaminate",
    "streaming_error_orphans",
    "graph_pagerank",
    "mixture_epochs",
    "leakage_safe_split",
    "multimodal_decode_wav",
    "multimodal_decode_ppm_stream",
    # -- changed in r9, fail-closed re-check: ann_lsh_topk's candidate
    #    join/dedup reshaped to move codes instead of embeddings
    #    (bit-identical per local parity); multimodal_decode_ppm's
    #    _ppm_header helper gained malformed-input rejections (valid
    #    payloads decode unchanged, but the helper sits outside the
    #    tracked spans, so the record is re-earned rather than argued) --
    "ann_lsh_topk",
    "multimodal_decode_ppm",
    # -- the ten r5 records the r8 rotation spilled (committed there as
    #    r9 MUST-window; after these re-green, no official record is
    #    older than r6) --
    "row_count",
    "null_fractions",
    "recent_errors",
    "point_lookup",
    "status_metrics",
    "revenue_by_nation",
    "rollup_summary",
    "setop_except",
    "setop_intersect",
    "order_priority_check",
    # -- 28 of the 42 r6-aged records, oldest-first rotation.  The 14
    #    displaced by the forced slots above — format_interchange,
    #    fulfillment_lag, heavy_hitters_by_lang, histogram_profile,
    #    lang_guess, ngram_counts, payload_stats, pivot_status_priority,
    #    quality_gates, small_qty_revenue, source_mix,
    #    top_supplier_revenue, top_terms, tpch_q1 — are the simplest,
    #    most change-isolated of the cohort (single-table scans/aggs/
    #    filter stacks, pivots, footer reads, the self-contained format
    #    roundtrip, and the grouped twin of in-window heavy_hitters;
    #    all local-parity green today).  They spill to r10 oldest-first
    #    per the rotation policy: r10 MUST window these fourteen. --
    "dup_ngram_coverage",
    "embedding_norm_stats",
    "embedding_quant_codebook",
    "exact_dedup_docs",
    "funnel_conversion",
    "heavy_hitters",
    "kll_quantile_drift",
    "knn_cosine",
    "label_centroids",
    "minhash_lsh_pairs",
    "mixture_resample",
    "pack_sequences",
    "pii_scrub",
    "referential_orphans",
    "repetition_ratio",
    "salted_hot_key_agg",
    "shard_manifest",
    "stratified_sample",
    "streaming_cardinality_profile",
    "streaming_churn_profile",
    "streaming_dedup_jittered",
    "streaming_enriched_counts",
    "streaming_session_windows",
    "streaming_sketch_rollup",
    "text_quality",
    "token_stats_by_lang",
    "train_val_split",
    "vocab_growth",
    # Below the 50-entry window: everything else carries an r7 or r8
    # official green against current testdata and unchanged code.
    # scripts/window_audit.py tracks staleness (spans + fingerprints);
    # local parity re-verifies the full surface each session at
    # sf0.001+sf0.01.
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
