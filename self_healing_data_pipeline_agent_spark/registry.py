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
    # -- r10/r11 new operators (never-green, must be in-window): the
    #    per-region partitioned PageRank fixpoint, the footer-probe-sized
    #    Bloom decontamination companion (demonstrates the ~10 bits/elem
    #    sizing rule vs bloom_decontaminate's deliberate saturation), the
    #    distributed BPE merge-induction loop (count -> argmax -> map-only
    #    rewrite, merge table checked cross-engine), and the streaming
    #    state-size observability probe (rows-only: progress metrics have
    #    no SQL twin) --
    "graph_pagerank_by_region",
    "bloom_sized_decontaminate",
    "bpe_merges",
    "streaming_state_metrics",
    # -- r11 new operators (never-green): the last three TPC-H shapes —
    #    Q2's correlated per-part MIN, Q12's two-class conditional
    #    counting, Q20's nested semi-join chain — adapted onto lineitem
    #    as the observed part-supplier relation (X5 is now 22/22) --
    "min_cost_supplier",
    "ship_latency_priority",
    "dominant_part_suppliers",
    # -- r11 second wave (never-green): the tokenizer APPLY half of the
    #    BPE ring — encode every document through the learned merge chain
    #    and report per-language compression in exact BIGINTs — and
    #    integer-unit Lloyd k-means over the quantized embeddings (the
    #    clustering fixpoint joining PageRank and connected components in
    #    the value-hash-checked iterative family) --
    "bpe_encode_stats",
    "kmeans_embeddings",
    # -- and the linear-algebra fixpoint: dominant principal direction
    #    by integer power iteration over the distributed Gram matrix --
    "embedding_top_pc",
    # -- r11 third wave (never-green): IVF over LEARNED centroids — the
    #    Lloyd codebook feeding an ANN index (train -> assign -> probe ->
    #    exact rerank), assignment/probing as narrow maps against the
    #    integer codebook, recall 0.92 vs exact at sf0.001/0.01 --
    "ann_ivf_kmeans_topk",
    # -- and the DSIR ring (Xie et al. 2023, never-green): hashed-ngram
    #    importance weights (target = lang 'en' vs raw corpus, md5-prefix
    #    buckets, log-ratio quantized once to 1e-6 units — exact BIGINT
    #    per-doc scores) and the top-1/5 resampling report showing the
    #    mixture shift toward the target language --
    "dsir_weights",
    "dsir_select",
    # -- and the in-engine TRAINED MODEL (never-green): a batch
    #    perceptron over the DSIR feature space (lang='en' vs rest),
    #    updates = integer sums over misclassified docs, so the whole
    #    training trajectory is order-independent and value-hash-exact
    #    (no floats anywhere — the third driver-loop fixpoint family
    #    member after PageRank and Lloyd) --
    "perceptron_lang_clf",
    # -- and the selection rule the char-LM scores exist to drive
    #    (never-green): CCNet head/middle/tail perplexity terciles per
    #    language, ranked on the exact integer milli-units-per-bigram
    #    key so tier assignment is deterministic cross-engine --
    "ccnet_ppl_buckets",
    # -- the PQ ring (never-green): per-block integer Lloyd codebooks
    #    (X25 at dim=16), 12-bit PQ codes, and the FAISS ADC scan — a
    #    map-only integer LUT-sum candidate pass + exact rerank; the
    #    whole index (training, encoding, scan) value-hash-checkable --
    "pq_codebook",
    "ann_pq_adc_topk",
    # -- the LSH banding study (never-green): zorder_pruning's measured
    #    posture applied to the MinHash index — candidates/hits/misses
    #    per (bands, rows) carving vs the exact-Jaccard truth set, the
    #    S-curve every LSH deployment tunes --
    "minhash_band_tuning",
    # -- changed-oracle fail-closed re-checks: these four gained DuckDB
    #    MATERIALIZED hints (the recursive CC walk and the PageRank
    #    iteration chains re-expanded their inlined CTE prefixes 10-100x
    #    — >20 s oracles at sf0.1, ~3 s materialized; values unchanged
    #    per local parity, records re-earned).  duplicate_clusters,
    #    graph_pagerank_by_region, bpe_merges and bpe_encode_stats are
    #    already in-window above/below. --
    "leakage_safe_split",
    "graph_pagerank",
    # -- span-audit fail-closed: substring_dup_coverage's tracked span
    #    was touched by unrelated edits in this file region; local
    #    parity is green, record re-earned in-window --
    "substring_dup_coverage",
    # -- changed since last green, fail-closed re-check: ann_jl_rerank's
    #    docstring edit (16-dim/4x -> 32-dim/2x) sits inside the tracked
    #    span; behavior is unchanged per local parity, record re-earned --
    "ann_jl_rerank",
    # -- the 14 r6-aged records the r9 rotation spilled (committed there
    #    as r10-MUST-window; r10 was cut short before the rotation landed,
    #    so the commitment transfers to THIS window.  After these re-green
    #    no official record predates r7.) --
    "format_interchange",
    "fulfillment_lag",
    "heavy_hitters_by_lang",
    "histogram_profile",
    "lang_guess",
    "ngram_counts",
    "payload_stats",
    "pivot_status_priority",
    "quality_gates",
    "small_qty_revenue",
    "source_mix",
    "top_supplier_revenue",
    "top_terms",
    "tpch_q1",
    # -- 13 of the 46 r7-aged records, oldest-cohort-first (within the
    #    cohort: alphabetical — all carry the same r7 date, so the order
    #    inside the cohort is arbitrary and auditable).  The 33 spilled
    #    (dedup_keep_best, disjunctive_revenue, doc_fingerprints,
    #    drift_compare, error_context_join, frequent_items_sketch,
    #    grouped_drift_profile, incremental_dedup, key_skew_profile,
    #    mad_outlier_profile, multimodal_features,
    #    multimodal_frame_sample, multimodal_resize, normalize_text,
    #    profit_by_nation_year, psi_drift .. tpch_q7) are r12
    #    MUST-window; all are local-parity green today.  New operators
    #    added later this round displace from the TAIL. --
    "activity_streaks",
    "ann_int8_rerank",
    "anomaly_zscore",
    "approx_quantile_profile",
    "attribution_asof",
    "char_lm_doc_counts",
    "char_lm_model",
    "chunk_dedup",
    "corr_profile",
    "cube_summary",
    "customer_order_distribution",
    "decontaminate_docs",
    "dedup_first_lineitem",
    "duplicate_clusters",
    # Below the 50-entry window: everything else carries an r8 or r9
    # official green against current testdata and unchanged code.
    # scripts/window_audit.py tracks staleness (contract fingerprints);
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
