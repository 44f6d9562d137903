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
    # -- r15 new operators (never-green): the BM25 serve twin (postings
    #    persisted via ensure_index, serving = artifact scan + broadcast
    #    score — the inverted index is retrieval's canonical serving
    #    artifact), the bucketed-warehouse lifecycle's COMPACTION member
    #    (multi-file buckets rewritten to one file per bucket, merge
    #    join sort-free again — pinned), and the cross-modality dedup
    #    agreement report (text/embedding/image near-dup membership
    #    joined per doc, all three from stored artifacts) --
    "bm25_serve",
    "bucketed_compaction",
    "cross_modal_dedup",
    # (also never-green): the lifecycle's streaming front door — each
    #    micro-batch appended bucket-aligned with an event_id anti-join
    #    dedup, exactly-once under the staged at-least-once replay; the
    #    per-user rollup over the ingested table plans shuffle-free --
    "streaming_bucketed_ingest",
    # (also never-green): the layout's window-function payoff — the
    #    whole sessionize -> rollup pipeline over user_id-bucketed
    #    events plans with zero exchanges --
    "bucketed_sessionization",
    # (also never-green): X45's maintenance member — standing (tf, dl)
    #    posting rows from the stored artifact (append-invariant per-doc
    #    stats), only the ingest batch re-tokenized, df/N/avgdl
    #    re-aggregated from posting rows --
    "bm25_index_refresh",
    # (also never-green): X18's boundary-respecting packing variant —
    #    sorted-complement pairing, docs never split across windows --
    "pack_pairs",
    # (also never-green): X43's tuning member — the dHash carving study
    #    (2x32/4x16/8x8 candidate volume vs exact-Hamming-truth recall),
    #    completing the per-modality tuning triple --
    "image_band_tuning",
    # -- r15 fail-closed re-checks: ensure_bucketed_ingest_table's digest
    #    now folds the enclosing function's code fingerprint (r14 ADVICE
    #    — the batch carve/append logic was unhashed), so the stored
    #    artifact rebuilt; and the session grew
    #    spark.sql.legacy.bucketedTableScan.outputOrdering=true (one-
    #    file-per-bucket scans now advertise their sort), which reshapes
    #    every bucketed join's plan — all four bucketed rows re-earn
    #    their greens in-window --
    "bucketed_ingest_join",
    "bucketed_late_shipments",
    "bucketed_cdc_apply",
    # (also fail-closed): linreg_price_per_item's source span shifted
    #    by the q_bucketed_compaction insertion above it, and
    #    bm25_topk's oracle was refactored onto the shared
    #    BM25_PREFLOOR_CTES chain the margin tripwire measures (same
    #    floor(y+0.5) expression — value-identical, local parity green);
    #    both records re-earned --
    "linreg_price_per_item",
    "bm25_topk",
    # (also fail-closed): sessionization's dataflow moved into the
    #    shared _sessionize helper consumed by both variants (review
    #    finding — value-identical, local parity green); re-earned --
    "sessionization",
    # -- rows-only recurring slot: progress metrics have no SQL twin, so
    #    this never earns a green hash and re-takes a seat every round --
    "streaming_state_metrics",
    # -- the 29 r9-aged spill queries (r14 verdict #3 / the r14
    #    registry's own "r15 MUST-window" list): their official greens
    #    date to r9 against current testdata; re-earned here --
    "null_fractions",
    "order_priority_check",
    "pack_sequences",
    "pii_scrub",
    "point_lookup",
    "recent_errors",
    "referential_orphans",
    "repetition_ratio",
    "revenue_by_nation",
    "rollup_summary",
    "row_count",
    "salted_hot_key_agg",
    "setop_except",
    "setop_intersect",
    "shard_manifest",
    "status_metrics",
    "stratified_sample",
    "streaming_cardinality_profile",
    "streaming_churn_profile",
    "streaming_dedup_jittered",
    "streaming_enriched_counts",
    "streaming_error_orphans",
    "streaming_session_windows",
    "streaming_sketch_rollup",
    "text_quality",
    "token_stats_by_lang",
    "train_val_split",
    "vocab_growth",
    "zorder_pruning",
    # -- r11-aged filler (oldest remaining official records, alphabetic
    #    enumeration of the r11 cohort): 6 fit below; the remaining
    #    r11-aged greens (approx_quantile_profile, attribution_asof,
    #    bloom_sized_decontaminate,
    #    ccnet_ppl_buckets, char_lm_doc_counts,
    #    char_lm_model, chunk_dedup, corr_profile, cube_summary,
    #    customer_order_distribution, decontaminate_docs,
    #    dedup_first_lineitem, dominant_part_suppliers, dsir_select,
    #    dsir_weights, duplicate_clusters, format_interchange,
    #    fulfillment_lag, graph_pagerank, graph_pagerank_by_region,
    #    heavy_hitters_by_lang, histogram_profile, kmeans_embeddings,
    #    lang_guess, leakage_safe_split, ...) spill to the r16 window —
    #    r16 MUST-window those with whatever else ages out --
    "activity_streaks",
    "ann_int8_rerank",
    "ann_ivf_kmeans_topk",
    "ann_jl_rerank",
    "ann_pq_adc_topk",
    "anomaly_zscore",
    # Below the 50-entry window: everything else carries an r11-r14
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
