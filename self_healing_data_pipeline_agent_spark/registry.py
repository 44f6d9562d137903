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
    # -- r14 new operators (never-green): the image-modality near-dup
    #    (perceptual block-gradient dHash over decoded PNG rasters,
    #    banded equi-join blocking, Hamming verify — X43, the dedup
    #    ring's missing modality) and the CDC apply against the X38
    #    bucketed base (zero exchanges on the snapshot side) --
    "image_near_dup",
    "bucketed_cdc_apply",
    # (also never-green): incremental maintenance for the image-hash
    #    artifact (lsh_index_refresh's posture on the image ring) and
    #    BM25 more-like-this retrieval (X45, the lexical counterpart of
    #    the embedding kNN) --
    "image_index_refresh",
    "bm25_topk",
    # (also never-green): the salted JOIN — the explode_salts half of
    #    functions/skew.py finally exercised by a declared query --
    "salted_skew_join",
    # (also never-green): the image ring's cluster report (CC over the
    #    banded-verified image pairs) and X38's maintenance member — the
    #    ingest-appended bucketed table whose fact-fact join stays
    #    co-located on multi-file buckets --
    "image_dup_clusters",
    "bucketed_ingest_join",
    # -- r14 changed-implementation fail-closed re-checks: event_gap_fill
    #    dropped its rank-window pass (per-hour last is now
    #    max_by(units, struct(ts, event_id)) inside the one aggregate —
    #    r13 verdict #7; same total order, value-identical per local
    #    parity); bucketed_late_shipments' ensure_bucketed_table now
    #    routes its build through load_table (r13 ADVICE — normalization
    #    parity for future bucketed tables; plain read for orders) --
    "event_gap_fill",
    "bucketed_late_shipments",
    # (also fail-closed): linreg gained a degenerate-group docstring
    #    note overlapping its source span — doc-only, but the window
    #    audit cannot know that, so the record is re-earned in-window --
    "linreg_price_per_item",
    # (also fail-closed): session_concurrency's source span overlaps the
    #    r14 events.py edits per git log -L (line shift, not semantics —
    #    local parity is green) — record re-earned in-window --
    "session_concurrency",
    # -- rows-only recurring slot: progress metrics have no SQL twin, so
    #    this never earns a green hash and re-takes a seat every round --
    "streaming_state_metrics",
    # -- the r8-aged cohort (r13 verdict #1, driver-gate obligation):
    #    the 20 oldest official greens, whose record would otherwise
    #    date to r8 against current testdata --
    "json_extract",
    "kll_quantile_bounds",
    "large_volume_customers",
    "late_data_profile",
    "one_pass_profile",
    "payload_dedup",
    "prefix_filter_jaccard",
    "semantic_dedup",
    "sessionization",
    "simhash_fingerprints",
    "simhash_near_dup",
    "sliding_windows",
    "sole_late_supplier",
    "streaming_profile_compaction2",
    "supplier_part_breadth",
    "tfidf_top_terms",
    "theta_priority_overlap",
    "tpch_q6",
    "tpch_q8",
    "user_rolling_hour",
    # -- r9-aged filler (oldest remaining records, official-record
    #    enumeration): 18 of the 47 r9-aged greens fit below; the other
    #    29 (null_fractions, order_priority_check, pack_sequences,
    #    pii_scrub, point_lookup, recent_errors,
    #    referential_orphans,
    #    repetition_ratio, revenue_by_nation, rollup_summary,
    #    row_count, salted_hot_key_agg, setop_except, setop_intersect,
    #    shard_manifest, status_metrics, stratified_sample,
    #    streaming_cardinality_profile, streaming_churn_profile,
    #    streaming_dedup_jittered, streaming_enriched_counts,
    #    streaming_error_orphans, streaming_session_windows,
    #    streaming_sketch_rollup, text_quality, token_stats_by_lang,
    #    train_val_split, vocab_growth, zorder_pruning) spill to the r15
    #    window — r15 MUST-window those with whatever else ages out --
    "ann_lsh_topk",
    "bloom_decontaminate",
    "dup_ngram_coverage",
    "embedding_norm_stats",
    "embedding_quant_codebook",
    "exact_dedup_docs",
    "funnel_conversion",
    "heavy_hitters",
    "jl_projection",
    "kll_quantile_drift",
    "knn_cosine",
    "label_centroids",
    "minhash_lsh_pairs",
    "mixture_epochs",
    "mixture_resample",
    "multimodal_decode_ppm",
    "multimodal_decode_ppm_stream",
    "multimodal_decode_wav",
    # Below the 50-entry window: everything else carries an r11-r13
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
