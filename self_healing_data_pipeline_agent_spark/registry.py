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
    # -- r12 new operators (never-green, must be in-window): the index
    #    SERVING twins — each ANN family answered from its persisted
    #    artifact (sources/index_store) instead of re-training inside the
    #    query; identical arithmetic, so each shares its build-inline
    #    twin's oracle --
    "ann_lsh_serve",
    "ann_jl_serve",
    "ann_ivf_kmeans_serve",
    "ann_pq_serve",
    # -- the 2-D PCA basis (never-green): deflated power iteration to
    #    the second dominant direction, exact-BIGINT multiply-through
    #    Hotelling step (no division) --
    "embedding_top2_pc",
    # -- fail-closed re-check: _pc_gram reshaped r12 (struct-free flat
    #    outer product + posexplode; values identical, steady 0.9->0.7 s
    #    at sf0.1) — the Gram feeds embedding_top_pc, so its record is
    #    re-earned in-window --
    "embedding_top_pc",
    # -- the at-scale threshold variants the r11 docs promise (never-
    #    green): DSIR selection and CCNet tiering from DETERMINISTIC
    #    md5-sample quantile cuts — the stateless-map production shape,
    #    still value-hash-exact --
    "dsir_select_threshold",
    "ccnet_ppl_thresholds",
    # -- the embedding-LSH carving study (never-green): candidates/
    #    hits/misses per (tables, bits) carving of the 32 shared
    #    hyperplane bits + a single-bit-flip multi-probe variant —
    #    converts embedding_near_dup_lsh's prose recall argument into
    #    measured data --
    "embedding_lsh_tuning",
    # -- the first COMPRESSED real-container codec (never-green): PNG
    #    via stdlib zlib — chunk walk + CRC32 + multi-IDAT inflate + all
    #    five unfilters, round-trip-checked in the kernel --
    "multimodal_decode_png",
    # -- the dedup family's serving twin (never-green): minhash_lsh_pairs
    #    answered from the persisted signature table --
    "minhash_lsh_serve",
    # -- the tokenizer ring's serving twin (never-green): bpe_encode_stats
    #    from the stored merge table — encode-only steady state --
    "bpe_encode_serve",
    # -- changed-oracle fail-closed re-checks: both BPE oracles gained
    #    the COALESCE-to-'' guard for the fewer-merges-than-rounds edge
    #    (r11 ADVICE; values unchanged on the test corpora per local
    #    parity, records re-earned in-window) --
    "bpe_merges",
    "bpe_encode_stats",
    # -- the carving study's conclusion shipped (never-green): multi-
    #    probe near-dup at the production carving — full measured recall
    #    at probe cost instead of index cost --
    "embedding_near_dup_mp",
    # -- the 2-D PCA projection materialized (never-green): every vector's
    #    exact-integer coordinates along the two power/deflation iterates --
    "embedding_pca_coords",
    # -- the SemDeDup cell map served (never-green): the prune stage
    #    re-runs against the STORED assignment — the tau-sweep shape --
    "semantic_dedup_serve",
    # (more r12 operators are appended here as they land; each displaces
    #  an r8-cohort entry from the window TAIL below)
    # -- the 31 r7-aged records (official_greens: every query whose last
    #    official green is round 7 — the oldest cohort after the r11
    #    window re-greened the r6 spill).  Order: the official-record
    #    enumeration; all are local-parity green today. --
    "disjunctive_revenue",
    "drift_compare",
    "grouped_drift_profile",
    "stats_profile",
    "topk_orders_per_priority",
    "doc_fingerprints",
    "rolling_fingerprints",
    "streaming_hourly_counts",
    "streaming_dq_profile",
    "stateful_sessions",
    "dedup_keep_best",
    "tpch_q7",
    "tpch_q10",
    "psi_drift",
    "incremental_dedup",
    "normalize_text",
    "error_context_join",
    "key_skew_profile",
    "mad_outlier_profile",
    "scd2_priority_history",
    "session_concurrency",
    "profit_by_nation_year",
    "multimodal_features",
    "multimodal_resize",
    "multimodal_frame_sample",
    "simhash_near_dup_blocked",
    "streaming_error_context",
    "streaming_dedup_hourly",
    "frequent_items_sketch",
    "source_scorecard",
    "streaming_profile_compaction",
    # -- r8-cohort filler up to the 50-entry window (oldest remaining
    #    records; displaced from the TAIL as new r12 operators land) --
    # streaming_state_metrics is rows-only by nature (progress metrics
    # have no SQL twin) and thus never earns a green hash — it takes a
    # recurring window slot so the rows-only check stays fresh.
    "streaming_state_metrics",
    "distinct_counts",
    # (merge_upsert_orders, order_lag_lead, promo_revenue_share,
    #  quantile_profile, regional_supplier_volume, rolling_order_totals,
    #  semi_join_open_orders, shipping_priority, distinct_event_types,
    #  hourly_windows spilled from the filler as r12 operators landed —
    #  r13 MUST-window with the rest of the r8 cohort)
    # Below the 50-entry window: everything else carries an r8-r11
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
