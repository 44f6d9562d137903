"""Mergeable-sketch profiling operators (SURVEY.md §2.B X23).

At 100 TB the profile queries the reference computes eagerly (distinct
counts, quantiles, overlap audits — ``src/drift_detector.py:16-26`` scale-out)
cannot afford a full shuffle of raw keys per question.  The production
pattern is *mergeable sketches*: each partition/day/segment builds a
fixed-size summary, and summaries union associatively into any rollup
without touching the raw data again.  Spark 4 ships Apache DataSketches
natively (``hll_sketch_agg`` / ``theta_sketch_agg`` / ``kll_sketch_agg_*``);
all sketch aggregates here are algebraic, so map-side partial aggregation
reduces the shuffle to KBs per partition per group regardless of input size.

Correctness contract per query (driver hash-compares vs DuckDB):

- Theta: every test-SF cardinality sits below the sketch's exact regime
  (2^THETA_LG_K nominal entries — sampling never engages), so estimates
  equal exact counts and the oracle checks them *as values* — the strongest
  possible cross-check of the sketch set-algebra.  At production scale the
  same plan degrades gracefully to bounded-error estimates.
- HLL goes approximate already at sf0.1 cardinalities, so its oracle checks
  the accuracy contract (estimate within HLL_REL_TOL of an exact audit
  count) plus union-merge associativity — scale-independent flags.
- KLL is randomized (compaction sampling), so raw quantile values are not
  reproducible run-to-run; the query instead emits *exact-rank validation
  flags* — the sketch's own accuracy contract — which are deterministic for
  any healthy sketch, plus exact group counts.
- Heavy hitters: two-pass Misra-Gries (per-partition candidates, exact
  recount of the candidate set) is exact by construction, so the oracle is
  a plain GROUP BY ... HAVING.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.oracle_sql import sql_davg
from ..functions.stable import davg
from ..sources.tables import load_table

ORACLES: dict[str, str] = {}

HLL_LG_K = 14  # 16384 buckets, RSE ~0.8%; approximate from ~12k distincts up
HLL_REL_TOL = 0.02  # flag bound: ~2.5x the lgK=14 RSE; max observed 0.41%

# Theta nominal entries: 2^16 keeps the sketch in EXACT mode (no sampling,
# theta=1) through every test SF (max per-group cardinality 13k at sf0.1 vs
# 65536 nominal) so set-algebra results are value-checkable.  Past ~65k
# distincts per group the estimates go approximate and the oracle would
# need to switch to bound flags like the HLL profile.
THETA_LG_K = 16

# Heavy hitters: report terms with frequency > total_tokens / K_HH.
# Misra-Gries per-partition capacity must be >= K_HH for the candidate set
# to be a superset of the true heavy hitters (if freq(x) > N/K then some
# partition has freq_p(x) > n_p/K, and MG with capacity >= K retains any
# item above n_p/(cap+1)); 2x adds margin so near-threshold terms are
# candidates too (the exact second pass discards false positives for free).
K_HH = 200
MG_CAPACITY = 2 * K_HH

# Same whitespace tokenizer as operators/text.py so term semantics match
# across the text-analysis surface.
_TOKENS = "filter(split(text, ' '), x -> x <> '')"

KLL_K = 400  # normalized rank error ~0.9% @99%; flag bound 4x that
KLL_QS = (0.25, 0.5, 0.75)
KLL_RANK_EPS = 0.04


# --- X23a: HLL distinct-count profile with union-merge rollup ---------------


def q_hll_distinct_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customers per order priority from DAILY HLL sketches merged
    with ``hll_union_agg`` — the incremental-profile shape: a nightly job
    sketches each (priority, day) once, and any rollup (month, priority,
    global) is a union of stored sketches with no second scan.  Both
    aggregation levels are algebraic -> map-side combine; the shuffle
    carries one ~16 KB sketch per (priority, day) per partition.

    HLL goes approximate at ~12k per-group distincts (inside sf0.1), so
    unlike the Theta query the oracle checks the sketch's accuracy
    CONTRACT at every scale, not raw estimates: ``est_within_tol`` bounds
    the merged estimate against an exact count (gate-side audit column),
    and ``merged_matches_direct`` pins union-merge associativity — the
    daily-sketch union must estimate what sketching the whole group
    directly estimates (identical registers mathematically; compared
    within HLL_REL_TOL in case merge and direct settle in different
    internal modes)."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy("o_orderpriority", "o_orderdate").agg(
        F.hll_sketch_agg("o_custkey", F.lit(HLL_LG_K)).alias("sk")
    )
    merged = daily.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
    )
    direct = o.groupBy("o_orderpriority").agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg("o_custkey", F.lit(HLL_LG_K))
        ).alias("direct_est"),
        F.countDistinct("o_custkey").alias("n_custkeys"),
    )
    tol = F.col("n_custkeys") * F.lit(HLL_REL_TOL)
    return (
        merged.join(direct, "o_orderpriority")
        .select(
            "o_orderpriority",
            "n_days",
            "n_custkeys",
            (F.abs(F.col("est") - F.col("n_custkeys")) <= tol).alias(
                "est_within_tol"
            ),
            (
                F.abs(F.col("est") - F.col("direct_est")) <= tol
            ).alias("merged_matches_direct"),
        )
    )


ORACLES["hll_distinct_profile"] = """
SELECT o_orderpriority,
       COUNT(DISTINCT o_orderdate) AS n_days,
       COUNT(DISTINCT o_custkey) AS n_custkeys,
       TRUE AS est_within_tol,
       TRUE AS merged_matches_direct
FROM orders GROUP BY o_orderpriority
"""


# --- X23b: Theta-sketch set algebra (audience overlap) ----------------------


def q_theta_priority_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-set overlap between every pair of order priorities via
    Theta sketches: one scan builds 5 sketches (algebraic agg, map-side
    combined), then intersection/difference/union run on the 5-row sketch
    frame — relational set questions answered WITHOUT re-shuffling raw
    keys.  At 100 TB this is the audience-overlap pattern: sketches are
    KB-sized each, the pairwise algebra is driver-trivial, and adding a
    new segment never rescans old data (sketches persist).

    Every test-SF cardinality stays under the 2^THETA_LG_K nominal
    entries, so estimates are exact and the oracle verifies the sketch
    algebra against true relational COUNT(DISTINCT) intersections (see
    THETA_LG_K for the switch point to bound-flag checking)."""
    o = load_table(spark, sf_dir, "orders")
    sk = o.groupBy("o_orderpriority").agg(
        F.theta_sketch_agg("o_custkey", F.lit(THETA_LG_K)).alias("sk")
    )
    a = sk.select(
        F.col("o_orderpriority").alias("priority_a"), F.col("sk").alias("ska")
    )
    b = sk.select(
        F.col("o_orderpriority").alias("priority_b"), F.col("sk").alias("skb")
    )
    pairs = F.broadcast(a).join(
        b, F.col("priority_a") < F.col("priority_b")
    )
    return pairs.select(
        "priority_a",
        "priority_b",
        F.theta_sketch_estimate("ska").alias("n_a"),
        F.theta_sketch_estimate("skb").alias("n_b"),
        F.theta_sketch_estimate(
            F.theta_intersection("ska", "skb")
        ).alias("n_both"),
        F.theta_sketch_estimate(
            F.theta_difference("ska", "skb")
        ).alias("n_only_a"),
        F.theta_sketch_estimate(
            F.theta_union("ska", "skb", F.lit(THETA_LG_K))
        ).alias("n_either"),
    )


ORACLES["theta_priority_overlap"] = """
WITH d AS (SELECT DISTINCT o_orderpriority AS p, o_custkey AS c FROM orders),
n AS (SELECT p, COUNT(*) AS cnt FROM d GROUP BY p),
i AS (SELECT a.p AS pa, b.p AS pb, COUNT(*) AS inter
      FROM d a JOIN d b ON a.c = b.c AND a.p < b.p GROUP BY a.p, b.p)
SELECT i.pa AS priority_a, i.pb AS priority_b,
       na.cnt AS n_a, nb.cnt AS n_b, i.inter AS n_both,
       na.cnt - i.inter AS n_only_a,
       na.cnt + nb.cnt - i.inter AS n_either
FROM i JOIN n na ON na.p = i.pa JOIN n nb ON nb.p = i.pb
"""


# --- X23b': customer churn via Theta set algebra over time periods ----------

CHURN_BOUNDARY = "1998-01-01"  # orders span 1995..2001; ~half either side


def q_customer_churn_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period customer churn from TWO Theta sketches: one scan
    sketches the active-customer set of each period, then retained /
    churned / new counts are pure sketch algebra — the
    month-over-month retention report every warehouse runs, WITHOUT
    re-shuffling customer keys per report.  At 100 TB the per-period
    sketches are maintained incrementally (union-merge per new partition,
    see streaming_sketch_rollup) and any A-vs-B churn question is
    answered from stored summaries.

    Exact in the test universe (per-period cardinality < 2^THETA_LG_K),
    so the oracle checks real COUNT(DISTINCT) churn arithmetic."""
    o = load_table(spark, sf_dir, "orders")
    boundary = F.lit(CHURN_BOUNDARY).cast("timestamp")
    sk = o.agg(
        F.theta_sketch_agg(
            F.when(F.col("o_orderdate") < boundary, F.col("o_custkey")),
            F.lit(THETA_LG_K),
        ).alias("ska"),
        F.theta_sketch_agg(
            F.when(F.col("o_orderdate") >= boundary, F.col("o_custkey")),
            F.lit(THETA_LG_K),
        ).alias("skb"),
    )
    return sk.select(
        F.theta_sketch_estimate("ska").alias("n_first_period"),
        F.theta_sketch_estimate("skb").alias("n_second_period"),
        F.theta_sketch_estimate(
            F.theta_intersection("ska", "skb")
        ).alias("n_retained"),
        F.theta_sketch_estimate(
            F.theta_difference("ska", "skb")
        ).alias("n_churned"),
        F.theta_sketch_estimate(
            F.theta_difference("skb", "ska")
        ).alias("n_new"),
    )


ORACLES["customer_churn_sketch"] = f"""
WITH a AS (SELECT DISTINCT o_custkey AS c FROM orders
           WHERE o_orderdate < TIMESTAMP '{CHURN_BOUNDARY}'),
b AS (SELECT DISTINCT o_custkey AS c FROM orders
      WHERE o_orderdate >= TIMESTAMP '{CHURN_BOUNDARY}')
SELECT (SELECT COUNT(*) FROM a) AS n_first_period,
       (SELECT COUNT(*) FROM b) AS n_second_period,
       (SELECT COUNT(*) FROM a JOIN b USING (c)) AS n_retained,
       (SELECT COUNT(*) FROM a WHERE c NOT IN (SELECT c FROM b))
         AS n_churned,
       (SELECT COUNT(*) FROM b WHERE c NOT IN (SELECT c FROM a)) AS n_new
"""


# --- X23c: KLL quantile sketches with exact-rank validation -----------------


def q_kll_quantile_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-price quantiles per priority AND globally from ONE set of KLL
    sketches: per-group sketches from a single scan, the global row merged
    from the group sketches via ``reduce(kll_sketch_merge_double)`` — no
    second pass over the data (the mergeable-quantile pattern; exact
    per-group percentiles live in ``quantile_profile``).

    KLL compaction is randomized, so the query emits the sketch's accuracy
    CONTRACT rather than its raw values: ``rank_ok`` holds iff the exact
    rank of the sketched quantile is within KLL_RANK_EPS of the requested
    rank (one broadcast of ~18 tiny rows + one validation scan — gate-side
    auditing, not part of the production plan)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    )
    grouped = o.groupBy("o_orderpriority").agg(
        F.kll_sketch_agg_double("o_totalprice", F.lit(KLL_K)).alias("sk"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    glob = grouped.agg(
        F.collect_list("sk").alias("arr"),
        F.sum("n_rows").alias("n_rows"),
    ).select(
        F.lit("_all").alias("o_orderpriority"),
        F.reduce(
            F.slice("arr", 2, 1_000_000),
            F.element_at("arr", 1),
            lambda acc, x: F.kll_sketch_merge_double(acc, x),
        ).alias("sk"),
        "n_rows",
    )
    # the rank argument must be foldable: evaluate each quantile as its
    # own column, then unpivot to (q, v) rows
    points = (
        grouped.unionByName(glob)
        .select(
            "o_orderpriority",
            "n_rows",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(q).alias("q"),
                            F.kll_sketch_get_quantile_double(
                                "sk", F.lit(q)
                            ).alias("v"),
                        )
                        for q in KLL_QS
                    ]
                )
            ).alias("p"),
        )
        .select("o_orderpriority", "n_rows", F.col("p.q"), F.col("p.v"))
    )
    # exact-rank audit: fraction of the group's rows <= sketched value
    per_group = points.filter(F.col("o_orderpriority") != "_all")
    grp_ranks = (
        F.broadcast(per_group)
        .join(o.withColumnRenamed("o_orderpriority", "p"),
              F.col("p") == F.col("o_orderpriority"))
        .groupBy("o_orderpriority", "n_rows", "q", "v")
        .agg(F.sum((F.col("o_totalprice") <= F.col("v")).cast("long"))
             .alias("n_le"))
    )
    glob_ranks = (
        o.select("o_totalprice")
        .crossJoin(
            F.broadcast(points.filter(F.col("o_orderpriority") == "_all"))
        )
        .groupBy("o_orderpriority", "n_rows", "q", "v")
        .agg(F.sum((F.col("o_totalprice") <= F.col("v")).cast("long"))
             .alias("n_le"))
    )
    ranks = grp_ranks.unionByName(glob_ranks)
    rank_err = F.abs(
        F.col("n_le").cast("double") / F.col("n_rows") - F.col("q")
    )
    return ranks.select(
        "o_orderpriority",
        "q",
        "n_rows",
        (rank_err <= F.lit(KLL_RANK_EPS)).alias("rank_ok"),
    )


ORACLES["kll_quantile_bounds"] = """
WITH g AS (
  SELECT o_orderpriority, COUNT(*) AS n_rows FROM orders
  GROUP BY o_orderpriority
  UNION ALL
  SELECT '_all', COUNT(*) FROM orders
)
SELECT o_orderpriority, q, n_rows, TRUE AS rank_ok
FROM g CROSS JOIN (
  SELECT unnest([CAST(0.25 AS DOUBLE), CAST(0.5 AS DOUBLE),
                 CAST(0.75 AS DOUBLE)]) AS q)
"""


# --- X23e: the composed one-pass profile ------------------------------------


def q_one_pass_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production profiling-job shape: row count, exact mean, an HLL
    sketch AND a KLL sketch for every group in ONE ``groupBy`` over ONE
    scan — every aggregate (including the sketches) is algebraic and
    map-side combines, so the production profile (drop the audit columns
    below) is a single shuffle of partial states.  This is the scale-out
    of the reference's "profile in ONE agg job" rule (SURVEY §4:
    drift_detector looped per column; we fold columns AND sketches into
    one pass).

    Audit columns — gate-side only, they are what a production plan
    drops: the exact ``countDistinct`` (whose two-phase planning adds the
    extra exchanges seen in `.explain`) feeds ``hll_ok`` (estimate within
    HLL_REL_TOL), and ``median_rank_ok`` re-scans once to check the KLL
    median's exact rank within KLL_RANK_EPS."""
    o = load_table(spark, sf_dir, "orders")
    g = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        davg(F.col("o_totalprice")).alias("avg_price"),
        F.countDistinct("o_custkey").alias("n_custkeys"),
        F.hll_sketch_estimate(
            F.hll_sketch_agg("o_custkey", F.lit(HLL_LG_K))
        ).alias("hll_est"),
        F.kll_sketch_get_quantile_double(
            F.kll_sketch_agg_double("o_totalprice", F.lit(KLL_K)), F.lit(0.5)
        ).alias("kll_med"),
    )
    ranks = (
        o.withColumnRenamed("o_orderpriority", "p")
        .join(
            F.broadcast(g.select("o_orderpriority", "kll_med", "n_orders")),
            F.col("p") == F.col("o_orderpriority"),
        )
        .groupBy("o_orderpriority")
        .agg(
            (
                F.abs(
                    F.sum((F.col("o_totalprice") <= F.col("kll_med")).cast("long"))
                    / F.first("n_orders")
                    - F.lit(0.5)
                )
                <= F.lit(KLL_RANK_EPS)
            ).alias("median_rank_ok")
        )
    )
    return g.join(ranks, "o_orderpriority").select(
        "o_orderpriority",
        "n_orders",
        "avg_price",
        "n_custkeys",
        (
            F.abs(F.col("hll_est") - F.col("n_custkeys"))
            <= F.col("n_custkeys") * F.lit(HLL_REL_TOL)
        ).alias("hll_ok"),
        "median_rank_ok",
    )


ORACLES["one_pass_profile"] = f"""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       {sql_davg('o_totalprice')} AS avg_price,
       COUNT(DISTINCT o_custkey) AS n_custkeys,
       TRUE AS hll_ok,
       TRUE AS median_rank_ok
FROM orders GROUP BY o_orderpriority
"""


# --- X23d: exact heavy hitters in two passes (Misra-Gries + recount) --------


def _mg_ingest(counters: dict[str, int], t: str, cap: int) -> int:
    """ONE Misra-Gries ingestion step — the shared kernel of every MG
    variant in this module (flat candidates, per-group candidates, the
    mergeable summary): insert/increment ``t`` holding at most ``cap``
    counters; on overflow decrement all and drop zeros (Misra & Gries
    1982).  Returns 1 iff a decrement-all occurred, which is the
    caller's underestimate bound ``dec``."""
    if t in counters:
        counters[t] += 1
        return 0
    if len(counters) < cap:
        counters[t] = 1
        return 0
    dead = []
    for k in counters:
        counters[k] -= 1
        if counters[k] == 0:
            dead.append(k)
    for k in dead:
        del counters[k]
    return 1


def _mg_candidates(batches: Iterator) -> Iterator:
    """Per-partition Misra-Gries summary over token streams: at most
    MG_CAPACITY counters, decrement-all on overflow.  Guarantees every
    term with partition frequency > n_p/(MG_CAPACITY+1) survives, which
    makes the union over partitions a superset of all global terms with
    frequency > N/K_HH.  Bounded memory, single sequential pass."""
    import pandas as pd

    counters: dict[str, int] = {}
    for pdf in batches:
        for toks in pdf["tokens"]:
            for t in toks:
                _mg_ingest(counters, t, MG_CAPACITY)
    yield pd.DataFrame({"term": list(counters.keys())})


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus heavy hitters (terms with frequency > N/K_HH) WITHOUT
    a full-vocabulary shuffle: pass 1 runs Misra-Gries per partition
    (mapInPandas, bounded memory, emits <= MG_CAPACITY candidates per
    partition); pass 2 broadcast-semi-joins the tiny candidate set against
    the token stream and counts exactly.  The MG superset guarantee makes
    the result identical to the naive GROUP BY, but the shuffle carries
    only candidate-term rows — at 100 TB that is the difference between
    shuffling the corpus vocabulary and shuffling a few hundred terms.
    (``top_terms`` in operators/text.py is the full-shuffle twin.)"""
    docs = load_table(spark, sf_dir, "documents").select(
        F.expr(_TOKENS).alias("tokens")
    )
    candidates = (
        docs.mapInPandas(_mg_candidates, "term string")
        .distinct()
    )
    tokens = docs.select(F.explode("tokens").alias("term"))
    total = docs.agg(
        F.sum(F.size("tokens")).alias("n_total")
    )
    counted = (
        tokens.join(F.broadcast(candidates), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    return (
        counted.crossJoin(F.broadcast(total))
        .filter(F.col("n_occurrences") * K_HH > F.col("n_total"))
        .select("term", "n_occurrences")
    )


ORACLES["heavy_hitters"] = f"""
WITH toks AS (
  SELECT unnest(filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents
)
SELECT term, COUNT(*) AS n_occurrences
FROM toks
GROUP BY term
HAVING COUNT(*) * {K_HH} > (SELECT COUNT(*) FROM toks)
"""


def _mg_grouped_candidates(batches: Iterator) -> Iterator:
    """Per-partition Misra-Gries with an INDEPENDENT counter table per
    group (language): decrements in one group never evict another
    group's terms, so the per-group superset guarantee of
    :func:`_mg_candidates` holds group-wise.  Memory is bounded by
    (#groups-in-partition x MG_CAPACITY) — fine for low-cardinality
    grouping keys like language/source; for high-cardinality groups,
    repartition by group first so each partition holds few groups."""
    import pandas as pd

    per_group: dict[str, dict[str, int]] = {}
    for pdf in batches:
        for lang, toks in zip(pdf["lang"], pdf["tokens"]):
            counters = per_group.setdefault(lang, {})
            for t in toks:
                _mg_ingest(counters, t, MG_CAPACITY)
    yield pd.DataFrame(
        {
            "lang": [g for g, c in per_group.items() for _ in c],
            "term": [t for c in per_group.values() for t in c],
        }
    )


def q_heavy_hitters_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped exact heavy hitters: terms with frequency > N_lang/K_HH
    WITHIN each language — the realistic per-domain/per-language shape of
    corpus frequency analysis.  Same two-pass plan as ``heavy_hitters``
    (per-partition MG candidates, broadcast exact recount) with the MG
    kernel keeping one counter table per language so the superset
    guarantee is per-group.  The recount shuffles only candidate
    (lang, term) rows — vocabulary-scale, not corpus-scale."""
    docs = load_table(spark, sf_dir, "documents").select(
        "lang", F.expr(_TOKENS).alias("tokens")
    )
    candidates = docs.mapInPandas(
        _mg_grouped_candidates, "lang string, term string"
    ).distinct()
    tokens = docs.select("lang", F.explode("tokens").alias("term"))
    totals = docs.groupBy("lang").agg(
        F.sum(F.size("tokens")).alias("n_total")
    )
    counted = (
        tokens.join(F.broadcast(candidates), ["lang", "term"])
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    return (
        counted.join(F.broadcast(totals), "lang")
        .filter(F.col("n_occurrences") * K_HH > F.col("n_total"))
        .select("lang", "term", "n_occurrences")
    )


ORACLES["heavy_hitters_by_lang"] = f"""
WITH toks AS (
  SELECT lang, unnest(filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents
),
tl AS (SELECT lang, COUNT(*) AS n FROM toks GROUP BY lang)
SELECT t.lang, t.term, t.c AS n_occurrences
FROM (SELECT lang, term, COUNT(*) AS c FROM toks GROUP BY lang, term) t
JOIN tl ON tl.lang = t.lang
WHERE t.c * {K_HH} > tl.n
"""


# --- X23f: MERGEABLE frequent-items summary (profile-table heavy hitters) ---
#
# The two-pass queries above re-scan the corpus to recount candidates; a
# PROFILE TABLE cannot (new partitions arrive, old ones are archived).  The
# mergeable Misra-Gries summary (Agarwal et al., "Mergeable Summaries",
# PODS 2012) closes that: each partition/day/segment reduces to at most
# MG_CAPACITY (term, count) pairs plus one decrement offset, and any two
# summaries merge associatively — pointwise-add, then subtract the
# (capacity+1)-th largest value from all and drop non-positives — while
# preserving the estimate guarantee  freq - dec <= est <= freq  with
# dec <= n_total/(capacity+1).  Heavy hitters over ANY rollup of stored
# summaries then need no second corpus pass: every term with
# freq > n/K_HH satisfies (est + dec) * K_HH > n, so the summary alone
# yields a guaranteed superset plus bounded-error counts.


def mg_summary_merge(
    a: tuple[dict, int, int], b: tuple[dict, int, int],
    capacity: int = MG_CAPACITY,
) -> tuple[dict, int, int]:
    """Associatively merge two MG summaries ``(counters, dec, n)``.

    Pointwise-sum the counter tables; if more than ``capacity`` survive,
    subtract the (capacity+1)-th largest summed count from every counter
    and drop the non-positive ones, folding that subtraction into ``dec``.
    Preserves, for every term t:  freq(t) - dec <= est(t) <= freq(t)
    (est(t) = 0 when absent), with dec <= n / (capacity + 1)."""
    counters = dict(a[0])
    for t, c in b[0].items():
        counters[t] = counters.get(t, 0) + c
    dec = a[1] + b[1]
    n = a[2] + b[2]
    if len(counters) > capacity:
        cut = sorted(counters.values(), reverse=True)[capacity]
        counters = {t: c - cut for t, c in counters.items() if c > cut}
        dec += cut
    return counters, dec, n


def _mg_partial_summaries(batches: Iterator) -> Iterator:
    """Per-partition MG summary row: the bounded-size state a profile
    table would store for this slice of the corpus."""
    import pandas as pd

    counters: dict[str, int] = {}
    dec = 0
    n = 0
    for pdf in batches:
        for toks in pdf["tokens"]:
            for t in toks:
                n += 1
                dec += _mg_ingest(counters, t, MG_CAPACITY)
    yield pd.DataFrame(
        {
            "terms": [list(counters.keys())],
            "counts": [list(counters.values())],
            "dec": [dec],
            "n": [n],
        }
    )


def _mg_fold(pdf) -> "object":
    """Fold a frame of partial summaries into one (applyInPandas kernel).
    Fold order is pinned by a sort (n desc, then first 3 lexical terms);
    two distinct partials CAN tie on that key, leaving their relative
    order to pandas row order — harmless, because the MG guarantee bounds
    (freq - dec <= est <= freq) hold under EVERY fold order and the
    checked contract recounts exactly (test_sketches pins both)."""
    import pandas as pd

    rows = sorted(
        (
            (dict(zip(r.terms, (int(c) for c in r.counts))),
             int(r.dec), int(r.n))
            for r in pdf.itertuples()
        ),
        key=lambda s: (-s[2], ",".join(sorted(s[0])[:3])),
    )
    acc: tuple[dict, int, int] = ({}, 0, 0)
    for s in rows:
        acc = mg_summary_merge(acc, s)
    counters, dec, n = acc
    return pd.DataFrame(
        {
            "term": list(counters.keys()),
            "est": list(counters.values()),
            "dec": [dec] * len(counters),
            "n_total": [n] * len(counters),
        }
    )


def q_frequent_items_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy hitters from a MERGED frequent-items summary — the
    profile-table shape of ``heavy_hitters``: per-partition MG summaries
    (the rows a profile table stores; KB-sized, map-only) merge
    associatively into one corpus summary whose candidate set
    ``(est + dec) * K_HH > n`` is a guaranteed superset of the true heavy
    hitters, with per-term error bounded by ``dec`` — NO second corpus
    pass required at production time.

    Gate-side audit (what production drops): one broadcast-semi-join
    recount pins the exact ``n_occurrences`` and the theorem flag
    ``est_ok`` (est <= freq <= est + dec) for every true heavy hitter, so
    the driver value-checks the summary's guarantee, not just its shape.
    The reference's profiling is an eager full-scan build
    (``src/drift_detector.py:16-26``, mean/std via ``_build_profile``) —
    this is the bounded-memory, incrementally-maintainable scale-out of
    that profiling pattern for categorical frequency."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.expr(_TOKENS).alias("tokens")
    )
    partials = docs.mapInPandas(
        _mg_partial_summaries,
        "terms array<string>, counts array<long>, dec long, n long",
    )
    summary = (
        partials.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(
            lambda pdf: _mg_fold(pdf),
            "term string, est long, dec long, n_total long",
        )
    )
    candidates = summary.filter(
        (F.col("est") + F.col("dec")) * F.lit(K_HH) > F.col("n_total")
    )
    tokens = docs.select(F.explode("tokens").alias("term"))
    exact = (
        tokens.join(F.broadcast(candidates), "term")
        .groupBy("term", "est", "dec", "n_total")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    return (
        exact.filter(F.col("n_occurrences") * F.lit(K_HH) > F.col("n_total"))
        .select(
            "term",
            "n_occurrences",
            (
                (F.col("est") <= F.col("n_occurrences"))
                & (F.col("n_occurrences") <= F.col("est") + F.col("dec"))
            ).alias("est_ok"),
        )
    )


ORACLES["frequent_items_sketch"] = f"""
WITH toks AS (
  SELECT unnest(filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents
)
SELECT term, COUNT(*) AS n_occurrences, TRUE AS est_ok
FROM toks
GROUP BY term
HAVING COUNT(*) * {K_HH} > (SELECT COUNT(*) FROM toks)
"""


# --- X23g: grouped KLL quantile drift between periods -----------------------

# Decision rule: drifted iff period-A's sketched median falls OUTSIDE
# period-B's sketched quantile window at ranks 0.5 +/- KLL_DRIFT_THRESH.
# Every sketched quantile at rank q is an actual data value whose exact
# rank lies within KLL_RANK_EPS of q, so the decision is deterministic
# whenever the exact quantiles at the widened ranks (0.5 +/- EPS for the
# probe, window edges +/- EPS) keep a strict value gap — the tripwire
# test re-derives those gaps from data at every SF.  0.25 (not 0.20)
# because the smallest SF's per-priority periods hold only ~130 orders
# each and their natural sampling shift reaches ~0.13 rank units — the
# threshold must clear natural shift + sketch error with room to spare.
KLL_DRIFT_THRESH = 0.25
KLL_DRIFT_PROBE_EPS = 0.06  # widened rank half-width used by the tripwire

# Day-over-day variant used by the streaming profile table: a DAY of
# events is a much smaller sample than an orders period (~170 at the
# smallest SF), so consecutive days' natural sampling shift is larger
# and only a wider window decides deterministically — 0.35 is the
# smallest round threshold whose margins clear every consecutive-day
# pair at every SF (tripwire-asserted).
KLL_DAILY_DRIFT_THRESH = 0.35


def q_kll_quantile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority quantile drift between two order periods decided from
    TWO KLL sketches — the reference's drift loop
    (``src/drift_detector.py:29-87``) asks "did the distribution move?"
    by recomputing stats over both periods; with mergeable KLL summaries
    stored per period/partition the question is answered from sketches
    alone: probe = period-A sketched median, statistic = period-B sketch's
    estimated rank of the probe, drift iff |rank - 0.5| > KLL_DRIFT_THRESH.

    probe = period-A sketched median, drifted iff the probe falls outside
    period-B's sketched quantile window at 0.5 +/- KLL_DRIFT_THRESH.

    ONE scan builds both period sketches per group (conditional algebraic
    aggs, map-side combined); the drift decision then touches only the
    10 sketch values.  The statistics are randomized (KLL compaction) but
    the DECISION is deterministic: probe and window edges are data values
    whose exact ranks sit within KLL_RANK_EPS of their targets, and the
    exact quantiles at the widened ranks keep a strict value gap at every
    test SF (tripwire-asserted), so both engines agree on the flag.
    ``n_a``/``n_b`` are exact."""
    o = load_table(spark, sf_dir, "orders")
    boundary = F.lit(CHURN_BOUNDARY).cast("timestamp")
    in_a = F.col("o_orderdate") < boundary
    g = o.groupBy("o_orderpriority").agg(
        F.kll_sketch_agg_double(
            F.when(in_a, F.col("o_totalprice")), F.lit(KLL_K)
        ).alias("ska"),
        F.kll_sketch_agg_double(
            F.when(~in_a, F.col("o_totalprice")), F.lit(KLL_K)
        ).alias("skb"),
        F.sum(in_a.cast("long")).alias("n_a"),
        F.sum((~in_a).cast("long")).alias("n_b"),
    )
    probe = F.kll_sketch_get_quantile_double("ska", F.lit(0.5))
    win_lo = F.kll_sketch_get_quantile_double(
        "skb", F.lit(0.5 - KLL_DRIFT_THRESH)
    )
    win_hi = F.kll_sketch_get_quantile_double(
        "skb", F.lit(0.5 + KLL_DRIFT_THRESH)
    )
    # An EMPTY period aggregates to a null sketch, and the quantile
    # functions THROW on null buffers — the CASE guard keeps them
    # unevaluated for that group and yields a NULL decision instead (the
    # oracle mirrors this with the same count guard, so the row is kept,
    # not dropped).
    return g.select(
        "o_orderpriority",
        "n_a",
        "n_b",
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0),
            (probe < win_lo) | (probe > win_hi),
        ).alias("median_drifted"),
    )


# The oracle makes the SAME decision from exact quantities (exact period-A
# median, its value against period-B's exact quantile window) — the
# tripwire-asserted margin is what guarantees the randomized sketch
# statistic and this exact statistic fall on the same side of the
# threshold.  Join-free on purpose: a priority with an EMPTY period must
# keep its row with a NULL decision (as the Spark side's null sketch
# yields), not silently drop out of the result.
ORACLES["kll_quantile_drift"] = f"""
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderdate < TIMESTAMP '{CHURN_BOUNDARY}')
         AS n_a,
       COUNT(*) FILTER (WHERE o_orderdate >= TIMESTAMP '{CHURN_BOUNDARY}')
         AS n_b,
       CASE WHEN COUNT(*) FILTER (WHERE o_orderdate
                                  < TIMESTAMP '{CHURN_BOUNDARY}') = 0
              OR COUNT(*) FILTER (WHERE o_orderdate
                                  >= TIMESTAMP '{CHURN_BOUNDARY}') = 0
            THEN NULL
            ELSE quantile_disc(o_totalprice, 0.5)
                   FILTER (WHERE o_orderdate < TIMESTAMP '{CHURN_BOUNDARY}')
                 < quantile_disc(o_totalprice, {0.5 - KLL_DRIFT_THRESH})
                   FILTER (WHERE o_orderdate >= TIMESTAMP '{CHURN_BOUNDARY}')
              OR quantile_disc(o_totalprice, 0.5)
                   FILTER (WHERE o_orderdate < TIMESTAMP '{CHURN_BOUNDARY}')
                 > quantile_disc(o_totalprice, {0.5 + KLL_DRIFT_THRESH})
                   FILTER (WHERE o_orderdate >= TIMESTAMP '{CHURN_BOUNDARY}')
       END AS median_drifted
FROM orders GROUP BY o_orderpriority
"""
