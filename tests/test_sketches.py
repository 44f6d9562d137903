"""Unit tests for the mergeable-sketch profiling ring
(operators/sketches.py, SURVEY.md §2.B X23).

Oracle parity for all four queries is covered by test_oracle_parity.py;
here we pin the algorithmic guarantees (Misra-Gries superset property,
sketch set-algebra exactness in the exact regime) and the physical plan
shapes the 100 TB design depends on (algebraic partial aggregation,
candidate broadcast in the heavy-hitter recount).
"""

from __future__ import annotations

import random
from collections import Counter

import pandas as pd
import pytest
from pyspark.sql import functions as F

from self_healing_data_pipeline_agent_spark.operators import sketches as sk
from self_healing_data_pipeline_agent_spark.plans import formatted_plan


# --- Misra-Gries kernel ------------------------------------------------------


def _mg_on(token_lists, capacity=None):
    """Run the MG kernel over one simulated partition."""
    cap = sk.MG_CAPACITY if capacity is None else capacity
    old = sk.MG_CAPACITY
    sk.MG_CAPACITY = cap
    try:
        batches = iter([pd.DataFrame({"tokens": token_lists})])
        (out,) = list(sk._mg_candidates(batches))
        return set(out["term"])
    finally:
        sk.MG_CAPACITY = old


def test_mg_small_vocab_keeps_everything():
    cands = _mg_on([["a", "b", "a"], ["c"]], capacity=10)
    assert cands == {"a", "b", "c"}


def test_mg_superset_of_heavy_hitters_random():
    """Property: with capacity m, every item of frequency > n/(m+1)
    survives a single-partition MG pass — on adversarially skewed random
    streams."""
    rng = random.Random(42)
    for trial in range(20):
        m = rng.choice([5, 10, 25])
        # skewed stream: a few hot items + a heavy tail of singletons
        stream = []
        for hot in range(rng.randint(1, 4)):
            stream += [f"hot{hot}"] * rng.randint(50, 200)
        stream += [f"cold{i}" for i in range(rng.randint(100, 500))]
        rng.shuffle(stream)
        cands = _mg_on([stream], capacity=m)
        n = len(stream)
        freqs = Counter(stream)
        required = {t for t, c in freqs.items() if c > n / (m + 1)}
        assert required <= cands, (trial, required - cands)


def test_mg_bounded_output():
    stream = [f"t{i}" for i in range(10_000)]
    cands = _mg_on([stream], capacity=16)
    assert len(cands) <= 16


# --- heavy hitters: exactness vs the naive full-shuffle twin -----------------


def test_heavy_hitters_matches_naive_groupby(spark, sf_dir):
    hh = {
        (r.term, r.n_occurrences)
        for r in sk.q_heavy_hitters(spark, sf_dir).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.explode(F.expr(sk._TOKENS)).alias("term")
    )
    total = docs.count()
    naive = {
        (r.term, r.n)
        for r in docs.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") * sk.K_HH > total)
        .collect()
    }
    assert hh == naive and len(hh) > 0


def test_heavy_hitters_broadcasts_candidates(spark, sf_dir):
    plan = formatted_plan(sk.q_heavy_hitters(spark, sf_dir))
    # the recount join must broadcast the candidate set, not shuffle the
    # token stream by term
    assert "BroadcastHashJoin" in plan


# --- sketch set algebra ------------------------------------------------------


def test_theta_overlap_identities(spark, sf_dir):
    rows = sk.q_theta_priority_overlap(spark, sf_dir).collect()
    assert len(rows) == 10  # 5 choose 2 ordered pairs
    for r in rows:
        # inclusion-exclusion must hold exactly in the exact regime
        assert r.n_either == r.n_a + r.n_b - r.n_both
        assert r.n_only_a == r.n_a - r.n_both
        assert 0 <= r.n_both <= min(r.n_a, r.n_b)


def test_hll_merge_matches_direct(spark, sf_dir):
    rows = sk.q_hll_distinct_profile(spark, sf_dir).collect()
    assert len(rows) == 5
    assert all(r.merged_matches_direct for r in rows)


def test_hll_partial_aggregation(spark, sf_dir):
    # the sketch aggregate must be algebraic: a partial (ObjectHashAggregate
    # or SortAggregate) below the exchange, so the shuffle moves sketches,
    # not raw keys
    plan = formatted_plan(sk.q_hll_distinct_profile(spark, sf_dir))
    assert "ObjectHashAggregate" in plan or "SortAggregate" in plan


def test_kll_rank_flags_all_pass(spark, sf_dir):
    rows = sk.q_kll_quantile_bounds(spark, sf_dir).collect()
    assert len(rows) == 18  # (5 priorities + _all) x 3 quantiles
    assert all(r.rank_ok for r in rows)
    glob = [r for r in rows if r.o_orderpriority == "_all"]
    assert len(glob) == 3


# --- exact-regime documentation check ---------------------------------------


@pytest.mark.parametrize("col,table", [("o_custkey", "orders")])
def test_gate_cardinality_within_exact_regime(spark, sf_dir, col, table):
    """The oracle compares Theta estimates AS VALUES, which relies on
    test-SF cardinalities sitting inside the sketch's exact regime
    (< 2^THETA_LG_K nominal entries).  If the testdata ever grows past
    that, this fails loudly and the query should switch to bound-flag
    validation like the HLL profile (see module docstring)."""
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    per_group = (
        df.groupBy("o_orderpriority")
        .agg(F.countDistinct(col).alias("n"))
        .agg(F.max("n").alias("mx"))
        .collect()[0]
        .mx
    )
    assert per_group < 2 ** sk.THETA_LG_K
    # customer_churn_sketch value-checks GLOBAL and per-PERIOD cardinalities
    # (not per-priority) — its guarded quantities must be covered too, or a
    # testdata growth could exit Theta's exact regime without this firing
    # (ADVICE r5).
    glob, lo, hi = df.agg(
        F.countDistinct(col),
        F.countDistinct(
            F.when(F.col("o_orderdate")
                   < F.lit(sk.CHURN_BOUNDARY).cast("timestamp"), F.col(col))
        ),
        F.countDistinct(
            F.when(F.col("o_orderdate")
                   >= F.lit(sk.CHURN_BOUNDARY).cast("timestamp"), F.col(col))
        ),
    ).collect()[0]
    assert max(glob, lo, hi) < 2 ** sk.THETA_LG_K


# --- streaming sketch rollup: replay-idempotent profile maintenance ---------


def test_streaming_sketch_rollup_merges_two_batches(spark, sf_dir, tmp_path):
    """The staged stream delivers every event twice across TWO
    micro-batches (maxFilesPerTrigger=1); the profile store must have
    committed a batch-1 version (proving the hll_union merge path ran,
    not a single-batch write) and the merged estimates must equal exact
    per-day distincts despite the duplicate delivery."""
    import os

    from pyspark.sql import functions as F

    from self_healing_data_pipeline_agent_spark.streaming.events import (
        streaming_sketch_rollup,
    )

    store = str(tmp_path / "store")
    os.makedirs(store)
    res = streaming_sketch_rollup(spark, sf_dir, store_dir=store)
    got = {(str(r.day), r.n_users) for r in res.collect()}
    target = os.readlink(os.path.join(store, "profile"))
    assert ".v1-" in target, target  # second micro-batch committed last
    exact = {
        (str(r.day), r.n)
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(F.to_date("ts").alias("day"), "user_id")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == exact


def test_grouped_heavy_hitters_matches_naive(spark, sf_dir):
    """Per-language two-pass MG result must equal the naive grouped
    GROUP BY at the same threshold."""
    got = {
        (r.lang, r.term, r.n_occurrences)
        for r in sk.q_heavy_hitters_by_lang(spark, sf_dir).collect()
    }
    toks = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "lang", F.explode(F.expr(sk._TOKENS)).alias("term")
    )
    totals = {r.lang: r.n for r in toks.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    naive = {
        (r.lang, r.term, r.n)
        for r in toks.groupBy("lang", "term")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
        if r.n * sk.K_HH > totals[r.lang]
    }
    assert got == naive and len(got) > 0


# --- mergeable frequent-items summary ---------------------------------------


def _naive_counts(stream):
    c = {}
    for t in stream:
        c[t] = c.get(t, 0) + 1
    return c


def _mg_build(stream, cap):
    """Plain MG over a stream -> (counters, dec, n), mirroring the kernel."""
    counters, dec, n = {}, 0, 0
    for t in stream:
        n += 1
        if t in counters:
            counters[t] += 1
        elif len(counters) < cap:
            counters[t] = 1
        else:
            dec += 1
            dead = [k for k in counters if counters[k] == 1]
            for k in counters:
                counters[k] -= 1
            for k in dead:
                del counters[k]
            counters = {k: v for k, v in counters.items() if v > 0}
    return counters, dec, n


def test_mg_summary_merge_guarantee_any_order():
    """For every merge ORDER over partition summaries, the merged summary
    must satisfy  freq - dec <= est <= freq  for every term (est=0 when
    absent) and dec <= n/(cap+1) — the mergeable-summaries theorem the
    frequent_items_sketch contract flag relies on."""
    import itertools
    import random

    rng = random.Random(7)
    cap = 8
    # skewed universe so some terms are genuinely heavy
    universe = ["hh1"] * 40 + ["hh2"] * 25 + [f"t{i}" for i in range(60)]
    parts = []
    for _ in range(4):
        stream = [rng.choice(universe) for _ in range(300)]
        parts.append((_mg_build(stream, cap), stream))
    truth = _naive_counts([t for _, s in parts for t in s])
    n_total = sum(truth.values())
    for perm in itertools.permutations(range(4)):
        acc = ({}, 0, 0)
        for i in perm:
            acc = sk.mg_summary_merge(acc, parts[i][0], capacity=cap)
        counters, dec, n = acc
        assert n == n_total
        assert dec <= n // (cap + 1) + 1
        assert len(counters) <= cap
        for term, freq in truth.items():
            est = counters.get(term, 0)
            assert est <= freq, (term, est, freq)
            assert freq - est <= dec, (term, est, freq, dec)


def test_frequent_items_matches_two_pass(spark, sf_dir):
    """The mergeable-summary path must return exactly the same heavy-hitter
    set and counts as the two-pass MG recount, with every contract flag
    true."""
    fi = {
        (r.term, r.n_occurrences): r.est_ok
        for r in sk.q_frequent_items_sketch(spark, sf_dir).collect()
    }
    hh = {
        (r.term, r.n_occurrences)
        for r in sk.q_heavy_hitters(spark, sf_dir).collect()
    }
    assert set(fi) == hh
    assert all(fi.values())


# --- KLL drift decision -----------------------------------------------------


def test_kll_drift_margin_tripwire():
    """The drift DECISION is only cross-engine deterministic while the
    exact quantiles at the widened ranks keep a strict value gap (see
    q_kll_quantile_drift).  Re-derive the gap from data at all three SFs:
    for the undrifted corpus, A's widened median interval must sit
    strictly INSIDE B's widened threshold window per priority."""
    import duckdb

    t = sk.KLL_DRIFT_THRESH
    e = sk.KLL_DRIFT_PROBE_EPS
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        con = duckdb.connect()
        con.sql(
            "CREATE VIEW orders AS SELECT * FROM "
            f"'/root/testdata/{sf}/orders.parquet'"
        )
        rows = con.sql(f"""
            SELECT o_orderpriority,
              quantile_disc(o_totalprice, {0.5 - e})
                FILTER (WHERE o_orderdate < TIMESTAMP '{sk.CHURN_BOUNDARY}')
                AS probe_lo,
              quantile_disc(o_totalprice, {0.5 + e})
                FILTER (WHERE o_orderdate < TIMESTAMP '{sk.CHURN_BOUNDARY}')
                AS probe_hi,
              quantile_disc(o_totalprice, {0.5 - t + e})
                FILTER (WHERE o_orderdate >= TIMESTAMP '{sk.CHURN_BOUNDARY}')
                AS win_lo_max,
              quantile_disc(o_totalprice, {0.5 + t - e})
                FILTER (WHERE o_orderdate >= TIMESTAMP '{sk.CHURN_BOUNDARY}')
                AS win_hi_min
            FROM orders GROUP BY o_orderpriority
        """).fetchall()
        con.close()
        assert rows
        for p, probe_lo, probe_hi, win_lo_max, win_hi_min in rows:
            assert win_lo_max < probe_lo, (sf, p, "lower gap collapsed")
            assert probe_hi < win_hi_min, (sf, p, "upper gap collapsed")


def test_kll_drift_fires_on_shifted_data(spark, tmp_path):
    """True-positive check: inject a second period whose prices are
    shifted far past the threshold window and assert the flag fires."""
    from pyspark.sql import functions as F

    base = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    a = base.withColumn(
        "o_orderdate", F.lit("1997-06-01").cast("timestamp")
    )
    b = base.withColumn(
        "o_orderdate", F.lit("1999-06-01").cast("timestamp")
    ).withColumn("o_totalprice", F.col("o_totalprice") * 10 + 1e7)
    d = str(tmp_path / "drifted")
    a.unionByName(b).write.parquet(f"{d}/orders.parquet")
    rows = sk.q_kll_quantile_drift(spark, d).collect()
    assert rows and all(r.median_drifted for r in rows)


def test_streaming_profile_table_merges_and_answers_churn(
    spark, sf_dir, tmp_path
):
    """The full profile table (HLL+Theta+KLL per day) must commit a
    batch-1 version (the three-column merge path ran), answer churn
    exactly from Theta algebra despite every event being delivered twice,
    and keep every day's user cardinality inside the Theta exact regime
    (the tripwire for its value-checked oracle)."""
    import os

    from self_healing_data_pipeline_agent_spark.streaming.events import (
        streaming_profile_table,
    )

    store = str(tmp_path / "store")
    os.makedirs(store)
    table = streaming_profile_table(spark, sf_dir, store_dir=store)
    target = os.readlink(os.path.join(store, "profile"))
    assert ".v1-" in target, target  # second micro-batch committed last
    assert set(table.columns) == {"day", "hll", "th", "kll"}

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    exact = {
        (str(r.day), r.n)
        for r in ev.groupBy("day")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    got = {
        (str(r.day), r.n)
        for r in table.select(
            "day", F.theta_sketch_estimate("th").alias("n")
        ).collect()
    }
    assert got == exact
    assert all(n < 2 ** sk.THETA_LG_K for _, n in exact)


def test_daily_drift_margin_tripwire():
    """streaming_churn_profile's median_drifted column is deterministic
    only while every consecutive-day pair's exact quantiles keep strict
    value gaps at the widened ranks (probe 0.5 +/- e inside window
    0.5 +/- (t - e)).  Re-derive from data at all SFs — a data drop that
    collapses a gap must fail HERE, not in the driver's hash compare."""
    import duckdb

    t = sk.KLL_DAILY_DRIFT_THRESH
    e = sk.KLL_DRIFT_PROBE_EPS
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        con = duckdb.connect()
        con.sql(
            "CREATE VIEW events AS SELECT * FROM "
            f"'/root/testdata/{sf}/events.parquet'"
        )
        rows = con.sql(f"""
WITH d AS (SELECT CAST(ts AS DATE) AS day, value FROM events),
days AS (SELECT DISTINCT day FROM d),
seq AS (SELECT day, LAG(day) OVER (ORDER BY day) AS prev FROM days),
q AS (
  SELECT day,
    quantile_disc(value, {0.5 - e}) AS probe_lo,
    quantile_disc(value, {0.5 + e}) AS probe_hi,
    quantile_disc(value, {0.5 - t + e}) AS win_lo_max,
    quantile_disc(value, {0.5 + t - e}) AS win_hi_min
  FROM d GROUP BY day
)
SELECT s.day, qa.probe_lo, qa.probe_hi, qb.win_lo_max, qb.win_hi_min
FROM seq s JOIN q qa ON qa.day = s.prev JOIN q qb ON qb.day = s.day
""").fetchall()
        con.close()
        assert rows
        for day, probe_lo, probe_hi, win_lo_max, win_hi_min in rows:
            assert win_lo_max < probe_lo, (sf, str(day), "lower gap")
            assert probe_hi < win_hi_min, (sf, str(day), "upper gap")


def test_frequent_items_partition_invariant(spark, sf_dir, tmp_path):
    """The MG partials (and their est/dec) legitimately differ with the
    input partitioning, but the query's OUTPUT (exact heavy-hitter set,
    exact counts, theorem flag) must not — the property that makes the
    summary trustworthy on any cluster layout."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d1 = str(tmp_path / "one")
    d7 = str(tmp_path / "seven")
    docs.coalesce(1).write.parquet(f"{d1}/documents.parquet")
    docs.repartition(7).write.parquet(f"{d7}/documents.parquet")
    r1 = {
        (r.term, r.n_occurrences, r.est_ok)
        for r in sk.q_frequent_items_sketch(spark, d1).collect()
    }
    r7 = {
        (r.term, r.n_occurrences, r.est_ok)
        for r in sk.q_frequent_items_sketch(spark, d7).collect()
    }
    assert r1 == r7 and r1
    assert all(ok for _, _, ok in r1)


def test_kll_drift_empty_period_yields_null_not_crash(spark, tmp_path):
    """A priority with an EMPTY period must keep its row with a NULL
    decision in BOTH engines: the Spark quantile functions THROW on the
    null sketch an empty period aggregates to (guarded by the count
    CASE), and a join-based oracle would silently DROP the row (r6
    review finding — the oracle is join-free on purpose)."""
    import duckdb

    import __spark_entry__ as entry_mod

    base = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    boundary = F.lit(sk.CHURN_BOUNDARY).cast("timestamp")
    mod = base.filter(
        ~((F.col("o_orderpriority") == "5-LOW")
          & (F.col("o_orderdate") >= boundary))
    )
    d = str(tmp_path / "gap")
    mod.write.parquet(f"{d}/orders.parquet")
    rows = {r.o_orderpriority: r for r in
            sk.q_kll_quantile_drift(spark, d).collect()}
    assert rows["5-LOW"].n_b == 0
    assert rows["5-LOW"].median_drifted is None
    assert len(rows) == 5
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM '{d}/orders.parquet/*.parquet'")
    duck = {r[0]: r for r in
            con.sql(entry_mod.oracle_sql()["kll_quantile_drift"]).fetchall()}
    con.close()
    assert len(duck) == 5
    assert duck["5-LOW"][2] == 0 and duck["5-LOW"][3] is None


def test_session_tmpdir_cleaned_at_interpreter_exit():
    """The staging/snapshot dirs streaming queries leave behind must be
    removed when the creating interpreter exits (r6 review finding: a
    parity session was accumulating events-table copies in /tmp)."""
    import os
    import subprocess
    import sys

    code = (
        "import sys; sys.path.insert(0, '/root/repo');"
        "from self_healing_data_pipeline_agent_spark.streaming.events "
        "import _session_tmpdir;"
        "import pathlib;"
        "d = _session_tmpdir('leakcheck_');"
        "pathlib.Path(d, 'payload').write_text('x');"
        "print(d)"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        check=True,
    )
    d = out.stdout.strip().splitlines()[-1]
    assert d.startswith("/tmp")
    assert not os.path.exists(d), f"{d} survived interpreter exit"


def test_session_window_watermark_margin_tripwire():
    """ADVICE r6: streaming_session_windows' append-mode oracle emits
    sessions with last_event + gap <= max_ts - watermark; a session end
    landing EXACTLY on the watermark would make Spark's eviction boundary
    the tie-breaker.  Assert no session's (last_event + gap) coincides
    with the watermark at any test SF — same pattern as the KLL margin
    tripwires: the tie stays a latent impossibility, verified per data
    drop rather than assumed."""
    import duckdb

    from self_healing_data_pipeline_agent_spark.streaming.events import (
        SESSION_GAP_MICROS,
    )

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        con = duckdb.connect()
        con.sql(
            "CREATE VIEW events AS SELECT * FROM "
            f"'/root/testdata/{sf}/events.parquet'"
        )
        (n_exact,) = con.sql(f"""
            WITH flagged AS (
              SELECT user_id, ts,
                     CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                            OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                               > {SESSION_GAP_MICROS}
                          THEN 1 ELSE 0 END AS new_session
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), numbered AS (
              SELECT user_id, ts,
                     SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) AS session_id
              FROM flagged
            ), horizon AS (
              SELECT epoch_us(MAX(ts)) - 7200000000 AS wm_us FROM events
            )
            SELECT COUNT(*) FROM (
              SELECT MAX(epoch_us(ts)) + {SESSION_GAP_MICROS} AS end_us
              FROM numbered GROUP BY user_id, session_id
            ), horizon WHERE end_us = wm_us
        """).fetchone()
        con.close()
        assert n_exact == 0, (
            f"{sf}: {n_exact} sessions end exactly on the watermark — the "
            "append-mode emission boundary is now a cross-engine tie"
        )


def test_profile_compaction_structure_and_exact_regime():
    """streaming_profile_compaction: (a) the compaction actually merges —
    week rows exist and at least one merges multiple days; (b) the daily
    tail is intact (max PROFILE_RETAIN_DAYS day rows, none older than the
    cutoff); (c) every compacted period's exact distinct-user cardinality
    sits far inside the Theta lgK=16 exact regime, so the hashed
    ``n_users`` can never drift into estimation.  DuckDB-side on raw
    events — the cardinality bound is a property of the data, not the
    engine."""
    import duckdb

    from self_healing_data_pipeline_agent_spark.operators.sketches import (
        THETA_LG_K,
    )
    from self_healing_data_pipeline_agent_spark.streaming.events import (
        PROFILE_RETAIN_DAYS,
    )

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        con = duckdb.connect()
        con.sql(
            "CREATE VIEW events AS SELECT * FROM "
            f"'/root/testdata/{sf}/events.parquet'"
        )
        rows = con.sql(f"""
            WITH maxd AS (SELECT MAX(CAST(ts AS DATE)) AS m FROM events)
            SELECT CASE WHEN CAST(ts AS DATE) <= m - {PROFILE_RETAIN_DAYS}
                        THEN date_trunc('week', CAST(ts AS DATE))
                        ELSE CAST(ts AS DATE) END AS period_start,
                   CASE WHEN CAST(ts AS DATE) <= m - {PROFILE_RETAIN_DAYS}
                        THEN 'week' ELSE 'day' END AS granularity,
                   COUNT(DISTINCT CAST(ts AS DATE)) AS n_days,
                   COUNT(DISTINCT user_id) AS n_users
            FROM events, maxd
            GROUP BY 1, 2
        """).fetchall()
        con.close()
        weeks = [r for r in rows if r[1] == "week"]
        days = [r for r in rows if r[1] == "day"]
        assert weeks, f"{sf}: no week rows — compaction untested"
        assert any(r[2] > 1 for r in weeks), f"{sf}: no multi-day week"
        assert len(days) <= PROFILE_RETAIN_DAYS, f"{sf}: daily tail too long"
        cap = 2 ** THETA_LG_K // 2  # half-nominal: sampling nowhere near
        for r in rows:
            assert r[3] < cap, (
                f"{sf}: period {r[0]} has {r[3]} users — approaching the "
                "Theta exact regime bound; the hashed n_users contract "
                "needs re-examination"
            )


def test_profile_compaction_flag_margins(spark):
    """r7 review finding: the compaction's hashed booleans (hll_ok,
    med_rank_ok) compared measured estimates against their thresholds
    with no margin check — a driver-side estimate drift could flip a flag
    with no local warning.  Assert, from the SAME pipeline the query
    reads (compaction_estimates), that every period clears both
    thresholds with >= 2x headroom at the local-default AND driver-gate
    SFs."""
    from self_healing_data_pipeline_agent_spark.operators.sketches import (
        HLL_REL_TOL,
    )
    from self_healing_data_pipeline_agent_spark.streaming.events import (
        COMPACTION_RANK_EPS,
        compaction_estimates,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rows = compaction_estimates(spark, sf).collect()
        assert rows, f"{sf}: no compacted periods"
        for r in rows:
            rel = abs(r.hll_est - r.th_est) / r.th_est
            assert rel <= HLL_REL_TOL / 2, (
                f"{sf} {r.period_start}: HLL-vs-Theta rel err {rel:.4f} "
                f"within 2x of the {HLL_REL_TOL} flag threshold"
            )
            assert r.med_rank_dev <= COMPACTION_RANK_EPS / 2, (
                f"{sf} {r.period_start}: median rank dev "
                f"{r.med_rank_dev:.4f} within 2x of the "
                f"{COMPACTION_RANK_EPS} flag threshold"
            )


def test_profile_compaction2_structure_and_exact_regime():
    """Second-tier compaction (day -> week -> month): (a) a month row
    exists and merges MULTIPLE already-merged week rows — the two-level
    union is actually exercised; (b) some week and day rows pass through
    untouched, so all three granularities coexist; (c) every final
    period's exact cardinality stays far inside the Theta lgK=16 exact
    regime even at the month level (the widest union in the repo)."""
    import duckdb

    from self_healing_data_pipeline_agent_spark.operators.sketches import (
        THETA_LG_K,
    )
    from self_healing_data_pipeline_agent_spark.streaming.events import (
        PROFILE_RETAIN_DAYS,
        PROFILE_RETAIN_WEEK_DAYS,
    )

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        con = duckdb.connect()
        con.sql(
            "CREATE VIEW events AS SELECT * FROM "
            f"'/root/testdata/{sf}/events.parquet'"
        )
        rows = con.sql(f"""
            WITH maxd AS (SELECT MAX(CAST(ts AS DATE)) AS m FROM events),
            k1 AS (
              SELECT CASE WHEN CAST(ts AS DATE) <= m - {PROFILE_RETAIN_DAYS}
                          THEN date_trunc('week', CAST(ts AS DATE))
                          ELSE CAST(ts AS DATE) END AS p1,
                     CASE WHEN CAST(ts AS DATE) <= m - {PROFILE_RETAIN_DAYS}
                          THEN 'week' ELSE 'day' END AS g1,
                     m, user_id FROM events, maxd
            ),
            k2 AS (
              SELECT CASE WHEN g1 = 'week' AND p1 <= m - {PROFILE_RETAIN_WEEK_DAYS}
                          THEN date_trunc('month', p1) ELSE p1 END AS p2,
                     CASE WHEN g1 = 'week' AND p1 <= m - {PROFILE_RETAIN_WEEK_DAYS}
                          THEN 'month' ELSE g1 END AS g2,
                     p1, user_id FROM k1
            )
            SELECT g2, p2, COUNT(DISTINCT p1) AS n_src,
                   COUNT(DISTINCT user_id) AS n_users
            FROM k2 GROUP BY g2, p2
        """).fetchall()
        con.close()
        months = [r for r in rows if r[0] == "month"]
        assert months, f"{sf}: no month rows — tier-2 union untested"
        assert any(r[2] > 1 for r in months), (
            f"{sf}: no month merges multiple week rows — the "
            "merge-of-merged property is not exercised"
        )
        assert [r for r in rows if r[0] == "week"], f"{sf}: no week rows"
        assert [r for r in rows if r[0] == "day"], f"{sf}: no day rows"
        cap = 2 ** THETA_LG_K // 2
        for r in rows:
            assert r[3] < cap, (
                f"{sf}: period {r[1]} has {r[3]} users — approaching the "
                "Theta exact regime bound at the month tier"
            )


def test_profile_compaction2_flag_margins(spark):
    """The tier-2 margin tripwire, one union level deeper than
    test_profile_compaction_flag_margins: every period of the two-level
    pipeline — including the month rows whose KLL is a merge of
    ALREADY-merged week sketches — must clear the hashed flags'
    thresholds with >= 2x headroom.  If KLL merge error compounded
    super-linearly across levels, this catches it before a driver hash
    flips (measured month-tier max deviation: 0.0002, far below the
    week tier's 0.0217)."""
    from self_healing_data_pipeline_agent_spark.operators.sketches import (
        HLL_REL_TOL,
    )
    from self_healing_data_pipeline_agent_spark.streaming.events import (
        COMPACTION2_RANK_EPS,
        compaction2_estimates,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rows = compaction2_estimates(spark, sf).collect()
        assert rows, f"{sf}: no tier-2 periods"
        assert any(
            r.granularity == "month" and r.n_source_rows > 1 for r in rows
        ), f"{sf}: no multi-week month row in the measured pipeline"
        for r in rows:
            rel = abs(r.hll_est - r.th_est) / r.th_est
            assert rel <= HLL_REL_TOL / 2, (
                f"{sf} {r.period_start} ({r.granularity}): HLL-vs-Theta "
                f"rel err {rel:.4f} within 2x of the {HLL_REL_TOL} flag "
                "threshold"
            )
            assert r.med_rank_dev <= COMPACTION2_RANK_EPS / 2, (
                f"{sf} {r.period_start} ({r.granularity}): median rank "
                f"dev {r.med_rank_dev:.4f} within 2x of the "
                f"{COMPACTION2_RANK_EPS} flag threshold"
            )
