"""Physical-plan regression tests: the 100 TB design properties we rely on
(pushdown reaching the scan, dimension broadcasts, bounded shuffle counts)
are asserted here so a plan regression fails CI instead of shipping as a
silent at-scale slowdown.  Uses the ``plans`` inspection helpers.
"""

from __future__ import annotations

import re

from self_healing_data_pipeline_agent_spark.operators.events import (
    q_point_lookup,
)
from self_healing_data_pipeline_agent_spark.operators.relational import (
    q_revenue_by_nation,
    q_shipping_priority,
    q_tpch_q1,
)
from self_healing_data_pipeline_agent_spark.plans import (
    count_exchanges,
    formatted_plan,
    has_broadcast_join,
    has_pushed_filter,
)


def test_q1_filter_pushed_and_single_shuffle(spark, sf_dir):
    df = q_tpch_q1(spark, sf_dir)
    assert has_pushed_filter(df, "l_shipdate")
    # scan-heavy agg: exactly one exchange (partial -> final aggregate)
    assert count_exchanges(df) == 1
    # hot path stays codegen'd (codegen mode lists the compiled subtrees)
    cg = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "codegen"
    )
    assert "WholeStageCodegen subtree" in cg


def test_q1_column_pruning(spark, sf_dir):
    plan = formatted_plan(q_tpch_q1(spark, sf_dir))
    # the lineitem scan must NOT read unused columns
    scan = plan[plan.index("ReadSchema"):].splitlines()[0]
    assert "l_partkey" not in scan and "l_suppkey" not in scan


def test_shipping_priority_broadcasts_filtered_dims(spark, sf_dir):
    df = q_shipping_priority(spark, sf_dir)
    assert has_pushed_filter(df, "l_shipdate")
    assert has_pushed_filter(df, "c_mktsegment")
    assert has_broadcast_join(df)


def test_revenue_by_nation_broadcasts_bounded_dims(spark, sf_dir):
    df = q_revenue_by_nation(spark, sf_dir)
    assert has_broadcast_join(df)
    plan = formatted_plan(df)
    # pre-aggregation below the join must survive optimization: the
    # per-order partial aggregate appears before any join in the plan
    assert plan.index("HashAggregate") < plan.index("Join")


def test_point_lookup_pushes_key(spark, sf_dir):
    df = q_point_lookup(spark, sf_dir)
    assert has_pushed_filter(df, "event_id")


def test_train_val_split_is_shuffle_free(spark, sf_dir):
    # hash split must stay a pure map-side projection: zero exchanges
    from self_healing_data_pipeline_agent_spark.operators.text import (
        q_train_val_split,
    )

    df = q_train_val_split(spark, sf_dir)
    assert count_exchanges(df) == 0


def test_order_priority_check_decorrelates_to_semi_join(spark, sf_dir):
    from self_healing_data_pipeline_agent_spark.operators.relational import (
        q_order_priority_check,
    )

    plan = formatted_plan(q_order_priority_check(spark, sf_dir))
    assert "LeftSemi" in plan
    # the rollup happens AFTER the semi join shrinks the fact table
    assert plan.index("Join") < plan.rindex("HashAggregate")


def test_large_volume_customers_preaggregates_below_join(spark, sf_dir):
    from self_healing_data_pipeline_agent_spark.operators.relational import (
        q_large_volume_customers,
    )

    plan = formatted_plan(q_large_volume_customers(spark, sf_dir))
    # the per-order pre-aggregate shuffles on l_orderkey BEFORE any join...
    assert "hashpartitioning(l_orderkey" in plan
    # ...the qualifying tail then joins broadcast-side
    assert "BroadcastHashJoin" in plan
    # and the fact scan reads only the two columns the pre-agg needs
    scan = plan[plan.index("ReadSchema"):].splitlines()[0]
    assert "l_orderkey" in scan and "l_quantity" in scan
    assert "l_extendedprice" not in scan


def test_pivot_compiles_to_single_aggregate_pass(spark, sf_dir):
    # declared pivot values -> conditional aggregates, one shuffle, and no
    # separate distinct-values job materialized in the plan
    from self_healing_data_pipeline_agent_spark.operators.relational import (
        q_pivot_status_priority,
    )

    df = q_pivot_status_priority(spark, sf_dir)
    # two-level aggregate: one shuffle of (priority, status) partials plus
    # one of per-priority rows — both tiny.  The point of declaring pivot
    # values is that NO separate distinct-values collect job runs first.
    assert count_exchanges(df) <= 2


def test_decontaminate_broadcasts_benchmark_shingles(spark, sf_dir):
    from self_healing_data_pipeline_agent_spark.operators.text import (
        q_decontaminate_docs,
    )

    df = q_decontaminate_docs(spark, sf_dir)
    assert has_broadcast_join(df)


def test_curate_corpus_all_joins_broadcast(spark, sf_dir):
    # the composed curation funnel must contain NO sort-merge join: the
    # benchmark shingle set and the 1-row survivor aggregate broadcast,
    # and the contamination semi-join rides the broadcast too.  A stray
    # SortMergeJoin here means a full shuffle of the corpus shingle
    # stream at 100 TB.
    from self_healing_data_pipeline_agent_spark.operators.text import (
        q_curate_corpus,
    )

    df = q_curate_corpus(spark, sf_dir)
    plan = formatted_plan(df)
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_funnel_stacks_windows_behind_one_exchange(spark, sf_dir):
    # three chained conditional-min windows share one partitioning: the
    # whole funnel costs 2 exchanges (windows + final rollup), no sorts
    from self_healing_data_pipeline_agent_spark.operators.events import (
        q_funnel_conversion,
    )

    df = q_funnel_conversion(spark, sf_dir)
    assert count_exchanges(df) <= 2


def test_salted_hot_key_agg_two_level_shape(spark, sf_dir):
    """Skew-safe agg = exactly two shuffles: (key, salt) partials, then
    the tiny key-level merge.  More would mean the salting collapsed."""
    from self_healing_data_pipeline_agent_spark.operators.events import (
        q_salted_hot_key_agg,
    )

    df = q_salted_hot_key_agg(spark, sf_dir)
    assert count_exchanges(df) == 2
    # and the result is NOT salted: one row per key
    plan = formatted_plan(df)
    assert "_salt" in plan  # stage-1 grouping really includes the salt


def test_pack_sequences_single_window_shuffle(spark, sf_dir):
    """pack_id and offset_in_pack must share ONE window (one exchange on
    lang) — a second exchange would mean the two window references split."""
    from self_healing_data_pipeline_agent_spark.operators.text import (
        q_pack_sequences,
    )

    df = q_pack_sequences(spark, sf_dir)
    assert count_exchanges(df) == 1
    assert formatted_plan(df).count("Window") <= 2  # one Window op (+header)


def test_pii_scrub_is_map_only(spark, sf_dir):
    """Regex masking is a pure projection: zero exchanges, codegen'd."""
    from self_healing_data_pipeline_agent_spark.operators.text import (
        q_pii_scrub,
    )

    df = q_pii_scrub(spark, sf_dir)
    assert count_exchanges(df) == 0


def test_quantile_profile_spans_from_footer_stats(spark, sf_dir):
    """Bucket spans must come from parquet footer statistics (zero data
    passes), and must agree with a real scan."""
    from self_healing_data_pipeline_agent_spark.sources.tables import (
        load_table,
        parquet_column_spans,
    )

    spans = parquet_column_spans(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"])
    assert spans is not None
    li = load_table(spark, sf_dir, "lineitem")
    from pyspark.sql import functions as F

    row = li.agg(
        F.min("l_quantity"), F.max("l_quantity"),
        F.min("l_extendedprice"), F.max("l_extendedprice"),
    ).collect()[0]
    assert spans["l_quantity"] == (row[0], row[1])
    assert spans["l_extendedprice"] == (row[2], row[3])


def test_anomaly_zscore_reuses_window_partitioning(spark, sf_dir):
    """Whole-partition window + same-key final agg must plan exactly ONE
    exchange — the aggregation reuses the window's hash partitioning."""
    from self_healing_data_pipeline_agent_spark.operators.events import (
        q_anomaly_zscore,
    )

    assert count_exchanges(q_anomaly_zscore(spark, sf_dir)) == 1


def test_histogram_profile_single_pass(spark, sf_dir):
    """Footer-stat bin edges -> the whole histogram is one aggregation."""
    from self_healing_data_pipeline_agent_spark.operators.relational import (
        q_histogram_profile,
    )

    assert count_exchanges(q_histogram_profile(spark, sf_dir)) == 1


def test_quality_gates_map_only(spark, sf_dir):
    from self_healing_data_pipeline_agent_spark.operators.text import (
        q_quality_gates,
    )

    assert count_exchanges(q_quality_gates(spark, sf_dir)) == 0


def test_tpch_q7_broadcasts_both_filtered_dims(spark, sf_dir):
    from self_healing_data_pipeline_agent_spark.operators.relational import (
        q_tpch_q7,
    )

    df = q_tpch_q7(spark, sf_dir)
    assert has_pushed_filter(df, "l_shipdate")
    plan = formatted_plan(df)
    # both nation-filtered dims broadcast: no shuffle of lineitem on a
    # dimension key — the only exchanges are orders join + final agg
    assert plan.count("BroadcastHashJoin") >= 2


def test_error_context_join_is_equi_not_nested_loop(spark, sf_dir):
    """The binned range join must plan as an EQUI join on (user_id, bin):
    no BroadcastNestedLoopJoin / CartesianProduct despite the range
    predicate."""
    from self_healing_data_pipeline_agent_spark.operators.events import (
        q_error_context_join,
    )

    plan = formatted_plan(q_error_context_join(spark, sf_dir))
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan \
        or "BroadcastHashJoin" in plan


def test_normalize_text_is_shuffle_free(spark, sf_dir):
    from self_healing_data_pipeline_agent_spark.operators.text import (
        q_normalize_text,
    )

    assert count_exchanges(q_normalize_text(spark, sf_dir)) == 0


def test_incremental_dedup_no_corpus_self_pairs(spark, sf_dir):
    """Batch-vs-corpus candidate join only: every returned match pairs a
    batch doc (id % 10 == 0) with a corpus doc (id % 10 != 0)."""
    from self_healing_data_pipeline_agent_spark.operators.text import (
        INCR_BATCH_MOD,
        q_incremental_dedup,
    )

    rows = q_incremental_dedup(spark, sf_dir).collect()
    for r in rows:
        assert r["new_doc"] % INCR_BATCH_MOD == 0
        assert r["corpus_doc"] % INCR_BATCH_MOD != 0


def test_tpch_q8_single_big_join_rest_broadcast(spark, sf_dir):
    """Q8's 7-table tree: every dimension broadcasts (filtered first);
    the only shuffle-join edge is lineitem-orders."""
    from self_healing_data_pipeline_agent_spark.operators.relational import (
        q_tpch_q8,
    )

    df = q_tpch_q8(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("BroadcastHashJoin") >= 4
    n_smj = plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin")
    assert n_smj <= 1


def test_activity_streaks_single_shuffle(spark, sf_dir):
    # gaps-and-islands chain: collect_set agg, posexplode, two windows and
    # two re-aggregations must all reuse the one hash(user_id) exchange
    from self_healing_data_pipeline_agent_spark.operators.events import (
        q_activity_streaks,
    )

    assert count_exchanges(q_activity_streaks(spark, sf_dir)) == 1


def test_scd2_single_shuffle(spark, sf_dir):
    # lag -> cumsum -> per-run agg -> lead: one hash(o_custkey) exchange,
    # Catalyst adds only sorts after it
    from self_healing_data_pipeline_agent_spark.operators.relational import (
        q_scd2_priority_history,
    )

    assert count_exchanges(q_scd2_priority_history(spark, sf_dir)) == 1


def test_profit_by_nation_year_all_broadcast(spark, sf_dir):
    # filtered part dim and pre-joined supplier+nation dim both broadcast:
    # the fact table is never shuffled on a dimension key
    from self_healing_data_pipeline_agent_spark.operators.relational import (
        q_profit_by_nation_year,
    )

    plan = formatted_plan(q_profit_by_nation_year(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_session_concurrency_bounded_exchanges(spark, sf_dir):
    # two-level prefix sum: sessionization's user shuffle, the per-day
    # window/agg, and the tiny distinct-day carry window — the sweep line
    # must not funnel raw deltas through one global ordered window
    from self_healing_data_pipeline_agent_spark.operators.events import (
        q_session_concurrency,
    )

    df = q_session_concurrency(spark, sf_dir)
    assert count_exchanges(df) <= 6


def test_simhash_blocked_is_equi_join_not_cartesian(spark, sf_dir):
    # pigeonhole chunk blocking: candidates meet on the (chunk_id,
    # chunk_val) equi-key — the plan must contain no all-pairs product
    # (the unblocked twin is BroadcastNestedLoopJoin on doc_id < doc_id)
    from self_healing_data_pipeline_agent_spark.operators.text import (
        q_simhash_near_dup_blocked,
    )

    plan = formatted_plan(q_simhash_near_dup_blocked(spark, sf_dir))
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_sole_late_supplier_reads_fact_once(spark, sf_dir):
    # Q21 adapted: the agg + per-order-window formulation must read
    # lineitem ONCE — the textbook EXISTS/NOT-EXISTS self-joins would
    # scan the fact three times
    from self_healing_data_pipeline_agent_spark.operators.relational import (
        q_sole_late_supplier,
    )

    df = q_sole_late_supplier(spark, sf_dir)
    plan = formatted_plan(df)
    # formatted explain lists each scan node twice (tree + detail); count
    # the detail headers for the true scan count
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 3
    assert has_pushed_filter(df, "o_orderstatus")
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_concentrated_value_parts_reads_fact_once(spark, sf_dir):
    # Q11 adapted: the global threshold comes from a whole-result window
    # over the |parts|-sized aggregate, never a second fact scan; the
    # nation's supplier list broadcasts into the one lineitem pass
    from self_healing_data_pipeline_agent_spark.operators.relational import (
        q_concentrated_value_parts,
    )

    df = q_concentrated_value_parts(spark, sf_dir)
    plan = formatted_plan(df)
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 3
    assert has_broadcast_join(df)


def test_supplier_part_breadth_anti_join_broadcasts(spark, sf_dir):
    # Q16 adapted: the exclusion list must plan as a broadcast ANTI join
    # (a NOT IN shuffle would move the fact on a dimension key) and the
    # fact scan must read only the two join columns
    from self_healing_data_pipeline_agent_spark.operators.relational import (
        q_supplier_part_breadth,
    )

    df = q_supplier_part_breadth(spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan
    scan = plan[plan.index("ReadSchema"):].splitlines()[0]
    assert "l_quantity" not in scan and "l_extendedprice" not in scan


def test_q6_all_predicates_pushed_no_join(spark, sf_dir):
    """Q6 is the pure-pushdown microbenchmark: every filter must reach the
    parquet scan, and the plan must be a single-exchange scan+agg."""
    from self_healing_data_pipeline_agent_spark.operators.relational import (
        q_tpch_q6,
    )

    df = q_tpch_q6(spark, sf_dir)
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert has_pushed_filter(df, col), col
    assert count_exchanges(df) == 1
    plan = formatted_plan(df)
    assert "Join" not in plan


def test_one_pass_profile_partial_aggregation(spark, sf_dir):
    """The composed profile's sketch aggregates must stay algebraic: a
    partial object-hash/sort aggregate below the exchange so the shuffle
    moves sketch partial states, not raw rows."""
    from self_healing_data_pipeline_agent_spark.operators.sketches import (
        q_one_pass_profile,
    )

    plan = formatted_plan(q_one_pass_profile(spark, sf_dir))
    assert "ObjectHashAggregate" in plan or "SortAggregate" in plan


def test_kll_drift_one_scan_one_exchange(spark, sf_dir):
    """Both period sketches must come from ONE orders scan (conditional
    algebraic aggs) with a single exchange of partial sketch states — the
    shape whose shuffle is KB-sized regardless of input."""
    from self_healing_data_pipeline_agent_spark.operators.sketches import (
        q_kll_quantile_drift,
    )

    df = q_kll_quantile_drift(spark, sf_dir)
    plan = formatted_plan(df)
    # formatted explain lists each node in the tree AND a detail section —
    # count the numbered detail entries, one per physical node
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert count_exchanges(df) == 1
    assert "ObjectHashAggregate" in plan or "SortAggregate" in plan


def test_frequent_items_broadcasts_summary_candidates(spark, sf_dir):
    """The gate-side recount must broadcast the merged-summary candidate
    set against the token stream — never shuffle the corpus by term — and
    the summary path itself must be mapInPandas partials folded by a
    grouped kernel (the only exchange carries one summary row per
    partition)."""
    from self_healing_data_pipeline_agent_spark.operators.sketches import (
        q_frequent_items_sketch,
    )

    plan = formatted_plan(q_frequent_items_sketch(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "MapInPandas" in plan
    assert "FlatMapGroupsInPandas" in plan


def test_dynamic_partition_pruning_on_partitioned_warehouse(
    spark, sf_dir, tmp_path
):
    """A dim-filtered join against a priority-partitioned fact layout must
    plan a dynamicpruning partition filter — at 100 TB this is what turns
    'join the fact to a filtered dim' into 'scan two partitions', and it
    only happens when the warehouse is laid out partitioned (the S3
    partitioned-sink path) and the join key is the partition column."""
    from pyspark.sql import functions as F

    fact_dir = str(tmp_path / "orders_part")
    spark.read.parquet(f"{sf_dir}/orders.parquet").write.partitionBy(
        "o_orderpriority"
    ).mode("overwrite").parquet(fact_dir)
    fact = spark.read.parquet(fact_dir)
    dim = spark.createDataFrame(
        [("1-URGENT", "hot"), ("5-LOW", "cold")],
        ["o_orderpriority", "tier"],
    ).filter(F.col("tier") == "hot")
    j = fact.join(dim, "o_orderpriority").groupBy("tier").count()
    plan = formatted_plan(j)
    assert "dynamicpruning" in plan, "dynamic partition pruning did not plan"


def test_aqe_splits_skewed_join_partitions(spark):
    """AQE skew-join is the engine-native complement of the manual salting
    path (functions/skew.py): a hot-key sort-merge join must re-plan at
    runtime with the skewed partition SPLIT (SortMergeJoin(skew=true)),
    so one straggler partition cannot serialize a 1000-executor stage.
    Thresholds are lowered to make test-sized data exhibit the behavior;
    the production defaults engage at 256 MB partitions."""
    from pyspark.sql import functions as F

    conf = spark.conf
    tuned = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: conf.get(k, None) for k in tuned}
    try:
        for k, v in tuned.items():
            conf.set(k, v)
        hot = spark.range(0, 200_000).select(
            F.lit(0).alias("k"), F.col("id").alias("va")
        )
        tail = spark.range(0, 50_000).select(
            (F.col("id") % 1000 + 1).alias("k"), F.col("id").alias("va")
        )
        b = spark.range(0, 50_000).select(
            (F.col("id") % 1001).alias("k"), F.col("id").alias("vb")
        )
        j = hot.union(tail).join(b, "k").groupBy().count()
        assert j.collect()[0][0] > 0
        assert "skew=true" in formatted_plan(j)
    finally:
        for k, v in saved.items():
            conf.set(k, v) if v is not None else conf.unset(k)


def test_contamination_score_broadcasts_benchmark(spark, sf_dir):
    """The benchmark shingle set must broadcast to the corpus shingle
    stream; a sort-merge join here means reshuffling the corpus by
    shingle at 100 TB."""
    from self_healing_data_pipeline_agent_spark.operators.text import (
        q_contamination_score,
    )

    plan = formatted_plan(q_contamination_score(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_shard_manifest_no_global_sort(spark, sf_dir):
    """Shard assignment must ride the broadcast lookup and positions must
    come from per-shard window sorts — the plan may never collapse to a
    SinglePartition exchange (a single global order does not exist at
    100 TB)."""
    from self_healing_data_pipeline_agent_spark.operators.text import (
        q_shard_manifest,
    )

    plan = formatted_plan(q_shard_manifest(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SinglePartition" not in plan


def test_substring_dup_spans_semi_join_and_equi_grams(spark, sf_dir):
    """The candidate prefilter must plan as a LEFT SEMI join (the
    pair-generation prune) and the gram-posting join must be an
    equi-hash-join on the gram hash — a nested-loop/cartesian here is the
    all-pairs blowup the winnowed prefilter exists to prevent."""
    from self_healing_data_pipeline_agent_spark.operators.text import (
        q_substring_dup_spans,
    )

    plan = formatted_plan(q_substring_dup_spans(spark, sf_dir))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_source_scorecard_broadcasts_small_sides(spark, sf_dir):
    """The scorecard's composition must broadcast the bench-shingle set
    and the char-LM model; the doc_id-keyed signal joins may shuffle (all
    co-keyed), but nothing may nested-loop."""
    from self_healing_data_pipeline_agent_spark.operators.text import (
        q_source_scorecard,
    )

    plan = formatted_plan(q_source_scorecard(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ann_int8_rerank_broadcasts_queries_and_codebook(spark, sf_dir):
    """The SQ8 scan must stream the corpus once against BROADCAST queries
    and a BROADCAST one-row codebook; the only wide exchange allowed is
    the per-query top-k window."""
    from self_healing_data_pipeline_agent_spark.operators.similarity import (
        q_ann_int8_rerank,
    )

    df = q_ann_int8_rerank(spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # codebook + query broadcasts: at least two broadcast exchanges
    assert plan.count("BroadcastExchange") >= 2


def test_idle_rich_customers_date_filter_pushed(spark, sf_dir):
    """The r8 idle-since re-contract must push the recency filter to the
    ORDERS parquet scan (the anti join's build side reads one column of a
    date-pruned scan, not the whole table) and broadcast the 1-row
    average — no nested-loop anywhere else."""
    from self_healing_data_pipeline_agent_spark.operators.relational import (
        q_idle_rich_customers,
    )

    df = q_idle_rich_customers(spark, sf_dir)
    plan = formatted_plan(df)
    assert has_pushed_filter(df, "o_orderdate")
    assert "CartesianProduct" not in plan


def test_payload_dedup_stays_in_codegen(spark, sf_dir):
    """Block-level dedup (r8) must slice blocks with explode+substring —
    whole-stage-codegen expressions — not a Python UDF or an interpreted
    per-element lambda, and must partial-aggregate the digest counts
    map-side (exactly one shuffle: the sha groupBy; the orderBy collapses
    to the same single-partition exchange at test scale)."""
    from self_healing_data_pipeline_agent_spark.operators.multimodal import (
        q_payload_dedup,
    )

    df = q_payload_dedup(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Python" not in plan  # no UDF/ArrowEval anywhere
    # block slicing = explode of indexes + substring in a plain Project
    # (JVM expressions), not an interpreted transform() lambda
    assert re.search(r"\(\d+\) Generate", plan)
    assert "sha2(substring(payload" in plan
    assert "lambdafunction" not in plan.lower()
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_multimodal_decode_ppm_single_python_stage(spark, sf_dir):
    """The PPM ring's plan contract: the JVM-side encode (concat/rpad)
    feeds exactly ONE Arrow-batched Python stage (the registry-dispatched
    decode kernel), and the query is map-only — zero shuffles, the
    embarrassingly-parallel shape every multimodal kernel must keep."""
    from self_healing_data_pipeline_agent_spark.operators.multimodal import (
        q_multimodal_decode_ppm,
    )

    df = q_multimodal_decode_ppm(spark, sf_dir)
    plan = formatted_plan(df)
    # formatted mode renders each node twice (tree + detail section)
    assert len(re.findall(r"\(\d+\) MapInPandas", plan)) == 1
    assert count_exchanges(df) == 0


def test_tpch_q8_broadcasts_all_dimensions(spark, sf_dir):
    """Q8's only big-big edge is lineitem-orders; every dimension
    (region-filtered customers, promo parts, nation-named suppliers) must
    broadcast.  First plan-checked in r8 — the query was empty at every
    SF until the region-constant fix, so its plan had never carried a
    row."""
    from self_healing_data_pipeline_agent_spark.operators.relational import (
        q_tpch_q8,
    )

    df = q_tpch_q8(spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastExchange") >= 3


def test_minhash_lsh_pairs_equi_band_join(spark, sf_dir):
    """The MinHash blocker must be an equi hash join on the band key —
    a nested-loop here is the all-pairs blowup banding exists to
    prevent.  (Below-window r5 green; pinned in r8 so a plan regression
    fails CI even while the query rides its official record.)"""
    from self_healing_data_pipeline_agent_spark.operators.text import (
        q_minhash_lsh_pairs,
    )

    plan = formatted_plan(q_minhash_lsh_pairs(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_duplicate_clusters_no_cartesian(spark, sf_dir):
    """Iterative connected-components over LSH edges: every join in the
    final composed plan must be keyed (edges, labels) — never cartesian."""
    from self_healing_data_pipeline_agent_spark.operators.text import (
        q_duplicate_clusters,
    )

    plan = formatted_plan(q_duplicate_clusters(spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_semantic_dedup_broadcasts_codebook(spark, sf_dir):
    """SemDeDup must broadcast the 16-centroid codebook against the
    corpus scan (the only acceptable nested-loop) and keep the prune
    self-join per-cell keyed — no cartesian anywhere."""
    from self_healing_data_pipeline_agent_spark.operators.similarity import (
        q_semantic_dedup,
    )

    plan = formatted_plan(q_semantic_dedup(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan


def test_embedding_near_dup_lsh_code_join_carries_no_vectors(spark, sf_dir):
    """The r8 reshape's contract: the blocker's shuffle join carries only
    (vec_id, table, code) — the embedding arrays must enter the plan
    AFTER candidate dedup, via the verify joins.  If a future edit
    reattaches vectors to the coded frame, the 8x-replicated-vector
    shuffle returns silently; this pins it."""
    from self_healing_data_pipeline_agent_spark.operators.similarity import (
        q_embedding_near_dup_lsh,
    )

    plan = formatted_plan(q_embedding_near_dup_lsh(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # the candidate-side SortMergeJoin/ShuffledHashJoin keys must include
    # the code column; embedding only appears in the verify-side joins
    import re as _re
    smj_keys = _re.findall(r"(?:SortMergeJoin|ShuffledHashJoin) \[([^\]]*)\]", plan)
    if smj_keys:  # at test scale AQE may broadcast everything
        assert any("code" in k for k in smj_keys)


def test_ann_lsh_topk_pair_dedup_carries_no_vectors(spark, sf_dir):
    """The r9 reshape's contract (embedding_near_dup_lsh's r8 lesson
    applied to the ANN index): candidate generation and the pair dedup
    move only (vec_id, table, code) rows — embeddings must enter the plan
    AFTER dedup, via the rerank joins.  The dropDuplicates HashAggregate
    keys pin it: if a future edit reattaches vectors to the coded frame,
    the aggregate would key (or carry) embedding columns again."""
    import re as _re

    from self_healing_data_pipeline_agent_spark.operators.similarity import (
        q_ann_lsh_topk,
    )

    plan = formatted_plan(q_ann_lsh_topk(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # formatted detail blocks: "Input [n]: [...]\nKeys [n]: [...]" — the
    # dedup aggregate is the one keyed on the id pair; its Input must be
    # the two ids alone
    dedup_inputs = [
        inp for inp, keys in _re.findall(
            r"Input \[\d+\]: \[([^\]]*)\]\nKeys \[\d+\]: \[([^\]]*)\]", plan)
        if "query_id" in keys and "neighbor_id" in keys
    ]
    assert dedup_inputs, "pair-dedup HashAggregate not found in plan"
    assert all("emb" not in i and "norm" not in i for i in dedup_inputs)


def test_zorder_pruning_single_pass_two_shuffles(spark, sf_dir):
    """The layout study must stay one scan: both file assignments come
    from an explode over the same cell rows (never a UNION of two
    selects re-scanning lineitem), and only the zone-map agg and the
    per-layout summary shuffle.  A second scan or a union would double
    the cost of the operator whose whole point is measuring scan cost."""
    from self_healing_data_pipeline_agent_spark.operators.relational import (
        q_zorder_pruning,
    )

    df = q_zorder_pruning(spark, sf_dir)
    # simple mode renders each node once (formatted repeats it in the
    # detail section), so scan counting is exact there
    simple = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple")
    assert simple.count("Scan parquet") == 1
    assert "Union" not in simple
    assert count_exchanges(df) <= 2


def test_bloom_decontaminate_probes_via_broadcast(spark, sf_dir):
    """The bitset probe must be a BROADCAST join against the ~KB word
    table — if it ever degrades to a shuffle join, the corpus-side
    shingle stream gets repartitioned just to test candidacy, defeating
    the operator's reason to exist (the bitset exists so the corpus
    never shuffles for the membership test)."""
    from self_healing_data_pipeline_agent_spark.operators.text import (
        q_bloom_decontaminate,
    )

    df = q_bloom_decontaminate(spark, sf_dir)
    plan = formatted_plan(df)
    assert has_broadcast_join(df)
    assert "CartesianProduct" not in plan


def test_jl_projection_shuffle_free(spark, sf_dir):
    """The projection is the compression lever BECAUSE it is map-only:
    one narrow scan, no exchange of any kind."""
    from self_healing_data_pipeline_agent_spark.operators.similarity import (
        q_jl_projection,
    )

    df = q_jl_projection(spark, sf_dir)
    assert count_exchanges(df) == 0
    simple = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple")
    assert simple.count("Scan parquet") == 1


def test_graph_pagerank_topk_is_take_ordered(spark, sf_dir):
    """The final top-20 must plan as TakeOrderedAndProject (per-partition
    top-k + k-row merge), never an unpartitioned row_number window that
    funnels every node's rank into one sort task."""
    from self_healing_data_pipeline_agent_spark.operators.relational import (
        q_graph_pagerank,
    )

    df = q_graph_pagerank(spark, sf_dir)
    simple = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple")
    assert "TakeOrderedAndProject" in simple


def test_min_cost_supplier_single_fact_scan_broadcast_dims(spark, sf_dir):
    """Q2 adaptation: the part family and the region->nation->supplier
    chain must broadcast so the fact is scanned once; the correlated
    per-part MIN then runs as a window over the grouped frame, never
    re-touching lineitem."""
    from self_healing_data_pipeline_agent_spark.operators.relational import (
        q_min_cost_supplier,
    )

    df = q_min_cost_supplier(spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # one lineitem scan only (the min is a window, not a re-join of the fact)
    assert plan.count("lineitem.parquet") == 1


def test_ship_latency_priority_filter_pushed_single_join(spark, sf_dir):
    """Q12 adaptation: the 1997 ship-date range must reach the lineitem
    scan, and the only shuffle edges are the orderkey join and the 2-row
    final aggregate."""
    from self_healing_data_pipeline_agent_spark.operators.relational import (
        q_ship_latency_priority,
    )

    df = q_ship_latency_priority(spark, sf_dir)
    assert has_pushed_filter(df, "l_shipdate")
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    # partial aggregation before the final exchange (map-side combine)
    assert plan.count("HashAggregate") >= 2


def test_dominant_part_suppliers_semi_join_no_fact_rejoin(spark, sf_dir):
    """Q20 adaptation: family and dims broadcast, the share test is a
    window over the grouped (part, supplier) frame, and the supplier
    filter is a semi join — lineitem scans exactly once."""
    from self_healing_data_pipeline_agent_spark.operators.relational import (
        q_dominant_part_suppliers,
    )

    df = q_dominant_part_suppliers(spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("lineitem.parquet") == 1
    assert "LeftSemi" in plan


def test_bpe_encode_stats_encode_pass_is_codegen_single_shuffle(spark, sf_dir):
    """The tokenizer APPLY pass: after the learn loop (driver-held merge
    table, 8 scalars), encoding must be a single map-only scan — the 8
    replace() calls fuse into one codegen Project — feeding a map-side-
    combined per-language aggregate.  One semantic exchange (the 5-row
    lang aggregate; spread()'s round-robin rebalance is excluded by
    count_exchanges), zero Python stages."""
    from self_healing_data_pipeline_agent_spark.operators.text import (
        q_bpe_encode_stats,
    )

    df = q_bpe_encode_stats(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Python" not in plan  # encode is replace() chains, not a UDF
    assert count_exchanges(df) == 1  # the 5-row lang aggregate
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert "Join" not in plan  # merge table is driver state, never joined


def test_kmeans_assignment_map_only_no_join(spark, sf_dir):
    """Lloyd assignment must fold against LITERAL centroid arrays — a
    map-only projection, never a centroid join or a Python stage; the
    K-entry centroid-l1 constants attach as a literal array lookup, so
    the report plan has NO join operator at all."""
    from self_healing_data_pipeline_agent_spark.operators.similarity import (
        q_kmeans_embeddings,
    )

    df = q_kmeans_embeddings(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Python" not in plan
    assert "Join" not in plan
    # report = one agg exchange + the final cid sort; no per-row joins
    # (spread()'s rebalance is excluded by count_exchanges)
    assert count_exchanges(df) <= 2
    assert plan.count("HashAggregate") >= 2  # map-side combined


def test_pc_gram_map_only_single_shuffle(spark, sf_dir):
    """The Gram build must be a per-row outer product (Generate over a
    nested indexed transform — map-only, NO self-join) into one
    map-side-combined aggregate over the 4096 (i, j) cells."""
    from self_healing_data_pipeline_agent_spark.operators.similarity import (
        _pc_gram,
    )
    from self_healing_data_pipeline_agent_spark.sources.tables import load_table

    df = _pc_gram(load_table(spark, sf_dir, "embeddings"))
    plan = formatted_plan(df)
    assert "Python" not in plan
    assert "Join" not in plan  # outer product is per-row, never a self-join
    assert re.search(r"\(\d+\) Generate", plan)  # the explode
    assert count_exchanges(df) == 1
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_ivf_kmeans_probe_map_only_broadcast_rerank(spark, sf_dir):
    """The learned-IVF index must keep assignment AND probing as narrow
    maps against the literal codebook: no Python stage anywhere, the
    probe list from an in-row sort+slice (never a crossJoin against a
    centroid table — q_ann_ivf_topk pays one; the learned variant must
    not), and both rerank joins broadcast (probes and the query side are
    tiny; the corpus must stream by without shuffling)."""
    from self_healing_data_pipeline_agent_spark.operators.similarity import (
        q_ann_ivf_kmeans_topk,
    )

    df = q_ann_ivf_kmeans_topk(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Python" not in plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    # formatted mode renders each node twice (tree + details): 2 joins
    assert plan.count("BroadcastHashJoin") == 4  # probes->corpus, +query
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    # the only semantic shuffle is the final per-query top-k window
    assert count_exchanges(df) == 1


def test_dsir_weights_broadcast_model_two_shuffles(spark, sf_dir):
    """The DSIR score must never shuffle the corpus against the model:
    the bucket-bounded (<= 256 rows) model BROADCASTS back, leaving two
    fact-scale shuffles — the (doc_id, b) feature count and the per-doc
    score agg (plus bucket-bounded model-side exchanges, which AQE
    collapses at these sizes).  No Python stage anywhere."""
    from self_healing_data_pipeline_agent_spark.operators.text import (
        q_dsir_weights,
    )

    df = q_dsir_weights(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Python" not in plan
    assert "BroadcastHashJoin" in plan  # tf x model
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_serve_queries_scan_stored_artifact_with_pushdown(spark, sf_dir):
    """The serving split's plan contract (r12): each *_serve query must
    read its STORED index table (a parquet scan of spark-warehouse/
    indexes/..., not a re-derivation), and the query-side vec_id filter
    must push down to that scan — at scale the artifact scan is the
    dominant cost and an unpushed filter reads the whole index per
    query batch."""
    from self_healing_data_pipeline_agent_spark.operators.similarity import (
        q_ann_jl_serve,
        q_ann_lsh_serve,
    )

    for fn in (q_ann_jl_serve, q_ann_lsh_serve):
        df = fn(spark, sf_dir)
        plan = formatted_plan(df)
        assert "indexes" in plan, "serve plan does not read the index store"
        assert has_pushed_filter(df, "vec_id"), (
            "query-side vec_id filter not pushed into the artifact scan"
        )
        assert "CartesianProduct" not in plan


def test_bpe_encode_serve_is_one_scan(spark, sf_dir):
    """The tokenizer serving twin's whole point: the merge table comes
    from the model store (no learn loop in the plan), so the encode is
    ONE corpus scan into the 5-row aggregate — the fused replace chain
    plus spread()'s rebalance, nothing else."""
    from self_healing_data_pipeline_agent_spark.operators.text import (
        q_bpe_encode_serve,
    )

    df = q_bpe_encode_serve(spark, sf_dir)
    simple = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple")
    assert simple.count("Scan parquet") == 1  # the corpus, no sig/index scans
    assert count_exchanges(df) == 1  # the 5-group aggregate only


def test_lsh_index_refresh_recodes_only_the_batch(spark, sf_dir):
    """The incremental-maintenance contract (r13): the refresh plan must
    read the STANDING corpus from the stored artifact (a parquet scan of
    the index store) and re-code ONLY the ingest batch — exactly one
    scan of the embeddings table, with the batch's vec_id % predicate
    pushed to it, and zero joins/shuffles anywhere (artifact scan UNION
    narrow map)."""
    from self_healing_data_pipeline_agent_spark.operators.similarity import (
        q_lsh_index_refresh,
    )

    df = q_lsh_index_refresh(spark, sf_dir)
    plan = formatted_plan(df)
    assert "indexes" in plan, "standing corpus not served from the store"
    simple = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple")
    # one embeddings scan (the batch) + one artifact scan
    assert simple.count("Scan parquet") == 2, simple
    assert has_pushed_filter(df, "vec_id"), (
        "batch predicate not pushed into the embeddings scan"
    )
    assert count_exchanges(df) == 0, "refresh must be join- and shuffle-free"


def test_every_serve_family_reads_the_index_store(spark, sf_dir):
    """All twelve *_serve twins (r12-r16) must source their candidates
    from a STORED artifact scan — 'indexes' appearing in the formatted
    plan is the cheap invariant that none of them silently regressed to
    re-deriving the index inline.  Model-BLOB families (BPE merges,
    perceptron weights, regression coefficients) are driver-held JSON
    artifacts inlined as literals — no parquet scan to assert; their own
    plan tests pin the literal-fold / no-retrain shapes."""
    from self_healing_data_pipeline_agent_spark.registry import all_queries

    MODEL_BLOB_SERVES = {
        "bpe_encode_serve", "perceptron_serve", "linreg_serve",
    }
    qs = all_queries()
    serves = sorted(n for n in qs if n.endswith("_serve"))
    assert len(serves) == 12, serves
    for name in serves:
        if name in MODEL_BLOB_SERVES:
            continue
        plan = formatted_plan(qs[name](spark, sf_dir))
        assert "indexes" in plan, f"{name} does not read the index store"


def test_priority_sample_take_ordered_shuffle_free(spark, sf_dir):
    """Weighted priority sampling must plan as a pure map over the scan
    feeding TakeOrderedAndProject (per-partition top-k + K-row driver
    merge) — zero exchanges, no join, no window funneling the corpus
    into one sort task."""
    from self_healing_data_pipeline_agent_spark.operators.text import (
        q_priority_sample,
    )

    df = q_priority_sample(spark, sf_dir)
    simple = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple")
    assert "TakeOrderedAndProject" in simple
    plan = formatted_plan(df)
    assert "Join" not in plan and "Python" not in plan
    assert count_exchanges(df) == 0


def test_cluster_representatives_map_assign_grouplimit(spark, sf_dir):
    """Coreset extraction must assign against LITERAL stored centroids (no
    centroid join, no Python stage) and keep the per-cell top-k partial
    via WindowGroupLimit — exactly one exchange (the per-cid window
    repartition)."""
    from self_healing_data_pipeline_agent_spark.operators.similarity import (
        q_cluster_representatives,
    )

    df = q_cluster_representatives(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Join" not in plan and "Python" not in plan
    assert "WindowGroupLimit" in plan  # rank<=K pushed below the sort
    assert count_exchanges(df) == 1


def test_knn_classify_broadcasts_queries_single_shuffle(spark, sf_dir):
    """kNN inference must broadcast the query batch past the streaming
    corpus (BroadcastNestedLoopJoin — the corpus is never shuffled) and
    keep the per-query top-k partial (WindowGroupLimit); the vote and
    winner stages share the query_id partitioning, so ONE exchange."""
    from self_healing_data_pipeline_agent_spark.operators.similarity import (
        q_knn_classify,
    )

    df = q_knn_classify(spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" in plan
    assert "WindowGroupLimit" in plan
    assert "Python" not in plan
    assert count_exchanges(df) == 1


def test_ngram_novelty_bounded_shuffles_no_cartesian(spark, sf_dir):
    """The novelty profile is two keyed aggregations plus the join back:
    every shuffle is on the shingle hash or doc_id — bounded, no
    cartesian, no Python.  Cache cleared first: when an earlier test has
    materialized the shared shingle cache, simple-mode explain renders
    the InMemoryRelation's child plan (with its exchanges) inline — the
    documented char_lm_model effect — and the count stops describing
    this query's own shuffles."""
    from self_healing_data_pipeline_agent_spark.operators.text import (
        q_ngram_novelty,
    )

    spark.catalog.clearCache()
    df = q_ngram_novelty(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan and "Python" not in plan
    assert count_exchanges(df) <= 4


def test_edit_distance_dedup_no_cartesian(spark, sf_dir):
    """The Levenshtein verify must run only on banded-LSH candidates:
    candidate generation is the equi-join on (band, band_sig), the text
    joins are keyed on doc ids — no cartesian anywhere, no Python.
    Cache cleared first (see test_ngram_novelty_bounded_shuffles_no_
    cartesian: a warm shingle/signature cache inlines its child plan
    into the rendered count)."""
    from self_healing_data_pipeline_agent_spark.operators.text import (
        q_edit_distance_dedup,
    )

    spark.catalog.clearCache()
    df = q_edit_distance_dedup(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan and "Python" not in plan
    assert count_exchanges(df) <= 6


def test_bucketed_join_no_exchange_below_join(spark, sf_dir):
    """The bucketed fact-fact semi join must plan as SortMergeJoin with
    ZERO exchanges below it (bucket i zips with bucket i); the only
    exchange in the plan is the 5-row priority rollup."""
    from self_healing_data_pipeline_agent_spark.operators.relational import (
        q_bucketed_late_shipments,
    )

    df = q_bucketed_late_shipments(spark, sf_dir)
    plan = formatted_plan(df)
    assert "SortMergeJoin" in plan
    # ONE exchange total (the rollup); with both scans bucketed on the
    # join key, co-location needs no shuffle below the join
    assert count_exchanges(df) == 1
    assert plan.count("Bucketed: true") == 2


def test_bucketed_cdc_apply_colocated_anti_join(spark, sf_dir):
    """The bucketed CDC apply must plan the keyed left-anti as a
    SortMergeJoin with ZERO exchanges on the base side (the snapshot
    never shuffles): every Exchange in the plan is the stream-sized
    log's own REPARTITION_BY_NUM into the bucket layout (the window and
    the anti join both ride it; the subtree appears twice because
    ``latest`` feeds both the anti join and the applied branch)."""
    from self_healing_data_pipeline_agent_spark.operators.relational import (
        q_bucketed_cdc_apply,
    )

    df = q_bucketed_cdc_apply(spark, sf_dir)
    plan = formatted_plan(df)
    assert "SortMergeJoin" in plan
    assert "LeftAnti" in plan
    assert "Bucketed: true" in plan
    n_ex = count_exchanges(df)
    assert n_ex == plan.count("REPARTITION_BY_NUM") == 2, (
        "every exchange must be the log's hand-placed bucket-layout "
        "repartition — any other exchange means the base side shuffled"
    )


def test_hard_negative_mining_broadcast_single_shuffle(spark, sf_dir):
    """Contrastive mining must broadcast the labeled query batch past the
    corpus (BNLJ, corpus never shuffled) and rank per (query, role) with
    the group limit kept partial — one exchange total."""
    from self_healing_data_pipeline_agent_spark.operators.similarity import (
        q_hard_negative_mining,
    )

    df = q_hard_negative_mining(spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" in plan
    assert "WindowGroupLimit" in plan
    assert "Python" not in plan
    assert count_exchanges(df) == 1


def test_substring_index_refresh_retokenizes_only_the_batch(spark, sf_dir):
    """The text-ring maintenance contract: the standing postings come
    from the stored artifact (index-store parquet scan), the batch's
    doc_id % predicate is pushed into the one documents scan, and the
    only exchange is the batch's own per-doc window pass — never a
    corpus-wide re-tokenization."""
    from self_healing_data_pipeline_agent_spark.operators.text import (
        q_substring_index_refresh,
    )

    df = q_substring_index_refresh(spark, sf_dir)
    plan = formatted_plan(df)
    assert "indexes" in plan, "standing postings not served from the store"
    simple = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple")
    assert simple.count("Scan parquet") == 2, simple
    assert has_pushed_filter(df, "doc_id"), (
        "batch predicate not pushed into the documents scan"
    )
    assert count_exchanges(df) == 1, "only the batch window may shuffle"


def test_event_gap_fill_bounded_shuffles(spark, sf_dir):
    """Regularization must stay keyed on user_id end-to-end: the grid is
    GENERATED map-side from the per-user bounds (a Generate over
    sequence(), never a calendar cross join), and nothing shuffles wider
    than (user_id, hour) / user_id — no cartesian, no Python."""
    from self_healing_data_pipeline_agent_spark.operators.events import (
        q_event_gap_fill,
    )

    df = q_event_gap_fill(spark, sf_dir)
    plan = formatted_plan(df)
    assert re.search(r"\(\d+\) Generate", plan)  # sequence() explode
    assert "CartesianProduct" not in plan and "Python" not in plan
    # r14: the per-hour "last" moved from rank-window+groupBy into
    # max_by inside the (user, hour) aggregate — one exchange fewer,
    # and the r13 shape's rank window is gone entirely.
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 1, (
        "only the LOCF fill may use a window node"
    )
    assert count_exchanges(df) <= 3


def test_cdc_apply_stream_sized_window_keyed_anti(spark, sf_dir):
    """CDC apply must resolve the log with ONE key-partitioned window
    (stream-sized) and apply via a keyed anti join + union — exchanges
    bounded at 2 (the log window + the anti join's key partitioning /
    broadcast), no cartesian, no Python."""
    from self_healing_data_pipeline_agent_spark.operators.relational import (
        q_cdc_apply,
    )

    df = q_cdc_apply(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan and "Python" not in plan
    assert "LeftAnti" in plan
    assert count_exchanges(df) <= 2


def test_image_near_dup_serves_codes_only(spark, sf_dir):
    """The image near-dup must SERVE from the stored dHash artifact:
    no Python in the query plan (the encode/decode/hash kernels belong
    to the build pass), no cartesian product (the candidate join is a
    banded equi-join), and the verify joins move only hash rows."""
    from self_healing_data_pipeline_agent_spark.operators.multimodal import (
        q_image_near_dup,
    )

    df = q_image_near_dup(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Python" not in plan and "MapInPandas" not in plan, (
        "raster kernels leaked into the serve plan — the hash table "
        "must come from the index store"
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_image_index_refresh_rehashes_only_the_batch(spark, sf_dir):
    """The image-ring maintenance contract: standing hashes come from the
    stored artifact (parquet scan, no Python), the batch's doc_id %
    predicate reaches the one documents scan, and the whole plan is
    shuffle-free — the kernels are map-only and union adds no exchange.
    A corpus-wide re-decode would show as a third scan or Python above
    the artifact side."""
    from self_healing_data_pipeline_agent_spark.operators.multimodal import (
        q_image_index_refresh,
    )

    df = q_image_index_refresh(spark, sf_dir)
    plan = formatted_plan(df)
    simple = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple")
    assert simple.count("Scan parquet") == 2, simple
    assert has_pushed_filter(df, "doc_id"), (
        "batch predicate not pushed into the documents scan"
    )
    assert count_exchanges(df) == 0
    # encode + hash kernel nodes, batch side only
    assert len(re.findall(r"\(\d+\) MapInPandas", plan)) == 2


def test_bm25_topk_broadcasts_everything_small(spark, sf_dir):
    """BM25 retrieval must broadcast every small side — the query term
    batch, the per-term doc frequencies (vocabulary-sized), and the
    1-row N/avgdl scalar — so the only corpus-sized movement is the
    token-stream aggregation and the doc-length join.  No cartesian
    beyond the 1-row scalar crossJoin, no Python."""
    from self_healing_data_pipeline_agent_spark.operators.text import (
        q_bm25_topk,
    )

    df = q_bm25_topk(spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "Python" not in plan
    assert "CartesianProduct" not in plan
    # the shared tf aggregate must be CACHED: per-consumer column pruning
    # defeats ReuseExchange here, and without the cache the static plan
    # runs the corpus explode once per consumer (measured: 10 scans)
    assert "InMemoryTableScan" in plan
    scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert scans <= 1, f"corpus re-scanned {scans}x — tf cache lost"


def test_salted_skew_join_spreads_hot_key(spark, sf_dir):
    """The salted join must actually join on (key, _salt) through a
    SortMergeJoin (the merge hint pins the at-scale path — a broadcast
    would bypass the salt entirely and the demo would pin nothing), with
    the small side replicated via a Generate over sequence()."""
    from self_healing_data_pipeline_agent_spark.operators.events import (
        q_salted_skew_join,
    )

    df = q_salted_skew_join(spark, sf_dir)
    plan = formatted_plan(df)
    assert "SortMergeJoin" in plan
    assert "_salt" in plan
    assert re.search(r"\(\d+\) Generate", plan)  # explode_salts replication
    assert "CartesianProduct" not in plan and "Python" not in plan


def test_bucketed_ingest_join_colocated_with_sort_tax(spark, sf_dir):
    """The ingest-maintained bucketed join must keep co-location (zero
    exchanges below the join — ONE exchange total, the 5-row rollup) on
    multi-file buckets, paying an in-task Sort instead: Bucketed scans on
    both sides, SortMergeJoin, and at least one explicit Sort node (the
    appended side lost the one-file-per-bucket sorted-metadata
    guarantee)."""
    from self_healing_data_pipeline_agent_spark.operators.relational import (
        q_bucketed_ingest_join,
    )

    df = q_bucketed_ingest_join(spark, sf_dir)
    plan = formatted_plan(df)
    assert "SortMergeJoin" in plan
    assert count_exchanges(df) == 1
    assert plan.count("Bucketed: true") == 2
    assert re.search(r"\(\d+\) Sort\b", plan), (
        "no in-task sort — either the append produced one file per "
        "bucket (test setup broke) or the pin is stale"
    )


def test_bucketed_ingest_append_leaves_standing_files_untouched(spark, sf_dir):
    """The maintenance CONTRACT: re-running the ensure serves the stored
    table (idempotent — no double-append: row count equals the source
    table), and the layout carries >1 file per bucket (the appended
    ingest batch) with every file a bucket-id-named parquet."""
    from pathlib import Path

    from self_healing_data_pipeline_agent_spark.sources.index_store import (
        _slot,
        ensure_bucketed_ingest_table,
    )
    from self_healing_data_pipeline_agent_spark.sources.tables import load_table

    tbl = ensure_bucketed_ingest_table(spark, sf_dir, "orders", "o_orderkey")
    n1 = spark.table(tbl).count()
    tbl2 = ensure_bucketed_ingest_table(spark, sf_dir, "orders", "o_orderkey")
    assert tbl2 == tbl
    assert spark.table(tbl2).count() == n1, "re-ensure double-appended"
    assert n1 == load_table(spark, sf_dir, "orders").count()
    digest = tbl.rsplit("_", 1)[1]
    data = _slot("bkti_orders", digest) / "data"
    files = sorted(p.name for p in Path(data).glob("*.parquet"))
    assert len(files) == 32, files  # 16 buckets x (standing + appended)


def test_bucketed_compaction_restores_sort_free_join(spark, sf_dir):
    """The lifecycle's compaction pin — the exact INVERSE of
    test_bucketed_ingest_join_colocated_with_sort_tax: after the
    multi-file buckets are rewritten to one file per bucket, the merge
    join keeps co-location (one exchange total, the 5-row rollup; both
    scans Bucketed) AND sheds the in-task Sort — with one file per
    bucket the scan's SORTED BY metadata is trusted again (the
    legacy.bucketedTableScan.outputOrdering session pin), so the join
    consumes stored order."""
    from self_healing_data_pipeline_agent_spark.operators.relational import (
        q_bucketed_compaction,
    )

    df = q_bucketed_compaction(spark, sf_dir)
    plan = formatted_plan(df)
    assert "SortMergeJoin" in plan
    assert count_exchanges(df) == 1
    assert plan.count("Bucketed: true") == 2
    assert not re.search(r"\(\d+\) Sort\b", plan), (
        "in-task sort survived compaction — either a bucket carries "
        ">1 file (the write's task/bucket alignment broke) or the "
        "sorted-scan session pin is gone"
    )


def test_bucketed_compaction_one_file_per_bucket(spark, sf_dir):
    """The compacted LAYOUT contract: same rows as the source table
    (compaction moves bytes, never rows), exactly n_buckets files (one
    per bucket — what the sort-free read above depends on), and the
    ensure is idempotent (second call serves the same catalog table)."""
    from pathlib import Path

    from self_healing_data_pipeline_agent_spark.sources.index_store import (
        _slot,
        ensure_compacted_bucketed_table,
    )
    from self_healing_data_pipeline_agent_spark.sources.tables import load_table

    tbl = ensure_compacted_bucketed_table(spark, sf_dir, "orders", "o_orderkey")
    assert ensure_compacted_bucketed_table(
        spark, sf_dir, "orders", "o_orderkey"
    ) == tbl
    n = spark.table(tbl).count()
    assert n == load_table(spark, sf_dir, "orders").count()
    digest = tbl.rsplit("_", 1)[1]
    data = _slot("bktc_orders", digest) / "data"
    files = sorted(p.name for p in Path(data).glob("*.parquet"))
    assert len(files) == 16, files  # one file per bucket


def test_bm25_serve_scans_postings_only(spark, sf_dir):
    """The BM25 serving contract: no tokenization in the query plan —
    the corpus explode (Generate) and the tf/dl/df aggregation belong to
    the build pass; serving is the stored posting artifact scanned
    (twice: query-term filter + corpus side), one broadcast hash join on
    term, one (q_id, doc_id) aggregate, and the top-k window."""
    from self_healing_data_pipeline_agent_spark.operators.text import (
        q_bm25_serve,
    )

    df = q_bm25_serve(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Generate" not in plan, (
        "a corpus explode leaked into the serve plan — the postings "
        "must come from the index store"
    )
    assert "Python" not in plan
    assert "BroadcastHashJoin" in plan
    assert "bm25_postings" in plan  # both sides scan the stored artifact


def test_cross_modal_dedup_serves_from_stored_artifacts(spark, sf_dir):
    """The agreement report must compose the three SERVE paths: all
    three modality artifacts (minhash signature table, embedding LSH
    codes, image dHash table) appear as index-store parquet scans, and
    no Python stage runs (the md5 signature loop, hyperplane folds and
    raster kernels all belong to their build passes)."""
    from self_healing_data_pipeline_agent_spark.operators.multimodal import (
        q_cross_modal_dedup,
    )

    df = q_cross_modal_dedup(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Python" not in plan and "MapInPandas" not in plan
    for artifact in ("minhash_sigs", "lsh_codes", "img_dhash"):
        assert artifact in plan, f"{artifact} not served from the store"
    assert "CartesianProduct" not in plan


def test_streaming_bucketed_ingest_agg_shuffle_free(spark, sf_dir):
    """The streaming-ingest payoff pin: after foreachBatch appended its
    micro-batches bucket-aligned (and anti-join-deduped the replayed
    delivery), the per-user rollup over the ingested table plans with
    ZERO exchanges — the bucketed scan satisfies the aggregation's hash
    distribution, so the warehouse's analytical key never reshuffles.
    Row count doubles as the exactly-once check: the staged stream
    delivered every event twice."""
    from self_healing_data_pipeline_agent_spark.sources.tables import load_table
    from self_healing_data_pipeline_agent_spark.streaming.events import (
        streaming_bucketed_ingest,
    )

    df = streaming_bucketed_ingest(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Bucketed: true" in plan
    assert count_exchanges(df) == 0, "the bucketed agg reshuffled"
    n = df.agg({"n_events": "sum"}).collect()[0][0]
    assert n == load_table(spark, sf_dir, "events").count(), (
        "replayed delivery leaked into the table — the event_id dedup "
        "is not exactly-once"
    )


def test_bucketed_sessionization_zero_exchanges(spark, sf_dir):
    """The layout's window-function payoff pin: over user_id-bucketed
    events, the gap-sessionize window AND the (user_id, session_id)
    rollup both ride the scan's hash partitioning — the entire pipeline
    plans with ZERO exchanges (the shuffle-planned twin pays one on
    user_id).  The per-user (ts, event_id) Sort remains; it is the
    window's own requirement, in-task and bounded."""
    from self_healing_data_pipeline_agent_spark.operators.events import (
        q_bucketed_sessionization,
    )

    df = q_bucketed_sessionization(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Window" in plan
    assert "Bucketed: true" in plan
    assert count_exchanges(df) == 0, "the bucketed window reshuffled"


def test_bm25_index_refresh_retokenizes_only_the_batch(spark, sf_dir):
    """The lexical-ring maintenance contract (the substring/lsh refresh
    posture): the standing posting rows come from the stored artifact
    (bm25_tf_base scan in the plan), and exactly ONE Generate remains —
    the ingest batch's tokenization (both caches load-bearing: uncached,
    the batch explode ran twice and the union replayed per consumer)."""
    import re as _re

    from self_healing_data_pipeline_agent_spark.operators.text import (
        q_bm25_index_refresh,
    )

    df = q_bm25_index_refresh(spark, sf_dir)
    plan = formatted_plan(df)
    assert "bm25_tf_base" in plan, "standing side not served from the store"
    n_gen = len(_re.findall(r"\(\d+\) Generate", plan))
    assert n_gen <= 1, (
        f"{n_gen} corpus explodes in the refresh plan — the standing "
        "side re-tokenized or the batch cache stopped covering its reuse"
    )


def test_bm25_prune_serves_from_postings(spark, sf_dir):
    """The pruned serving twin keeps the serve contract: every frame
    (contributions, impact bounds, seeds, theta, essential cut, final
    ranking) derives from the stored posting artifact — no tokenization
    (Generate), no Python, broadcast joins only on the query-batch
    frames."""
    from self_healing_data_pipeline_agent_spark.operators.text import (
        q_bm25_prune,
    )

    df = q_bm25_prune(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Generate" not in plan, (
        "a corpus explode leaked into the pruned serve plan"
    )
    assert "Python" not in plan
    assert "bm25_postings" in plan
    assert "BroadcastHashJoin" in plan


def test_pack_kway_single_shuffle(spark, sf_dir):
    """K-way packing's scale pin: ONE exchange (the per-lang rank
    window); the (lang, pack) cumulative and fill windows cluster on a
    superset of the lang key, so hash(lang) partitioning already
    satisfies them — sorts, no further exchanges."""
    from self_healing_data_pipeline_agent_spark.operators.text import (
        q_pack_kway,
    )

    df = q_pack_kway(spark, sf_dir)
    assert count_exchanges(df) == 1, "the (lang, pack) windows reshuffled"
    assert "Python" not in formatted_plan(df)


def test_perceptron_serve_is_map_only_inference(spark, sf_dir):
    """The stored-model serve pin (X32's posture on X28): the weights
    fold in as ONE literal map expression, so the plan has NO joins and
    no training rounds — scan, hashed-feature explode, literal fold,
    one per-doc aggregate."""
    from self_healing_data_pipeline_agent_spark.operators.text import (
        q_perceptron_serve,
    )

    df = q_perceptron_serve(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Join" not in plan, "the model attached as a join, not a literal"
    assert "Python" not in plan


def test_linreg_serve_attaches_model_as_literal(spark, sf_dir):
    """The stored-regression serve pin: the per-priority (slope,
    intercept) pairs fold in as one literal map — exactly two table
    scans (orders + lineitem), no normal-equations re-solve beyond the
    one residual aggregate, nothing Python."""
    import re as _re

    from self_healing_data_pipeline_agent_spark.operators.relational import (
        q_linreg_serve,
    )

    df = q_linreg_serve(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Python" not in plan
    # numbered detail nodes, not raw substring hits (each scan prints
    # twice in formatted mode: once in the tree, once in the detail)
    n_scans = len(_re.findall(r"\(\d+\) Scan parquet", plan))
    assert n_scans == 2, f"{n_scans} scans — the model must not scan"
    assert "keys:" in plan  # the literal map fold
