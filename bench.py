"""Benchmark harness: runs the headline query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop sink (full execution, no
driver-side collect overhead) — the same way you'd measure a cluster job.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from self_healing_data_pipeline_agent_spark.registry import all_queries  # noqa: E402
from self_healing_data_pipeline_agent_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "tpch_q1",
    "revenue_by_nation",
    "shipping_priority",
    "regional_supplier_volume",
    "cube_summary",
    "promo_revenue_share",
    "ann_ivf_topk",
    "stats_profile",
    "grouped_drift_profile",
    "grouped_dq_profile",
    "quantile_profile",
    "distinct_counts",
    "dedup_first_lineitem",
    "topk_orders_per_priority",
    "order_lag_lead",
    "rolling_order_totals",
    "attribution_asof",
    "tfidf_top_terms",
    "drift_compare",
    "anti_join_no_f_orders",
    "referential_orphans",
    "rollup_summary",
    "json_extract",
    "hourly_windows",
    "sessionization",
    "top_terms",
    "jaccard_pairs",
    "minhash_lsh_pairs",
    "duplicate_clusters",
    "decontaminate_docs",
    "knn_cosine",
    "exact_dedup_docs",
    "repetition_ratio",
    "pack_sequences",
    "pii_scrub",
    "salted_hot_key_agg",
    "customer_order_distribution",
    "anomaly_zscore",
    "tpch_q7",
    "tpch_q10",
    "psi_drift",
    "error_context_join",
    "incremental_dedup",
    "normalize_text",
    # dup_ngram_coverage is the one r2-late addition that is genuinely
    # work-bound at sf0.1 (document-frequency join over the shingle set,
    # Spark ~0.9x the embedded oracle); the other late ops are sub-second
    # and would only add scheduler floor to the aggregate.
    "dup_ngram_coverage",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Benchmark methodology (BENCH.md): >16 JVM threads oversubscribe this
    # VM — host CPU steal shows up as 3-5x per-query jitter and a ~25%
    # slower total on identical code.  The bench therefore CAPS its thread
    # count at 16 so the number reflects the engine, not host scheduling;
    # $SPARK_GRAFT_BENCH_CPUS overrides explicitly for scaling studies.
    cpus = int(
        os.environ.get("SPARK_GRAFT_BENCH_CPUS")
        or min(int(os.environ.get("SPARK_GRAFT_CPUS", "16")), 16)
    )
    spark = get_spark(app_name="bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    queries = all_queries()
    names = [n for n in HEADLINE if n in queries]

    # warmup: JIT, noop-sink init, file-listing caches — not measured
    queries["row_count"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # best-of-2 per query: first run includes one-time plan compilation /
    # codegen JIT for that plan shape; the min is the steady-state number a
    # cluster actually sees on a recurring workload.
    timings: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "n_queries": len(timings),
                "runs_per_query": 2,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
