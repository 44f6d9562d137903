"""Physical-plan audit across every registered query: prints scale red
flags (cartesian products, unexpected nested-loop joins, heavy shuffle
counts, missing pushdown on filtered scans).

Run: ``python scripts/plan_audit.py [sf_dir]``

Complements tests/test_plan_shapes.py (which pins specific plans in CI);
this sweeps the WHOLE surface after adding operators, so a new query with
an accidentally quadratic or shuffle-happy plan is caught before it ships.
Known-justified flags are listed in EXPECTED with their reason.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from self_healing_data_pipeline_agent_spark.registry import all_queries  # noqa: E402
from self_healing_data_pipeline_agent_spark.session import get_spark  # noqa: E402

# query -> reason a flag is the RIGHT plan there
EXPECTED = {
    "ann_ivf_topk": "BNLJ = broadcast cross join with the 16-centroid codebook",
    "knn_cosine": "BNLJ = tiny broadcast query set against the corpus scan",
    "embedding_near_dup": "BNLJ = documented brute-force small-scale twin of LSH",
    "simhash_near_dup": "BNLJ = hamming-band non-equi pair join, broadcast side",
    "tfidf_top_terms": "BNLJ = 1-row corpus-size broadcast crossJoin",
    "source_mix": "BNLJ = 1-row corpus-total broadcast crossJoin",
    "idle_rich_customers": "BNLJ = 1-row global-average broadcast crossJoin",
    "jaccard_pairs": "shuffles: cached shingle set feeds 3 consumers",
    "minhash_lsh_pairs": "shuffles: signature agg + band join + verification",
    "incremental_dedup": "shuffles: signature agg + batch-vs-corpus band join + verification",
    "quantile_profile": "shuffles: two ranked columns, tiny offset windows",
    "semantic_dedup": "BNLJ = broadcast cross join with the 16-centroid codebook",
}

STREAMING = {"streaming_hourly_counts", "streaming_dq_profile", "stateful_sessions"}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="plan-audit", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    unexplained = []
    for name, fn in sorted(all_queries().items()):
        if name in STREAMING:
            continue
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "simple"
        )
        flags = []
        if "CartesianProduct" in plan:
            flags.append("CARTESIAN")
        if "BroadcastNestedLoopJoin" in plan:
            flags.append("BNLJ")
        n_shuffles = sum(
            1 for line in plan.splitlines()
            if "Exchange" in line and "Broadcast" not in line
        )
        if n_shuffles > 6:
            flags.append(f"shuffles={n_shuffles}")
        if flags:
            reason = EXPECTED.get(name)
            tag = f"expected ({reason})" if reason else "UNEXPLAINED"
            print(f"{name}: {', '.join(flags)} — {tag}")
            if not reason:
                unexplained.append(name)
    if unexplained:
        print(f"\nFAIL: unexplained plan flags in {unexplained}")
        sys.exit(1)
    print("\nplan audit clean (all flags documented)")


if __name__ == "__main__":
    main()
