"""Regenerate BENCH.md: time every HEADLINE query on Spark (noop sink,
best-of-2) AND its DuckDB oracle (same parquet, best-of-2), then rewrite
the measurement table in place, keeping the prose.

Usage:  python scripts/make_bench_md.py            # sf0.1, local[16]
        SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... python scripts/make_bench_md.py
"""

from __future__ import annotations

import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

from bench import HEADLINE  # noqa: E402
from self_healing_data_pipeline_agent_spark.registry import (  # noqa: E402
    all_oracles,
    all_queries,
)
from self_healing_data_pipeline_agent_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# serve twin -> its build-inline twin (r12 verdict #7): the main table
# labels which row of each pair is the production number — the serve row
# (steady state from the stored artifact); the build-inline twin is the
# once-per-corpus-snapshot amortized cost.  HEADLINE orders each pair
# adjacently.
SERVE_PAIRS = {
    "ann_lsh_serve": "ann_lsh_topk",
    "ann_jl_serve": "ann_jl_rerank",
    "ann_ivf_kmeans_serve": "ann_ivf_kmeans_topk",
    "ann_pq_serve": "ann_pq_adc_topk",
    "minhash_lsh_serve": "minhash_lsh_pairs",
    "bpe_encode_serve": "bpe_encode_stats",
    "semantic_dedup_serve": "semantic_dedup",
    "substring_dup_serve": "substring_dup_spans",
    "embedding_near_dup_serve": "embedding_near_dup_mp",
    "bm25_serve": "bm25_topk",
    "perceptron_serve": "perceptron_lang_clf",
    "linreg_serve": "linreg_price_per_item",
}
_BUILD_TWINS = set(SERVE_PAIRS.values())

# non-pair roles: rows whose label isn't a build/serve twin relationship
EXTRA_ROLES = {
    "lsh_index_refresh": "incremental maintenance",
    "substring_index_refresh": "incremental maintenance",
    "bucketed_late_shipments": "bucketed layout (vs order_priority_check)",
    "bucketed_cdc_apply": "bucketed layout (vs cdc_apply)",
    "image_near_dup": "serve (img_dhash artifact)",
    "image_index_refresh": "incremental maintenance",
    "bucketed_ingest_join": "bucketed layout, ingest-appended (vs order_priority_check)",
    "bucketed_compaction": "bucketed layout, compacted (vs bucketed_ingest_join)",
    "bm25_index_refresh": "incremental maintenance",
    "bm25_prune": "MaxScore-pruned serve (vs bm25_serve)",
}


PROVENANCE_FILE = os.path.join(REPO, "BENCH_PROVENANCE.json")
STEAL_CERT_PCT = 5  # bench.py's STEAL_FLAG_PCT: quiet-window certification


def _fingerprints() -> dict[str, str]:
    """query -> committed contract fingerprint (oracle+plan hashes joined)
    — the invalidation key for archived steady states: a row measured
    under a DIFFERENT contract must not survive a merge."""
    import json

    path = os.path.join(REPO, "CONTRACT_FINGERPRINTS.json")
    try:
        with open(path) as fh:
            data = json.load(fh)
    except OSError:
        return {}
    return {
        n: f"{v.get('oracle', '')}:{v.get('plan', '')}"
        for n, v in data.items()
        if isinstance(v, dict)
    }


def time_spark(sf_dir: str) -> tuple[dict[str, float], dict[str, int | None]]:
    from bench import _steal_pct, _steal_ticks

    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus:
        spark = get_spark(app_name="bench-md")
    else:
        spark = get_spark(app_name="bench-md", master="local[16]",
                          shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    queries["row_count"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    out: dict[str, float] = {}
    steal: dict[str, int | None] = {}
    for name in HEADLINE:
        best = float("inf")
        st0, w0 = _steal_ticks(), time.time()
        for _ in range(3):
            t0 = time.time()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.time() - t0)
        steal[name] = _steal_pct(st0, time.time() - w0)
        out[name] = best
    # Session-end re-queue against the PREVIOUS table (bench.py's r15
    # sustained-stall defense, mirrored here): the r15 regeneration
    # carried a contiguous ~13-row block 3-7x over its prior steady
    # states with flat DuckDB twins — a mid-session steal burst that
    # best-of-3 cannot see because consecutive runs agree during a
    # burst.  Rows >3x their previous table value re-sample minutes
    # later; the min of both passes is recorded.
    # one tested parser for the committed table (bench._load_reference),
    # not a private copy that could drift from the column layout
    from bench import _load_reference

    prev = _load_reference()
    for name in HEADLINE:
        steady = prev.get(name)
        if not steady or out.get(name, 0) <= max(3.0 * steady, 1.0):
            continue
        best = out[name]
        st0, w0 = _steal_ticks(), time.time()
        for _ in range(3):
            t0 = time.time()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.time() - t0)
        if best < out[name]:
            print(f"# requeued {name}: {out[name]:.2f} -> {best:.2f}",
                  file=sys.stderr)
            steal[name] = _steal_pct(st0, time.time() - w0)
            out[name] = best
    return out, steal


def merge_with_provenance(
    fresh: dict[str, float], steal: dict[str, int | None], session: str
) -> dict[str, float]:
    """Bounded min-merge (r16 verdict #4): BENCH.md is bench.py's requeue
    reference, and an unbounded per-row minimum over accumulating
    sessions ratchets it ever lower.  A previous session's row may now
    beat the fresh measurement ONLY when the committed provenance
    sidecar (BENCH_PROVENANCE.json) shows it was (a) measured under the
    SAME contract fingerprint as today's code and (b) steal-certified
    (its sampling window lost < STEAL_CERT_PCT% of machine capacity to
    the hypervisor — a claimed-quiet row with unmeasurable steal does
    not qualify).  Rows failing either test expire: the fresh number
    wins regardless.  The sidecar is rewritten every regeneration with
    each surviving row's value, steal%, session stamp and fingerprint,
    so the table is always reproducible from committed evidence.
    ``--fresh`` skips the merge entirely."""
    import json

    fps = _fingerprints()
    try:
        with open(PROVENANCE_FILE) as fh:
            prev = json.load(fh).get("rows", {})
    except OSError:
        prev = {}
    merged: dict[str, float] = {}
    rows: dict[str, dict] = {}
    expired: list[str] = []
    for name, val in fresh.items():
        rows[name] = {
            "spark_s": round(val, 3),
            "steal_pct": steal.get(name),
            "session": session,
            "fingerprint": fps.get(name, ""),
        }
        p = prev.get(name)
        if p:
            certified = (
                p.get("steal_pct") is not None
                and p["steal_pct"] < STEAL_CERT_PCT
            )
            same_contract = p.get("fingerprint") == fps.get(name, "")
            if certified and same_contract and p["spark_s"] < val:
                rows[name] = p
            elif not (certified and same_contract):
                expired.append(name)
        merged[name] = rows[name]["spark_s"]
    if expired:
        print(
            f"# provenance expired ({len(expired)} rows not eligible to "
            f"min-merge): {','.join(sorted(expired)[:12])}...",
            file=sys.stderr,
        )
    with open(PROVENANCE_FILE, "w") as fh:
        json.dump({"session": session, "rows": rows}, fh, indent=1,
                  sort_keys=True)
        fh.write("\n")
    return merged




def time_duckdb(sf_dir: str) -> dict[str, float]:
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '16')}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    oracles = all_oracles()
    out: dict[str, float] = {}
    for name in HEADLINE:
        sql = oracles.get(name)
        if sql is None:
            continue
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            con.execute(sql).fetchall()
            best = min(best, time.time() - t0)
        out[name] = best
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    session = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    fresh, steal = time_spark(sf_dir)
    if "--fresh" in sys.argv:
        spark_t = fresh
    else:
        spark_t = merge_with_provenance(fresh, steal, session)
    duck_t = time_duckdb(sf_dir)
    lines = ["| query | spark (s) | duckdb (s) | ratio | role |",
             "|---|---|---|---|---|"]
    for name in HEADLINE:
        s, d = spark_t[name], duck_t.get(name)
        dd = f"{d:.3f}" if d is not None else "—"
        ratio = f"{s / d:.1f}x" if d else "—"
        if name in SERVE_PAIRS:
            role = "serve — production"
        elif name in _BUILD_TWINS:
            role = "build-inline twin"
        else:
            role = EXTRA_ROLES.get(name, "")
        lines.append(f"| {name} | {s:.3f} | {dd} | {ratio} | {role} |")
    ts, td = sum(spark_t.values()), sum(duck_t.values())
    lines.append(f"| **total** | **{ts:.2f}** | **{td:.2f}** | **{ts / td:.1f}x** |")
    table = "\n".join(lines)

    path = os.path.join(REPO, "BENCH.md")
    with open(path) as f:
        md = f.read()
    new_md, n = re.subn(
        r"\| query \| spark.*?\| \*\*total\*\*.*?\|\n",
        table + "\n",
        md,
        flags=re.S,
    )
    assert n == 1, "measurement table not found in BENCH.md"
    with open(path, "w") as f:
        f.write(new_md)
    print(table)


if __name__ == "__main__":
    main()
