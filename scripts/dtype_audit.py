"""Cross-engine dtype audit: the driver's CORRECTNESS value-hash is
type-sensitive (r1 proved it distinguishes DuckDB HUGEINT from Spark
BIGINT even when values are identical), while the local parity test
compares Python values (type-insensitive).  This script closes that gap:
for every oracle-backed query it maps the Spark result schema to the
Arrow type Spark would hand the driver and compares it to the Arrow type
DuckDB produces for the oracle SQL.  Any mismatch is a future hash-red.

Usage: python scripts/dtype_audit.py [sf_dir]   (default sf0.001)
Exits non-zero on any mismatch.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from self_healing_data_pipeline_agent_spark.session import get_spark  # noqa: E402

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Spark SQL type simpleString -> acceptable arrow type-name prefixes.
SPARK_TO_ARROW = {
    "bigint": ("int64",),
    "int": ("int32",),
    "smallint": ("int16",),
    "tinyint": ("int8",),
    "double": ("double", "float64"),
    "float": ("float", "float32"),
    "string": ("string", "large_string"),
    "boolean": ("bool",),
    "date": ("date32",),
    "binary": ("binary", "large_binary"),
}


def arrow_ok(spark_type: str, arrow_type: str) -> bool:
    if spark_type.startswith("timestamp"):
        return arrow_type.startswith("timestamp")
    if spark_type.startswith("decimal"):
        return arrow_type.startswith("decimal")
    if spark_type.startswith("array"):
        return arrow_type.startswith(("list", "large_list"))
    allowed = SPARK_TO_ARROW.get(spark_type)
    if allowed is None:
        return True  # unmapped exotic type: don't false-alarm
    return arrow_type.startswith(allowed)


def audit_query(spark, con, qfn, sql, sf_dir) -> list[tuple[str, str, str]]:
    """Dtype mismatches for ONE query: [(column, spark_type, arrow_type)].
    Builds the Spark plan only (schema comes from analysis, no job runs);
    the oracle executes in DuckDB.  Importable so the test suite can run
    the audit per-query (wired into pytest in round 8 — the audit existed
    since round 2 but nothing ran it, and the r5-r7 char_lm_perplexity
    hash-red was exactly the HUGEINT-vs-BIGINT class it catches)."""
    sdf = qfn(spark, sf_dir)
    spark_types = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
    tbl = con.sql(sql).arrow()
    duck_types = {
        fld.name: str(tbl.schema.field(fld.name).type) for fld in tbl.schema
    }
    bad = []
    for col, st in spark_types.items():
        dt = duck_types.get(col)
        if dt is None:
            bad.append((col, st, "<missing in oracle>"))
        elif not arrow_ok(st, dt):
            bad.append((col, st, dt))
    return bad


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    spark = get_spark()
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    bad = []
    for name, sql in sorted(oracles.items()):
        bad.extend(
            (name, col, st, dt)
            for col, st, dt in audit_query(spark, con, queries[name], sql, sf_dir)
        )
    if bad:
        print(f"DTYPE MISMATCHES ({len(bad)}):")
        for name, col, st, dt in bad:
            print(f"  {name}.{col}: spark={st} duckdb-arrow={dt}")
        return 1
    print(f"dtype audit clean: {len(oracles)} oracle queries checked")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
