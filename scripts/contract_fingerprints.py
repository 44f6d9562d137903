"""Contract fingerprints: one committed hash per query over BOTH halves
of its correctness contract — the RENDERED oracle SQL and the normalized
analyzed Spark plan.

Why (r8): the window audit's span tracking cannot see a module-level
constant change that re-renders into either side.  ``Q8_REGION`` was
edited two lines above ``q_tpch_q8`` and its oracle in round 8 — the
query's behavior changed completely (empty set -> 7 rows) while both
tracked spans stayed byte-identical.  The fingerprints close that class:
constants are INTERPOLATED into the rendered oracle f-string and into
the analyzed plan's literals, so any semantic knob that reaches either
engine changes a hash.

The file ``CONTRACT_FINGERPRINTS.json`` is committed;
``tests/test_contract_fingerprints.py`` fails whenever the committed
hashes disagree with the current code, which forces regeneration IN THE
SAME COMMIT as any contract change — so the file's git history dates
every contract change, and ``scripts/window_audit.py`` compares each
query's fingerprint at its green round's commit against HEAD to decide
staleness with no span heuristics at all.

Usage:  python scripts/contract_fingerprints.py --write   # regenerate
        python scripts/contract_fingerprints.py --check   # verify
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FINGERPRINT_FILE = os.path.join(REPO, "CONTRACT_FINGERPRINTS.json")
# Plans are built against a FIXED sf dir: the fingerprint must hash the
# query's structure, not which directory a session pointed it at.
SF_DIR = "/root/testdata/sf0.001"

# Session-dependent noise stripped from analyzed-plan strings:
# expression ids (#123 / #123L), plan ids, and memory addresses.
# The expr-id regex is anchored to identifier context (ADVICE r8: a bare
# r"#\d+" would also strip '#123' inside a string/SQL literal rendered
# into the plan, silently keeping a fingerprint stable across a semantic
# literal edit).  Expr-ids follow an identifier, a closing paren/bracket
# (aggregate result ids: "..._candidates(tokens#8386)#8374"), or a
# backtick-quoted name ("`count(1)`#9638") — verified output-identical
# to the unanchored form on all 149 current plans, so committed
# fingerprints are unaffected.  The trailing L (long-typed ids) is NOT
# consumed, deliberately: it normalizes consistently ("#L") and
# consuming it would churn every committed hash.
_EXPR_ID = re.compile(r"(?<=[\w)`\]])#\d+")
_PLAN_ID = re.compile(r"plan_id=\d+")
_ADDR = re.compile(r"@[0-9a-f]{6,}")
# Python callables render as <function f at 0x...> inside MapInPandas /
# mapInArrow plan nodes; the address is session noise, the name is not.
_PYFN = re.compile(r"<function ([^ ]+) at 0x[0-9a-f]+>")
# Higher-order-function lambda variables carry a process-global counter
# (lambda x_1# vs lambda x_4# for the same code, depending on how many
# lambdas the session built before).  Only tokens after the "lambda "
# keyword are rewritten, so real column names are untouched.
_LAMBDA_VAR = re.compile(r"lambda ([A-Za-z]+)_\d+#")
# The streaming twins register per-session temp views / staging dirs with
# uuid suffixes (hourly_counts_02fe57a0, /tmp/... paths) — session noise.
# Width pinned to EXACTLY the 8 hex chars those uuid4 suffixes use
# (ADVICE r8: the open-ended {8,} would also strip a longer hex-ish token
# that is real plan content, e.g. a literal hash constant, making a
# semantic edit to it invisible to the fingerprint).
_UUID_SFX = re.compile(r"_[0-9a-f]{8}\b")
_TMP_PATH = re.compile(r"file:/tmp/[^\s,)\]]*|/tmp/[^\s,)\]]*")
# The index store's content-addressed slot (indexes/<name>/<digest16>)
# embeds the source parquet's size+mtime — a testdata refresh would
# churn every *_serve fingerprint without any contract change.  The
# digest is DERIVED state: every semantic knob that feeds it (params,
# hyperplanes, codebook sizes) also renders into the oracle SQL, whose
# hash is the other fingerprint half, so stripping the digest loses no
# contract coverage.  The index NAME stays — it is plan structure.
_INDEX_DIGEST = re.compile(r"(indexes/[\w.-]+/)[0-9a-f]{16}")
# The bucketed-warehouse catalog tables (bkt_/bkti_/bktc_ prefixes,
# sources/index_store.ensure_bucketed_*) embed the SAME mtime-derived
# source digest in their table NAMES, which render into the analyzed
# plan as relation identifiers — a testdata re-provision (content
# identical, mtimes new) churned exactly the five bucketed queries'
# fingerprints with zero contract change (observed r15→r16).  Same
# rationale as _INDEX_DIGEST: the digest is DERIVED state; every
# semantic knob that feeds it also renders into the oracle SQL or the
# remaining plan text.  Anchored to the three store prefixes so a real
# 16-hex literal elsewhere in a plan is never stripped.
_BKT_DIGEST = re.compile(r"\b(bkt[ic]?_\w+?_)[0-9a-f]{16}\b")


def _sha(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()[:16]


def normalize_plan(plan: str) -> str:
    plan = _EXPR_ID.sub("#", plan)
    plan = _PLAN_ID.sub("plan_id=", plan)
    plan = _ADDR.sub("@", plan)
    plan = _PYFN.sub(r"<function \1>", plan)
    plan = _LAMBDA_VAR.sub(r"lambda \1#", plan)
    plan = _UUID_SFX.sub("_", plan)
    plan = _TMP_PATH.sub("/tmp/...", plan)
    plan = _INDEX_DIGEST.sub(r"\1<digest>", plan)
    plan = _BKT_DIGEST.sub(r"\1<digest>", plan)
    return plan


def plan_fingerprint(df) -> str:
    analyzed = df._jdf.queryExecution().analyzed().toString()
    return _sha(normalize_plan(analyzed))


def compute(spark) -> dict[str, dict[str, str]]:
    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    out: dict[str, dict[str, str]] = {}
    for name, fn in sorted(queries.items()):
        entry: dict[str, str] = {}
        if name in oracles:
            entry["oracle"] = _sha(oracles[name])
        entry["plan"] = plan_fingerprint(fn(spark, SF_DIR))
        out[name] = entry
    return out


def stored() -> dict[str, dict[str, str]]:
    if not os.path.exists(FINGERPRINT_FILE):
        return {}
    with open(FINGERPRINT_FILE) as f:
        return json.load(f)


def main() -> int:
    from self_healing_data_pipeline_agent_spark.session import get_spark

    mode = sys.argv[1] if len(sys.argv) > 1 else "--check"
    spark = get_spark(app_name="contract-fingerprints", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    current = compute(spark)
    if mode == "--write":
        with open(FINGERPRINT_FILE, "w") as f:
            json.dump(current, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"wrote {len(current)} fingerprints")
        return 0
    old = stored()
    changed = sorted(
        set(k for k in current if current[k] != old.get(k))
        | (set(old) - set(current))
    )
    if changed:
        print(f"STALE fingerprints ({len(changed)}): {changed}")
        print("regenerate with: python scripts/contract_fingerprints.py --write")
        return 1
    print(f"fingerprints current: {len(current)} queries")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
