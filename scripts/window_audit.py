"""Stale-green audit for the correctness-gate window (registry.QUERY_ORDER).

The driver's per-round CORRECTNESS gate checks only the FIRST 50 entries of
``queries()``; everything below keeps its old official record.  Round 3
showed that record can go silently stale: the testdata format changed and
three officially-green streaming queries became wrong with no signal.

This script turns the re-window policy into checked code.  For every
declared query it reports one of:

- ``never-green``: no official green in any CORRECTNESS_r*.json — must be
  inside the window.
- ``stale?``: officially green once, but the query's implementing FUNCTION
  (tracked with ``git log -L`` over its current source span) was modified
  after the round that recorded the green — the record no longer describes
  the current code; front-load it or re-confirm with a local parity run.
- ``fresh``: green, function untouched since.

Granularity note: the span tracks the ``q_<name>`` function body; a change
to a shared helper outside the span is NOT flagged (the full local parity
suite, which runs every oracle pair, remains the backstop).  Testdata
format drift is covered separately by ``tests/test_testdata_manifest.py``,
which fails the whole suite loudly.

Usage:  python scripts/window_audit.py            # human report
        python scripts/window_audit.py --json     # machine-readable

Exit code is always 0 — this is a warning tool; the hard correctness gate
is ``tests/test_oracle_parity.py``.
"""

from __future__ import annotations

import glob
import inspect
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from self_healing_data_pipeline_agent_spark.registry import all_queries  # noqa: E402

WINDOW = 50


def _git(*args: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=False
    )


def official_greens() -> dict[str, int]:
    """query -> latest round number whose CORRECTNESS file records a green
    (hash_match, or rows_match for rows-only checks)."""
    greens: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            data = json.load(f)
        for name, rec in data.items():
            if not isinstance(rec, dict):
                continue
            ok = rec.get("hash_match")
            if ok is None:
                ok = rec.get("rows_match")
            if ok:
                greens[name] = max(greens.get(name, 0), rnd)
    return greens


def round_commit(rnd: int) -> str | None:
    """Commit that recorded round ``rnd``'s correctness file."""
    out = _git(
        "log", "--format=%H", "-1", "--", f"CORRECTNESS_r{rnd:02d}.json"
    ).stdout.strip()
    return out or None


def fn_span(fn) -> tuple[str, int, int] | None:
    """(repo-relative file, first line, last line) of the query function."""
    try:
        lines, start = inspect.getsourcelines(fn)
        f = inspect.getsourcefile(fn)
    except (OSError, TypeError):
        return None
    if not f:
        return None
    return os.path.relpath(f, REPO), start, start + len(lines) - 1


def last_touch(file: str, start: int, end: int) -> str | None:
    """Most recent commit modifying the function's source range.

    ``git log -L`` follows the range through history, so line drift from
    unrelated edits above the function does not cause false positives."""
    out = _git(
        "log", f"-L{start},{end}:{file}", "--format=%H", "-s", "-1"
    ).stdout.strip()
    return out.splitlines()[0] if out else None


def is_ancestor(maybe_ancestor: str, commit: str) -> bool:
    return _git(
        "merge-base", "--is-ancestor", maybe_ancestor, commit
    ).returncode == 0


def audit() -> dict:
    queries = all_queries()
    greens = official_greens()
    commits = {rnd: round_commit(rnd) for rnd in set(greens.values())}
    report: dict[str, dict] = {}
    for pos, (name, fn) in enumerate(queries.items()):
        entry: dict = {"position": pos, "in_window": pos < WINDOW}
        last_green = greens.get(name)
        if last_green is None:
            entry["status"] = "never-green"
            report[name] = entry
            continue
        entry["last_green_round"] = last_green
        green_commit = commits.get(last_green)
        span = fn_span(fn)
        if span is None or green_commit is None:
            entry["status"] = "stale?"
            entry["reason"] = "cannot locate function span or green commit"
            report[name] = entry
            continue
        file, start, end = span
        touch = last_touch(file, start, end)
        if touch and not is_ancestor(touch, green_commit):
            entry["status"] = "stale?"
            entry["reason"] = f"{file}:{start}-{end} modified in {touch[:10]} " \
                              f"after round {last_green}'s record"
        else:
            entry["status"] = "fresh"
        report[name] = entry
    return report


def main() -> None:
    report = audit()
    if "--json" in sys.argv:
        print(json.dumps(report, indent=2))
        return
    needs_window = {
        n: e for n, e in report.items()
        if e["status"] in ("never-green", "stale?") and not e["in_window"]
    }
    counts: dict[str, int] = {}
    for e in report.values():
        counts[e["status"]] = counts.get(e["status"], 0) + 1
    print(f"queries: {len(report)}  " +
          "  ".join(f"{k}: {v}" for k, v in sorted(counts.items())))
    stale_in_window = [
        n for n, e in report.items()
        if e["status"] in ("never-green", "stale?") and e["in_window"]
    ]
    if stale_in_window:
        print(f"inside window (will be re-checked next round): "
              f"{', '.join(stale_in_window)}")
    if not needs_window:
        print("window OK: every never-green/stale query is inside the "
              f"first {WINDOW} entries of QUERY_ORDER (or none exist).")
    else:
        print(f"\nWARNING - {len(needs_window)} queries have no trustworthy "
              f"official record AND sit outside the {WINDOW}-entry window:")
        for n, e in sorted(needs_window.items(), key=lambda kv: kv[1]["position"]):
            print(f"  #{e['position']:3d} {n}: {e['status']} "
                  f"({e.get('reason', 'never green')})")
        print("\nFront-load these in registry.QUERY_ORDER, or re-confirm via "
              "`pytest tests/test_oracle_parity.py -k <name>`.")


if __name__ == "__main__":
    main()
