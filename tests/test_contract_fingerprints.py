"""The committed contract fingerprints must match the current code.

``CONTRACT_FINGERPRINTS.json`` hashes each query's RENDERED oracle SQL
and normalized analyzed plan — so a change to ANY semantic input
(including module-level constants interpolated into either side, the
class the span-tracking audit cannot see: ``Q8_REGION`` changed a
query's behavior completely in r8 while both tracked spans stayed
byte-identical) forces regenerating the file in the same commit:

    python scripts/contract_fingerprints.py --write

That makes the file's git history date every contract change, which
``scripts/window_audit.py`` uses to stale official greens precisely.
"""

from __future__ import annotations

import importlib.util
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_script(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "scripts", f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def cf():
    return _load_script("contract_fingerprints")


@pytest.fixture(scope="module")
def current(cf, spark):
    return cf.compute(spark)


def test_fingerprint_file_exists(cf):
    assert os.path.exists(cf.FINGERPRINT_FILE), (
        "CONTRACT_FINGERPRINTS.json missing — run "
        "scripts/contract_fingerprints.py --write and commit it"
    )


def test_fingerprints_match_code(cf, current):
    stored = cf.stored()
    changed = sorted(
        set(k for k in current if current[k] != stored.get(k))
        | (set(stored) - set(current))
    )
    assert changed == [], (
        f"contract fingerprints out of date for {changed} — a query's "
        "oracle SQL or plan changed without regenerating the committed "
        "file; run scripts/contract_fingerprints.py --write IN THE SAME "
        "commit as the contract change so the audit can date it"
    )
