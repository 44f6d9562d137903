"""Unit tests for sources/index_store: build-once/serve-many caching,
params- and source-staleness invalidation, and model JSON roundtrip
exactness (the serve queries' correctness rides on the stored artifact
being bit-identical to a fresh build)."""

from __future__ import annotations

import os
import shutil
from pathlib import Path

import pytest

from self_healing_data_pipeline_agent_spark.sources import index_store as ist

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture
def store_dir(tmp_path, monkeypatch):
    d = tmp_path / "indexes"
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(d))
    return d


def test_ensure_index_builds_once_then_serves(spark, store_dir):
    calls = []

    def build():
        calls.append(1)
        return spark.range(5).selectExpr("id", "id * 2 AS v")

    a = ist.ensure_index(spark, SF_DIR, "t1", "fp1", build)
    b = ist.ensure_index(spark, SF_DIR, "t1", "fp1", build)
    assert len(calls) == 1, "second call must serve from the store"
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_ensure_index_fingerprint_change_rebuilds_and_prunes(spark, store_dir):
    calls = []

    def build():
        calls.append(1)
        return spark.range(3).selectExpr("id")

    ist.ensure_index(spark, SF_DIR, "t2", "fpA", build)
    ist.ensure_index(spark, SF_DIR, "t2", "fpB", build)
    assert len(calls) == 2, "a params change must invalidate"
    slots = [p for p in (store_dir / "t2").iterdir() if p.is_dir()]
    assert len(slots) == 1, "superseded digest dirs must be pruned"


def test_ensure_index_source_staleness_rebuilds(spark, store_dir, tmp_path):
    src = tmp_path / "sf"
    src.mkdir()
    shutil.copy(Path(SF_DIR) / "region.parquet", src / "region.parquet")
    calls = []

    def build():
        calls.append(1)
        return spark.range(2).selectExpr("id")

    ist.ensure_index(spark, src, "t3", "fp", build, source_table="region")
    # a corpus refresh = new mtime -> new digest -> rebuild
    os.utime(src / "region.parquet", ns=(1, 1))
    ist.ensure_index(spark, src, "t3", "fp", build, source_table="region")
    assert len(calls) == 2


def test_ensure_model_roundtrip_is_exact(store_dir):
    model = [[0, [10**17, -3, 0]], [1, [7, 8, 9]]]
    calls = []

    def build():
        calls.append(1)
        return model

    first = ist.ensure_model(SF_DIR, "m1", "fp", build)
    second = ist.ensure_model(SF_DIR, "m1", "fp", build)
    assert len(calls) == 1
    # JSON roundtrip must preserve big ints exactly (no float coercion)
    assert second == model
    assert first == model
    assert isinstance(second[0][1][0], int)


def test_parallel_corpora_coexist_but_snapshots_supersede(
    spark, store_dir, tmp_path
):
    """Pruning scope (r12): slots for DIFFERENT corpus directories are
    parallel indexes (the test/gate/bench SFs coexist — pruning them
    caused a rebuild per SF switch), while a NEW snapshot of the SAME
    corpus supersedes its old slot."""
    sfa = tmp_path / "sfa"
    sfb = tmp_path / "sfb"
    for d in (sfa, sfb):
        d.mkdir()
        shutil.copy(Path(SF_DIR) / "region.parquet", d / "region.parquet")
    calls = []

    def build():
        calls.append(1)
        return spark.range(2).selectExpr("id")

    ist.ensure_index(spark, sfa, "t5", "fp", build, source_table="region")
    ist.ensure_index(spark, sfb, "t5", "fp", build, source_table="region")
    slots = [p for p in (store_dir / "t5").iterdir() if p.is_dir()]
    assert len(slots) == 2, "parallel corpora must coexist"
    # serving either corpus needs no rebuild
    ist.ensure_index(spark, sfa, "t5", "fp", build, source_table="region")
    ist.ensure_index(spark, sfb, "t5", "fp", build, source_table="region")
    assert len(calls) == 2
    # a refreshed snapshot of corpus A supersedes only A's old slot
    os.utime(sfa / "region.parquet", ns=(5, 5))
    ist.ensure_index(spark, sfa, "t5", "fp", build, source_table="region")
    assert len(calls) == 3
    slots = [p for p in (store_dir / "t5").iterdir() if p.is_dir()]
    assert len(slots) == 2, "old snapshot pruned, corpus B untouched"
    ist.ensure_index(spark, sfb, "t5", "fp", build, source_table="region")
    assert len(calls) == 3, "corpus B's slot must have survived the prune"


def test_builder_code_change_rebuilds(spark, store_dir):
    """r12 ADVICE: a behavior change in the builder must invalidate the
    stored artifact WITHOUT anyone bumping a version constant — identity
    now folds a hash of the builder's transitive source."""
    calls = []

    def build():
        calls.append(1)
        return spark.range(3).selectExpr("id", "id + 1 AS v")

    ist.ensure_index(spark, SF_DIR, "t6", "fp", build)
    ist.ensure_index(spark, SF_DIR, "t6", "fp", build)
    assert len(calls) == 1, "same code + params must serve"

    def build(  # noqa: F811 - same name, different body = a code change
    ):
        calls.append(1)
        return spark.range(3).selectExpr("id", "id + 2 AS v")

    served = ist.ensure_index(spark, SF_DIR, "t6", "fp", build)
    assert len(calls) == 2, "a builder-body change must rebuild"
    assert sorted(r["v"] for r in served.collect()) == [2, 3, 4]


def _exec_fake_pkg_fn(tmp_path, fname: str, src: str):
    """Compile ``src`` against a real file so inspect.getsource works,
    under a fake module name INSIDE the package so _code_fingerprint's
    same-package recursion follows the helper."""
    p = tmp_path / fname
    p.write_text(src)
    g = {"__name__": "self_healing_data_pipeline_agent_spark._fp_probe"}
    exec(compile(src, str(p), "exec"), g)
    return g["build"]


def test_code_fingerprint_tracks_helper_source(tmp_path):
    """The r12 ADVICE scenario: the builder's OWN source is unchanged but
    a same-package helper it calls changed behavior — the fingerprint
    must move (and must NOT move for byte-identical source)."""
    template = (
        "def helper():\n    return {body}\n\n"
        "def build():\n    return helper()\n"
    )
    b1 = _exec_fake_pkg_fn(tmp_path, "m1.py", template.format(body="1"))
    b2 = _exec_fake_pkg_fn(tmp_path, "m2.py", template.format(body="2"))
    b3 = _exec_fake_pkg_fn(tmp_path, "m3.py", template.format(body="1"))
    assert ist._code_fingerprint(b1) != ist._code_fingerprint(b2)
    assert ist._code_fingerprint(b1) == ist._code_fingerprint(b3)


def test_code_fingerprint_tracks_module_constants(tmp_path):
    """Referenced module-level scalar constants fold by repr: a KM_SCALE-
    style constant change rebuilds even when no function body moved."""
    template = "SCALE = {val}\n\ndef build():\n    return SCALE\n"
    b1 = _exec_fake_pkg_fn(tmp_path, "c1.py", template.format(val="10"))
    b2 = _exec_fake_pkg_fn(tmp_path, "c2.py", template.format(val="20"))
    assert ist._code_fingerprint(b1) != ist._code_fingerprint(b2)


def test_missing_meta_triggers_rebuild(spark, store_dir):
    calls = []

    def build():
        calls.append(1)
        return spark.range(1).selectExpr("id")

    ist.ensure_index(spark, SF_DIR, "t4", "fp", build)
    # simulate a crash between parquet write and meta commit
    for meta in (store_dir / "t4").glob("*/meta.json"):
        meta.unlink()
    ist.ensure_index(spark, SF_DIR, "t4", "fp", build)
    assert len(calls) == 2


def test_bucketed_table_builds_once_then_redeclares(spark, store_dir):
    """The bucketed warehouse copy must (a) build the files once, (b)
    return the live catalog table on repeat calls, and (c) after the
    catalog entry disappears (a fresh session), re-declare an external
    bucketed table over the SAME stored files — metadata-only, same
    rows, still bucketed."""
    tbl = ist.ensure_bucketed_table(spark, SF_DIR, "orders", "o_orderkey")
    n = spark.table(tbl).count()
    files = sorted(
        p.name for p in (store_dir / "bkt_orders").glob("*/data/*.parquet")
    )
    assert files, "bucketed files must be stored under the index store"

    # repeat call: same table, no rebuild (files untouched)
    assert ist.ensure_bucketed_table(spark, SF_DIR, "orders", "o_orderkey") == tbl
    assert sorted(
        p.name for p in (store_dir / "bkt_orders").glob("*/data/*.parquet")
    ) == files

    # simulate a fresh session: drop the catalog entry, keep the files
    spark.sql(f"DROP TABLE {tbl}")
    tbl2 = ist.ensure_bucketed_table(spark, SF_DIR, "orders", "o_orderkey")
    assert tbl2 == tbl
    assert spark.table(tbl2).count() == n
    assert sorted(
        p.name for p in (store_dir / "bkt_orders").glob("*/data/*.parquet")
    ) == files, "re-declare must be metadata-only"
    # the re-declared table still carries the bucket spec
    ddl = spark.sql(f"SHOW CREATE TABLE {tbl2}").first()[0]
    assert "CLUSTERED BY" in ddl and "16 BUCKETS" in ddl
    spark.sql(f"DROP TABLE {tbl2}")
