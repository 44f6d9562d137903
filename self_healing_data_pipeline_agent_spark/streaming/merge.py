"""Streaming upsert sink: foreachBatch + the MERGE dataflow.

The batch MERGE (operators/relational.py::q_merge_upsert_orders — full
outer join, delta side wins) applied continuously: each micro-batch of
changes merges into the warehouse snapshot inside ``foreachBatch``.  This
is exactly how Delta/Iceberg streaming MERGE executes — foreachBatch gives
the batch DataFrame, the table format supplies the atomic commit.  Here the
"commit" is write-new-snapshot-then-swap (plain parquet has no commit log);
the dataflow, checkpointing, and exactly-once-per-batch replay semantics
are the real thing.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_upsert(base: DataFrame, delta: DataFrame, key: str) -> DataFrame:
    """MERGE: upsert ``delta`` rows into ``base`` on ``key`` (matching
    columns; delta wins per column).  One co-partitioned full-outer join
    on the key — the plan Delta MERGE compiles into."""
    d = delta.select([F.col(c).alias(f"_d_{c}") for c in delta.columns])
    joined = base.join(d, base[key] == d[f"_d_{key}"], "full_outer")
    return joined.select(
        [F.coalesce(F.col(f"_d_{c}"), F.col(c)).alias(c) for c in base.columns]
    )


def _dedupe_batch(batch_df: DataFrame, key: str, seq_col: str | None) -> DataFrame:
    """One row per key per micro-batch.  The file source batches together
    every delta file that landed since the last trigger, so a single batch
    CAN contain several rows for one key — fed straight into the full-outer
    join they would all survive as duplicate snapshot rows.  ``seq_col``
    (a change-sequence / event-time column) picks the true last write;
    without one, ordering over the remaining columns keeps the choice
    deterministic across replays (but arbitrary — supply ``seq_col`` when
    intra-batch order matters)."""
    from pyspark.sql import Window

    order = (
        [F.desc(seq_col)]
        if seq_col
        else [F.desc(c) for c in batch_df.columns if c != key]
    )
    w = Window.partitionBy(key).orderBy(*order)
    return (
        batch_df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def streaming_merge_upsert(
    spark: SparkSession,
    delta_stream_dir: str,
    snapshot_path: str,
    checkpoint_dir: str,
    key: str,
    schema,
    seq_col: str | None = None,
):
    """Continuously merge a file-source change stream into a parquet
    snapshot.  Returns the started query; callers typically use
    ``trigger(availableNow=True)`` semantics via ``q.awaitTermination()``.

    Micro-batches replay after failure from the checkpoint, each batch is
    first deduplicated to one row per key (``seq_col`` wins; see
    ``_dedupe_batch``), and the merge is idempotent per key, so the
    snapshot converges exactly-once per batch.

    Commit protocol: each batch writes a fresh versioned directory, then
    atomically repoints ``snapshot_path`` (a symlink) at it with a single
    ``os.rename`` — readers always see a complete snapshot, even if the
    process dies mid-commit.  This is a plain-filesystem miniature of a
    Delta/Iceberg commit log; at scale, swap the snapshot rewrite for a
    real MERGE commit — the foreachBatch body is unchanged.  (The very
    first commit migrates a plain-directory seed snapshot to the symlink
    layout; only that one-time migration has a non-atomic window.)
    """
    stream = spark.readStream.schema(schema).parquet(delta_stream_dir)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        base = spark.read.parquet(snapshot_path)
        merged = merge_upsert(base, _dedupe_batch(batch_df, key, seq_col), key)
        new_version = f"{snapshot_path}.v{batch_id}-{uuid.uuid4().hex[:8]}"
        merged.write.mode("overwrite").parquet(new_version)
        prev_target = (
            os.readlink(snapshot_path) if os.path.islink(snapshot_path) else None
        )
        if prev_target is None and os.path.isdir(snapshot_path):
            # one-time migration: plain-dir seed -> versioned layout
            legacy = f"{snapshot_path}.v-seed-{uuid.uuid4().hex[:8]}"
            os.rename(snapshot_path, legacy)
            prev_target = os.path.basename(legacy)
        link_tmp = f"{snapshot_path}.ln-{uuid.uuid4().hex[:8]}"
        os.symlink(os.path.basename(new_version), link_tmp)
        os.rename(link_tmp, snapshot_path)  # atomic repoint
        if prev_target:
            shutil.rmtree(
                os.path.join(os.path.dirname(snapshot_path), prev_target),
                ignore_errors=True,
            )

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
