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


def streaming_merge_upsert(
    spark: SparkSession,
    delta_stream_dir: str,
    snapshot_path: str,
    checkpoint_dir: str,
    key: str,
    schema,
):
    """Continuously merge a file-source change stream into a parquet
    snapshot.  Returns the started query; callers typically use
    ``trigger(availableNow=True)`` semantics via ``q.awaitTermination()``.

    Micro-batches replay after failure from the checkpoint, and the merge
    is idempotent per key (last write wins), so the snapshot converges
    exactly-once per batch.  At scale, swap the snapshot rewrite for a
    Delta/Iceberg MERGE commit; the foreachBatch body is unchanged.
    """
    stream = spark.readStream.schema(schema).parquet(delta_stream_dir)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        base = spark.read.parquet(snapshot_path)
        merged = merge_upsert(base, batch_df, key)
        tmp = f"{snapshot_path}.tmp-{uuid.uuid4().hex[:8]}"
        merged.write.mode("overwrite").parquet(tmp)
        old = f"{snapshot_path}.old-{uuid.uuid4().hex[:8]}"
        os.rename(snapshot_path, old)
        os.rename(tmp, snapshot_path)
        shutil.rmtree(old)

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
