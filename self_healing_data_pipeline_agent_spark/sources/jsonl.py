"""JSONL (newline-delimited JSON) source/sink — the interchange format
training-data pipelines actually exchange: one document per line, schema
declared, optionally gzip-compressed.

Scale rules baked in:

- **Schema is declared, never inferred.** `spark.read.json` without a
  schema runs a full extra pass over 100 TB just to guess types (and
  guesses differently per sample).  Callers pass the schema (or a DDL
  string); malformed lines land in `_corrupt_record` instead of failing
  the job (PERMISSIVE), so one bad shard can't kill a backfill.
- **Compression is codec-splittable-aware.** Plain gzip JSONL is
  non-splittable (one task per file regardless of size); the writer
  defaults to uncompressed and callers opting into gzip are choosing
  file-level parallelism deliberately (fine for many ~100 MB shards —
  the layout JSONL corpora actually ship in).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    keep_corrupt: bool = True,
) -> DataFrame:
    """Read newline-delimited JSON with a declared schema.

    ``keep_corrupt`` adds the PERMISSIVE ``_corrupt_record`` column so DQ
    can count malformed lines (the same fail-soft posture as the CSV
    ``try_cast`` path in ``etl.py``)."""
    reader = spark.read
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if keep_corrupt:
        from pyspark.sql.types import StringType

        if "_corrupt_record" not in [f.name for f in schema.fields]:
            schema = schema.add("_corrupt_record", StringType())
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", "_corrupt_record"
        )
    else:
        reader = reader.option("mode", "DROPMALFORMED")
    return reader.schema(schema).json(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    compression: str | None = None,
    shards: int | None = None,
) -> None:
    """Write one-JSON-object-per-line shards.  ``shards`` repartitions to
    a target shard count (JSONL corpora are usually published as N
    similar-sized files); ``compression`` e.g. ``"gzip"`` trades
    splittability for size (see module docstring)."""
    if shards:
        df = df.repartition(shards)
    writer = df.write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)
