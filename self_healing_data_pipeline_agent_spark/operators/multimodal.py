"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, processed via Arrow-batched ``mapInPandas`` (SURVEY.md §2.B
extension ring).

The container has no image/audio codecs, so the *decode* step is stubbed
(``decode_image`` raises ``NotImplementedError`` unless given the
deterministic fake format) — but everything Spark-side is real and tested:
the binary column representation, the mapInPandas batch iteration, the
output schema contract, and the byte-level feature extraction (which needs
no codec).

At 100 TB: payloads stay in columnar storage next to their metadata;
mapInPandas streams Arrow batches through Python workers, so memory is
bounded by batch size (``spark.sql.execution.arrow.maxRecordsPerBatch``),
and the extraction is embarrassingly parallel — no shuffle at all.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, LongType, StructField, StructType,
)

from ..sources.tables import load_table

if TYPE_CHECKING:
    import pandas as pd

ORACLES: dict[str, str] = {}

N_HIST_BINS = 16

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("byte_histogram", ArrayType(DoubleType())),
    ]
)


def with_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary payload column (utf-8 bytes of the
    text — the documents table's stand-in for image/audio bytes)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def q_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata pass: byte length + content hash, fully
    JVM-side.  The schema/partitioning pattern for any blob column."""
    df = with_payload(load_table(spark, sf_dir, "documents"))
    return df.select(
        "doc_id",
        F.octet_length(F.col("payload")).alias("n_bytes"),
        F.sha2(F.col("payload"), 256).alias("sha"),
    )


ORACLES["payload_stats"] = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       sha256(text) AS sha
FROM documents
"""


def decode_image(payload: bytes) -> bytes:
    """Decode an image payload to raw pixels.

    STUB: real codecs (libjpeg/ffmpeg/...) are not available in this
    container.  The deterministic fake format ``b"FAKEIMG:" + pixels``
    passes through; anything else raises so the gap is explicit.
    """
    if payload.startswith(b"FAKEIMG:"):
        return payload[len(b"FAKEIMG:"):]
    raise NotImplementedError(
        "image codecs unavailable in this environment; payload must use the "
        "deterministic FAKEIMG test format"
    )


def extract_features(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
    """mapInPandas kernel: per-payload byte histogram (16 bins, L1
    normalized) — a codec-free, deterministic feature extractor with the
    exact batch shape a real image featurizer would use."""
    import numpy as np
    import pandas as pd

    for pdf in batches:
        feats = []
        for payload in pdf["payload"]:
            arr = np.frombuffer(payload, dtype=np.uint8)
            hist = np.bincount(arr >> 4, minlength=N_HIST_BINS).astype("float64")
            total = hist.sum()
            feats.append((hist / total if total else hist).tolist())
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "byte_histogram": feats,
            }
        )


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column.
    (No SQL oracle — rows-only check; determinism is pytest-asserted.)"""
    df = with_payload(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "payload"
    )
    return df.mapInPandas(extract_features, schema=FEATURE_SCHEMA)
