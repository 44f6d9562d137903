"""Arrow-batched NumPy kernels for the vector-heavy query paths.

Why (r16 optimization, guide §4.2): the embedding family's dot products,
norms and hyperplane projections were built from ``zip_with``/``aggregate``
higher-order functions.  HOF lambdas evaluate INTERPRETED per element
(the repo's documented 2.3-6x "lambda tax"; only non-lambda expressions
ride whole-stage codegen), so a verify pass over 10^5-10^6 candidate
pairs pays tens of millions of interpreted expression evaluations.  The
optimization guide's answer is to keep Spark for distribution/shuffles
and hand whole Arrow batches to vectorized native code — these kernels
do exactly that with NumPy.

BIT-EXACTNESS CONTRACT (why every result is hash-identical):

- The JVM form is a strictly SEQUENTIAL left fold:
  ``aggregate(zip_with(a, b, x*y), 0.0, acc + x)`` — products first,
  then ``(((0+p0)+p1)+p2)...`` in element order.  DuckDB's
  ``list_dot_product`` is the same sequential chain (the repo's
  long-standing cross-engine pairing).
- ``np.cumsum`` over float64 computes the identical chain: it must emit
  every prefix, so it is the same left-to-right add sequence; the last
  prefix IS the fold.  (``np.sum`` would NOT qualify — it uses pairwise
  summation.)  Pinned by ``tests/test_veckernels.py``, which compares
  every kernel against the old HOF expressions bit-for-bit on real
  testdata.
- float32 -> float64 widening is exact; float64 multiply/divide/sqrt
  and comparisons are IEEE-754 operations identical across NumPy, the
  JVM and DuckDB.

Scale posture: these are NARROW map stages (no shuffle moved, no join
shape changed — the plan pins that candidate joins carry only 12-byte
code rows are untouched).  Each task converts its batches once at the
Arrow boundary and runs two or three NumPy ops per batch; only the
columns the kernel needs are selected before the boundary so the scan
still prunes (guide §4.1/§4.2).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Keep per-batch temporaries bounded: the LSH kernel materializes an
# (rows, planes, dim) float64 product cube before its cumsum; 2048 rows
# x 32 planes x 64 dims x 8 B = 32 MB per chunk per task.
_CHUNK_ROWS = 2048


def _flat2d(col, dim: int, dtype=np.float64) -> np.ndarray:
    """(N, dim) ndarray from an Arrow list<float/double> column.

    ``flatten()`` honors the array's offset/length slice, so this is
    safe on sliced batches; lists are fixed-length ``dim`` by schema
    (asserted — a ragged row would silently misalign every row after
    it)."""
    flat = np.asarray(col.flatten(), dtype=dtype)
    n = len(col)
    assert flat.size == n * dim, f"expected {n}x{dim} values, got {flat.size}"
    return flat.reshape(n, dim)


def _seq_sum(prod: np.ndarray) -> np.ndarray:
    """Strictly sequential left-fold sum over the LAST axis (the
    bit-exact stand-in for ``aggregate(..., 0.0, acc + x)``)."""
    return np.cumsum(prod, axis=-1)[..., -1]


def attach_pair_cosine(
    pairs: DataFrame,
    a_col: str,
    b_col: str,
    keep: list[tuple[str, str]],
    out_col: str = "cosine",
    dim: int = 64,
) -> DataFrame:
    """(keep..., out_col): exact cosine dot(a,b)/(|a||b|) for a joined
    pair frame carrying two embedding columns — the verify stage of the
    near-dup family.  ``keep`` is [(col, spark_type_ddl)] passed through
    unchanged.  Arithmetic = the old per-row HOF expression, batched."""
    in_cols = [c for c, _ in keep] + [a_col, b_col]
    schema = T.StructType.fromDDL(
        ", ".join(f"{c} {t}" for c, t in keep) + f", {out_col} double"
    )
    n_keep = len(keep)

    def kern(batches: Iterator) -> Iterator:
        import pyarrow as pa

        for b in batches:
            a = _flat2d(b.column(n_keep), dim)
            c = _flat2d(b.column(n_keep + 1), dim)
            na = np.sqrt(_seq_sum(a * a))
            nb = np.sqrt(_seq_sum(c * c))
            cos = _seq_sum(a * c) / (na * nb)
            yield pa.RecordBatch.from_arrays(
                [b.column(i) for i in range(n_keep)] + [pa.array(cos)],
                schema=pa.schema(
                    [b.schema.field(i) for i in range(n_keep)]
                    + [pa.field(out_col, pa.float64())]
                ),
            )

    return pairs.select(*in_cols).mapInArrow(kern, schema)


def lsh_code_rows(
    emb: DataFrame,
    planes: list[list[float]],
    n_tables: int,
    n_bits: int,
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, table, code): multi-table sign-LSH codes — plane
    ``t*n_bits + b`` supplies bit ``b`` of table ``t``'s code, exactly
    ``_lsh_code_for_table``'s packing.  The projection is the same
    sequential fold the HOF form ran (product array, then left-fold),
    so every sign bit — and therefore every code — is bit-identical."""
    P = np.asarray(planes, dtype=np.float64)  # (n_tables*n_bits, dim)
    dim = P.shape[1]
    weights = (1 << np.arange(n_bits, dtype=np.int32))
    # table/code are INT (not bigint): the pre-kernel expressions were
    # IntegerType, the stored signature artifacts and the DuckDB twins
    # are int32, and the driver's value hash is dtype-sensitive (the
    # dtype audit caught the bigint form) — also the narrower shuffle
    # row, guide §2.3.
    schema = T.StructType.fromDDL(
        f"{id_col} bigint, table int, code int"
    )

    def kern(batches: Iterator) -> Iterator:
        import pyarrow as pa

        tables = np.arange(n_tables, dtype=np.int32)
        for b in batches:
            ids = np.asarray(b.column(0), dtype=np.int64)
            E = _flat2d(b.column(1), dim)
            codes = np.empty((E.shape[0], n_tables), dtype=np.int32)
            for lo in range(0, E.shape[0], _CHUNK_ROWS):
                chunk = E[lo : lo + _CHUNK_ROWS]
                # (rows, planes, dim) product cube -> sequential fold
                proj = _seq_sum(chunk[:, None, :] * P[None, :, :])
                bits = (
                    (proj > 0)
                    .reshape(chunk.shape[0], n_tables, n_bits)
                    .astype(np.int32)
                )
                codes[lo : lo + _CHUNK_ROWS] = bits @ weights
            n = E.shape[0]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.repeat(ids, n_tables)),
                    pa.array(np.tile(tables, n)),
                    pa.array(codes.reshape(-1)),
                ],
                names=[id_col, "table", "code"],
            )

    return emb.select(id_col, "embedding").mapInArrow(kern, schema)


def attach_projection(
    emb: DataFrame,
    rows: list[list[float]],
    out_col: str = "parr",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, out_col: array<double>): per-vector projection onto the
    literal matrix ``rows`` (JL sign rows) — each output component the
    same sequential fold as the HOF form, so projections (and every
    downstream norm/score derived from them) are bit-identical."""
    P = np.asarray(rows, dtype=np.float64)  # (out_dim, dim)
    out_dim, dim = P.shape
    schema = T.StructType.fromDDL(
        f"{id_col} bigint, {out_col} array<double>"
    )

    def kern(batches: Iterator) -> Iterator:
        import pyarrow as pa

        for b in batches:
            E = _flat2d(b.column(1), dim)
            n = E.shape[0]
            proj = np.empty((n, out_dim), dtype=np.float64)
            for lo in range(0, n, _CHUNK_ROWS):
                chunk = E[lo : lo + _CHUNK_ROWS]
                proj[lo : lo + _CHUNK_ROWS] = _seq_sum(
                    chunk[:, None, :] * P[None, :, :]
                )
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(0),
                    pa.ListArray.from_arrays(
                        pa.array(
                            np.arange(0, (n + 1) * out_dim, out_dim),
                            type=pa.int32(),
                        ),
                        pa.array(proj.reshape(-1)),
                    ),
                ],
                names=[id_col, out_col],
            )

    return emb.select(id_col, "embedding").mapInArrow(kern, schema)
