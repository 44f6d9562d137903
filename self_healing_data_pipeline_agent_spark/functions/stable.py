"""Numerically *reproducible* aggregates for oracle-checked queries.

Problem: ``SUM(double)`` depends on summation order, which differs between
Spark's partial/final aggregation tree and any other engine (and between two
Spark runs with different partitioning).  For value-hash comparison against a
DuckDB oracle we need bit-identical results.

Fix: quantize each row to an integer number of 1e-4 units using ONLY IEEE
double ops — ``floor(x * 10000.0 + 0.5)`` — which every engine computes
bit-identically, then sum as BIGINT (exact, associative, order-independent).
The final ``sum / 10000.0`` is a single deterministic double division.

(A first attempt used double->DECIMAL casts; that broke because engines
disagree on the cast's rounding near scale boundaries — Spark converts via
exact BigDecimal, DuckDB scales in double space.  Pure double arithmetic +
integer sums sidesteps engine-specific conversion semantics entirely.)

This also reflects good 100 TB practice: fixed-point measures make
aggregates invariant under repartitioning — the answer can never depend on
the cluster's shuffle layout.  BIGINT headroom: at 1e-4 scale, ~9e14 units
per row of headroom; sums overflow only past ~9e18 units (sf ~1e4 for
TPC-H-like magnitudes).

SQL twins in ``functions/oracle_sql.py`` keep the textual expression shape
identical so both engines execute the same float ops in the same order.

Accumulator width: linear terms (prices ~1e5 -> ~1e9 units/row) stay far
from BIGINT overflow until sf ~1e4, so ``dsum`` keeps the fast 64-bit
accumulator (128-bit decimal sums measurably slow the scan-heavy
aggregations).  *Squared* terms (~1e14 units/row) overflow BIGINT at
sf0.1 already, so ``dsum_wide`` sums those into DECIMAL(38,0).  DuckDB's
SUM(BIGINT) widens to HUGEINT natively; both engines convert the exact
integer sum to double with correct rounding, so parity is unaffected.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCALE = 10000.0  # 1e-4 quantum: keeps cents (and sub-cents) exact


def _units(expr: Column) -> Column:
    """Row value -> integer 1e-4 units via pure IEEE double ops.
    floor(x*1e4 + 0.5) == round-half-up, identical in any IEEE engine."""
    return F.floor(expr * F.lit(SCALE) + F.lit(0.5))


def dsum(expr: Column) -> Column:
    """Order-independent sum of a double expression (quantized to 1e-4).
    64-bit accumulator — use only where per-row magnitude is bounded by
    ~1e9 units (all linear TPC-H measures).  SQL twin: ``sql_dsum``."""
    return F.sum(_units(expr)).cast("double") / F.lit(SCALE)


def dsum_wide(expr: Column) -> Column:
    """``dsum`` with a 128-bit accumulator for large per-row magnitudes
    (squared terms in variance).  Same value, wider sum.

    The final conversion is SPLIT — ``q = S div 1e4`` (exact integer),
    ``r = S mod 1e4`` — and reassembled as ``double(q) + double(r)/1e4``,
    because engines disagree on rounding when casting integers ABOVE
    2^63 to double: at sf0.1 the squared-price unit sum is ~2.2e19 and
    DuckDB's HUGEINT->DOUBLE rounds differently from Spark's
    DECIMAL->DOUBLE (2 ulp apart — found by the sf0.1 parity sweep).
    After the split both engines only convert int64-range integers,
    where int->double is IEEE round-to-nearest everywhere, and the
    remaining +,/ are identically-shaped IEEE ops.  (Quantized units of
    a squared term are non-negative, so div/mod truncation vs floor is
    moot.)  SQL twin: ``sql_dsum_wide``."""
    s = F.sum(_units(expr).cast("decimal(38,0)"))
    r = s % F.lit(10000)
    q = ((s - r) / F.lit(10000)).cast("long")
    return q.cast("double") + r.cast("long").cast("double") / F.lit(SCALE)


def davg(expr: Column) -> Column:
    """Order-independent mean: exact unit sum / count, in double.
    SQL twin: ``sql_davg``."""
    return dsum(expr) / F.count(expr)


def dstd(expr: Column) -> Column:
    """Order-independent sample stddev via exact unit sums:
    sqrt((S2 - S1*S1/n) / (n-1)).  SQL twin: ``sql_dstd``.

    Numerically this is the naive one-pass formula — fine for profile-style
    stats where variance is far from cancellation; the tradeoff buys
    bit-reproducibility across engines and partitionings.
    """
    s1 = dsum(expr)
    s2 = dsum_wide(expr * expr)
    n = F.count(expr)
    return F.sqrt((s2 - s1 * s1 / n) / (n - F.lit(1)))
