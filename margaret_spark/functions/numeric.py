"""Deterministic numeric aggregation helpers.

Floating-point ``SUM`` is order-dependent, and Spark's shuffle order is
nondeterministic — two runs (or Spark vs an external oracle) can
disagree in the last ulps. For any aggregate whose value must be
*exactly* reproducible we sum in fixed-point decimal (exact,
order-independent) and cast the final result back to double.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str, scale: int = 4, precision: int = 38) -> Column:
    """Order-independent sum: cast each double to DECIMAL(p, s), sum
    exactly, return as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def davg(col: Column | str, scale: int = 4, precision: int = 38) -> Column:
    """Order-independent mean: exact decimal sum divided by count."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale, precision) / F.count(c)


def round_div(num: Column, den: Column, digits: int = 6) -> Column:
    """Rounded ratio of two deterministic quantities."""
    return pround(num / den, digits)


def pround(col: Column, digits: int = 6) -> Column:
    """Portable rounding: ``floor(x·10^d + 0.5) / 10^d``. For
    non-negative values this is round-half-up; for negatives it is
    half-toward-+infinity (e.g. -0.1234565 → -0.123456), NOT
    decimal-string HALF_UP. That asymmetry is deliberate and
    harmless here: the oracle evaluates the IDENTICAL expression
    tree, so both engines agree bit-for-bit on every input —
    including the negative cosines the similarity operators feed
    through. Engine ``round()`` implementations disagree at
    representation boundaries (decimal-string HALF_UP vs
    scaled-multiply); this tree is plain IEEE arithmetic, so any
    engine evaluating it gets the bit-identical result."""
    scale = float(10**digits)
    return F.floor(col * F.lit(scale) + F.lit(0.5)) / F.lit(scale)
