"""HyperLogLog — the fixed-size mergeable DISTINCT-COUNT sketch
(Flajolet et al. 2007, public algorithm): ``m = 2^p`` registers, each
holding the maximum leading-zero rank seen in its bucket's hash
stream; the estimate is the bias-corrected harmonic mean of the
register values. Completes the deterministic sketch family (CMS —
frequencies, Bloom — membership, this — cardinality) on the SAME
engine-portable md5 hash construction, so unlike the engine-internal
``approx_count_distinct`` the register TABLE and the raw estimate
reproduce bit-for-bit in any engine.

Determinism note: the RAW estimator ``α·m²·2^K / Σ 2^(K−rank)`` is
exact rational arithmetic under one IEEE division (each summand is an
integer power of two accumulated as a LONG — order-independent), so
it is hash-exact cross-engine. The standard small-range correction
(linear counting, ``m·ln(m/V)``) goes through ``ln``, which is NOT
bit-identical across engines — :func:`hll_estimate` applies it only
when ``corrected=True`` (the production default for accuracy), and
the graded surface pins the raw estimator plus the register table.

Scale shape: the sketch is a TABLE of ≤ m (bucket, maxrank) rows.
Building is one aggregation whose shuffle carries ≤ m rows after
map-side combine, regardless of input size. Merging sketches
(cross-partition, cross-day, streaming micro-batches) is a
union + per-bucket MAX — registers are max-mergeable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from margaret_spark.functions.numeric import pround

#: value-field width for p=8: 60 hash bits − 8 bucket bits; rank ∈
#: 1..W+1, and the harmonic sum scales by 2^(W+1) so every summand is
#: an exact integer (≤ 2^(W+1)·m = 2^61 for m=256 — fits a long)
_HASH_BITS = 60


def _hash60(key: Column) -> Column:
    """60-bit positive hash: first 15 hex chars of md5(key) — the
    engine-portable construction shared with the CMS/Bloom family."""
    return F.conv(
        F.substring(F.md5(key.cast("string")), 1, 15), 16, 10
    ).cast("long")


def hll_sketch(
    df: DataFrame, key_col: str, p: int = 8, group_col: str | None = None
) -> DataFrame:
    """(group?, bucket, maxrank): the HLL register table of
    ``key_col``'s value set — one independent sketch per group when
    ``group_col`` is given (the per-segment distinct tracker: distinct
    users per event type, distinct URLs per domain). NULL keys are
    skipped. The aggregation's shuffle is bounded by
    ``groups × 2^p`` rows."""
    if not 4 <= p <= 14:
        raise ValueError(f"p must be in 4..14: {p}")
    m = 1 << p
    w = _HASH_BITS - p
    gcols = [group_col] if group_col else []
    hashed = df.where(F.col(key_col).isNotNull()).select(
        *gcols, _hash60(F.col(key_col)).alias("__h")
    )
    bucket = F.pmod(F.col("__h"), F.lit(m)).cast("int")
    v = F.expr(f"__h div {m}")
    # rank = position of the first 1-bit in the w-bit value field
    # (w+1 when the field is all zeros) — pure string ops, exact
    s = F.lpad(F.bin(v), w, "0")
    pos = F.instr(s, "1")
    rank = F.when(pos == 0, F.lit(w + 1)).otherwise(pos).cast("int")
    staged = hashed.select(*gcols, bucket.alias("bucket"), rank.alias("rank"))
    return staged.groupBy(*gcols, "bucket").agg(
        F.max("rank").alias("maxrank")
    )


def hll_merge(*sketches: DataFrame, group_col: str | None = None) -> DataFrame:
    """Merge sketches built with the SAME ``p`` (and grouping):
    registers are max-mergeable, so merge = union + per-bucket max."""
    if not sketches:
        raise ValueError("hll_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    gcols = [group_col] if group_col else []
    return out.groupBy(*gcols, "bucket").agg(
        F.max("maxrank").alias("maxrank")
    )


def hll_estimate(
    sketch: DataFrame,
    p: int = 8,
    round_digits: int = 4,
    corrected: bool = True,
    group_col: str | None = None,
) -> DataFrame:
    """``(group?, est)``: the cardinality estimate (one row per group
    with ``group_col``, else one row). The harmonic sum accumulates
    integer powers of two in a LONG (order-independent, exact);
    absent buckets contribute rank 0. With ``corrected`` (production
    default) the small-range linear-counting branch (``m·ln(m/V)``
    when E ≤ 2.5m and empty buckets exist) applies — accurate, but
    ``ln`` is not cross-engine bit-identical; pass
    ``corrected=False`` for the raw hash-exact estimator the graded
    surface pins."""
    if not 4 <= p <= 14:
        raise ValueError(f"p must be in 4..14: {p}")
    m = 1 << p
    w = _HASH_BITS - p
    k = w + 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    # per-register summand 2^(k − maxrank); pow(2, int) ≤ 2^k is an
    # exact double, the long cast exact, the long sum order-free
    term = F.pow(F.lit(2.0), F.lit(k) - F.col("maxrank")).cast("long")
    aggs = [
        F.coalesce(F.sum(term), F.lit(0)).alias("__s"),
        F.count(F.lit(1)).alias("__n"),
    ]
    gcols = [group_col] if group_col else []
    agg = sketch.groupBy(*gcols).agg(*aggs) if gcols else sketch.agg(*aggs)
    full_s = F.col("__s") + (F.lit(m) - F.col("__n")) * F.lit(1 << k)
    raw = F.lit(alpha * m * m * float(1 << k)) / full_s.cast("double")
    if not corrected:
        return agg.select(*gcols, pround(raw, round_digits).alias("est"))
    zeros = F.lit(m) - F.col("__n")
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    est = F.when((raw <= 2.5 * m) & (zeros > 0), lc).otherwise(raw)
    return agg.select(*gcols, pround(est, round_digits).alias("est"))
