"""Data-profiling operators: exact equi-width histograms — the
distribution fingerprint a pipeline takes of every numeric column
before choosing filters, clamps, or normalization (the constraints
report in ``operators/constraints.py`` checks rules; this SHOWS the
shape the rules should encode).

Everything is exact integer counting over deterministic IEEE bucket
arithmetic: bounds are the column's exact min/max (identical doubles
in any engine), width and edges are single-division/multiply-add
expression trees both engines evaluate bit-identically — so unlike
``approx_quantile`` sketches, the histogram is oracle-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def histogram(
    df: DataFrame,
    value_col: str,
    bins: int = 20,
    group_col: str | None = None,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """(group?, bucket, lo_edge, hi_edge, n): exact equi-width
    histogram of a double column, optionally segmented by a group
    column (groups share ONE global bucket grid, so their
    distributions are directly comparable).

    Bounds default to the column's exact min/max — one driver-side
    scalar aggregation (metadata-cheap on Parquet), never a shuffle.
    ``width = (hi - lo) / bins`` in IEEE double; each non-NULL value
    in ``[lo, hi]`` lands in ``min(floor((v - lo) / width), bins-1)``
    (the top edge closes the last bucket); with explicit bounds,
    values outside the range are dropped, not clamped. A degenerate
    column (``hi == lo``) collapses into bucket 0. Empty buckets are
    not emitted (join against ``sequence(0, bins-1)`` to densify —
    same spine trick as ``operators/timeseries.py``).

    Scale shape: one map-side-combined groupBy on (group, bucket) —
    at most ``groups × bins`` rows leave the exchange regardless of
    input size; the bucket math is whole-stage codegen."""
    if bins < 1:
        raise ValueError(f"bins must be >= 1: {bins}")
    v = F.col(value_col).cast("double")
    if lo is None or hi is None:
        row = df.agg(
            F.min(v).alias("__lo"), F.max(v).alias("__hi")
        ).collect()[0]
        lo = float(row["__lo"]) if lo is None and row["__lo"] is not None else lo
        hi = float(row["__hi"]) if hi is None and row["__hi"] is not None else hi
    if lo is None or hi is None:  # all-NULL column
        base = [] if group_col is None else [group_col]
        return df.select(
            *base,
            F.lit(0).alias("bucket"),
            F.lit(0.0).alias("lo_edge"),
            F.lit(0.0).alias("hi_edge"),
            F.lit(0).cast("long").alias("n"),
        ).limit(0)
    if hi < lo:
        raise ValueError(f"hi must be >= lo: [{lo}, {hi}]")
    width = (hi - lo) / bins  # python float division == IEEE double
    in_range = v.isNotNull() & (v >= lo) & (v <= hi)
    if width == 0.0:
        bucket = F.lit(0)
    else:
        bucket = F.least(
            F.floor((v - F.lit(lo)) / F.lit(width)), F.lit(bins - 1)
        )
    keys = ([F.col(group_col)] if group_col else []) + [
        bucket.cast("int").alias("bucket")
    ]
    out = (
        df.where(in_range)
        .groupBy(*keys)
        .agg(F.count("*").cast("long").alias("n"))
    )
    edge = F.lit(lo) + F.col("bucket").cast("double") * F.lit(width)
    hi_edge = F.lit(lo) + (F.col("bucket").cast("double") + F.lit(1.0)) * F.lit(
        width
    )
    cols = ([F.col(group_col)] if group_col else []) + [
        F.col("bucket"),
        edge.alias("lo_edge"),
        hi_edge.alias("hi_edge"),
        F.col("n"),
    ]
    return out.select(*cols)


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    qs: list[float],
    bins: int = 128,
    group_col: str | None = None,
    round_digits: int = 6,
) -> DataFrame:
    """(group?, q, est): quantile estimates read off the equi-width
    :func:`histogram` by cumulative-count interpolation — the
    DETERMINISTIC, MERGEABLE quantile summary next to the
    engine-internal GK sketch (``approx_quantiles``): histogram counts
    are additive (partials union + re-sum, exactly like the CMS), and
    the whole estimate tree — integer cumsums, ``ceil(q·N)`` target
    ranks, linear interpolation inside the containing bucket — is
    exact integer/IEEE arithmetic, so the result is hash-exact
    cross-engine. Error is bounded by one bucket width (pick ``bins``
    for the accuracy the pipeline needs; 128 bins on a bounded metric
    beats GK's rank guarantee for most quality-score/length columns at
    a fraction of the state).

    Each quantile ``q`` ∈ (0, 1] maps to rank ``r = ceil(q·N)`` and
    estimates ``lo_edge + width·(r − cum_prev)/n`` inside the bucket
    where the cumulative count first reaches ``r``.

    Scale shape: the histogram's one bounded aggregation, then windows
    and joins over ≤ groups × bins rows — post-reduction work only."""
    if not qs:
        raise ValueError("qs must be non-empty")
    for q in qs:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"quantiles must be in (0, 1]: {q}")
    v = F.col(value_col).cast("double")
    row = df.agg(F.min(v).alias("__lo"), F.max(v).alias("__hi")).collect()[0]
    if row["__lo"] is None:  # all-NULL column: no quantiles
        base = [] if group_col is None else [group_col]
        return df.select(
            *base, F.lit(0.0).alias("q"), F.lit(0.0).alias("est")
        ).limit(0)
    lo, hi = float(row["__lo"]), float(row["__hi"])
    width = (hi - lo) / bins
    hist = histogram(df, value_col, bins, group_col, lo, hi)
    gcols = [group_col] if group_col else []
    w = Window.partitionBy(*gcols).orderBy("bucket")
    tot = Window.partitionBy(*gcols)
    staged = hist.select(
        *gcols,
        "bucket",
        "n",
        F.sum("n").over(w).alias("__cum"),
        F.sum("n").over(tot).alias("__N"),
    )
    qdf = F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    crossed = staged.select("*", qdf)
    r = F.ceil(F.col("q") * F.col("__N").cast("double")).cast("long")
    prev = F.col("__cum") - F.col("n")
    est = F.lit(lo) + F.lit(width) * (
        F.col("bucket").cast("double")
        + (r - prev).cast("double") / F.col("n").cast("double")
    )
    from margaret_spark.functions.numeric import pround

    return (
        crossed.where((prev < r) & (r <= F.col("__cum")))
        .select(
            *gcols,
            F.col("q"),
            pround(est, round_digits).alias("est"),
        )
    )
