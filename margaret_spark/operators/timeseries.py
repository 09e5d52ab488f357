"""Time-series resampling with gap filling: bucket an event stream
into a fixed grid per key and materialize EMPTY buckets — the step
between raw events and anything that assumes a dense time axis
(dashboards, trailing-window features, training-data time channels).
A groupBy alone silently drops empty intervals; every downstream
window then mis-frames.

Scale shape: one aggregation on (key, bucket); the dense spine is
generated per key from its own [min, max] bucket span (``sequence`` +
``explode`` — no driver-side range, no cross join against a global
calendar), and joined back on the same (key, bucket) keys. The
forward fill is a per-key window over the dense grid. Everything is
codegen arithmetic on epoch microseconds; sums are exact DECIMAL
(:func:`~margaret_spark.functions.numeric.dsum`), so the whole
surface is oracle-reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from margaret_spark.functions.numeric import dsum

#: Max buckets per generated spine array (see the two-level explode in
#: :func:`resample`) — 64k longs ≈ 0.5 MB per intermediate row.
_SPINE_CHUNK = 65_536


def resample(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    interval_s: int = 86_400,
    scale: int = 6,
) -> DataFrame:
    """(key, bucket_start, n_events, sum_value, sum_value_ffill): the
    event stream resampled onto a dense ``interval_s`` grid per key.

    - Buckets span each key's own ``[min, max]`` event range — every
      intermediate bucket exists even with zero events.
    - ``n_events`` is 0 for empty buckets; ``sum_value`` is NULL there
      (absence, not zero — the caller chooses the semantic).
    - ``sum_value_ffill`` carries the last non-empty bucket's sum
      forward (SQL ``last_value IGNORE NULLS``) — the step-function
      reading of a sparse series; leading empty buckets (none by
      construction: the span starts at an occupied bucket) stay NULL.
    """
    if interval_s < 1:
        raise ValueError(f"interval_s must be >= 1: {interval_s}")
    step = int(interval_s) * 1_000_000
    bucket = (F.floor(F.unix_micros(F.col(ts_col)) / F.lit(step)) * F.lit(step)).cast(
        "long"
    )
    agg = (
        df.select(
            F.col(key_col).alias("key"),
            bucket.alias("__b"),
            F.col(value_col).alias("__v"),
        )
        .groupBy("key", "__b")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            dsum("__v", scale=scale).alias("sum_value"),
        )
    )
    # Two-level spine: chunk starts first, then buckets within each
    # chunk. A single-level sequence(lo, hi, step) materializes a key's
    # WHOLE span as one array — a long-lived key on a fine grid makes
    # that a multi-million-element row (and sequence() hard-errors past
    # ~2^31 elements). Chunking caps every generated array at
    # _SPINE_CHUNK buckets with the identical bucket set.
    coarse = step * _SPINE_CHUNK
    spine = (
        agg.groupBy("key")
        .agg(F.min("__b").alias("__lo"), F.max("__b").alias("__hi"))
        .select(
            "key",
            F.col("__hi"),
            F.explode(
                F.sequence(F.col("__lo"), F.col("__hi"), F.lit(coarse))
            ).alias("__c"),
        )
        .select(
            "key",
            F.explode(
                F.sequence(
                    F.col("__c"),
                    F.least(F.col("__c") + F.lit(coarse - step), F.col("__hi")),
                    F.lit(step),
                )
            ).alias("__b"),
        )
    )
    dense = spine.join(agg, ["key", "__b"], "left")
    w = (
        Window.partitionBy("key")
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return dense.select(
        F.col("key").alias(key_col),
        F.timestamp_micros(F.col("__b")).alias("bucket_start"),
        F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
        F.col("sum_value"),
        F.last("sum_value", ignorenulls=True).over(w).alias("sum_value_ffill"),
    )
