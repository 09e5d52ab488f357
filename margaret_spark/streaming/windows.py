"""Watermarked event-time windows over streams.

The reference has no late-data concept — seq order IS arrival order
(SURVEY §2.7). These helpers are the beyond-reference streaming
surface a training-data pipeline needs: tumbling/sliding event-time
aggregation with watermark-bounded state, the streaming twin of the
batch ``events_daily`` / ``events_sessions`` queries.

Scale shape: watermarks bound state-store size (windows older than
the watermark are finalized and evicted); the aggregation itself is
Spark's built-in streaming hash aggregate — partial map-side combine
per micro-batch, state shuffled once on the grouping key.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_agg(
    sdf: DataFrame,
    ts_col: str,
    keys: Sequence[str] = (),
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling (or sliding, with ``slide``) event-time counts/sums per
    key with a watermark for late data. Works on streaming or batch
    DataFrames (batch ignores the watermark) — same plan either way.

    Returns (window_start, window_end, *keys, n, sum_value) where a
    ``value`` column is summed when present.
    """
    w = F.window(F.col(ts_col), window, slide or window)
    agged = sdf.withWatermark(ts_col, watermark) if sdf.isStreaming else sdf
    aggs = [F.count("*").alias("n")]
    if "value" in sdf.columns:
        aggs.append(F.sum("value").alias("sum_value"))
    return (
        agged.groupBy(w.alias("__w"), *[F.col(k) for k in keys])
        .agg(*aggs)
        .select(
            F.col("__w.start").alias("window_start"),
            F.col("__w.end").alias("window_end"),
            *[F.col(k) for k in keys],
            *[F.col(a) for a in (["n", "sum_value"] if "value" in sdf.columns else ["n"])],
        )
    )


def session_windows(
    sdf: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-based session windows (``F.session_window``): the streaming
    form of the batch sessionization query — state closes a session
    once the watermark passes its last event + gap."""
    w = F.session_window(F.col(ts_col), gap)
    agged = sdf.withWatermark(ts_col, watermark) if sdf.isStreaming else sdf
    aggs = [F.count("*").alias("n_events")]
    if "value" in sdf.columns:
        aggs.append(F.sum("value").alias("sum_value"))
    return (
        agged.groupBy(w.alias("__s"), *[F.col(k) for k in keys])
        .agg(*aggs)
        .select(
            F.col("__s.start").alias("session_start"),
            F.col("__s.end").alias("session_end"),
            *[F.col(k) for k in keys],
            *(["n_events", "sum_value"] if "value" in sdf.columns else ["n_events"]),
        )
    )
