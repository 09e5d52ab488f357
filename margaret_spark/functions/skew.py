"""Skew mitigation for aggregations: salted two-phase groupBy.

AQE's skew handling covers JOINS (splitting oversized partitions),
and partial map-side aggregation covers most skewed groupBys — but an
aggregation whose per-key state is large (collect_set, exact distinct
counts) still funnels each hot key through one reducer. Salting
splits a hot key across ``salt`` reducers in phase 1 and merges the
per-salt partials in phase 2: two small shuffles instead of one
skewed one.

Works for any algebraic aggregate (merge of partials == aggregate of
whole). The helper takes phase-1 aggregate expressions and phase-2
merge expressions by name.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt: int, col_name: str = "__salt") -> DataFrame:
    """Salt in [0, salt) — spreads rows of a hot key across reducers
    without changing results for algebraic aggregates. The salt mixes
    a hash of the row's columns with the row's physical position
    (``monotonically_increasing_id``): a pure content hash maps a hot
    key made of IDENTICAL rows — the classic count(*)-per-key shape,
    where the projection carries only the key — onto ONE bucket,
    defeating the whole mitigation. Salt ASSIGNMENT therefore depends
    on partition layout, which is invisible to any algebraic
    aggregate (merge of partials == aggregate of the whole), so
    RESULTS stay reproducible run to run.

    Retry caveat (inherent to salting identical rows, exactly as with
    ``rand()``-based salts): the salt is order-dependent, so the
    shuffle map output is non-deterministic across task attempts — a
    row's salt can differ if a partial stage retry (shuffle-fetch
    failure) recomputes its map task. Spark handles this by rolling
    back and re-running the WHOLE indeterminate stage (SPARK-23207's
    ResultStage/ShuffleMapStage rollback), so algebraic aggregates
    stay correct; do not feed the salted column into side effects
    that assume per-row stability across attempts."""
    return df.withColumn(
        col_name,
        F.pmod(
            F.xxhash64(
                *[F.col(c) for c in df.columns], F.monotonically_increasing_id()
            ),
            F.lit(salt),
        ),
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    merge_aggs: Sequence[Column],
    salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation: groupBy (keys + salt) with
    ``partial_aggs``, then groupBy keys with ``merge_aggs`` over the
    partial columns. Example::

        salted_agg(
            df, ["k"],
            partial_aggs=[F.count("*").alias("__n"), F.sum("v").alias("__s")],
            merge_aggs=[F.sum("__n").alias("n"), F.sum("__s").alias("sum_v")],
            salt=32,
        )
    """
    phase1 = with_salt(df, salt).groupBy(*keys, "__salt").agg(*partial_aggs)
    return phase1.groupBy(*keys).agg(*merge_aggs)


def salted_join(
    big: DataFrame,
    other: DataFrame,
    on: str | Sequence[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` has hot keys and ``other`` is too large
    to broadcast (AQE's skew-join split handles most cases at runtime;
    this is the explicit form for when it can't — e.g. a skewed key
    feeding a downstream stateful op, or an engine without AQE).

    ``other`` is replicated ``salt``× (one copy per salt value) and
    each ``big`` row is scattered to one salt bucket by a hash of its
    whole row — a hot key's rows then spread across ``salt`` reducers
    instead of funnelling through one. Result is row-identical to the
    plain join; cost is ``salt``× shuffle volume on the replicated
    side, so pick the smaller input as ``other``.

    Only ``big``-preserving join types are allowed: with a right or
    full join every unmatched ``other`` row would surface once per
    salt replica (salt× duplicated null-padded rows)."""
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join replicates `other` {salt}x, so only big-side-"
            f"preserving join types are row-identical to the plain join; "
            f"got how={how!r} (allowed: inner/left/semi/anti)"
        )
    keys = [on] if isinstance(on, str) else list(on)
    rep = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    # same identical-rows consideration as with_salt: mix the physical
    # position in so a hot key of duplicate rows still spreads (any
    # bucket assignment joins correctly — rep covers every salt value)
    scattered = big.withColumn(
        "__salt",
        F.pmod(
            F.xxhash64(
                *[F.col(c) for c in big.columns], F.monotonically_increasing_id()
            ),
            F.lit(salt),
        ).cast("int"),
    )
    return scattered.join(rep, keys + ["__salt"], how).drop("__salt")


def key_skew_report(
    df: DataFrame, key_col: str, k: int = 20, round_digits: int = 6
) -> DataFrame:
    """(key, n, share, rank): the top-``k`` heaviest keys by row count
    with their share of the table — the pre-flight diagnostic that
    picks the mitigation above (a key holding >1/salt of the table
    needs :func:`salted_agg`/:func:`salted_join`; one holding ~1/N
    doesn't). Ties rank by key, so the report is deterministic.

    Shape at scale: one map-side-combined count per key, TakeOrdered
    top-k (no full sort), then a window over the ≤ k survivors. The
    table total is ONE driver-side scalar count — metadata-only on a
    Parquet source. All arithmetic is IEEE double of exact integers,
    so an oracle reproduces every share bit-for-bit."""
    from margaret_spark.functions.numeric import pround

    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    total = df.count()
    counts = df.groupBy(key_col).agg(F.count("*").alias("n"))
    top = counts.orderBy(F.col("n").desc(), F.col(key_col).asc()).limit(k)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n").desc(), F.col(key_col).asc())
    return top.select(
        F.col(key_col),
        F.col("n"),
        pround(F.col("n") / F.lit(float(total)), round_digits).alias("share"),
        F.row_number().over(w).cast("int").alias("rank"),
    )


def salted_distinct_count(
    df: DataFrame, keys: Sequence[str], value_col: str, salt: int = 16
) -> DataFrame:
    """Exact COUNT(DISTINCT value) per key without funnelling a hot
    key's whole value set through one reducer: phase 1 dedups within
    (key, salt-of-value) — the same value always lands in the same
    salt bucket, so cross-bucket double counting is impossible —
    phase 2 sums bucket cardinalities."""
    salted = df.select(
        *keys, F.col(value_col), F.pmod(F.xxhash64(F.col(value_col)), F.lit(salt)).alias("__salt")
    )
    phase1 = salted.groupBy(*keys, "__salt").agg(
        F.countDistinct(value_col).alias("__dc")
    )
    return phase1.groupBy(*keys).agg(F.sum("__dc").cast("long").alias("distinct_count"))
