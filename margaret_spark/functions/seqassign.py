"""Distributed dense sequence assignment.

The reference gets gap-free seqs for free from its single-writer mutex
(``offset2/log.go:425-462``). Spark has no gap-free auto-increment:
``monotonically_increasing_id`` leaves gaps, and a global
``row_number()`` window collapses everything onto one partition — a
non-starter at 100 TB. We use the standard two-pass partition-offset
technique instead:

1. rank rows *within* each partition (narrow, no shuffle),
2. collect the tiny per-partition counts to the driver,
3. add the cumulative offset per partition (broadcast map join).

Cost: one extra count-per-partition job over the data; no shuffle of
the payload at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_dense_seq(
    df: DataFrame,
    seq_col: str = "seq",
    start: int = 0,
    order_within: Column | None = None,
) -> DataFrame:
    """Add a dense, gap-free ``seq_col`` starting at ``start``.

    Ordering is partition-major (partition 0's rows first, then
    partition 1's, ...); within a partition rows keep their physical
    order unless ``order_within`` is given. This matches a log's
    arrival-order semantics: the assignment is deterministic for a
    deterministic input plan.
    """
    pid = F.spark_partition_id()
    tie = order_within if order_within is not None else F.monotonically_increasing_id()
    w = Window.partitionBy(pid).orderBy(tie)
    # Materialize before the counts collect: the counts job and the
    # final assignment must observe the SAME partition layout; without
    # the checkpoint a nondeterministic upstream (any shuffle re-order,
    # repartitionByRange boundary resampling) could move rows between
    # partitions across the two jobs and silently corrupt the seqs —
    # and the upstream would be computed twice besides.
    staged = (
        df.withColumn("__pid", pid)
        .withColumn("__rank", F.row_number().over(w) - F.lit(1))
        .localCheckpoint(eager=False)
    )
    counts = staged.groupBy("__pid").count().collect()
    offsets = {}
    acc = start
    for row in sorted(counts, key=lambda r: r["__pid"]):
        offsets[row["__pid"]] = acc
        acc += row["count"]
    mapping = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    return (
        staged.withColumn(seq_col, (mapping[F.col("__pid")] + F.col("__rank")).cast("long"))
        .drop("__pid", "__rank")
    )
