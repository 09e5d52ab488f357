"""Deterministic sharded export — the last step of a training-data
pipeline: split the curated corpus into N output shards whose
membership is a pure function of the document id, then write one
self-contained parquet directory per shard.

Hash sharding (not greedy bin-packing) is the web-scale choice: the
assignment needs no global state, is stable under corpus growth (a
document never migrates when neighbors are added/removed), and is
uniform enough that shard sizes concentrate tightly around the mean
(Chernoff: relative imbalance ~ sqrt(ln N / (rows/N))). The hash is
md5 — byte-identical in every engine — so a SQL oracle reproduces
every assignment exactly, and two tables sharded on the same key stay
co-sharded (text + embeddings land in matching shards).

Scale shape: :func:`assign_shards` is a narrow per-row projection (no
shuffle); :func:`shard_manifest` is one algebraic aggregation carrying
N rows; :func:`write_shards` shuffles once on the shard id and writes
with ``partitionBy`` so each shard is a Hive-partitioned directory —
readable per-shard with partition pruning, parallel across executors,
no driver involvement.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: hex digits of md5 used for the shard draw; 8 digits = 32 bits,
#: enough headroom for any practical shard count while staying exact
#: in a signed 64-bit int on every engine
_HEX_WIDTH = 8


def shard_id(id_col: Column, num_shards: int, salt: str = "") -> Column:
    """Shard index in [0, num_shards) as a pure function of the id:
    first 8 hex digits of md5(salt ∥ id) mod N. ``salt`` derives
    independent sharding universes from the same ids (e.g. a reshuffle
    between epochs)."""
    if num_shards < 1:
        raise ValueError(f"num_shards must be >= 1: {num_shards}")
    hexs = F.substring(
        F.md5(F.concat(F.lit(salt), id_col.cast("string"))), 1, _HEX_WIDTH
    )
    return (F.conv(hexs, 16, 10).cast("long") % F.lit(num_shards)).alias("shard")


def assign_shards(
    df: DataFrame, id_col: str, num_shards: int, salt: str = ""
) -> DataFrame:
    """Add a ``shard`` column. Narrow projection — no shuffle; the
    assignment column costs one md5 per row and pipelines into the
    scan."""
    return df.withColumn("shard", shard_id(F.col(id_col), num_shards, salt))


def shard_manifest(
    df: DataFrame, id_col: str, num_shards: int, size_col: str | None = None,
    salt: str = "",
) -> DataFrame:
    """(shard, n_rows[, total_size]): the balance table an export job
    checks before committing — one algebraic aggregation, N output
    rows. Empty shards (possible at tiny row counts) simply have no
    row."""
    staged = assign_shards(df, id_col, num_shards, salt)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if size_col is not None:
        aggs.append(F.sum(F.col(size_col).cast("long")).alias("total_size"))
    return staged.groupBy("shard").agg(*aggs)


def write_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    num_shards: int,
    salt: str = "",
    max_files_per_shard: int = 1,
) -> None:
    """Write the corpus as ``<path>/shard=K/`` parquet directories.
    One shuffle (repartition on the shard id) so each shard's rows
    co-locate; ``max_files_per_shard`` > 1 spreads a shard over more
    write tasks when single-file shards would be too large (at 100 TB
    with N=1024 shards, one file per shard is ~100 GB — raise this).
    """
    staged = assign_shards(df, id_col, num_shards, salt)
    parts = num_shards * max(int(max_files_per_shard), 1)
    cols = [F.col("shard")] + (
        [F.md5(F.col(id_col).cast("string"))] if max_files_per_shard > 1 else []
    )
    staged.repartition(parts, *cols).write.mode("overwrite").partitionBy(
        "shard"
    ).parquet(path)


def read_shard(spark, path: str, shard: int) -> DataFrame:
    """One shard back, via partition pruning (the scan lists only
    ``shard=K``)."""
    return spark.read.parquet(path).where(F.col("shard") == shard)


def list_shards(path: str) -> list[int]:
    """Shard ids present on disk (driver-side listing of the one
    partition level — N entries, not the file tree). A foreign
    ``shard=<non-integer>`` entry fails loudly with the path named
    (house rule: never let a stray file corrupt or crash a listing
    with a bare parse error)."""
    out = []
    for name in os.listdir(path):
        if not name.startswith("shard="):
            continue
        suffix = name.split("=", 1)[1]
        try:
            out.append(int(suffix))
        except ValueError:
            raise ValueError(
                f"foreign entry in shard layout: {os.path.join(path, name)!r} "
                "(expected shard=<integer>)"
            ) from None
    return sorted(out)


def assign_shards_balanced(
    df: DataFrame,
    id_col: str,
    size_col: str,
    num_shards: int,
) -> DataFrame:
    """(id_col, ``size_col``, shard): SIZE-BALANCED shard assignment —
    sorted round-robin: rows are globally ranked by (size desc, id
    asc) and dealt ``rank % num_shards``. The classic LPT-lite
    heuristic: after each full deal every shard holds one row from
    each size stratum, so the byte skew between any two shards is
    bounded by one maximal item — against hash sharding's
    √-concentration this is the tool when per-shard BYTES must match
    (balanced downstream tasks), at the cost of stability under
    growth (adding rows re-ranks; use :func:`assign_shards` when
    membership stability matters more than balance).

    Scale shape: the global rank is the two-pass partition-offset
    prefix sum (``packing.running_total`` over a ones column keyed by
    a (−size, id) struct) — range partition + per-partition window,
    never a single-partition global window. NULL sizes rank as size 0
    (they still need a shard)."""
    if num_shards < 1:
        raise ValueError(f"num_shards must be >= 1: {num_shards}")
    from margaret_spark.operators.packing import running_total

    staged = df.select(F.col(id_col), F.col(size_col)).select(
        "*",
        F.struct(
            (-F.coalesce(F.col(size_col), F.lit(0))).alias("ns"),
            F.col(id_col).alias("i"),
        ).alias("__ord"),
        F.lit(1).alias("__one"),
    )
    ranked = running_total(staged, "__one", "__ord", "__rk")
    return ranked.select(
        F.col(id_col),
        F.col(size_col),
        ((F.col("__rk") - F.lit(1)) % F.lit(num_shards))
        .cast("long")
        .alias("shard"),
    )
