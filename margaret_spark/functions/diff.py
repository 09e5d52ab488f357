"""Keyed table diff: what changed between two versions of a table —
the data-ops companion to the snapshot layer (``sources/snapshot.py``
captures versions; this compares them).

Rows are compared by a deterministic content hash over the non-key
columns (sorted column order, ``sha2`` over a canonical concat), so
the diff never shuffles whole rows twice: each side reduces to
(key, 32-byte hash), the full outer join on the key classifies every
row as added / removed / changed / unchanged, and the unchanged mass
is filtered before anything wide is materialized.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def row_hash(df: DataFrame, exclude: Sequence[str] = ()) -> Column:
    """Deterministic content hash over the non-excluded columns in
    sorted-name order. NULL and the string 'null' must not collide, so
    every value is length-prefixed before concatenation."""
    cols = sorted(c for c in df.columns if c not in set(exclude))
    parts = []
    for c in cols:
        s = F.col(c).cast("string")
        parts.append(
            F.when(s.isNull(), F.lit("\x00")).otherwise(
                F.concat(F.length(s).cast("string"), F.lit(":"), s)
            )
        )
    return F.sha2(F.concat_ws("|", *parts), 256)


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: str | Sequence[str],
) -> DataFrame:
    """(keys..., status): 'added' (key only in ``new``), 'removed'
    (only in ``old``), 'changed' (both, different non-key content).
    Unchanged rows are dropped — at scale the diff output is small
    even when the inputs are not, and nothing wider than
    (key, hash) crosses the shuffle."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    o = old.select(
        *[F.col(k).alias(f"__ko_{k}") for k in keys],
        row_hash(old, exclude=keys).alias("__ho"),
    )
    n = new.select(
        *[F.col(k).alias(f"__kn_{k}") for k in keys],
        row_hash(new, exclude=keys).alias("__hn"),
    )
    # null-SAFE key equality: a NULL-keyed row present in both
    # versions must match itself, not surface as a phantom
    # added+removed pair (plain equi-join drops NULL key matches)
    cond = None
    for k in keys:
        c = F.col(f"__ko_{k}").eqNullSafe(F.col(f"__kn_{k}"))
        cond = c if cond is None else cond & c
    joined = o.join(n, cond, "full_outer")
    return (
        joined.select(
            *[
                F.coalesce(F.col(f"__ko_{k}"), F.col(f"__kn_{k}")).alias(k)
                for k in keys
            ],
            F.when(F.col("__ho").isNull(), F.lit("added"))
            .when(F.col("__hn").isNull(), F.lit("removed"))
            .when(F.col("__ho") != F.col("__hn"), F.lit("changed"))
            .alias("status"),
        )
        .where(F.col("status").isNotNull())
    )
