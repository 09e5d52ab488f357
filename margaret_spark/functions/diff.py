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


def scd2_merge(
    current: DataFrame,
    changes: DataFrame,
    keys: str | Sequence[str],
    version,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
) -> DataFrame:
    """Slowly-changing-dimension (type 2) merge: apply a change batch
    to a history table, closing superseded rows instead of
    overwriting them — the table-level versioning a corpus pipeline
    uses to answer "what did this document say at crawl T" (the log's
    snapshot layer gives whole-log time travel; this gives per-key
    validity intervals on any relational table).

    ``current`` is the history: (keys..., attrs..., valid_from,
    valid_to) with ``valid_to`` NULL marking the open row per key.
    ``changes`` carries (keys..., attrs...) — the new state of every
    key present in the batch. Semantics per change row:

    - key not in the open set  → INSERT (valid_from=version, open);
    - open row with identical non-key content → no-op;
    - open row with different content → CLOSE it (valid_to=version)
      and INSERT the new open row.

    Keys absent from the batch are untouched (a delete is expressed
    as a change to a tombstone attribute, keeping the merge
    append-only). Row equality is the same length-prefixed sha2
    content hash as :func:`table_diff` — NULL-safe, engine-portable.

    CONTRACT: ``changes`` must be key-unique — one row per key, the
    key's final state for this version (``stream_scd2`` enforces this
    with a max-by-seq pre-aggregation). A batch carrying the same key
    twice would fan the full-outer join out and close/insert that key
    once per duplicate.

    Scale shape: closed history is untouched (filter + union — never
    shuffled); the open set and the batch reduce to (key, hash,
    payload) and meet in ONE full-outer join on the key; each output
    class is a projection of that join. At 100 TB the cost is the
    open-set join, proportional to live keys, not to history depth."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    attrs = [
        c
        for c in current.columns
        if c not in set(keys) | {valid_from_col, valid_to_col}
    ]
    if sorted(changes.columns) != sorted(keys + attrs):
        raise ValueError(
            f"changes must have exactly keys+attrs {sorted(keys + attrs)}; "
            f"got {sorted(changes.columns)}"
        )
    vto_type = current.schema[valid_to_col].dataType
    closed = current.where(F.col(valid_to_col).isNotNull())
    open_ = current.where(F.col(valid_to_col).isNull())

    o = open_.select(
        *[F.col(k).alias(f"__ko_{k}") for k in keys],
        F.struct(*[F.col(c) for c in attrs], F.col(valid_from_col)).alias("__orow"),
        row_hash(open_.select(*keys, *attrs), exclude=keys).alias("__ho"),
    )
    c = changes.select(
        *[F.col(k).alias(f"__kc_{k}") for k in keys],
        F.struct(*[F.col(a) for a in attrs]).alias("__crow"),
        row_hash(changes, exclude=keys).alias("__hc"),
    )
    cond = None
    for k in keys:
        eq = F.col(f"__ko_{k}").eqNullSafe(F.col(f"__kc_{k}"))
        cond = eq if cond is None else cond & eq
    j = o.join(c, cond, "full_outer").localCheckpoint(eager=False)

    key_out = [
        F.coalesce(F.col(f"__ko_{k}"), F.col(f"__kc_{k}")).alias(k) for k in keys
    ]
    changed = F.col("__ho").isNotNull() & F.col("__hc").isNotNull() & (
        F.col("__ho") != F.col("__hc")
    )
    # open rows that survive as-is: no matching change, or identical
    kept = j.where(
        F.col("__ho").isNotNull()
        & (F.col("__hc").isNull() | (F.col("__ho") == F.col("__hc")))
    ).select(
        *key_out,
        *[F.col(f"__orow.{a}").alias(a) for a in attrs],
        F.col(f"__orow.{valid_from_col}").alias(valid_from_col),
        F.lit(None).cast(vto_type).alias(valid_to_col),
    )
    closed_now = j.where(changed).select(
        *key_out,
        *[F.col(f"__orow.{a}").alias(a) for a in attrs],
        F.col(f"__orow.{valid_from_col}").alias(valid_from_col),
        F.lit(version).cast(vto_type).alias(valid_to_col),
    )
    inserted = j.where(F.col("__ho").isNull() | changed).select(
        *key_out,
        *[F.col(f"__crow.{a}").alias(a) for a in attrs],
        F.lit(version)
        .cast(current.schema[valid_from_col].dataType)
        .alias(valid_from_col),
        F.lit(None).cast(vto_type).alias(valid_to_col),
    )
    out_cols = keys + attrs + [valid_from_col, valid_to_col]
    return (
        closed.select(*out_cols)
        .unionByName(kept)
        .unionByName(closed_now)
        .unionByName(inserted)
    )


def scd2_lookup(
    facts: DataFrame,
    history: DataFrame,
    keys: str | Sequence[str],
    at_col: str,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
) -> DataFrame:
    """Point-in-time enrichment against an SCD2 history: each fact row
    picks up the dimension attributes whose validity interval covers
    ``at_col`` (``valid_from <= at < valid_to``, open rows unbounded) —
    the "state of the dimension when the fact happened" join. Facts
    whose key has no version valid at that time keep NULL attributes
    (left join).

    Scale shape: the join is key-EQUI with the interval check as a
    residual predicate, so it hash-partitions on the key like any
    equi-join — per key only that key's (few) versions are scanned;
    nothing resembling an interval cross join exists at any history
    depth."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    attrs = [
        c
        for c in history.columns
        if c not in set(keys) | {valid_from_col, valid_to_col}
    ]
    h = history.select(
        *[F.col(k).alias(f"__hk_{k}") for k in keys],
        *[F.col(a) for a in attrs],
        F.col(valid_from_col).alias("__vf"),
        F.col(valid_to_col).alias("__vt"),
    )
    cond = None
    for k in keys:
        eq = F.col(k) == F.col(f"__hk_{k}")
        cond = eq if cond is None else cond & eq
    cond = (
        cond
        & (F.col(at_col) >= F.col("__vf"))
        & (F.col("__vt").isNull() | (F.col(at_col) < F.col("__vt")))
    )
    return facts.join(h, cond, "left").select(*facts.columns, *attrs)


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
