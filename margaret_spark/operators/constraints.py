"""Declarative data-quality constraints (the Deequ-style check pass a
pipeline runs before trusting a table): not-null, uniqueness, range,
regex-match, set-membership, and referential integrity, reported as
one (rule, column, violations, total, ok) row each.

Scale shape: every row-local rule (not_null / range / regex / in_set)
and the uniqueness check compile into ONE aggregation over a single
scan — violations are conditional sums and uniqueness is
count − approx-free exact countDistinct, all map-side combinable.
Referential-integrity rules each add one left-anti join against the
(broadcastable) reference keys. The report is a handful of rows
regardless of input size.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> tuple:
    return ("not_null", col)


def unique(col: str) -> tuple:
    return ("unique", col)


def in_range(col: str, lo, hi) -> tuple:
    return ("in_range", col, lo, hi)


def matches(col: str, pattern: str) -> tuple:
    return ("matches", col, pattern)


def in_set(col: str, values: Sequence) -> tuple:
    return ("in_set", col, list(values))


def foreign_key(col: str, ref: DataFrame, ref_col: str) -> tuple:
    return ("foreign_key", col, ref, ref_col)


def constraint_report(
    df: DataFrame,
    rules: Sequence[tuple],
    fk_broadcast_rows: int | None = 1_000_000,
) -> DataFrame:
    """One row per rule: (rule, column, violations, total, ok).

    NULL semantics follow SQL checks: range/regex/set rules count only
    non-NULL violating values (pair them with ``not_null`` to also
    forbid NULLs); uniqueness counts every row beyond the first per
    duplicated value (NULLs compare equal to each other here — two
    NULLs are duplicates); foreign keys ignore NULL children.

    ``fk_broadcast_rows`` size-gates the broadcast hint on each
    foreign-key reference side: the hint is applied only when the
    reference has at most that many rows (probed with a
    short-circuiting ``limit(n+1).count()``, so a huge reference costs
    one truncated scan, not a full count). Pass ``None`` to never hint
    and let the optimizer (AQE) choose — a fact-to-fact FK check then
    plans a shuffle anti-join instead of OOMing the driver."""
    if not rules:
        raise ValueError("constraint_report needs at least one rule")
    aggs = []
    labels: list[tuple[str, str]] = []
    fks: list[tuple[str, DataFrame, str]] = []
    for rule in rules:
        kind = rule[0]
        if kind == "not_null":
            _, col = rule
            aggs.append(
                F.sum(F.when(F.col(col).isNull(), 1).otherwise(0))
                .cast("long")
                .alias(f"__v{len(labels)}")
            )
            labels.append((kind, col))
        elif kind == "unique":
            _, col = rule
            # rows beyond the first per value; count_distinct skips
            # NULLs, so add the NULL group's duplicates explicitly
            nulls = F.sum(F.when(F.col(col).isNull(), 1).otherwise(0))
            aggs.append(
                (
                    F.count(col)
                    - F.countDistinct(col)
                    + F.greatest(nulls - F.lit(1), F.lit(0))
                )
                .cast("long")
                .alias(f"__v{len(labels)}")
            )
            labels.append((kind, col))
        elif kind == "in_range":
            _, col, lo, hi = rule
            aggs.append(
                F.sum(
                    F.when(
                        (F.col(col) < F.lit(lo)) | (F.col(col) > F.lit(hi)), 1
                    ).otherwise(0)
                )
                .cast("long")
                .alias(f"__v{len(labels)}")
            )
            labels.append((kind, col))
        elif kind == "matches":
            _, col, pattern = rule
            aggs.append(
                F.sum(
                    F.when(
                        F.col(col).isNotNull() & ~F.col(col).rlike(pattern), 1
                    ).otherwise(0)
                )
                .cast("long")
                .alias(f"__v{len(labels)}")
            )
            labels.append((kind, col))
        elif kind == "in_set":
            _, col, values = rule
            aggs.append(
                F.sum(
                    F.when(
                        F.col(col).isNotNull() & ~F.col(col).isin(*values), 1
                    ).otherwise(0)
                )
                .cast("long")
                .alias(f"__v{len(labels)}")
            )
            labels.append((kind, col))
        elif kind == "foreign_key":
            _, col, ref, ref_col = rule
            fks.append((col, ref, ref_col))
        else:
            raise ValueError(f"unknown constraint kind: {kind!r}")

    spark = df.sparkSession
    parts = []
    if labels:
        row = df.agg(F.count(F.lit(1)).cast("long").alias("__total"), *aggs)
        sel = []
        for i, (kind, col) in enumerate(labels):
            sel.append(
                F.struct(
                    F.lit(kind).alias("rule"),
                    F.lit(col).alias("column"),
                    F.col(f"__v{i}").alias("violations"),
                    F.col("__total").alias("total"),
                )
            )
        parts.append(
            row.select(F.explode(F.array(*sel)).alias("r")).select(
                "r.rule", "r.column", "r.violations", "r.total"
            )
        )
    for col, ref, ref_col in fks:
        child = df.where(F.col(col).isNotNull()).select(F.col(col).alias("__k"))
        keys = ref.select(F.col(ref_col).alias("__k")).distinct()
        if fk_broadcast_rows is not None:
            # Short-circuiting probe: stops scanning once the cap is
            # exceeded, so a fact-sized reference costs ~one partition.
            small = ref.limit(fk_broadcast_rows + 1).count() <= fk_broadcast_rows
            if small:
                keys = F.broadcast(keys)
        orphans = child.join(keys, "__k", "left_anti")
        parts.append(
            orphans.agg(F.count(F.lit(1)).cast("long").alias("violations"))
            .crossJoin(
                df.agg(F.count(F.lit(1)).cast("long").alias("total"))
            )
            .select(
                F.lit("foreign_key").alias("rule"),
                F.lit(col).alias("column"),
                "violations",
                "total",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "rule", "column", "violations", "total",
        (F.col("violations") == 0).alias("ok"),
    )
