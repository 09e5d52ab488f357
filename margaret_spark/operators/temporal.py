"""Temporal joins: as-of (point-in-time) and bounded range (interval)
joins over an ordering column.

The reference's query algebra iterates one log in seq order
(`qry.go:10-113`); correlating TWO ordered streams ("most recent
reference row at or before each probe row") is outside its surface but
essential for event/feature pipelines, so we add it Spark-first.

Scale notes:
- ``asof_join`` is the union+window formulation: tag both inputs,
  union, and carry the reference payload forward with
  ``last(..., ignorenulls)`` over one window partitioned by the
  equality keys. One shuffle on the keys, zero row explosion — unlike
  the naive ``left.on >= right.on`` theta-join, whose intermediate is
  O(|probe|·|reference|) per key. A downstream groupBy on the same
  keys reuses the window's hash partitioning (no second exchange).
- ``range_join`` buckets the ordering column so a bounded-interval
  predicate becomes an equi-join on (keys..., bucket): the reference
  side lands in ``floor(on / width)``; each probe row explodes to the
  few buckets its interval covers (≤ 2 when ``width`` defaults to the
  interval length). Per-task pair counts stay bounded even for hot
  keys, and with ``by=None`` it is the scale path where a pure
  theta-join would be a cartesian product.
All bucket/ordering arithmetic stays in 64-bit integer expressions —
epoch-nano/micro values exceed 2^53, so double-typed ``floor(x / w)``
would corrupt bucket ids.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "funnel", "range_join"]


def _as_list(v: str | Sequence[str] | None) -> list[str]:
    if v is None:
        return []
    if isinstance(v, str):
        return [v]
    return list(v)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | Sequence[str] | None = None,
    direction: str = "backward",
    tolerance: int | float | None = None,
    value_cols: Sequence[str] | None = None,
    suffix: str = "_matched",
    allow_exact_matches: bool = True,
    tiebreak: str | None = None,
) -> DataFrame:
    """For every left row, attach the single right row closest in the
    ``on`` ordering (at-or-before for ``backward``, at-or-after for
    ``forward``), optionally within ``tolerance``, matching pandas
    ``merge_asof`` / SQL ``ASOF JOIN`` semantics (left outer: unmatched
    probe rows survive with nulls).

    ``on`` must exist in both inputs (numeric or timestamp; use integer
    epoch units for exactness). ``by`` are equality keys — with
    ``by=None`` the window is a single partition, correct but not the
    scale path. The matched ordering value lands in ``{on}{suffix}``;
    carried right columns (``value_cols``, default all non-key right
    columns) keep their names unless they collide with a left column,
    in which case they get ``suffix``. Among right rows tied on
    (keys, on), the one with the greatest ``tiebreak`` wins; without a
    tiebreak the choice is arbitrary (dedup the reference side first
    if that matters).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = _as_list(by)
    carried = _as_list(value_cols)
    if value_cols is None:
        carried = [c for c in right.columns if c not in (*keys, on)]
    left_payload = [c for c in left.columns if c not in (*keys, on)]
    out_names = {
        c: (c + suffix if c in left.columns or c == on else c) for c in carried
    }

    # Tag and align the two inputs for a union: shared (keys, on, side,
    # tiebreak), left payload nulled on right rows and vice versa.
    matched_on = on + suffix
    tb = "__tb"
    lhs = left.select(
        *keys,
        F.col(on),
        F.lit(1).alias("__side"),
        F.lit(None)
        .cast("long" if tiebreak is None else dict(right.dtypes)[tiebreak])
        .alias(tb),
        *[F.col(c) for c in left_payload],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(out_names[c]) for c in carried],
        F.lit(None).cast(dict(right.dtypes)[on]).alias(matched_on),
    )
    rhs = right.select(
        *keys,
        F.col(on),
        F.lit(0).alias("__side"),
        (F.lit(None).cast("long") if tiebreak is None else F.col(tiebreak)).alias(tb),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left_payload],
        *[F.col(c).alias(out_names[c]) for c in carried],
        F.col(on).alias(matched_on),
    )
    unioned = lhs.unionByName(rhs)

    # Tie ordering encodes inclusivity: for an inclusive backward match
    # a reference row at the probe's exact `on` must sort BEFORE the
    # probe row so the running last() sees it; exclusive puts it after.
    asc = direction == "backward"
    on_order = F.col(on).asc() if asc else F.col(on).desc()
    side_rank = F.when(F.col("__side") == 0, F.lit(0 if allow_exact_matches else 2)).otherwise(F.lit(1))
    w = (
        Window.partitionBy(*keys)
        .orderBy(on_order, side_rank.asc(), F.col(tb).asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Carry the matched reference row as ONE struct, not per-column
    # lasts: a NULL inside a carried column must stay that ROW's NULL —
    # independent per-column last(ignorenulls) would fill it from an
    # OLDER reference row and emit a tuple no reference row ever held
    # (pandas merge_asof matches the row, not each column). The struct
    # is NULL on probe rows and non-null on every reference row, so
    # one last(ignorenulls) pass finds the as-of row and its presence
    # doubles as the matched? flag (matched_on is non-null by
    # construction on reference rows). Bonus: one window pass instead
    # of 1 + len(carried).
    carry = [matched_on] + [out_names[c] for c in carried]
    ref_row = F.when(
        F.col("__side") == 0, F.struct(*[F.col(c) for c in carry])
    )
    filled = unioned.select(
        "*", F.last(ref_row, ignorenulls=True).over(w).alias("__m")
    ).where(F.col("__side") == 1)

    gap = (
        F.col(on) - F.col(f"__m.{matched_on}")
        if direction == "backward"
        else F.col(f"__m.{matched_on}") - F.col(on)
    )
    in_tol = (
        F.lit(True) if tolerance is None else gap <= F.lit(tolerance)
    )
    matched = F.col("__m").isNotNull() & in_tol
    return filled.select(
        *keys,
        F.col(on),
        *left_payload,
        *[F.when(matched, F.col(f"__m.{c}")).alias(c) for c in carry],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    lower: int,
    upper: int,
    by: str | Sequence[str] | None = None,
    right_on: str | None = None,
    include_lower: bool = True,
    include_upper: bool = True,
    bucket_width: int | None = None,
) -> DataFrame:
    """All (left, right) pairs with ``right_on - left_on`` in
    [lower, upper] (bounds optionally exclusive), equi-constrained on
    ``by``. Inner join: probe rows with no match drop out.

    ``on``/``right_on`` must be integer-typed (epoch micros/nanos);
    ``lower < upper`` in the same units. ``bucket_width`` defaults to
    the interval length, so each probe row covers at most two buckets;
    pass a smaller width to trade explode factor for finer join keys
    on very hot equality keys.
    """
    if upper <= lower:
        raise ValueError("upper must exceed lower")
    width = int(bucket_width) if bucket_width is not None else int(upper - lower)
    if width <= 0:
        raise ValueError("bucket_width must be positive")
    keys = _as_list(by)
    if right_on is None:
        # the naive fallback r_on = on could never work: right then
        # necessarily carries a column named `on`, which always tripped
        # the collision check below — rename it apart internally (the
        # output carries the suffixed name)
        if on not in right.columns:
            raise ValueError(
                f"right has no column {on!r}; pass right_on explicitly"
            )
        r_on = f"{on}__right"
        right = right.withColumnRenamed(on, r_on)
    else:
        r_on = right_on
    collisions = {
        c for c in right.columns if c in left.columns and c not in keys
    }
    if collisions:
        raise ValueError(
            f"right columns collide with left: {sorted(collisions)}; "
            "alias them before joining"
        )

    # floor-division buckets in pure integer arithmetic (pmod keeps the
    # floor semantics for negative epochs; `div` alone truncates to 0)
    def fdiv(col: str, w: int) -> Column:
        return F.expr(f"(({col} - pmod({col}, {w})) div {w})")

    rhs = right.withColumn("__bkt", fdiv(r_on, width))
    lo_b = f"(({on} + {int(lower)}) - pmod(({on} + {int(lower)}), {width})) div {width}"
    hi_b = f"(({on} + {int(upper)}) - pmod(({on} + {int(upper)}), {width})) div {width}"
    lhs = left.select(
        "*", F.explode(F.expr(f"sequence({lo_b}, {hi_b})")).alias("__bkt")
    )

    lo_cmp = F.col(r_on) >= F.col(on) + F.lit(int(lower)) if include_lower else F.col(
        r_on
    ) > F.col(on) + F.lit(int(lower))
    hi_cmp = F.col(r_on) <= F.col(on) + F.lit(int(upper)) if include_upper else F.col(
        r_on
    ) < F.col(on) + F.lit(int(upper))
    return (
        lhs.join(rhs, on=[*keys, "__bkt"])
        .where(lo_cmp & hi_cmp)
        .drop("__bkt")
    )


def funnel(
    df: DataFrame,
    by: str,
    on: str,
    type_col: str,
    stages: Sequence[str],
) -> DataFrame:
    """Ordered funnel progression per entity: stage k is reached when
    a ``stages[k]`` event exists STRICTLY AFTER the event that reached
    stage k-1 (earliest-completion semantics: each stage binds to the
    earliest qualifying event, which maximizes the reachable depth).

    Returns (by, stage, <name>_ts...) for every entity — ``stage`` is
    the deepest stage index reached (0 = none), and each ``<name>_ts``
    is that stage's binding event time (NULL once the funnel broke).

    Scale shape: one shuffle on ``by``; each stage is an unbounded
    ``min`` window over the same partitioning (no sort, no join, no
    row explosion), so k funnel stages cost k window passes over one
    exchange — not k self-joins."""
    if not stages:
        raise ValueError("stages must be non-empty")
    w = Window.partitionBy(by)
    cur = df.select(by, on, type_col)
    prev_ts = None
    for idx, ev in enumerate(stages):
        cond = F.col(type_col) == ev
        if prev_ts is not None:
            cond = cond & (F.col(on) > F.col(prev_ts))
        name = f"__t{idx}"
        cur = cur.withColumn(name, F.min(F.when(cond, F.col(on))).over(w))
        prev_ts = name
    agg = cur.groupBy(by).agg(
        *[F.min(f"__t{i}").alias(f"__t{i}") for i in range(len(stages))]
    )
    # deepest reached stage: build the CASE ascending so the last
    # (deepest) WHEN is outermost — t_k non-null implies t_{k-1}
    # non-null, so the first matching branch is the deepest stage
    expr = F.lit(0)
    for idx in range(len(stages)):
        expr = F.when(F.col(f"__t{idx}").isNotNull(), F.lit(idx + 1)).otherwise(expr)
    return agg.select(
        by,
        expr.cast("int").alias("stage"),
        *[
            F.col(f"__t{i}").cast("long").alias(f"{stages[i]}_ts")
            for i in range(len(stages))
        ],
    )


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
) -> DataFrame:
    """Weekly cohort retention matrix: users are cohorted by the ISO
    week of their first activity; each (cohort, week-offset) cell
    counts the cohort's users active that week — the standard
    retention triangle.

    Output: (cohort_week date, week_offset int, n_users long).

    Scale shape: one distinct over (user, week) — shuffle keyed on the
    user — then a per-user min and a join back, both keyed on the same
    user column so they reuse that exchange's partitioning, and a
    final small aggregation on (cohort, offset). No window over the
    event stream; nothing keyed on time alone (which would put a whole
    week in one task)."""
    wk = F.to_date(F.date_trunc("week", F.col(ts_col))).alias("wk")
    weekly = df.select(F.col(user_col).alias("u"), wk).distinct()
    first = weekly.groupBy("u").agg(F.min("wk").alias("cohort_week"))
    joined = weekly.join(first, "u")
    return (
        joined.groupBy(
            "cohort_week",
            (F.datediff(F.col("wk"), F.col("cohort_week")) / F.lit(7))
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )
