"""The query algebra: range / limit / reverse / live / seq-wrap specs.

Reference: ``qry.go:10-113`` declares the spec constructors; each
backend applies them to a cursor struct (``offset2/qry.go:35-99``,
``mem/qry.go:59-116``). Here a spec mutates a :class:`QueryPlan`,
and :func:`apply_plan` compiles the plan onto a DataFrame as
``where / orderBy / limit`` — Catalyst then handles predicate pushdown
to the Parquet scan, limit short-circuiting (TakeOrderedAndProject)
and reverse scans, which is the Spark-native equivalent of the
reference's cursor tricks (``offset2/qry.go:86-122``).

Spec validation mirrors the reference exactly: a second lower bound
errors (``offset2/qry.go:37``), a second upper bound errors
(``offset2/qry.go:55``), and reverse+live is rejected at query build
(``offset2/log.go:418-420``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Iterable, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from margaret_spark.errors import QuerySpecError


@dataclass
class QueryPlan:
    """Compiled query constraints over the ``seq`` domain.

    The reference's IR is the cursor struct itself
    (``offset2/qry.go:13-33``); ours is this plan, compiled to a
    Catalyst logical plan by :func:`apply_plan`.
    """

    gt: Optional[int] = None
    gte: Optional[int] = None
    lt: Optional[int] = None
    lte: Optional[int] = None
    limit: Optional[int] = None
    reverse: bool = False
    live: bool = False
    seqwrap: bool = False

    def lower_set(self) -> bool:
        return self.gt is not None or self.gte is not None

    def upper_set(self) -> bool:
        return self.lt is not None or self.lte is not None

    def validate(self) -> None:
        if self.reverse and self.live:
            raise QuerySpecError("can't do reverse and live (offset2/log.go:418-420)")

    def seq_predicate(self, col: Column) -> Optional[Column]:
        conds = []
        if self.gt is not None:
            conds.append(col > self.gt)
        if self.gte is not None:
            conds.append(col >= self.gte)
        if self.lt is not None:
            conds.append(col < self.lt)
        if self.lte is not None:
            conds.append(col <= self.lte)
        if not conds:
            return None
        out = conds[0]
        for c in conds[1:]:
            out = out & c
        return out

    def matches(self, seq: int) -> bool:
        """Driver-side bound check (used by the in-memory backend and
        live iterators, mirroring ``mem/qry.go:118-164``)."""
        if self.gt is not None and not seq > self.gt:
            return False
        if self.gte is not None and not seq >= self.gte:
            return False
        if self.lt is not None and not seq < self.lt:
            return False
        if self.lte is not None and not seq <= self.lte:
            return False
        return True


class QuerySpec:
    """A constraint applied to a :class:`QueryPlan` (reference
    ``qry.go:29-35``)."""

    def __init__(self, fn: Callable[[QueryPlan], None], name: str = "spec"):
        self._fn = fn
        self.name = name

    def __call__(self, plan: QueryPlan) -> None:
        self._fn(plan)

    def __repr__(self) -> str:
        return f"QuerySpec({self.name})"


def Gt(s: int) -> QuerySpec:
    """Only entries with seq > s (reference ``qry.go:58-63``)."""

    def fn(plan: QueryPlan) -> None:
        if plan.lower_set():
            raise QuerySpecError("lower bound already set")
        plan.gt = int(s)

    return QuerySpec(fn, f"Gt({s})")


def Gte(s: int) -> QuerySpec:
    """Only entries with seq >= s (reference ``qry.go:65-70``)."""

    def fn(plan: QueryPlan) -> None:
        if plan.lower_set():
            raise QuerySpecError("lower bound already set")
        plan.gte = int(s)

    return QuerySpec(fn, f"Gte({s})")


def Lt(s: int) -> QuerySpec:
    """Only entries with seq < s (reference ``qry.go:72-77``)."""

    def fn(plan: QueryPlan) -> None:
        if plan.upper_set():
            raise QuerySpecError("upper bound already set")
        plan.lt = int(s)

    return QuerySpec(fn, f"Lt({s})")


def Lte(s: int) -> QuerySpec:
    """Only entries with seq <= s (reference ``qry.go:79-84``)."""

    def fn(plan: QueryPlan) -> None:
        if plan.upper_set():
            raise QuerySpecError("upper bound already set")
        plan.lte = int(s)

    return QuerySpec(fn, f"Lte({s})")


def Limit(n: int) -> QuerySpec:
    """At most n results, in iteration order (reference ``qry.go:86-91``).

    A negative n means UNLIMITED, mirroring the reference's cursor:
    ``offset2/qry.go:105-108`` only stops at exactly ``limit == 0``,
    so a negative counter decrements forever. (Spark's ``df.limit``
    would instead throw on a negative argument.)"""

    def fn(plan: QueryPlan) -> None:
        plan.limit = int(n) if int(n) >= 0 else None

    return QuerySpec(fn, f"Limit({n})")


def Reverse(yes: bool = True) -> QuerySpec:
    """Iterate newest→oldest (reference ``qry.go:109-113``)."""

    def fn(plan: QueryPlan) -> None:
        plan.reverse = bool(yes)

    return QuerySpec(fn, f"Reverse({yes})")


def Live(yes: bool = True) -> QuerySpec:
    """After draining stored entries, follow new appends
    (reference ``qry.go:93-99``)."""

    def fn(plan: QueryPlan) -> None:
        plan.live = bool(yes)

    return QuerySpec(fn, f"Live({yes})")


def SeqWrap(yes: bool = True) -> QuerySpec:
    """Emit ``(seq, value)`` instead of bare values
    (reference ``qry.go:101-107``)."""

    def fn(plan: QueryPlan) -> None:
        plan.seqwrap = bool(yes)

    return QuerySpec(fn, f"SeqWrap({yes})")


def MergeQuerySpec(*specs: QuerySpec) -> QuerySpec:
    """Fold several specs into one (reference ``qry.go:37-49``)."""

    def fn(plan: QueryPlan) -> None:
        for s in specs:
            s(plan)

    return QuerySpec(fn, f"Merge({', '.join(s.name for s in specs)})")


def ErrorQuerySpec(err: Exception) -> QuerySpec:
    """A spec that fails query construction — used to propagate
    cursor-load errors (reference ``qry.go:51-56``)."""

    def fn(plan: QueryPlan) -> None:
        raise err

    return QuerySpec(fn, "Error")


def build_plan(specs: Iterable[QuerySpec]) -> QueryPlan:
    plan = QueryPlan()
    for spec in specs:
        spec(plan)
    plan.validate()
    return plan


def apply_plan(
    df: DataFrame,
    plan: QueryPlan,
    seq_col: str = "seq",
    ordered: bool = True,
) -> DataFrame:
    """Compile a plan onto a DataFrame.

    ``ordered=True`` adds the seq ordering needed for iteration /
    deterministic limits (Catalyst rewrites sort+limit to
    TakeOrderedAndProject, so a bounded query never global-sorts the
    full log). ``ordered=False`` is for purely relational consumers
    where order is irrelevant and the sort would be a wasted shuffle.
    """
    col = F.col(seq_col)
    pred = plan.seq_predicate(col)
    if pred is not None:
        df = df.where(pred)
    needs_order = ordered or plan.limit is not None
    if needs_order:
        df = df.orderBy(col.desc() if plan.reverse else col.asc())
    if plan.limit is not None:
        df = df.limit(plan.limit)
    return df


def apply_plan_rows(rows, plan: QueryPlan, seq_of=lambda r: r[0]):
    """Apply a plan to an in-memory sequence of rows — the in-memory
    backend's cursor (mirrors ``mem/qry.go:118-164``). ``rows`` must be
    in ascending seq order; yields rows in iteration order."""
    it = reversed(rows) if plan.reverse else iter(rows)
    n = 0
    for r in it:
        if plan.limit is not None and n >= plan.limit:
            return
        s = seq_of(r)
        if not plan.matches(s):
            continue
        n += 1
        yield r
