"""Physical-plan introspection: make plan quality testable.

The reference has no optimizer to check; here the optimizer is the
engine, so "did the filter reach the scan", "did the small side
broadcast", "is Python on the hot path" are correctness properties of
this codebase and get asserted in CI like any other behavior.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def plan_summary(df: DataFrame) -> dict:
    """Cheap structural facts about the physical plan."""
    s = explain_str(df)
    return {
        "pushed_filters": re.findall(r"PushedFilters: \[([^\]]*)\]", s),
        "broadcast_joins": len(re.findall(r"BroadcastHashJoin", s)),
        "sortmerge_joins": len(re.findall(r"SortMergeJoin", s)),
        "shuffles": len(re.findall(r"Exchange", s)) - len(re.findall(r"BroadcastExchange", s)),
        "codegen_stages": len(set(re.findall(r"codegen id : (\d+)", s))),
        "python_evals": len(re.findall(r"(BatchEvalPython|ArrowEvalPython)", s)),
        "scans": len(re.findall(r"Scan parquet", s)),
    }


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Assert each fragment appears inside some scan's PushedFilters —
    i.e. Catalyst delivered the predicate to the Parquet reader."""
    s = explain_str(df)
    pushed = " | ".join(re.findall(r"PushedFilters: \[([^\]]*)\]", s))
    for frag in fragments:
        assert frag in pushed, f"filter {frag!r} not pushed; got: {pushed!r}"


def assert_broadcast_join(df: DataFrame, at_least: int = 1) -> None:
    n = plan_summary(df)["broadcast_joins"]
    assert n >= at_least, f"expected ≥{at_least} broadcast joins, plan has {n}"


def assert_no_python_udf(df: DataFrame) -> None:
    """Hot-path discipline: no row-at-a-time or Arrow Python eval nodes
    in the plan (mapInPandas stages are exempt by design — they won't
    appear in plans built from pure column expressions)."""
    n = plan_summary(df)["python_evals"]
    assert n == 0, f"plan contains {n} Python eval node(s)"
