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
    """Cheap structural facts about the physical plan. Node counts are
    taken from the formatted explain's numbered detail entries
    (``(n) NodeName``) so each operator counts exactly once."""
    s = explain_str(df)
    nodes = re.findall(r"^\(\d+\)\s+(\w[\w ]*?)(?:\s*\[codegen|\s*$)", s, re.M)
    count = lambda name: sum(1 for n in nodes if n.startswith(name))
    return {
        "pushed_filters": re.findall(r"PushedFilters: \[([^\]]*)\]", s),
        "broadcast_joins": count("BroadcastHashJoin")
        + count("BroadcastNestedLoopJoin"),
        "sortmerge_joins": count("SortMergeJoin"),
        "shuffles": count("Exchange"),
        "codegen_stages": len(set(re.findall(r"codegen id : (\d+)", s))),
        "python_evals": count("BatchEvalPython"),
        # every Arrow-batched Python surface: pandas UDFs, grouped-map,
        # and mapInPandas kernels (the multimodal decode path) — all
        # must be DECLARED by their operator, none slips through
        "arrow_evals": count("ArrowEvalPython")
        + count("FlatMapGroupsInPandas")
        + count("MapInPandas"),
        "scans": count("Scan parquet"),
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


def assert_no_python_udf(df: DataFrame, allow_arrow: bool = False) -> None:
    """Hot-path discipline: row-at-a-time Python eval (BatchEvalPython)
    is NEVER allowed. Arrow-batched eval (ArrowEvalPython — pandas
    UDFs) is allowed only where the operator declares it: pair-scoring
    kernels that a single codegen expression cannot express without
    blowing the JIT method limit (see functions.vectors)."""
    summary = plan_summary(df)
    n = summary["python_evals"]
    assert n == 0, f"plan contains {n} row-at-a-time Python eval node(s)"
    if not allow_arrow:
        a = summary["arrow_evals"]
        assert a == 0, f"plan contains {a} undeclared ArrowEvalPython node(s)"
