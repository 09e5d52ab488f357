#!/usr/bin/env python
"""Generate the plan-facts table in SCALE.md: structural facts about
every contract query's physical plan (shuffle count, join strategies,
pushed filters, Python eval nodes), extracted with plans.inspect so
the scale claims stay mechanically checkable."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    import __spark_entry__ as entry
    from margaret_spark.plans.inspect import plan_summary
    from margaret_spark.session import get_spark

    spark = get_spark(app_name="plan-report", cpus="8", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    print("| query | shuffles | broadcast joins | SMJ | scans | pushed filters | arrow/python evals |")
    print("|---|---|---|---|---|---|---|")
    for name, fn in entry.queries().items():
        try:
            s = plan_summary(fn(spark, SF))
        except Exception as e:  # pragma: no cover
            print(f"| {name} | ERROR: {e} | | | | | |")
            continue
        pushed = sum(1 for p in s["pushed_filters"] if p.strip())
        print(
            f"| {name} | {s['shuffles']} | {s['broadcast_joins']} | "
            f"{s['sortmerge_joins']} | {s['scans']} | {pushed} | "
            f"{s['arrow_evals']}/{s['python_evals']} |"
        )


if __name__ == "__main__":
    main()
