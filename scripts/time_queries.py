#!/usr/bin/env python
"""Isolated per-query timing probe: warmup + best-of-N noop-sink
executions per named query, bench.py's exact methodology, printed as
one JSON line. For before/after evidence during optimization rounds.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/time_queries.py [-n N] q1 q2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    runs = 3
    if args and args[0] == "-n":
        runs = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry
    from margaret_spark.session import get_spark

    spark = get_spark(app_name="time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    qs = entry.queries()

    out = {}
    for name in args:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"warmup {name}")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = None
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"run{i} {name}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        out[name] = round(best, 3)
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
        print(f"## {name}: {out[name]}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "runs": runs, "queries": out}))


if __name__ == "__main__":
    main()
