#!/usr/bin/env python
"""Isolated per-query timing probe: warmup + best-of-N noop-sink
executions per named query, bench.py's exact methodology, printed as
one JSON line. For before/after evidence during optimization rounds.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/time_queries.py [-n N] q1 q2 ...

A/B mode (r12, VERDICT r11 ask #8 — this box shows ±50% inter-session
performance episodes, so single-session before/after cells are not
trustworthy; the variance-robust instrument is alternating fresh
sessions in BOTH orders):

    python scripts/time_queries.py --ab /path/to/before_tree [-n N] q1 ...

runs four fresh probe sessions in the order A B B A (A = this tree,
B = the given tree, typically a pristine pre-change worktree), each a
subprocess running this script in single-tree mode, and reports the
per-query best of each variant's two sessions plus the B/A ratio.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ab_main(other: str, runs: int, names: list[str]) -> None:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    order = [("A", here), ("B", other), ("B", other), ("A", here)]
    sessions = []
    for tag, tree in order:
        script = os.path.join(tree, "scripts", "time_queries.py")
        print(f"## session {tag} ({tree})", file=sys.stderr, flush=True)
        out = subprocess.run(
            [sys.executable, script, "-n", str(runs)] + names,
            cwd=tree,
            stdout=subprocess.PIPE,
            text=True,
            check=True,
        ).stdout
        line = [l for l in out.splitlines() if l.strip().startswith("{")][-1]
        sessions.append({"variant": tag, "tree": tree, **json.loads(line)})
    best = {"A": {}, "B": {}}
    for s in sessions:
        for q, v in s["queries"].items():
            cur = best[s["variant"]].get(q)
            best[s["variant"]][q] = v if cur is None or v < cur else cur
    ratio = {
        q: round(best["B"][q] / best["A"][q], 3) if best["A"][q] else None
        for q in best["A"]
    }
    print(
        json.dumps(
            {
                "mode": "ab_both_orders",
                "order": "A B B A",
                "runs": runs,
                "best_A_this_tree": best["A"],
                "best_B_other_tree": best["B"],
                "speedup_B_over_A": ratio,
                "sessions": sessions,
            }
        )
    )


def main() -> None:
    args = sys.argv[1:]
    other = None
    if args and args[0] == "--ab":
        other = args[1]
        args = args[2:]
    runs = 3
    if args and args[0] == "-n":
        runs = int(args[1])
        args = args[2:]
    if other is not None:
        _ab_main(other, runs, args)
        return
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
