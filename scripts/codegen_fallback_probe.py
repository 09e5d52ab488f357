#!/usr/bin/env python
"""Full-session codegen-fallback + GC probe (VERDICT r9 asks #1/#3).

Runs every queries() entry ONCE, in bench order, at
$SPARK_GRAFT_SF_DIR (default sf0.1), with the JVM log level at WARN
and stderr captured by the caller. Before each query a marker line
``===QUERY <name>===`` is printed to stderr, so the capture file
attributes every JVM warning (in particular the "grows beyond 64 KB"
codegen fallback) to the query whose execution emitted it. Per query
the script also records wall seconds and the driver-JVM GC time delta
(local mode: driver == executors, so this is ALL GC) — the
instrumented run the dedup_embedding in-session-drift hypothesis
needs.

Usage:
    python scripts/codegen_fallback_probe.py 2> /tmp/codegen_probe.err
    python scripts/codegen_fallback_probe.py --attribute /tmp/codegen_probe.err

The first form runs the session and writes per-query wall/GC JSON to
stdout (one line). The second form parses a capture file and prints
every warning line grouped under its query marker.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WATCH = (
    "64 KB",
    "64KB",
    "grows beyond",
    "codegen disabled",
    "Codegen disabled",
    "fallback",
    "Fallback",
)


def attribute(path: str) -> None:
    cur = "<session-setup>"
    hits: dict[str, list[str]] = {}
    with open(path, errors="replace") as f:
        for line in f:
            if line.startswith("===QUERY "):
                cur = line.strip().strip("=").split(" ", 1)[1]
                continue
            if any(w in line for w in WATCH):
                hits.setdefault(cur, []).append(line.rstrip()[:400])
    if not hits:
        print("no watched warning lines found")
        return
    for q, lines in hits.items():
        print(f"\n== {q} ({len(lines)} lines)")
        for ln in lines:
            print("  ", ln)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--attribute":
        attribute(sys.argv[2])
        return
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import bench
    import __spark_entry__ as entry
    from margaret_spark.session import get_spark

    spark = get_spark(app_name="codegen-fallback-probe", cpus=cpus)
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    beans = spark._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()

    def gc_ms() -> int:
        return sum(b.getCollectionTime() for b in beans)

    qs = entry.queries()
    order = [n for n in bench.HEADLINE + bench.HEADLINE_V2 if n in qs]
    order += [n for n in sorted(qs) if n not in set(order)]
    report = {}
    for name in order:
        print(f"===QUERY {name}===", file=sys.stderr, flush=True)
        g0, t0 = gc_ms(), time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        report[name] = {
            "wall_s": round(time.time() - t0, 3),
            "gc_ms": gc_ms() - g0,
        }
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
    print(f"===QUERY <done>===", file=sys.stderr, flush=True)
    print(json.dumps({"sf_dir": sf_dir, "queries": report}))


if __name__ == "__main__":
    main()
