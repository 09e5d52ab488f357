#!/usr/bin/env python
"""Scaling-curve probe: time a representative operator set across the
three testdata scale factors (100× data span) and print a markdown
table of runtimes + the 0.1/0.01 ratio. The point is EVIDENCE for the
per-family scaling arguments in SCALE.md: an operator whose plan is
scale-safe should grow ~linearly in data (ratio ≈ 10 or less, since
fixed job overhead dominates at small SFs), never quadratically.

Usage: python scripts/scaling_probe.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

DEFAULT = [
    "dedup_exact",
    "dedup_jaccard",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_clusters",
    "dedup_cross_corpus",
    "corpus_curation",
    "training_data",
    "ann_topk",
    "ann_ivf",
    "search_bm25",
    "text_langid",
    "chunk_documents",
    "pii_redact",
    "events_resample",
    "pack_sequences",
    "tpch_q1",
    "tpch_q5",
]


def main() -> None:
    import __spark_entry__ as entry
    from margaret_spark.session import get_spark

    names = sys.argv[1:] or DEFAULT
    spark = get_spark(app_name="scaling-probe", cpus="32")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()

    print("| query | sf0.001 s | sf0.01 s | sf0.1 s | 0.1/0.01 ratio |")
    print("|---|---|---|---|---|")
    for name in names:
        fn = qs[name]
        times = []
        for sf in SFS:
            fn(spark, sf).write.format("noop").mode("overwrite").save()  # warm
            best = None
            for _ in range(2):
                t0 = time.time()
                fn(spark, sf).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None or dt < best else best
            times.append(best)
        ratio = times[2] / times[1] if times[1] > 0 else float("nan")
        print(
            f"| {name} | {times[0]:.2f} | {times[1]:.2f} | {times[2]:.2f} "
            f"| {ratio:.1f}× |"
        )


if __name__ == "__main__":
    main()
