#!/usr/bin/env python
"""Phase profile of suffix_repeats at $SPARK_GRAFT_SF_DIR (r12): wall
time per driver-visible phase, obtained by timestamping every
collect-bearing helper (monkeypatched) and the final noop sink. Also
prints the per-round ranked-row counts (the singleton-freezing
shrinkage evidence)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qname = sys.argv[1] if len(sys.argv) > 1 else "dedup_repeated_substrings"

    import margaret_spark.functions.seqassign as sq
    from margaret_spark.session import get_spark

    spark = get_spark(app_name="profile-suffix")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    marks = []

    def wrap(name, fn):
        def inner(*a, **k):
            t0 = time.time()
            r = fn(*a, **k)
            extra = ""
            if isinstance(r, tuple) and len(r) == 3:
                extra = f" n_flagged={r[1]} n_rows={r[2]}"
            marks.append((name, time.time() - t0, extra))
            return r

        return inner

    sq.with_class_rank_total = wrap("round_rank", sq.with_class_rank_total)
    sq.with_dense_seq_total = wrap("dense_seq", sq.with_dense_seq_total)
    sq.with_first_index_rank_total = wrap(
        "first_index", sq.with_first_index_rank_total
    )

    import __spark_entry__ as entry

    qs = entry.queries()
    for it in range(2):
        marks.clear()
        t0 = time.time()
        df = qs[qname](spark, sf_dir)
        t_build = time.time() - t0
        t1 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t_sink = time.time() - t1
        print(f"== iter {it}: build={t_build:.2f}s sink={t_sink:.2f}s "
              f"total={t_build + t_sink:.2f}s")
        for name, dt, extra in marks:
            print(f"   {name}: {dt:.2f}s{extra}")
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()


if __name__ == "__main__":
    main()
# (probe extension appended at runtime via env var PROFILE_COLLECTS)
