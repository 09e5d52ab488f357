"""Approximate-sketch queries: each sketch result is bounded against
its exact twin (the rows-only analogue of the minhash-vs-jaccard
verification pattern)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def test_approx_distinct_within_rsd(spark):
    approx = {
        r.event_type: r.approx_users
        for r in entry.q_events_approx_distinct(spark, SF).collect()
    }
    exact = {
        r.event_type: r.distinct_count
        for r in entry.q_events_distinct_users(spark, SF).collect()
    }
    assert set(approx) == set(exact)
    for et, n in exact.items():
        # rsd=0.01 → generous 5% acceptance band
        assert abs(approx[et] - n) <= max(2, 0.05 * n), (et, approx[et], n)


def test_approx_quantiles_close_to_exact(spark):
    approx = {
        r.event_type: r.approx_pcts
        for r in entry.q_events_approx_quantiles(spark, SF).collect()
    }
    exact = {
        r.event_type: (r.p50, r.p95)
        for r in entry.q_events_quantiles(spark, SF).collect()
    }
    assert set(approx) == set(exact)
    for et, (p50, p95) in exact.items():
        a50, a95, _a99 = approx[et]
        spread = abs(p95 - p50) + 1e-9
        assert abs(a50 - p50) <= 0.1 * spread
        assert abs(a95 - p95) <= 0.1 * spread


def test_sketch_plans_single_narrow_shuffle(spark):
    plan = (
        entry.q_events_approx_distinct(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # partial HLL map-side, one exchange on the group key
    assert plan.count("Exchange") == 1
