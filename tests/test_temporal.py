"""asof_join / range_join contract tests (operators/temporal.py).

Hand-computed golden expectations on small frames, plus a
pandas.merge_asof cross-check on a randomized input.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from margaret_spark.operators.temporal import asof_join, range_join


def _trades(spark):
    # (key, t, qty)
    return spark.createDataFrame(
        [("a", 10, 1), ("a", 20, 2), ("a", 35, 3), ("b", 5, 4), ("c", 7, 5)],
        "key string, t long, qty long",
    )


def _quotes(spark):
    # (key, t, px)
    return spark.createDataFrame(
        [("a", 8, 1.0), ("a", 20, 2.0), ("a", 30, 3.0), ("b", 6, 4.0)],
        "key string, t long, px double",
    )


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_asof_backward_inclusive(spark):
    out = asof_join(_trades(spark), _quotes(spark), on="t", by="key")
    assert _rows(out, "key", "t", "qty", "t_matched", "px") == [
        ("a", 10, 1, 8, 1.0),
        ("a", 20, 2, 20, 2.0),  # exact match included
        ("a", 35, 3, 30, 3.0),
        ("b", 5, 4, None, None),  # quote is later — unmatched survives
        ("c", 7, 5, None, None),  # key with no quotes at all
    ]


def test_asof_backward_exclusive(spark):
    out = asof_join(
        _trades(spark), _quotes(spark), on="t", by="key", allow_exact_matches=False
    )
    assert _rows(out, "key", "t", "t_matched") == [
        ("a", 10, 8),
        ("a", 20, 8),  # the t=20 quote no longer qualifies
        ("a", 35, 30),
        ("b", 5, None),
        ("c", 7, None),
    ]


def test_asof_carries_the_row_not_per_column_fills(spark):
    """A NULL inside the matched reference row must stay NULL — the
    match is row-atomic. Independent per-column last(ignorenulls)
    carries would backfill r2's NULL `a` from the OLDER r1 and emit a
    (a=1, b=2) tuple no reference row ever held."""
    left = spark.createDataFrame([("k", 25)], "key string, t long")
    right = spark.createDataFrame(
        [("k", 10, 1, None), ("k", 20, None, 2)],
        "key string, t long, a long, b long",
    )
    out = asof_join(left, right, on="t", by="key").collect()
    assert [(r["t_matched"], r["a"], r["b"]) for r in out] == [(20, None, 2)]

    # unmatched probe: every carried column NULL, not a partial fill
    early = spark.createDataFrame([("k", 5)], "key string, t long")
    out2 = asof_join(early, right, on="t", by="key").collect()
    assert [(r["t_matched"], r["a"], r["b"]) for r in out2] == [(None, None, None)]


def test_asof_forward_and_tolerance(spark):
    fwd = asof_join(_trades(spark), _quotes(spark), on="t", by="key", direction="forward")
    assert _rows(fwd, "key", "t", "t_matched") == [
        ("a", 10, 20),
        ("a", 20, 20),
        ("a", 35, None),
        ("b", 5, 6),
        ("c", 7, None),
    ]
    tol = asof_join(
        _trades(spark), _quotes(spark), on="t", by="key", tolerance=2
    )
    assert _rows(tol, "key", "t", "t_matched", "px") == [
        ("a", 10, 8, 1.0),  # gap 2 == tolerance → kept
        ("a", 20, 20, 2.0),
        ("a", 35, None, None),  # gap 5 > tolerance → nulled out
        ("b", 5, None, None),
        ("c", 7, None, None),
    ]


def test_asof_tiebreak_deterministic(spark):
    left = spark.createDataFrame([("a", 10)], "key string, t long")
    right = spark.createDataFrame(
        [("a", 10, 1.0), ("a", 10, 9.0), ("a", 10, 4.0)],
        "key string, t long, px double",
    )
    out = asof_join(left, right, on="t", by="key", tiebreak="px", value_cols=[])
    assert _rows(out, "key", "t", "t_matched") == [("a", 10, 10)]
    # the tiebreak column is itself carried: the winner's px comes back
    out2 = asof_join(
        right.select("key", "t").distinct(), right, on="t", by="key", tiebreak="px"
    )
    assert _rows(out2, "key", "t", "t_matched", "px") == [("a", 10, 10, 9.0)]


def test_asof_matches_pandas_merge_asof(spark):
    import random

    rng = random.Random(7)
    lrows = [("k%d" % rng.randint(0, 4), rng.randint(0, 1000)) for _ in range(200)]
    rrows = [
        ("k%d" % rng.randint(0, 4), rng.randint(0, 1000), float(i))
        for i, _ in enumerate(range(300))
    ]
    # merge_asof demands unique right (key, t): dedup keeping max val,
    # mirrored by tiebreak="val" on the Spark side
    left = spark.createDataFrame(lrows, "key string, t long")
    right = spark.createDataFrame(rrows, "key string, t long, val double")
    out = (
        asof_join(left.distinct(), right, on="t", by="key", tiebreak="val")
        .toPandas()
        .sort_values(["key", "t"])
        .reset_index(drop=True)
    )
    lp = left.distinct().toPandas().sort_values("t")
    rp = (
        right.toPandas()
        .sort_values(["key", "t", "val"])
        .groupby(["key", "t"], as_index=False)
        .last()
        .sort_values("t")
    )
    exp = (
        pd.merge_asof(lp, rp, on="t", by="key", direction="backward")
        .rename(columns={"val": "val_exp"})
        .sort_values(["key", "t"])
        .reset_index(drop=True)
    )
    assert len(out) == len(exp)
    got_vals = [None if pd.isna(v) else v for v in out["val"]]
    exp_vals = [None if pd.isna(v) else v for v in exp["val_exp"]]
    assert got_vals == exp_vals


def test_range_join_bounds(spark):
    left = spark.createDataFrame(
        [("a", 100, 1), ("a", 500, 2), ("b", 100, 3)], "key string, t long, lid long"
    )
    right = spark.createDataFrame(
        [("a", 100, 10), ("a", 150, 11), ("a", 200, 12), ("a", 201, 13), ("b", 350, 14)],
        "key string, rt long, rid long",
    )
    out = range_join(
        left, right, on="t", right_on="rt", lower=0, upper=100, by="key"
    )
    assert _rows(out, "lid", "rid") == [(1, 10), (1, 11), (1, 12)]
    strict = range_join(
        left,
        right,
        on="t",
        right_on="rt",
        lower=0,
        upper=100,
        by="key",
        include_lower=False,
        include_upper=False,
    )
    assert _rows(strict, "lid", "rid") == [(1, 11)]


def test_range_join_negative_window_and_width(spark):
    left = spark.createDataFrame([("a", 1000, 1)], "key string, t long, lid long")
    right = spark.createDataFrame(
        [("a", 940, 20), ("a", 1000, 21), ("a", 1059, 22), ("a", 1061, 23)],
        "key string, rt long, rid long",
    )
    # window [-60, +60] around each left row, finer buckets than span
    out = range_join(
        left, right, on="t", right_on="rt", lower=-60, upper=60, by="key",
        bucket_width=25,
    )
    assert _rows(out, "lid", "rid") == [(1, 20), (1, 21), (1, 22)]


def test_range_join_collision_raises(spark):
    df = spark.createDataFrame([("a", 1, 1)], "key string, t long, x long")
    with pytest.raises(ValueError, match="collide"):
        range_join(df, df, on="t", lower=0, upper=10, by="key")


def test_range_join_matches_plain_join(spark):
    import random

    rng = random.Random(3)
    lrows = [("k%d" % rng.randint(0, 3), rng.randint(0, 10_000), i) for i in range(150)]
    rrows = [("k%d" % rng.randint(0, 3), rng.randint(0, 10_000), i) for i in range(150)]
    left = spark.createDataFrame(lrows, "key string, t long, lid long")
    right = spark.createDataFrame(rrows, "key string, rt long, rid long")
    out = range_join(
        left, right, on="t", right_on="rt", lower=-500, upper=1500, by="key"
    )
    naive = left.join(right, "key").where(
        (F.col("rt") >= F.col("t") - 500) & (F.col("rt") <= F.col("t") + 1500)
    )
    assert _rows(out, "lid", "rid") == _rows(naive, "lid", "rid")


def test_funnel_stages(spark):
    from margaret_spark.operators.temporal import funnel

    rows = [
        # user 1: full ordered funnel
        (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
        # user 2: purchase BEFORE click -> stage stops at click
        (2, 10, "view"), (2, 30, "click"), (2, 20, "purchase"),
        # user 3: click before any view -> only stage 1 (later view,
        # no click after it)
        (3, 20, "view"), (3, 10, "click"),
        # user 4: no view at all -> stage 0
        (4, 10, "click"), (4, 20, "purchase"),
        # user 5: stage binds to the EARLIEST qualifying event
        (5, 10, "view"), (5, 15, "click"), (5, 25, "click"), (5, 20, "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, tsu long, event_type string")
    got = {
        r.user_id: (r.stage, r.view_ts, r.click_ts, r.purchase_ts)
        for r in funnel(
            df, "user_id", "tsu", "event_type", ["view", "click", "purchase"]
        ).collect()
    }
    assert got[1] == (3, 10, 20, 30)
    assert got[2] == (2, 10, 30, None)
    assert got[3] == (1, 20, None, None)
    assert got[4] == (0, None, None, None)
    # user 5: click binds at 15, purchase at 20 follows it
    assert got[5] == (3, 10, 15, 20)


def test_funnel_single_shuffle(spark):
    from margaret_spark.operators.temporal import funnel

    df = spark.createDataFrame(
        [(1, 10, "view")], "user_id long, tsu long, event_type string"
    )
    plan = (
        funnel(df, "user_id", "tsu", "event_type", ["view", "click"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") <= 1, plan


def test_range_join_default_right_on(spark):
    """right_on=None renames right's ordering column apart internally
    (the old fallback always tripped the collision check)."""
    from margaret_spark.operators.temporal import range_join

    left = spark.createDataFrame([(1, 100)], "k long, ts long")
    right = spark.createDataFrame([(1, 105), (1, 200)], "k long, ts long")
    rows = range_join(left, right, on="ts", lower=0, upper=10, by="k").collect()
    assert len(rows) == 1 and rows[0]["ts__right"] == 105


def test_resample_gap_filling(spark):
    """Empty buckets materialize with n=0 / NULL sum; the forward fill
    carries the last occupied bucket's sum across the gap."""
    from margaret_spark.operators.timeseries import resample

    rows = [
        ("a", "2024-01-01 00:10:00", 1.5),
        ("a", "2024-01-01 00:20:00", 2.0),   # same bucket as above
        ("a", "2024-01-01 03:05:00", 7.25),  # buckets 1-2 empty
        ("b", "2024-01-01 05:00:00", 4.0),   # single-bucket key
    ]
    df = spark.createDataFrame(rows, "k string, ts string, v double").select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "v"
    )
    out = {
        (r["k"], r["bucket_start"].hour): (
            r["n_events"], r["sum_value"], r["sum_value_ffill"]
        )
        for r in resample(df, "k", "ts", "v", interval_s=3600).collect()
    }
    assert out[("a", 0)] == (2, 3.5, 3.5)
    assert out[("a", 1)] == (0, None, 3.5)   # gap: materialized + ffilled
    assert out[("a", 2)] == (0, None, 3.5)
    assert out[("a", 3)] == (1, 7.25, 7.25)
    assert out[("b", 5)] == (1, 4.0, 4.0)
    assert len(out) == 5  # b's spine is exactly its own span
    with pytest.raises(ValueError):
        resample(df, "k", "ts", "v", interval_s=0)


def test_resample_chunked_spine_identical(spark, monkeypatch):
    """The two-level (memory-bounded) spine explode yields the exact
    bucket set of a single-level sequence — checked by shrinking the
    chunk below the span so every chunk path (full chunks, the short
    final chunk, chunk == 1 bucket) is exercised."""
    from margaret_spark.operators import timeseries

    rows = [("a", 0.0, 1.0), ("a", 25.9 * 3600, 2.0), ("b", 7200.0, 3.0)]
    df = spark.createDataFrame(rows, "k string, sec double, v double").select(
        "k", F.timestamp_seconds("sec").alias("ts"), "v"
    )

    def run():
        return sorted(
            (r["k"], r["bucket_start"], r["n_events"], r["sum_value_ffill"])
            for r in timeseries.resample(df, "k", "ts", "v", interval_s=3600).collect()
        )

    base = run()
    assert len(base) == 27  # a: hours 0..25 dense, b: 1 bucket
    for chunk in (1, 4, 7):
        monkeypatch.setattr(timeseries, "_SPINE_CHUNK", chunk)
        assert run() == base, f"chunk={chunk} diverged"
