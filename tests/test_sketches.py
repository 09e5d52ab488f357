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


# --- Count-Min sketch ------------------------------------------------------


def test_cms_never_undercounts_and_is_exact_when_wide(spark):
    from margaret_spark.functions.cms import cms_estimate, cms_sketch
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(f"k{i % 7}",) for i in range(700)], "k string"
    )
    exact = {r["k"]: r["n"] for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()}
    # narrow sketch: collisions likely -> only the >= bound holds
    sk = cms_sketch(df, "k", depth=3, width=4)
    est = {
        r["k"]: r["est"]
        for r in cms_estimate(sk, df.select("k").distinct(), "k", depth=3, width=4).collect()
    }
    assert all(est[k] >= exact[k] for k in exact)
    # wide sketch over 7 keys: w=512 makes any collision across all 3
    # rows essentially impossible -> exact
    skw = cms_sketch(df, "k", depth=3, width=512)
    estw = {
        r["k"]: r["est"]
        for r in cms_estimate(skw, df.select("k").distinct(), "k", depth=3, width=512).collect()
    }
    assert estw == exact


def test_cms_merge_equals_whole(spark):
    from margaret_spark.functions.cms import cms_merge, cms_sketch

    df = spark.createDataFrame([(f"k{i % 13}", i) for i in range(400)], "k string, i long")
    a = cms_sketch(df.where("i < 200"), "k", depth=4, width=32)
    b = cms_sketch(df.where("i >= 200"), "k", depth=4, width=32)
    whole = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_sketch(df, "k", depth=4, width=32).collect()
    }
    merged = {
        (r["row"], r["bucket"]): r["cnt"] for r in cms_merge(a, b).collect()
    }
    assert merged == whole


def test_cms_unseen_key_estimates_zero_and_nulls_skipped(spark):
    from margaret_spark.functions.cms import cms_estimate, cms_sketch

    df = spark.createDataFrame([("a",), (None,), ("a",)], "k string")
    sk = cms_sketch(df, "k", depth=4, width=128)
    assert sum(r["cnt"] for r in sk.collect()) == 2 * 4  # NULLs skipped
    probes = spark.createDataFrame([("a",), ("zz",)], "k string")
    est = {r["k"]: r["est"] for r in cms_estimate(sk, probes, "k", depth=4, width=128).collect()}
    assert est["a"] == 2
    assert est["zz"] == 0


def test_cms_bad_params(spark):
    import pytest as _pytest

    from margaret_spark.functions.cms import cms_merge, cms_sketch

    df = spark.createDataFrame([("a",)], "k string")
    with _pytest.raises(ValueError):
        cms_sketch(df, "k", depth=0)
    with _pytest.raises(ValueError):
        cms_sketch(df, "k", width=0)
    with _pytest.raises(ValueError):
        cms_merge()


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    """Every inserted key probes TRUE (the Bloom contract); at m=4096,
    k=4, n=200 the false-positive rate over never-inserted keys stays
    far under the analytic bound's slack (~0.1% expected, assert <5%).
    """
    from pyspark.sql import functions as F

    from margaret_spark.functions.bloom import bloom_build, bloom_probe

    ins = spark.range(0, 200).select(F.col("id").cast("string").alias("k"))
    other = spark.range(10_000, 11_000).select(
        F.col("id").cast("string").alias("k")
    )
    bits = bloom_build(ins, "k", m_bits=4096, k_hashes=4)
    got_in = bloom_probe(bits, ins, "k", m_bits=4096, k_hashes=4).collect()
    assert all(r["member"] for r in got_in)
    got_out = bloom_probe(bits, other, "k", m_bits=4096, k_hashes=4).collect()
    fp = sum(1 for r in got_out if r["member"])
    assert fp / len(got_out) < 0.05


def test_bloom_merge_equals_whole_and_nulls_skipped(spark):
    from pyspark.sql import functions as F

    from margaret_spark.functions.bloom import (
        bloom_build,
        bloom_merge,
        bloom_probe,
    )

    a = spark.createDataFrame([("x",), ("y",), (None,)], "k string")
    b = spark.createDataFrame([("z",), ("x",)], "k string")
    whole = spark.createDataFrame([("x",), ("y",), ("z",)], "k string")
    merged = bloom_merge(
        bloom_build(a, "k", 128, 3), bloom_build(b, "k", 128, 3)
    )
    want = {r["bit"] for r in bloom_build(whole, "k", 128, 3).collect()}
    assert {r["bit"] for r in merged.collect()} == want
    # NULL keys have no membership identity: the filter built from `a`
    # alone must not contain any bits beyond x and y's
    only_xy = bloom_build(
        spark.createDataFrame([("x",), ("y",)], "k string"), "k", 128, 3
    )
    assert {r["bit"] for r in bloom_build(a, "k", 128, 3).collect()} == {
        r["bit"] for r in only_xy.collect()
    }
    probed = {
        r["k"]: r["member"]
        for r in bloom_probe(merged, whole, "k", 128, 3).collect()
    }
    assert probed == {"x": True, "y": True, "z": True}


def test_stream_bloom_merged_equals_batch_filter(spark, tmp_path):
    """Multi-batch streaming filter re-unions to exactly the batch
    filter of the whole log (bits are OR-mergeable)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from margaret_spark.functions.bloom import bloom_build
    from margaret_spark.log import OffsetLog
    from margaret_spark.streaming import read_bloom, stream_bloom
    from tests.test_streaming_chaos import _space_log_file_mtimes

    keys = ["a", "b", "a", "c", "d", "b"]
    log = OffsetLog(spark, str(tmp_path / "log"), value_type=T.StringType())
    for k in keys:
        log.append(k)
    _space_log_file_mtimes(log)
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ck")
    stream_bloom(
        log, F.col("value"), sink, ckpt, m_bits=64, k_hashes=3,
        available_now=True, max_files_per_trigger=2,
    )
    import os as _os

    assert len([d for d in _os.listdir(sink) if d.startswith("batch=")]) >= 2
    merged = {r["bit"] for r in read_bloom(spark, sink).collect()}
    batch_df = spark.createDataFrame([(k,) for k in keys], "k string")
    want = {
        r["bit"] for r in bloom_build(batch_df, "k", 64, 3).collect()
    }
    assert merged == want
    # empty sink reads as a typed empty filter
    assert read_bloom(spark, str(tmp_path / "nope")).count() == 0


def test_hll_accuracy_merge_and_small_range(spark):
    """Registers merge exactly (max-mergeable); estimate error stays
    within ~3/sqrt(m) of truth at n >> m; the corrected estimator's
    linear-counting branch handles tiny cardinalities; NULLs skip."""
    from pyspark.sql import functions as F

    from margaret_spark.functions.hll import (
        hll_estimate,
        hll_merge,
        hll_sketch,
    )

    df = spark.range(0, 20_000).select(F.col("id").cast("string").alias("k"))
    sk = hll_sketch(df, "k", p=8)
    est = hll_estimate(sk, p=8, corrected=False).collect()[0]["est"]
    assert abs(est - 20_000) / 20_000 < 3 / (256 ** 0.5)

    a = hll_sketch(df.where(F.col("k").cast("long") % 3 == 0), "k", p=8)
    b = hll_sketch(df.where(F.col("k").cast("long") % 3 != 0), "k", p=8)
    whole = {(r["bucket"], r["maxrank"]) for r in sk.collect()}
    merged = {(r["bucket"], r["maxrank"]) for r in hll_merge(a, b).collect()}
    assert merged == whole

    small = spark.createDataFrame(
        [(str(i),) for i in range(25)] + [(None,)], "k string"
    )
    corr = hll_estimate(hll_sketch(small, "k", p=8), p=8).collect()[0]["est"]
    assert abs(corr - 25) / 25 < 0.25  # linear counting regime

    import pytest as _p

    with _p.raises(ValueError, match="p must be"):
        hll_sketch(df, "k", p=2)


def test_histogram_quantiles_accuracy_and_merge_equivalence(spark):
    """Histogram-quantile contract: estimates land within one bucket
    width of the exact quantiles on a uniform column; additive counts
    mean the estimate over the whole equals the estimate over merged
    partial histograms (same grid); q bounds validated."""
    from pyspark.sql import functions as F

    from margaret_spark.operators.profiling import (
        histogram,
        histogram_quantiles,
    )

    df = spark.range(0, 10_000).select(F.col("id").cast("double").alias("v"))
    bins = 100
    got = {
        r["q"]: r["est"]
        for r in histogram_quantiles(df, "v", [0.25, 0.5, 0.9], bins=bins).collect()
    }
    width = 9999.0 / bins
    for q, est in got.items():
        assert abs(est - q * 9999.0) <= width + 1e-9

    # mergeability: partial histograms on the SAME grid re-sum to the
    # whole-table histogram (counts are additive like the CMS)
    lo, hi = 0.0, 9999.0
    a = histogram(df.where(F.col("v") < 3000), "v", bins, lo=lo, hi=hi)
    b = histogram(df.where(F.col("v") >= 3000), "v", bins, lo=lo, hi=hi)
    merged = (
        a.unionByName(b)
        .groupBy("bucket")
        .agg(F.sum("n").alias("n"))
    )
    whole = histogram(df, "v", bins, lo=lo, hi=hi)
    assert {(r["bucket"], r["n"]) for r in merged.collect()} == {
        (r["bucket"], r["n"]) for r in whole.select("bucket", "n").collect()
    }

    import pytest as _p

    with _p.raises(ValueError, match="quantiles must be"):
        histogram_quantiles(df, "v", [0.0])
    with _p.raises(ValueError, match="non-empty"):
        histogram_quantiles(df, "v", [])


def test_hll_per_group_sketches_are_independent(spark):
    from pyspark.sql import functions as F

    from margaret_spark.functions.hll import hll_estimate, hll_sketch

    df = spark.range(0, 4000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        (F.col("id") % 1000).cast("string").alias("k"),
    )
    sk = hll_sketch(df, "k", p=8, group_col="g")
    ests = {
        r["g"]: r["est"]
        for r in hll_estimate(
            sk, p=8, corrected=False, group_col="g"
        ).collect()
    }
    # each group saw 500 distinct keys (evens/odds of 0..999)
    for g, est in ests.items():
        assert abs(est - 500) / 500 < 3 / (256 ** 0.5)
    # the per-group sketch of one group equals the ungrouped sketch
    # over that group's rows
    solo = {
        (r["bucket"], r["maxrank"])
        for r in hll_sketch(df.where(F.col("g") == "0"), "k", p=8).collect()
    }
    grouped = {
        (r["bucket"], r["maxrank"])
        for r in sk.where(F.col("g") == "0").select("bucket", "maxrank").collect()
    }
    assert solo == grouped


def test_bloom_probe_null_key_is_null_member(spark):
    """NULL probe keys resolve to NULL member (unknown), mirroring the
    build side's NULLs-have-no-membership-identity rule — not a
    definite FALSE (r6 ADVICE)."""
    from margaret_spark.functions.bloom import bloom_build, bloom_probe

    bits = bloom_build(
        spark.createDataFrame([("a",), ("b",)], "k string"), "k", 128, 3
    )
    probes = spark.createDataFrame(
        [("a",), ("zzz",), (None,)], "k string"
    )
    got = {
        r["k"]: r["member"]
        for r in bloom_probe(bits, probes, "k", 128, 3).collect()
    }
    assert got["a"] is True
    assert got["zzz"] is False
    assert got[None] is None


def test_kmv_sketch_merge_equals_whole(spark):
    """KMV merge is lossless: the merged sketch of two halves equals
    the sketch of the union — the multiset-operation contract."""
    from margaret_spark.functions.kmv import kmv_merge, kmv_sketch
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i % 137,) for i in range(1000)], "k long"
    )
    a = kmv_sketch(df.where(F.col("k") % 2 == 0), "k", k=32)
    b = kmv_sketch(df.where(F.col("k") % 2 == 1), "k", k=32)
    merged = {(r.rk, r.h) for r in kmv_merge(a, b, k=32).collect()}
    whole = {(r.rk, r.h) for r in kmv_sketch(df, "k", k=32).collect()}
    assert merged == whole


def test_kmv_estimate_modes_and_accuracy(spark):
    from margaret_spark.functions.kmv import kmv_estimate, kmv_sketch

    # not-full sketch: exact count
    small = spark.createDataFrame([(i,) for i in range(10)], "k long")
    row = kmv_estimate(kmv_sketch(small, "k", k=64), k=64).collect()[0]
    assert row["n_sketch"] == 10 and row["estimate"] == 10.0

    # full sketch: estimator within a loose relative band (k=64 →
    # ~1/sqrt(62) ≈ 13% stderr; allow 3σ)
    big = spark.createDataFrame([(i % 1000,) for i in range(5000)], "k long")
    row = kmv_estimate(kmv_sketch(big, "k", k=64), k=64).collect()[0]
    assert row["n_sketch"] == 64
    assert 1000 * 0.6 <= row["estimate"] <= 1000 * 1.5, row["estimate"]


def test_kmv_intersect_planted_overlap(spark):
    from margaret_spark.functions.kmv import kmv_intersect, kmv_sketch
    from pyspark.sql import functions as F

    # A = 0..599, B = 400..999 → |A∩B| = 200, |A∪B| = 1000
    df = spark.createDataFrame([(i,) for i in range(1000)], "k long")
    a = kmv_sketch(df.where(F.col("k") < 600), "k", k=128)
    b = kmv_sketch(df.where(F.col("k") >= 400), "k", k=128)
    row = kmv_intersect(a, b, k=128).collect()[0]
    assert row["n_union_sketch"] == 128
    assert 1000 * 0.6 <= row["est_union"] <= 1000 * 1.5
    assert 200 * 0.4 <= row["est_intersection"] <= 200 * 2.2, row

    # exact mode: unions that fit the sketch are exact
    sa = kmv_sketch(df.where(F.col("k") < 30), "k", k=64)
    sb = kmv_sketch(df.where((F.col("k") >= 20) & (F.col("k") < 50)), "k", k=64)
    row = kmv_intersect(sa, sb, k=64).collect()[0]
    assert row["n_union_sketch"] == 50 and row["est_union"] == 50.0
    assert row["k_common"] == 10 and abs(row["est_intersection"] - 10.0) < 1e-9


def test_kmv_rejects_k_below_two(spark):
    import pytest as _pytest

    from margaret_spark.functions.kmv import kmv_sketch

    df = spark.createDataFrame([(1,)], "k long")
    with _pytest.raises(ValueError, match="k must be"):
        kmv_sketch(df, "k", k=1)


def test_kmv_intersect_empty_inputs_is_zero(spark):
    """Two empty sketches: est_intersection must be 0.0, not the NULL
    a naive 0/0 division produces."""
    from margaret_spark.functions.kmv import kmv_intersect, kmv_sketch

    empty = spark.createDataFrame([], "k long")
    a = kmv_sketch(empty, "k", k=8)
    row = kmv_intersect(a, a, k=8).collect()[0]
    assert row.n_union_sketch == 0
    assert row.k_common == 0
    assert row.est_intersection == 0.0


def test_cms_null_probe_estimates_null(spark):
    # the bloom_probe NULL contract applied to CMS: the build skips
    # NULL keys, so a NULL probe has no frequency identity — NULL
    # estimate, not a definite 0
    from margaret_spark.functions.cms import cms_estimate, cms_sketch

    df = spark.createDataFrame([("a",), ("a",), ("b",)], "k string")
    sk = cms_sketch(df, "k", depth=3, width=64)
    probes = spark.createDataFrame([("a",), (None,)], "k string")
    est = {r["k"]: r["est"] for r in cms_estimate(sk, probes, "k", depth=3, width=64).collect()}
    assert est["a"] == 2
    assert est[None] is None
