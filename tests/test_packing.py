"""Sequence packing (operators.packing): distributed prefix sum and
pack assignment must match the sequential layout exactly."""

import pytest
from pyspark.sql import functions as F

from margaret_spark.operators.packing import pack_sequences, running_total


def test_running_total_matches_sequential(spark):
    rows = [(i, (i * 7) % 13 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v long")
    got = {
        r.id: r.running_total
        for r in running_total(df, "v", "id").collect()
    }
    acc = 0
    for i, v in rows:
        acc += v
        assert got[i] == acc


def test_running_total_broadcast_offsets_identical(spark, monkeypatch):
    """Past _MAP_LITERAL_CAP partitions the offsets broadcast-join
    instead of inlining as a create_map literal — identical sums,
    integral AND fractional."""
    from margaret_spark.operators import packing

    ints = spark.createDataFrame(
        [(i, (i * 3) % 7 + 1) for i in range(400)], "id long, v long"
    )
    dbls = spark.createDataFrame(
        [(i, ((i * 3) % 7 + 1) / 4.0) for i in range(400)], "id long, v double"
    )
    li = {r.id: r.running_total for r in packing.running_total(ints, "v", "id").collect()}
    ld = {r.id: r.running_total for r in packing.running_total(dbls, "v", "id").collect()}
    monkeypatch.setattr(packing, "_MAP_LITERAL_CAP", 1)
    bi = {r.id: r.running_total for r in packing.running_total(ints, "v", "id").collect()}
    bd = {r.id: r.running_total for r in packing.running_total(dbls, "v", "id").collect()}
    assert bi == li
    assert bd == ld
    assert isinstance(next(iter(bd.values())), float)


def test_running_total_stable_under_input_partitioning(spark):
    rows = [(i, i % 5 + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, v long")
    a = {r.id: r.running_total for r in running_total(df, "v", "id").collect()}
    b = {
        r.id: r.running_total
        for r in running_total(df.repartition(7), "v", "id").collect()
    }
    assert a == b


def test_pack_sequences_layout(spark):
    # token counts chosen to cross boundaries: 60+60 fills pack 0
    # (len 100) into pack 1, etc.
    rows = [(0, 60), (1, 60), (2, 100), (3, 30), (4, 1)]
    df = spark.createDataFrame(rows, "id long, n long")
    got = {
        r.id: (r.pack_first, r.pack_last, r.offset_in_first)
        for r in pack_sequences(df, "id", "n", seq_len=100).collect()
    }
    # stream positions: doc0 [0,60) doc1 [60,120) doc2 [120,220)
    # doc3 [220,250) doc4 [250,251)
    assert got[0] == (0, 0, 0)
    assert got[1] == (0, 1, 60)   # spans packs 0-1
    assert got[2] == (1, 2, 20)   # spans packs 1-2
    assert got[3] == (2, 2, 20)
    assert got[4] == (2, 2, 50)


def test_pack_sequences_drops_empty_and_validates(spark):
    df = spark.createDataFrame([(0, 5), (1, 0), (2, 3)], "id long, n long")
    rows = pack_sequences(df, "id", "n", seq_len=4).collect()
    assert sorted(r.id for r in rows) == [0, 2]
    with pytest.raises(ValueError):
        pack_sequences(df, "id", "n", seq_len=0)


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    counts=st.lists(st.integers(0, 50), min_size=1, max_size=40),
    seq_len=st.integers(1, 64),
)
def test_pack_sequences_matches_sequential_model(spark, counts, seq_len):
    """Property: the distributed packing equals the sequential
    single-pass layout for any token counts and pack length."""
    df = spark.createDataFrame(list(enumerate(counts)), "id long, n long")
    got = {
        r.id: (r.pack_first, r.pack_last, r.offset_in_first)
        for r in pack_sequences(df, "id", "n", seq_len=seq_len).collect()
    }
    pos = 0
    expect = {}
    for i, n in enumerate(counts):
        if n <= 0:
            continue
        expect[i] = (pos // seq_len, (pos + n - 1) // seq_len, pos % seq_len)
        pos += n
    assert got == expect


def test_running_total_no_global_window(spark):
    """The plan must not contain a single-partition global window —
    the whole point of the two-pass prefix sum."""
    df = spark.range(1000).withColumn("v", F.lit(2))
    plan = (
        running_total(df, "v", "id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan, plan


def test_pack_sequences_grouped_independent_streams(spark):
    from margaret_spark.operators.packing import pack_sequences_grouped

    rows = [(1, "a", 100), (2, "a", 200), (3, "b", 300), (4, "b", 10), (5, "b", 0)]
    df = spark.createDataFrame(rows, "id long, src string, toks long")
    got = {
        (r["src"], r["id"]): (r["pack_first"], r["pack_last"], r["offset_in_first"])
        for r in pack_sequences_grouped(df, "src", "id", "toks", seq_len=128).collect()
    }
    # each source starts its own stream at pack 0; zero-token rows drop
    assert got == {
        ("a", 1): (0, 0, 0),        # tokens 0..99
        ("a", 2): (0, 2, 100),      # tokens 100..299 spills packs 0-2
        ("b", 3): (0, 2, 0),        # b restarts at 0: tokens 0..299
        ("b", 4): (2, 2, 300 % 128),
    }


def test_length_bucketed_batches_and_padding_report(spark):
    import hashlib

    from margaret_spark.operators.packing import (
        length_bucketed_batches,
        padding_report,
    )

    rows = [(f"d{i}", (i * 7) % 13 + 1) for i in range(20)]
    df = spark.createDataFrame(rows, "id string, toks int")
    out = length_bucketed_batches(df, "id", "toks", batch_rows=4)
    got = {r["id"]: r for r in out.collect()}
    # python reference: global (toks, md5(id), id) order
    order = sorted(rows, key=lambda r: (r[1], hashlib.md5(r[0].encode()).hexdigest(), r[0]))
    for pos, (i, t) in enumerate(order):
        assert got[i]["batch_id"] == pos // 4, (i, pos)
        assert got[i]["pos_in_batch"] == pos % 4
        assert got[i]["n_tokens"] == t
    # batches hold similar lengths: per-batch max is non-decreasing
    rep = {r["batch_id"]: r for r in padding_report(out).collect()}
    assert len(rep) == 5
    maxes = [rep[b]["max_tokens"] for b in sorted(rep)]
    assert maxes == sorted(maxes)
    for r in rep.values():
        assert r["padded_tokens"] == r["n_docs"] * r["max_tokens"]
        assert 0.0 <= r["padding_waste"] < 1.0
    # waste matches the closed form
    b0 = rep[0]
    assert b0["padding_waste"] == round(1.0 - b0["sum_tokens"] / b0["padded_tokens"], 6)


def test_length_bucketed_batches_rejects_bad_capacity(spark):
    import pytest as _pytest

    from margaret_spark.operators.packing import length_bucketed_batches

    df = spark.createDataFrame([("a", 1)], "id string, toks int")
    with _pytest.raises(ValueError, match="batch_rows"):
        length_bucketed_batches(df, "id", "toks", batch_rows=0)


def test_length_bucketed_batches_no_global_window(spark):
    # positions come from the two-pass partition-offset assignment —
    # never a corpus-wide single-partition window
    from margaret_spark.operators.packing import length_bucketed_batches

    df = spark.range(1000).selectExpr("id", "CAST(id % 17 AS INT) AS toks")
    plan = (
        length_bucketed_batches(df, "id", "toks", batch_rows=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan, plan
