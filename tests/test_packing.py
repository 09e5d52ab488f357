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


def _seq_bfd(lengths, seq_len, chunk_docs):
    """Sequential reference: chunk-local best-fit over docs already in
    (n desc, md5(id), id) order; returns [(doc, pack_id, pack_pos)]."""
    out = []
    for c0 in range(0, len(lengths), chunk_docs):
        chunk_i = c0 // chunk_docs
        bins, fill = [], []
        for doc, n in lengths[c0 : c0 + chunk_docs]:
            best = -1
            for i, rem in enumerate(bins):
                if rem >= n and (best < 0 or rem < bins[best]):
                    best = i
            if best < 0:
                best = len(bins)
                bins.append(seq_len)
                fill.append(0)
            bins[best] -= n
            out.append((doc, chunk_i * chunk_docs + best, fill[best]))
            fill[best] += 1
    return out


def test_pack_best_fit_matches_sequential_reference(spark):
    import hashlib

    from margaret_spark.operators.packing import pack_best_fit

    rows = [(i, (i * 37) % 97 + 1) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, n long")
    got = {
        r.id: (r.pack_id, r.pack_pos, r.n_tokens)
        for r in pack_best_fit(df, "id", "n", seq_len=100, chunk_docs=64).collect()
    }
    ordered = sorted(
        rows, key=lambda t: (-t[1], hashlib.md5(str(t[0]).encode()).hexdigest(), t[0])
    )
    want = _seq_bfd(ordered, 100, 64)
    assert len(got) == len(rows)
    for doc, pack, pos in want:
        n = dict(rows)[doc]
        assert got[doc] == (pack, pos, n), (doc, got[doc], (pack, pos))


def test_pack_best_fit_invariants_and_oversize(spark):
    from margaret_spark.operators.packing import capacity_report, pack_best_fit

    rows = [(1, 150), (2, 150), (3, 80), (4, 60), (5, 40), (6, 30), (7, 0)]
    df = spark.createDataFrame(rows, "id long, n long")
    packed = pack_best_fit(df, "id", "n", seq_len=100, chunk_docs=256)
    out = packed.collect()
    # zero-token row dropped; every other doc assigned exactly once
    assert sorted(r.id for r in out) == [1, 2, 3, 4, 5, 6]
    by_pack = {}
    for r in out:
        by_pack.setdefault(r.pack_id, []).append(r)
    for pid, members in by_pack.items():
        if pid < 0:  # oversize: dedicated single-doc pack
            assert len(members) == 1 and members[0].n_tokens > 100
        else:  # capacity is never violated
            assert sum(m.n_tokens for m in members) <= 100
        # pack_pos is dense 0..k-1 within the pack
        assert sorted(m.pack_pos for m in members) == list(range(len(members)))
    # the two oversize docs land in distinct negative packs
    assert sorted(pid for pid in by_pack if pid < 0) == [-2, -1]
    # capacity_report: oversize packs clamp waste to 0, integers exact
    rep = {r.pack_id: r for r in capacity_report(packed, seq_len=100).collect()}
    for pid, r in rep.items():
        assert r.n_docs == len(by_pack[pid])
        assert r.sum_tokens == sum(m.n_tokens for m in by_pack[pid])
        if pid < 0:
            assert r.padding_waste == 0.0
        else:
            assert abs(r.padding_waste - (1 - min(r.sum_tokens, 100) / 100)) < 1e-9


def test_pack_best_fit_deterministic_and_beats_next_fit(spark):
    """Two runs are identical, and BFD's bin count is never worse than
    arrival-order next-fit on the same corpus (the quality argument
    for paying the decreasing sort)."""
    from margaret_spark.operators.packing import pack_best_fit

    rows = [(i, (i * 131) % 60 + 5) for i in range(600)]
    df = spark.createDataFrame(rows, "id long, n long")
    a = sorted(
        (r.id, r.pack_id, r.pack_pos)
        for r in pack_best_fit(df, "id", "n", seq_len=64, chunk_docs=128).collect()
    )
    b = sorted(
        (r.id, r.pack_id, r.pack_pos)
        for r in pack_best_fit(df, "id", "n", seq_len=64, chunk_docs=128).collect()
    )
    assert a == b
    n_bins_bfd = len({p for _, p, _ in a})
    # arrival-order next-fit reference
    rem, bins = 0, 0
    for _, n in rows:
        if n > rem:
            bins += 1
            rem = 64
        rem -= n
    assert n_bins_bfd <= bins


def test_pack_best_fit_validates_args(spark):
    from margaret_spark.operators.packing import capacity_report, pack_best_fit

    df = spark.createDataFrame([(1, 5)], "id long, n long")
    with pytest.raises(ValueError):
        pack_best_fit(df, "id", "n", seq_len=0)
    with pytest.raises(ValueError):
        pack_best_fit(df, "id", "n", seq_len=10, chunk_docs=0)
    with pytest.raises(ValueError):
        capacity_report(df.selectExpr("id as pack_id", "n as n_tokens"), seq_len=-1)


def test_pack_best_fit_arrival_matches_online_reference(spark):
    from margaret_spark.operators.packing import pack_best_fit_arrival

    rows = [(i, (i * 37) % 130 + 1) for i in range(300)]  # some oversize (>100)
    df = spark.createDataFrame(rows, "seq long, n long")
    got = {
        r.seq: (r.pack_id, r.pack_pos)
        for r in pack_best_fit_arrival(df, "seq", "n", seq_len=100, chunk_docs=64).collect()
    }
    # sequential online reference: arrival order, reset at chunk edge
    want = {}
    bins, fill, chunk = [], [], -1
    for seq, n in rows:
        if n > 100:
            want[seq] = (-(seq + 1), 0)
            continue
        if seq // 64 != chunk:
            chunk, bins, fill = seq // 64, [], []
        best = -1
        for i, rem in enumerate(bins):
            if rem >= n and (best < 0 or rem < bins[best]):
                best = i
        if best < 0:
            best = len(bins)
            bins.append(100)
            fill.append(0)
        bins[best] -= n
        want[seq] = (chunk * 64 + best, fill[best])
        fill[best] += 1
    assert got == want


def test_pack_best_fit_arrival_chunk_purity(spark):
    """A chunk-aligned slice of the corpus packs identically on its
    own — the property the streaming twin's exactness rests on."""
    from margaret_spark.operators.packing import pack_best_fit_arrival

    rows = [(i, (i * 53) % 90 + 1) for i in range(256)]
    df = spark.createDataFrame(rows, "seq long, n long")
    whole = {
        r.seq: (r.pack_id, r.pack_pos)
        for r in pack_best_fit_arrival(df, "seq", "n", 100, chunk_docs=64).collect()
    }
    part = {}
    for lo, hi in [(0, 128), (128, 256)]:  # two aligned "micro-batches"
        sl = df.where((F.col("seq") >= lo) & (F.col("seq") < hi))
        for r in pack_best_fit_arrival(sl, "seq", "n", 100, chunk_docs=64).collect():
            part[r.seq] = (r.pack_id, r.pack_pos)
    assert whole == part


def test_stream_pack_bfd_equals_batch_twin(spark, tmp_path):
    from pyspark.sql import types as T

    from margaret_spark.log import OffsetLog
    from margaret_spark.operators.packing import pack_best_fit_arrival
    from margaret_spark.operators.text import words
    from margaret_spark.streaming import read_keeper_sink, stream_pack_bfd

    texts = [(i, " ".join(f"w{j}" for j in range((i * 7) % 30 + 1))) for i in range(100)]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    log = OffsetLog(spark, str(tmp_path / "log"), value_type=T.StringType())
    for half in (
        docs.where(F.col("doc_id") < 50),
        docs.where(F.col("doc_id") >= 50),
    ):
        # one pre-sorted partition -> one data file -> one micro-batch
        log.append_df(
            half.repartition(1).sortWithinPartitions("doc_id"),
            value_col="text",
        )
    stream_pack_bfd(
        log, F.col("value"), str(tmp_path / "sink"), str(tmp_path / "ckpt"),
        seq_len=40, chunk_docs=25, max_files_per_trigger=1,
    )
    got = sorted(
        (r.seq, r.n_tokens, r.pack_id, r.pack_pos)
        for r in read_keeper_sink(
            spark, str(tmp_path / "sink"),
            "seq long, n_tokens long, pack_id long, pack_pos long",
        ).collect()
    )
    toks = docs.select(
        F.col("doc_id").alias("seq"),
        F.size(words(F.col("text"))).cast("long").alias("nt"),
    )
    want = sorted(
        (r.seq, r.n_tokens, r.pack_id, r.pack_pos)
        for r in pack_best_fit_arrival(toks, "seq", "nt", 40, chunk_docs=25).collect()
    )
    assert got == want
    assert len(got) == 100


def test_pack_semantic_streams_are_per_cluster(spark):
    """The semantic-packing composition gives every cluster its own
    stream: pack numbering restarts at 0 per cent_id and offsets stay
    inside seq_len."""
    import __spark_entry__ as entry

    out = entry.q_pack_semantic(spark, "/root/testdata/sf0.001").collect()
    assert len(out) > 0
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cent_id, []).append(r)
    assert len(by_cluster) > 1
    for cid, rows in by_cluster.items():
        assert min(r.pack_first for r in rows) == 0, cid
        for r in rows:
            assert 0 <= r.offset_in_first < 256
            assert r.pack_last >= r.pack_first
