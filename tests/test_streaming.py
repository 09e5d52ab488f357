"""Live-query and streaming-index tests (reference
``test/concurrent.go:20-107``, ``offset2/test/pumplive.go:151-159``,
and the §3.3 pipeline)."""

import threading
import time

import pytest

from pyspark.sql import functions as F

from margaret_spark import Gt, Live, Limit, OffsetLog, Reverse, SeqWrap, MemLog
from margaret_spark.errors import QuerySpecError
from margaret_spark.indexes import fanout
from margaret_spark.multilog import OffsetMultiLog
from margaret_spark.streaming import LiveTail, stream_build_index, stream_changes


def test_live_tail_catchup_then_follow(spark, tmp_path):
    log = OffsetLog(spark, str(tmp_path / "log"))
    log.append_many([10, 20, 30])

    got = []
    tail = LiveTail(log, SeqWrap(True), Limit(5), poll_timeout=60.0)

    def consume():
        for item in tail:
            got.append(item)

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    deadline = time.time() + 60
    while len(got) < 3 and time.time() < deadline:
        time.sleep(0.1)
    assert got == [(0, 10), (1, 20), (2, 30)]
    # follow phase: appends become visible without restarting the query
    log.append(40)
    log.append(50)
    t.join(timeout=60)
    assert got == [(0, 10), (1, 20), (2, 30), (3, 40), (4, 50)]


def test_live_tail_bounds(spark, tmp_path):
    log = OffsetLog(spark, str(tmp_path / "log"))
    log.append_many([1, 2, 3, 4])
    with LiveTail(log, Gt(1), SeqWrap(True), Limit(2), poll_timeout=60.0) as tail:
        assert list(tail) == [(2, 3), (3, 4)]


def test_live_reverse_rejected_streaming(spark, tmp_path):
    log = OffsetLog(spark, str(tmp_path / "log"))
    with pytest.raises(QuerySpecError):
        LiveTail(log, Reverse(True))


def test_mem_live_concurrent_append(spark):
    # concurrent.go: appender and live reader see identical order
    log = MemLog(spark)
    got = []

    def consume():
        for v in log.query(Live(True), SeqWrap(True), Limit(10)):
            got.append(v)

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    for i in range(10):
        log.append(i * 11)
        time.sleep(0.01)
    t.join(timeout=30)
    assert got == [(i, i * 11) for i in range(10)]


def test_stream_changes_observable(spark, tmp_path):
    log = OffsetLog(spark, str(tmp_path / "log"))
    log.append_many([1, 2])
    obs, stop = stream_changes(log)
    try:
        deadline = time.time() + 60
        while obs.value() != 1 and time.time() < deadline:
            time.sleep(0.1)
        assert obs.value() == 1
        log.append(3)
        while obs.value() != 2 and time.time() < deadline:
            time.sleep(0.1)
        assert obs.value() == 2
    finally:
        stop()


def test_stream_build_index_exactly_once(spark, tmp_path):
    """The §3.3 pipeline with checkpoint-as-cursor: a second run only
    processes newly appended entries (no double counting)."""
    log = OffsetLog(spark, str(tmp_path / "log"))
    log.append_many(list(range(10)))
    mlog = OffsetMultiLog(spark, str(tmp_path / "ml"))
    ckpt = str(tmp_path / "ckpt")

    def apply_batch(batch_df):
        routed = fanout(
            batch_df.withColumn(
                "addrs",
                F.array(F.when(F.col("value") % 2 == 0, "even").otherwise("odd")),
            ),
            F.col("addrs"),
        )
        if routed.take(1):
            mlog.append_df(routed)

    stream_build_index(log, apply_batch, ckpt, available_now=True)
    even = [r["main_seq"] for r in mlog.df().where(F.col("addr") == "even").orderBy("main_seq").collect()]
    assert even == [0, 2, 4, 6, 8]

    # resume: new entries only
    log.append_many([10, 11])
    stream_build_index(log, apply_batch, ckpt, available_now=True)
    even2 = [r["main_seq"] for r in mlog.df().where(F.col("addr") == "even").orderBy("main_seq").collect()]
    odd2 = [r["main_seq"] for r in mlog.df().where(F.col("addr") == "odd").orderBy("main_seq").collect()]
    assert even2 == [0, 2, 4, 6, 8, 10]
    assert odd2 == [1, 3, 5, 7, 9, 11]
