"""Log contract suite: the reference's golden query-semantics table
(``test/simple.go:126-254``) and point-lookup contract
(``test/get.go:16-65``), run against every backend — the same
backend-parameterized registry shape as ``test/registry.go:15-23``.
"""

import pytest

from margaret_spark import (
    SEQ_EMPTY,
    ErrNulled,
    Gt,
    Gte,
    Limit,
    Live,
    Lt,
    Lte,
    MemLog,
    OffsetLog,
    OutOfBounds,
    QuerySpecError,
    Reverse,
    SeqWrap,
)


def make_log(kind, spark, tmp_path):
    if kind == "mem":
        return MemLog(spark)
    return OffsetLog(spark, str(tmp_path / "offsetlog"))


BACKENDS = ["mem", "offset"]


@pytest.fixture(params=BACKENDS)
def log(request, spark, tmp_path):
    return make_log(request.param, spark, tmp_path)


# The golden table from test/simple.go:126-236 (values [1,2,3] unless noted).
GOLDEN = [
    ("simple", [1, 2, 3], [], [1, 2, 3]),
    ("reverse", [1, 2, 3, 4, 5], [Reverse(True)], [5, 4, 3, 2, 1]),
    ("reverse-false", [1, 2, 3], [Reverse(False)], [1, 2, 3]),
    ("gt0", [1, 2, 3], [Gt(0)], [2, 3]),
    ("gte1", [1, 2, 3], [Gte(1)], [2, 3]),
    ("lt2", [1, 2, 3], [Lt(2)], [1, 2]),
    ("lte1", [1, 2, 3], [Lte(1)], [1, 2]),
    ("limit2", [1, 2, 3], [Limit(2)], [1, 2]),
    # negative limit = UNLIMITED: the reference cursor only EOS's at
    # exactly limit == 0 (offset2/qry.go:105-108), so a negative
    # counter decrements forever; limit 0 is immediately empty
    ("limit-neg", [1, 2, 3], [Limit(-1)], [1, 2, 3]),
    ("limit0", [1, 2, 3], [Limit(0)], []),
    ("reverse-limit2", [1, 2, 3, 4, 5], [Reverse(True), Limit(2)], [5, 4]),
    ("seqwrap", [1, 2, 3], [SeqWrap(True)], [(0, 1), (1, 2), (2, 3)]),
    ("gt-lte", [1, 2, 3, 4, 5], [Gt(0), Lte(3)], [2, 3, 4]),
]


@pytest.mark.parametrize("name,values,specs,expected", GOLDEN, ids=[g[0] for g in GOLDEN])
def test_golden_query_semantics(log, name, values, specs, expected):
    log.append_many(values)
    assert list(log.query(*specs)) == expected


def test_live_reverse_rejected(log):
    # offset2/log.go:418-420: Reverse+Live is invalid.
    with pytest.raises(QuerySpecError):
        list(log.query(Live(True), Reverse(True)))


def test_conflicting_bounds_rejected(log):
    with pytest.raises(QuerySpecError):
        list(log.query(Gt(0), Gte(1)))
    with pytest.raises(QuerySpecError):
        list(log.query(Lt(5), Lte(4)))


def test_get_contract(log):
    # test/get.go:16-65: appended values come back with dense seqs.
    for i, v in enumerate([10, 20, 30]):
        assert log.append(v) == i
    assert log.seq() == 2
    assert [log.get(i) for i in range(3)] == [10, 20, 30]
    with pytest.raises(OutOfBounds):
        log.get(3)
    with pytest.raises(OutOfBounds):
        log.get(-1)


def test_empty_log(log):
    assert log.seq() == SEQ_EMPTY
    assert list(log.query()) == []


def test_query_past_end_is_eos(log):
    log.append_many([1, 2, 3])
    assert list(log.query(Gt(2))) == []


def test_check_consistency(log):
    log.append_many([1, 2, 3, 4])
    log.check_consistency()


def test_changes_observable(log):
    seen = []
    cancel = log.changes().subscribe(seen.append)
    log.append(1)
    log.append(2)
    cancel()
    log.append(3)
    assert seen == [0, 1]


def test_query_df_algebra(log):
    log.append_many([1, 2, 3, 4, 5])
    df = log.query_df(Gt(0), Lte(3))
    rows = sorted((r["seq"], r["value"]) for r in df.collect())
    assert rows == [(1, 2), (2, 3), (3, 4)]


def test_mixed_append_and_append_df_reads(spark, tmp_path):
    """Single appends write depth-1 files; append_df publishes a
    depth-2 directory — the batch reader must discover both (this
    broke partition discovery before recursiveFileLookup)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    log = OffsetLog(
        spark, str(tmp_path / "log"),
        value_type=T.StructType([T.StructField("v", T.LongType())]),
    )
    log.append({"v": 1})
    df2 = spark.createDataFrame([(2,), (3,)], "v long").select(
        F.struct(F.col("v")).alias("value")
    )
    log.append_df(df2)
    log.append({"v": 4})
    rows = sorted((r["seq"], r["value"]["v"]) for r in log.df().collect())
    assert rows == [(0, 1), (1, 2), (2, 3), (3, 4)]
    assert log.get(2) == {"v": 3}
    log.check_consistency()
    # the bulk directory was published atomically via staging+rename
    import os

    assert not os.path.exists(os.path.join(str(tmp_path / "log"), "_staging")) or \
        not os.listdir(os.path.join(str(tmp_path / "log"), "_staging"))


def test_append_df_rejects_codec_logs(spark, tmp_path):
    log = OffsetLog(spark, str(tmp_path / "log"), codec="json")
    df = spark.createDataFrame([("x",)], "value string")
    with pytest.raises(ValueError, match="codec"):
        log.append_df(df)


def test_replace_none_rejected(spark, tmp_path):
    log = OffsetLog(spark, str(tmp_path / "log"), codec="json")
    log.append({"a": 1})
    with pytest.raises(ValueError, match="null"):
        log.replace(0, None)


def test_concurrent_appends_dense_unique_seqs(spark, tmp_path):
    """Many threads appending to one log (the reference serializes
    appends under a mutex, offset2/log.go:431): every append gets a
    UNIQUE seq, the final log is dense, and every value survives."""
    import threading

    from margaret_spark.log import OffsetLog

    log = OffsetLog(spark, str(tmp_path / "clog"))
    seqs: list[int] = []
    lock = threading.Lock()

    def worker(base):
        got = []
        for i in range(10):
            got.append(log.append(base * 100 + i))
        with lock:
            seqs.extend(got)

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert sorted(seqs) == list(range(40))      # dense, no duplicates
    assert log.seq() == 39
    log.check_consistency()
    vals = sorted(list(log.query()))
    assert len(vals) == 40 and len(set(vals)) == 40


def test_point_get_on_bulk_and_compacted_parts(spark, tmp_path):
    """get() pushes the point filter into the scan: correct on a bulk
    append_df batch DIRECTORY, on flat per-append files, and after
    compaction merges the log into one big file — never materializing
    the whole part (the filtered dataset read prunes by row-group seq
    stats)."""
    from pyspark.sql import types as T

    from margaret_spark.sources import compact_log

    log = OffsetLog(spark, str(tmp_path / "log"), value_type=T.LongType())
    log.append_many([10, 11, 12])
    log.append_df(
        spark.createDataFrame([(100 + i,) for i in range(50)], "value long"),
        order_by="value",
    )
    for s, want in [(0, 10), (2, 12), (3, 100), (30, 127), (52, 149)]:
        assert log.get(s) == want, s
    compact_log(log)
    log2 = OffsetLog(spark, str(tmp_path / "log"))
    for s, want in [(0, 10), (3, 100), (52, 149)]:
        assert log2.get(s) == want, s


def test_foreign_names_in_data_and_patch_dirs_fail_loudly(spark, tmp_path):
    """A foreign *.parquet in data/ or patch/ fails with the path
    named — a bare int() error (or worse, a bogus parsed seq range
    corrupting recovery) must never happen."""
    import os

    from pyspark.sql import types as T

    log = OffsetLog(spark, str(tmp_path / "log"), value_type=T.LongType())
    log.append(1)
    open(os.path.join(log._data_dir, "upload.parquet"), "w").close()
    with pytest.raises(ValueError, match="foreign entry in log data dir"):
        OffsetLog(spark, str(tmp_path / "log"))
    os.remove(os.path.join(log._data_dir, "upload.parquet"))

    log.null(0)
    open(os.path.join(log._patch_dir, "patch-x.parquet"), "w").close()
    with pytest.raises(ValueError, match="foreign entry in log patch dir"):
        OffsetLog(spark, str(tmp_path / "log"))
