"""Null/Replace overlay semantics (reference ``offset2/alter_test.go:24-135``
and ``offset2/alter_replace_test.go:22-110``) plus reopen/recovery
(``offset2/rw_test.go:66-191``)."""

import pytest

from pyspark.sql import types as T

from margaret_spark import ErrNulled, MemLog, OffsetLog, SeqWrap

EVENTS = [
    {"foo": "hello", "bar": 23},
    {"foo": "world", "bar": 42},
    {"foo": "moar", "bar": 161},
    {"foo": "done", "bar": 1312},
    {"foo": "last", "bar": 1234},
]

EVENT_TYPE = T.StructType(
    [
        T.StructField("foo", T.StringType()),
        T.StructField("bar", T.LongType()),
    ]
)


def _mk(kind, spark, tmp_path):
    if kind == "mem":
        return MemLog(spark, value_type=EVENT_TYPE)
    return OffsetLog(spark, str(tmp_path / "log"), value_type=EVENT_TYPE)


@pytest.fixture(params=["mem", "offset"])
def log(request, spark, tmp_path):
    log = _mk(request.param, spark, tmp_path)
    log.append_many(EVENTS)
    return log


@pytest.mark.parametrize("pos", range(5))
def test_null_each_position(log, pos):
    # alter_test.go: null each position; Get errors, streams emit
    # ErrNulled as a value and continue.
    log.null(pos)
    with pytest.raises(ErrNulled):
        log.get(pos)
    out = list(log.query())
    assert len(out) == 5
    for i, v in enumerate(out):
        if i == pos:
            assert isinstance(v, ErrNulled)
        else:
            assert v == EVENTS[i]


@pytest.mark.parametrize("pos", [0, 2, 4])
def test_replace(log, pos):
    new = {"foo": "A" * 4, "bar": 9}
    log.replace(pos, new)
    assert log.get(pos) == new
    out = list(log.query(SeqWrap(True)))
    assert out[pos] == (pos, new)
    assert [v for _, v in out[:pos]] == EVENTS[:pos]


def test_null_then_replace_latest_wins(log):
    log.null(1)
    log.replace(1, {"foo": "back", "bar": 7})
    assert log.get(1) == {"foo": "back", "bar": 7}


def test_reopen_resumes_seq(spark, tmp_path):
    # rw_test.go:66-145: reopen resumes the sequence.
    path = str(tmp_path / "log")
    log = OffsetLog(spark, path, value_type=EVENT_TYPE)
    log.append_many(EVENTS[:3])
    assert log.seq() == 2

    log2 = OffsetLog(spark, path)  # schema recovered from _meta.json
    assert log2.seq() == 2
    assert log2.get(1) == EVENTS[1]
    assert log2.append(EVENTS[3]) == 3
    assert list(log2.query()) == EVENTS[:4]
    log2.check_consistency()


def test_reopen_sees_patches(spark, tmp_path):
    path = str(tmp_path / "log")
    log = OffsetLog(spark, path, value_type=EVENT_TYPE)
    log.append_many(EVENTS)
    log.null(2)
    log2 = OffsetLog(spark, path)
    with pytest.raises(ErrNulled):
        log2.get(2)
