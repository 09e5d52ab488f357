"""Codec round-trips (reference ``codec/*/codec.go`` + the
codec-parameterized log registration, ``offset2/test/test.go:18-38``)."""

import math

import pytest

from margaret_spark.codec import CborCodec, JsonCodec, MsgpackCodec
from margaret_spark.log import OffsetLog

VALUES = [
    None,
    True,
    False,
    0,
    1,
    -1,
    127,
    128,
    255,
    256,
    65535,
    65536,
    -32,
    -33,
    2**40,
    -(2**40),
    1.5,
    -0.25,
    "",
    "hello",
    "héllo wörld ✓",
    [],
    [1, 2, 3],
    ["a", [1, {"b": 2}]],
    {},
    {"foo": "hello", "bar": 23},
    {"nested": {"x": [1, 2.5, None, True]}},
]

BINARY_VALUES = [b"", b"\x00\x01\xff", b"x" * 300]


@pytest.mark.parametrize("codec_cls", [JsonCodec, MsgpackCodec, CborCodec])
@pytest.mark.parametrize("value", VALUES, ids=lambda v: repr(v)[:30])
def test_roundtrip(codec_cls, value):
    c = codec_cls()
    assert c.unmarshal(c.marshal(value)) == value


@pytest.mark.parametrize("codec_cls", [MsgpackCodec, CborCodec])
@pytest.mark.parametrize("value", BINARY_VALUES, ids=["empty", "bytes", "long"])
def test_roundtrip_binary(codec_cls, value):
    c = codec_cls()
    assert c.unmarshal(c.marshal(value)) == value


@pytest.mark.parametrize("codec_cls", [MsgpackCodec, CborCodec])
def test_canonical_map_order(codec_cls):
    c = codec_cls()
    assert c.marshal({"a": 1, "b": 2}) == c.marshal({"b": 2, "a": 1})


def test_nan_roundtrip():
    for c in (MsgpackCodec(), CborCodec()):
        assert math.isnan(c.unmarshal(c.marshal(float("nan"))))


@pytest.mark.parametrize("codec", ["json", "msgpack", "cbor"])
def test_codec_log_end_to_end(spark, tmp_path, codec):
    # offset2/test/test.go:21-25: one registered log flavor per codec.
    log = OffsetLog(spark, str(tmp_path / codec), codec=codec)
    vals = [{"foo": "hello", "bar": 23}, {"foo": "world", "bar": 42}]
    log.append_many(vals)
    assert log.get(0) == vals[0]
    assert list(log.query()) == vals
    # reopen recovers codec from meta
    log2 = OffsetLog(spark, str(tmp_path / codec))
    assert log2.get(1) == vals[1]
