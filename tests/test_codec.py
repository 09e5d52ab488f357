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


def _typed_schema():
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
            T.StructField("raw", T.BinaryType()),
            T.StructField("tags", T.ArrayType(T.StringType())),
            T.StructField(
                "inner",
                T.StructType(
                    [
                        T.StructField("n", T.LongType()),
                        T.StructField("ok", T.BooleanType()),
                    ]
                ),
            ),
        ]
    )


_TYPED_VALUE = {
    "id": 7,
    "name": "héllo",
    "score": 2.5,
    "raw": b"\x00\xff",
    "tags": ["a", "b"],
    "inner": {"n": 3, "ok": True},
}


def test_typed_codecs_roundtrip():
    from margaret_spark.codec import TypedCborCodec, TypedMsgpackCodec

    schema = _typed_schema()
    for cls in (TypedMsgpackCodec, TypedCborCodec):
        c = cls(schema)
        assert c.unmarshal(c.marshal(_TYPED_VALUE)) == _TYPED_VALUE
        # missing fields decode as None, int widens to float per schema
        partial = {"id": 1, "score": 3}  # int into a double field
        got = c.unmarshal(c.marshal(partial))
        assert got["score"] == 3.0 and isinstance(got["score"], float)
        assert got["name"] is None and got["inner"] is None


def test_typed_cbor_is_struct_to_array():
    # reference codec/cbor/cbor.go:19-76: structs encode positionally
    from margaret_spark.codec import CborCodec, TypedCborCodec

    schema = _typed_schema()
    wire = CborCodec().unmarshal(TypedCborCodec(schema).marshal(_TYPED_VALUE))
    assert isinstance(wire, list) and len(wire) == 6
    assert wire[0] == 7 and wire[5] == [3, True]  # nested struct also array


def test_typed_codec_rejects_wrong_shapes():
    from margaret_spark.codec import TypedMsgpackCodec

    c = TypedMsgpackCodec(_typed_schema())
    with pytest.raises(TypeError):
        c.marshal({"id": "not an int"})
    with pytest.raises(TypeError):
        c.marshal({"unknown_field": 1})
    with pytest.raises(TypeError):
        c.marshal({"tags": "not a list"})
    with pytest.raises(TypeError):
        c.marshal({"id": True})  # bool is not an int here


def test_coerce_rejects_int_wire_value_for_string_field():
    # a corrupt/foreign wire int in a string field must FAIL loudly —
    # bytes(int) would silently decode to a NUL-padded string
    from pyspark.sql import types as T

    from margaret_spark.codec import _coerce_field

    with pytest.raises(ValueError, match="coerce"):
        _coerce_field(T.StringType(), 7)
    assert _coerce_field(T.StringType(), b"ok") == "ok"
    assert _coerce_field(T.StringType(), bytearray(b"ok")) == "ok"
    assert _coerce_field(T.StringType(), "ok") == "ok"


def test_coerce_is_strict_for_numeric_and_bool_fields():
    # decode-side coercion must be NARROW: int("12")-style string
    # parsing or bool-as-number would silently accept corrupt or
    # misaligned wire values the marshal side can never produce
    from pyspark.sql import types as T

    from margaret_spark.codec import _coerce_field

    # allowed: identity + numeric widening + bytes/str normalization
    assert _coerce_field(T.LongType(), 7) == 7
    assert _coerce_field(T.DoubleType(), 7) == 7.0
    assert _coerce_field(T.DoubleType(), 7.5) == 7.5
    assert _coerce_field(T.BooleanType(), True) is True
    # rejected: strings in numeric fields, bools as numbers,
    # floats truncating into int fields, non-bools in bool fields
    for dt, bad in [
        (T.LongType(), "12"),
        (T.LongType(), True),
        (T.LongType(), 3.5),
        (T.DoubleType(), "3.5"),
        (T.DoubleType(), False),
        (T.BooleanType(), 1),
        (T.BooleanType(), "true"),
    ]:
        with pytest.raises(ValueError, match="coerce"):
            _coerce_field(dt, bad)


@pytest.mark.parametrize("codec_name", ["msgpack", "cbor"])
def test_int_outside_wire_range_fails_loudly(codec_name):
    # a Python bigint beyond the 64-bit wire range used to escape as a
    # bare struct.error from deep inside the encoder
    from margaret_spark.codec import CborCodec, MsgpackCodec

    c = MsgpackCodec() if codec_name == "msgpack" else CborCodec()
    for v in (2**64, -(2**64) - 1, 2**100):
        with pytest.raises(ValueError, match="wire range"):
            c.marshal(v)
    # the extremes of the representable range still round-trip
    hi = 2**64 - 1
    lo = -(2**63) if codec_name == "msgpack" else -(2**64)
    assert c.unmarshal(c.marshal(hi)) == hi
    assert c.unmarshal(c.marshal(lo)) == lo


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


def test_codec_fuzz_roundtrip():
    """Generative round-trip over arbitrary JSON-shaped values: every
    codec must unmarshal(marshal(v)) == v for ints, finite floats,
    unicode strings, None, bools, and nested lists/str-keyed dicts."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from margaret_spark.codec import CborCodec, JsonCodec, MsgpackCodec

    scalars = st.one_of(
        st.none(),
        st.booleans(),
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        st.floats(allow_nan=False, allow_infinity=False, width=64),
        st.text(max_size=40),
    )
    values = st.recursive(
        scalars,
        lambda children: st.one_of(
            st.lists(children, max_size=5),
            st.dictionaries(st.text(max_size=10), children, max_size=5),
        ),
        max_leaves=12,
    )

    codecs = [JsonCodec(), MsgpackCodec(), CborCodec()]

    @settings(max_examples=150, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(v=values)
    def run(v):
        for c in codecs:
            got = c.unmarshal(c.marshal(v))
            assert got == v, (type(c).__name__, v, got)

    run()
