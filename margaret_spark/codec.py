"""Pluggable value codecs.

Reference: ``codec.go:12-31`` defines the 4-method codec interface;
implementations are JSON (``codec/json/codec.go:39-85``), canonical
msgpack (``codec/msgpack/msgpack.go:20-76``) and CBOR in
struct-to-array mode (``codec/cbor/cbor.go:19-76``).

Here a codec maps a Python value to/from a storable Spark column value
(STRING for JSON, BINARY for msgpack/cbor). The msgpack and CBOR
codecs are minimal from-scratch encoders of the *public* wire formats
(msgpack.org spec; RFC 8949) — no third-party packages — supporting
the value shapes a log carries: None/bool/int/float/str/bytes/list/dict.
Like the reference's canonical modes, map keys are emitted in sorted
order so encoding is deterministic.

In the hot relational path values live as native Parquet columns and
codecs are not involved; codecs exist for the schemaless-log API
(reference: a log opened with codec ``nil`` accepts any JSON value,
``codec/json/codec.go:16-37``).
"""

from __future__ import annotations

import json
import struct
from abc import ABC, abstractmethod
from typing import Any

from pyspark.sql import types as T_mod
from pyspark.sql.types import BinaryType, DataType, StringType


class Codec(ABC):
    """marshal/unmarshal between Python values and a storable column."""

    storage_type: DataType

    @abstractmethod
    def marshal(self, value: Any):
        ...

    @abstractmethod
    def unmarshal(self, stored) -> Any:
        ...


class JsonCodec(Codec):
    """Canonical JSON (sorted keys, compact separators).

    Non-finite floats serialize as the JS literals ``NaN`` /
    ``Infinity`` (Python's ``json`` default) — round-trip-closed with
    this codec's own ``unmarshal``, but NOT RFC-8259 JSON; use the
    msgpack/CBOR codecs when non-finite values must stay
    interoperable."""

    storage_type = StringType()

    def marshal(self, value: Any) -> str:
        return json.dumps(value, sort_keys=True, separators=(",", ":"))

    def unmarshal(self, stored: str) -> Any:
        return json.loads(stored)


# ---------------------------------------------------------------------------
# msgpack (public spec: https://msgpack.org) — canonical subset
# ---------------------------------------------------------------------------


def _mp_encode(obj: Any, out: bytearray) -> None:
    if obj is None:
        out.append(0xC0)
    elif obj is False:
        out.append(0xC2)
    elif obj is True:
        out.append(0xC3)
    elif isinstance(obj, int):
        if not -(2**63) <= obj < 2**64:
            raise ValueError(
                f"msgpack: int {obj} outside the 64-bit wire range "
                "(int64..uint64) — the format cannot represent it"
            )
        if 0 <= obj <= 0x7F:
            out.append(obj)
        elif -32 <= obj < 0:
            out.append(0x100 + obj)
        elif 0 <= obj <= 0xFF:
            out += bytes([0xCC, obj])
        elif 0 <= obj <= 0xFFFF:
            out += b"\xcd" + struct.pack(">H", obj)
        elif 0 <= obj <= 0xFFFFFFFF:
            out += b"\xce" + struct.pack(">I", obj)
        elif 0 <= obj:
            out += b"\xcf" + struct.pack(">Q", obj)
        elif obj >= -(2**7):
            out += b"\xd0" + struct.pack(">b", obj)
        elif obj >= -(2**15):
            out += b"\xd1" + struct.pack(">h", obj)
        elif obj >= -(2**31):
            out += b"\xd2" + struct.pack(">i", obj)
        else:
            out += b"\xd3" + struct.pack(">q", obj)
    elif isinstance(obj, float):
        out += b"\xcb" + struct.pack(">d", obj)
    elif isinstance(obj, str):
        b = obj.encode("utf-8")
        n = len(b)
        if n <= 31:
            out.append(0xA0 | n)
        elif n <= 0xFF:
            out += bytes([0xD9, n])
        elif n <= 0xFFFF:
            out += b"\xda" + struct.pack(">H", n)
        else:
            out += b"\xdb" + struct.pack(">I", n)
        out += b
    elif isinstance(obj, (bytes, bytearray)):
        n = len(obj)
        if n <= 0xFF:
            out += bytes([0xC4, n])
        elif n <= 0xFFFF:
            out += b"\xc5" + struct.pack(">H", n)
        else:
            out += b"\xc6" + struct.pack(">I", n)
        out += bytes(obj)
    elif isinstance(obj, (list, tuple)):
        n = len(obj)
        if n <= 15:
            out.append(0x90 | n)
        elif n <= 0xFFFF:
            out += b"\xdc" + struct.pack(">H", n)
        else:
            out += b"\xdd" + struct.pack(">I", n)
        for item in obj:
            _mp_encode(item, out)
    elif isinstance(obj, dict):
        n = len(obj)
        if n <= 15:
            out.append(0x80 | n)
        elif n <= 0xFFFF:
            out += b"\xde" + struct.pack(">H", n)
        else:
            out += b"\xdf" + struct.pack(">I", n)
        for k in sorted(obj):  # canonical: deterministic key order
            _mp_encode(k, out)
            _mp_encode(obj[k], out)
    else:
        raise TypeError(f"msgpack: unsupported type {type(obj)!r}")


def _mp_decode(buf: memoryview, pos: int):
    b = buf[pos]
    pos += 1
    if b <= 0x7F:
        return b, pos
    if b >= 0xE0:
        return b - 0x100, pos
    if 0x80 <= b <= 0x8F:
        return _mp_map(buf, pos, b & 0x0F)
    if 0x90 <= b <= 0x9F:
        return _mp_arr(buf, pos, b & 0x0F)
    if 0xA0 <= b <= 0xBF:
        n = b & 0x1F
        return bytes(buf[pos : pos + n]).decode("utf-8"), pos + n
    if b == 0xC0:
        return None, pos
    if b == 0xC2:
        return False, pos
    if b == 0xC3:
        return True, pos
    if b in (0xC4, 0xC5, 0xC6):
        w = {0xC4: "B", 0xC5: ">H", 0xC6: ">I"}[b]
        sz = struct.calcsize(w)
        (n,) = struct.unpack_from(w, buf, pos)
        pos += sz
        return bytes(buf[pos : pos + n]), pos + n
    if b == 0xCB:
        (v,) = struct.unpack_from(">d", buf, pos)
        return v, pos + 8
    if b in (0xCC, 0xCD, 0xCE, 0xCF):
        w = {0xCC: "B", 0xCD: ">H", 0xCE: ">I", 0xCF: ">Q"}[b]
        sz = struct.calcsize(w)
        (v,) = struct.unpack_from(w, buf, pos)
        return v, pos + sz
    if b in (0xD0, 0xD1, 0xD2, 0xD3):
        w = {0xD0: "b", 0xD1: ">h", 0xD2: ">i", 0xD3: ">q"}[b]
        sz = struct.calcsize(w)
        (v,) = struct.unpack_from(w, buf, pos)
        return v, pos + sz
    if b in (0xD9, 0xDA, 0xDB):
        w = {0xD9: "B", 0xDA: ">H", 0xDB: ">I"}[b]
        sz = struct.calcsize(w)
        (n,) = struct.unpack_from(w, buf, pos)
        pos += sz
        return bytes(buf[pos : pos + n]).decode("utf-8"), pos + n
    if b in (0xDC, 0xDD):
        w = {0xDC: ">H", 0xDD: ">I"}[b]
        sz = struct.calcsize(w)
        (n,) = struct.unpack_from(w, buf, pos)
        return _mp_arr(buf, pos + sz, n)
    if b in (0xDE, 0xDF):
        w = {0xDE: ">H", 0xDF: ">I"}[b]
        sz = struct.calcsize(w)
        (n,) = struct.unpack_from(w, buf, pos)
        return _mp_map(buf, pos + sz, n)
    raise ValueError(f"msgpack: bad type byte 0x{b:02x}")


def _mp_arr(buf, pos, n):
    out = []
    for _ in range(n):
        v, pos = _mp_decode(buf, pos)
        out.append(v)
    return out, pos


def _mp_map(buf, pos, n):
    out = {}
    for _ in range(n):
        k, pos = _mp_decode(buf, pos)
        v, pos = _mp_decode(buf, pos)
        out[k] = v
    return out, pos


class MsgpackCodec(Codec):
    """Canonical msgpack (reference ``codec/msgpack/msgpack.go:20-76``)."""

    storage_type = BinaryType()

    def marshal(self, value: Any) -> bytes:
        out = bytearray()
        _mp_encode(value, out)
        return bytes(out)

    def unmarshal(self, stored) -> Any:
        v, pos = _mp_decode(memoryview(bytes(stored)), 0)
        if pos != len(stored):
            raise ValueError("msgpack: trailing bytes")
        return v


# ---------------------------------------------------------------------------
# CBOR (RFC 8949) — canonical subset
# ---------------------------------------------------------------------------


def _cbor_head(major: int, n: int, out: bytearray) -> None:
    if n < 24:
        out.append((major << 5) | n)
    elif n <= 0xFF:
        out += bytes([(major << 5) | 24, n])
    elif n <= 0xFFFF:
        out += bytes([(major << 5) | 25]) + struct.pack(">H", n)
    elif n <= 0xFFFFFFFF:
        out += bytes([(major << 5) | 26]) + struct.pack(">I", n)
    else:
        out += bytes([(major << 5) | 27]) + struct.pack(">Q", n)


def _cbor_encode(obj: Any, out: bytearray) -> None:
    if obj is None:
        out.append(0xF6)
    elif obj is False:
        out.append(0xF4)
    elif obj is True:
        out.append(0xF5)
    elif isinstance(obj, int):
        if not -(2**64) <= obj < 2**64:
            raise ValueError(
                f"cbor: int {obj} outside the 64-bit wire range "
                "(major-0/1 argument is at most uint64)"
            )
        if obj >= 0:
            _cbor_head(0, obj, out)
        else:
            _cbor_head(1, -1 - obj, out)
    elif isinstance(obj, float):
        out += b"\xfb" + struct.pack(">d", obj)
    elif isinstance(obj, (bytes, bytearray)):
        _cbor_head(2, len(obj), out)
        out += bytes(obj)
    elif isinstance(obj, str):
        b = obj.encode("utf-8")
        _cbor_head(3, len(b), out)
        out += b
    elif isinstance(obj, (list, tuple)):
        _cbor_head(4, len(obj), out)
        for item in obj:
            _cbor_encode(item, out)
    elif isinstance(obj, dict):
        _cbor_head(5, len(obj), out)
        for k in sorted(obj):
            _cbor_encode(k, out)
            _cbor_encode(obj[k], out)
    else:
        raise TypeError(f"cbor: unsupported type {type(obj)!r}")


def _cbor_decode(buf: memoryview, pos: int):
    ib = buf[pos]
    pos += 1
    major, info = ib >> 5, ib & 0x1F
    if major == 7:
        if ib == 0xF4:
            return False, pos
        if ib == 0xF5:
            return True, pos
        if ib == 0xF6:
            return None, pos
        if ib == 0xFB:
            (v,) = struct.unpack_from(">d", buf, pos)
            return v, pos + 8
        raise ValueError(f"cbor: unsupported simple 0x{ib:02x}")
    if info < 24:
        n = info
    elif info == 24:
        n = buf[pos]
        pos += 1
    elif info == 25:
        (n,) = struct.unpack_from(">H", buf, pos)
        pos += 2
    elif info == 26:
        (n,) = struct.unpack_from(">I", buf, pos)
        pos += 4
    elif info == 27:
        (n,) = struct.unpack_from(">Q", buf, pos)
        pos += 8
    else:
        raise ValueError("cbor: indefinite lengths not supported")
    if major == 0:
        return n, pos
    if major == 1:
        return -1 - n, pos
    if major == 2:
        return bytes(buf[pos : pos + n]), pos + n
    if major == 3:
        return bytes(buf[pos : pos + n]).decode("utf-8"), pos + n
    if major == 4:
        out = []
        for _ in range(n):
            v, pos = _cbor_decode(buf, pos)
            out.append(v)
        return out, pos
    if major == 5:
        m = {}
        for _ in range(n):
            k, pos = _cbor_decode(buf, pos)
            v, pos = _cbor_decode(buf, pos)
            m[k] = v
        return m, pos
    raise ValueError(f"cbor: bad major {major}")


class CborCodec(Codec):
    """Canonical CBOR (reference ``codec/cbor/cbor.go:19-76``; the
    reference's struct-to-array mode maps Python-side to encoding a
    list instead of a dict — callers choose the shape)."""

    storage_type = BinaryType()

    def marshal(self, value: Any) -> bytes:
        out = bytearray()
        _cbor_encode(value, out)
        return bytes(out)

    def unmarshal(self, stored) -> Any:
        v, pos = _cbor_decode(memoryview(bytes(stored)), 0)
        if pos != len(stored):
            raise ValueError("cbor: trailing bytes")
        return v


# ---------------------------------------------------------------------------
# Typed (schema-bound) mode — the reference's "tipe" binding
# ---------------------------------------------------------------------------
#
# Reference: ``codec.go:12-31`` binds each codec instance to a Go type
# and unmarshals into typed values; the CBOR implementation encodes
# structs in struct-to-array mode (``codec/cbor/cbor.go:19-76``), the
# msgpack/JSON ones as maps. Here the "tipe" is a Spark ``StructType``:
# marshal validates+projects a dict (or Row) against the schema and
# emits the canonical wire value; unmarshal decodes and coerces each
# field back to the schema's Python value shape, so round-trips are
# typed both directions instead of whatever-the-wire-held.


def _check_field(name: str, dt: T_mod.DataType, v: Any, array_mode: bool = False) -> Any:
    """Validate/coerce a Python value against a Spark type on the way
    IN (marshal): wrong shapes raise TypeError with the field path."""
    if v is None:
        return None
    t = T_mod
    if isinstance(dt, (t.LongType, t.IntegerType, t.ShortType, t.ByteType)):
        if isinstance(v, bool) or not isinstance(v, int):
            raise TypeError(f"{name}: want int, got {type(v).__name__}")
        return int(v)
    if isinstance(dt, (t.DoubleType, t.FloatType)):
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            raise TypeError(f"{name}: want float, got {type(v).__name__}")
        return float(v)
    if isinstance(dt, t.BooleanType):
        if not isinstance(v, bool):
            raise TypeError(f"{name}: want bool, got {type(v).__name__}")
        return v
    if isinstance(dt, t.StringType):
        if not isinstance(v, str):
            raise TypeError(f"{name}: want str, got {type(v).__name__}")
        return v
    if isinstance(dt, t.BinaryType):
        if not isinstance(v, (bytes, bytearray)):
            raise TypeError(f"{name}: want bytes, got {type(v).__name__}")
        return bytes(v)
    if isinstance(dt, t.ArrayType):
        if not isinstance(v, (list, tuple)):
            raise TypeError(f"{name}: want list, got {type(v).__name__}")
        return [
            _check_field(f"{name}[{i}]", dt.elementType, x, array_mode)
            for i, x in enumerate(v)
        ]
    if isinstance(dt, t.MapType):
        if not isinstance(v, dict):
            raise TypeError(f"{name}: want dict, got {type(v).__name__}")
        return {
            _check_field(f"{name}.key", dt.keyType, k, array_mode): _check_field(
                f"{name}[{k!r}]", dt.valueType, x, array_mode
            )
            for k, x in v.items()
        }
    if isinstance(dt, t.StructType):
        # nested structs inherit the codec's layout (struct-to-array
        # is recursive in the reference)
        return _struct_to_wire(v, dt, array_mode=array_mode, path=name)
    raise TypeError(f"{name}: unsupported Spark type {dt.simpleString()}")


def _coerce_field(dt: T_mod.DataType, v: Any) -> Any:
    """Coerce a decoded wire value back to the schema's Python shape
    on the way OUT (unmarshal) — e.g. an int wire value in a double
    field becomes float, CBOR's bytes-vs-str split is normalized.
    Coercions are NARROW: only numeric-to-numeric widening and the
    bytes/str normalization are allowed — ``int("12")``-style string
    parsing or bool-as-number would silently accept a corrupt or
    misaligned wire value that the marshal side could never have
    produced (the same strictness the reference's typed unmarshal
    enforces by unmarshaling into a concrete Go field type)."""
    if v is None:
        return None
    t = T_mod
    if isinstance(dt, (t.LongType, t.IntegerType, t.ShortType, t.ByteType)):
        if isinstance(v, bool) or not isinstance(v, int):
            raise ValueError(
                f"cannot coerce wire value of type {type(v).__name__} to int"
            )
        return v
    if isinstance(dt, (t.DoubleType, t.FloatType)):
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            raise ValueError(
                f"cannot coerce wire value of type {type(v).__name__} to float"
            )
        return float(v)
    if isinstance(dt, t.BooleanType):
        if not isinstance(v, bool):
            raise ValueError(
                f"cannot coerce wire value of type {type(v).__name__} to bool"
            )
        return v
    if isinstance(dt, t.StringType):
        if isinstance(v, str):
            return v
        # Only byte-like wire values may coerce to string — bytes(int)
        # would silently yield a NUL-padded string for a corrupt value.
        if isinstance(v, (bytes, bytearray)):
            return bytes(v).decode("utf-8")
        raise ValueError(
            f"cannot coerce wire value of type {type(v).__name__} to string"
        )
    if isinstance(dt, t.BinaryType):
        return bytes(v) if not isinstance(v, str) else v.encode("utf-8")
    if isinstance(dt, t.ArrayType):
        return [_coerce_field(dt.elementType, x) for x in v]
    if isinstance(dt, t.MapType):
        return {
            _coerce_field(dt.keyType, k): _coerce_field(dt.valueType, x)
            for k, x in v.items()
        }
    if isinstance(dt, t.StructType):
        return _wire_to_struct(v, dt, array_mode=isinstance(v, (list, tuple)))
    return v


def _struct_to_wire(
    value: Any, schema: "T_mod.StructType", array_mode: bool, path: str = ""
):
    if hasattr(value, "asDict"):  # pyspark Row
        value = value.asDict(recursive=False)
    if not isinstance(value, dict):
        raise TypeError(f"{path or 'value'}: want dict/Row, got {type(value).__name__}")
    extra = set(value) - {f.name for f in schema.fields}
    if extra:
        raise TypeError(f"{path or 'value'}: fields not in schema: {sorted(extra)}")
    checked = {
        f.name: _check_field(f"{path}.{f.name}" if path else f.name, f.dataType,
                             value.get(f.name), array_mode)
        for f in schema.fields
    }
    if array_mode:  # struct-to-array: schema field order IS the layout
        return [checked[f.name] for f in schema.fields]
    return checked


def _wire_to_struct(wire: Any, schema: "T_mod.StructType", array_mode: bool):
    if array_mode:
        if not isinstance(wire, (list, tuple)) or len(wire) != len(schema.fields):
            raise ValueError(
                f"typed decode: want {len(schema.fields)}-element array, got {wire!r}"
            )
        return {
            f.name: _coerce_field(f.dataType, v)
            for f, v in zip(schema.fields, wire)
        }
    if not isinstance(wire, dict):
        raise ValueError(f"typed decode: want map, got {type(wire).__name__}")
    return {f.name: _coerce_field(f.dataType, wire.get(f.name)) for f in schema.fields}


class TypedMsgpackCodec(Codec):
    """Schema-bound canonical msgpack: structs as sorted-key maps,
    every field validated against the bound ``StructType`` on marshal
    and coerced back to it on unmarshal (the reference's typed-codec
    binding, ``codec.go:12-31`` + ``codec/msgpack/msgpack.go:20-76``)."""

    storage_type = BinaryType()

    def __init__(self, schema: "T_mod.StructType"):
        self.schema = schema
        self._inner = MsgpackCodec()

    def marshal(self, value: Any) -> bytes:
        return self._inner.marshal(_struct_to_wire(value, self.schema, array_mode=False))

    def unmarshal(self, stored) -> Any:
        return _wire_to_struct(self._inner.unmarshal(stored), self.schema, array_mode=False)


class TypedCborCodec(Codec):
    """Schema-bound CBOR in struct-to-array mode: the top-level (and
    any nested) struct is encoded as a CBOR array in schema field
    order — the reference's space-saving layout
    (``codec/cbor/cbor.go:19-76``) — and decoded back into a typed
    dict by position."""

    storage_type = BinaryType()

    def __init__(self, schema: "T_mod.StructType"):
        self.schema = schema
        self._inner = CborCodec()

    def marshal(self, value: Any) -> bytes:
        return self._inner.marshal(_struct_to_wire(value, self.schema, array_mode=True))

    def unmarshal(self, stored) -> Any:
        return _wire_to_struct(self._inner.unmarshal(stored), self.schema, array_mode=True)
