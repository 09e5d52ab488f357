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
    """Canonical JSON (sorted keys, compact separators)."""

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
