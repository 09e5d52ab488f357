"""Real media codecs, stdlib-only: PNG (zlib + struct) and WAV
(RIFF/PCM via struct). These make the multimodal decode path REAL for
the formats a pure-Python environment can handle — no Pillow, no
libsndfile. Baseline JPEG lives in ``operators.jpeg`` (stdlib+numpy);
only video formats — which genuinely need native codecs — remain
explicit ``NotImplementedError`` stubs in ``operators.multimodal``.

Everything here is deterministic byte-level encode/decode, usable
inside Arrow-batched pandas kernels. The encoders exist so tests and
contract queries can synthesize *real* files whose pixel/sample
content is a closed-form function of the row — the DuckDB oracle then
recomputes the expected statistics arithmetically while Spark runs the
actual encode → decode → aggregate pipeline, so any bug in either
codec direction hash-mismatches.

PNG subset: 8-bit greyscale (color type 0), RGB (2), RGBA (6);
non-interlaced; all five scanline filters (None/Sub/Up/Average/Paeth)
on decode, filter 0 on encode. That covers what png encoders in the
wild emit for the common cases. WAV subset: PCM 16-bit little-endian,
any rate/channels.
"""

from __future__ import annotations

import struct
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_WAV_SIG = b"RIFF"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # PNG color type -> samples/pixel


def _chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def encode_png(width: int, height: int, pixels: bytes, color_type: int = 0) -> bytes:
    """Minimal non-interlaced 8-bit PNG. ``pixels`` is the raw sample
    stream, row-major, ``width*height*channels`` bytes (channels per
    ``color_type``: 0=grey(1), 2=rgb(3), 6=rgba(4))."""
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported color type: {color_type}")
    ch = _CHANNELS[color_type]
    if len(pixels) != width * height * ch:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, want {width}x{height}x{ch}"
        )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    stride = width * ch
    raw = bytearray()
    for y in range(height):
        raw.append(0)  # filter type None per scanline
        raw += pixels[y * stride : (y + 1) * stride]
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def png_meta(blob: bytes):
    """(width, height, bit_depth, color_type, channels) from IHDR, or
    None if not a PNG."""
    if blob is None or len(blob) < 33 or bytes(blob[:8]) != _PNG_SIG:
        return None
    if bytes(blob[12:16]) != b"IHDR":
        return None
    w, h, depth, ctype = struct.unpack(">IIBB", bytes(blob[16:26]))
    return w, h, depth, ctype, _CHANNELS.get(ctype)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(blob: bytes) -> tuple[int, int, int, bytes]:
    """(width, height, channels, samples): full decode of the 8-bit
    subset — chunk walk, zlib inflate, per-scanline unfilter (all five
    filter types). Raises ValueError on non-PNG or unsupported
    depth/interlace."""
    meta = png_meta(blob)
    if meta is None:
        raise ValueError("not a PNG")
    try:
        return _decode_png_inner(blob, meta)
    except (struct.error, IndexError, zlib.error) as e:
        # zlib.error included: a corrupt IDAT stream must surface as
        # the documented ValueError, not leak the zlib internal
        raise ValueError(f"png: truncated or corrupt stream: {e!r}") from e


def _decode_png_inner(blob: bytes, meta) -> tuple[int, int, int, bytes]:
    w, h, depth, ctype, ch = meta
    if depth != 8 or ch is None:
        raise ValueError(f"unsupported PNG: depth={depth} color_type={ctype}")
    interlace = blob[28]
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    # chunk walk: concatenate IDAT payloads
    pos, idat = 8, bytearray()
    n = len(blob)
    while pos + 8 <= n:
        (ln,) = struct.unpack(">I", bytes(blob[pos : pos + 4]))
        tag = bytes(blob[pos + 4 : pos + 8])
        payload = bytes(blob[pos + 8 : pos + 8 + ln])
        if tag == b"IDAT":
            idat += payload
        pos += 12 + ln
        if tag == b"IEND":
            break
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != (stride + 1) * h:
        raise ValueError("PNG data length mismatch")
    out = bytearray(stride * h)
    prev = bytes(stride)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ftype == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = bytes(line)
    return w, h, ch, bytes(out)


def encode_wav(sample_rate: int, samples, channels: int = 1) -> bytes:
    """PCM 16-bit little-endian WAV. ``samples`` is a flat iterable of
    int16 values, channel-interleaved; its length must be a multiple
    of ``channels`` (generators are materialized)."""
    samples = list(samples)
    if channels < 1:
        raise ValueError(f"channels must be >= 1: {channels}")
    if len(samples) % channels:
        raise ValueError("sample count not a multiple of channels")
    try:
        data = struct.pack(f"<{len(samples)}h", *samples)
    except struct.error as e:
        raise ValueError(
            f"wav: sample outside the int16 range [-32768, 32767]: {e}"
        ) from e
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_meta(blob: bytes):
    """(sample_rate, n_frames, channels) from the RIFF headers, or
    None if not a PCM16 WAV."""
    if blob is None or len(blob) < 12 or bytes(blob[:4]) != _WAV_SIG:
        return None
    if bytes(blob[8:12]) != b"WAVE":
        return None
    pos, n = 12, len(blob)
    rate = channels = None
    data_len = 0
    while pos + 8 <= n:
        tag = bytes(blob[pos : pos + 4])
        (ln,) = struct.unpack("<I", bytes(blob[pos + 4 : pos + 8]))
        if tag == b"fmt ":
            if pos + 16 > n:  # truncated fmt chunk: not a parseable WAV
                return None
            fmt_code, channels, rate = struct.unpack(
                "<HHI", bytes(blob[pos + 8 : pos + 16])
            )
            if fmt_code != 1:
                return None
        elif tag == b"data":
            # ACCUMULATE: decode_wav concatenates every data chunk, so
            # the frame count must too (a last-chunk-wins here made
            # meta disagree with decode on multi-data-chunk files)
            data_len += ln
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if rate is None or channels in (None, 0):
        return None
    return rate, data_len // (2 * channels), channels


def decode_wav(blob: bytes) -> tuple[int, int, list[int]]:
    """(sample_rate, channels, samples): PCM16 decode; ``samples`` is
    the flat channel-interleaved int16 list."""
    meta = wav_meta(blob)
    if meta is None:
        raise ValueError("not a PCM16 WAV")
    rate, _, channels = meta
    pos, n = 12, len(blob)
    samples: list[int] = []
    while pos + 8 <= n:
        tag = bytes(blob[pos : pos + 4])
        (ln,) = struct.unpack("<I", bytes(blob[pos + 4 : pos + 8]))
        if tag == b"data":
            if pos + 8 + ln > n:  # header claims more than is present
                raise ValueError("wav: truncated data chunk")
            if ln % 2:  # PCM16 data must be whole int16s
                raise ValueError(f"wav: odd data chunk length {ln}")
            samples.extend(
                struct.unpack(f"<{ln // 2}h", bytes(blob[pos + 8 : pos + 8 + ln]))
            )
        pos += 8 + ln + (ln & 1)
    return rate, channels, samples
