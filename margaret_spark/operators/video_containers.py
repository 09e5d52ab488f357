"""Video CONTAINER metadata — MP4 (ISO BMFF, ISO/IEC 14496-12) and
AVI (Microsoft RIFF) — parsed with stdlib struct only.

This closes the 90% pipeline need for video columns (filtering and
stats over duration / resolution / track layout) without native
codecs: a curation pipeline drops 2-second clips, buckets by
resolution, and reports per-source durations from the container
header alone. FRAME decode stays out of scope by documented design
(``multimodal.sample_video_frames``) — it genuinely needs codec
libraries absent from this environment.

Both parsers are fuzz-hardened the same way the image/audio ones are
(a garbage blob once parsed as a billion-frame fake header and hung
an executor): every size field is validated against the actual blob
length, traversal is iteration-capped, and malformed input yields
``None`` (classify-don't-crash, like ``png_meta``/``wav_meta``).

Encoders exist so the plumbing is testable against closed-form truth:
they synthesize minimal-but-structurally-valid containers (real box
layout, no media payload), the exact analog of
``media_codecs.encode_png`` for the test surface.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

#: Traversal bound: no legitimate top-level/child walk needs more.
_MAX_BOXES = 4096


# ---------------------------------------------------------------------------
# MP4 / ISO BMFF
# ---------------------------------------------------------------------------


def _box(type4: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + type4 + payload


def encode_mp4_stub(
    timescale: int,
    duration: int,
    tracks: list[tuple[str, int, int]],
    brand: bytes = b"isom",
) -> bytes:
    """Minimal structurally-valid MP4: ftyp + moov(mvhd, trak*) with
    version-0 boxes and no media data. ``tracks`` is a list of
    (handler, width, height) — handler ``"vide"`` or ``"soun"``
    (width/height are ignored for sound tracks, as in real files)."""
    ftyp = _box(b"ftyp", brand + struct.pack(">I", 0) + brand)
    mvhd = _box(
        b"mvhd",
        struct.pack(">B3x", 0)  # version 0 + flags
        + struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">i", 0x00010000)  # rate 1.0
        + struct.pack(">hH", 0x0100, 0)  # volume 1.0 + reserved
        + b"\x00" * 8  # reserved
        + struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24  # pre_defined
        + struct.pack(">I", len(tracks) + 1),  # next_track_ID
    )
    traks = []
    for tid, (handler, w, h) in enumerate(tracks, start=1):
        is_video = handler == "vide"
        tkhd = _box(
            b"tkhd",
            struct.pack(">B3B", 0, 0, 0, 7)  # version 0, flags: enabled
            + struct.pack(">IIIxxxxI", 0, 0, tid, duration)
            + b"\x00" * 8  # reserved
            + struct.pack(">hhhh", 0, 0, 0, 0)  # layer/alt/volume/reserved
            + struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", (w if is_video else 0) << 16, (h if is_video else 0) << 16),
        )
        mdhd = _box(
            b"mdhd",
            struct.pack(">B3x", 0)
            + struct.pack(">IIII", 0, 0, timescale, duration)
            + struct.pack(">HH", 0x55C4, 0),  # language 'und'
        )
        hdlr = _box(
            b"hdlr",
            struct.pack(">I", 0)  # version + flags
            + struct.pack(">I", 0)  # pre_defined
            + handler.encode("ascii")
            + b"\x00" * 12
            + b"\x00",  # empty name
        )
        mdia = _box(b"mdia", mdhd + hdlr)
        traks.append(_box(b"trak", tkhd + mdia))
    moov = _box(b"moov", mvhd + b"".join(traks))
    return ftyp + moov + _box(b"free", b"")


def _iter_boxes(buf: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for the box sequence in
    buf[start:end]; stops (rather than raising) on any malformed size."""
    pos = start
    n = 0
    while pos + 8 <= end and n < _MAX_BOXES:
        size = struct.unpack_from(">I", buf, pos)[0]
        typ = buf[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                return
            size = struct.unpack_from(">Q", buf, pos + 8)[0]
            hdr = 16
        elif size == 0:
            size = end - pos  # box extends to end of enclosing scope
        if size < hdr or pos + size > end:
            return
        yield typ, pos + hdr, pos + size
        pos += size
        n += 1


def _mvhd_meta(buf: bytes, s: int, e: int):
    if s + 4 > e:
        return None
    version = buf[s]
    if version == 0:
        if s + 20 > e:
            return None
        timescale, duration = struct.unpack_from(">II", buf, s + 12)
    elif version == 1:
        if s + 32 > e:
            return None
        timescale = struct.unpack_from(">I", buf, s + 20)[0]
        duration = struct.unpack_from(">Q", buf, s + 24)[0]
    else:
        return None
    return timescale, duration


def _trak_meta(buf: bytes, s: int, e: int):
    """(handler, width, height) for one trak box (width/height from
    tkhd's 16.16 fixed-point fields, integer part only)."""
    handler, w, h = None, None, None
    for typ, cs, ce in _iter_boxes(buf, s, e):
        if typ == b"tkhd" and ce - cs >= 4:
            version = buf[cs]
            # width/height are the LAST 8 bytes of tkhd in both versions
            if ce - cs >= (84 if version == 0 else 96):
                wfx, hfx = struct.unpack_from(">II", buf, ce - 8)
                w, h = wfx >> 16, hfx >> 16
        elif typ == b"mdia":
            for t2, ds, de in _iter_boxes(buf, cs, ce):
                if t2 == b"hdlr" and de - ds >= 12:
                    handler = buf[ds + 8 : ds + 12].decode("ascii", "replace")
    return handler, w, h


def mp4_meta(blob: bytes):
    """Parse an ISO BMFF blob's container metadata.

    Returns ``(brand, duration_s, n_tracks, width, height, has_video,
    has_audio)`` or ``None`` if the blob is not an MP4 —
    (width, height) come from the FIRST video track; ``duration_s`` is
    mvhd duration/timescale (None if timescale is 0)."""
    if blob is None or len(blob) < 16:
        return None
    buf = bytes(blob)
    # an ISO BMFF file starts with a well-formed box whose type is a
    # known leader (ftyp in anything modern)
    if buf[4:8] != b"ftyp":
        return None
    brand = None
    duration_s = None
    n_tracks = 0
    width = height = None
    has_video = has_audio = False
    for typ, s, e in _iter_boxes(buf, 0, len(buf)):
        if typ == b"ftyp" and e - s >= 4:
            brand = buf[s : s + 4].decode("ascii", "replace").strip()
        elif typ == b"moov":
            for t2, cs, ce in _iter_boxes(buf, s, e):
                if t2 == b"mvhd":
                    m = _mvhd_meta(buf, cs, ce)
                    if m and m[0] > 0:
                        duration_s = m[1] / m[0]
                elif t2 == b"trak":
                    n_tracks += 1
                    handler, w, h = _trak_meta(buf, cs, ce)
                    if handler == "vide":
                        has_video = True
                        if width is None:
                            width, height = w, h
                    elif handler == "soun":
                        has_audio = True
    return brand, duration_s, n_tracks, width, height, has_video, has_audio


# ---------------------------------------------------------------------------
# AVI / RIFF
# ---------------------------------------------------------------------------


def encode_avi_stub(
    usec_per_frame: int,
    total_frames: int,
    width: int,
    height: int,
    n_streams: int = 1,
) -> bytes:
    """Minimal structurally-valid AVI: RIFF('AVI ') with an hdrl LIST
    holding the MainAVIHeader (avih) and an empty movi LIST."""
    avih = b"avih" + struct.pack(
        "<I14I",
        56,  # cb: struct size
        usec_per_frame, 0, 0, 0x10, total_frames, 0, n_streams, 0,
        width, height, 0, 0, 0, 0,
    )
    hdrl = b"LIST" + struct.pack("<I", 4 + len(avih)) + b"hdrl" + avih
    movi = b"LIST" + struct.pack("<I", 4) + b"movi"
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_avi_mjpeg(
    usec_per_frame: int,
    frames: list[bytes],
    width: int,
    height: int,
) -> bytes:
    """A REAL playable-layout MJPEG-in-AVI: RIFF('AVI ') with an hdrl
    LIST (avih MainAVIHeader + one strl LIST holding an
    AVISTREAMHEADER with fccType 'vids' / fccHandler 'MJPG' and a
    BITMAPINFOHEADER strf with biCompression 'MJPG') and a movi LIST
    carrying one ``00dc`` chunk per frame. Each ``frames`` entry must
    be a complete baseline JPEG (``operators.jpeg.encode_jpeg``) —
    MJPEG is, by definition, a sequence of independently-coded JPEG
    frames, which is exactly why this container is frame-decodable
    with the repo's from-scratch JPEG codec and no native libraries."""
    avih = b"avih" + struct.pack(
        "<I14I",
        56,  # cb: struct size
        usec_per_frame, 0, 0, 0x10, len(frames), 0, 1, 0,
        width, height, 0, 0, 0, 0,
    )
    strh = b"strh" + struct.pack(
        "<I4s4sIHHIIIIIIII4h",
        56,  # cb
        b"vids", b"MJPG",
        0, 0, 0,  # flags, priority, language
        0,  # initial frames
        usec_per_frame, 1_000_000,  # scale, rate: fps = rate/scale
        0, len(frames),  # start, length (in frames)
        max((len(f) for f in frames), default=0),  # suggested buffer
        0xFFFFFFFF, 0,  # quality (default), sample size (varying)
        0, 0, width, height,  # rcFrame
    )
    strf = b"strf" + struct.pack(
        "<I3I2H6I",
        40,  # chunk size: BITMAPINFOHEADER is 40 bytes
        40,  # biSize
        width, height, 1, 24,  # planes, bit count
        struct.unpack("<I", b"MJPG")[0],  # biCompression
        width * height * 3, 0, 0, 0, 0,
    )
    strl = b"LIST" + struct.pack("<I", 4 + len(strh) + len(strf)) + b"strl" + strh + strf
    hdrl_body = b"hdrl" + avih + strl
    hdrl = b"LIST" + struct.pack("<I", len(hdrl_body)) + hdrl_body
    chunks = []
    for f in frames:
        chunks.append(b"00dc" + struct.pack("<I", len(f)) + f)
        if len(f) & 1:
            chunks.append(b"\x00")  # RIFF chunks pad to even
    movi_body = b"movi" + b"".join(chunks)
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def avi_mjpeg_frames(blob: bytes):
    """The ordered video-frame payloads of a RIFF-AVI's movi LIST
    (``##dc``/``##db`` chunks, descending into ``rec `` groups), or
    ``None`` if the blob is not an AVI or any chunk size is malformed
    (classify-don't-crash, size-validated and iteration-capped like
    :func:`avi_meta` — a corrupt movi must not yield a silently
    truncated frame list). The payloads are the raw per-frame streams;
    for MJPEG they are complete baseline JPEGs."""
    if blob is None or len(blob) < 12:
        return None
    buf = bytes(blob)
    if buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        return None
    riff_end = min(len(buf), 8 + struct.unpack_from("<I", buf, 4)[0])
    frames: list[bytes] = []
    # (pos, end, in_movi) scopes; movi itself plus nested 'rec ' groups
    stack = [(12, riff_end, False)]
    n = 0
    while stack:
        pos, end, in_movi = stack.pop()
        while pos + 8 <= end:
            if n >= _MAX_BOXES:
                return None  # iteration bomb: refuse, don't truncate
            n += 1
            ckid = buf[pos : pos + 4]
            cksz = struct.unpack_from("<I", buf, pos + 4)[0]
            if pos + 8 + cksz > end:
                return None  # malformed size: refuse the whole list
            if ckid == b"LIST" and cksz >= 4:
                ltype = buf[pos + 8 : pos + 12]
                if ltype == b"movi" or (in_movi and ltype == b"rec "):
                    # finish this scope later; walk the list first
                    nxt = pos + 8 + cksz + (cksz & 1)
                    if nxt < end:
                        stack.append((nxt, end, in_movi))
                    pos, end, in_movi = pos + 12, pos + 8 + cksz, True
                    continue
            elif in_movi and ckid[2:4] in (b"dc", b"db"):
                frames.append(buf[pos + 8 : pos + 8 + cksz])
            pos += 8 + cksz + (cksz & 1)
    return frames


def avi_meta(blob: bytes):
    """Parse a RIFF-AVI blob's MainAVIHeader.

    Returns ``(duration_s, total_frames, n_streams, width, height)``
    or ``None`` if not an AVI. duration_s = total_frames ·
    usec_per_frame / 1e6 (None when usec_per_frame is 0)."""
    if blob is None or len(blob) < 12:
        return None
    buf = bytes(blob)
    if buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        return None
    riff_end = min(len(buf), 8 + struct.unpack_from("<I", buf, 4)[0])
    pos = 12
    n = 0
    while pos + 8 <= riff_end and n < _MAX_BOXES:
        ckid = buf[pos : pos + 4]
        cksz = struct.unpack_from("<I", buf, pos + 4)[0]
        if pos + 8 + cksz > riff_end:
            return None
        if ckid == b"LIST" and cksz >= 4 and buf[pos + 8 : pos + 12] == b"hdrl":
            # scan the hdrl list for avih
            ipos, iend = pos + 12, pos + 8 + cksz
            m = 0
            while ipos + 8 <= iend and m < _MAX_BOXES:
                cid = buf[ipos : ipos + 4]
                csz = struct.unpack_from("<I", buf, ipos + 4)[0]
                if ipos + 8 + csz > iend:
                    return None
                if cid == b"avih" and csz >= 40:
                    (
                        uspf, _maxbps, _pad, _flags, total, _init,
                        streams, _sug, w, h,
                    ) = struct.unpack_from("<10I", buf, ipos + 8)
                    dur = (total * uspf) / 1_000_000 if uspf else None
                    return dur, total, streams, w, h
                ipos += 8 + csz + (csz & 1)  # RIFF chunks pad to even
                m += 1
            return None
        pos += 8 + cksz + (cksz & 1)
        n += 1
    return None


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

VIDEO_META_SCHEMA = T.StructType(
    [
        T.StructField("container", T.StringType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("n_tracks", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def extract_video_meta(df: DataFrame, id_col: str, blob_col: str) -> DataFrame:
    """(id, container, duration_s, n_tracks, width, height, n_bytes):
    MP4/AVI container-header parse as a partition-preserving
    mapInPandas pass — the same plumbing shape as
    ``extract_image_meta``. Unrecognized blobs classify as NULL
    container (never raise): a curation filter drops them with a
    plain ``WHERE container IS NOT NULL``."""
    from margaret_spark.operators.multimodal import _id_field

    out_schema = T.StructType(
        [_id_field(df, id_col)] + list(VIDEO_META_SCHEMA.fields)
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                id_col: pdf[id_col],
                "container": [],
                "duration_s": [],
                "n_tracks": [],
                "width": [],
                "height": [],
                "n_bytes": [len(b) if b is not None else 0 for b in pdf[blob_col]],
            }
            for b in pdf[blob_col]:
                m = mp4_meta(b)
                if m is not None:
                    _brand, dur, ntr, w, h, _hv, _ha = m
                    vals = ("mp4", dur, ntr, w, h)
                else:
                    a = avi_meta(b)
                    if a is not None:
                        dur, _total, streams, w, h = a
                        vals = ("avi", dur, streams, w, h)
                    else:
                        vals = (None, None, None, None, None)
                for k, v in zip(
                    ("container", "duration_s", "n_tracks", "width", "height"), vals
                ):
                    rows[k].append(v)
            yield pd.DataFrame(rows)

    return df.select(id_col, blob_col).mapInPandas(parse, out_schema)


def attach_synthetic_video_blobs(df: DataFrame, id_col: str) -> DataFrame:
    """(id, blob): a deterministic container per row — the ingest
    fixture for exercising the real parse path end-to-end (the
    analog of ``attach_synthetic_png_blobs``). Closed form by id:

    - ``id % 3 == 0`` → MP4, timescale 1000, duration ``id % 9000 +
      500`` ticks, video track ``(id % 80)·8+128 × (id % 45)·8+96``,
      plus an audio track when ``id`` is even;
    - ``id % 3 == 1`` → AVI, 40000 µs/frame, ``id % 1000 + 25``
      frames, ``(id % 96)·4+160 × (id % 54)·4+120``, ``id % 2 + 1``
      streams;
    - ``id % 3 == 2`` → garbage bytes (NULL container downstream).

    An oracle recomputes every metadata field arithmetically, so the
    encode→parse round trip must be bit-exact to match."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("blob", T.BinaryType()),
        ]
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for i in pdf[id_col]:
                i = int(i)
                if i % 3 == 0:
                    tracks = [("vide", (i % 80) * 8 + 128, (i % 45) * 8 + 96)]
                    if i % 2 == 0:
                        tracks.append(("soun", 0, 0))
                    blobs.append(encode_mp4_stub(1000, i % 9000 + 500, tracks))
                elif i % 3 == 1:
                    blobs.append(
                        encode_avi_stub(
                            40000,
                            i % 1000 + 25,
                            (i % 96) * 4 + 160,
                            (i % 54) * 4 + 120,
                            n_streams=i % 2 + 1,
                        )
                    )
                else:
                    blobs.append(b"not a video container " + str(i).encode())
            yield pd.DataFrame({id_col: pdf[id_col], "blob": blobs})

    return df.select(id_col).mapInPandas(build, out_schema)
