"""MP4/AVI container metadata: encode→parse round trips, fuzz
hardening (malformed sizes classify as None, never crash or hang),
and the Spark extract_video_meta surface."""

import random
import struct

from pyspark.sql import functions as F

from margaret_spark.operators.video_containers import (
    attach_synthetic_video_blobs,
    avi_meta,
    encode_avi_stub,
    encode_mp4_stub,
    extract_video_meta,
    mp4_meta,
)


def test_mp4_round_trip():
    b = encode_mp4_stub(1000, 5500, [("vide", 640, 360), ("soun", 0, 0)])
    brand, dur, n_tracks, w, h, hv, ha = mp4_meta(b)
    assert (brand, dur, n_tracks, w, h, hv, ha) == (
        "isom", 5.5, 2, 640, 360, True, True,
    )
    # audio-only: no video dims
    b2 = encode_mp4_stub(90000, 90000 * 3, [("soun", 0, 0)])
    brand, dur, n_tracks, w, h, hv, ha = mp4_meta(b2)
    assert (dur, n_tracks, w, h, hv, ha) == (3.0, 1, None, None, False, True)


def test_mp4_version1_and_size_edge_cases():
    # version-1 mvhd (64-bit times) — hand-build: ftyp + moov(mvhd v1)
    def box(t, p):
        return struct.pack(">I", 8 + len(p)) + t + p

    mvhd1 = box(
        b"mvhd",
        struct.pack(">B3x", 1)
        + struct.pack(">QQIQ", 0, 0, 48000, 48000 * 7)
        + b"\x00" * 80,
    )
    blob = box(b"ftyp", b"iso6" + b"\x00" * 4 + b"iso6") + box(b"moov", mvhd1)
    brand, dur, n_tracks, *_ = mp4_meta(blob)
    assert (brand, dur, n_tracks) == ("iso6", 7.0, 0)

    # size==0 (box to end of scope) must terminate, not loop
    blob0 = box(b"ftyp", b"isom" + b"\x00" * 8)
    blob0 += struct.pack(">I", 0) + b"free" + b"\x00" * 4
    assert mp4_meta(blob0) is not None

    # largesize (size==1, u64 follows)
    payload = b"isom" + b"\x00" * 4 + b"isom"
    large = struct.pack(">I", 1) + b"ftyp" + struct.pack(">Q", 16 + len(payload)) + payload
    assert mp4_meta(large + box(b"moov", mvhd1))[1] == 7.0


def test_avi_round_trip():
    b = encode_avi_stub(40000, 250, 320, 240, n_streams=2)
    dur, total, streams, w, h = avi_meta(b)
    assert (dur, total, streams, w, h) == (10.0, 250, 2, 320, 240)
    # zero frame period -> no duration, rest parsed
    b2 = encode_avi_stub(0, 99, 64, 48)
    assert avi_meta(b2) == (None, 99, 1, 64, 48)


def test_container_parsers_fuzz_hardened():
    rng = random.Random(7)
    mp4 = encode_mp4_stub(1000, 1234, [("vide", 100, 80)])
    avi = encode_avi_stub(33333, 77, 128, 96)
    # random garbage: classify (None) or parse, never raise
    for _ in range(3000):
        blob = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 160)))
        mp4_meta(blob)
        avi_meta(blob)
    # every truncation of valid files
    for i in range(len(mp4)):
        mp4_meta(mp4[:i])
    for i in range(len(avi)):
        avi_meta(avi[:i])
    # bit flips in the size fields (the executor-hang class)
    for off in (0, 4, 8, 12, 40, 41):
        for flip in (0x01, 0x80, 0xFF):
            m = bytearray(mp4)
            m[off % len(m)] ^= flip
            mp4_meta(bytes(m))
            a = bytearray(avi)
            a[off % len(a)] ^= flip
            avi_meta(bytes(a))
    # wrong magic
    assert mp4_meta(b"\x00" * 64) is None
    assert avi_meta(b"RIFF" + b"\x10\x00\x00\x00" + b"WAVE" + b"\x00" * 16) is None


def test_extract_video_meta_spark(spark):
    df = spark.range(0, 12).select(F.col("id").alias("doc_id"))
    meta = extract_video_meta(
        attach_synthetic_video_blobs(df, "doc_id"), "doc_id", "blob"
    ).collect()
    by_id = {r["doc_id"]: r for r in meta}
    assert len(by_id) == 12
    for i in range(12):
        r = by_id[i]
        if i % 3 == 0:
            assert r["container"] == "mp4"
            assert r["duration_s"] == (i % 9000 + 500) / 1000.0
            assert r["n_tracks"] == (2 if i % 2 == 0 else 1)
            assert r["width"] == (i % 80) * 8 + 128
        elif i % 3 == 1:
            assert r["container"] == "avi"
            assert r["n_tracks"] == i % 2 + 1
            assert r["height"] == (i % 54) * 4 + 120
        else:
            assert r["container"] is None and r["duration_s"] is None
        assert r["n_bytes"] > 0
    # plumbing is partition-preserving: no exchange in the plan
    from margaret_spark.plans.inspect import explain_str

    plan = explain_str(
        extract_video_meta(
            attach_synthetic_video_blobs(df, "doc_id"), "doc_id", "blob"
        )
    )
    assert "Exchange" not in plan
