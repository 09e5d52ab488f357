"""MP4/AVI container metadata: encode→parse round trips, fuzz
hardening (malformed sizes classify as None, never crash or hang),
and the Spark extract_video_meta surface."""

import random
import struct

from pyspark.sql import functions as F

from margaret_spark.operators.video_containers import (
    attach_synthetic_video_blobs,
    avi_meta,
    avi_mjpeg_frames,
    encode_avi_mjpeg,
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


def _psnr(a, b):
    import numpy as np

    mse = float(((a.astype(float) - b.astype(float)) ** 2).mean())
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def test_avi_mjpeg_round_trip_and_frame_decode():
    """encode_avi_mjpeg → avi_mjpeg_frames returns the exact JPEG
    payloads in order; each decodes (stdlib codec) to the source
    gradient within the q90 PSNR floor; avi_meta still reads the
    header through the new strl list."""
    import numpy as np

    from margaret_spark.operators.jpeg import decode_jpeg, encode_jpeg

    w, h, nf = 40, 24, 4
    yy, xx = np.mgrid[0:h, 0:w]
    imgs = [((5 * 7 + f * 11 + yy * 3 + xx) % 256).astype(np.uint8) for f in range(nf)]
    frames = [encode_jpeg(im, quality=90) for im in imgs]
    avi = encode_avi_mjpeg(40000, frames, w, h)

    assert avi_meta(avi) == (nf * 0.04, nf, 1, w, h)
    out = avi_mjpeg_frames(avi)
    assert [bytes(f) for f in out] == frames
    for payload, img in zip(out, imgs):
        ww, hh, ch, samples = decode_jpeg(payload)
        dec = np.frombuffer(samples, dtype=np.uint8).reshape(hh, ww)
        assert (ww, hh, ch) == (w, h, 1)
        assert _psnr(dec, img) > 35  # gradient, q90

    # odd-length payloads are even-padded per RIFF and round-trip
    odd = b"\xff\xd8" + b"\x00" * 7
    out2 = avi_mjpeg_frames(encode_avi_mjpeg(1000, [odd, frames[0]], 8, 8))
    assert [bytes(f) for f in out2] == [odd, frames[0]]

    # header-only AVI (no movi frames): empty list, not None
    assert avi_mjpeg_frames(encode_avi_stub(40000, 9, 64, 48)) == []
    # non-AVI / malformed: None, never raise
    assert avi_mjpeg_frames(b"garbage") is None
    for i in range(len(avi)):
        avi_mjpeg_frames(avi[:i])
    for off in (4, 12, 40, len(avi) // 2):
        m = bytearray(avi)
        m[off] ^= 0xFF
        avi_mjpeg_frames(bytes(m))


def test_sample_video_frames_real_mjpeg(spark):
    """The Spark surface end-to-end on REAL MJPEG AVIs: stride
    sampling fans out the right (id, frame_idx) rows, the sampled
    frames are decodable by decode_image, and the decoded pixels meet
    the PSNR floor against the closed-form source gradients."""
    import numpy as np

    from pyspark.sql import functions as F

    from margaret_spark.operators.multimodal import (
        attach_synthetic_mjpeg_avi_blobs,
        decode_image,
        sample_video_frames,
    )

    base = spark.range(0, 6).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3 * 8 + 16).cast("int").alias("w"),
        (F.col("id") % 2 * 8 + 16).cast("int").alias("h"),
        (F.col("id") % 4 + 2).cast("int").alias("nf"),
    )
    blobs = attach_synthetic_mjpeg_avi_blobs(base, "doc_id", "w", "h", "nf")
    frames = sample_video_frames(blobs, "doc_id", "blob", every_n=2)
    got = {(r["doc_id"], r["frame_idx"]) for r in frames.collect()}
    want = {
        (i, f) for i in range(6) for f in range(0, i % 4 + 2, 2)
    }
    assert got == want

    # frames compose with decode_image: real JPEG decode + PSNR floor
    keyed = frames.select(
        (F.col("doc_id") * 16 + F.col("frame_idx")).alias("fid"),
        F.col("doc_id"),
        F.col("frame_idx"),
        F.col("frame"),
    )
    decoded = decode_image(keyed, "fid", "frame").collect()
    assert len(decoded) == len(want)
    for r in decoded:
        i, f = r["fid"] // 16, r["fid"] % 16
        w, h = i % 3 * 8 + 16, i % 2 * 8 + 16
        assert (r["width"], r["height"]) == (w, h)
        yy, xx = np.mgrid[0:h, 0:w]
        src = ((i * 7 + f * 11 + yy * 3 + xx) % 256).astype(np.uint8)
        dec = np.asarray(r["pixels"], dtype=np.uint8).reshape(h, w)
        assert _psnr(dec, src) > 35

    # non-MJPEG AVI frames raise (classify, don't emit garbage)
    import pytest as _pytest

    dib = spark.createDataFrame(
        [(1, encode_avi_mjpeg(1000, [b"\x00\x01notjpeg"], 4, 4))],
        "doc_id long, blob binary",
    )
    with _pytest.raises(Exception):
        sample_video_frames(dib, "doc_id", "blob", every_n=1).collect()


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
