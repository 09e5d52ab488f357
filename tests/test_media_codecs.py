"""Pure-python tests for the stdlib PNG/WAV codecs, plus the Spark
real-decode paths in operators.multimodal."""

import struct
import zlib

import pytest

from margaret_spark.operators.media_codecs import (
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
    png_meta,
    wav_meta,
    _chunk,
    _paeth,
    _PNG_SIG,
)


def _pixels(w, h, ch, seed=7):
    return bytes((seed * 31 + i) % 256 for i in range(w * h * ch))


@pytest.mark.parametrize("ctype,ch", [(0, 1), (2, 3), (6, 4)])
def test_png_roundtrip(ctype, ch):
    w, h = 13, 9
    px = _pixels(w, h, ch)
    blob = encode_png(w, h, px, color_type=ctype)
    assert png_meta(blob) == (w, h, 8, ctype, ch)
    gw, gh, gch, out = decode_png(blob)
    assert (gw, gh, gch) == (w, h, ch)
    assert out == px


def _png_with_filter(w, h, ch, ctype, px, ftype):
    """Hand-build a PNG whose scanlines use filter ``ftype`` — the
    encoder only emits filter 0, so the decoder's unfilter paths need
    adversarial input built here (apply the RFC 2083 filter forward;
    decode must invert it)."""
    stride = w * ch
    raw = bytearray()
    prev = bytes(stride)
    for y in range(h):
        line = px[y * stride : (y + 1) * stride]
        filt = bytearray(line)
        if ftype == 1:
            for i in range(stride - 1, ch - 1, -1):
                filt[i] = (filt[i] - line[i - ch]) & 0xFF
        elif ftype == 2:
            for i in range(stride):
                filt[i] = (filt[i] - prev[i]) & 0xFF
        elif ftype == 3:
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                filt[i] = (filt[i] - ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                filt[i] = (filt[i] - _paeth(a, prev[i], c)) & 0xFF
        raw.append(ftype)
        raw += filt
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_unfilter_all_types(ftype):
    w, h, ch, ctype = 11, 6, 3, 2
    px = _pixels(w, h, ch, seed=ftype + 3)
    blob = _png_with_filter(w, h, ch, ctype, px, ftype)
    gw, gh, gch, out = decode_png(blob)
    assert (gw, gh, gch) == (w, h, ch)
    assert out == px


def test_png_multiple_idat_chunks():
    w, h = 5, 4
    px = _pixels(w, h, 1)
    blob = encode_png(w, h, px, color_type=0)
    # split the single IDAT into two chunks: decoders must concatenate
    pos = 8
    parts = {}
    order = []
    while pos + 8 <= len(blob):
        (ln,) = struct.unpack(">I", blob[pos : pos + 4])
        tag = blob[pos + 4 : pos + 8]
        parts[tag] = blob[pos + 8 : pos + 8 + ln]
        order.append(tag)
        pos += 12 + ln
    idat = parts[b"IDAT"]
    rebuilt = (
        _PNG_SIG
        + _chunk(b"IHDR", parts[b"IHDR"])
        + _chunk(b"IDAT", idat[: len(idat) // 2])
        + _chunk(b"IDAT", idat[len(idat) // 2 :])
        + _chunk(b"IEND", b"")
    )
    assert decode_png(rebuilt)[3] == px


def test_png_rejects_garbage():
    assert png_meta(b"not a png") is None
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\nxxxx")


def test_wav_roundtrip():
    samples = [((i * 13) % 4096) - 2048 for i in range(300)]
    blob = encode_wav(16000, samples, channels=1)
    assert wav_meta(blob) == (16000, 300, 1)
    rate, ch, out = decode_wav(blob)
    assert (rate, ch) == (16000, 1)
    assert out == samples


def test_wav_truncated_fmt_returns_none():
    # RIFF-prefixed garbage with a truncated fmt chunk: classify as
    # not-a-WAV, never raise (format dispatch runs on every blob)
    import struct

    blob = b"RIFF\x10\x00\x00\x00WAVEfmt \x10\x00\x00\x00\x01\x00"
    assert wav_meta(blob) is None


def test_wav_encoder_validates_before_packing():
    with pytest.raises(ValueError):
        encode_wav(8000, [1, 2, 3], channels=2)
    with pytest.raises(ValueError):
        encode_wav(8000, [1, 2], channels=0)
    # generators are accepted (materialized)
    blob = encode_wav(8000, (s for s in [1, -2, 3, -4]), channels=2)
    assert wav_meta(blob) == (8000, 2, 2)


def test_wav_stereo_and_alignment():
    # odd-length data chunk exercises RIFF word alignment
    samples = [1, -1, 32767, -32768, 0, 5]
    blob = encode_wav(8000, samples, channels=2)
    assert wav_meta(blob) == (8000, 3, 2)
    assert decode_wav(blob)[2] == samples
    assert wav_meta(b"RIFFxxxxJUNK") is None


def test_spark_decode_image_real_png(spark):
    from pyspark.sql import functions as F

    from margaret_spark.operators.multimodal import (
        attach_synthetic_png_blobs,
        decode_image,
        extract_image_meta,
        resize_image,
    )

    df = spark.createDataFrame([(1, 8, 5), (2, 6, 7)], "id long, w int, h int")
    blobs = attach_synthetic_png_blobs(df, "id", "w", "h")
    meta = {r["id"]: r for r in extract_image_meta(blobs, "id", "blob").collect()}
    assert meta[1]["format"] == "png" and meta[1]["width"] == 8 and meta[1]["height"] == 5
    got = {r["id"]: r for r in decode_image(blobs, "id", "blob").collect()}
    for i, w, h in [(1, 8, 5), (2, 6, 7)]:
        expect = [(i * 31 + j) % 256 for j in range(w * h)]
        assert got[i]["pixels"] == expect
        assert (got[i]["width"], got[i]["height"]) == (w, h)
    # real resize: nearest-neighbor downsample of id=1 to 4x5
    resized = resize_image(blobs.where(F.col("id") == 1), "id", "blob", 4, 5)
    r = decode_image(resized, "id", "blob").collect()[0]
    assert (r["width"], r["height"]) == (4, 5)
    src = [(1 * 31 + j) % 256 for j in range(8 * 5)]
    expect = [src[y * 5 // 5 * 8 + x * 8 // 4] for y in range(5) for x in range(4)]
    assert r["pixels"] == expect


def test_spark_decode_audio_real_wav(spark):
    import numpy as np

    from margaret_spark.operators.multimodal import (
        attach_synthetic_wav_blobs,
        audio_features,
        decode_audio,
        extract_audio_meta,
    )

    df = spark.createDataFrame([(1, 8000, 40), (2, 16000, 25)], "id long, r int, n int")
    blobs = attach_synthetic_wav_blobs(df, "id", "r", "n")
    meta = {r["id"]: r for r in extract_audio_meta(blobs, "id", "blob").collect()}
    assert meta[1]["format"] == "wav"
    assert meta[1]["sample_rate"] == 8000 and meta[1]["n_samples"] == 40
    assert meta[2]["duration_s"] == 25 / 16000
    got = {r["id"]: r for r in decode_audio(blobs, "id", "blob").collect()}
    for i, rate, n in [(1, 8000, 40), (2, 16000, 25)]:
        expect = [((i * 7 + j * 13) % 4096) - 2048 for j in range(n)]
        assert got[i]["samples"] == expect
        assert got[i]["sample_rate"] == rate
    feats = {r["id"]: r for r in audio_features(blobs, "id", "blob").collect()}
    x = np.array([((1 * 7 + j * 13) % 4096) - 2048 for j in range(40)], dtype=np.float64)
    assert feats[1]["rms"] == pytest.approx(float(np.sqrt(np.mean(x * x))))


def test_decoders_never_crash_on_garbage():
    """Dirty-corpus contract: random bytes and truncations of valid
    files must classify as unknown (meta -> None) or raise ValueError
    — never escape with IndexError/struct.error/zlib.error from any
    decode entry point."""
    import random
    import zlib

    from margaret_spark.operators.jpeg import decode_jpeg, jpeg_meta
    from margaret_spark.operators.media_codecs import (
        decode_png as dpng,
        decode_wav as dwav,
        encode_wav as ewav,
    )
    from margaret_spark.operators.jpeg import encode_jpeg
    import numpy as np

    rng = random.Random(99)
    valid = [
        encode_png(6, 5, _pixels(6, 5, 1), color_type=0),
        encode_jpeg(np.zeros((8, 8), dtype=np.uint8)),
        ewav(8000, [0, 1, -1, 2], channels=1),
    ]
    blobs = []
    for _ in range(60):
        blobs.append(bytes(rng.randrange(256) for _ in range(rng.randrange(0, 80))))
    for v in valid:
        for cut in (1, 4, 9, len(v) // 2, len(v) - 1):
            blobs.append(v[:cut])
        # corrupt a middle byte
        b = bytearray(v)
        b[len(b) // 2] ^= 0xFF
        blobs.append(bytes(b))
    # magic-prefixed garbage exercises the deep parsers
    blobs += [b"\x89PNG\r\n\x1a\n" + b"\x00" * 10, b"\xff\xd8\xff\xe0junk",
              b"RIFF\xff\xff\xff\xffWAVEdata"]
    for blob in blobs:
        for meta in (png_meta, jpeg_meta, wav_meta):
            meta(blob)  # must never raise
        for dec in (dpng, decode_jpeg, dwav):
            try:
                dec(blob)
            except (ValueError, zlib.error):
                pass  # expected classification failures


def test_decode_png_corrupt_idat_is_valueerror():
    """A corrupt IDAT must surface as the documented ValueError, not a
    leaked zlib.error (the decode path promises one exception type)."""
    import pytest

    from margaret_spark.operators.media_codecs import decode_png, encode_png

    blob = bytearray(encode_png(4, 4, bytes(range(16))))
    # flip bytes inside the IDAT payload (after sig+IHDR = 8+25 bytes,
    # past the IDAT length+tag+zlib header)
    blob[8 + 25 + 8 + 4] ^= 0xFF
    blob[8 + 25 + 8 + 5] ^= 0xFF
    with pytest.raises(ValueError, match="corrupt|truncated|mismatch"):
        decode_png(bytes(blob))


def test_wav_meta_multi_data_chunks_consistent_with_decode():
    """Nonstandard multi-data-chunk WAVs: meta's frame count must
    equal what decode actually returns (both concatenate)."""
    import struct

    from margaret_spark.operators.media_codecs import decode_wav, wav_meta

    d1 = struct.pack("<4h", 1, 2, 3, 4)
    d2 = struct.pack("<2h", 5, 6)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(d1)) + d1
        + b"data" + struct.pack("<I", len(d2)) + d2
    )
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    rate, n_frames, ch = wav_meta(blob)
    r2, c2, samples = decode_wav(blob)
    assert (rate, ch) == (8000, 1) == (r2, c2)
    assert samples == [1, 2, 3, 4, 5, 6]
    assert n_frames == len(samples)


def test_multimodal_consumers_accept_string_ids(spark):
    # the id-type house rule (dedup.py:1164): consumer operators must
    # not pin ids to long — a string-keyed corpus crashed every
    # multimodal mapInPandas stage with an Arrow conversion error
    from margaret_spark.operators.media_codecs import encode_png, encode_wav
    from margaret_spark.operators.multimodal import (
        audio_features,
        decode_audio,
        decode_image,
        extract_audio_meta,
        extract_image_meta,
        resize_image,
    )
    from margaret_spark.operators.video_containers import (
        encode_avi_stub,
        extract_video_meta,
    )

    png = encode_png(4, 3, bytes(range(12)), color_type=0)
    wav = encode_wav(8000, [1, -2, 3, -4])
    avi = encode_avi_stub(40000, 50, 320, 240)
    imgs = spark.createDataFrame([("doc-a", png)], "id string, blob binary")
    auds = spark.createDataFrame([("doc-b", wav)], "id string, blob binary")
    vids = spark.createDataFrame([("doc-c", avi)], "id string, blob binary")

    m = extract_image_meta(imgs, "id", "blob").collect()
    assert m[0]["id"] == "doc-a" and m[0]["format"] == "png"
    d = decode_image(imgs, "id", "blob").collect()
    assert d[0]["id"] == "doc-a" and d[0]["pixels"] == list(range(12))
    r = decode_image(resize_image(imgs, "id", "blob", 2, 3), "id", "blob").collect()
    assert r[0]["id"] == "doc-a" and r[0]["width"] == 2
    am = extract_audio_meta(auds, "id", "blob").collect()
    assert am[0]["id"] == "doc-b" and am[0]["format"] == "wav"
    ad = decode_audio(auds, "id", "blob").collect()
    assert ad[0]["id"] == "doc-b" and ad[0]["samples"] == [1, -2, 3, -4]
    af = audio_features(auds, "id", "blob").collect()
    assert af[0]["id"] == "doc-b" and af[0]["zero_crossings"] == 3
    vm = extract_video_meta(vids, "id", "blob").collect()
    assert vm[0]["id"] == "doc-c" and vm[0]["container"] == "avi"


def test_resize_image_rejects_nonpositive_targets(spark):
    from margaret_spark.operators.multimodal import resize_image

    df = spark.createDataFrame([(1, b"x")], "id long, blob binary")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="target dimensions"):
        resize_image(df, "id", "blob", 0, 4)


def test_wav_corrupt_streams_fail_as_valueerror():
    # the codec house rule: corrupt wire input raises a NAMED
    # ValueError, never a leaked struct.error
    import struct

    import pytest as _pytest

    from margaret_spark.operators.media_codecs import decode_wav, encode_wav

    with _pytest.raises(ValueError, match="int16 range"):
        encode_wav(8000, [70000])

    blob = bytearray(encode_wav(8000, [1, 2, 3]))
    # find the data chunk and shrink its declared length to an odd value
    i = bytes(blob).index(b"data")
    blob[i + 4 : i + 8] = struct.pack("<I", 5)
    with _pytest.raises(ValueError, match="odd data chunk"):
        decode_wav(bytes(blob))


def test_jpeg_coefficients_corrupt_entropy_is_valueerror():
    import numpy as np
    import pytest as _pytest

    from margaret_spark.operators.jpeg import decode_jpeg_coefficients, encode_jpeg

    img = (np.arange(64, dtype=np.uint8) % 256).reshape(8, 8)
    blob = bytearray(encode_jpeg(img, quality=90))
    # truncate mid-entropy-segment: the walk must surface ValueError
    with _pytest.raises(ValueError, match="truncated or corrupt"):
        decode_jpeg_coefficients(bytes(blob[:-12]))
