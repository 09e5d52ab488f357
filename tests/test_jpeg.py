"""Baseline JPEG codec tests: DCT inversion, lossless entropy layer
(bit-exact quantized coefficients), PSNR floors per content class,
marker robustness, and the Spark decode path."""

import numpy as np
import pytest

from margaret_spark.operators.jpeg import (
    QT_LUMA,
    ZIGZAG,
    _block_encode,
    _scaled_qt,
    decode_jpeg,
    decode_jpeg_coefficients,
    encode_jpeg,
    fdct2,
    idct2,
    jpeg_meta,
)


def _psnr(a, b):
    err = a.astype(np.float64) - b.astype(np.float64)
    return 10 * np.log10(255.0**2 / np.mean(err**2))


def test_zigzag_is_permutation():
    assert len(set(ZIGZAG)) == 64
    assert ZIGZAG[0] == (0, 0) and ZIGZAG[1] == (0, 1) and ZIGZAG[2] == (1, 0)
    assert ZIGZAG[-1] == (7, 7)


def test_dct_inversion_and_orthonormality():
    rng = np.random.default_rng(3)
    blk = rng.uniform(-128, 127, (8, 8))
    assert np.abs(idct2(fdct2(blk)) - blk).max() < 1e-10
    # Parseval: the transform preserves energy (orthonormal basis)
    assert np.sum(fdct2(blk) ** 2) == pytest.approx(np.sum(blk**2))


def test_quality_scaling():
    assert (_scaled_qt(QT_LUMA, 100) == 1).all()
    assert (_scaled_qt(QT_LUMA, 50) == QT_LUMA).all()
    assert (_scaled_qt(QT_LUMA, 10) >= QT_LUMA).all()


@pytest.mark.parametrize("shape", [(41, 53), (8, 8), (17, 9)])
def test_gray_roundtrip_and_exact_coefficients(shape):
    rng = np.random.default_rng(shape[0])
    img = rng.integers(0, 256, shape).astype(np.uint8)
    blob = encode_jpeg(img, quality=95)
    assert jpeg_meta(blob) == (shape[1], shape[0], 1)
    w, h, ch, out = decode_jpeg(blob)
    assert (w, h, ch) == (shape[1], shape[0], 1)
    dec = np.frombuffer(out, dtype=np.uint8).reshape(h, w)
    assert _psnr(dec, img) > 38  # noise at q95
    # the entropy layer is lossless: decoded quantized blocks must be
    # bit-identical to what the encoder quantized
    expect, _bh, _bw = _block_encode(img.astype(np.float64), _scaled_qt(QT_LUMA, 95))
    got = decode_jpeg_coefficients(blob)
    assert len(got) == len(expect)
    assert all((a == b).all() for a, b in zip(got, expect))


def test_rgb_roundtrip_smooth():
    yy, xx = np.mgrid[0:48, 0:37]
    img = np.stack(
        [(yy * 3 + xx) % 256, (yy + xx * 2) % 256, (yy * 2 + xx * 2) % 256],
        axis=-1,
    ).astype(np.uint8)
    blob = encode_jpeg(img, quality=92)
    w, h, ch, out = decode_jpeg(blob)
    assert (w, h, ch) == (37, 48, 3)
    dec = np.frombuffer(out, dtype=np.uint8).reshape(h, w, 3)
    assert _psnr(dec, img) > 45  # smooth gradients survive almost exactly


def test_rgb_420_subsampled_roundtrip():
    """The 4:2:0 encoder exercises the decoder's 2×2 sampling + chroma
    upsampling path with a real (not synthetic-marker) stream."""
    from margaret_spark.operators.jpeg import _parse_stream

    yy, xx = np.mgrid[0:45, 0:38]
    img = np.stack(
        [(yy * 3 + xx) % 256, (yy + xx * 2) % 256, (yy * 2 + xx * 2) % 256],
        axis=-1,
    ).astype(np.uint8)
    full = encode_jpeg(img, quality=90, subsample=False)
    sub = encode_jpeg(img, quality=90, subsample=True)
    st = _parse_stream(sub)
    assert [(c["h"], c["v"]) for c in st["comps"]] == [(2, 2), (1, 1), (1, 1)]
    assert len(sub) < len(full)  # chroma carries 1/4 the blocks
    w, h, ch, out = decode_jpeg(sub)
    assert (w, h, ch) == (38, 45, 3)
    dec = np.frombuffer(out, dtype=np.uint8).reshape(h, w, 3)
    assert _psnr(dec, img) > 40  # smooth content survives subsampling
    # odd dimensions: padding + crop round-trips exactly in shape
    odd = encode_jpeg(img[:17, :23], quality=90, subsample=True)
    assert decode_jpeg(odd)[:3] == (23, 17, 3)


def test_rgb_roundtrip_noise():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (32, 45, 3)).astype(np.uint8)
    blob = encode_jpeg(img, quality=95)
    _w, _h, _ch, out = decode_jpeg(blob)
    dec = np.frombuffer(out, dtype=np.uint8).reshape(32, 45, 3)
    assert _psnr(dec, img) > 30


def test_quality_monotone():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (24, 24)).astype(np.uint8)
    psnrs = []
    for q in (50, 75, 95):
        _w, _h, _ch, out = decode_jpeg(encode_jpeg(img, quality=q))
        psnrs.append(_psnr(np.frombuffer(out, dtype=np.uint8).reshape(24, 24), img))
    assert psnrs == sorted(psnrs)


def test_truncated_headers_return_none_not_crash():
    # truncated SOF: meta must classify as not-a-JPEG, not raise
    import struct

    trunc = b"\xff\xd8\xff\xc0\x00\x11\x08"
    assert jpeg_meta(trunc) is None
    # a full image truncated mid-stream still parses its meta
    img = np.zeros((8, 8), dtype=np.uint8)
    blob = encode_jpeg(img)
    assert jpeg_meta(blob[: len(blob) // 2]) in (None, (8, 8, 1))


def test_encoder_linear_not_quadratic():
    # the bit accumulator must not grow with output size: doubling the
    # image area must not blow up more than ~6x in time (quadratic
    # growth was 12.5x per 4x pixels before the accumulator mask)
    import time

    rng = np.random.default_rng(1)
    t = {}
    for n in (64, 128):
        img = rng.integers(0, 256, (n, n)).astype(np.uint8)
        t0 = time.time()
        encode_jpeg(img, quality=90)
        t[n] = time.time() - t0
    assert t[128] < max(t[64], 0.005) * 10


def test_rejects_non_jpeg_and_progressive():
    assert jpeg_meta(b"not a jpeg") is None
    assert jpeg_meta(b"\xff\xd8\xff") is None
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    # fake a progressive SOF2 stream: SOI + SOF2 marker
    import struct

    sof2 = b"\xff\xd8" + b"\xff\xc2" + struct.pack(">H", 11) + struct.pack(
        ">BHHB", 8, 8, 8, 1
    ) + bytes([1, 0x11, 0])
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(sof2)


def test_spark_decode_image_real_jpeg(spark):
    from margaret_spark.operators.multimodal import (
        attach_synthetic_jpeg_blobs,
        decode_image,
        extract_image_meta,
        resize_image,
    )

    df = spark.createDataFrame([(1, 16, 12), (2, 9, 21)], "id long, w int, h int")
    blobs = attach_synthetic_jpeg_blobs(df, "id", "w", "h")
    meta = {r["id"]: r for r in extract_image_meta(blobs, "id", "blob").collect()}
    assert meta[1]["format"] == "jpeg"
    assert (meta[1]["width"], meta[1]["height"]) == (16, 12)
    got = {r["id"]: r for r in decode_image(blobs, "id", "blob").collect()}
    for i, w, h in [(1, 16, 12), (2, 9, 21)]:
        assert (got[i]["width"], got[i]["height"]) == (w, h)
        yy, xx = np.mgrid[0:h, 0:w]
        expect = ((i * 7 + yy * 3 + xx) % 256).astype(np.uint8)
        dec = np.array(got[i]["pixels"], dtype=np.uint8).reshape(h, w)
        assert _psnr(dec, expect) > 35  # gradient, q90
    # real JPEG resize: decode → nearest → re-encode
    resized = resize_image(blobs.where(F.col("id") == 1), "id", "blob", 8, 6)
    r = decode_image(resized, "id", "blob").collect()[0]
    assert (r["width"], r["height"]) == (8, 6)


from pyspark.sql import functions as F  # noqa: E402  (used in the Spark test)


def test_meta_reads_progressive_and_fill_bytes():
    import struct

    # dimensions come from EVERY SOFn header, including progressive
    # SOF2 the decoder rejects — metadata over a dirty corpus still
    # classifies the file
    sof2 = (
        b"\xff\xd8"
        + b"\xff\xc2"
        + struct.pack(">H", 11)
        + struct.pack(">BHHB", 8, 24, 16, 3)
        + bytes([1, 0x11, 0])
    )
    assert jpeg_meta(sof2) == (16, 24, 3)
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(sof2)

    # T.81 fill bytes (repeated 0xFF) before a marker are legal padding
    img = np.zeros((8, 8), dtype=np.uint8)
    blob = encode_jpeg(img)
    padded = blob[:2] + b"\xff\xff\xff" + blob[2:]
    assert jpeg_meta(padded) == (8, 8, 1)
    w, h, ch, samples = decode_jpeg(padded)
    assert (w, h, ch) == (8, 8, 1) and list(samples) == list(decode_jpeg(blob)[3])


def test_sos_before_sof_raises_valueerror():
    import struct

    # a scan header with no prior frame header must fail as ValueError
    # (it used to escape as TypeError from the MCU walk's None deref)
    sos = (
        b"\xff\xd8"
        + b"\xff\xda"
        + struct.pack(">H", 8)
        + bytes([1, 1, 0x00, 0, 63, 0])
    )
    with pytest.raises(ValueError):
        decode_jpeg(sos + b"\x00\x00\xff\xd9")
