"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas
functions over ``mapInPandas``.

The Spark-side architecture here is the real thing — schemas,
partition-preserving mapInPandas, batch shapes — while the actual
media codecs are STUBBED: this container ships no image/audio
libraries, so ``decode_*`` raises NotImplementedError unless
``fake=True``, which decodes this module's deterministic fake blob
format instead (magic header + dimensions + seeded payload). Swapping
in Pillow/torchaudio later changes only the body of the per-batch
function, not the plan.

Fake blob wire format (little-endian):
    bytes 0-3   magic  b"FIMG" / b"FAUD"
    bytes 4-7   width / sample_rate  (uint32)
    bytes 8-11  height / n_samples   (uint32)
    bytes 12-15 channels             (uint32)
    bytes 16+   payload (repeating xor pattern seeded by dims)
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def make_fake_image_blob(width: int, height: int, channels: int = 3) -> bytes:
    payload_len = min(width * height * channels, 4096)
    seed = (width * 31 + height) & 0xFF
    payload = bytes((seed ^ (i & 0xFF)) for i in range(payload_len))
    return b"FIMG" + struct.pack("<III", width, height, channels) + payload


def make_fake_audio_blob(sample_rate: int, n_samples: int, channels: int = 1) -> bytes:
    payload_len = min(n_samples * channels, 4096)
    payload = bytes(((sample_rate + i) & 0xFF) for i in range(payload_len))
    return b"FAUD" + struct.pack("<III", sample_rate, n_samples, channels) + payload


def attach_fake_image_blobs(
    df: DataFrame, id_col: str, width_col: str, height_col: str, channels: int = 3
) -> DataFrame:
    """(id, blob binary): synthesize a fake image blob per row from
    integer dimension columns — the ingest side of the multimodal
    plumbing (a real pipeline reads blobs from object storage; the
    Arrow batch shape and binary schema are identical). Partition-
    preserving mapInPandas, no shuffle."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("blob", T.BinaryType()),
        ]
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "blob": [
                        make_fake_image_blob(int(w), int(h), channels)
                        for w, h in zip(pdf[width_col], pdf[height_col])
                    ],
                }
            )

    return df.select(id_col, width_col, height_col).mapInPandas(build, out_schema)


def _parse_header(blob: bytes):
    if blob is None or len(blob) < 16:
        return None
    magic = bytes(blob[:4])
    w, h, c = struct.unpack("<III", bytes(blob[4:16]))
    fmt = {b"FIMG": "fimg", b"FAUD": "faud"}.get(magic, "unknown")
    return fmt, w, h, c


def extract_image_meta(
    df: DataFrame, id_col: str, blob_col: str
) -> DataFrame:
    """(id, format, width, height, channels, n_bytes): header parse as
    a mapInPandas pass. Partition-preserving — no shuffle; each Arrow
    batch is parsed in one vectorized sweep."""
    out_schema = T.StructType(
        [T.StructField(id_col, T.LongType())] + list(IMAGE_META_SCHEMA.fields)
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_parse_header(b) for b in pdf[blob_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "format": [m[0] if m else None for m in metas],
                    "width": [m[1] if m else None for m in metas],
                    "height": [m[2] if m else None for m in metas],
                    "channels": [m[3] if m else None for m in metas],
                    "n_bytes": [len(b) if b is not None else 0 for b in pdf[blob_col]],
                }
            )

    return df.select(id_col, blob_col).mapInPandas(parse, out_schema)


def decode_image(
    df: DataFrame, id_col: str, blob_col: str, fake: bool = False
) -> DataFrame:
    """(id, pixels array<int>, width, height): the decode stage.

    STUB: real image decoding needs Pillow/libvips, absent here —
    ``fake=False`` raises NotImplementedError from each batch.
    ``fake=True`` decodes the deterministic fake format (payload bytes
    as pixel values), keeping the Spark plumbing fully testable."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("pixels", T.ArrayType(T.IntegerType())),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image decode requires an image library not present in "
                    "this environment; pass fake=True for the deterministic "
                    "test decoder"
                )
            ids, pixels, ws, hs = [], [], [], []
            for i, b in zip(pdf[id_col], pdf[blob_col]):
                hdr = _parse_header(b)
                if hdr is None:
                    continue
                _, w, h, c = hdr
                ids.append(i)
                pixels.append([int(x) for x in bytes(b[16:])])
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame(
                {id_col: ids, "pixels": pixels, "width": ws, "height": hs}
            )

    return df.select(id_col, blob_col).mapInPandas(decode, out_schema)


def resize_image(
    df: DataFrame, id_col: str, blob_col: str, target_w: int, target_h: int,
    fake: bool = False,
) -> DataFrame:
    """Resize stage (STUB decode; real resize = swap the batch body).
    With ``fake=True`` it rewrites the fake header to the target
    dimensions and truncates/pads the payload deterministically."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("blob", T.BinaryType()),
        ]
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image resize requires an image library not present in "
                    "this environment; pass fake=True for the deterministic "
                    "test path"
                )
            out = []
            for b in pdf[blob_col]:
                hdr = _parse_header(b)
                if hdr is None:
                    out.append(None)
                    continue
                _, _, _, c = hdr
                out.append(make_fake_image_blob(target_w, target_h, c))
            yield pd.DataFrame({id_col: pdf[id_col], "blob": out})

    return df.select(id_col, blob_col).mapInPandas(resize, out_schema)


def sample_video_frames(
    df: DataFrame, id_col: str, blob_col: str, every_n: int = 10, fake: bool = False
) -> DataFrame:
    """Frame sampling: one output row per sampled frame index.
    STUB decode; the fan-out shape (row → frames) is the real part."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "video decode requires a media library not present in "
                    "this environment; pass fake=True for the deterministic "
                    "test path"
                )
            ids, idxs, frames = [], [], []
            for i, b in zip(pdf[id_col], pdf[blob_col]):
                hdr = _parse_header(b)
                if hdr is None:
                    continue
                _, w, h, c = hdr
                n_frames = max(1, c)  # fake: channels double as frame count
                for f in range(0, n_frames, every_n):
                    ids.append(i)
                    idxs.append(f)
                    frames.append(make_fake_image_blob(w, h, 1))
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, blob_col).mapInPandas(sample, out_schema)


AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def extract_audio_meta(df: DataFrame, id_col: str, blob_col: str) -> DataFrame:
    """(id, format, sample_rate, n_samples, channels, duration_s,
    n_bytes): audio header parse, partition-preserving mapInPandas."""
    out_schema = T.StructType(
        [T.StructField(id_col, T.LongType())] + list(AUDIO_META_SCHEMA.fields)
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_parse_header(b) for b in pdf[blob_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "format": [m[0] if m else None for m in metas],
                    "sample_rate": [m[1] if m else None for m in metas],
                    "n_samples": [m[2] if m else None for m in metas],
                    "channels": [m[3] if m else None for m in metas],
                    "duration_s": [
                        (m[2] / m[1]) if m and m[1] else None for m in metas
                    ],
                    "n_bytes": [len(b) if b is not None else 0 for b in pdf[blob_col]],
                }
            )

    return df.select(id_col, blob_col).mapInPandas(parse, out_schema)


def audio_features(
    df: DataFrame, id_col: str, blob_col: str, fake: bool = False
) -> DataFrame:
    """Feature-extraction stage: (id, rms double, zero_crossings int).
    STUB decode (a real torchaudio/librosa body drops in unchanged);
    ``fake=True`` computes the features over the fake payload bytes
    centered at 128, so the numbers are real and deterministic."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("rms", T.DoubleType()),
            T.StructField("zero_crossings", T.IntegerType()),
        ]
    )

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "audio decode requires an audio library not present in "
                    "this environment; pass fake=True for the deterministic "
                    "test path"
                )
            ids, rms, zc = [], [], []
            for i, b in zip(pdf[id_col], pdf[blob_col]):
                hdr = _parse_header(b)
                if hdr is None or hdr[0] != "faud":
                    continue
                x = np.frombuffer(bytes(b[16:]), dtype=np.uint8).astype(np.float64) - 128.0
                ids.append(i)
                rms.append(float(np.sqrt(np.mean(x * x))) if len(x) else 0.0)
                zc.append(int(np.sum(np.signbit(x[1:]) != np.signbit(x[:-1]))) if len(x) > 1 else 0)
            yield pd.DataFrame({id_col: ids, "rms": rms, "zero_crossings": zc})

    return df.select(id_col, blob_col).mapInPandas(feats, out_schema)
