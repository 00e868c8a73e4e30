"""Multimodal columns: opaque binary payloads + typed metadata.

North-star addition (BASELINE.json): treat image/audio/video as
`binary` columns with a metadata struct; decode / feature-extract /
resize / frame-sample run as Arrow-batched pandas functions over
mapInPandas. `decode_real` decodes PNG/BMP/PPM images and PCM16 WAV
audio natively via the pure-Python codecs in operators/codecs.py (no
PIL/av needed); video containers and compressed image formats (JPEG,
WebP) still require a codec library and raise a clear
NotImplementedError. `decode_stub` remains for payloads that are not
real media (deterministic fake decode keeping the same shape
contract), and the plumbing — schema, batching, partitioning, UDF
signatures — is identical for both.

Scale notes: binary payloads ride the same parquet row-groups as other
columns; keep them in a separate table keyed by content hash so scans
that don't need pixels never read them (column pruning + late
materialization via join-on-demand).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.StructType([
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("n_frames", T.IntegerType()),
        ])),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("content_sha", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),  # 8-dim sketch
    ]
)


def synth_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    rows = []
    kinds = ("image", "audio", "video")
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * (4 + i % 5)
        meta = (64 + i % 8, 48, 1) if kind == "image" else (0, 0, 30 if kind == "video" else 1)
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_real(payload: bytes, kind: str) -> np.ndarray:
    """Real decode via the pure-Python codecs (operators/codecs.py):
    PNG/BMP/PPM -> (h, w, c) uint8 pixels; WAV -> (n, ch) int16
    samples. Video containers still need a demuxer library (av) and
    raise; frame_sample's plumbing is ready for when one is present."""
    from tracy_matdb_spark.operators import codecs

    data = bytes(payload)
    fmt = codecs.sniff(data)
    if kind == "video" or fmt == "unknown":
        raise NotImplementedError(
            f"decode of kind={kind!r} format={fmt!r} needs a codec/demuxer "
            "library (PIL/av); PNG, BMP, PPM and PCM16 WAV decode natively"
        )
    if fmt == "wav":
        samples, _rate = codecs.decode_wav(data)
        return samples
    return codecs.decode_image(data)


def decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic fake decode: payload bytes -> pseudo-sample array.
    Stands in for PIL.Image.open / av.decode; same shape contract."""
    arr = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.float64)
    return arr


def resize_nearest(arr: "np.ndarray", out_w: int, out_h: int) -> "np.ndarray":
    """Nearest-neighbor image resize with FLOOR index mapping:
    src_x = (X * w) // out_w, src_y = (Y * h) // out_h — the integer
    convention an exact oracle can reproduce in SQL (no float centers,
    no rounding ties). arr is (h, w, c); returns (out_h, out_w, c)."""
    h, w = arr.shape[0], arr.shape[1]
    xs = (np.arange(out_w) * w) // out_w
    ys = (np.arange(out_h) * h) // out_h
    return arr[ys][:, xs]


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: decode (stubbed) -> 8-bin histogram
    sketch + content hash. Arrow-batched; one pass over payload bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload)
                arr = decode_stub(payload, r.kind)
                hist, _ = np.histogram(arr, bins=8, range=(0, 256))
                total = max(int(hist.sum()), 1)
                out.append(
                    {
                        "media_id": r.media_id,
                        "kind": r.kind,
                        "content_sha": hashlib.sha256(payload).hexdigest(),
                        "n_bytes": len(payload),
                        "feature": [float(h) / total for h in hist],
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.mapInPandas(run, FEATURE_SCHEMA)


PHASH_W = 16  # synthetic image edge; aHash downsamples to 8x8
PHASH_MOD = 251  # pixel construction modulus (prime, < 256)


def phash_pixel(i: int, x: int, y: int) -> int:
    """Closed-form pixel value of synthetic image i at (x, y): a per-base
    gradient ramp mod {PHASH_MOD}; odd ids perturb one pixel so each
    (2k, 2k+1) pair is a near-duplicate, not an exact one. The ORACLE
    recomputes pixels from this formula directly (no PNG round-trip), so
    the parity check covers encode_png -> decode_image end-to-end."""
    base = i // 2
    v = (13 * base * base + (3 + base % 7) * x + (5 + base % 11) * y) % PHASH_MOD
    if i % 2 == 1 and x == 0 and y == 0:
        v = (v + 1) % PHASH_MOD
    return v


def synth_images(spark: SparkSession, n: int = 60) -> DataFrame:
    """Deterministic PNG image table: consecutive id pairs are near-dups
    by construction (see phash_pixel). Payloads are REAL PNGs encoded by
    operators/codecs.py — the decode in phash_features exercises the
    actual codec path."""
    from tracy_matdb_spark.operators import codecs

    rows = []
    for i in range(n):
        img = np.empty((PHASH_W, PHASH_W, 3), dtype=np.uint8)
        for y in range(PHASH_W):
            for x in range(PHASH_W):
                img[y, x, :] = phash_pixel(i, x, y)
        rows.append((i, "image", bytearray(codecs.encode_png(img)), (PHASH_W, PHASH_W, 1)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def ahash64(arr: np.ndarray) -> int:
    """64-bit average hash: integer-mean the channels, nearest-neighbor
    downsample to 8x8 (floor index map — resize_nearest), threshold at
    the FLOOR of the mean of the 64 samples (strict >). All-integer, so
    bit-exact across implementations."""
    gray = arr.astype(np.int64).sum(axis=2) // arr.shape[2]
    small = resize_nearest(gray[:, :, None], 8, 8)[:, :, 0]
    mean = int(small.sum()) // 64
    bits = 0
    for yy in range(8):
        for xx in range(8):
            if int(small[yy, xx]) > mean:
                bits |= 1 << (yy * 8 + xx)
    return bits


def phash_features(media: DataFrame) -> DataFrame:
    """mapInPandas: decode the PNG payload (real codec) -> 64-bit aHash.
    Arrow-batched; the hash is returned as a signed long (bit 63 may set
    the sign — downstream band/xor arithmetic is bit-pattern safe)."""
    out_schema = T.StructType(
        [T.StructField("media_id", T.LongType()), T.StructField("phash", T.LongType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from tracy_matdb_spark.operators import codecs

        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode_image(bytes(r.payload))
                h = ahash64(arr)
                out.append({"media_id": r.media_id, "phash": h - (1 << 64) if h >= 1 << 63 else h})
            yield pd.DataFrame(out, columns=["media_id", "phash"])

    return media.mapInPandas(run, out_schema)


def frame_sample(media: DataFrame, every: int = 10) -> DataFrame:
    """Video frame sampling plan: explode frame indices, keep every Nth —
    the decode of each kept frame would run in the same mapInPandas stage
    (stubbed here; the row explosion and pruning are the real plumbing)."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), F.col("meta.n_frames") - 1)).alias("frame"),
        )
        .filter(F.col("frame") % every == 0)
    )
