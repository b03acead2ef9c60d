"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

Header parsing and uncompressed-BMP pixel decoding are REAL —
pure-Python struct readers for the published PNG / BMP / GIF / RIFF-WAV
container layouts, no codec libraries needed. Compressed codecs (JPEG,
MP3, H.264, ...) require libraries absent from this container:
``decode_image`` raises NotImplementedError for those unless
``fake=True``, in which case a deterministic fake decoder (md5-seeded)
produces stable pseudo-features so the Spark-side plumbing — schema,
partitioning, mapInPandas batch shape, UDF signatures — stays testable
for every format.

Design for scale: media bytes travel as ``binary`` columns in Arrow
batches through ``mapInPandas``; feature extraction emits fixed-width
float arrays; metadata (width/height/duration/codec) is a struct column
populated at ingest (``attach_metadata``) so downstream filters prune
without touching bytes.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_s", T.DoubleType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

_FEATURE_DIM = 16


def _fake_features(payload: bytes, dim: int = _FEATURE_DIM) -> np.ndarray:
    """Deterministic pseudo-decoder: md5(payload) seeds a feature vector.
    Stands in for a real decode+embed until real codecs exist."""
    h = hashlib.md5(payload or b"").digest()
    seed = int.from_bytes(h[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


# ---------------------------------------------------------------------------
# container header parsers — pure Python over the published byte layouts
# ---------------------------------------------------------------------------

_EMPTY_META = {
    "width": None,
    "height": None,
    "duration_s": None,
    "codec": None,
}


def parse_media_metadata(payload: bytes | None) -> dict:
    """Sniff the container magic and parse real dimensions/duration.

    Supported: PNG (IHDR big-endian dims), BMP (BITMAPINFOHEADER
    little-endian signed dims), GIF87a/89a (logical screen descriptor),
    RIFF-WAV (duration = data-chunk bytes / fmt byte-rate). Unknown or
    truncated payloads return all-NULL meta rather than raising — at
    100 TB a malformed file must not kill the stage.
    """
    try:
        if payload is None or len(payload) < 12:
            return dict(_EMPTY_META)
        if payload[:8] == b"\x89PNG\r\n\x1a\n" and payload[12:16] == b"IHDR":
            w, h = struct.unpack(">II", payload[16:24])
            return {**_EMPTY_META, "width": w, "height": h, "codec": "png"}
        if payload[:2] == b"BM" and len(payload) >= 26:
            w, h = struct.unpack("<ii", payload[18:26])
            # negative height = top-down row order, same pixel count
            return {
                **_EMPTY_META,
                "width": w,
                "height": abs(h),
                "codec": "bmp",
            }
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", payload[6:10])
            return {**_EMPTY_META, "width": w, "height": h, "codec": "gif"}
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return _parse_wav(payload)
    except (struct.error, IndexError):
        pass
    return dict(_EMPTY_META)


def _parse_wav(payload: bytes) -> dict:
    """Walk RIFF chunks for fmt (byte rate) and data (payload size)."""
    byte_rate = None
    data_size = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        if cid == b"fmt " and pos + 16 <= len(payload):
            (byte_rate,) = struct.unpack(
                "<I", payload[pos + 16 : pos + 20]
            )
        elif cid == b"data":
            data_size = size
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if byte_rate and data_size is not None:
        return {
            **_EMPTY_META,
            "duration_s": data_size / byte_rate,
            "codec": "pcm_s16le",
        }
    return dict(_EMPTY_META)


def decode_bmp(payload: bytes) -> np.ndarray:
    """REAL decode of an uncompressed 24-bit bottom-up BMP into an
    (h, w, 3) uint8 RGB array — header struct + numpy reshape, no
    codec library. Raises ValueError on any other BMP flavour."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_offset,) = struct.unpack("<I", payload[10:14])
    w, h = struct.unpack("<ii", payload[18:26])
    (bpp,) = struct.unpack("<H", payload[28:30])
    (compression,) = struct.unpack("<I", payload[30:34])
    if bpp != 24 or compression != 0 or h <= 0:
        raise ValueError(
            f"unsupported BMP flavour (bpp={bpp}, compression="
            f"{compression}, height={h})"
        )
    row_stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=h * row_stride, offset=data_offset
    ).reshape(h, row_stride)
    bgr = rows[:, : w * 3].reshape(h, w, 3)[::-1]  # bottom-up -> top-down
    return bgr[..., ::-1].copy()  # BGR -> RGB


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §9, filter type 4)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(payload: bytes) -> np.ndarray:
    """REAL decode of an 8-bit non-interlaced PNG into an (h, w, 3)
    uint8 RGB array — stdlib ``zlib`` + per-scanline unfiltering, no
    codec library (PNG spec: chunk walk, IDAT concat, filter types
    0-4 including Paeth). Color types: 0 (gray, replicated to RGB),
    2 (RGB), 6 (RGBA, alpha dropped). Raises ValueError on anything
    else (interlaced, 16-bit, palette)."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, w = 8, None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        typ = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if typ == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or interlace != 0 or color not in (0, 2, 6):
                raise ValueError(
                    f"unsupported PNG flavour (depth={depth}, "
                    f"color={color}, interlace={interlace})"
                )
            ch = {0: 1, 2: 3, 6: 4}[color]
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")

    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, dtype=np.uint8,
            count=stride, offset=y * (stride + 1) + 1,
        ).astype(np.int32)
        if f == 0:
            recon = row
        elif f == 1:  # Sub: cumulative sum per channel position
            recon = np.cumsum(
                row.reshape(w, ch), axis=0, dtype=np.int64
            ).reshape(stride) % 256
        elif f == 2:  # Up
            recon = row + prev
        elif f == 3:  # Average — sequential left dependency
            recon = np.zeros(stride, dtype=np.int32)
            p32 = prev.astype(np.int32)
            for i in range(stride):
                left = recon[i - ch] if i >= ch else 0
                recon[i] = (row[i] + (left + p32[i]) // 2) % 256
        elif f == 4:  # Paeth — sequential left dependency
            recon = np.zeros(stride, dtype=np.int32)
            p32 = prev.astype(np.int32)
            for i in range(stride):
                a = int(recon[i - ch]) if i >= ch else 0
                c = int(p32[i - ch]) if i >= ch else 0
                recon[i] = (row[i] + _paeth(a, int(p32[i]), c)) % 256
        else:
            raise ValueError(f"bad PNG filter type {f}")
        prev = (recon % 256).astype(np.uint8)
        out[y] = prev
    px = out.reshape(h, w, ch)
    if ch == 1:
        return np.repeat(px, 3, axis=2).copy()
    return px[:, :, :3].copy()


def _image_features(rgb: np.ndarray, dim: int = _FEATURE_DIM) -> np.ndarray:
    """Fixed-width features from decoded pixels: dims, aspect, overall
    + per-quadrant channel means (deterministic, test-assertable)."""
    h, w = rgb.shape[:2]
    half_h, half_w = max(1, h // 2), max(1, w // 2)
    quads = [
        rgb[:half_h, :half_w],
        rgb[:half_h, half_w:] if w > 1 else rgb[:half_h, :],
        rgb[half_h:, :half_w] if h > 1 else rgb[:, :half_w],
        rgb[half_h:, half_w:] if h > 1 and w > 1 else rgb,
    ]
    feats = [float(w), float(h), float(w) / float(h)]
    feats += [float(m) for m in rgb.reshape(-1, 3).mean(axis=0)]
    for q in quads:
        feats += [float(m) for m in q.reshape(-1, 3).mean(axis=0)][:3]
    feats += [float(rgb.std())]
    return np.asarray(feats[:dim], dtype=np.float32)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode + featurize an image payload.

    Uncompressed 24-bit BMP and 8-bit non-interlaced PNG decode for
    REAL (header + numpy + stdlib zlib, see decode_bmp / decode_png).
    Remaining codecs (JPEG, palette/16-bit PNG, GIF frames, ...) need
    libraries absent from this container: NotImplementedError unless
    ``fake=True``, which substitutes the deterministic md5-seeded
    pseudo-decoder."""
    if payload and payload[:2] == b"BM":
        try:
            return _image_features(decode_bmp(payload))
        except (ValueError, struct.error):
            if not fake:
                raise
    if payload and payload[:8] == _PNG_SIG:
        try:
            return _image_features(decode_png(payload))
        except (ValueError, struct.error, zlib.error):
            if not fake:
                raise
    if not fake:
        raise NotImplementedError(
            "decoding this format requires an imaging library not "
            "present in this environment; pass fake=True for the "
            "deterministic stub (uncompressed 24-bit BMP and 8-bit "
            "PNG decode for real)"
        )
    return _fake_features(payload)


# ---------------------------------------------------------------------------
# deterministic media synthesis — REAL container bytes for fixtures
# ---------------------------------------------------------------------------

def make_bmp(width: int, height: int, seed: int = 0) -> bytes:
    """Valid uncompressed 24-bit bottom-up BMP with deterministic
    pixels (value = (x + 2*y + seed) % 256 per channel offset)."""
    row_stride = (width * 3 + 3) & ~3
    img_size = row_stride * height
    header = b"BM" + struct.pack(
        "<IHHI", 54 + img_size, 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835,
        2835, 0, 0,
    )
    y_idx, x_idx = np.mgrid[0:height, 0:width]
    base = (x_idx + 2 * y_idx + seed) % 256
    px = np.stack(
        [base, (base + 85) % 256, (base + 170) % 256], axis=-1
    ).astype(np.uint8)
    rows = np.zeros((height, row_stride), dtype=np.uint8)
    rows[:, : width * 3] = px.reshape(height, width * 3)
    return header + rows[::-1].tobytes()  # bottom-up row order


def make_png(
    width: int, height: int, seed: int = 0, filter_mode: str = "none"
) -> bytes:
    """Valid 8-bit RGB PNG, one zlib IDAT. ``filter_mode``:
    ``"none"`` writes every scanline with filter 0 (byte-stable —
    the md5-parity oracles depend on it); ``"mixed"`` filters row y
    with type ``y % 5`` (None/Sub/Up/Average/Paeth), exercising the
    decoder's full unfilter matrix while producing identical pixels."""

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    y_idx, x_idx = np.mgrid[0:height, 0:width]
    base = (3 * x_idx + y_idx + seed) % 256
    px = np.stack(
        [base, (base + 60) % 256, (base + 120) % 256], axis=-1
    ).astype(np.uint8)
    flat = px.reshape(height, width * 3).astype(np.int32)
    parts = []
    for y in range(height):
        row = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros_like(row)
        f = (y % 5) if filter_mode == "mixed" else 0
        if f == 0:
            filt = row
        elif f == 1:  # Sub
            left = np.concatenate([np.zeros(3, np.int32), row[:-3]])
            filt = (row - left) % 256
        elif f == 2:  # Up
            filt = (row - prev) % 256
        elif f == 3:  # Average
            left = np.concatenate([np.zeros(3, np.int32), row[:-3]])
            filt = (row - (left + prev) // 2) % 256
        else:  # Paeth
            left = np.concatenate([np.zeros(3, np.int32), row[:-3]])
            ul = np.concatenate([np.zeros(3, np.int32), prev[:-3]])
            pred = np.array(
                [
                    _paeth(int(a), int(b), int(c))
                    for a, b, c in zip(left, prev, ul)
                ],
                dtype=np.int32,
            )
            filt = (row - pred) % 256
        parts.append(bytes([f]) + filt.astype(np.uint8).tobytes())
    raw = b"".join(parts)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def make_wav(
    n_samples: int, sample_rate: int = 8000, seed: int = 0
) -> bytes:
    """Valid mono 16-bit PCM RIFF-WAV; duration = n_samples/rate."""
    byte_rate = sample_rate * 2
    t = np.arange(n_samples)
    samples = (
        np.sin(2 * np.pi * (220 + seed % 220) * t / sample_rate) * 12000
    ).astype("<i2")
    data = samples.tobytes()
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, byte_rate, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def make_gif(width: int, height: int) -> bytes:
    """Minimal GIF89a header + logical screen descriptor + trailer —
    enough container structure for metadata parsing (no frame data)."""
    return (
        b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00;"
    )


META_STRUCT = T.StructType(
    [
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("codec", T.StringType(), True),
    ]
)


def attach_metadata(
    media: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """Populate the ``meta`` struct from REAL payload bytes via the
    header parsers — an Arrow-batched map-only pass (scalar pandas UDF,
    no shuffle); bytes never leave the executor."""

    @F.pandas_udf(META_STRUCT)
    def parse(payloads: pd.Series) -> pd.DataFrame:
        metas = [parse_media_metadata(p) for p in payloads]
        return pd.DataFrame(metas)

    return media.withColumn("meta", parse(F.col(payload_col)))


def extract_features(
    media: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    fake: bool = True,
    with_checksum: bool = False,
) -> DataFrame:
    """mapInPandas feature extraction: binary payload -> float array.

    Batch shape: input Arrow batches of (id, payload); output
    (id, feature:array<float>[, payload_md5]). Partitioning is preserved
    — no shuffle; at scale this is a map-only pass with bytes never
    leaving executors.

    ``with_checksum`` adds md5(payload) computed INSIDE the UDF — an
    oracle-recomputable witness that the Arrow plumbing delivered the
    exact bytes to Python (the driver checks it against DuckDB's md5).
    """
    fields = [
        T.StructField(id_col, T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
    if with_checksum:
        fields.append(T.StructField("payload_md5", T.StringType(), False))
    out_schema = T.StructType(fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_image(p, fake=fake).tolist()
                for p in pdf[payload_col]
            ]
            out = {id_col: pdf[id_col], "feature": feats}
            if with_checksum:
                out["payload_md5"] = [
                    hashlib.md5(p or b"").hexdigest()
                    for p in pdf[payload_col]
                ]
            yield pd.DataFrame(out)

    return media.select(id_col, payload_col).mapInPandas(run, out_schema)


def frame_sample_plan(
    media: DataFrame,
    every_s: float = 1.0,
    id_col: str = "media_id",
) -> DataFrame:
    """Video frame-sampling plumbing: one output row per planned frame
    timestamp (explode over a native sequence; the actual frame decode
    is the stubbed step). Demonstrates the fan-out schema."""
    return (
        media.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ts",
            F.explode(
                F.sequence(
                    F.lit(0.0),
                    F.coalesce(F.col("meta.duration_s"), F.lit(0.0)),
                    F.lit(every_s),
                )
            ),
        )
        .select(id_col, "frame_ts")
    )


def media_metadata_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregation: proves filters/aggs run without
    touching payload bytes (column pruning keeps the scan narrow)."""
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("meta.duration_s").alias("avg_duration_s"),
        F.avg(F.octet_length("payload")).alias("avg_payload_bytes"),
    )
