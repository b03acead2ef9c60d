"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

Header parsing and BMP / PNG / GIF / baseline-JPEG pixel decoding are
REAL — pure-Python struct readers for the published PNG / BMP / GIF /
JPEG / RIFF-WAV container layouts plus stdlib-zlib PNG unfiltering
(including Adam7 deinterlacing), a from-scratch GIF LZW codec with the
full GIF89a animation model (disposal, transparency, interlacing), and
a T.81 Huffman+IDCT JPEG decoder covering baseline (SOF0) and
progressive (SOF2, Annex G spectral selection + successive
approximation), no codec libraries needed. Remaining codecs
(arithmetic-coded JPEG, MP3, H.264, ...)
require libraries absent from this container:
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


def _unfilter_scanlines(
    raw: bytes, h: int, stride: int, bpp: int, offset: int = 0
) -> np.ndarray:
    """Undo PNG per-scanline filtering (spec §9, filter types 0-4) on
    ``h`` scanlines of ``stride`` bytes each, starting at ``offset``
    into ``raw``. Returns the reconstructed (h, stride) byte grid."""
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = raw[offset + y * (stride + 1)]
        row = np.frombuffer(
            raw, dtype=np.uint8,
            count=stride, offset=offset + y * (stride + 1) + 1,
        ).astype(np.int32)
        if f == 0:
            recon = row
        elif f == 1:  # Sub: cumulative sum per byte position in pixel
            recon = np.cumsum(
                row.reshape(stride // bpp, bpp), axis=0, dtype=np.int64
            ).reshape(stride) % 256
        elif f == 2:  # Up
            recon = row + prev
        elif f == 3:  # Average — sequential left dependency
            recon = np.zeros(stride, dtype=np.int32)
            p32 = prev.astype(np.int32)
            for i in range(stride):
                left = recon[i - bpp] if i >= bpp else 0
                recon[i] = (row[i] + (left + p32[i]) // 2) % 256
        elif f == 4:  # Paeth — sequential left dependency
            recon = np.zeros(stride, dtype=np.int32)
            p32 = prev.astype(np.int32)
            for i in range(stride):
                a = int(recon[i - bpp]) if i >= bpp else 0
                c = int(p32[i - bpp]) if i >= bpp else 0
                recon[i] = (row[i] + _paeth(a, int(p32[i]), c)) % 256
        else:
            raise ValueError(f"bad PNG filter type {f}")
        prev = (recon % 256).astype(np.uint8)
        out[y] = prev
    return out


def _png_grid_samples(
    grid: np.ndarray, w: int, h: int, ch: int, depth: int, stride: int
) -> np.ndarray:
    """Reconstructed byte grid -> (h, w, ch) uint8 samples (16-bit
    high-byte downshift, sub-byte MSB-first unpacking; palette/gray
    colorization happens later on the assembled full-size grid)."""
    if depth == 16:
        # big-endian samples: the high byte IS the 8-bit downshift
        return grid[:, 0::2].reshape(h, w, ch)
    if depth < 8:
        bits = np.unpackbits(grid, axis=1)  # (h, stride*8) MSB-first
        idx = bits[:, : (stride * 8 // depth) * depth].reshape(
            h, -1, depth
        )
        weights = 1 << np.arange(depth - 1, -1, -1)
        samples = (idx * weights).sum(axis=2)[:, :w]  # (h, w)
        return samples.astype(np.uint8).reshape(h, w, 1)
    return grid.reshape(h, w, ch)


# Adam7 interlace pass layout (PNG spec §8.2): per pass
# (x_start, y_start, x_step, y_step)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def decode_png(payload: bytes) -> np.ndarray:
    """REAL decode of a PNG into an (h, w, 3) uint8 RGB array — stdlib
    ``zlib`` + per-scanline unfiltering, no codec library (PNG spec:
    chunk walk, IDAT concat, filter types 0-4 including Paeth, PLTE
    lookup, sub-byte bit unpacking, 16-bit downshift, Adam7
    deinterlacing). Color types: 0 (gray, depth 1/2/4/8/16, replicated
    to RGB), 2 (RGB, depth 8/16), 3 (palette, depth 1/2/4/8), 6 (RGBA,
    depth 8/16, alpha dropped). Interlace methods 0 (none) and 1
    (Adam7: seven independently-filtered reduced images scattered back
    onto the full grid)."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, w = 8, None
    idat = bytearray()
    plte: np.ndarray | None = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        typ = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if typ == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            ok_depths = {
                0: (1, 2, 4, 8, 16),
                2: (8, 16),
                3: (1, 2, 4, 8),
                6: (8, 16),
            }
            if (
                interlace not in (0, 1)
                or color not in ok_depths
                or depth not in ok_depths[color]
            ):
                raise ValueError(
                    f"unsupported PNG flavour (depth={depth}, "
                    f"color={color}, interlace={interlace})"
                )
            ch = {0: 1, 2: 3, 3: 1, 6: 4}[color]
        elif typ == b"PLTE":
            if len(data) % 3:
                raise ValueError("PLTE length not a multiple of 3")
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if color == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE chunk")
    raw = zlib.decompress(bytes(idat))
    # filtering operates on BYTES; the left-neighbour offset is the
    # byte width of one pixel, floored to 1 for sub-byte depths
    # (PNG spec §9: bpp = ceil-free max(1, ch*depth/8))
    bpp = max(1, ch * depth // 8)
    if interlace == 0:
        stride = (w * ch * depth + 7) // 8
        if len(raw) != h * (stride + 1):
            raise ValueError("PNG IDAT length mismatch")
        grid = _unfilter_scanlines(raw, h, stride, bpp)
        px = _png_grid_samples(grid, w, h, ch, depth, stride)
    else:
        # Adam7: seven reduced images, each filtered independently
        # with its own scanline stride; empty passes contribute zero
        # bytes (spec §8.2)
        px = np.zeros((h, w, ch), dtype=np.uint8)
        offset = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            pstride = (pw * ch * depth + 7) // 8
            need = ph * (pstride + 1)
            if offset + need > len(raw):
                raise ValueError("PNG IDAT length mismatch")
            grid = _unfilter_scanlines(raw, ph, pstride, bpp, offset)
            offset += need
            px[y0::dy, x0::dx] = _png_grid_samples(
                grid, pw, ph, ch, depth, pstride
            )
        if offset != len(raw):
            raise ValueError("PNG IDAT length mismatch")
    if color == 3:
        if int(px.max()) >= len(plte):
            raise ValueError("palette index out of range")
        return plte[px.reshape(h, w)].copy()
    if depth < 8:
        # grayscale: scale to full 8-bit range (spec sample depth
        # rescale: v * 255 / (2^depth - 1), exact for 1/2/4)
        px = (
            px.astype(np.int32) * (255 // ((1 << depth) - 1))
        ).astype(np.uint8)
    if ch == 1:
        return np.repeat(px, 3, axis=2).copy()
    return np.ascontiguousarray(px[:, :, :3]).copy()


# GIF LZW (spec: GIF89a appendix F) — variable-width codes packed
# LSB-first; encoder bumps width at next_code == (1<<width)+1, decoder
# at next_code == (1<<width): the one-step offset matches the decoder's
# lagging table build. Both freeze the table at 4096 (deferred clear).

_GIF_MAX_CODE = 4096


def _lzw_encode(indices: np.ndarray, min_code_size: int = 8) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1
    width = min_code_size + 1
    acc = 0
    nbits = 0
    out = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    it = iter(int(i) for i in indices)
    prefix = next(it)
    for k in it:
        if (prefix, k) in table:
            prefix = table[(prefix, k)]
            continue
        emit(prefix)
        if next_code < _GIF_MAX_CODE:
            table[(prefix, k)] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        prefix = k
    emit(prefix)
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(
    data: bytes, min_code_size: int, n_pixels: int
) -> np.ndarray:
    clear = 1 << min_code_size
    eoi = clear + 1

    def fresh_table() -> list[bytes]:
        # slots for clear/eoi keep len(table) == next free code
        return [bytes([i]) for i in range(clear)] + [b"", b""]

    table = fresh_table()
    width = min_code_size + 1
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    out = bytearray()
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream truncated")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = fresh_table()
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table) and code not in (clear, eoi):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK case
        else:
            raise ValueError(f"bad GIF LZW code {code}")
        out += entry
        if prev is not None and len(table) < _GIF_MAX_CODE:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


# GIF interlace row order (spec appendix E): 4 passes of
# (row_start, row_step)
_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif_frames(
    payload: bytes, max_frames: int | None = None
) -> np.ndarray:
    """REAL decode of a GIF87a/89a into composited canvas snapshots,
    one per frame: an (n, H, W, 3) uint8 RGB array at logical-screen
    size — pure-Python chunk walk + from-scratch variable-width LZW
    (stdlib only). Implements the full animation model (GIF89a spec):
    Graphic Control Extension transparency (transparent index skipped,
    underlying canvas shows through), disposal methods 0/1 (leave),
    2 (restore region to background color) and 3 (restore previous
    canvas), sub-rectangle frame placement, local color tables, and
    4-pass row interlacing (appendix E)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh = struct.unpack("<HH", payload[6:10])
    flags = payload[10]
    bg_index = payload[11]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(
            payload, dtype=np.uint8, count=n * 3, offset=pos
        ).reshape(n, 3)
        pos += n * 3
    bg = (
        gct[bg_index]
        if gct is not None and bg_index < len(gct)
        else np.zeros(3, dtype=np.uint8)
    )
    canvas = np.broadcast_to(bg, (sh, sw, 3)).astype(np.uint8).copy()
    frames: list[np.ndarray] = []
    disposal, transparent = 0, None
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label then sub-blocks
            label = payload[pos + 1]
            pos += 2
            if label == 0xF9 and payload[pos] == 4:
                packed, _delay, tidx = struct.unpack(
                    "<BHB", payload[pos + 1:pos + 5]
                )
                disposal = (packed >> 2) & 0x07
                transparent = tidx if packed & 0x01 else None
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        left, top, w, h = struct.unpack("<HHHH", payload[pos + 1:pos + 9])
        iflags = payload[pos + 9]
        pos += 10
        if left + w > sw or top + h > sh:
            raise ValueError("GIF frame exceeds logical screen")
        palette = gct
        if iflags & 0x80:  # local color table wins
            n = 2 << (iflags & 0x07)
            palette = np.frombuffer(
                payload, dtype=np.uint8, count=n * 3, offset=pos
            ).reshape(n, 3)
            pos += n * 3
        if palette is None:
            raise ValueError("GIF frame without a color table")
        min_code_size = payload[pos]
        pos += 1
        lzw = bytearray()
        while payload[pos] != 0:
            size = payload[pos]
            lzw += payload[pos + 1:pos + 1 + size]
            pos += 1 + size
        pos += 1  # block terminator
        idx = _lzw_decode(bytes(lzw), min_code_size, w * h)
        if len(idx) < w * h:
            raise ValueError("GIF pixel data short")
        idx = idx[: w * h].reshape(h, w)
        if iflags & 0x40:  # interlaced: rows arrive in 4-pass order
            deint = np.empty_like(idx)
            src = 0
            for start, step in _GIF_INTERLACE:
                n_rows = len(range(start, h, step))
                deint[start::step] = idx[src:src + n_rows]
                src += n_rows
            idx = deint
        if int(idx.max()) >= len(palette):
            raise ValueError("GIF index out of color-table range")
        prev_canvas = canvas.copy() if disposal == 3 else None
        region = canvas[top:top + h, left:left + w]
        mask = (
            np.ones((h, w), dtype=bool)
            if transparent is None
            else idx != transparent
        )
        region[mask] = palette[idx][mask]
        frames.append(canvas.copy())
        if max_frames is not None and len(frames) >= max_frames:
            return np.stack(frames)
        # disposal applies BEFORE the next frame draws
        if disposal == 2:
            canvas[top:top + h, left:left + w] = bg
        elif disposal == 3:
            canvas = prev_canvas
        disposal, transparent = 0, None  # GCE scopes one image
    if not frames:
        raise ValueError("GIF contains no image frame")
    return np.stack(frames)


def decode_gif(payload: bytes) -> np.ndarray:
    """First composited canvas frame of a GIF (see
    ``decode_gif_frames``) — for a full-screen single-frame GIF this
    is exactly the frame's own pixels, preserving the md5 byte-parity
    oracle."""
    return decode_gif_frames(payload, max_frames=1)[0]


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


# ---------------------------------------------------------------------------
# baseline JPEG (public ITU-T T.81 spec; JFIF color convention) —
# marker walk, canonical Huffman, dequantize, zigzag, separable IDCT,
# chroma upsample, YCbCr->RGB. Pure numpy + stdlib; entropy decoding
# is a per-bit Python loop (fine for fixture-scale payloads — at
# pipeline scale the decode runs inside mapInPandas across executors,
# so per-image cost parallelizes like any other Pandas UDF).
# ---------------------------------------------------------------------------

# zigzag scan order -> natural (row*8+col) index (T.81 Figure 5)
_JPEG_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# 8x8 DCT-II basis: C[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
_JPEG_DCT = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0)
            / 2.0
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)

# Annex K.3 typical Huffman tables (BITS = #codes of length 1..16)
_JPEG_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_JPEG_DC_VALS = list(range(12))
_JPEG_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_JPEG_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _huffman_codes(
    bits: list[int], vals: list[int]
) -> dict[int, tuple[int, int]]:
    """Canonical Huffman codes per T.81 Annex C: value -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitReader:
    """MSB-first bit reader over a de-stuffed entropy segment."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def bit(self) -> int:
        byte = self.data[self.pos >> 3]
        b = (byte >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.bit()
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 EXTEND: map an s-bit magnitude to its signed value."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """REAL decode of a Huffman-coded 8-bit JPEG into an (h, w, 3)
    uint8 RGB array — full marker walk, DQT (8/16 bit), multi-table
    DHT (tables may be redefined between scans), DRI restart
    intervals, grayscale or 3 components with sampling factors 1-2
    (4:4:4 / 4:2:2 / 4:2:0), dequantize + zigzag + separable float
    IDCT, nearest-neighbour chroma upsampling, JFIF YCbCr->RGB.

    Both SEQUENTIAL (SOF0/SOF1, one interleaved scan) and PROGRESSIVE
    (SOF2, T.81 Annex G: spectral selection Ss..Se, successive
    approximation Ah/Al, DC-first + DC-refinement + AC-first with
    EOBRUN + AC-refinement correction-bit scans, interleaved DC /
    non-interleaved AC block orders) decode through ONE coefficient
    accumulator — every scan updates the per-component quantized
    coefficient grid, reconstruction happens once at EOI. Raises
    ValueError on arithmetic-coded, lossless, hierarchical, or 12-bit
    streams."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict[tuple[int, int], int]] = {}
    huff_ac: dict[int, dict[tuple[int, int], int]] = {}
    frame = None
    restart_interval = 0
    coeffs: dict[int, np.ndarray] = {}
    saw_scan = False
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (seglen,) = struct.unpack(">H", payload[pos:pos + 2])
        seg = payload[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq:
                    tbl = np.frombuffer(
                        seg, dtype=">u2", count=64, offset=i
                    ).astype(np.int64)
                    i += 128
                else:
                    tbl = np.frombuffer(
                        seg, dtype=np.uint8, count=64, offset=i
                    ).astype(np.int64)
                    i += 64
                qt[tq] = tbl  # zigzag order
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1:i + 17])
                n = sum(bits)
                vals = list(seg[i + 17:i + 17 + n])
                i += 17 + n
                # reverse map for decoding: (length, code) -> value
                fwd = _huffman_codes(bits, vals)
                rev = {(ln, code): v for v, (code, ln) in fwd.items()}
                (huff_dc if tc == 0 else huff_ac)[th] = rev
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 seq, SOF2 prog
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            if any(
                c["h"] not in (1, 2) or c["v"] not in (1, 2)
                for c in comps
            ):
                raise ValueError("sampling factors above 2 unsupported")
            frame = {
                "h": h,
                "w": w,
                "comps": comps,
                "progressive": marker == 0xC2,
            }
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
            mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
            frame["hmax"], frame["vmax"] = hmax, vmax
            frame["mcus_x"], frame["mcus_y"] = mcus_x, mcus_y
            coeffs = {
                c["id"]: np.zeros(
                    (mcus_y * c["v"], mcus_x * c["h"], 64),
                    dtype=np.int64,
                )
                for c in comps
            }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"non-baseline JPEG (SOF marker 0x{marker:02x})"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_sel = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_sel.append((cs, tdta >> 4, tdta & 0x0F))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            if frame["progressive"]:
                if not (ss == se == 0 or ss >= 1):
                    raise ValueError("bad progressive spectral band")
                if ss >= 1 and ns != 1:
                    raise ValueError(
                        "progressive AC scans must be single-component"
                    )
            elif not (ss == 0 and se == 63 and ah == 0 and al == 0):
                raise ValueError("bad sequential scan parameters")
            pos = _jpeg_entropy_scan(
                payload, pos + seglen, frame, scan_sel,
                (ss, se, ah, al), coeffs, huff_dc, huff_ac,
                restart_interval,
            )
            saw_scan = True
            continue
        else:
            pass  # APPn / COM / others: skip
        pos += seglen
    if not saw_scan:
        raise ValueError("JPEG has no SOS scan")
    return _jpeg_reconstruct(frame, qt, coeffs)


def _jpeg_entropy_scan(
    payload: bytes,
    pos: int,
    frame: dict,
    scan_sel: list[tuple[int, int, int]],
    band: tuple[int, int, int, int],
    coeffs: dict[int, np.ndarray],
    huff_dc: dict,
    huff_ac: dict,
    restart_interval: int,
) -> int:
    """Entropy-decode ONE scan into the per-component quantized
    coefficient grids (zigzag order) and return the byte position of
    the marker that ended the scan. Covers sequential full-band scans
    and all four progressive scan kinds (T.81 Annex G): DC first, DC
    refinement, AC first (EOBRUN), AC refinement (correction bits)."""
    ss, se, ah, al = band
    # de-stuff the entropy stream, splitting at RST markers
    segments: list[bytes] = []
    cur = bytearray()
    i = pos
    n = len(payload)
    while i < n:
        b = payload[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        m = payload[i + 1] if i + 1 < n else 0xD9
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:
            segments.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # EOI or next marker: scan ends here
            break
    segments.append(bytes(cur))
    end_pos = i

    h, w = frame["h"], frame["w"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    mcus_x, mcus_y = frame["mcus_x"], frame["mcus_y"]
    by_id = {c["id"]: c for c in frame["comps"]}
    order = [(by_id[cs], td, ta) for cs, td, ta in scan_sel]

    pred = {c["id"]: 0 for c, _, _ in order}
    eob_run = 0
    reader = _BitReader(segments[0])
    seg_idx = 0

    def first_pass(zz, cid, dct, act) -> None:
        """Sequential block / progressive first scan (Ah == 0)."""
        nonlocal eob_run
        k = ss
        if ss == 0:
            s = _huff_decode(reader, dct)
            diff = _extend(reader.bits(s), s) if s else 0
            pred[cid] += diff
            zz[0] = pred[cid] << al
            k = 1
        if se == 0:
            return
        if eob_run > 0:  # inside an EOB run: whole AC band stays zero
            eob_run -= 1
            return
        while k <= se:
            rs = _huff_decode(reader, act)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                # EOBn: run of (1<<r)+bits(r) all-zero bands,
                # INCLUDING this one
                eob_run = (1 << r) - 1 + (reader.bits(r) if r else 0)
                break
            k += r
            if k > se:
                raise ValueError("AC index overflow")
            zz[k] = _extend(reader.bits(s), s) << al
            k += 1

    def refine_pass(zz, cid, act) -> None:
        """Progressive refinement scan (Ah > 0): one correction bit
        per already-nonzero coefficient, sign+bit for newly-nonzero
        ones (T.81 G.1.2.2 DC / G.1.2.3 AC)."""
        nonlocal eob_run
        if ss == 0:
            # DC refinement: append the next magnitude bit (bitwise
            # OR is two's-complement-correct for negative values)
            if reader.bit():
                zz[0] |= 1 << al
            return
        p1, m1 = 1 << al, -(1 << al)
        k = ss
        if eob_run == 0:
            while k <= se:
                rs = _huff_decode(reader, act)
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r != 15:
                        eob_run = (1 << r) + (
                            reader.bits(r) if r else 0
                        )
                        break
                    newval = 0  # ZRL: skip 16 zero-history coeffs
                else:
                    if s != 1:
                        raise ValueError(
                            "bad AC refinement magnitude"
                        )
                    newval = p1 if reader.bit() else m1
                # advance over r zero-history positions, emitting a
                # correction bit at every nonzero-history one passed
                while k <= se:
                    if zz[k] != 0:
                        if reader.bit() and (zz[k] & p1) == 0:
                            zz[k] += p1 if zz[k] >= 0 else m1
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if k <= se and newval:
                    zz[k] = newval
                k += 1
        if eob_run > 0:
            # rest of the band: correction bits only
            while k <= se:
                if zz[k] != 0 and reader.bit() and (zz[k] & p1) == 0:
                    zz[k] += p1 if zz[k] >= 0 else m1
                k += 1
            eob_run -= 1

    def do_block(zz, cid, dct, act) -> None:
        if ah == 0:
            first_pass(zz, cid, dct, act)
        else:
            refine_pass(zz, cid, act)

    def restart() -> None:
        nonlocal reader, seg_idx, pred, eob_run
        seg_idx += 1
        reader = _BitReader(segments[seg_idx])
        pred = {c["id"]: 0 for c, _, _ in order}
        eob_run = 0

    # single-component progressive scans (all AC scans, and DC scans
    # of one component) use the component's own block raster; every
    # multi-component scan — and every sequential scan — is MCU-order
    interleaved = len(order) > 1 or not frame["progressive"]
    if interleaved:
        unit = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if (
                    restart_interval
                    and unit
                    and unit % restart_interval == 0
                ):
                    restart()
                for c, td, ta in order:
                    dct = huff_dc.get(td)
                    act = huff_ac.get(ta)
                    for v in range(c["v"]):
                        for hh in range(c["h"]):
                            zz = coeffs[c["id"]][
                                my * c["v"] + v, mx * c["h"] + hh
                            ]
                            do_block(zz, c["id"], dct, act)
                unit += 1
    else:
        c, td, ta = order[0]
        dct = huff_dc.get(td)
        act = huff_ac.get(ta)
        cw = (w * c["h"] + hmax - 1) // hmax
        chh = (h * c["v"] + vmax - 1) // vmax
        cbw = (cw + 7) // 8
        cbh = (chh + 7) // 8
        unit = 0
        for by in range(cbh):
            for bx in range(cbw):
                if (
                    restart_interval
                    and unit
                    and unit % restart_interval == 0
                ):
                    restart()
                do_block(coeffs[c["id"]][by, bx], c["id"], dct, act)
                unit += 1
    return end_pos


def _jpeg_reconstruct(
    frame: dict, qt: dict, coeffs: dict[int, np.ndarray]
) -> np.ndarray:
    """Dequantize + de-zigzag + IDCT every block, upsample chroma,
    crop to frame size, JFIF YCbCr->RGB (grayscale replicated)."""
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    full = []
    for c in comps:
        grid = coeffs[c["id"]]
        bv, bh = grid.shape[:2]
        # vectorized across blocks: dequant in zigzag order, scatter
        # to natural order, batched separable IDCT
        deq = grid.astype(np.float64) * qt[c["tq"]][None, None, :]
        nat = np.zeros_like(deq)
        nat[:, :, _JPEG_ZIGZAG] = deq
        blocks = nat.reshape(bv, bh, 8, 8)
        spatial = (
            np.einsum(
                "ux,ijuv,vy->ijxy", _JPEG_DCT, blocks, _JPEG_DCT
            )
            + 128.0
        )
        p = spatial.transpose(0, 2, 1, 3).reshape(bv * 8, bh * 8)
        if c["h"] < hmax:
            p = np.repeat(p, hmax // c["h"], axis=1)
        if c["v"] < vmax:
            p = np.repeat(p, vmax // c["v"], axis=0)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def make_jpeg(width: int, height: int, seed: int = 0) -> bytes:
    """Valid baseline grayscale JFIF JPEG whose decode is EXACT:
    quantization table all-ones and every 8x8 block a constant value
    ``(3*bx + 2*by + seed) % 256`` (bx, by = block coordinates), so
    each block is DC-only (AC all zero), the quantized DC
    ``8*(g-128)`` is exact, and the IDCT reproduces g to the bit —
    pixel(x, y) = (3*(x//8) + 2*(y//8) + seed) % 256, relationally
    replayable by the decode oracle. Uses the Annex K typical Huffman
    tables (embedded in DHT, so the file is self-consistent)."""
    bx = (width + 7) // 8
    by = (height + 7) // 8
    dc_codes = _huffman_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _huffman_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    eob_code, eob_len = ac_codes[0x00]

    out_bits: list[tuple[int, int]] = []  # (value, nbits)
    pred = 0
    for j in range(by):
        for i in range(bx):
            g = (3 * i + 2 * j + seed) % 256
            dc = 8 * (g - 128)
            diff = dc - pred
            pred = dc
            mag = abs(diff)
            s = mag.bit_length()
            code, ln = dc_codes[s]
            out_bits.append((code, ln))
            if s:
                v = diff if diff >= 0 else diff + (1 << s) - 1
                out_bits.append((v & ((1 << s) - 1), s))
            out_bits.append((eob_code, eob_len))

    # pack MSB-first, pad with 1s, byte-stuff FF -> FF 00
    acc = 0
    nacc = 0
    raw = bytearray()
    for v, ln in out_bits:
        acc = (acc << ln) | v
        nacc += ln
        while nacc >= 8:
            raw.append((acc >> (nacc - 8)) & 0xFF)
            nacc -= 8
    if nacc:
        raw.append(((acc << (8 - nacc)) | ((1 << (8 - nacc)) - 1)) & 0xFF)
    stuffed = bytearray()
    for b in raw:
        stuffed.append(b)
        if b == 0xFF:
            stuffed.append(0x00)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(body) + 2
        ) + body

    dqt = seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = seg(
        0xC0,
        struct.pack(">BHHB", 8, height, width, 1)
        + bytes([1, 0x11, 0]),
    )
    dht = seg(
        0xC4,
        bytes([0x00]) + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
        + bytes([0x10]) + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS),
    )
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return (
        b"\xff\xd8"
        + seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + dqt + sof + dht + sos + bytes(stuffed) + b"\xff\xd9"
    )


def _jpeg_pack_bits(tokens: list[tuple[int, int]]) -> bytes:
    """Pack (value, nbits) tokens MSB-first, pad with 1s, byte-stuff
    FF -> FF 00 (shared by the sequential and progressive writers)."""
    acc = 0
    nacc = 0
    raw = bytearray()
    for v, ln in tokens:
        acc = (acc << ln) | (v & ((1 << ln) - 1) if ln else 0)
        nacc += ln
        while nacc >= 8:
            raw.append((acc >> (nacc - 8)) & 0xFF)
            nacc -= 8
    if nacc:
        raw.append(
            ((acc << (8 - nacc)) | ((1 << (8 - nacc)) - 1)) & 0xFF
        )
    stuffed = bytearray()
    for b in raw:
        stuffed.append(b)
        if b == 0xFF:
            stuffed.append(0x00)
    return bytes(stuffed)


def _jpeg_fixed_huffman(
    symbols: set[int],
) -> tuple[list[int], list[int], dict[int, tuple[int, int]]]:
    """Equal-length canonical Huffman over exactly the symbols a scan
    emits (progressive scans need EOBn symbols Annex K's typical
    tables lack). Length L = ceil(log2(n+1)) keeps the all-ones code
    unused, as T.81 Annex C requires."""
    vals = sorted(symbols) if symbols else [0]
    n = len(vals)
    length = max(1, (n + 1 - 1).bit_length())
    while (1 << length) <= n:  # need n < 2^L strictly (all-ones free)
        length += 1
    bits = [0] * 16
    bits[length - 1] = n
    return bits, vals, _huffman_codes(bits, vals)


def _jpeg_progressive_from_coeffs(
    width: int,
    height: int,
    blocks: "np.ndarray",
    qtable: "np.ndarray",
    scan_script: list[tuple[int, int, int, int]] | None = None,
) -> bytes:
    """Grayscale PROGRESSIVE (SOF2) JFIF stream from quantized
    coefficient blocks (T.81 Annex G encoder): ``blocks`` is
    (by, bx, 8, 8) natural-order quantized coefficients, ``qtable``
    64 ints natural order. Each scan writes its own DHT (progressive
    first-AC scans emit EOBn symbols, refinement scans emit
    correction bits). Default script: DC first (Al=1) -> two AC bands
    first (Al=1) -> DC refine -> two AC band refines."""
    if scan_script is None:
        scan_script = [
            (0, 0, 0, 1),
            (1, 31, 0, 1),
            (32, 63, 0, 1),
            (0, 0, 1, 0),
            (1, 31, 1, 0),
            (32, 63, 1, 0),
        ]
    nby, nbx = blocks.shape[:2]
    zz_blocks = blocks.reshape(nby * nbx, 64)[:, _JPEG_ZIGZAG]

    def encode_scan(ss, se, ah, al):
        """-> (tokens, huff_symbols, is_dc). Tokens: ('h', sym) for
        Huffman-coded symbols, ('b', val, n) for raw appended bits."""
        toks: list[tuple] = []
        syms: set[int] = set()

        def h(sym):
            toks.append(("h", sym))
            syms.add(sym)

        def rawbits(v, n):
            if n:
                toks.append(("b", v, n))

        if ss == 0 and ah == 0:  # DC first (point transform = >> al)
            pred = 0
            for zz in zz_blocks:
                v = int(zz[0]) >> al
                diff = v - pred
                pred = v
                s = abs(diff).bit_length()
                h(s)
                rawbits(
                    diff if diff >= 0 else diff + (1 << s) - 1, s
                )
            return toks, syms, True
        if ss == 0:  # DC refinement: one magnitude bit per block
            for zz in zz_blocks:
                rawbits((int(zz[0]) >> al) & 1, 1)
            return toks, syms, True

        def flush_eobrun(state):
            run, br = state["eobrun"], state["br"]
            if run:
                r = run.bit_length() - 1
                h(r << 4)
                rawbits(run - (1 << r), r)
                state["eobrun"] = 0
            if br:
                for bit in br:
                    rawbits(bit, 1)
                state["br"] = []

        state = {"eobrun": 0, "br": []}
        if ah == 0:  # AC first: truncate-toward-zero by 2^al
            for zz in zz_blocks:
                r = 0
                for k in range(ss, se + 1):
                    c = int(zz[k])
                    v = (abs(c) >> al) * (1 if c >= 0 else -1)
                    if v == 0:
                        r += 1
                        continue
                    flush_eobrun(state)
                    while r > 15:
                        h(0xF0)  # ZRL
                        r -= 16
                    s = abs(v).bit_length()
                    h((r << 4) | s)
                    rawbits(
                        v if v >= 0 else v + (1 << s) - 1, s
                    )
                    r = 0
                if r:
                    state["eobrun"] += 1
                    if state["eobrun"] == 0x7FFF:
                        flush_eobrun(state)
            flush_eobrun(state)
            return toks, syms, False
        # AC refinement (G.1.2.3): newly-significant = scaled
        # magnitude exactly 1; older nonzeros get correction bits
        for zz in zz_blocks:
            absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
            eob = -1
            for idx, t in enumerate(absv):
                if t == 1:
                    eob = idx
            r = 0
            br: list[int] = []
            for idx, t in enumerate(absv):
                if t == 0:
                    r += 1
                    continue
                while r > 15 and idx <= eob:
                    flush_eobrun(state)
                    h(0xF0)
                    r -= 16
                    for bit in br:
                        rawbits(bit, 1)
                    br = []
                if t > 1:  # already significant: correction bit
                    br.append(t & 1)
                    continue
                flush_eobrun(state)
                h((r << 4) | 1)
                rawbits(1 if int(zz[ss + idx]) >= 0 else 0, 1)
                for bit in br:
                    rawbits(bit, 1)
                br = []
                r = 0
            if r or br:
                state["eobrun"] += 1
                state["br"].extend(br)
                if state["eobrun"] == 0x7FFF or len(state["br"]) > 900:
                    flush_eobrun(state)
        flush_eobrun(state)
        return toks, syms, False

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(body) + 2
        ) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(
        0xDB,
        bytes([0x00]) + bytes(int(q) & 0xFF for q in
                              np.asarray(qtable).reshape(64)[
                                  _JPEG_ZIGZAG]),
    )
    out += seg(
        0xC2,
        struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0]),
    )
    for ss, se, ah, al in scan_script:
        toks, syms, is_dc = encode_scan(ss, se, ah, al)
        serial: list[tuple[int, int]] = []
        if syms:
            bits, vals, codes = _jpeg_fixed_huffman(syms)
            tc = 0x00 if is_dc else 0x10
            out += seg(
                0xC4, bytes([tc]) + bytes(bits) + bytes(vals)
            )
            for t in toks:
                if t[0] == "h":
                    serial.append(codes[t[1]])
                else:
                    serial.append((t[1], t[2]))
        else:
            serial = [(t[1], t[2]) for t in toks if t[0] == "b"]
        out += seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))
        out += _jpeg_pack_bits(serial)
    out += b"\xff\xd9"
    return bytes(out)


def make_jpeg_progressive(
    width: int, height: int, seed: int = 0
) -> bytes:
    """Valid PROGRESSIVE grayscale JFIF JPEG with the same DC-exact
    pixel law as ``make_jpeg`` — pixel(x, y) = (3*(x//8) + 2*(y//8) +
    seed) % 256 — delivered across six spectral-selection /
    successive-approximation scans (DC Al=1 -> AC bands -> DC refine
    -> AC refines), so a correct Annex G decoder recovers the formula
    bit-exactly and the oracle stays relationally replayable."""
    bx = (width + 7) // 8
    by = (height + 7) // 8
    blocks = np.zeros((by, bx, 8, 8), dtype=np.int64)
    j, i = np.mgrid[0:by, 0:bx]
    blocks[:, :, 0, 0] = 8 * (((3 * i + 2 * j + seed) % 256) - 128)
    return _jpeg_progressive_from_coeffs(
        width, height, blocks, np.ones(64, dtype=np.int64)
    )


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode + featurize an image payload.

    Uncompressed 24-bit BMP, PNG (gray/RGB/RGBA/palette at depths
    1-16, interlaced or not), GIF (single- or multi-frame, interlaced,
    transparency + disposal composited; features come from the first
    composited canvas) and Huffman JPEG — BASELINE (SOF0, grayscale /
    4:4:4 / 4:2:2 / 4:2:0) and PROGRESSIVE (SOF2, spectral selection
    + successive approximation) — decode for REAL (header + numpy +
    stdlib zlib + from-scratch LZW / Huffman + IDCT, see decode_bmp /
    decode_png / decode_gif_frames / decode_jpeg). Remaining flavours
    (arithmetic-coded / lossless / hierarchical JPEG) raise
    NotImplementedError unless ``fake=True``, which substitutes the
    deterministic md5-seeded pseudo-decoder."""
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
    if payload and payload[:6] in (b"GIF87a", b"GIF89a"):
        try:
            return _image_features(decode_gif(payload))
        except (ValueError, struct.error, IndexError):
            if not fake:
                raise
    if payload and payload[:2] == b"\xff\xd8":
        try:
            return _image_features(decode_jpeg(payload))
        except (ValueError, struct.error, IndexError, KeyError):
            if not fake:
                raise
    if not fake:
        raise NotImplementedError(
            "decoding this format requires an imaging library not "
            "present in this environment; pass fake=True for the "
            "deterministic stub (uncompressed 24-bit BMP, PNG at "
            "depths 1-16 incl. Adam7, single/multi-frame GIF and "
            "baseline + progressive Huffman JPEG decode for real)"
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


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _filter_scanlines(
    flat: np.ndarray, bpp: int, filter_mode: str
) -> bytes:
    """Filter an (h, stride) byte matrix into the PNG pre-compression
    stream. ``"none"`` writes every scanline with filter 0
    (byte-stable — the md5-parity oracles depend on it); ``"mixed"``
    filters row y with type ``y % 5`` (None/Sub/Up/Average/Paeth),
    exercising the decoder's full unfilter matrix while producing
    identical pixels. ``bpp`` is the byte width of one pixel (filter
    left-neighbour offset), floored to 1 for sub-byte depths."""
    flat = flat.astype(np.int32)
    height = flat.shape[0]
    z = np.zeros(bpp, np.int32)
    parts = []
    for y in range(height):
        row = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros_like(row)
        f = (y % 5) if filter_mode == "mixed" else 0
        if f == 0:
            filt = row
        elif f == 1:  # Sub
            left = np.concatenate([z, row[:-bpp]])
            filt = (row - left) % 256
        elif f == 2:  # Up
            filt = (row - prev) % 256
        elif f == 3:  # Average
            left = np.concatenate([z, row[:-bpp]])
            filt = (row - (left + prev) // 2) % 256
        else:  # Paeth
            left = np.concatenate([z, row[:-bpp]])
            ul = np.concatenate([z, prev[:-bpp]])
            pred = np.array(
                [
                    _paeth(int(a), int(b), int(c))
                    for a, b, c in zip(left, prev, ul)
                ],
                dtype=np.int32,
            )
            filt = (row - pred) % 256
        parts.append(bytes([f]) + filt.astype(np.uint8).tobytes())
    return b"".join(parts)


def make_png(
    width: int, height: int, seed: int = 0, filter_mode: str = "none"
) -> bytes:
    """Valid 8-bit RGB PNG, one zlib IDAT (pixel value per channel:
    base = (3x + y + seed) % 256, then +0/+60/+120)."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    y_idx, x_idx = np.mgrid[0:height, 0:width]
    base = (3 * x_idx + y_idx + seed) % 256
    px = np.stack(
        [base, (base + 60) % 256, (base + 120) % 256], axis=-1
    ).astype(np.uint8)
    raw = _filter_scanlines(
        px.reshape(height, width * 3), 3, filter_mode
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def make_png_palette(
    width: int,
    height: int,
    seed: int = 0,
    depth: int = 8,
    filter_mode: str = "none",
) -> bytes:
    """Valid palette (color type 3) PNG at bit depth 1/2/4/8.

    Pixel index = (x + y + seed) % 2^depth; palette entry j =
    ((7j+seed)%256, (13j+seed)%256, (29j+seed)%256) — both formulas
    are relationally replayable, so the decode oracle stays exact.
    Sub-byte rows are MSB-first bit-packed (PNG spec §7.2); filtering
    operates on the PACKED bytes with bpp=1, matching the decoder."""
    if depth not in (1, 2, 4, 8):
        raise ValueError("palette PNG depth must be 1/2/4/8")
    n = 1 << depth
    j = np.arange(n, dtype=np.int64)
    plte = np.stack(
        [(7 * j + seed) % 256, (13 * j + seed) % 256, (29 * j + seed) % 256],
        axis=-1,
    ).astype(np.uint8)
    y_idx, x_idx = np.mgrid[0:height, 0:width]
    idx = ((x_idx + y_idx + seed) % n).astype(np.uint8)
    if depth == 8:
        packed = idx
    else:
        # expand each index to `depth` MSB-first bits, pad the row to
        # a byte boundary, re-pack
        weights = 1 << np.arange(depth - 1, -1, -1)
        bits = ((idx[:, :, None] & weights) > 0).astype(np.uint8)
        bits = bits.reshape(height, width * depth)
        pad = (-bits.shape[1]) % 8
        if pad:
            bits = np.pad(bits, ((0, 0), (0, pad)))
        packed = np.packbits(bits, axis=1)
    ihdr = struct.pack(">IIBBBBB", width, height, depth, 3, 0, 0, 0)
    raw = _filter_scanlines(packed, 1, filter_mode)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", plte.tobytes())
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def make_png16(
    width: int, height: int, seed: int = 0, filter_mode: str = "none"
) -> bytes:
    """Valid 16-bit RGB PNG. Each 16-bit sample is v*257 (= v<<8 | v)
    of the 8-bit make_png value, so the decoder's high-byte downshift
    recovers exactly the 8-bit formula — relationally replayable."""
    ihdr = struct.pack(">IIBBBBB", width, height, 16, 2, 0, 0, 0)
    y_idx, x_idx = np.mgrid[0:height, 0:width]
    base = (3 * x_idx + y_idx + seed) % 256
    px8 = np.stack(
        [base, (base + 60) % 256, (base + 120) % 256], axis=-1
    ).astype(np.uint16)
    px16 = (px8 * 257).astype(">u2")  # big-endian samples
    flat = np.frombuffer(px16.tobytes(), dtype=np.uint8).reshape(
        height, width * 6
    )
    raw = _filter_scanlines(flat, 6, filter_mode)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def make_png_interlaced(
    width: int, height: int, seed: int = 0, filter_mode: str = "mixed"
) -> bytes:
    """Valid Adam7-interlaced 8-bit RGB PNG — same pixel formula as
    ``make_png`` (base = (3x + y + seed) % 256, then +0/+60/+120), so
    the relational decode oracle is shared; the seven reduced images
    are filtered independently (spec §8.2) and concatenated into one
    zlib stream."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 1)
    y_idx, x_idx = np.mgrid[0:height, 0:width]
    base = (3 * x_idx + y_idx + seed) % 256
    px = np.stack(
        [base, (base + 60) % 256, (base + 120) % 256], axis=-1
    ).astype(np.uint8)
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = px[y0::dy, x0::dx]
        ph, pw = sub.shape[:2]
        if pw == 0 or ph == 0:
            continue
        raw += _filter_scanlines(
            np.ascontiguousarray(sub).reshape(ph, pw * 3),
            3,
            filter_mode,
        )
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
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


def make_gif(width: int, height: int, seed: int = 0) -> bytes:
    """Valid single-frame GIF89a with a 256-entry global color table
    (palette[i] = (i, (i+85)%256, (i+170)%256) RGB) and REAL
    LZW-compressed pixel indices (index = (x + 2*y + seed) % 256),
    emitted in ≤255-byte sub-blocks by the from-scratch encoder."""
    pal = np.arange(256, dtype=np.uint8)
    palette = np.stack([pal, pal + 85, pal + 170], axis=-1)
    y_idx, x_idx = np.mgrid[0:height, 0:width]
    indices = ((x_idx + 2 * y_idx + seed) % 256).astype(np.uint8)
    lzw = _lzw_encode(indices.reshape(-1), min_code_size=8)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        blocks += bytes([len(chunk)]) + chunk
    return (
        b"GIF89a"
        + struct.pack("<HH", width, height)
        + b"\xf7\x00\x00"  # GCT present, 256 entries
        + palette.tobytes()
        + b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
        + b"\x08"  # LZW min code size
        + bytes(blocks)
        + b"\x00;"
    )


def _gif_frame_bytes(
    indices: np.ndarray,
    left: int,
    top: int,
    disposal: int = 0,
    transparent: int | None = None,
    interlaced: bool = False,
) -> bytes:
    """One GCE + image-descriptor + LZW data block for an (h, w) index
    array placed at (left, top)."""
    h, w = indices.shape
    if interlaced:  # emit rows in 4-pass order (spec appendix E)
        indices = np.concatenate(
            [indices[start::step] for start, step in _GIF_INTERLACE]
        )
    packed = (disposal & 0x07) << 2
    tidx = 0
    if transparent is not None:
        packed |= 0x01
        tidx = transparent
    gce = b"\x21\xf9\x04" + struct.pack("<BHB", packed, 4, tidx) + b"\x00"
    lzw = _lzw_encode(
        np.ascontiguousarray(indices).reshape(-1), min_code_size=8
    )
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        blocks += bytes([len(chunk)]) + chunk
    return (
        gce
        + b"\x2c"
        + struct.pack("<HHHH", left, top, w, h)
        + (b"\x40" if interlaced else b"\x00")
        + b"\x08"
        + bytes(blocks)
        + b"\x00"
    )


def make_gif_animated(
    width: int,
    height: int,
    seed: int = 0,
    n_frames: int = 2,
    interlaced: bool = False,
) -> bytes:
    """Valid animated GIF89a with the ``make_gif`` global color table
    (palette[i] = (i, (i+85)%256, (i+170)%256)). Frame 0 is
    full-screen with index = (x + 2*y + seed) % 256 and disposal 1
    (leave); each later frame k draws the sub-rectangle
    [k, width-k) x [k, height-k) with index =
    (x + 2*y + seed + 31*k) % 256 (absolute coordinates), disposal 1 —
    so the final composited canvas is the relationally-replayable
    CASE over nesting rectangles. Requires n_frames small enough that
    every rectangle is non-empty."""
    pal = np.arange(256, dtype=np.uint8)
    palette = np.stack([pal, pal + 85, pal + 170], axis=-1)
    out = bytearray(
        b"GIF89a"
        + struct.pack("<HH", width, height)
        + b"\xf7\x00\x00"  # GCT present, 256 entries
        + palette.tobytes()
    )
    # NETSCAPE2.0 looping application extension (public GIF89a
    # convention) — exercises the decoder's generic extension skip
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for k in range(n_frames):
        left = top = k
        w, h = width - 2 * k, height - 2 * k
        if w <= 0 or h <= 0:
            raise ValueError("n_frames too large for the frame size")
        y_idx, x_idx = np.mgrid[top:top + h, left:left + w]
        idx = ((x_idx + 2 * y_idx + seed + 31 * k) % 256).astype(
            np.uint8
        )
        out += _gif_frame_bytes(
            idx, left, top, disposal=1, interlaced=interlaced
        )
    out += b";"
    return bytes(out)


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
