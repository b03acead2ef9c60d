"""Multimodal: real container header parsers + uncompressed-BMP decode
(splink_spark/multimodal.py). The synth->parse loop is exercised both
in pure Python and through the Spark Arrow plumbing."""

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from splink_spark.multimodal import (
    attach_metadata,
    decode_bmp,
    decode_image,
    extract_features,
    make_bmp,
    make_gif,
    make_png,
    make_wav,
    media_metadata_stats,
    parse_media_metadata,
)


def test_bmp_roundtrip_known_pixels():
    """Hand-assembled 2x2 24-bit BMP decodes to the exact RGB values."""
    # rows bottom-up, BGR, stride padded to 8 bytes
    top = [(255, 0, 0), (0, 255, 0)]
    bottom = [(0, 0, 255), (255, 255, 255)]
    def row(pixels):
        raw = b"".join(bytes((b, g, r)) for (r, g, b) in pixels)
        return raw + b"\x00" * (8 - len(raw))
    img = row(bottom) + row(top)
    header = b"BM" + struct.pack("<IHHI", 54 + len(img), 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(img), 0, 0, 0, 0
    )
    rgb = decode_bmp(header + dib + img)
    assert rgb.shape == (2, 2, 3)
    assert rgb[0, 0].tolist() == [255, 0, 0]
    assert rgb[0, 1].tolist() == [0, 255, 0]
    assert rgb[1, 0].tolist() == [0, 0, 255]
    assert rgb[1, 1].tolist() == [255, 255, 255]


def test_make_bmp_parses_and_decodes():
    payload = make_bmp(7, 5, seed=3)
    meta = parse_media_metadata(payload)
    assert (meta["width"], meta["height"], meta["codec"]) == (7, 5, "bmp")
    rgb = decode_bmp(payload)
    assert rgb.shape == (5, 7, 3)
    # deterministic pixel law: base = (x + 2y + seed) % 256 lands in the
    # file's first channel byte (blue, after BGR -> RGB conversion)
    assert rgb[0, 0, 2] == 3 and rgb[2, 4, 2] == (4 + 4 + 3)
    feats = decode_image(payload)  # REAL path, no fake flag
    assert feats.shape == (16,) and feats[0] == 7.0 and feats[1] == 5.0


def test_make_png_header_and_scanlines():
    payload = make_png(9, 4, seed=1)
    meta = parse_media_metadata(payload)
    assert (meta["width"], meta["height"], meta["codec"]) == (9, 4, "png")
    # IDAT decompresses to h * (1 filter byte + 3w) bytes
    assert payload[:8] == b"\x89PNG\r\n\x1a\n"
    idat_start = payload.index(b"IDAT") + 4
    (idat_len,) = struct.unpack(">I", payload[idat_start - 8 : idat_start - 4])
    raw = zlib.decompress(payload[idat_start : idat_start + idat_len])
    assert len(raw) == 4 * (1 + 3 * 9)
    # CRC of the IHDR chunk is genuine
    ihdr_data = payload[12:29]  # type + 13 data bytes
    (crc,) = struct.unpack(">I", payload[29:33])
    assert crc == (zlib.crc32(ihdr_data) & 0xFFFFFFFF)


def test_make_wav_duration():
    payload = make_wav(n_samples=4000, sample_rate=8000)
    meta = parse_media_metadata(payload)
    assert meta["codec"] == "pcm_s16le"
    assert meta["duration_s"] == pytest.approx(0.5)
    assert meta["width"] is None


def test_gif_and_garbage():
    meta = parse_media_metadata(make_gif(320, 200))
    assert (meta["width"], meta["height"], meta["codec"]) == (
        320, 200, "gif",
    )
    for junk in (None, b"", b"BM", b"garbage bytes here", b"RIFFxxxxWAVE"):
        m = parse_media_metadata(junk)
        assert m == {
            "width": None, "height": None,
            "duration_s": None, "codec": None,
        }


def test_decode_image_unsupported_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0 jpeg-ish")
    # fake path still deterministic
    a = decode_image(b"\xff\xd8\xff\xe0 jpeg-ish", fake=True)
    b = decode_image(b"\xff\xd8\xff\xe0 jpeg-ish", fake=True)
    np.testing.assert_array_equal(a, b)


def test_attach_metadata_spark(spark):
    rows = [
        (0, "image", make_bmp(11, 6)),
        (1, "image", make_png(5, 8)),
        (2, "audio", make_wav(8000)),
        (3, "image", make_gif(64, 32)),
        (4, "image", b"not media"),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )
    out = {
        r["media_id"]: r
        for r in attach_metadata(media)
        .select("media_id", "meta.*")
        .collect()
    }
    assert (out[0]["width"], out[0]["height"]) == (11, 6)
    assert (out[1]["width"], out[1]["codec"]) == (5, "png")
    assert out[2]["duration_s"] == pytest.approx(1.0)
    assert out[3]["codec"] == "gif"
    assert out[4]["codec"] is None

    stats = media_metadata_stats(
        attach_metadata(media)
    ).collect()
    assert {r["kind"] for r in stats} == {"image", "audio"}


def test_extract_features_real_bmp_spark(spark):
    rows = [(i, make_bmp(4 + i, 3 + i, seed=i)) for i in range(6)]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    feats = extract_features(media, fake=False).collect()
    by_id = {r["media_id"]: r["feature"] for r in feats}
    assert len(by_id) == 6
    for i in range(6):
        # width/height features carry the real decoded dimensions
        assert by_id[i][0] == pytest.approx(4.0 + i)
        assert by_id[i][1] == pytest.approx(3.0 + i)


def test_decode_png_all_filters_roundtrip():
    """Every PNG filter type (None/Sub/Up/Average/Paeth) unfilters
    back to the exact synthesized pixels."""
    from splink_spark.multimodal import decode_png

    for w, h in [(1, 1), (2, 7), (23, 13), (40, 3)]:
        for mode in ("none", "mixed"):
            rgb = decode_png(make_png(w, h, seed=9, filter_mode=mode))
            y, x = np.mgrid[0:h, 0:w]
            base = (3 * x + y + 9) % 256
            want = np.stack(
                [base, (base + 60) % 256, (base + 120) % 256], axis=-1
            )
            np.testing.assert_array_equal(rgb, want, err_msg=f"{w}x{h} {mode}")


def test_decode_png_rejects_unsupported():
    from splink_spark.multimodal import decode_png

    with pytest.raises(ValueError):
        decode_png(b"not a png")
    # 16-bit depth header
    import struct as _struct
    import zlib as _zlib

    def chunk(typ, data):
        return (
            _struct.pack(">I", len(data)) + typ + data
            + _struct.pack(">I", _zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    # interlaced (Adam7) stays unsupported
    bad = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", _struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png(bad)
    # 16-bit palette is an illegal depth/color combination
    bad = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", _struct.pack(">IIBBBBB", 2, 2, 16, 3, 0, 0, 0))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png(bad)
    # palette stream without a PLTE chunk
    from splink_spark.multimodal import make_png_palette

    p = bytearray(make_png_palette(3, 3, seed=1, depth=8))
    # excise the PLTE chunk (12 bytes framing + 768 data)
    i = bytes(p).index(b"PLTE") - 4
    (ln,) = _struct.unpack(">I", p[i:i + 4])
    del p[i:i + 12 + ln]
    with pytest.raises(ValueError):
        decode_png(bytes(p))


def test_decode_png_palette_roundtrip():
    """Palette PNGs at every legal bit depth (1/2/4/8), with both
    filter modes, decode through PLTE lookup + MSB-first sub-byte
    unpacking to the exact synthesized RGB."""
    from splink_spark.multimodal import decode_png, make_png_palette

    for depth in (1, 2, 4, 8):
        n = 1 << depth
        for w, h in [(1, 1), (21, 11), (40, 3)]:
            for mode in ("none", "mixed"):
                rgb = decode_png(
                    make_png_palette(
                        w, h, seed=5, depth=depth, filter_mode=mode
                    )
                )
                y, x = np.mgrid[0:h, 0:w]
                idx = (x + y + 5) % n
                want = np.stack(
                    [
                        (7 * idx + 5) % 256,
                        (13 * idx + 5) % 256,
                        (29 * idx + 5) % 256,
                    ],
                    axis=-1,
                )
                np.testing.assert_array_equal(
                    rgb, want, err_msg=f"d{depth} {w}x{h} {mode}"
                )


def test_decode_png_16bit_roundtrip():
    """16-bit RGB PNGs downshift (high byte of the big-endian sample)
    to exactly the 8-bit formula; mixed filters use bpp=6 offsets."""
    from splink_spark.multimodal import decode_png, make_png16

    for w, h in [(1, 1), (17, 9), (23, 13)]:
        for mode in ("none", "mixed"):
            rgb = decode_png(make_png16(w, h, seed=11, filter_mode=mode))
            y, x = np.mgrid[0:h, 0:w]
            base = (3 * x + y + 11) % 256
            want = np.stack(
                [base, (base + 60) % 256, (base + 120) % 256], axis=-1
            )
            np.testing.assert_array_equal(
                rgb, want, err_msg=f"{w}x{h} {mode}"
            )


def test_decode_png_subbyte_grayscale():
    """Gray color type 0 at depth 4: bit unpack + spec sample rescale
    v*(255/(2^d-1)), replicated to RGB."""
    import struct as _struct
    import zlib as _zlib

    from splink_spark.multimodal import (
        _filter_scanlines,
        _png_chunk,
        decode_png,
    )

    w, h = 10, 4
    ihdr = _struct.pack(">IIBBBBB", w, h, 4, 0, 0, 0, 0)
    y, x = np.mgrid[0:h, 0:w]
    g = ((x + 2 * y) % 16).astype(np.uint8)
    weights = np.array([8, 4, 2, 1], dtype=np.uint8)
    bits = ((g[:, :, None] & weights) > 0).astype(np.uint8)
    bits = bits.reshape(h, w * 4)
    bits = np.pad(bits, ((0, 0), (0, (-bits.shape[1]) % 8)))
    packed = np.packbits(bits, axis=1)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(
            b"IDAT", _zlib.compress(_filter_scanlines(packed, 1, "mixed"))
        )
        + _png_chunk(b"IEND", b"")
    )
    want = np.repeat(
        (g * (255 // 15)).astype(np.uint8)[:, :, None], 3, axis=2
    )
    np.testing.assert_array_equal(decode_png(png), want)


def test_extract_features_real_png_spark(spark):
    """fake=False end-to-end over PNG payloads with mixed filters —
    the decoder runs inside mapInPandas and the width/height features
    carry the real decoded dimensions."""
    rows = [
        (i, make_png(4 + i, 3 + i, seed=i, filter_mode="mixed"))
        for i in range(6)
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    by_id = {
        r["media_id"]: r["feature"]
        for r in extract_features(media, fake=False).collect()
    }
    assert len(by_id) == 6
    for i in range(6):
        assert by_id[i][0] == pytest.approx(4.0 + i)
        assert by_id[i][1] == pytest.approx(3.0 + i)


# ---------------------------------------------------------------------------
# GIF LZW codec (from-scratch, multimodal.py::decode_gif/_lzw_*)
# ---------------------------------------------------------------------------

def test_gif_roundtrip_known_pixels():
    from splink_spark.multimodal import decode_gif

    for w, h, seed in [(1, 1, 0), (5, 3, 7), (32, 17, 123), (50, 40, 9)]:
        rgb = decode_gif(make_gif(w, h, seed=seed))
        assert rgb.shape == (h, w, 3)
        y, x = np.mgrid[0:h, 0:w]
        idx = (x + 2 * y + seed) % 256
        exp = np.stack(
            [idx, (idx + 85) % 256, (idx + 170) % 256], axis=-1
        ).astype(np.uint8)
        np.testing.assert_array_equal(rgb, exp)


def test_gif_lzw_table_overflow_roundtrip():
    """128x128 random indices grow the LZW table past 4096 entries,
    exercising the frozen-table (deferred-clear) path in both codecs."""
    from splink_spark.multimodal import _lzw_decode, _lzw_encode

    rng = np.random.default_rng(0)
    noise = rng.integers(0, 256, 128 * 128, dtype=np.uint8)
    dec = _lzw_decode(_lzw_encode(noise), 8, len(noise))
    np.testing.assert_array_equal(dec, noise)


def test_decode_gif_independent_vector():
    """Externally-produced 43-byte 1x1 white GIF (the classic tracking
    pixel, min code size 2, graphic-control extension present) — an
    independent witness that the decoder matches the published spec,
    not just our own encoder."""
    from splink_spark.multimodal import decode_gif

    b = (
        b"GIF89a\x01\x00\x01\x00\x80\x00\x00\xff\xff\xff\x00\x00\x00"
        b"!\xf9\x04\x01\x00\x00\x00\x00"
        b",\x00\x00\x00\x00\x01\x00\x01\x00\x00\x02\x02D\x01\x00;"
    )
    rgb = decode_gif(b)
    assert rgb.shape == (1, 1, 3)
    assert rgb[0, 0].tolist() == [255, 255, 255]


def test_decode_gif_rejects_bad_inputs():
    from splink_spark.multimodal import decode_gif

    with pytest.raises(ValueError):
        decode_gif(b"not a gif")
    # interlace flag set on the image descriptor
    p = bytearray(make_gif(4, 4))
    desc = 13 + 768  # header + LSD + 256-entry GCT
    assert p[desc] == 0x2C
    p[desc + 9] |= 0x40
    with pytest.raises(ValueError):
        decode_gif(bytes(p))


def test_decode_image_gif_branch():
    feats = decode_image(make_gif(9, 4, seed=2))
    assert feats[0] == 9.0 and feats[1] == 4.0
    # corrupt LZW stream + fake=False raises, fake=True falls back
    p = bytearray(make_gif(9, 4, seed=2))
    p[-10] ^= 0xFF
    try:
        decode_image(bytes(p))
        raised = False
    except ValueError:
        raised = True
    assert raised
    f = decode_image(bytes(p), fake=True)
    assert len(f) == 16
