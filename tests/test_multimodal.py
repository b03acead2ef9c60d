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
    # TIFF magic: no real decoder for it
    with pytest.raises(NotImplementedError):
        decode_image(b"II*\x00 tiff-ish")
    # corrupt JPEG-ish bytes now hit the REAL jpeg branch -> ValueError
    with pytest.raises((ValueError, struct.error)):
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

    # interlace METHOD 2 does not exist (0=none and 1=Adam7 are the
    # only published methods)
    bad = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", _struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 2))
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
    import struct as _struct

    from splink_spark.multimodal import decode_gif

    with pytest.raises(ValueError):
        decode_gif(b"not a gif")
    # an unexpected block type aborts the chunk walk
    p = bytearray(make_gif(4, 4))
    desc = 13 + 768  # header + LSD + 256-entry GCT
    assert p[desc] == 0x2C
    p[desc] = 0x7E
    with pytest.raises(ValueError):
        decode_gif(bytes(p))
    # a frame rectangle outside the logical screen is rejected
    p = bytearray(make_gif(4, 4))
    p[desc + 1:desc + 5] = _struct.pack("<HH", 3, 0)  # left=3, w=4
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


# ---------------------------------------------------------------------------
# baseline JPEG
# ---------------------------------------------------------------------------


def test_jpeg_dc_exact_roundtrip():
    """make_jpeg's DC-only grayscale synthesis decodes bit-exactly:
    all-ones quant + constant 8x8 blocks make the lossy codec
    reproducible (the property the driver oracle relies on)."""
    from splink_spark.multimodal import decode_jpeg, make_jpeg

    for w, h, s in [(1, 1, 0), (8, 8, 3), (17, 9, 7), (64, 48, 99),
                    (5, 40, 1), (29, 15, 1234)]:
        rgb = decode_jpeg(make_jpeg(w, h, seed=s))
        assert rgb.shape == (h, w, 3)
        y, x = np.mgrid[0:h, 0:w]
        g = (3 * (x // 8) + 2 * (y // 8) + s) % 256
        np.testing.assert_array_equal(
            rgb, np.repeat(g[:, :, None], 3, axis=2),
            err_msg=f"{w}x{h} seed={s}",
        )


def _jpeg_from_blocks(comps, blocks, qtables, width, height, dri=0):
    """Test-side encoder: build a baseline JPEG from QUANTIZED
    coefficient blocks (natural 8x8 order) so the decoder's AC/run
    -length/ZRL/restart paths can be driven precisely.

    comps: [(comp_id, h_samp, v_samp, tq)]; blocks: {comp_id:
    [8x8 int arrays in MCU-interleaved order]}; qtables: {tq: 64
    ints, natural order}."""
    import struct as _struct

    from splink_spark.multimodal import (
        _JPEG_AC_BITS, _JPEG_AC_VALS, _JPEG_DC_BITS, _JPEG_DC_VALS,
        _JPEG_ZIGZAG, _huffman_codes,
    )

    dc_codes = _huffman_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _huffman_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (height + 8 * vmax - 1) // (8 * vmax)

    bits: list[tuple[int, int]] = []

    def put(code, ln):
        bits.append((code, ln))

    def put_coef(v):
        s = abs(v).bit_length()
        return s, (v if v >= 0 else v + (1 << s) - 1) & ((1 << s) - 1)

    segments = []
    pred = {c[0]: 0 for c in comps}
    idx = {c[0]: 0 for c in comps}
    mcu = 0
    for _my in range(mcus_y):
        for _mx in range(mcus_x):
            if dri and mcu and mcu % dri == 0:
                segments.append(list(bits))
                bits.clear()
                pred = {c[0]: 0 for c in comps}
            for cid, hs, vs, _tq in comps:
                for _ in range(hs * vs):
                    blk = blocks[cid][idx[cid]]
                    idx[cid] += 1
                    zz = blk.reshape(64)[_JPEG_ZIGZAG]
                    diff = int(zz[0]) - pred[cid]
                    pred[cid] = int(zz[0])
                    s, v = put_coef(diff)
                    put(*dc_codes[s])
                    if s:
                        put(v, s)
                    # AC: explicit run-length walk (ZRL for 16+ zeros,
                    # EOB only when trailing zeros remain)
                    run = 0
                    for k in range(1, 64):
                        if zz[k] == 0:
                            run += 1
                            continue
                        while run > 15:
                            put(*ac_codes[0xF0])  # ZRL
                            run -= 16
                        s, v = put_coef(int(zz[k]))
                        put(*ac_codes[(run << 4) | s])
                        put(v, s)
                        run = 0
                    if run:
                        put(*ac_codes[0x00])  # EOB
            mcu += 1
    segments.append(list(bits))

    def pack(bit_list):
        acc = n = 0
        raw = bytearray()
        for v, ln in bit_list:
            acc = (acc << ln) | v
            n += ln
            while n >= 8:
                raw.append((acc >> (n - 8)) & 0xFF)
                n -= 8
        if n:
            raw.append(((acc << (8 - n)) | ((1 << (8 - n)) - 1)) & 0xFF)
        stuffed = bytearray()
        for b in raw:
            stuffed.append(b)
            if b == 0xFF:
                stuffed.append(0x00)
        return bytes(stuffed)

    def seg(marker, body):
        return bytes([0xFF, marker]) + _struct.pack(
            ">H", len(body) + 2
        ) + body

    out = b"\xff\xd8"
    for tq, tbl in qtables.items():
        zz = np.asarray(tbl).reshape(64)[_JPEG_ZIGZAG]
        out += seg(0xDB, bytes([tq]) + bytes(int(v) for v in zz))
    sof = _struct.pack(">BHHB", 8, height, width, len(comps))
    for cid, hs, vs, tq in comps:
        sof += bytes([cid, (hs << 4) | vs, tq])
    out += seg(0xC0, sof)
    out += seg(
        0xC4,
        bytes([0x00]) + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
        + bytes([0x10]) + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS),
    )
    if dri:
        out += seg(0xDD, _struct.pack(">H", dri))
    sos = bytes([len(comps)])
    for cid, *_ in comps:
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    for i, s_bits in enumerate(segments):
        out += pack(s_bits)
        if i < len(segments) - 1:
            out += bytes([0xFF, 0xD0 + (i % 8)])
    return out + b"\xff\xd9"


def _reference_idct(coeff):
    """Independent direct-formula IDCT (T.81 A.3.3 double loop) — a
    DIFFERENT implementation than the decoder's matrix product."""
    out = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            acc = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    acc += (
                        cu * cv * coeff[u, v]
                        * np.cos((2 * x + 1) * v * np.pi / 16)
                        * np.cos((2 * y + 1) * u * np.pi / 16)
                    )
            out[y, x] = acc / 4.0
    return out


def test_jpeg_ac_coefficients_vs_reference_idct():
    """Nonzero AC coefficients (plus a 16-zero gap exercising ZRL)
    decode to the independent direct-formula IDCT within 1 LSB."""
    from splink_spark.multimodal import decode_jpeg

    rng = np.random.default_rng(7)
    q = np.ones(64, dtype=int)
    blk = np.zeros((8, 8), dtype=int)
    blk[0, 0] = 37
    blk[0, 1] = -14
    blk[1, 0] = 9
    blk[2, 3] = 5
    blk[7, 7] = -3  # forces a long zero run -> ZRL path
    blocks = {1: [blk]}
    payload = _jpeg_from_blocks(
        [(1, 1, 1, 0)], blocks, {0: q}, width=8, height=8
    )
    got = decode_jpeg(payload)[:, :, 0].astype(float)
    want = np.clip(np.round(_reference_idct(blk.astype(float)) + 128), 0, 255)
    assert np.abs(got - want).max() <= 1
    # and a random dense block
    blk2 = rng.integers(-40, 40, size=(8, 8))
    payload = _jpeg_from_blocks(
        [(1, 1, 1, 0)], {1: [blk2]}, {0: q}, width=8, height=8
    )
    got = decode_jpeg(payload)[:, :, 0].astype(float)
    want = np.clip(
        np.round(_reference_idct(blk2.astype(float)) + 128), 0, 255
    )
    assert np.abs(got - want).max() <= 1


def test_jpeg_quant_table_applied():
    """A non-trivial quantization table must scale coefficients."""
    from splink_spark.multimodal import decode_jpeg

    q = np.full(64, 4, dtype=int)
    blk = np.zeros((8, 8), dtype=int)
    blk[0, 0] = 64  # dequantized DC = 256 -> flat value 32 + 128
    payload = _jpeg_from_blocks(
        [(1, 1, 1, 0)], {1: [blk]}, {0: q}, width=8, height=8
    )
    got = decode_jpeg(payload)
    assert (got == 160).all()


def test_jpeg_color_420_and_422():
    """3-component decode with chroma subsampling: constant DC-only
    planes -> exact JFIF YCbCr->RGB values after upsampling."""
    from splink_spark.multimodal import decode_jpeg

    def const_block(val):
        b = np.zeros((8, 8), dtype=int)
        b[0, 0] = 8 * (val - 128)
        return b

    yv, cbv, crv = 120, 90, 170
    for (hs, vs), n_luma in [((2, 2), 4), ((2, 1), 2)]:
        comps = [(1, hs, vs, 0), (2, 1, 1, 0), (3, 1, 1, 0)]
        blocks = {
            1: [const_block(yv)] * n_luma,
            2: [const_block(cbv)],
            3: [const_block(crv)],
        }
        payload = _jpeg_from_blocks(
            comps, blocks, {0: np.ones(64, dtype=int)},
            width=8 * hs, height=8 * vs,
        )
        got = decode_jpeg(payload)
        r = np.clip(round(yv + 1.402 * (crv - 128)), 0, 255)
        g = np.clip(
            round(yv - 0.344136 * (cbv - 128) - 0.714136 * (crv - 128)),
            0, 255,
        )
        b = np.clip(round(yv + 1.772 * (cbv - 128)), 0, 255)
        assert got.shape == (8 * vs, 8 * hs, 3)
        assert np.abs(got.astype(int) - np.array([r, g, b])).max() <= 1


def test_jpeg_restart_intervals_reset_dc():
    """DRI=1: every MCU is its own entropy segment; DC predictors
    reset at each RST marker."""
    from splink_spark.multimodal import decode_jpeg

    def const_block(val):
        b = np.zeros((8, 8), dtype=int)
        b[0, 0] = 8 * (val - 128)
        return b

    vals = [10, 200, 60, 145]
    blocks = {1: [const_block(v) for v in vals]}
    payload = _jpeg_from_blocks(
        [(1, 1, 1, 0)], blocks, {0: np.ones(64, dtype=int)},
        width=32, height=8, dri=1,
    )
    got = decode_jpeg(payload)
    for i, v in enumerate(vals):
        assert (got[:, 8 * i:8 * (i + 1), :] == v).all(), (i, v)


def test_jpeg_rejects_arithmetic_and_garbage():
    from splink_spark.multimodal import decode_jpeg, make_jpeg

    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    # flip SOF0 -> SOF9 (arithmetic-coded) in a valid stream
    p = bytearray(make_jpeg(16, 16, seed=1))
    i = bytes(p).index(b"\xff\xc0")
    p[i + 1] = 0xC9
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(bytes(p))
    # SOF2 with a sequential full-band scan is malformed progressive
    p = bytearray(make_jpeg(16, 16, seed=1))
    p[i + 1] = 0xC2
    with pytest.raises(ValueError, match="spectral band"):
        decode_jpeg(bytes(p))


def test_decode_image_jpeg_branch():
    from splink_spark.multimodal import decode_image, make_jpeg

    f = decode_image(make_jpeg(24, 16, seed=5), fake=False)
    assert f.shape and f.dtype == np.float32
    assert float(f[0]) == 24.0 and float(f[1]) == 16.0


# ---------------------------------------------------------------------------
# Adam7 interlaced PNG (spec §8.2)
# ---------------------------------------------------------------------------


def test_png_interlaced_matches_noninterlaced():
    """An Adam7 stream decodes to the SAME pixels as the progressive
    stream of the same formula — every pass geometry (incl. empty
    passes on 1-wide / 1-tall images) and all five filter types."""
    from splink_spark.multimodal import decode_png, make_png_interlaced

    for w, h in [(1, 1), (7, 5), (8, 8), (17, 13), (33, 2), (2, 33)]:
        for fm in ("none", "mixed"):
            a = decode_png(make_png(w, h, seed=9, filter_mode=fm))
            b = decode_png(
                make_png_interlaced(w, h, seed=9, filter_mode=fm)
            )
            assert a.shape == b.shape == (h, w, 3)
            assert (a == b).all(), (w, h, fm)


def test_png_interlaced_truncated_stream_rejected():
    from splink_spark.multimodal import decode_png, make_png_interlaced

    p = bytearray(make_png_interlaced(16, 16, seed=2))
    # re-compress a truncated raw stream so zlib inflates cleanly but
    # the pass walk runs short
    i = bytes(p).index(b"IDAT") - 4
    (ln,) = struct.unpack(">I", p[i:i + 4])
    raw = zlib.decompress(bytes(p[i + 8:i + 8 + ln]))
    short = zlib.compress(raw[:-10], 6)
    rebuilt = (
        bytes(p[:i])
        + struct.pack(">I", len(short))
        + b"IDAT"
        + short
        + struct.pack(
            ">I", zlib.crc32(b"IDAT" + short) & 0xFFFFFFFF
        )
        + bytes(p[i + 12 + ln:])
    )
    with pytest.raises(ValueError, match="IDAT length"):
        decode_png(rebuilt)


# ---------------------------------------------------------------------------
# animated GIF (GIF89a animation model: GCE, disposal, transparency,
# interlacing)
# ---------------------------------------------------------------------------


def _gif_palette():
    pal = np.arange(256, dtype=np.uint8)
    return np.stack([pal, pal + 85, pal + 170], axis=-1)


def test_gif_animated_composites_nested_rects():
    from splink_spark.multimodal import decode_gif_frames, make_gif_animated

    w, h, seed = 19, 11, 4
    frames = decode_gif_frames(make_gif_animated(w, h, seed, n_frames=3))
    assert frames.shape == (3, h, w, 3)
    palette = _gif_palette()
    y, x = np.mgrid[0:h, 0:w]
    exp = palette[(x + 2 * y + seed) % 256].copy()
    assert (frames[0] == exp).all()
    for k in (1, 2):
        m = (x >= k) & (x < w - k) & (y >= k) & (y < h - k)
        exp[m] = palette[(x + 2 * y + seed + 31 * k) % 256][m]
    assert (frames[-1] == exp).all()


def test_gif_animated_interlaced_same_canvases():
    from splink_spark.multimodal import decode_gif_frames, make_gif_animated

    a = decode_gif_frames(make_gif_animated(19, 11, 4, n_frames=3))
    b = decode_gif_frames(
        make_gif_animated(19, 11, 4, n_frames=3, interlaced=True)
    )
    assert (a == b).all()


def test_gif_disposal_background_and_transparency():
    """Disposal 2 restores the frame rect to the background color
    before the next frame; a fully-transparent frame draws nothing."""
    from splink_spark.multimodal import _gif_frame_bytes, decode_gif_frames

    palette = _gif_palette()
    hdr = (
        b"GIF89a" + struct.pack("<HH", 8, 6) + b"\xf7\x05\x00"
        + palette.tobytes()
    )  # bg index 5
    y, x = np.mgrid[0:6, 0:8]
    f0 = ((x + y) % 256).astype(np.uint8)
    f1 = np.full((2, 3), 7, np.uint8)
    payload = (
        hdr
        + _gif_frame_bytes(f0, 0, 0, disposal=2)
        + _gif_frame_bytes(f1, 2, 1, disposal=0, transparent=7)
        + b";"
    )
    fr = decode_gif_frames(payload)
    assert (fr[0] == palette[f0]).all()
    exp1 = np.broadcast_to(palette[5], (6, 8, 3)).copy()
    assert (fr[1] == exp1).all()


def test_gif_disposal_restore_previous():
    from splink_spark.multimodal import _gif_frame_bytes, decode_gif_frames

    palette = _gif_palette()
    hdr = (
        b"GIF89a" + struct.pack("<HH", 8, 6) + b"\xf7\x05\x00"
        + palette.tobytes()
    )
    y, x = np.mgrid[0:6, 0:8]
    f0 = ((x + y) % 256).astype(np.uint8)
    payload = (
        hdr
        + _gif_frame_bytes(f0, 0, 0, disposal=1)
        + _gif_frame_bytes(
            np.full((2, 3), 7, np.uint8), 2, 1, disposal=3
        )
        + _gif_frame_bytes(np.full((1, 1), 9, np.uint8), 0, 0)
        + b";"
    )
    fr = decode_gif_frames(payload)
    exp1 = palette[f0].copy()
    exp1[1:3, 2:5] = palette[7]
    assert (fr[1] == exp1).all()
    # frame 2 draws on the RESTORED canvas — frame 1 is gone
    exp2 = palette[f0].copy()
    exp2[0, 0] = palette[9]
    assert (fr[2] == exp2).all()


def test_decode_gif_frames_max_frames_short_circuits():
    from splink_spark.multimodal import decode_gif_frames, make_gif_animated

    p = make_gif_animated(12, 10, 1, n_frames=4)
    assert decode_gif_frames(p, max_frames=2).shape[0] == 2
    assert decode_gif_frames(p).shape[0] == 4


def test_decode_image_animated_gif_branch():
    """decode_image features an animated payload from the FIRST
    composited canvas — identical to the single-frame formula."""
    from splink_spark.multimodal import make_gif_animated

    f_anim = decode_image(make_gif_animated(24, 16, seed=5, n_frames=3))
    f_single = decode_image(make_gif(24, 16, seed=5))
    assert (f_anim == f_single).all()


# ---------------------------------------------------------------------------
# progressive JPEG (T.81 Annex G: spectral selection + successive
# approximation)
# ---------------------------------------------------------------------------


def test_jpeg_progressive_dc_exact_matches_sequential():
    """The DC-exact synthesis decodes bit-identically through the
    six-scan progressive script and the single-scan baseline."""
    from splink_spark.multimodal import (
        decode_jpeg,
        make_jpeg,
        make_jpeg_progressive,
    )

    for w, h, seed in [(8, 8, 0), (24, 16, 5), (17, 9, 3), (1, 1, 7)]:
        a = decode_jpeg(make_jpeg(w, h, seed))
        b = decode_jpeg(make_jpeg_progressive(w, h, seed))
        assert a.shape == b.shape == (h, w, 3)
        assert (a == b).all(), (w, h, seed)


def test_jpeg_progressive_random_coeffs_match_baseline():
    """Random quantized coefficient blocks encoded progressively
    (EOBRUN, ZRL, newly-significant + correction bits) decode to the
    SAME pixels as the independently-verified baseline encoding of
    the same coefficients."""
    from splink_spark.multimodal import (
        _jpeg_progressive_from_coeffs,
        decode_jpeg,
    )

    rng = np.random.default_rng(42)
    q = np.ones(64, dtype=np.int64)
    for trial in range(4):
        bx, by = int(rng.integers(1, 5)), int(rng.integers(1, 5))
        w = max(1, bx * 8 - int(rng.integers(0, 8)))
        h = max(1, by * 8 - int(rng.integers(0, 8)))
        blocks = np.zeros((by, bx, 8, 8), dtype=np.int64)
        mask = rng.random((by, bx, 8, 8)) < 0.25
        blocks[mask] = rng.integers(-60, 61, size=int(mask.sum()))
        blocks[:, :, 0, 0] = rng.integers(-200, 200, size=(by, bx))
        flat = [blocks[j, i] for j in range(by) for i in range(bx)]
        a = decode_jpeg(
            _jpeg_from_blocks(
                [(1, 1, 1, 0)], {1: flat}, {0: q}, width=w, height=h
            )
        )
        b = decode_jpeg(
            _jpeg_progressive_from_coeffs(w, h, blocks, q)
        )
        assert (a == b).all(), f"trial {trial} ({w}x{h})"


def test_jpeg_progressive_multilevel_and_quant():
    """Two successive-approximation levels (Al=2 -> 1 -> 0), dense
    blocks (no EOB in first scans), and a non-trivial quantization
    table all reconcile with the baseline path."""
    from splink_spark.multimodal import (
        _jpeg_progressive_from_coeffs,
        decode_jpeg,
    )

    rng = np.random.default_rng(9)
    script = [
        (0, 0, 0, 2), (1, 63, 0, 2), (0, 0, 2, 1),
        (1, 63, 2, 1), (0, 0, 1, 0), (1, 63, 1, 0),
    ]
    blocks = rng.integers(-15, 16, size=(2, 2, 8, 8)).astype(np.int64)
    blocks[blocks == 0] = 1  # dense: every coefficient nonzero
    flat = [blocks[j, i] for j in range(2) for i in range(2)]
    for q in (
        np.ones(64, dtype=np.int64),
        rng.integers(1, 9, size=64).astype(np.int64),
    ):
        a = decode_jpeg(
            _jpeg_from_blocks(
                [(1, 1, 1, 0)], {1: flat}, {0: q}, width=16, height=16
            )
        )
        b = decode_jpeg(
            _jpeg_progressive_from_coeffs(
                16, 16, blocks, q, scan_script=script
            )
        )
        assert (a == b).all()


def test_decode_image_progressive_jpeg_branch():
    from splink_spark.multimodal import (
        decode_image,
        make_jpeg,
        make_jpeg_progressive,
    )

    f_prog = decode_image(make_jpeg_progressive(24, 16, seed=5))
    f_base = decode_image(make_jpeg(24, 16, seed=5))
    assert (f_prog == f_base).all()
