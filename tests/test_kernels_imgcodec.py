"""Pure-NumPy image codecs: encode/decode round trips + IMREAD_COLOR
semantics (gray→3ch, alpha drop, BGR order)."""

import struct
import zlib

import numpy as np
import pytest

from paddleocr_spark.kernels.imgcodec import (
    decode_bmp,
    decode_image,
    decode_png,
    decode_ppm,
    encode_png,
    sniff_format,
)
from paddleocr_spark.sources.media_files import decode_image_bytes

RNG = np.random.default_rng(11)


def test_png_roundtrip_rgb():
    img = RNG.integers(0, 256, (23, 31, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_png_roundtrip_gray_and_rgba():
    g = RNG.integers(0, 256, (9, 14), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(g))[:, :, 0], g)
    rgba = RNG.integers(0, 256, (7, 5, 4), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(rgba)), rgba)


def test_png_all_filter_types():
    """Hand-build a PNG using every filter type; compare against a
    straight filter-0 encoding of the same pixels."""
    img = RNG.integers(0, 256, (5, 8, 3), dtype=np.uint8)
    h, w, c = img.shape
    stride = w * c

    rows = []
    prev = np.zeros(stride, dtype=np.uint8)
    flat = img.reshape(h, stride).astype(np.int32)
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        cur = flat[y]
        if ftype == 0:
            enc = cur
        elif ftype == 1:
            left = np.concatenate([np.zeros(c, np.int32), cur[:-c]])
            enc = cur - left
        elif ftype == 2:
            enc = cur - prev
        elif ftype == 3:
            left = np.concatenate([np.zeros(c, np.int32), cur[:-c]])
            enc = cur - ((left + prev) >> 1)
        else:  # paeth
            left = np.concatenate([np.zeros(c, np.int32), cur[:-c]])
            upleft = np.concatenate([np.zeros(c, np.int32), prev[:-c]])
            p = left + prev - upleft
            pa, pb, pc = (np.abs(p - left), np.abs(p - prev),
                          np.abs(p - upleft))
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, upleft))
            enc = cur - pred
        rows.append(bytes([ftype]) + (enc & 0xFF).astype(np.uint8).tobytes())
        prev = cur

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    data = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"".join(rows)))
            + chunk(b"IEND", b""))
    assert np.array_equal(decode_png(data), img)


def _encode_bmp24(img_bgr: np.ndarray, top_down: bool = False) -> bytes:
    h, w, _ = img_bgr.shape
    row_size = (w * 3 + 3) & ~3
    pixel_data = bytearray()
    rows = range(h) if top_down else range(h - 1, -1, -1)
    for y in rows:
        row = img_bgr[y].tobytes()
        pixel_data += row + b"\x00" * (row_size - len(row))
    off = 14 + 40
    header = (b"BM" + struct.pack("<IHHI", off + len(pixel_data), 0, 0, off)
              + struct.pack("<IiiHHIIiiII", 40, w,
                            -h if top_down else h, 1, 24, 0,
                            len(pixel_data), 2835, 2835, 0, 0))
    return bytes(header) + bytes(pixel_data)


@pytest.mark.parametrize("top_down", [False, True])
def test_bmp_roundtrip(top_down):
    img = RNG.integers(0, 256, (6, 7, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(_encode_bmp24(img, top_down)), img)


def test_ppm_p6_and_p5():
    img = RNG.integers(0, 256, (4, 5, 3), dtype=np.uint8)
    data = b"P6\n# comment\n5 4\n255\n" + img.tobytes()
    assert np.array_equal(decode_ppm(data), img)
    g = RNG.integers(0, 256, (3, 4), dtype=np.uint8)
    data5 = b"P5 4 3 255\n" + g.tobytes()
    assert np.array_equal(decode_ppm(data5)[:, :, 0], g)


def test_decode_image_imread_color_semantics():
    rgb = RNG.integers(0, 256, (5, 6, 3), dtype=np.uint8)
    bgr = decode_image(encode_png(rgb))
    assert np.array_equal(bgr, rgb[:, :, ::-1])  # RGB → BGR
    rgba = np.dstack([rgb, np.full((5, 6), 7, np.uint8)])
    assert np.array_equal(decode_image(encode_png(rgba)), rgb[:, :, ::-1])
    gray = RNG.integers(0, 256, (5, 6), dtype=np.uint8)
    out = decode_image(encode_png(gray))
    assert out.shape == (5, 6, 3)
    assert np.array_equal(out[:, :, 0], gray)


def test_sniff_and_source_dispatch():
    img = RNG.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    assert sniff_format(encode_png(img)) == "png"
    assert sniff_format(_encode_bmp24(img)) == "bmp"
    assert sniff_format(b"P6 1 1 255\n\x00\x00\x00") == "ppm"
    assert sniff_format(b"\xff\xd8\xff") is None  # JPEG unsupported
    out = decode_image_bytes(_encode_bmp24(img))
    assert np.array_equal(out, img)
    with pytest.raises(ValueError):
        decode_image_bytes(b"\xff\xd8\xffJPEG")
