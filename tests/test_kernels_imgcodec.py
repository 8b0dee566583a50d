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
    assert sniff_format(b"\xff\xd8\xff") == "jpeg"  # kernels/jpeg.py
    assert sniff_format(b"II*\x00") == "tiff"       # kernels/tiff.py
    out = decode_image_bytes(_encode_bmp24(img))
    assert np.array_equal(out, img)
    with pytest.raises(ValueError):  # truncated JPEG still errors
        decode_image_bytes(b"\xff\xd8\xffJPEG")
    with pytest.raises(ValueError):  # unknown magic
        decode_image_bytes(b"not an image")


# --- GIF (utility.py:93-104 check_and_read first-frame semantics) ----

def _lzw_compress(indices, mcs):
    """Independent, spec-faithful GIF LZW COMPRESSOR (forward string
    table, growing code width) — cross-checks the decoder's dictionary
    reconstruction, width growth, and KwKwK handling, which the
    library's minimal clear-per-code encoder never exercises."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    code_size = mcs + 1
    out = bytearray()
    acc = bits = 0

    def emit(code):
        nonlocal acc, bits
        acc |= code << bits
        bits += code_size
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    emit(clear)
    w = b""
    for k in bytes(indices):
        wk = w + bytes([k])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        table[wk] = next_code
        next_code += 1
        # decoder adds its twin entry one code LATER (no add on the
        # first code after clear), so the encoder bumps width after
        # assigning value 1<<cs — then both switch at the same stream
        # position
        if next_code - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        w = bytes([k])
    if w:
        emit(table[w])
    emit(end)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _wrap_gif(w, h, palette, lzw, mcs, interlace=False):
    n_bits = max(1, (len(palette) - 1).bit_length())
    table = np.zeros((1 << n_bits, 3), np.uint8)
    table[:len(palette)] = palette
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | (n_bits - 1), 0, 0]) + table.tobytes()
    out += bytes([0x2C]) + (0).to_bytes(2, "little") * 2
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x40 if interlace else 0x00, mcs])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    return bytes(out + b"\x00\x3B")


def test_gif_roundtrip_simple_encoder():
    from paddleocr_spark.kernels.imgcodec import (
        decode_gif,
        decode_image,
        encode_gif,
        sniff_format,
    )

    rng = np.random.default_rng(7)
    img = (rng.integers(0, 4, (13, 9, 1)) * 80).astype(np.uint8) \
        .repeat(3, axis=2)
    img[:, :, 1] //= 2
    gif = encode_gif(img)
    assert sniff_format(gif) == "gif"
    out = decode_gif(gif)
    assert out.shape == (13, 9, 3)
    assert (out == img[:, :, ::-1]).all()      # palette RGB → BGR
    assert (decode_image(gif) == out).all()    # dispatch wired


def test_gif_growing_lzw_and_interlace():
    from paddleocr_spark.kernels.imgcodec import decode_gif

    rng = np.random.default_rng(11)
    w, h = 31, 17
    palette = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0],
                        [0, 0, 255]], np.uint8)
    idx = rng.integers(0, 4, h * w).astype(np.uint8)
    # repeated runs force dictionary growth past several width bumps
    idx[: h * w // 2] = np.tile(np.array([0, 1, 2, 3, 3, 2, 1, 0],
                                         np.uint8),
                                (h * w // 2) // 8 + 1)[: h * w // 2]
    lzw = _lzw_compress(idx, mcs=2)
    out = decode_gif(_wrap_gif(w, h, palette, lzw, 2))
    want = palette[idx.reshape(h, w)][:, :, ::-1]
    assert (out == want).all()
    # interlaced variant: rows stored in 8/8/4/2 pass order
    order = [r for r in range(0, h, 8)] + [r for r in range(4, h, 8)] \
        + [r for r in range(2, h, 4)] + [r for r in range(1, h, 2)]
    woven = idx.reshape(h, w)[order].reshape(-1)
    out_i = decode_gif(_wrap_gif(w, h, palette,
                                 _lzw_compress(woven, 2), 2,
                                 interlace=True))
    assert (out_i == want).all()


def test_gif_transparency_keeps_background():
    from paddleocr_spark.kernels.imgcodec import decode_gif

    palette = np.array([[10, 20, 30], [200, 0, 0]], np.uint8)
    idx = np.array([0, 1, 1, 0], np.uint8)  # 2x2
    lzw = _lzw_compress(idx, mcs=2)
    # GCE marking index 1 transparent; background = palette[0]
    gce = bytes([0x21, 0xF9, 4, 0x01, 0, 0, 1, 0])
    raw = _wrap_gif(2, 2, palette, lzw, 2)
    n_bits = max(1, (len(palette) - 1).bit_length())
    tbl_end = 13 + 3 * (1 << n_bits)  # header+LSD+global color table
    gif = raw[:tbl_end] + gce + raw[tbl_end:]
    out = decode_gif(gif)
    assert (out == np.array([30, 20, 10], np.uint8)).all()  # bg BGR


def test_gif_malformed():
    from paddleocr_spark.kernels.imgcodec import decode_gif

    with pytest.raises(ValueError):
        decode_gif(b"GIF89a" + b"\x00" * 7)  # no blocks
    with pytest.raises(ValueError):
        decode_gif(b"NOTGIF")


def test_gif_descriptor_exceeding_screen_raises():
    """A malformed descriptor larger than the logical screen must
    raise the module's ValueError, not a numpy IndexError."""
    import struct

    import numpy as np
    import pytest

    from paddleocr_spark.kernels.imgcodec import decode_gif, encode_gif

    img = np.zeros((2, 2, 3), dtype=np.uint8)
    data = bytearray(encode_gif(img))
    # shrink the LOGICAL SCREEN below the (intact) 2x2 descriptor —
    # the pixel data is all present, so only the bounds guard can
    # catch the overflow
    data[6:8] = struct.pack("<H", 1)
    with pytest.raises(ValueError, match="logical screen"):
        decode_gif(bytes(data))


def test_gif_background_uses_global_table():
    """A frame covering only part of the screen exposes background
    pixels — they must come from the GLOBAL color table (GIF89a §18),
    also through a local-table frame."""
    import struct

    import numpy as np

    from paddleocr_spark.kernels.imgcodec import decode_gif, encode_gif

    blue = np.full((2, 2, 3), (0, 0, 255), dtype=np.uint8)  # RGB blue
    data = bytearray(encode_gif(blue))
    # widen the logical screen so a background strip exists
    assert data[:6] in (b"GIF89a", b"GIF87a")
    sw = struct.unpack("<H", data[6:8])[0]
    data[6:8] = struct.pack("<H", sw + 2)
    out = decode_gif(bytes(data))  # BGR
    assert out.shape == (2, 4, 3)
    # covered area is blue; the background strip is the global table's
    # bg_idx entry (the same palette here) — crucially NOT garbage
    assert (out[:, :2] == (255, 0, 0)).all()
    assert (out[:, 2:] == out[0, 3]).all()


def test_adam7_interlaced_roundtrip():
    """Adam7 (PNG spec §8.2): seven independently-filtered passes
    scatter back onto their grids; edge sizes leave some passes
    empty."""
    rng = np.random.default_rng(71)
    for shape in [(16, 16, 3), (7, 5, 3), (1, 1, 3), (9, 13),
                  (8, 8, 4), (3, 17, 3), (5, 1, 3)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        data = encode_png(img, interlace=True)
        # 8 magic + 4 len + 4 type + 12 body bytes = interlace flag
        assert data[28] == 1
        dec = decode_png(data)
        ref = img if img.ndim == 3 else img[:, :, None]
        assert np.array_equal(dec, ref), shape


def test_adam7_per_pass_filters():
    """Hand-build an interlaced stream whose passes use different row
    filters (0/2/1) — each pass's filtering must reset independently
    (prev row starts at zero per pass)."""
    import struct
    import zlib

    from paddleocr_spark.kernels.imgcodec import _ADAM7, _PNG_MAGIC

    rng = np.random.default_rng(72)
    img = rng.integers(0, 256, (10, 10, 3), dtype=np.uint8)
    parts = []
    for pi, (x0, y0, dx, dy) in enumerate(_ADAM7):
        sub = img[y0::dy, x0::dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        ftype = (0, 2, 1)[pi % 3]
        prev = np.zeros(sub.shape[1] * 3, dtype=np.int32)
        for y in range(sub.shape[0]):
            row = sub[y].reshape(-1).astype(np.int32)
            if ftype == 2:  # Up
                enc = (row - prev) & 0xFF
            elif ftype == 1:  # Sub (bpp=3)
                enc = row.copy()
                enc[3:] = (row[3:] - row[:-3]) & 0xFF
            else:
                enc = row
            parts.append(bytes([ftype]) + bytes(enc.astype(np.uint8)))
            prev = row
    raw = b"".join(parts)

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I",
                              zlib.crc32(ctype + body) & 0xFFFFFFFF))

    data = (_PNG_MAGIC
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 10, 10, 8, 2,
                                         0, 0, 1))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))
    assert np.array_equal(decode_png(data), img)


class TestPalettePNG:
    """Indexed-color PNG (type 3, spec §4.1.2): PLTE lookup at depths
    1/2/4/8, sequential and Adam7, IMREAD_COLOR tRNS-drop."""

    def _pal(self, n):
        rng = np.random.default_rng(5)
        return rng.integers(0, 256, (n, 3), dtype=np.uint8)

    def test_roundtrip_8bit(self):
        from paddleocr_spark.kernels.imgcodec import (
            decode_png,
            encode_png,
        )
        pal = self._pal(256)
        rng = np.random.default_rng(1)
        idx = rng.integers(0, 256, (13, 17), dtype=np.uint8)
        out = decode_png(encode_png(idx, palette=pal))
        assert (out == pal[idx]).all()

    @pytest.mark.parametrize("depth", [1, 2, 4])
    def test_roundtrip_subbyte_depths(self, depth):
        from paddleocr_spark.kernels.imgcodec import (
            decode_png,
            encode_png,
        )
        n = 1 << depth
        pal = self._pal(n)
        rng = np.random.default_rng(depth)
        # odd width exercises the partial final byte per row
        idx = rng.integers(0, n, (9, 11), dtype=np.uint8)
        out = decode_png(encode_png(idx, palette=pal, bit_depth=depth))
        assert (out == pal[idx]).all()

    def test_adam7_palette(self):
        from paddleocr_spark.kernels.imgcodec import (
            decode_png,
            encode_png,
        )
        pal = self._pal(16)
        rng = np.random.default_rng(9)
        idx = rng.integers(0, 16, (10, 14), dtype=np.uint8)
        out = decode_png(encode_png(idx, palette=pal, bit_depth=4,
                                    interlace=True))
        assert (out == pal[idx]).all()

    def test_decode_image_bgr_semantics(self):
        from paddleocr_spark.kernels.imgcodec import (
            decode_image,
            encode_png,
        )
        pal = np.array([[255, 0, 0], [0, 0, 255]], np.uint8)  # RGB
        idx = np.array([[0, 1]], np.uint8)
        bgr = decode_image(encode_png(idx, palette=pal, bit_depth=1))
        assert tuple(bgr[0, 0]) == (0, 0, 255)  # red in BGR
        assert tuple(bgr[0, 1]) == (255, 0, 0)  # blue in BGR

    def test_missing_plte_raises(self):
        from paddleocr_spark.kernels.imgcodec import (
            decode_png,
            encode_png,
        )
        data = encode_png(np.zeros((2, 2), np.uint8),
                          palette=self._pal(4), bit_depth=2)
        # strip the PLTE chunk
        import re as _re
        broken = _re.sub(rb".{4}PLTE.{12}..", b"", data, count=1,
                         flags=_re.DOTALL)
        with pytest.raises(ValueError, match="PLTE"):
            decode_png(broken)

    def test_out_of_range_index_raises(self):
        from paddleocr_spark.kernels.imgcodec import (
            decode_png,
            encode_png,
        )
        data = encode_png(np.full((2, 2), 5, np.uint8),
                          palette=self._pal(4))  # idx 5, 4-entry PLTE
        with pytest.raises(ValueError, match="index out of range"):
            decode_png(data)


class TestPaletteBMP:
    """1/4/8-bit palette BMPs via the BGRA color table."""

    def _bmp(self, idx, pal_bgr, bpp):
        h, w = idx.shape
        n = len(pal_bgr)
        row_size = ((w * bpp + 31) // 32) * 4
        rows = bytearray()
        for y in range(h - 1, -1, -1):  # bottom-up
            if bpp == 8:
                rb = bytes(idx[y].tolist())
            else:
                bits = []
                for v in idx[y]:
                    bits += [(int(v) >> k) & 1
                             for k in range(bpp - 1, -1, -1)]
                bits += [0] * (-len(bits) % 8)
                rb = np.packbits(np.array(bits, np.uint8)).tobytes()
            rows += rb + b"\x00" * (row_size - len(rb))
        pal = b"".join(bytes([b, g, r, 0]) for b, g, r in pal_bgr)
        pixel_off = 14 + 40 + len(pal)
        hdr = (b"BM" + struct.pack("<IHHI", pixel_off + len(rows),
                                   0, 0, pixel_off)
               + struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, 0,
                             len(rows), 0, 0, n, 0))
        return hdr + pal + bytes(rows)

    @pytest.mark.parametrize("bpp", [1, 4, 8])
    def test_roundtrip(self, bpp):
        rng = np.random.default_rng(bpp)
        n = 1 << bpp
        pal = [tuple(int(x) for x in rng.integers(0, 256, 3))
               for _ in range(n)]
        idx = rng.integers(0, n, (7, 11), dtype=np.uint8)
        img = decode_bmp(self._bmp(idx, pal, bpp))
        exp = np.array(pal, np.uint8)[idx]
        assert (img == exp).all()

    def test_out_of_range_index_raises(self):
        idx = np.full((2, 2), 3, np.uint8)
        with pytest.raises(ValueError, match="palette index"):
            decode_bmp(self._bmp(idx, [(0, 0, 0)], 8))


class TestPNG16:
    """16-bit PNGs reduce to 8 bits via the high byte (IMREAD_COLOR)."""

    def _png16(self, arr16, color_type):
        ch = {0: 1, 2: 3}[color_type]
        h, w = arr16.shape[:2]
        raw = b"".join(
            b"\x00" + arr16[y].astype(">u2").tobytes() for y in range(h))

        def chunk(ctype, body):
            return (struct.pack(">I", len(body)) + ctype + body
                    + struct.pack(">I",
                                  zlib.crc32(ctype + body) & 0xFFFFFFFF))

        ihdr = struct.pack(">IIBBBBB", w, h, 16, color_type, 0, 0, 0)
        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(raw))
                + chunk(b"IEND", b""))

    def test_gray16_high_byte(self):
        a = np.array([[0x1234, 0xFFEE], [0x0001, 0xAB00]], np.uint16)
        out = decode_png(self._png16(a[:, :, None].reshape(2, 2),
                                     color_type=0))
        assert out.shape == (2, 2, 1)
        assert out[0, 0, 0] == 0x12 and out[0, 1, 0] == 0xFF
        assert out[1, 0, 0] == 0x00 and out[1, 1, 0] == 0xAB

    def test_rgb16(self):
        rng = np.random.default_rng(3)
        a = rng.integers(0, 65536, (5, 4, 3), dtype=np.uint16)
        out = decode_png(self._png16(a, color_type=2))
        assert (out == (a >> 8).astype(np.uint8)).all()
