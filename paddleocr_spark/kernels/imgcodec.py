"""Pure-NumPy/stdlib image codecs — a real ``img_decode``
(``toddleocr/engine.py:214-216``: cv2.imdecode(..., IMREAD_COLOR) →
BGR uint8 HxWx3) without cv2:

- PNG: chunk parse, zlib IDAT inflate, scanline unfilter (None/Sub/Up/
  Average/Paeth), bit depth 8, color types gray / RGB / gray+alpha /
  RGBA, non-interlaced. Encoder included (filter 0) for round-trips.
- BMP: BITMAPINFOHEADER, 24/32-bit uncompressed, bottom-up or top-down.
- PPM/PGM: binary P6/P5, maxval 255.

IMREAD_COLOR semantics are reproduced: gray expands to 3 channels,
alpha is dropped, channel order is BGR.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["decode_png", "encode_png", "decode_bmp", "decode_ppm",
           "decode_image", "sniff_format"]

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------------------
# PNG

def _paeth(a, b, c):
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (H, W, C) uint8, C per color type (1/2/3/4)."""
    if not data.startswith(_PNG_MAGIC):
        raise ValueError("not a PNG")
    pos = len(_PNG_MAGIC)
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = \
                struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if bit_depth != 8:
        raise ValueError(f"unsupported PNG bit depth {bit_depth}")
    if interlace:
        raise ValueError("interlaced PNG unsupported")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {color_type}")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8,
                             count=stride, offset=off + 1).copy()
        if ftype == 0:
            cur = line
        elif ftype == 1:  # Sub — sequential in pixel units
            cur = line
            for i in range(channels, stride):
                cur[i] = (int(cur[i]) + int(cur[i - channels])) & 0xFF
        elif ftype == 2:  # Up
            cur = (line.astype(np.int32) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            cur = line
            for i in range(stride):
                left = int(cur[i - channels]) if i >= channels else 0
                cur[i] = (int(cur[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line
            for i in range(stride):
                a = int(cur[i - channels]) if i >= channels else 0
                c = int(prev[i - channels]) if i >= channels else 0
                b = int(prev[i])
                cur[i] = (int(cur[i]) + int(_paeth(
                    np.uint8(a), np.uint8(b), np.uint8(c)))) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {ftype}")
        out[y] = cur
        prev = out[y]
    return out.reshape(height, width, channels)


def encode_png(img: np.ndarray) -> bytes:
    """(H, W[, C]) uint8 → PNG bytes (filter 0 rows). For tests and
    fixture generation."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    return (_PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


# ---------------------------------------------------------------------------
# BMP

def decode_bmp(data: bytes) -> np.ndarray:
    """24/32-bit uncompressed BMP → (H, W, 3) uint8 BGR (BMP's native
    channel order is already BGR)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (pixel_off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER unsupported")
    width, height = struct.unpack("<ii", data[18:26])
    (bpp,) = struct.unpack("<H", data[28:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP bpp={bpp} compression={compression}")
    flip = height > 0
    height = abs(height)
    nch = bpp // 8
    row_size = (width * nch + 3) & ~3
    out = np.empty((height, width, 3), dtype=np.uint8)
    for y in range(height):
        off = pixel_off + y * row_size
        row = np.frombuffer(data, dtype=np.uint8, count=width * nch,
                            offset=off).reshape(width, nch)
        out[height - 1 - y if flip else y] = row[:, :3]
    return out


# ---------------------------------------------------------------------------
# PPM / PGM

def decode_ppm(data: bytes) -> np.ndarray:
    """Binary P6 (RGB) / P5 (gray), maxval ≤ 255."""
    if data[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM")
    gray = data[:2] == b"P5"
    fields: list[int] = []
    pos = 2
    while len(fields) < 3:
        while pos < len(data) and data[pos:pos + 1].isspace():
            pos += 1
        if data[pos:pos + 1] == b"#":
            while data[pos:pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    ch = 1 if gray else 3
    arr = np.frombuffer(data, dtype=np.uint8, count=w * h * ch, offset=pos)
    return arr.reshape(h, w, ch)


# ---------------------------------------------------------------------------
# dispatch (img_decode / IMREAD_COLOR semantics)

def sniff_format(data: bytes) -> str | None:
    if data.startswith(_PNG_MAGIC):
        return "png"
    if data[:2] == b"BM":
        return "bmp"
    if data[:2] in (b"P5", b"P6"):
        return "ppm"
    return None


def decode_image(data: bytes) -> np.ndarray:
    """bytes → (H, W, 3) uint8 BGR, matching cv2.imdecode with
    IMREAD_COLOR: gray expands to 3 channels, alpha is dropped."""
    fmt = sniff_format(data)
    if fmt == "png":
        img = decode_png(data)  # gray/GA/RGB/RGBA
        c = img.shape[2]
        if c == 2:  # gray+alpha → gray
            img = img[:, :, :1]
        if img.shape[2] == 1:
            return np.repeat(img, 3, axis=2)  # gray → BGR
        return img[:, :, [2, 1, 0]]  # RGB(A) → BGR, alpha dropped
    if fmt == "bmp":
        return decode_bmp(data)  # already BGR
    if fmt == "ppm":
        img = decode_ppm(data)
        if img.shape[2] == 1:
            return np.repeat(img, 3, axis=2)
        return img[:, :, [2, 1, 0]]  # RGB → BGR
    raise ValueError("unsupported image format (PNG/BMP/PPM supported; "
                     "JPEG/GIF need external codecs absent from this "
                     "environment)")
