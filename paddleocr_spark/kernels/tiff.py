"""Pure-NumPy multi-page TIFF codec (uncompressed, baseline).

The reference explodes multi-page containers into per-page images
(``check_and_read``, ``toddleocr/utils/utility.py:92-123``: PDF pages
via fitz, GIF frames). No PDF renderer ships in this environment, so
the repo's REAL multi-page format is baseline TIFF 6.0 — the one
multi-page raster container that needs no entropy codec:

- header ``II*\\0`` / ``MM\\0*`` (both byte orders), IFD chain (one
  IFD per page, next-IFD offset links them — the "page explode" is a
  genuine pointer walk, not a fake framing header)
- tags: ImageWidth/Length, BitsPerSample (8), Compression (1 = none,
  5 = LZW with the spec's early code-width change, 8 = Deflate/zlib
  per strip, 32773 = PackBits RLE), Predictor (1 = none,
  2 = horizontal differencing, undone by a per-channel row cumsum),
  PhotometricInterpretation (0/1 gray — 0 inverts — and 2 RGB),
  StripOffsets/StripByteCounts/RowsPerStrip, SamplesPerPixel
- out of scope (explicit errors): JPEG-in-TIFF compression, tiles,
  planar config 2, >8-bit samples

``encode_tiff`` writes the same subset (one strip per page, little
endian; optional Deflate + predictor 2) for test fixtures and for
`sources.media_files`' page re-emission.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_tiff", "encode_tiff", "is_tiff"]

_TYPE_SIZE = {1: 1, 3: 2, 4: 4}  # BYTE, SHORT, LONG


def is_tiff(data: bytes) -> bool:
    return data[:4] in (b"II*\x00", b"MM\x00*")


def _read_values(data: bytes, bo: str, vtype: int, count: int,
                 raw: bytes) -> list[int]:
    size = _TYPE_SIZE.get(vtype)
    if size is None:
        raise ValueError(f"unsupported TIFF field type {vtype}")
    total = size * count
    if total <= 4:
        buf = raw[:total]
    else:
        (off,) = struct.unpack(bo + "I", raw)
        buf = data[off:off + total]
    fmt = {1: "B", 3: "H", 4: "I"}[vtype]
    return list(struct.unpack(bo + fmt * count, buf))


def _lzw_decode(src: bytes) -> bytes:
    """TIFF 6.0 §13 LZW decode: MSB-first variable-width codes
    9→12 bits with the spec's mandated EARLY code-width change (the
    width grows when table entry 510/1022/2046 is added, one code
    earlier than generic LZW — the same off-by-one the PDF
    /EarlyChange parameter defaults to). Clear = 256, EOI = 257."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    bitpos, total = 0, len(src) * 8
    nbits = 9
    table: list[bytes] = []
    prev = b""
    while bitpos + nbits <= total:
        byte = bitpos >> 3
        chunk = int.from_bytes(src[byte:byte + 3].ljust(3, b"\0"),
                               "big")
        code = (chunk >> (24 - (bitpos & 7) - nbits)) \
            & ((1 << nbits) - 1)
        bitpos += nbits
        if code == EOI:
            return bytes(out)
        if code == CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            nbits = 9
            prev = b""
            continue
        if not table:
            raise ValueError("LZW stream must start with a clear code")
        if prev:
            if code < len(table):
                entry = table[code]
            elif code == len(table):  # KwKwK case
                entry = prev + prev[:1]
            else:
                raise ValueError("LZW code beyond table")
            table.append(prev + entry[:1])
        else:
            entry = table[code]
        out += entry
        prev = entry
        # the decoder's table lags the encoder's by one entry (the
        # KwKwK compensation), so its width switch fires one entry
        # earlier than the encoder's (1<<nbits)-1 rule
        if len(table) == (1 << nbits) - 2 and nbits < 12:
            nbits += 1  # early change
    raise ValueError("LZW stream missing EOI code")


def _lzw_encode(data: bytes) -> bytes:
    """Writer twin of ``_lzw_decode`` (same early-change rule); emits
    a Clear code whenever the table approaches the 12-bit limit."""
    CLEAR, EOI = 256, 257
    bits = bytearray()
    acc, nacc = 0, 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nacc
        acc = (acc << width) | code
        nacc += width
        while nacc >= 8:
            nacc -= 8
            bits.append((acc >> nacc) & 0xFF)

    strings = {bytes([i]): i for i in range(256)}
    next_code, nbits = 258, 9
    put(CLEAR, nbits)
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in strings:
            w = wc
            continue
        put(strings[w], nbits)
        strings[wc] = next_code
        next_code += 1
        if next_code == (1 << nbits) - 1 and nbits < 12:
            nbits += 1  # early change, mirroring the decoder
        elif next_code == 4094:  # table nearly full: reset
            put(CLEAR, nbits)
            strings = {bytes([i]): i for i in range(256)}
            next_code, nbits = 258, 9
        w = bytes([b])
    if w:
        put(strings[w], nbits)
    put(EOI, nbits)
    if nacc:
        bits.append((acc << (8 - nacc)) & 0xFF)
    return bytes(bits)


def _unpackbits(src: bytes) -> bytes:
    """PackBits RLE decode (TIFF 6.0 §9): n in 0..127 copies n+1
    literals, n in 129..255 repeats the next byte 257-n times, 128
    is a no-op."""
    out = bytearray()
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        i += 1
        if c < 128:
            out += src[i:i + c + 1]
            if i + c + 1 > n:
                raise ValueError("truncated PackBits literal run")
            i += c + 1
        elif c > 128:
            if i >= n:
                raise ValueError("truncated PackBits repeat run")
            out += src[i:i + 1] * (257 - c)
            i += 1
        # 128: no-op
    return bytes(out)


def _packbits_row(row: bytes) -> bytes:
    """PackBits RLE encode one row: repeat runs of >= 3 become
    two-byte repeats, everything else greedy literals of <= 128
    (writer twin for the decoder branch)."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        run = 1
        while i + run < n and run < 128 and row[i + run] == row[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, row[i]])
            i += run
            continue
        # literal: advance until a >= 3 repeat starts or 128 bytes
        j = i + 1
        while (j < n and j - i < 128
               and not (j + 2 < n
                        and row[j] == row[j + 1] == row[j + 2])):
            j += 1
        out += bytes([j - i - 1]) + row[i:j]
        i = j
    return bytes(out)


def decode_tiff(data: bytes) -> list[np.ndarray]:
    """TIFF bytes → list of (H, W, C) uint8 pages (C = 1 or 3),
    walking the IFD chain — one page per IFD."""
    if not is_tiff(data):
        raise ValueError("not a TIFF")
    bo = "<" if data[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack(bo + "I", data[4:8])
    pages = []
    seen = set()
    while ifd_off:
        if ifd_off in seen:  # corrupt circular chain
            raise ValueError("circular TIFF IFD chain")
        seen.add(ifd_off)
        (n_entries,) = struct.unpack(bo + "H", data[ifd_off:ifd_off + 2])
        tags = {}
        for e in range(n_entries):
            p = ifd_off + 2 + 12 * e
            tag, vtype, count = struct.unpack(bo + "HHI", data[p:p + 8])
            if vtype not in _TYPE_SIZE:
                # RATIONAL/ASCII/etc metadata (XResolution, DateTime,
                # Software...) is standard in real scanner output —
                # skip tags the decoder never consults instead of
                # failing the whole file on them
                continue
            tags[tag] = _read_values(data, bo, vtype, count,
                                     data[p + 8:p + 12])
        (ifd_off,) = struct.unpack(
            bo + "I", data[ifd_off + 2 + 12 * n_entries:
                           ifd_off + 6 + 12 * n_entries])

        w, h = tags[256][0], tags[257][0]
        comp = tags.get(259, [1])[0]
        if comp not in (1, 5, 8, 32773):
            raise ValueError(
                f"unsupported TIFF compression {comp} "
                "(uncompressed, LZW, Deflate, or PackBits only)")
        photo = tags.get(262, [1])[0]
        spp = tags.get(277, [1])[0]
        bps = tags.get(258, [8] * spp)
        if any(b != 8 for b in bps):
            raise ValueError("only 8-bit TIFF samples supported")
        if photo not in (0, 1, 2) or spp not in (1, 3):
            raise ValueError("only gray/RGB TIFF supported")
        if (photo == 2) != (spp == 3):
            # RGB data with a missing/skipped SamplesPerPixel tag
            # (defaulted 1) would reshape interleaved RGB bytes as a
            # gray plane — silent scrambled pixels; likewise a gray
            # photometric with spp=3. Cross-check instead of trusting
            # the default.
            raise ValueError(
                f"inconsistent TIFF photometric {photo} with "
                f"{spp} samples/pixel")
        if tags.get(284, [1])[0] != 1:
            # planar (RRR..GGG..BBB) data reshaped as interleaved
            # would be silently scrambled — the explicit error the
            # module contract promises
            raise ValueError("planar-configuration TIFF unsupported")
        offsets = tags[273]
        counts = tags[279]
        if comp == 8:  # Deflate (AdobeDeflate): zlib per strip
            import zlib

            raw = b"".join(zlib.decompress(data[o:o + c])
                           for o, c in zip(offsets, counts))
        elif comp == 5:  # LZW per strip
            raw = b"".join(_lzw_decode(data[o:o + c])
                           for o, c in zip(offsets, counts))
        elif comp == 32773:  # PackBits RLE per strip
            raw = b"".join(_unpackbits(data[o:o + c])
                           for o, c in zip(offsets, counts))
        else:
            raw = b"".join(data[o:o + c] for o, c in zip(offsets,
                                                         counts))
        img = np.frombuffer(raw[:h * w * spp], dtype=np.uint8) \
            .reshape(h, w, spp).copy()
        pred = tags.get(317, [1])[0]
        if pred == 2:
            # horizontal differencing: per-channel cumsum along the
            # row undoes it (same transform the PDF /Predictor 2
            # path uses) — without this, predictor-coded rows
            # reshape as raw pixels, silently scrambled
            img = img.astype(np.uint32).cumsum(
                axis=1, dtype=np.uint32).astype(np.uint8)
        elif pred != 1:
            raise ValueError(f"unsupported TIFF predictor {pred}")
        if photo == 0:  # WhiteIsZero
            img = 255 - img
        pages.append(img)
    if not pages:
        raise ValueError("TIFF with no IFD")
    return pages


def encode_tiff(pages: list[np.ndarray], compression: int = 1,
                predictor: int = 1) -> bytes:
    """List of (H, W) or (H, W, C) uint8 arrays → multi-page
    little-endian TIFF (one strip per page). ``compression`` 1 =
    none, 5 = LZW, 8 = Deflate, 32773 = PackBits (rows encoded
    separately per the spec); ``predictor`` 1 = none, 2 = horizontal
    differencing (LZW/Deflate) — writer twin for the decoder
    branches."""
    if compression not in (1, 5, 8, 32773) or predictor not in (1, 2):
        raise ValueError((compression, predictor))
    if compression == 32773 and predictor != 1:
        raise ValueError("PackBits with predictor unsupported")
    out = bytearray(b"II*\x00")
    out += struct.pack("<I", 0)  # first-IFD offset patched below
    ifd_ptr_pos = 4
    for img in pages:
        a = np.asarray(img, dtype=np.uint8)
        if a.ndim == 2:
            a = a[:, :, None]
        h, w, spp = a.shape
        if predictor == 2:
            d = a.astype(np.int16)
            d[:, 1:, :] -= a[:, :-1, :].astype(np.int16)
            a = (d & 0xFF).astype(np.uint8)
        strip = a.tobytes()
        if compression == 8:
            import zlib

            strip = zlib.compress(strip)
        elif compression == 5:
            strip = _lzw_encode(strip)
        elif compression == 32773:
            row_bytes = w * spp
            strip = b"".join(
                _packbits_row(strip[r * row_bytes:(r + 1) * row_bytes])
                for r in range(h))
        strip_off = len(out)
        out += strip
        extra_off = None
        if spp == 3:  # BitsPerSample needs 3 shorts -> out-of-line
            if len(out) % 2:
                # TIFF 6.0: out-of-line VALUES must begin on a word
                # boundary too, not just the IFD — an odd strip length
                # would otherwise leave BitsPerSample at an odd offset
                out += b"\x00"
            extra_off = len(out)
            out += struct.pack("<HHH", 8, 8, 8)
        if len(out) % 2:
            out += b"\x00"  # IFDs must be word-aligned
        ifd_off = len(out)
        entries = [
            (256, 4, 1, w),
            (257, 4, 1, h),
            (258, 3, spp, 8 if spp == 1 else extra_off),
            (259, 3, 1, compression),
            (262, 3, 1, 1 if spp == 1 else 2),
            (273, 4, 1, strip_off),
            (277, 3, 1, spp),
            (278, 4, 1, h),
            (279, 4, 1, len(strip)),
        ]
        if predictor == 2:
            entries.append((317, 3, 1, 2))
        out += struct.pack("<H", len(entries))
        for tag, vtype, count, value in entries:
            out += struct.pack("<HHI", tag, vtype, count)
            if vtype == 3 and count == 1:
                out += struct.pack("<HH", value, 0)
            else:
                out += struct.pack("<I", value)
        next_ptr_pos = len(out)
        out += struct.pack("<I", 0)
        # link the previous IFD (or the header) to this one
        out[ifd_ptr_pos:ifd_ptr_pos + 4] = struct.pack("<I", ifd_off)
        ifd_ptr_pos = next_ptr_pos
    return bytes(out)
