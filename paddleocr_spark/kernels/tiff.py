"""Pure-NumPy multi-page TIFF codec (uncompressed, baseline).

The reference explodes multi-page containers into per-page images
(``check_and_read``, ``toddleocr/utils/utility.py:92-123``: PDF pages
via fitz, GIF frames). No PDF renderer ships in this environment, so
the repo's REAL multi-page format is baseline TIFF 6.0 — the one
multi-page raster container that needs no entropy codec:

- header ``II*\\0`` / ``MM\\0*`` (both byte orders), IFD chain (one
  IFD per page, next-IFD offset links them — the "page explode" is a
  genuine pointer walk, not a fake framing header)
- tags: ImageWidth/Length, BitsPerSample (8; 1 for G4), Compression
  (1 = none, 4 = CCITT Group 4 / T.6 via kernels/fax.py (bilevel
  WhiteIsZero strips, FillOrder 1/2),
  5 = LZW with the spec's early code-width change, 6 = old-style JPEG
  via JPEGInterchangeFormat, 7 = new-style JPEG per segment with the
  shared JPEGTables tag merged in, 8 = Deflate/zlib per strip,
  32773 = PackBits RLE), Predictor (1 = none, 2 = horizontal
  differencing, undone by a per-channel row cumsum),
  PhotometricInterpretation (0/1 gray — 0 inverts — 2 RGB, 6 YCbCr
  for the JPEG compressions), StripOffsets/StripByteCounts/
  RowsPerStrip OR TileWidth/TileLength/TileOffsets/TileByteCounts
  (TIFF 6.0 §15 tile grid, edge tiles cropped), SamplesPerPixel
- out of scope (explicit errors): planar config 2, >8-bit samples

``encode_tiff`` writes the same subset (little endian; strips by
default or a tile grid via ``tile=(tw, th)``; optional Deflate/LZW
predictor 2; JPEG segments abbreviated against a shared JPEGTables
tag) for test fixtures and for `sources.media_files`' page
re-emission. The JPEG entropy layer is ``kernels/jpeg.py``; the
reference reads all of these through cv2's TIFF loader
(``toddleocr/engine.py:214-216``).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_tiff", "encode_tiff", "is_tiff"]

_TYPE_SIZE = {1: 1, 3: 2, 4: 4, 7: 1}  # BYTE, SHORT, LONG, UNDEFINED


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
    fmt = {1: "B", 3: "H", 4: "I", 7: "B"}[vtype]
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
    if out:
        # some real-world writers omit the EOI at strip end; libtiff
        # warns and tolerates, so accept once at least one code
        # decoded (an empty stream is still an error)
        return bytes(out)
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
        if comp not in (1, 4, 5, 6, 7, 8, 32773):
            raise ValueError(
                f"unsupported TIFF compression {comp} "
                "(uncompressed, CCITT G4, LZW, JPEG, Deflate, or "
                "PackBits only)")
        photo = tags.get(262, [1])[0]
        spp = tags.get(277, [1])[0]
        bps = tags.get(258, ([1] if comp == 4 else [8]) * spp)
        if comp == 4:
            # T.6 fax: bilevel, WhiteIsZero (the standard fax shape)
            if spp != 1 or any(b != 1 for b in bps) or photo != 0:
                raise ValueError(
                    "G4 TIFF must be 1-bit single-sample WhiteIsZero")
        elif any(b != 8 for b in bps):
            raise ValueError("only 8-bit TIFF samples supported")
        if photo not in (0, 1, 2, 6) or spp not in (1, 3):
            raise ValueError("only gray/RGB/YCbCr TIFF supported")
        if photo == 6 and comp not in (6, 7):
            raise ValueError("YCbCr photometric only with JPEG "
                             "compression")
        if (photo in (2, 6)) != (spp == 3):
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
        pred = tags.get(317, [1])[0]
        if pred not in (1, 2):
            raise ValueError(f"unsupported TIFF predictor {pred}")
        jpegtables = bytes(tags[347]) if 347 in tags else None

        def _seg_bytes(o: int, c: int) -> bytes:
            seg = data[o:o + c]
            if comp == 8:  # Deflate (AdobeDeflate): zlib per segment
                import zlib

                return zlib.decompress(seg)
            if comp == 5:  # LZW per segment
                return _lzw_decode(seg)
            if comp == 32773:  # PackBits RLE per segment
                return _unpackbits(seg)
            return seg

        def _jpeg_pixels(seg: bytes) -> np.ndarray:
            # TIFF TechNote 2: each segment is a JPEG stream; an
            # abbreviated one (tables elsewhere) gets the shared
            # JPEGTables body spliced in after its SOI
            from paddleocr_spark.kernels.jpeg import decode_jpeg

            if jpegtables is not None and len(jpegtables) > 4:
                seg = b"\xff\xd8" + jpegtables[2:-2] + seg[2:]
            img = decode_jpeg(seg)  # BGR (gray replicated to 3ch)
            if spp == 1:
                return img[:, :, :1]
            return img[:, :, ::-1]  # page convention is RGB

        def _undo_pred(a: np.ndarray) -> np.ndarray:
            if pred == 2:
                # horizontal differencing: per-channel cumsum along
                # the row undoes it (same transform the PDF
                # /Predictor 2 path uses) — without this,
                # predictor-coded rows reshape as raw pixels,
                # silently scrambled. Rows never span segments, so
                # per-segment application is exact.
                return a.astype(np.uint32).cumsum(
                    axis=1, dtype=np.uint32).astype(np.uint8)
            return a

        if comp == 4:
            from paddleocr_spark.kernels.fax import g4_decode

            rps = tags.get(278, [h])[0]
            fill_order = tags.get(266, [1])[0]
            parts = []
            remaining = h
            for o, c in zip(tags[273], tags[279]):
                seg = data[o:o + c]
                if fill_order == 2:  # LSB-first bytes: reverse bits
                    arr = np.unpackbits(
                        np.frombuffer(seg, np.uint8).reshape(-1, 1),
                        axis=1)[:, ::-1]
                    seg = np.packbits(arr).tobytes()
                r = min(rps, remaining)
                parts.append(g4_decode(seg, w, r))
                remaining -= r
            mask = np.concatenate(parts, axis=0) if parts else                 np.zeros((0, w), bool)
            # black -> 255 here; the WhiteIsZero inversion below
            # flips to the canonical black=0 / white=255
            img = (mask[:h] * np.uint8(255))[:, :, None]
        elif comp == 6:
            # old-style JPEG (deprecated TIFF 6.0 §22): one full
            # interchange stream at JPEGInterchangeFormat
            if 513 not in tags:
                raise ValueError("old-style JPEG TIFF without "
                                 "JPEGInterchangeFormat")
            off = tags[513][0]
            ln = tags[514][0] if 514 in tags else len(data) - off
            img = _jpeg_pixels(data[off:off + ln])[:h, :w]
        elif 322 in tags:  # tile grid (TIFF 6.0 §15)
            tw_, th_ = tags[322][0], tags[323][0]
            offsets, counts = tags[324], tags[325]
            tiles_x = -(-w // tw_)
            tiles_y = -(-h // th_)
            if len(offsets) != tiles_x * tiles_y:
                raise ValueError("TIFF tile count mismatch "
                                 "(planar tiles unsupported)")
            canvas = np.zeros((tiles_y * th_, tiles_x * tw_, spp),
                              np.uint8)
            for idx, (o, c) in enumerate(zip(offsets, counts)):
                ty, tx = divmod(idx, tiles_x)
                if comp == 7:
                    tile = _jpeg_pixels(data[o:o + c])[:th_, :tw_]
                else:
                    raw = _seg_bytes(o, c)
                    tile = _undo_pred(
                        np.frombuffer(raw[:th_ * tw_ * spp], np.uint8)
                        .reshape(th_, tw_, spp))
                canvas[ty * th_:(ty + 1) * th_,
                       tx * tw_:(tx + 1) * tw_] = tile
            img = canvas[:h, :w].copy()
        elif comp == 7:
            # new-style JPEG strips: each strip is an independent
            # JPEG image RowsPerStrip tall; concatenate and crop
            img = np.concatenate(
                [_jpeg_pixels(data[o:o + c])
                 for o, c in zip(tags[273], tags[279])],
                axis=0)[:h, :w].copy()
        else:
            offsets = tags[273]
            counts = tags[279]
            raw = b"".join(_seg_bytes(o, c)
                           for o, c in zip(offsets, counts))
            img = _undo_pred(
                np.frombuffer(raw[:h * w * spp], dtype=np.uint8)
                .reshape(h, w, spp)).copy()
        if photo == 0:  # WhiteIsZero
            img = 255 - img
        pages.append(img)
    if not pages:
        raise ValueError("TIFF with no IFD")
    return pages


def _split_jpeg_tables(data: bytes) -> tuple[bytes, bytes]:
    """Split a full JPEG interchange stream into (tables stream,
    abbreviated image stream) per TIFF TechNote 2: DQT/DHT segments go
    to the JPEGTables body, everything else stays with the scan."""
    i = 2
    tables = bytearray()
    rest = bytearray()
    while i < len(data):
        marker = data[i + 1]
        if marker == 0xDA:  # SOS: entropy data through EOI follows
            rest += data[i:]
            break
        (ln,) = struct.unpack(">H", data[i + 2:i + 4])
        seg = data[i:i + 2 + ln]
        (tables if marker in (0xDB, 0xC4) else rest).extend(seg)
        i += 2 + ln
    return (b"\xff\xd8" + bytes(tables) + b"\xff\xd9",
            b"\xff\xd8" + bytes(rest))


def encode_tiff(pages: list[np.ndarray], compression: int = 1,
                predictor: int = 1, tile: tuple[int, int] | None = None,
                quant: int = 1) -> bytes:
    """List of (H, W) or (H, W, C) uint8 arrays → multi-page
    little-endian TIFF. ``compression`` 1 = none, 5 = LZW, 6 =
    old-style JPEG (one full interchange stream via
    JPEGInterchangeFormat), 7 = new-style JPEG (abbreviated per-
    segment streams + shared JPEGTables), 8 = Deflate, 32773 =
    PackBits (rows encoded separately per the spec); ``predictor``
    1 = none, 2 = horizontal differencing (LZW/Deflate);
    ``tile=(tw, th)`` writes a §15 tile grid (multiples of 16) instead
    of one strip per page; ``quant`` feeds the JPEG compressions —
    writer twin for every decoder branch."""
    if compression not in (1, 4, 5, 6, 7, 8, 32773) \
            or predictor not in (1, 2):
        raise ValueError((compression, predictor))
    if compression in (4, 6, 7, 32773) and predictor != 1:
        raise ValueError("predictor only applies to byte codecs")
    if compression == 4 and tile is not None:
        raise ValueError("G4 writer emits strips only")
    if tile is not None:
        tw, th = tile
        if tw % 16 or th % 16:
            raise ValueError("TIFF tile dims must be multiples of 16")
        if compression == 6:
            raise ValueError("old-style JPEG is strip-less "
                             "(whole-page stream)")

    def _jpeg_bytes(a: np.ndarray) -> bytes:
        # pages are RGB; kernels/jpeg speaks BGR
        from paddleocr_spark.kernels.jpeg import encode_jpeg

        if a.shape[2] == 1:
            return encode_jpeg(a[:, :, 0], quant=quant)
        return encode_jpeg(a[:, :, ::-1], quant=quant)

    def _byte_seg(a: np.ndarray) -> bytes:
        if predictor == 2:
            d = a.astype(np.int16)
            d[:, 1:, :] -= a[:, :-1, :].astype(np.int16)
            a = (d & 0xFF).astype(np.uint8)
        seg = a.tobytes()
        if compression == 8:
            import zlib

            return zlib.compress(seg)
        if compression == 5:
            return _lzw_encode(seg)
        if compression == 32773:
            hh, ww, spp = a.shape
            row_bytes = ww * spp
            return b"".join(
                _packbits_row(seg[r * row_bytes:(r + 1) * row_bytes])
                for r in range(hh))
        return seg

    out = bytearray(b"II*\x00")
    out += struct.pack("<I", 0)  # first-IFD offset patched below
    ifd_ptr_pos = 4
    for img in pages:
        a = np.asarray(img, dtype=np.uint8)
        if a.ndim == 2:
            a = a[:, :, None]
        h, w, spp = a.shape
        if compression == 4 and spp != 1:
            raise ValueError("G4 pages must be single-channel")
        photo = (0 if compression == 4 else
                 1 if spp == 1 else
                 6 if compression in (6, 7) else 2)

        # --- segment payloads ------------------------------------
        seg_bodies: list[bytes] = []
        jpegtables = None
        interchange = None  # (offset-slot value, length) for comp 6
        if compression == 4:
            from paddleocr_spark.kernels.fax import g4_encode

            # WhiteIsZero: dark pixels (< 128) are the black runs
            seg_bodies.append(g4_encode(a[:, :, 0] < 128))
        elif compression == 6:
            interchange = _jpeg_bytes(a)
        elif tile is not None:
            tiles_x, tiles_y = -(-w // tw), -(-h // th)
            padded = np.pad(a, ((0, tiles_y * th - h),
                                (0, tiles_x * tw - w), (0, 0)),
                            mode="edge")
            for ty in range(tiles_y):
                for tx in range(tiles_x):
                    t = padded[ty * th:(ty + 1) * th,
                               tx * tw:(tx + 1) * tw]
                    if compression == 7:
                        tables, abbrev = _split_jpeg_tables(
                            _jpeg_bytes(t))
                        jpegtables = tables
                        seg_bodies.append(abbrev)
                    else:
                        seg_bodies.append(_byte_seg(t))
        elif compression == 7:
            tables, abbrev = _split_jpeg_tables(_jpeg_bytes(a))
            jpegtables = tables
            seg_bodies.append(abbrev)
        else:
            seg_bodies.append(_byte_seg(a))

        offsets = []
        for body in seg_bodies:
            offsets.append(len(out))
            out += body
        if interchange is not None:
            inter_off = len(out)
            out += interchange

        # --- out-of-line value area ------------------------------
        def _oov(payload: bytes) -> int:
            if len(out) % 2:
                # TIFF 6.0: out-of-line VALUES must begin on a word
                # boundary too, not just the IFD
                out.extend(b"\x00")
            off = len(out)
            out.extend(payload)
            return off

        entries = [
            (256, 4, 1, [w]),
            (257, 4, 1, [h]),
            (258, 3, spp, [1 if compression == 4 else 8] * spp),
            (259, 3, 1, [compression]),
            (262, 3, 1, [photo]),
            (277, 3, 1, [spp]),
        ]
        if interchange is not None:
            entries += [(513, 4, 1, [inter_off]),
                        (514, 4, 1, [len(interchange)])]
        elif tile is not None:
            entries += [(322, 4, 1, [tw]), (323, 4, 1, [th]),
                        (324, 4, len(offsets), offsets),
                        (325, 4, len(seg_bodies),
                         [len(b) for b in seg_bodies])]
        else:
            entries += [(273, 4, len(offsets), offsets),
                        (278, 4, 1, [h]),
                        (279, 4, len(seg_bodies),
                         [len(b) for b in seg_bodies])]
        if predictor == 2:
            entries.append((317, 3, 1, [2]))
        if jpegtables is not None:
            entries.append((347, 7, len(jpegtables), jpegtables))
        entries.sort()  # IFD entries must be in ascending tag order

        # resolve values: inline if they fit in 4 bytes, else spill
        resolved = []
        for tag, vtype, count, values in entries:
            size = _TYPE_SIZE[vtype]
            fmt = {1: "B", 3: "H", 4: "I", 7: "B"}[vtype]
            payload = (bytes(values) if vtype == 7 else
                       struct.pack("<" + fmt * count, *values))
            if len(payload) <= 4:
                resolved.append((tag, vtype, count,
                                 payload.ljust(4, b"\x00")))
            else:
                off = _oov(payload)
                resolved.append((tag, vtype, count,
                                 struct.pack("<I", off)))
            del size
        if len(out) % 2:
            out += b"\x00"  # IFDs must be word-aligned
        ifd_off = len(out)
        out += struct.pack("<H", len(resolved))
        for tag, vtype, count, raw4 in resolved:
            out += struct.pack("<HHI", tag, vtype, count) + raw4
        next_ptr_pos = len(out)
        out += struct.pack("<I", 0)
        # link the previous IFD (or the header) to this one
        out[ifd_ptr_pos:ifd_ptr_pos + 4] = struct.pack("<I", ifd_off)
        ifd_ptr_pos = next_ptr_pos
    return bytes(out)
