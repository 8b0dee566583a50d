"""Minimal pure-Python PDF page-image extractor.

The reference's ``check_and_read`` renders PDF pages with fitz at a 2×
matrix (``toddleocr/utils/utility.py:105-123``). fitz is a full PDF
RASTERIZER (text + vector + images) and does not exist in this
environment; what CAN be implemented from scratch — and covers the
dominant OCR input, scanned documents — is the image-based-PDF shape:
each page's content is one full-page image XObject. This module parses
the real PDF object graph for that shape:

- object scan: ``N 0 obj`` … ``endobj`` with stream bodies skipped via
  their literal ``/Length`` (streams may contain any bytes, so the
  parser never regexes across them); PDF 1.5+ **object streams**
  (``/Type /ObjStm``) are unpacked after the raw pass — their N
  "num offset" header pairs yield the compressed objects raw
  numbering never saw
- document root: the last ``trailer`` dict's ``/Root``, or — in
  PDF 1.5+ files that replace the trailer with a **cross-reference
  stream** — the last ``/Type /XRef`` stream dict's ``/Root``
  (``_doc_root``); catalog ``/Pages`` → ``/Kids`` page-tree walk
  (nested ``/Pages`` nodes supported) — page ORDER comes from the
  tree, not from object numbering
- per page: ``/Resources /XObject`` → the referenced ``/Subtype
  /Image`` stream; filters ``/DCTDecode`` (decoded by
  ``kernels/jpeg.py``) and ``/FlateDecode`` (stdlib zlib; raw
  ``/DeviceRGB`` / ``/DeviceGray``, 8 bits per component); pages
  with no image XObject fall through to the vector rasterizer
  (``kernels/pdf_raster.py``)

Out of scope (explicit errors): encryption, CCITT/JBIG2/JPX filters,
indirect ``/Length``. ``encode_pdf`` writes the classic shape (valid
xref table and all) and ``repack_pdf_objstm`` rewrites ANY classic
file from this repo's writers into the 1.5+ shape (one ObjStm
holding every non-stream object + a real cross-reference stream,
trailer-less), so decoder tests are an interop check on both object
graphs.
"""

from __future__ import annotations

import re
import zlib

import numpy as np

__all__ = ["decode_pdf_pages", "encode_pdf", "is_pdf"]


def is_pdf(data: bytes) -> bool:
    return data[:5] == b"%PDF-"


_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b")
_STREAM_RE = re.compile(rb"stream\r?\n")


def _scan_objects(data: bytes) -> dict[int, tuple[bytes, bytes | None]]:
    """{obj_num: (dict/body bytes, stream bytes or None)}."""
    objects = {}
    pos = 0
    while True:
        m = _OBJ_RE.search(data, pos)
        if not m:
            break
        num = int(m.group(1))
        body_start = m.end()
        sm = _STREAM_RE.search(data, body_start)
        end_plain = data.find(b"endobj", body_start)
        if end_plain == -1:
            raise ValueError("unterminated PDF object")
        if sm and sm.start() < end_plain:
            head = data[body_start:sm.start()]
            # the lookahead form (\d+)(?!\s+\d+\s+R) BACKTRACKS on
            # multi-digit indirect refs ('/Length 12 0 R' would match
            # with length=1); match the optional ref explicitly and
            # reject it instead
            lm = re.search(rb"/Length\s+(\d+)(\s+\d+\s+R)?", head)
            if not lm or lm.group(2):
                raise ValueError(
                    "PDF stream with missing/indirect /Length "
                    "unsupported")
            length = int(lm.group(1))
            s0 = sm.end()
            stream = data[s0:s0 + length]
            endobj = data.find(b"endobj", s0 + length)
            if endobj == -1:
                raise ValueError("unterminated PDF stream object")
            objects[num] = (head, stream)
            pos = endobj + 6
        else:
            objects[num] = (data[body_start:end_plain], None)
            pos = end_plain + 6
    if not objects:
        raise ValueError("no PDF objects found")
    _unpack_object_streams(objects)
    return objects


def _unpack_object_streams(objects) -> None:
    """PDF 1.5 §7.5.7: a /Type /ObjStm stream packs non-stream
    objects as N "num offset" header pairs + concatenated bodies from
    /First. Unpack them into the object map; raw (latest-definition)
    entries win over packed ones, matching the scanner's
    incremental-update policy."""
    for num in list(objects):
        head, stream = objects[num]
        if stream is None or not re.search(rb"/Type\s*/ObjStm\b", head):
            continue
        n = _int_val(head, b"/N")
        first = _int_val(head, b"/First")
        if n is None or first is None:
            raise ValueError("ObjStm without /N or /First")
        if _filter_names(head) == [b"FlateDecode"]:
            stream = zlib.decompress(stream)
        elif _filter_names(head):
            raise ValueError("unsupported ObjStm filter")
        pairs = stream[:first].split()
        if len(pairs) < 2 * n:
            raise ValueError("truncated ObjStm header")
        nums = [int(x) for x in pairs[0:2 * n:2]]
        offs = [int(x) for x in pairs[1:2 * n:2]]
        for i, (onum, off) in enumerate(zip(nums, offs)):
            end = first + offs[i + 1] if i + 1 < n else len(stream)
            if onum not in objects:
                objects[onum] = (stream[first + off:end], None)


def _ref(head: bytes, key: bytes) -> int | None:
    m = re.search(re.escape(key) + rb"\s+(\d+)\s+\d+\s+R", head)
    return int(m.group(1)) if m else None


def _int_val(head: bytes, key: bytes) -> int | None:
    """Direct integer value of ``key``; an indirect reference
    (``/Width 100 0 R``) raises instead of silently returning the
    reference's object number as the value — the same bug class the
    /Length parse in ``_scan_objects`` rejects explicitly."""
    m = re.search(re.escape(key) + rb"\s+(\d+)(\s+\d+\s+R)?", head)
    if m is None:
        return None
    if m.group(2):
        raise ValueError(f"indirect PDF value for {key.decode()} "
                         "unsupported")
    return int(m.group(1))


def _doc_root(objects, data: bytes) -> int:
    """The catalog object number: the LAST ``trailer`` dict's /Root
    (in an incrementally-updated PDF only the final trailer is
    consistent with the latest-definition object map), or — for
    PDF 1.5+ trailer-less files — the last /Type /XRef stream dict's
    /Root. Encrypted documents raise explicitly either way."""
    trailers = re.findall(rb"trailer(.*?)(?:startxref|%%EOF)", data,
                          re.DOTALL)
    if trailers:
        if any(b"/Encrypt" in t for t in trailers):
            raise ValueError("encrypted PDF unsupported")
        root = _ref(trailers[-1], b"/Root")
        if root is None:
            raise ValueError("PDF trailer without /Root")
        return root
    # PDF 1.5+: the trailer dict lives in the cross-reference stream
    xref_heads = [h for h, s in objects.values()
                  if s is not None and re.search(rb"/Type\s*/XRef\b", h)]
    if not xref_heads:
        raise ValueError("no PDF trailer or cross-reference stream")
    if any(b"/Encrypt" in h for h in xref_heads):
        raise ValueError("encrypted PDF unsupported")
    root = _ref(xref_heads[-1], b"/Root")
    if root is None:
        raise ValueError("PDF cross-reference stream without /Root")
    return root


def _kids(head: bytes) -> list[int]:
    m = re.search(rb"/Kids\s*\[([^\]]*)\]", head)
    if not m:
        return []
    return [int(x) for x in re.findall(rb"(\d+)\s+\d+\s+R", m.group(1))]


def _walk_pages(objects, node: int, out: list[int]) -> None:
    head, _ = objects[node]
    if re.search(rb"/Type\s*/Pages\b", head):
        for kid in _kids(head):
            _walk_pages(objects, kid, out)
    elif re.search(rb"/Type\s*/Page\b", head):
        out.append(node)
    else:
        raise ValueError("unexpected node in PDF page tree")


def _page_image(objects, page: int) -> np.ndarray:
    head, _ = objects[page]
    xm = re.search(rb"/XObject\s*<<(.*?)>>", head, re.DOTALL)
    if xm:
        refs = re.findall(rb"/\w+\s+(\d+)\s+\d+\s+R", xm.group(1))
        for r in refs:
            ihead, istream = objects[int(r)]
            if not re.search(rb"/Subtype\s*/Image\b", ihead):
                continue
            return _decode_image_xobject(ihead, istream)
    # no image XObject: a vector-content page (ruled tables, charts,
    # form overlays) — rasterize its content stream at the
    # reference's 2x fitz matrix (kernels/pdf_raster.py). Pages WITH
    # an image XObject keep the lossless direct-decode path above
    # (the dominant scanned shape).
    from paddleocr_spark.kernels.pdf_raster import _rasterize_page

    return _rasterize_page(objects, page)


def _filter_names(head: bytes) -> list[bytes]:
    """The /Filter entry as a list of names — handles both the bare
    form ``/Filter /DCTDecode`` and the array form ``/Filter
    [ /DCTDecode ]`` (legal and common; the bare-name-only regex
    rejected array-form files the module otherwise supports)."""
    m = re.search(rb"/Filter\s*(?:\[([^\]]*)\]|/(\w+))", head)
    if not m:
        return []
    if m.group(2) is not None:
        return [m.group(2)]
    return re.findall(rb"/(\w+)", m.group(1))


def _unpredict(raw: bytes, head: bytes, w: int, h: int,
               ncomp: int) -> bytes:
    """Undo a /DecodeParms /Predictor on FlateDecode output
    (ISO 32000-1 §7.4.4.4): 2 = TIFF horizontal differencing,
    >= 10 = PNG row filters (shared row-unfilter with the PNG codec).
    Without this, predictor-coded rows reshape as raw pixels —
    silently scrambled output."""
    pm = re.search(rb"/Predictor\s+(\d+)", head)
    pred = int(pm.group(1)) if pm else 1
    if pred == 1:
        return raw
    cm = re.search(rb"/Columns\s+(\d+)", head)
    cols = int(cm.group(1)) if cm else w
    km = re.search(rb"/Colors\s+(\d+)", head)
    colors = int(km.group(1)) if km else ncomp
    if pred == 2:  # TIFF horizontal differencing
        arr = (np.frombuffer(raw[:h * cols * colors], np.uint8)
               .reshape(h, cols, colors).astype(np.uint32))
        return arr.cumsum(axis=1, dtype=np.uint32).astype(
            np.uint8).tobytes()
    if pred >= 10:  # PNG predictors: rows of (tag + stride) bytes
        from paddleocr_spark.kernels.imgcodec import unfilter_png_rows

        return unfilter_png_rows(raw, h, cols * colors, colors).tobytes()
    raise ValueError(f"unsupported PDF /Predictor {pred}")


def _decode_image_xobject(head: bytes, stream: bytes) -> np.ndarray:
    if stream is None:
        raise ValueError("image XObject without stream")
    filters = _filter_names(head)
    if filters == [b"DCTDecode"]:
        from paddleocr_spark.kernels.jpeg import decode_jpeg

        return decode_jpeg(stream)  # BGR already
    if filters == [b"CCITTFaxDecode"]:
        # scanned-fax image XObject (ISO 32000-1 §7.4.6): G4 only
        # (/K < 0; the G3 rows of /K >= 0 raise explicitly)
        from paddleocr_spark.kernels.fax import g4_decode

        w = _int_val(head, b"/Width")
        h = _int_val(head, b"/Height")
        km = re.search(rb"/K\s+(-?\d+)", head)
        k = int(km.group(1)) if km else 0
        if k >= 0:
            raise ValueError(
                "CCITTFaxDecode /K >= 0 (Group 3) unsupported")
        cm = re.search(rb"/Columns\s+(\d+)", head)
        cols = int(cm.group(1)) if cm else 1728
        black = g4_decode(stream, cols, h)[:h, :w]
        # /BlackIs1 false (default): black pixels come out as 0 bits
        black_is1 = bool(re.search(rb"/BlackIs1\s+true\b", head))
        sample = black if black_is1 else ~black
        # 1-bit DeviceGray /Decode (default [0 1]; [1 0] inverts)
        if re.search(rb"/Decode\s*\[\s*1\s+0\s*\]", head):
            sample = ~sample
        g = np.where(sample, 255, 0).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    if filters == [b"FlateDecode"]:
        w = _int_val(head, b"/Width")
        h = _int_val(head, b"/Height")
        bpc = _int_val(head, b"/BitsPerComponent")
        if bpc != 8:
            raise ValueError("only 8-bit PDF images supported")
        if re.search(rb"/ColorSpace\s*/DeviceRGB\b", head):
            raw = _unpredict(zlib.decompress(stream), head, w, h, 3)
            img = np.frombuffer(raw[:h * w * 3], np.uint8) \
                .reshape(h, w, 3)
            return img[:, :, ::-1].copy()  # RGB → BGR
        if re.search(rb"/ColorSpace\s*/DeviceGray\b", head):
            raw = _unpredict(zlib.decompress(stream), head, w, h, 1)
            g = np.frombuffer(raw[:h * w], np.uint8).reshape(h, w)
            return np.repeat(g[:, :, None], 3, axis=2)
        raise ValueError("unsupported PDF image color space")
    raise ValueError(
        "unsupported PDF image filter chain %r (single DCTDecode/"
        "FlateDecode only)" % [f.decode() for f in filters])


def decode_pdf_pages(data: bytes) -> list[np.ndarray]:
    """PDF bytes → list of (H, W, 3) uint8 BGR page images, in page
    tree order (scanned image-based PDFs)."""
    if not is_pdf(data):
        raise ValueError("not a PDF")
    objects = _scan_objects(data)
    root = _doc_root(objects, data)
    pages_root = _ref(objects[root][0], b"/Pages")
    if pages_root is None:
        raise ValueError("PDF catalog without /Pages")
    page_objs: list[int] = []
    _walk_pages(objects, pages_root, page_objs)
    if not page_objs:
        raise ValueError("PDF with no pages")
    return [_page_image(objects, p) for p in page_objs]


# --- writer (test-fixture twin) --------------------------------------


def repack_pdf_objstm(data: bytes) -> bytes:
    """Rewrite a classic PDF (from any of this repo's writer twins)
    into the PDF 1.5+ shape: every non-stream object packed into ONE
    /Type /ObjStm, stream objects re-emitted raw, and a real
    cross-reference stream (/W [1 4 2]: type-1 offsets for raw
    objects, type-2 (objstm, index) for packed ones) carrying /Root —
    no ``trailer`` keyword anywhere. Original object numbers are
    preserved, so every indirect reference survives untouched."""
    objects = _scan_objects(data)
    root = _doc_root(objects, data)
    max_num = max(objects)
    objstm_num, xref_num = max_num + 1, max_num + 2

    packed = sorted(n for n, (_, s) in objects.items() if s is None)
    raw = sorted(n for n, (_, s) in objects.items() if s is not None)

    bodies = [objects[n][0].strip() for n in packed]
    offs = []
    pos = 0
    for b in bodies:
        offs.append(pos)
        pos += len(b) + 1
    header = b" ".join(b"%d %d" % (n, o) for n, o in zip(packed, offs))
    payload = zlib.compress(header + b"\n"
                            + b"\n".join(bodies) + b"\n")
    first = len(header) + 1

    out = bytearray(b"%PDF-1.5\n")
    offsets: dict[int, int] = {}

    def emit(num: int, body: bytes) -> None:
        offsets[num] = len(out)
        out.extend(b"%d 0 obj\n" % num + body + b"\nendobj\n")

    for n in raw:
        head, stream = objects[n]
        emit(n, head.strip() + b"\nstream\n" + stream + b"\nendstream")
    emit(objstm_num,
         b"<< /Type /ObjStm /N %d /First %d /Filter /FlateDecode "
         b"/Length %d >>\nstream\n" % (len(packed), first,
                                       len(payload))
         + payload + b"\nendstream")

    # cross-reference stream: one [type, field2, field3] row per
    # object number 0..xref_num (W = [1, 4, 2] — 4-byte offsets so
    # multi-megabyte stores don't overflow the field)
    size = xref_num + 1
    xref_off = len(out)
    idx_of = {n: i for i, n in enumerate(packed)}
    rows = bytearray()
    for num in range(size):
        if num == 0:
            rows += bytes([0]) + (0).to_bytes(4, "big") \
                + (65535).to_bytes(2, "big")
        elif num in idx_of:
            rows += bytes([2]) + objstm_num.to_bytes(4, "big") \
                + idx_of[num].to_bytes(2, "big")
        else:  # raw object, the ObjStm, or the xref stream itself
            off = xref_off if num == xref_num else offsets[num]
            rows += bytes([1]) + off.to_bytes(4, "big") \
                + (0).to_bytes(2, "big")
    xpayload = zlib.compress(bytes(rows))
    emit(xref_num,
         b"<< /Type /XRef /Size %d /W [1 4 2] /Index [0 %d] "
         b"/Root %d 0 R /Filter /FlateDecode /Length %d >>\nstream\n"
         % (size, size, root, len(xpayload))
         + xpayload + b"\nendstream")
    out.extend(b"startxref\n%d\n%%%%EOF\n" % xref_off)
    return bytes(out)


def encode_pdf(pages: list[np.ndarray], image_filter: str = "DCTDecode",
               quant: int = 1) -> bytes:
    """(H, W, 3) uint8 BGR pages → a structurally valid image-based
    PDF (catalog, page tree, per-page image XObject + content stream,
    real xref table)."""
    objs: list[bytes] = []  # bodies; object number = index + 1

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    n_pages = len(pages)
    # reserve: 1 catalog, 2 pages-root, then per page (page, content,
    # image) triples
    catalog_num, pages_num = 1, 2
    page_nums = [3 + 3 * i for i in range(n_pages)]
    add(b"<< /Type /Catalog /Pages 2 0 R >>")
    kids = b" ".join(b"%d 0 R" % n for n in page_nums)
    add(b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % n_pages)
    for i, img in enumerate(pages):
        h, w = img.shape[:2]
        page_num = page_nums[i]
        content_num, image_num = page_num + 1, page_num + 2
        add(b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %d %d] "
            b"/Contents %d 0 R /Resources << /XObject << /Im0 %d 0 R "
            b">> >> >>" % (w, h, content_num, image_num))
        content = b"q %d 0 0 %d 0 0 cm /Im0 Do Q" % (w, h)
        add(b"<< /Length %d >>\nstream\n" % len(content) + content
            + b"\nendstream")
        bpc = 8
        if image_filter == "DCTDecode":
            from paddleocr_spark.kernels.jpeg import encode_jpeg

            payload = encode_jpeg(img, quant=quant)
            extra = b"/Filter /DCTDecode /ColorSpace /DeviceRGB"
        elif image_filter == "FlateDecode":
            payload = zlib.compress(img[:, :, ::-1].tobytes())
            extra = b"/Filter /FlateDecode /ColorSpace /DeviceRGB"
        elif image_filter == "CCITTFaxDecode":
            from paddleocr_spark.kernels.fax import g4_encode

            payload = g4_encode(img[:, :, 0] < 128)
            extra = (b"/Filter /CCITTFaxDecode /ColorSpace "
                     b"/DeviceGray /DecodeParms << /K -1 "
                     b"/Columns %d /Rows %d >>" % (w, h))
            bpc = 1
        else:
            raise ValueError(image_filter)
        add(b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
            b"/BitsPerComponent %d %s /Length %d >>\nstream\n"
            % (w, h, bpc, extra, len(payload)) + payload + b"\nendstream")

    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % (i + 1) + body + b"\nendobj\n"
    xref_off = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n"
            b"%%%%EOF\n" % (len(objs) + 1, catalog_num, xref_off))
    return bytes(out)
