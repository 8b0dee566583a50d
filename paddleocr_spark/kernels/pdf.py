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
  parser never regexes across them)
- trailer ``/Root`` → catalog ``/Pages`` → ``/Kids`` page-tree walk
  (nested ``/Pages`` nodes supported) — page ORDER comes from the
  tree, not from object numbering
- per page: ``/Resources /XObject`` → the referenced ``/Subtype
  /Image`` stream; filters ``/DCTDecode`` (decoded by
  ``kernels/jpeg.py``) and ``/FlateDecode`` (stdlib zlib; raw
  ``/DeviceRGB`` / ``/DeviceGray``, 8 bits per component)

Out of scope (explicit errors): text/vector content (needs a real
rasterizer), encryption, object streams / cross-reference streams
(PDF 1.5+ compressed xref), CCITT/JBIG2/JPX filters, indirect
``/Length``. ``encode_pdf`` writes the same shape (valid xref table
and all) so decoder tests are an interop check on the object graph.
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
    return objects


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
    # use the LAST trailer: _scan_objects keeps the latest definition
    # of every object, and in an incrementally-updated PDF only the
    # final trailer's /Root is consistent with that view (the first
    # trailer would walk a stale catalog over updated objects)
    trailers = re.findall(rb"trailer(.*?)(?:startxref|%%EOF)", data,
                          re.DOTALL)
    if not trailers:
        raise ValueError("no PDF trailer (cross-reference streams "
                         "unsupported)")
    root = _ref(trailers[-1], b"/Root")
    if root is None:
        raise ValueError("PDF trailer without /Root")
    pages_root = _ref(objects[root][0], b"/Pages")
    if pages_root is None:
        raise ValueError("PDF catalog without /Pages")
    page_objs: list[int] = []
    _walk_pages(objects, pages_root, page_objs)
    if not page_objs:
        raise ValueError("PDF with no pages")
    return [_page_image(objects, p) for p in page_objs]


# --- writer (test-fixture twin) --------------------------------------


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
        if image_filter == "DCTDecode":
            from paddleocr_spark.kernels.jpeg import encode_jpeg

            payload = encode_jpeg(img, quant=quant)
            extra = b"/Filter /DCTDecode /ColorSpace /DeviceRGB"
        elif image_filter == "FlateDecode":
            payload = zlib.compress(img[:, :, ::-1].tobytes())
            extra = b"/Filter /FlateDecode /ColorSpace /DeviceRGB"
        else:
            raise ValueError(image_filter)
        add(b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
            b"/BitsPerComponent 8 %s /Length %d >>\nstream\n"
            % (w, h, extra, len(payload)) + payload + b"\nendstream")

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
