"""Pure-Python text extraction from text-content PDFs.

The north rule names "PDF/layout parse" as part of main-content
extraction; ``kernels/pdf.py`` covers the scanned image-based shape
(the reference's fitz rasterization target, ``toddleocr/utils/
utility.py:105-123``), and this module covers the OTHER dominant PDF
shape: born-digital pages whose content streams carry the text
directly. No rasterizer is needed — the text, its position, and its
size are read straight from the content-stream operators
(ISO 32000-1 §9.4 text objects), which at 100 TB is also the cheap
path: no decode of page pixels at all, just a byte parse per page.

Implemented:

- page ``/Contents`` (single ref or array of refs, concatenated in
  order), ``/Filter /FlateDecode`` or raw streams
- content-stream tokenizer: numbers, names, literal strings with the
  full escape set (``\\n \\r \\t \\b \\f \\( \\) \\\\``, octal
  ``\\ddd``, line continuations) and balanced nested parens, hex
  strings, arrays, operators
- the text-object state machine: ``BT/ET``, ``Td TD Tm T* TL Tf``,
  show ops ``Tj ' " TJ`` (TJ string elements concatenated; numeric
  kerning adjustments carry no glyph metrics here so they never split
  a run), with the text matrix and line matrix tracked as full affine
  maps
- graphics state: ``q/Q`` stack and ``cm`` concatenation, so runs
  positioned through a translated/scaled CTM land at their true
  device coordinates

Each show op yields one run ``(text, x, y, size)`` where (x, y) is
the device-space start of the text and ``size`` the current font size
scaled by the text/CTM matrix. Limitations (explicit, documented):
simple fonts with byte-per-glyph Latin encodings, plus UTF-16BE
strings carrying a BOM (§7.9.2.2) — composite (Type0/CID) fonts with
custom CMaps would need ToUnicode tables; glyph-width advances
are not modeled (each run is positioned by its own operator, which is
how generators emit them); inline images (``BI..EI`` carry raw binary
the tokenizer cannot skip) raise explicitly; encrypted PDFs raise
upstream in ``_scan_objects``.

``encode_text_pdf`` is the writer twin (same pattern as
``encode_pdf``/``encode_tiff``/``encode_jpeg``): it emits
structurally valid text PDFs while deliberately rotating through the
operator forms (Td+Tj, Tm+TJ, TL+T*, ``'``), content-stream
compression, the /Contents array form, and a ``cm``-translated
graphics state — so decoder round-trip tests exercise the whole
state machine, not one happy path.
"""

from __future__ import annotations

import re
import zlib

from paddleocr_spark.kernels.pdf import (
    _filter_names,
    _ref,
    _scan_objects,
    _walk_pages,
    is_pdf,
)

__all__ = ["extract_pdf_text", "encode_text_pdf", "page_text"]


# --- content-stream tokenizer ---------------------------------------

_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_OP_RE = re.compile(rb"[A-Za-z'\"][A-Za-z0-9*'\"]*")
_WS = b"\x00\t\n\x0c\r "

_ESCAPES = {
    ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t",
    ord("b"): b"\b", ord("f"): b"\x0c",
    ord("("): b"(", ord(")"): b")", ord("\\"): b"\\",
}


def _literal_string(data: bytes, pos: int) -> tuple[bytes, int]:
    """Parse ``(...)`` starting at the open paren; returns (bytes,
    position after the close paren). Balanced unescaped parens nest
    (§7.3.4.2)."""
    out = bytearray()
    depth = 1
    i = pos + 1
    n = len(data)
    while i < n:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if e in _ESCAPES:
                out += _ESCAPES[e]
                i += 1
            elif 0x30 <= e <= 0x37:  # \ddd octal, 1-3 digits
                oct_digits = bytearray([e])
                i += 1
                while (len(oct_digits) < 3 and i < n
                       and 0x30 <= data[i] <= 0x37):
                    oct_digits.append(data[i])
                    i += 1
                out.append(int(oct_digits, 8) & 0xFF)
            elif e in (0x0A, 0x0D):  # line continuation
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:  # unknown escape: the backslash is dropped (§7.3.4.2)
                out.append(e)
                i += 1
        elif c == 0x28:  # (
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
            out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    raise ValueError("unterminated PDF literal string")


def _hex_string(data: bytes, pos: int) -> tuple[bytes, int]:
    end = data.find(b">", pos)
    if end == -1:
        raise ValueError("unterminated PDF hex string")
    hx = re.sub(rb"\s+", b"", data[pos + 1:end])
    if len(hx) % 2:
        hx += b"0"  # odd final digit implies trailing 0 (§7.3.4.3)
    return bytes.fromhex(hx.decode("ascii")), end + 1


def _tokenize(stream: bytes):
    """Yield ('num', float) / ('str', bytes) / ('name', bytes) /
    ('arr', list) / ('op', bytes) tokens of a content stream."""
    i, n = 0, len(stream)
    arr_stack: list[list] = []

    def emit(tok):
        if arr_stack:
            arr_stack[-1].append(tok)
            return None
        return tok

    while i < n:
        c = stream[i]
        if c in _WS:
            i += 1
            continue
        if c == 0x25:  # % comment to EOL
            j = stream.find(b"\n", i)
            i = n if j == -1 else j + 1
            continue
        if c == 0x28:  # (
            s, i = _literal_string(stream, i)
            t = emit(("str", s))
            if t:
                yield t
            continue
        if c == 0x3C:  # < — hex string or << dict
            if i + 1 < n and stream[i + 1] == 0x3C:
                # inline dicts appear only around marked content (BDC
                # property lists) — skip to the matching >>, depth-
                # aware so nested dicts don't truncate the skip
                depth = 1
                j = i + 2
                while depth and j < n - 1:
                    if stream[j:j + 2] == b"<<":
                        depth += 1
                        j += 2
                    elif stream[j:j + 2] == b">>":
                        depth -= 1
                        j += 2
                    else:
                        j += 1
                if depth:
                    raise ValueError("unterminated PDF dict")
                i = j
                continue
            s, i = _hex_string(stream, i)
            t = emit(("str", s))
            if t:
                yield t
            continue
        if c == 0x5B:  # [
            arr_stack.append([])
            i += 1
            continue
        if c == 0x5D:  # ]
            if not arr_stack:
                raise ValueError("unbalanced ] in content stream")
            done = arr_stack.pop()
            t = emit(("arr", done))
            i += 1
            if t:
                yield t
            continue
        if c == 0x2F:  # /name
            m = re.match(rb"/[^\s()<>\[\]{}/%]*", stream[i:])
            t = emit(("name", m.group()[1:]))
            i += m.end()
            if t:
                yield t
            continue
        m = _NUM_RE.match(stream, i)
        if m and (c in b"+-.0123456789"):
            t = emit(("num", float(m.group())))
            i = m.end()
            if t:
                yield t
            continue
        m = _OP_RE.match(stream, i)
        if m:
            op = m.group()
            if op == b"BI":
                # inline image: ID is followed by raw binary the
                # tokenizer cannot skip without decoding the image
                # dict — reject loudly rather than misparse
                raise ValueError(
                    "inline images (BI..EI) unsupported in PDF "
                    "content streams")
            t = emit(("op", op))
            i = m.end()
            if t:
                yield t
            continue
        raise ValueError(f"unexpected byte {c:#x} in PDF content stream")


# --- affine helpers (row-vector convention: p' = p @ M) -------------


def _mat_mul(a, b):
    """6-tuple affine (a b c d e f) compose: result = a then b."""
    a0, a1, a2, a3, a4, a5 = a
    b0, b1, b2, b3, b4, b5 = b
    return (a0 * b0 + a1 * b2, a0 * b1 + a1 * b3,
            a2 * b0 + a3 * b2, a2 * b1 + a3 * b3,
            a4 * b0 + a5 * b2 + b4, a4 * b1 + a5 * b3 + b5)


_ID = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)


# --- extraction ------------------------------------------------------


def _page_streams(objects, page: int) -> bytes:
    head, _ = objects[page]
    m = re.search(rb"/Contents\s+(\d+)\s+\d+\s+R", head)
    if m:
        refs = [int(m.group(1))]
    else:
        am = re.search(rb"/Contents\s*\[([^\]]*)\]", head)
        if not am:
            return b""
        refs = [int(x) for x in
                re.findall(rb"(\d+)\s+\d+\s+R", am.group(1))]
    parts = []
    for r in refs:
        chead, cstream = objects[r]
        if cstream is None:
            raise ValueError("PDF /Contents object without stream")
        filters = _filter_names(chead)
        if filters == [b"FlateDecode"]:
            cstream = zlib.decompress(cstream)
        elif filters:
            raise ValueError(
                "unsupported PDF content-stream filter %r"
                % [f.decode() for f in filters])
        parts.append(cstream)
    # streams of one page form a single token sequence; the joiner
    # newline keeps tokens split across the boundary separate (§7.8.2)
    return b"\n".join(parts)


def _runs_of_stream(stream: bytes) -> list[tuple[str, float, float,
                                                 float]]:
    runs = []
    ctm = _ID
    gs_stack: list[tuple] = []
    tm = tlm = _ID
    size = 0.0
    leading = 0.0
    in_text = False
    operands: list = []

    def show(text_bytes: bytes) -> None:
        if not text_bytes:
            return
        dev = _mat_mul(tm, ctm)
        # size scales by the vertical magnitude of text+device space
        scale = (dev[2] ** 2 + dev[3] ** 2) ** 0.5
        if text_bytes[:2] == b"\xfe\xff":
            # UTF-16BE with BOM (§7.9.2.2) — the common generator
            # encoding for non-Latin text strings
            text = text_bytes[2:].decode("utf-16-be", "replace")
        else:
            text = text_bytes.decode("latin-1")
        runs.append((text, dev[4], dev[5], size * scale))

    for kind, val in _tokenize(stream):
        if kind != "op":
            operands.append((kind, val))
            continue
        op = val
        try:
            if op == b"BT":
                tm = tlm = _ID
                in_text = True
            elif op == b"ET":
                in_text = False
            elif op == b"Tf" and len(operands) >= 2:
                size = operands[-1][1]
            elif op == b"TL" and operands:
                leading = operands[-1][1]
            elif op == b"Td" and len(operands) >= 2:
                tx, ty = operands[-2][1], operands[-1][1]
                tlm = _mat_mul((1, 0, 0, 1, tx, ty), tlm)
                tm = tlm
            elif op == b"TD" and len(operands) >= 2:
                tx, ty = operands[-2][1], operands[-1][1]
                leading = -ty
                tlm = _mat_mul((1, 0, 0, 1, tx, ty), tlm)
                tm = tlm
            elif op == b"Tm" and len(operands) >= 6:
                tm = tlm = tuple(o[1] for o in operands[-6:])
            elif op == b"T*":
                tlm = _mat_mul((1, 0, 0, 1, 0, -leading), tlm)
                tm = tlm
            elif op == b"Tj" and operands and in_text:
                show(operands[-1][1])
            elif op == b"'" and operands and in_text:
                tlm = _mat_mul((1, 0, 0, 1, 0, -leading), tlm)
                tm = tlm
                show(operands[-1][1])
            elif op == b'"' and len(operands) >= 3 and in_text:
                # aw ac string " — spacing ops carry no effect here
                tlm = _mat_mul((1, 0, 0, 1, 0, -leading), tlm)
                tm = tlm
                show(operands[-1][1])
            elif op == b"TJ" and operands and in_text:
                arr = operands[-1][1]
                if isinstance(arr, list):
                    text = b"".join(v for k, v in arr if k == "str")
                    show(text)
            elif op == b"cm" and len(operands) >= 6:
                ctm = _mat_mul(tuple(o[1] for o in operands[-6:]), ctm)
            elif op == b"q":
                gs_stack.append(ctm)
            elif op == b"Q":
                if gs_stack:
                    ctm = gs_stack.pop()
            # every other operator (path/color/XObject/marked-content)
            # has no effect on text extraction
        finally:
            operands = []
    return runs


def extract_pdf_text(data: bytes) -> list[list[tuple[str, float,
                                                     float, float]]]:
    """PDF bytes → per page (in page-tree order) a list of text runs
    ``(text, x, y, size)`` in content-stream order, positions in
    device space. Pages without text content yield ``[]`` (an
    image-only page is valid input here, and a text page is valid
    input to neither ``decode_pdf_pages`` nor a rasterizer — the two
    modules split the format's two shapes)."""
    if not is_pdf(data):
        raise ValueError("not a PDF")
    objects = _scan_objects(data)
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
    return [_runs_of_stream(_page_streams(objects, p))
            for p in page_objs]


def page_text(runs: list[tuple[str, float, float, float]],
              y_tol: float = 2.0) -> str:
    """Assemble one page's runs into reading order: lines grouped by
    baseline y within ``y_tol`` (top of the page first — device y
    grows upward), runs within a line left to right — the same
    y-tolerance idea as ``sorted_boxes`` (``kernels/
    reading_order.py``), on baselines instead of box corners."""
    if not runs:
        return ""
    ordered = sorted(runs, key=lambda r: (-r[2], r[1]))
    lines: list[list[tuple]] = [[ordered[0]]]
    for r in ordered[1:]:
        if abs(r[2] - lines[-1][-1][2]) <= y_tol:
            lines[-1].append(r)
        else:
            lines.append([r])
    return "\n".join(
        " ".join(r[0] for r in sorted(line, key=lambda r: r[1]))
        for line in lines)


# --- writer (test-fixture twin) --------------------------------------


def _esc(text: str) -> bytes:
    b = text.encode("latin-1")
    return (b.replace(b"\\", b"\\\\").replace(b"(", b"\\(")
            .replace(b")", b"\\)"))


def _fmt(v: float) -> bytes:
    return (b"%d" % round(v)) if float(v).is_integer() else \
        (b"%.4f" % v)


def _run_ops(r: int, text: str, x: float, y: float,
             size: float) -> bytes:
    """One BT..ET text object, rotating the operator form by run
    index so round-trip tests cover the whole state machine."""
    form = r % 4
    s, fx, fy = _fmt(size), _fmt(x), _fmt(y)
    if form == 0:  # plain Td + Tj
        return (b"BT /F1 " + s + b" Tf " + fx + b" " + fy
                + b" Td (" + _esc(text) + b") Tj ET")
    if form == 1:  # Tm + TJ with a kerning split
        half = max(1, len(text) // 2)
        return (b"BT /F1 " + s + b" Tf 1 0 0 1 " + fx + b" " + fy
                + b" Tm [(" + _esc(text[:half]) + b") -120 ("
                + _esc(text[half:]) + b")] TJ ET")
    if form == 2:  # TL + T* from one line above
        return (b"BT /F1 " + s + b" Tf " + fx + b" "
                + _fmt(y + 14) + b" Td 14 TL T* ("
                + _esc(text) + b") Tj ET")
    # form 3: TD (move + set leading = -ty) then ' (next-line show).
    # Td lands at y + 18, TD 0 -9 moves to y + 9 and sets leading 9,
    # ' advances one more line down to y and shows.
    return (b"BT /F1 " + s + b" Tf " + fx + b" " + _fmt(y + 18)
            + b" Td 0 -9 TD (" + _esc(text) + b") ' ET")


def encode_text_pdf(pages: list[list[tuple[str, float, float,
                                           float]]]) -> bytes:
    """Pages of ``(text, x, y, size)`` runs → a structurally valid
    text PDF. Odd pages wrap their text in a translated ``q cm .. Q``
    graphics state (run coordinates pre-compensated, so extraction
    must apply the CTM to reproduce the input); odd-index files of a
    fixture store get FlateDecode content streams via
    ``compress_content``; pages with ≥3 runs split their content
    across a two-element ``/Contents`` array."""
    return _encode_text_pdf(pages, compress_content=False)


def _encode_text_pdf(pages, compress_content: bool) -> bytes:
    objs: list[bytes] = []

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    def stream_obj(payload: bytes) -> bytes:
        if compress_content:
            payload = zlib.compress(payload)
            return (b"<< /Length %d /Filter /FlateDecode >>\nstream\n"
                    % len(payload) + payload + b"\nendstream")
        return (b"<< /Length %d >>\nstream\n" % len(payload)
                + payload + b"\nendstream")

    add(b"<< /Type /Catalog /Pages 2 0 R >>")
    pages_placeholder = add(b"")  # filled once kid numbers are known
    font_num = add(b"<< /Type /Font /Subtype /Type1 "
                   b"/BaseFont /Helvetica >>")
    page_nums = []
    for p, runs in enumerate(pages):
        dx, dy = (5, 7) if p % 2 else (0, 0)
        body = [_run_ops(r, text, x - dx, y - dy, size)
                for r, (text, x, y, size) in enumerate(runs)]
        if p % 2:
            body = [b"q 1 0 0 1 %d %d cm" % (dx, dy)] + body + [b"Q"]
        payload = b"\n".join(body)
        if len(runs) >= 3:
            # split at a text-object boundary into a /Contents array
            cut = len(body) // 2
            c1 = add(stream_obj(b"\n".join(body[:cut])))
            c2 = add(stream_obj(b"\n".join(body[cut:])))
            contents = b"[%d 0 R %d 0 R]" % (c1, c2)
        else:
            contents = b"%d 0 R" % add(stream_obj(payload))
        page_nums.append(add(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents " + contents + b" /Resources << /Font << "
            b"/F1 %d 0 R >> >> >>" % font_num))
    kids = b" ".join(b"%d 0 R" % n for n in page_nums)
    objs[pages_placeholder - 1] = (
        b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>"
        % len(pages))

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
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n"
            b"%%%%EOF\n" % (len(objs) + 1, xref_off))
    return bytes(out)
