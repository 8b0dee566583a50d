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

- font handling: simple fonts decode byte-per-glyph latin-1; UTF-16BE
  strings with a BOM decode per §7.9.2.2; composite (Type0/CID)
  fonts resolve through the page's ``/Resources /Font`` dict to
  their ``/ToUnicode`` CMap (§9.10.3 — codespacerange width, bfchar,
  both bfrange destination forms), fixed-width codes mapped to
  Unicode; a Type0 font without ToUnicode yields U+FFFD per code
  (honest gaps, not latin-1 mojibake)
- ``q/Q`` save/restore the full §8.4.1 graphics state this module
  models: CTM plus the text state (font, size, leading)

Each show op yields one run ``(text, x, y, size)`` where (x, y) is
the device-space start of the text and ``size`` the current font size
scaled by the text/CTM matrix. Limitations (explicit, documented):
glyph-width advances are not modeled (each run is positioned by its
own operator, which is how generators emit them); inline images
(``BI..EI`` carry raw binary the tokenizer cannot skip) raise
explicitly; encrypted PDFs raise an explicit ``/Encrypt`` error.

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
    _doc_root,
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
                # inline dicts appear around marked content (BDC
                # property lists) and in CMap headers — skip to the
                # matching >>, depth-aware, delegating strings to the
                # string parsers so a ')' or '>>' INSIDE a string
                # value can't corrupt the depth count
                depth = 1
                j = i + 2
                while depth and j < n:
                    cj = stream[j]
                    if cj == 0x28:  # ( literal string
                        _, j = _literal_string(stream, j)
                    elif stream[j:j + 2] == b"<<":
                        depth += 1
                        j += 2
                    elif stream[j:j + 2] == b">>":
                        depth -= 1
                        j += 2
                    elif cj == 0x3C:  # < hex string
                        _, j = _hex_string(stream, j)
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
            try:
                cstream = zlib.decompress(cstream)
            except zlib.error as ex:
                raise ValueError(
                    f"corrupt PDF content stream: {ex}") from ex
        elif filters:
            raise ValueError(
                "unsupported PDF content-stream filter %r"
                % [f.decode() for f in filters])
        parts.append(cstream)
    # streams of one page form a single token sequence; the joiner
    # newline keeps tokens split across the boundary separate (§7.8.2)
    return b"\n".join(parts)


def _parse_tounicode(stream: bytes) -> tuple[int, dict[int, str]]:
    """Parse a /ToUnicode CMap stream (§9.10.3 / Adobe CMap spec) into
    (code byte-width, {code: unicode string}). Handles
    begincodespacerange (width), beginbfchar (pairs) and beginbfrange
    (lo hi dst — dst a hex string whose last UTF-16 code unit
    increments, or an array of per-code hex strings). The CMap's
    PostScript scaffolding (findresource, dict defs) tokenizes as
    names/operators the walk ignores."""
    toks = list(_tokenize(stream))
    code_len = 2
    cmap: dict[int, str] = {}
    i = 0
    n = len(toks)
    while i < n:
        kind, val = toks[i]
        if kind != "op":
            i += 1
            continue
        if val == b"begincodespacerange":
            if i + 1 < n and toks[i + 1][0] == "str":
                code_len = max(1, len(toks[i + 1][1]))
            while i < n and toks[i] != ("op", b"endcodespacerange"):
                i += 1
        elif val == b"beginbfchar":
            i += 1
            while i + 1 < n and toks[i][0] == "str":
                src, dst = toks[i][1], toks[i + 1][1]
                cmap[int.from_bytes(src, "big")] = \
                    dst.decode("utf-16-be", "replace")
                i += 2
        elif val == b"beginbfrange":
            i += 1
            while i + 2 < n and toks[i][0] == "str" \
                    and toks[i + 1][0] == "str":
                lo = int.from_bytes(toks[i][1], "big")
                hi = int.from_bytes(toks[i + 1][1], "big")
                dk, dv = toks[i + 2]
                if dk == "arr":
                    for off, (_, ev) in enumerate(dv):
                        cmap[lo + off] = ev.decode("utf-16-be",
                                                   "replace")
                else:
                    for c in range(lo, hi + 1):
                        s = bytearray(dv)
                        unit = (int.from_bytes(s[-2:], "big")
                                + (c - lo)) & 0xFFFF
                        s[-2:] = unit.to_bytes(2, "big")
                        cmap[c] = bytes(s).decode("utf-16-be",
                                                  "replace")
                i += 3
        i += 1
    return code_len, cmap


def _page_fonts(objects, page: int) -> dict[bytes, tuple[int, dict]]:
    """Resolve the page's /Resources /Font dict to the composite
    (Type0/CID) fonts needing code→Unicode mapping: {font name:
    (code width, cmap)}. A Type0 font WITHOUT /ToUnicode maps to
    (2, {}) — its codes surface as U+FFFD gaps rather than latin-1
    mojibake. Simple (byte-per-glyph) fonts are absent from the dict;
    their strings decode on the latin-1 path as before."""
    head, _ = objects[page]
    res = head
    m = re.search(rb"/Resources\s+(\d+)\s+\d+\s+R", head)
    if m:
        res = objects[int(m.group(1))][0]
    fm = re.search(rb"/Font\s+(\d+)\s+\d+\s+R", res)
    if fm:
        fdict = objects[int(fm.group(1))][0]
    else:
        fm2 = re.search(rb"/Font\s*<<(.*?)>>", res, re.DOTALL)
        if not fm2:
            return {}
        fdict = fm2.group(1)
    fonts: dict[bytes, tuple[int, dict]] = {}
    for name, ref in re.findall(
            rb"/([^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R", fdict):
        fhead = objects.get(int(ref), (b"", None))[0]
        if b"/Type0" not in fhead:
            continue
        tu = _ref(fhead, b"/ToUnicode")
        if tu is None or tu not in objects:
            fonts[name] = (2, {})
            continue
        thead, tstream = objects[tu]
        if tstream is None:
            fonts[name] = (2, {})
            continue
        if _filter_names(thead) == [b"FlateDecode"]:
            try:
                tstream = zlib.decompress(tstream)
            except zlib.error as ex:
                raise ValueError(
                    f"corrupt PDF ToUnicode stream: {ex}") from ex
        fonts[name] = _parse_tounicode(tstream)
    return fonts


def _runs_of_stream(stream: bytes,
                    fonts: dict[bytes, tuple[int, dict]] | None = None,
                    ) -> list[tuple[str, float, float, float]]:
    fonts = fonts or {}
    runs = []
    ctm = _ID
    gs_stack: list[tuple] = []
    tm = tlm = _ID
    size = 0.0
    leading = 0.0
    cur_font = b""
    in_text = False
    operands: list = []

    def show(text_bytes: bytes) -> None:
        if not text_bytes:
            return
        dev = _mat_mul(tm, ctm)
        # size scales by the vertical magnitude of text+device space
        scale = (dev[2] ** 2 + dev[3] ** 2) ** 0.5
        comp = fonts.get(cur_font)
        if comp is not None:
            # composite (Type0/CID) font: fixed-width codes through
            # the ToUnicode map; unmapped/truncated codes are U+FFFD
            width, cmap = comp
            text = "".join(
                cmap.get(int.from_bytes(text_bytes[j:j + width],
                                        "big"), "�")
                if j + width <= len(text_bytes) else "�"
                for j in range(0, len(text_bytes), width))
        elif text_bytes[:2] == b"\xfe\xff":
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
                if operands[-2][0] == "name":
                    cur_font = operands[-2][1]
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
                # ISO 32000-1 §8.4.1: text state (font, size, leading)
                # is part of graphics state, so q/Q must save/restore
                # it too — else 'q .. Tf .. Q' leaks the font change
                gs_stack.append((ctm, size, leading, cur_font))
            elif op == b"Q":
                if gs_stack:
                    ctm, size, leading, cur_font = gs_stack.pop()
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
    # _doc_root handles classic trailers AND PDF 1.5+ xref streams,
    # and raises explicitly on /Encrypt (an encrypted file would
    # otherwise surface as a zlib/tokenizer error)
    root = _doc_root(objects, data)
    pages_root = _ref(objects[root][0], b"/Pages")
    if pages_root is None:
        raise ValueError("PDF catalog without /Pages")
    page_objs: list[int] = []
    _walk_pages(objects, pages_root, page_objs)
    return [_runs_of_stream(_page_streams(objects, p),
                            _page_fonts(objects, p))
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


def _needs_cid(text: str) -> bool:
    try:
        text.encode("latin-1")
        return False
    except UnicodeEncodeError:
        return True


def _run_ops(r: int, text: str, x: float, y: float, size: float,
             cid_of: dict[str, int] | None = None) -> bytes:
    """One BT..ET text object, rotating the operator form by run
    index so round-trip tests cover the whole state machine. Runs
    whose text exceeds latin-1 go through the Type0 font /F2 as
    hex strings of 2-byte codes (``cid_of`` assigns them)."""
    s, fx, fy = _fmt(size), _fmt(x), _fmt(y)
    if cid_of and _needs_cid(text):
        hx = "".join(f"{cid_of[ch]:04X}" for ch in text).encode()
        if r % 2 == 0:  # Td + Tj hex show
            return (b"BT /F2 " + s + b" Tf " + fx + b" " + fy
                    + b" Td <" + hx + b"> Tj ET")
        half = (max(1, len(text) // 2)) * 4
        return (b"BT /F2 " + s + b" Tf 1 0 0 1 " + fx + b" " + fy
                + b" Tm [<" + hx[:half] + b"> -120 <" + hx[half:]
                + b">] TJ ET")
    form = r % 4
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


def _tounicode_cmap(cid_of: dict[str, int]) -> bytes:
    """Build a /ToUnicode CMap stream body: codespace, then maximal
    consecutive (code, char) groups — singletons as bfchar entries,
    longer groups alternating between the incremental-destination and
    array-destination bfrange forms so both decode paths are
    exercised."""
    items = sorted((c, ch) for ch, c in cid_of.items())
    groups: list[list[tuple[int, str]]] = []
    for c, ch in items:
        if groups and c == groups[-1][-1][0] + 1 \
                and ord(ch) == ord(groups[-1][-1][1]) + 1:
            groups[-1].append((c, ch))
        else:
            groups.append([(c, ch)])
    singles = [g[0] for g in groups if len(g) == 1]
    ranges = [g for g in groups if len(g) > 1]

    def u16(ch: str) -> bytes:
        return ch.encode("utf-16-be").hex().upper().encode()

    lines = [
        b"/CIDInit /ProcSet findresource begin",
        b"12 dict begin",
        b"begincmap",
        b"/CIDSystemInfo << /Registry (Adobe) /Ordering (UCS) "
        b"/Supplement 0 >> def",
        b"/CMapName /Adobe-Identity-UCS def",
        b"/CMapType 2 def",
        b"1 begincodespacerange",
        b"<0000> <FFFF>",
        b"endcodespacerange",
    ]
    if singles:
        lines.append(b"%d beginbfchar" % len(singles))
        lines += [b"<%04X> <" % c + u16(ch) + b">"
                  for c, ch in singles]
        lines.append(b"endbfchar")
    if ranges:
        lines.append(b"%d beginbfrange" % len(ranges))
        for gi, g in enumerate(ranges):
            lo, hi = g[0][0], g[-1][0]
            if gi % 2 == 0:  # incremental destination
                lines.append(b"<%04X> <%04X> <" % (lo, hi)
                             + u16(g[0][1]) + b">")
            else:  # array destination, one string per code
                arr = b" ".join(b"<" + u16(ch) + b">" for _, ch in g)
                lines.append(b"<%04X> <%04X> [" % (lo, hi) + arr
                             + b"]")
        lines.append(b"endbfrange")
    lines += [b"endcmap",
              b"CMapName currentdict /CMap defineresource pop",
              b"end", b"end"]
    return b"\n".join(lines)


def _encode_text_pdf(pages, compress_content: bool) -> bytes:
    objs: list[bytes] = []

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    def stream_obj(payload: bytes, compress: bool | None = None)\
            -> bytes:
        if compress_content if compress is None else compress:
            payload = zlib.compress(payload)
            return (b"<< /Length %d /Filter /FlateDecode >>\nstream\n"
                    % len(payload) + payload + b"\nendstream")
        return (b"<< /Length %d >>\nstream\n" % len(payload)
                + payload + b"\nendstream")

    add(b"<< /Type /Catalog /Pages 2 0 R >>")
    pages_placeholder = add(b"")  # filled once kid numbers are known
    font_num = add(b"<< /Type /Font /Subtype /Type1 "
                   b"/BaseFont /Helvetica >>")
    # composite-font code assignment: every char of every run whose
    # text exceeds latin-1 gets a sequential 2-byte CID (sorted by
    # codepoint, so consecutive chars form bfrange groups)
    cid_chars = sorted({ch for runs in pages for (t, *_) in runs
                        if _needs_cid(t) for ch in t})
    cid_of = {ch: i + 1 for i, ch in enumerate(cid_chars)}
    font_frag = b"/F1 %d 0 R" % font_num
    if cid_of:
        # ToUnicode always Flate-compressed: the reader's CMap
        # decompression path stays exercised even in uncompressed
        # fixture files
        tu_num = add(stream_obj(_tounicode_cmap(cid_of),
                                compress=True))
        desc_num = add(
            b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont "
            b"/Synth /CIDSystemInfo << /Registry (Adobe) "
            b"/Ordering (Identity) /Supplement 0 >> >>")
        f2_num = add(
            b"<< /Type /Font /Subtype /Type0 /BaseFont /Synth "
            b"/Encoding /Identity-H /DescendantFonts [%d 0 R] "
            b"/ToUnicode %d 0 R >>" % (desc_num, tu_num))
        font_frag += b" /F2 %d 0 R" % f2_num
    page_nums = []
    for p, runs in enumerate(pages):
        dx, dy = (5, 7) if p % 2 else (0, 0)
        body = [_run_ops(r, text, x - dx, y - dy, size, cid_of)
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
            + font_frag + b" >> >> >>"))
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
