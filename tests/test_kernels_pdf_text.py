"""Text-PDF extractor (kernels/pdf_text.py): content-stream
tokenizer, the §9.4 text-object state machine, CTM handling, the
writer twin's operator rotation, and the reading-order assembly."""

import zlib

import pytest

from paddleocr_spark.kernels.pdf_text import (
    _encode_text_pdf,
    _literal_string,
    _runs_of_stream,
    _tokenize,
    encode_text_pdf,
    extract_pdf_text,
    page_text,
)

PAGES = [
    [("alpha one", 36.0, 720.0, 10.0),
     ("bravo(x) two", 46.0, 704.0, 12.0)],
    [("back\\slash", 38.0, 716.0, 8.0), ("delta d", 48.0, 700.0, 10.0),
     ("echo e", 58.0, 684.0, 12.0), ("fox f", 68.0, 668.0, 8.0)],
    [],
]


def _assert_runs_equal(exp_pages, got_pages):
    assert len(exp_pages) == len(got_pages)
    for exp, got in zip(exp_pages, got_pages):
        assert len(exp) == len(got), (exp, got)
        for (et, ex, ey, es), (gt, gx, gy, gs) in zip(exp, got):
            assert et == gt
            assert gx == pytest.approx(ex, abs=1e-9)
            assert gy == pytest.approx(ey, abs=1e-9)
            assert gs == pytest.approx(es, abs=1e-9)


@pytest.mark.parametrize("compress", [False, True])
def test_roundtrip_all_operator_forms(compress):
    """The writer rotates Td+Tj / Tm+TJ / TL+T* / TD+' and wraps odd
    pages in a translated cm — all four forms and the CTM must
    reconstruct the exact input runs."""
    data = _encode_text_pdf(PAGES, compress_content=compress)
    _assert_runs_equal(PAGES, extract_pdf_text(data))


def test_contents_array_page():
    """PAGES[1] has 4 runs → the writer splits it across a
    two-element /Contents array; runs must come back seamless."""
    data = encode_text_pdf(PAGES)
    assert b"/Contents [" in data
    _assert_runs_equal(PAGES, extract_pdf_text(data))


def test_escapes_and_octal():
    """Literal-string escape set: named escapes, octal, nested
    parens, line continuation (§7.3.4.2)."""
    s, end = _literal_string(b"(a\\(b\\)c\\\\d\\101\\12e)", 0)
    # \101 is octal 65 = 'A'; \12 is octal 10 = LF
    assert s == b"a(b)c\\dA\ne"
    # nested unescaped parens
    s, _ = _literal_string(b"(a (b) c)", 0)
    assert s == b"a (b) c"
    # backslash-newline is a line continuation (no output byte)
    s, _ = _literal_string(b"(a\\\nb)", 0)
    assert s == b"ab"


def test_hex_string_and_comment():
    toks = list(_tokenize(b"% comment\nBT <48656C6C6F> Tj ET"))
    assert ("str", b"Hello") in toks


def test_tj_kerning_never_splits_run():
    runs = _runs_of_stream(
        b"BT /F1 10 Tf 10 20 Td [(he) -120 (llo)] TJ ET")
    assert runs == [("hello", 10.0, 20.0, 10.0)]


def test_ctm_scale_scales_font_size():
    """A 2x cm scale doubles the effective size and positions."""
    runs = _runs_of_stream(
        b"q 2 0 0 2 0 0 cm BT /F1 10 Tf 10 20 Td (s) Tj ET Q")
    assert runs == [("s", 20.0, 40.0, 20.0)]


def test_q_restores_ctm():
    runs = _runs_of_stream(
        b"q 1 0 0 1 100 0 cm Q BT /F1 10 Tf 10 20 Td (s) Tj ET")
    assert runs == [("s", 10.0, 20.0, 10.0)]


def test_td_updates_line_matrix_not_origin():
    """Consecutive Td are relative to the LINE matrix."""
    runs = _runs_of_stream(
        b"BT /F1 10 Tf 10 700 Td (a) Tj 0 -16 Td (b) Tj ET")
    assert [(r[0], r[2]) for r in runs] == [("a", 700.0), ("b", 684.0)]


def test_show_outside_bt_ignored():
    assert _runs_of_stream(b"(stray) Tj") == []


def test_image_pdf_yields_empty_text_pages():
    """An image-based PDF is valid input with no text runs — the two
    PDF shapes split cleanly between the two kernels."""
    import numpy as np

    from paddleocr_spark.kernels.pdf import encode_pdf

    data = encode_pdf([np.full((8, 10, 3), 7, np.uint8)],
                      image_filter="FlateDecode")
    assert extract_pdf_text(data) == [[]]


def test_unsupported_content_filter_raises():
    data = encode_text_pdf([[("t", 10.0, 20.0, 8.0)]])
    bad = data.replace(b"<< /Length", b"<< /Filter /LZWDecode /Length")
    with pytest.raises(ValueError, match="content-stream filter"):
        extract_pdf_text(bad)


def test_page_text_reading_order():
    """Lines grouped top-down by y tolerance, left-to-right within a
    line."""
    runs = [("right", 100.0, 699.5, 10.0), ("top", 36.0, 720.0, 10.0),
            ("left", 36.0, 700.0, 10.0)]
    assert page_text(runs) == "top\nleft right"
    assert page_text([]) == ""


def test_store_spec_matches_extraction():
    """The fixture store's analytic TEXT_RUN_SPEC is exactly what the
    extractor reads back from the files on disk — the same equality
    the DuckDB oracle checks through Spark."""
    from paddleocr_spark.sources.pdf_text_store import (
        TEXT_RUN_SPEC,
        ensure_pdf_text_store,
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as root:
        store = ensure_pdf_text_store(root)
        got = []
        for name in sorted(os.listdir(store)):
            if not name.endswith(".pdf"):
                continue
            with open(os.path.join(store, name), "rb") as fh:
                pages = extract_pdf_text(fh.read())
            for p, runs in enumerate(pages):
                for r, (text, x, y, size) in enumerate(runs):
                    got.append((name, p, r, text, x, y, size))
    assert sorted(got) == sorted(TEXT_RUN_SPEC)


def test_nested_bdc_dict_skipped():
    """Depth-aware << >> skip: a nested marked-content property dict
    must not truncate the skip and scramble the token stream."""
    runs = _runs_of_stream(
        b"/OC << /A << /B 1 >> /C 2 >> BDC "
        b"BT /F1 10 Tf 10 20 Td (s) Tj ET EMC")
    assert runs == [("s", 10.0, 20.0, 10.0)]


def test_inline_image_raises():
    with pytest.raises(ValueError, match="inline images"):
        _runs_of_stream(b"BI /W 1 /H 1 ID \x00 EI")


def test_utf16be_bom_strings():
    """Hex strings with a UTF-16BE BOM (§7.9.2.2) decode as UTF-16 —
    the common generator encoding for non-Latin text."""
    hx = (b"\xfe\xff" + "héllo 中".encode("utf-16-be")).hex().encode()
    runs = _runs_of_stream(
        b"BT /F1 10 Tf 10 20 Td <" + hx + b"> Tj ET")
    assert runs == [("héllo 中", 10.0, 20.0, 10.0)]


def test_type0_cid_font_roundtrip_mixed():
    """CJK + ASCII strings route through the Type0/Identity-H font:
    2-byte codes via the Flate-compressed ToUnicode CMap (bfchar and
    BOTH bfrange destination forms), Td+Tj hex and Tm+TJ split-hex
    operator forms."""
    from paddleocr_spark.kernels.pdf_text import (
        _encode_text_pdf,
        extract_pdf_text,
    )

    pages = [
        [("汉字测试 f0", 36.0, 720.0, 10.0),
         ("中文(括号) mixed", 40.0, 700.0, 12.0)],
        [("日本語テキスト", 38.0, 716.0, 14.0),
         ("pure latin survives", 36.0, 700.0, 10.0)],
    ]
    for compress in (False, True):
        got = extract_pdf_text(_encode_text_pdf(pages, compress))
        assert got == [[tuple(r) for r in p] for p in pages], compress


def test_q_restores_text_state():
    """§8.4.1: text state (font, size, leading) is graphics state —
    a Tf/TL inside q..Q must not leak past the Q."""
    from paddleocr_spark.kernels.pdf_text import _runs_of_stream

    stream = (b"BT /F1 10 Tf 14 TL 36 720 Td (outer) Tj ET "
              b"q BT /F1 24 Tf 50 TL 36 600 Td (inner) Tj ET Q "
              b"BT 36 500 Td (after) Tj ET")
    runs = _runs_of_stream(stream)
    assert [(r[0], r[3]) for r in runs] == [
        ("outer", 10.0), ("inner", 24.0), ("after", 10.0)]


def test_encrypted_pdf_explicit_error():
    from paddleocr_spark.kernels.pdf_text import (
        _encode_text_pdf,
        extract_pdf_text,
    )

    data = _encode_text_pdf([[("x", 36.0, 720.0, 10.0)]], False)
    patched = data.replace(b"/Root 1 0 R",
                           b"/Root 1 0 R /Encrypt 9 0 R")
    with pytest.raises(ValueError, match="encrypted"):
        extract_pdf_text(patched)


def test_dict_skip_is_string_aware():
    """A BDC property list whose string values contain ')' escapes or
    '>>' must not corrupt the dict skip (tokenizer depth counting
    delegates to the string parsers)."""
    from paddleocr_spark.kernels.pdf_text import _runs_of_stream

    stream = (b"/OC << /Name (tricky \\) paren >> inside) "
              b"/Alt <3e3e> >> BDC "
              b"BT /F1 10 Tf 36 720 Td (visible) Tj ET EMC")
    runs = _runs_of_stream(stream)
    assert [r[0] for r in runs] == ["visible"]


def test_type0_without_tounicode_yields_gaps():
    """A composite font with no /ToUnicode cannot be decoded — codes
    surface as U+FFFD, never as latin-1 mojibake."""
    from paddleocr_spark.kernels.pdf_text import (
        _encode_text_pdf,
        extract_pdf_text,
    )

    data = _encode_text_pdf([[("汉字", 36.0, 720.0, 10.0)]], False)
    patched = data.replace(b"/ToUnicode", b"/ToUnicodf")
    (page,) = extract_pdf_text(patched)
    assert page[0][0] == "��"
    assert page[0][1:] == (36.0, 720.0, 10.0)
