"""CCITT Group 4 / T.6 fax codec (kernels/fax.py) + TIFF wiring."""

import numpy as np
import pytest

from paddleocr_spark.kernels.fax import (
    _BLACK_DEC,
    _MODE_DEC,
    _WHITE_DEC,
    g4_decode,
    g4_encode,
)
from paddleocr_spark.kernels.tiff import decode_tiff, encode_tiff


def _prefix_violation(codes):
    for a in codes:
        for b in codes:
            if a != b and b.startswith(a):
                return a, b
    return None


class TestCodeTables:
    def test_white_codes_prefix_free(self):
        assert _prefix_violation(list(_WHITE_DEC)) is None

    def test_black_codes_prefix_free(self):
        assert _prefix_violation(list(_BLACK_DEC)) is None

    def test_mode_codes_prefix_free(self):
        assert _prefix_violation(list(_MODE_DEC)) is None

    def test_wellknown_values(self):
        # widely-published T.4 entries, spot-checked against the spec
        assert _WHITE_DEC["0111"] == 2
        assert _WHITE_DEC["00110101"] == 0
        assert _WHITE_DEC["11011"] == 64
        assert _BLACK_DEC["010"] == 1
        assert _BLACK_DEC["11"] == 2
        assert _BLACK_DEC["0000110111"] == 0
        assert _BLACK_DEC["0000001111"] == 64


class TestG4:
    def test_all_white_row_is_single_v0(self):
        enc = g4_encode(np.zeros((1, 8), bool))
        bits = "".join(map(str, np.unpackbits(
            np.frombuffer(enc, np.uint8))))
        assert bits.startswith("1" + "000000000001" * 2)  # V0 + EOFB

    def test_second_identical_row_is_v0_per_transition(self):
        # row2 == row1: every changing element codes as one V0 bit
        m = np.zeros((2, 32), bool)
        m[:, 8:16] = True
        enc = g4_encode(m)
        dec = g4_decode(enc, 32, 2)
        assert (dec == m).all()

    @pytest.mark.parametrize("seed", range(10))
    def test_random_roundtrip(self, seed):
        rng = np.random.default_rng(seed)
        h = int(rng.integers(1, 50))
        w = int(rng.integers(1, 300))
        density = float(rng.uniform(0.02, 0.98))
        m = rng.random((h, w)) < density
        assert (g4_decode(g4_encode(m), w, h) == m).all()

    def test_structured_text_like_mask(self):
        rng = np.random.default_rng(42)
        m = np.zeros((60, 200), bool)
        for _ in range(12):  # word-ish black boxes
            y = int(rng.integers(0, 55))
            x = int(rng.integers(0, 170))
            m[y:y + int(rng.integers(2, 6)),
              x:x + int(rng.integers(5, 30))] = True
        assert (g4_decode(g4_encode(m), 200, 60) == m).all()

    def test_makeup_chains_past_2560(self):
        m = np.zeros((2, 6000), bool)
        m[0, 10:5900] = True
        m[1, :] = True
        assert (g4_decode(g4_encode(m), 6000, 2) == m).all()

    def test_truncated_stream_raises(self):
        enc = g4_encode(np.ones((4, 40), bool))
        with pytest.raises(ValueError, match="truncated|invalid"):
            g4_decode(enc[:2], 40, 4)


class TestTiffG4:
    def test_roundtrip_multipage(self):
        rng = np.random.default_rng(3)
        p1 = np.where(rng.random((45, 170)) > 0.6, 0, 255) \
            .astype(np.uint8)
        p2 = np.full((30, 64), 255, np.uint8)
        p2[10:20, 10:50] = 0
        pages = decode_tiff(encode_tiff([p1, p2], compression=4))
        assert (pages[0][:, :, 0] == p1).all()
        assert (pages[1][:, :, 0] == p2).all()

    def test_bilevel_tags(self):
        data = encode_tiff([np.full((8, 8), 255, np.uint8)],
                           compression=4)
        # BitsPerSample 1, PhotometricInterpretation 0 in the IFD
        (page,) = decode_tiff(data)
        assert page.shape == (8, 8, 1) and (page == 255).all()

    def test_strip_rows(self):
        # G4 restarts per strip: decode honors RowsPerStrip
        m = np.zeros((10, 20), bool)
        m[4:6, 3:17] = True
        img = np.where(m, 0, 255).astype(np.uint8)
        (page,) = decode_tiff(encode_tiff([img], compression=4))
        assert (page[:, :, 0] == img).all()

    def test_rgb_pages_rejected(self):
        with pytest.raises(ValueError, match="single-channel"):
            encode_tiff([np.zeros((4, 4, 3), np.uint8)], compression=4)


class TestPdfCcitt:
    """/CCITTFaxDecode image XObjects (ISO 32000-1 §7.4.6)."""

    def _page(self):
        p = np.full((30, 40, 3), 255, np.uint8)
        p[5:15, 10:30] = 0
        return p

    def test_roundtrip(self):
        from paddleocr_spark.kernels.pdf import (
            decode_pdf_pages,
            encode_pdf,
        )
        page = self._page()
        (out,) = decode_pdf_pages(
            encode_pdf([page], image_filter="CCITTFaxDecode"))
        assert (out == page).all()

    def test_blackis1_and_decode_flip(self):
        from paddleocr_spark.kernels.pdf import (
            decode_pdf_pages,
            encode_pdf,
        )
        page = self._page()
        data = encode_pdf([page], image_filter="CCITTFaxDecode")
        # flip BlackIs1 on: samples invert, rendering inverts
        flipped = data.replace(b"/K -1", b"/K -1 /BlackIs1 true")
        (out,) = decode_pdf_pages(flipped)
        assert (out == 255 - page).all()
        # /Decode [1 0] inverts back
        both = flipped.replace(b"/ColorSpace /DeviceGray",
                               b"/ColorSpace /DeviceGray /Decode [1 0]")
        (out2,) = decode_pdf_pages(both)
        assert (out2 == page).all()

    def test_g3_raises(self):
        from paddleocr_spark.kernels.pdf import (
            decode_pdf_pages,
            encode_pdf,
        )
        data = encode_pdf([self._page()],
                          image_filter="CCITTFaxDecode")
        g3 = data.replace(b"/K -1", b"/K 0")
        with pytest.raises(ValueError, match="Group 3"):
            decode_pdf_pages(g3)
