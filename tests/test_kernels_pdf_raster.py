"""Vector-content PDF rasterizer (kernels/pdf_raster.py): the third
PDF shape (paths/images, no full-page scan, no extractable text), the
reference covers via fitz rasterization at 2x."""

import numpy as np
import pytest

from paddleocr_spark.kernels.pdf_raster import (
    encode_vector_pdf,
    rasterize_pdf_pages,
)


def _one(content, box, scale=1.0, **kw):
    (pg,) = rasterize_pdf_pages(
        encode_vector_pdf([content], [box], **kw), scale=scale)
    return pg


def test_rect_fill_exact_coverage_and_2x_scale():
    c1 = b"0.5 0.5 0.5 rg 0 0 40 30 re f"
    c2 = b"0 0 0 rg 10 5 20 10 re f"
    pages = rasterize_pdf_pages(
        encode_vector_pdf([c1, c2], [(40, 30), (40, 30)]), scale=2.0)
    assert [p.shape for p in pages] == [(60, 80, 3)] * 2
    assert np.unique(pages[0]).tolist() == [128]  # 0.5*255 rounded
    assert (pages[1] == 0).all(axis=2).sum() == 20 * 10 * 4


def test_winding_rules_nonzero_vs_evenodd():
    """Two nested same-direction rects: even-odd leaves the inner hole,
    nonzero fills it."""
    c = b"0 0 0 rg 0 0 20 20 re 5 5 10 10 re "
    eo = _one(c + b"f*", (20, 20))
    nz = _one(c + b"f", (20, 20))
    assert (eo == 0).all(axis=2).sum() == 400 - 100
    assert (nz == 0).all(axis=2).sum() == 400


def test_clip_restricts_fill_and_restores_on_Q():
    c = (b"q 0 0 10 20 re W n 0 0 0 rg 0 0 20 20 re f Q "
         b"1 0 0 rg 15 0 5 5 re f")
    pg = _one(c, (20, 20))
    assert (pg == 0).all(axis=2).sum() == 200  # clipped to left half
    # after Q the clip is gone: the red rect lands outside it
    red = (pg[:, :, 2] == 255) & (pg[:, :, 0] == 0)
    assert red.sum() == 25


def test_stroke_quad_and_line_width():
    pg = _one(b"2 w 0 0 1 RG 2 10 m 18 10 l S", (20, 20))
    blue = (pg[:, :, 0] == 255) & (pg[:, :, 2] == 0)
    assert blue.sum() == 16 * 2


def test_bezier_flattening_covers_curve():
    """A filled 'bulge' built from a cubic: coverage must lie between
    the chord triangle and the bounding box."""
    c = b"0 0 0 rg 0 0 m 0 20 0 20 40 0 c h f"
    pg = _one(c, (40, 20))
    black = (pg == 0).all(axis=2).sum()
    assert 180 < black < 420  # well-formed bulge, not chord/box


def test_cmyk_and_gray_operators():
    pg = _one(b"1 0 0 0 k 0 0 10 10 re f", (10, 10))
    # pure cyan -> (0, 255, 255) minus nothing; BGR order
    assert tuple(pg[5, 5]) == (255, 255, 0)
    pg2 = _one(b"0.25 g 0 0 10 10 re f", (10, 10))
    assert np.unique(pg2).tolist() == [64]


def test_image_xobject_placement_and_clip():
    img = np.zeros((4, 4, 3), np.uint8)
    img[:, :, 2] = 200  # red in BGR
    c = b"q 8 0 0 8 4 4 cm /Im0 Do Q"
    pg = _one(c, (16, 16), images={"Im0": img})
    assert (pg[:, :, 2] == 200).sum() == 64
    # same placement under a clip that halves it
    c2 = b"4 4 4 8 re W n q 8 0 0 8 4 4 cm /Im0 Do Q"
    pg2 = _one(c2, (16, 16), images={"Im0": img})
    assert (pg2[:, :, 2] == 200).sum() == 32


def test_text_operators_are_ignored_not_fatal():
    c = (b"BT /F1 12 Tf 5 5 Td (hello) Tj ET "
         b"0 0 0 rg 0 0 4 4 re f")
    pg = _one(c, (10, 10))
    assert (pg == 0).all(axis=2).sum() == 16


def test_inline_image_and_shading_raise():
    with pytest.raises(ValueError, match="BI"):
        _one(b"BI /W 1 /H 1 ID x EI", (10, 10))
    with pytest.raises(ValueError, match="shading"):
        _one(b"/Sh0 sh", (10, 10))


def test_decode_pdf_pages_falls_back_to_rasterizer():
    """kernels/pdf.py routes image-less pages through the rasterizer
    at 2x — the check_and_read integration point."""
    from paddleocr_spark.kernels.pdf import decode_pdf_pages

    data = encode_vector_pdf(
        [b"0.2 0.4 0.6 rg 0 0 30 20 re f"], [(30, 20)])
    (pg,) = decode_pdf_pages(data)
    assert pg.shape == (40, 60, 3)
    # BGR of (0.2, 0.4, 0.6)*255 rounded
    assert tuple(pg[10, 10]) == (153, 102, 51)
