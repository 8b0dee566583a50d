"""Baseline-JPEG codec kernels (kernels/jpeg.py).

The encoder and decoder are independent implementations of the wire
format (canonical-Huffman build vs decode, forward vs inverse DCT,
RGB→YCbCr vs YCbCr→RGB), so round trips are an interop check on
T.81 baseline, not a shared-helper tautology. Cross-validation against
libjpeg is impossible in this container (no cv2/PIL); tolerance bounds
below reflect DCT coefficient rounding only.
"""

import numpy as np
import pytest

from paddleocr_spark.kernels.jpeg import decode_jpeg, encode_jpeg


def _maxdiff(a, b):
    return int(np.abs(a.astype(int) - b.astype(int)).max())


def test_444_near_lossless_on_noise():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quant=1))
    assert dec.shape == img.shape
    # quant=1 leaves only DCT-coefficient rounding (±0.5 per coef)
    assert _maxdiff(dec, img) <= 3


def test_non_multiple_of_8_dims_and_gradient():
    img = np.zeros((41, 67, 3), np.uint8)
    yy, xx = np.mgrid[0:41, 0:67]
    img[:, :, 0] = (yy * 3) % 256
    img[:, :, 1] = (xx * 2) % 256
    img[:, :, 2] = ((yy + xx) * 2) % 256
    dec = decode_jpeg(encode_jpeg(img, quant=1))
    assert dec.shape == (41, 67, 3)
    assert _maxdiff(dec, img) <= 3


def test_grayscale_expands_to_bgr():
    rng = np.random.default_rng(2)
    g = rng.integers(0, 256, (24, 33), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(g, quant=1))
    assert dec.shape == (24, 33, 3)
    assert np.array_equal(dec[:, :, 0], dec[:, :, 1])
    assert np.array_equal(dec[:, :, 0], dec[:, :, 2])
    assert _maxdiff(dec[:, :, 0], g) <= 2


def test_420_subsampling_flat_chroma_exact():
    """Constant chroma survives 4:2:0 downsample+replicate exactly."""
    img = np.zeros((30, 50, 3), np.uint8)
    img[:] = (90, 140, 200)
    dec = decode_jpeg(encode_jpeg(img, quant=1, subsampling="420"))
    assert _maxdiff(dec, img) == 0


def test_420_mcu_geometry():
    """4:2:0 MCUs are 16x16; odd dims exercise padding + crop."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (19, 21, 3), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quant=4, subsampling="420"))
    assert dec.shape == (19, 21, 3)
    # luma is full-resolution: recoverable to quantization error
    y_src = (0.299 * img[:, :, 2] + 0.587 * img[:, :, 1]
             + 0.114 * img[:, :, 0])
    y_dec = (0.299 * dec[:, :, 2] + 0.587 * dec[:, :, 1]
             + 0.114 * dec[:, :, 0])
    assert np.abs(y_src - y_dec).mean() < 6.0


def test_restart_markers_resync():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
    plain = decode_jpeg(encode_jpeg(img, quant=1))
    with_rst = decode_jpeg(encode_jpeg(img, quant=1, restart_interval=3))
    assert np.array_equal(plain, with_rst)
    assert _maxdiff(with_rst, img) <= 3


def test_quantization_actually_compresses():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    small = len(encode_jpeg(img, quant=32))
    big = len(encode_jpeg(img, quant=1))
    assert small < big * 0.6


def test_rejects_non_baseline_and_garbage():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG not a jpeg")
    # arithmetic coding: patch a valid stream's SOF0 marker to SOF9
    img = np.zeros((8, 8, 3), np.uint8)
    enc = bytearray(encode_jpeg(img))
    idx = enc.find(b"\xff\xc0")
    enc[idx + 1] = 0xC9
    with pytest.raises(ValueError, match="SOF0"):
        decode_jpeg(bytes(enc))


def test_imgcodec_dispatch():
    from paddleocr_spark.kernels.imgcodec import decode_image, sniff_format

    img = np.full((16, 16, 3), 127, np.uint8)
    enc = encode_jpeg(img, quant=1)
    assert sniff_format(enc) == "jpeg"
    assert _maxdiff(decode_image(enc), img) <= 2


def test_422_subsampling_flat_chroma_exact():
    """4:2:2 (horizontal-only chroma downsample — the scanner default)
    decodes through the generic h/v MCU walk; constant chroma survives
    exactly."""
    img = np.zeros((30, 50, 3), np.uint8)
    img[:] = (90, 140, 200)
    dec = decode_jpeg(encode_jpeg(img, quant=1, subsampling="422"))
    assert _maxdiff(dec, img) == 0


def test_422_mcu_geometry():
    """4:2:2 MCUs are 16x8; odd dims exercise padding + crop, and the
    full-resolution luma stays recoverable."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (19, 21, 3), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quant=4, subsampling="422"))
    assert dec.shape == (19, 21, 3)
    y_src = (0.299 * img[:, :, 2] + 0.587 * img[:, :, 1]
             + 0.114 * img[:, :, 0])
    y_dec = (0.299 * dec[:, :, 2] + 0.587 * dec[:, :, 1]
             + 0.114 * dec[:, :, 0])
    assert np.abs(y_src - y_dec).mean() < 6.0
    # chroma is horizontally halved only: vertical chroma detail must
    # survive better than under 4:2:0 on a vertical-gradient image
    grad = np.zeros((32, 32, 3), np.uint8)
    grad[:16] = (200, 60, 60)
    grad[16:] = (60, 200, 60)
    d422 = decode_jpeg(encode_jpeg(grad, quant=1, subsampling="422"))
    d420 = decode_jpeg(encode_jpeg(grad, quant=1, subsampling="420"))
    assert _maxdiff(d422, grad) <= _maxdiff(d420, grad)


def test_partial_scan_coverage_raises():
    """A file whose scans don't cover every frame component (here: the
    interleaved SOS rewritten to cover only luma) must raise, never
    mis-color the two never-scanned chroma planes."""
    import struct

    import numpy as np
    import pytest

    from paddleocr_spark.kernels.jpeg import decode_jpeg, encode_jpeg

    data = encode_jpeg(np.full((16, 16, 3), 128, dtype=np.uint8))
    i = data.find(b"\xff\xda")
    assert i > 0
    (seg_len,) = struct.unpack(">H", data[i + 2:i + 4])
    old = data[i + 4:i + 2 + seg_len]
    ns = old[0]
    assert ns == 3
    # rewrite SOS to cover only the first component
    new_payload = bytes([1]) + old[1:3] + old[1 + 2 * ns:]
    patched = (data[:i + 2]
               + struct.pack(">H", len(new_payload) + 2)
               + new_payload
               + data[i + 2 + seg_len:])
    with pytest.raises(ValueError, match="no scan"):
        decode_jpeg(patched)


def test_multiscan_baseline_non_interleaved_decodes():
    """T.81 allows sequential files with one scan per component
    (non-interleaved block-raster order). Build one from the encoder's
    primitives — three separate SOS segments — and check it decodes
    pixel-identical to the interleaved encoding of the same image."""
    import struct

    import numpy as np

    from paddleocr_spark.kernels.jpeg import (
        _BitWriter,
        _encode_block,
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (21, 27, 3), dtype=np.uint8)
    inter = encode_jpeg(img, quant=1)  # 4:4:4 interleaved twin
    # headers up to (not including) the SOS
    i = inter.find(b"\xff\xda")
    head = inter[:i]

    # recompute the per-component quantized blocks exactly as the
    # encoder does (4:4:4, quant=1)
    b, g, r = (img[:, :, k].astype(np.float64) for k in range(3))
    planes = [0.299 * r + 0.587 * g + 0.114 * b,
              -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
              0.5 * r - 0.418688 * g - 0.081312 * b + 128.0]
    from paddleocr_spark.kernels.jpeg import _DCT, ZIGZAG

    h, w = img.shape[:2]
    ny, nx = -(-h // 8), -(-w // 8)
    out = bytearray(head)
    for cid, p in enumerate(planes, start=1):
        p = np.pad(p - 128.0, ((0, ny * 8 - h), (0, nx * 8 - w)),
                   mode="edge")
        blocks = (p.reshape(ny, 8, nx, 8).transpose(0, 2, 1, 3)
                  .reshape(-1, 8, 8))
        coefs = np.einsum("ik,nkl,jl->nij", _DCT, blocks, _DCT)
        q = np.round(coefs).astype(np.int64).reshape(-1, 64)[:, ZIGZAG]
        wtr = _BitWriter()
        pred = 0
        for blk in q:
            pred = _encode_block(wtr, blk, pred)
        wtr.flush()
        sos = bytes([1, cid, 0x00, 0, 63, 0])
        out.extend(b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos)
        out.extend(wtr.out)
    out.extend(b"\xff\xd9")
    assert np.array_equal(decode_jpeg(bytes(out)), decode_jpeg(inter))


def _prog_pair(img, **kw):
    base = decode_jpeg(encode_jpeg(img, **kw))
    prog = decode_jpeg(encode_jpeg(img, progressive=True, **kw))
    return base, prog


def test_progressive_color_decodes_bit_equal_to_baseline():
    """The progressive scan script (DC first Al=1, split-band AC first,
    DC+AC refinement to Al=0) reconstructs the identical coefficients,
    so pixels match the baseline twin exactly."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (37, 29, 3), dtype=np.uint8)
    enc = encode_jpeg(img, quant=1, progressive=True)
    assert b"\xff\xc2" in enc  # SOF2
    assert enc.count(b"\xff\xda") == 10  # 2 DC + 4+4 split-band AC
    base, prog = _prog_pair(img, quant=1)
    assert np.array_equal(base, prog)


def test_progressive_subsampled_and_gray():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (33, 41, 3), dtype=np.uint8)
    for sub in ("420", "422"):
        base, prog = _prog_pair(img, quant=2, subsampling=sub)
        assert np.array_equal(base, prog), sub
    gray = rng.integers(0, 256, (19, 26), dtype=np.uint8)
    base, prog = _prog_pair(gray, quant=1)
    assert np.array_equal(base, prog)


def test_progressive_eob_runs_and_corrections():
    """A mostly-flat image with sparse detail produces long EOB runs in
    the AC-first scans and carried correction bits in the refinement
    scans; quant=3 forces magnitude->1 coefficients that exercise the
    newly-nonzero-in-refinement path."""
    img = np.full((64, 80, 3), 100, np.uint8)
    img[10:13, 10:13] = 250
    img[50, 70] = 0
    img[30:32, 40:60] = (30, 200, 90)
    for quant in (1, 3):
        base, prog = _prog_pair(img, quant=quant)
        assert np.array_equal(base, prog), quant


def test_grayscale_sampling_factors_decode_non_interleaved():
    """T.81 A.2: a single-component scan is non-interleaved, so the
    declared sampling factors don't change the data-unit order.
    Grayscale files commonly carry hv=0x22 (libjpeg's default); the
    entropy stream is identical to the 1x1 case, so patching the SOF
    sampling byte must not change the decoded pixels."""
    rng = np.random.default_rng(77)
    img = rng.integers(0, 256, (24, 40), dtype=np.uint8)
    data = bytearray(encode_jpeg(img, quant=1))
    sof = bytes(data).index(b"\xff\xc0")
    hv_off = sof + 11  # FFC0 len(2) prec(1) h(2) w(2) nc(1) cid(1) -> hv
    assert data[hv_off] == 0x11
    base = decode_jpeg(bytes(data))
    data[hv_off] = 0x22
    patched = decode_jpeg(bytes(data))
    assert np.array_equal(patched, base)


def test_fill_bytes_before_markers_are_skipped():
    """T.81 B.1.1.2: markers may be preceded by any number of 0xFF
    fill bytes; treating a fill byte as the marker reads a garbage
    segment length and rejects a valid file."""
    rng = np.random.default_rng(78)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    data = encode_jpeg(img, quant=1)
    base = decode_jpeg(data)
    dqt = data.index(b"\xff\xdb")
    padded = data[:dqt] + b"\xff\xff\xff" + data[dqt:]
    assert np.array_equal(decode_jpeg(padded), base)
