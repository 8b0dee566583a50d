"""Pure-NumPy image-preprocessing kernels.

Re-creations of the reference's cv2-backed preprocessing (the
inference transforms that sit between decode and the det/rec heads):

- ``det_resize_for_test``  — ``DetResizeForTest``
  (``toddleocr/transforms/operators.py:185-312``): the three resize
  modes (limit_side_len min/max/resize_long, fixed image_shape with
  optional keep_ratio, resize_long-to-/128), /32 snapping, and the
  ``shape = [src_h, src_w, ratio_h, ratio_w]`` record the DB
  post-process consumes.
- ``resize_norm_img``      — ``toddleocr/utils/utility.py:195-213``:
  height-normalized keep-ratio resize, (x/255 - 0.5)/0.5, CHW, pad to
  the batch's max wh-ratio width.
- ``binarize_img`` / ``alpha_to_color`` —
  ``toddleocr/utils/utility.py:70-90``: the engine's optional input
  normalizations (``engine.py:371-375``) — Otsu black/white
  binarization (between-class-variance threshold over the 256-bin
  histogram, exactly what cv2.THRESH_OTSU computes) and BGRA→BGR
  compositing over a solid background.
- ``get_rotate_crop_image`` / ``get_minarea_rect_crop`` —
  ``toddleocr/utils/init_args.py:187-253``: perspective rectification
  of a quad crop (with the h/w ≥ 1.5 rot90) and the minAreaRect corner
  re-ordering variant.

cv2's resize/warp use fixed-point bilinear (and INTER_CUBIC for the
perspective crop); these kernels use float bilinear, so pixel values
can differ in low bits under interpolation while all the *geometry* —
output sizes, ratios, corner ordering, rotation branches, constant
regions — is exact. Tests assert the geometry analytically, including
on rotated rectangles.
"""

from __future__ import annotations

import math

import numpy as np

from .geometry import min_area_rect

__all__ = [
    "bilinear_resize",
    "det_resize_for_test",
    "resize_norm_img",
    "perspective_transform",
    "warp_perspective",
    "get_rotate_crop_image",
    "get_minarea_rect_crop",
    "bgr_to_gray",
    "otsu_threshold",
    "binarize_img",
    "alpha_to_color",
]


def bilinear_resize(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """cv2.resize(INTER_LINEAR) analogue: half-pixel-centered bilinear
    sampling with edge clamp. img (H, W[, C])."""
    h, w = img.shape[:2]
    if out_h == h and out_w == w:
        return img.astype(np.float64).copy()
    sx = w / out_w
    sy = h / out_h
    fx = np.clip((np.arange(out_w) + 0.5) * sx - 0.5, 0, w - 1)
    fy = np.clip((np.arange(out_h) + 0.5) * sy - 0.5, 0, h - 1)
    x0 = np.floor(fx).astype(np.int64)
    y0 = np.floor(fy).astype(np.int64)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    wx = (fx - x0)[None, :]
    wy = (fy - y0)[:, None]
    im = img.astype(np.float64)
    if im.ndim == 2:
        a = im[y0][:, x0] * (1 - wx) * (1 - wy)
        b = im[y0][:, x1] * wx * (1 - wy)
        c = im[y1][:, x0] * (1 - wx) * wy
        d = im[y1][:, x1] * wx * wy
        return a + b + c + d
    wxc = wx[..., None]
    wyc = wy[..., None]
    a = im[y0][:, x0] * (1 - wxc) * (1 - wyc)
    b = im[y0][:, x1] * wxc * (1 - wyc)
    c = im[y1][:, x0] * (1 - wxc) * wyc
    d = im[y1][:, x1] * wxc * wyc
    return a + b + c + d


def _pad_small(img: np.ndarray, value: int = 0) -> np.ndarray:
    """``image_padding`` (operators.py:223-227): pad images with
    h + w < 64 up to at least 32x32."""
    h, w = img.shape[:2]
    shape = (max(32, h), max(32, w)) + img.shape[2:]
    out = np.zeros(shape, dtype=img.dtype) + value
    out[:h, :w] = img
    return out


def det_resize_for_test(img: np.ndarray, limit_side_len: int = 736,
                        limit_type: str = "min",
                        image_shape=None, keep_ratio: bool = False,
                        resize_long: int | None = None):
    """→ (resized_img, shape=[src_h, src_w, ratio_h, ratio_w]).

    Mode precedence mirrors DetResizeForTest.__init__: image_shape →
    type 1; resize_long → type 2; else type 0 with limit_side_len +
    limit_type (default 736/min)."""
    src_h, src_w = img.shape[:2]
    if src_h + src_w < 64:
        img = _pad_small(img)
    h, w = img.shape[:2]

    if image_shape is not None:  # type 1
        resize_h, resize_w = image_shape
        if keep_ratio:
            resize_w = w * resize_h / h
            resize_w = math.ceil(resize_w / 32) * 32
        ratio_h = float(resize_h) / h
        ratio_w = float(resize_w) / w
        out = bilinear_resize(img, int(resize_w), int(resize_h))
        return out, [float(src_h), float(src_w), ratio_h, ratio_w]

    if resize_long is not None:  # type 2
        ratio = float(resize_long) / max(h, w)
        resize_h = int(h * ratio)
        resize_w = int(w * ratio)
        max_stride = 128
        resize_h = (resize_h + max_stride - 1) // max_stride * max_stride
        resize_w = (resize_w + max_stride - 1) // max_stride * max_stride
        out = bilinear_resize(img, resize_w, resize_h)
        return out, [float(src_h), float(src_w),
                     resize_h / float(h), resize_w / float(w)]

    # type 0
    if limit_type == "max":
        ratio = float(limit_side_len) / max(h, w) \
            if max(h, w) > limit_side_len else 1.0
    elif limit_type == "min":
        ratio = float(limit_side_len) / min(h, w) \
            if min(h, w) < limit_side_len else 1.0
    elif limit_type == "resize_long":
        ratio = float(limit_side_len) / max(h, w)
    else:
        raise ValueError(f"unsupported limit_type {limit_type!r}")
    resize_h = max(int(round(int(h * ratio) / 32) * 32), 32)
    resize_w = max(int(round(int(w * ratio) / 32) * 32), 32)
    out = bilinear_resize(img, resize_w, resize_h)
    return out, [float(src_h), float(src_w),
                 resize_h / float(h), resize_w / float(w)]


def resize_norm_img(img: np.ndarray, max_wh_ratio: float,
                    rec_image_shape=(3, 48, 320)) -> np.ndarray:
    """Rec/cls input normalization: keep-ratio resize to height imgH,
    (x/255 - 0.5)/0.5, CHW, zero-pad width to imgH*max_wh_ratio."""
    img_c, img_h, img_w = rec_image_shape
    assert img.ndim == 3 and img.shape[2] == img_c
    img_w = int(img_h * max_wh_ratio)
    h, w = img.shape[:2]
    ratio = w / float(h)
    if math.ceil(img_h * ratio) > img_w:
        resized_w = img_w
    else:
        resized_w = int(math.ceil(img_h * ratio))
    resized = bilinear_resize(img, resized_w, img_h)
    resized = resized.astype(np.float32).transpose((2, 0, 1)) / 255
    resized -= 0.5
    resized /= 0.5
    padded = np.zeros((img_c, img_h, img_w), dtype=np.float32)
    padded[:, :, 0:resized_w] = resized
    return padded


def resize_table_image(img: np.ndarray, max_len: int = 488
                       ) -> tuple[np.ndarray, list[float]]:
    """Table-recognition input resize — ``ResizeTableImage``
    (``toddleocr/transforms/custom/table_ops.py:164-184``): scale so
    the LONG side equals ``max_len`` (ratio = max_len / max(h, w),
    sizes truncated like the reference's int()), returning the
    resized image and the reference's shape record
    [src_h, src_w, ratio, ratio]."""
    h, w = img.shape[:2]
    ratio = max_len / (max(h, w) * 1.0)
    resize_h, resize_w = int(h * ratio), int(w * ratio)
    out = bilinear_resize(img, resize_w, resize_h)
    return out, [float(h), float(w), ratio, ratio]


def padding_table_image(img: np.ndarray, size=(488, 488),
                        shape: list[float] | None = None
                        ) -> tuple[np.ndarray, list[float]]:
    """``PaddingTableImage`` (``table_ops.py:187-200``): zero-pad the
    resized table image into the top-left of a (pad_h, pad_w, 3)
    float32 canvas and extend the shape record with [pad_h, pad_w]."""
    pad_h, pad_w = size
    out = np.zeros((pad_h, pad_w, 3), dtype=np.float32)
    h, w = img.shape[:2]
    out[:h, :w, :] = img
    return out, (list(shape) if shape else []) + [float(pad_h),
                                                  float(pad_w)]


def perspective_transform(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """3x3 homography H with H @ [x, y, 1]ᵀ ∝ [x', y', 1]ᵀ for the 4
    correspondences (cv2.getPerspectiveTransform analogue; 8x8 solve
    with h33 = 1)."""
    src = np.asarray(src, dtype=np.float64)
    dst = np.asarray(dst, dtype=np.float64)
    a = np.zeros((8, 8))
    b = np.zeros(8)
    for i in range(4):
        x, y = src[i]
        u, v = dst[i]
        a[2 * i] = [x, y, 1, 0, 0, 0, -u * x, -u * y]
        a[2 * i + 1] = [0, 0, 0, x, y, 1, -v * x, -v * y]
        b[2 * i] = u
        b[2 * i + 1] = v
    h = np.linalg.solve(a, b)
    return np.append(h, 1.0).reshape(3, 3)


def warp_perspective(img: np.ndarray, m: np.ndarray, out_w: int,
                     out_h: int) -> np.ndarray:
    """Inverse-mapped perspective warp with bilinear sampling and
    replicate border (cv2.warpPerspective semantics; float
    interpolation instead of cv2's fixed-point/INTER_CUBIC)."""
    minv = np.linalg.inv(np.asarray(m, dtype=np.float64))
    xs, ys = np.meshgrid(np.arange(out_w, dtype=np.float64),
                         np.arange(out_h, dtype=np.float64))
    denom = minv[2, 0] * xs + minv[2, 1] * ys + minv[2, 2]
    sx = (minv[0, 0] * xs + minv[0, 1] * ys + minv[0, 2]) / denom
    sy = (minv[1, 0] * xs + minv[1, 1] * ys + minv[1, 2]) / denom
    h, w = img.shape[:2]
    sx = np.clip(sx, 0, w - 1)
    sy = np.clip(sy, 0, h - 1)
    x0 = np.floor(sx).astype(np.int64)
    y0 = np.floor(sy).astype(np.int64)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    wx = sx - x0
    wy = sy - y0
    im = img.astype(np.float64)
    if im.ndim == 3:
        wx = wx[..., None]
        wy = wy[..., None]
    return (im[y0, x0] * (1 - wx) * (1 - wy) + im[y0, x1] * wx * (1 - wy)
            + im[y1, x0] * (1 - wx) * wy + im[y1, x1] * wx * wy)


def get_rotate_crop_image(img: np.ndarray, points: np.ndarray) -> np.ndarray:
    """Perspective-rectified crop of a quad (init_args.py:187-231):
    output size from opposite-edge max norms, then rot90 when the crop
    is tall (h/w ≥ 1.5)."""
    points = np.asarray(points, dtype=np.float64)
    assert points.shape == (4, 2), "shape of points must be 4*2"
    crop_w = int(max(np.linalg.norm(points[0] - points[1]),
                     np.linalg.norm(points[2] - points[3])))
    crop_h = int(max(np.linalg.norm(points[0] - points[3]),
                     np.linalg.norm(points[1] - points[2])))
    pts_std = np.array([[0, 0], [crop_w, 0], [crop_w, crop_h],
                        [0, crop_h]], dtype=np.float64)
    m = perspective_transform(points, pts_std)
    dst = warp_perspective(img, m, crop_w, crop_h)
    if crop_h * 1.0 / crop_w >= 1.5:
        dst = np.rot90(dst)
    return dst


def get_minarea_rect_crop(img: np.ndarray, points: np.ndarray) -> np.ndarray:
    """minAreaRect of the points → the reference's x-sort + pairwise-y
    corner re-ordering (init_args.py:233-253) → rectified crop."""
    corners, _ = min_area_rect(np.asarray(points).astype(np.int32))
    pts = sorted([c for c in corners], key=lambda c: c[0])
    if pts[1][1] > pts[0][1]:
        index_a, index_d = 0, 1
    else:
        index_a, index_d = 1, 0
    if pts[3][1] > pts[2][1]:
        index_b, index_c = 2, 3
    else:
        index_b, index_c = 3, 2
    box = np.array([pts[index_a], pts[index_b], pts[index_c], pts[index_d]])
    return get_rotate_crop_image(img, box)


def bgr_to_gray(img: np.ndarray) -> np.ndarray:
    """cv2.COLOR_BGR2GRAY: Y = 0.299 R + 0.587 G + 0.114 B, computed
    like cv2's fixed-point path (round-half-up on the weighted sum)."""
    b = img[..., 0].astype(np.float64)
    g = img[..., 1].astype(np.float64)
    r = img[..., 2].astype(np.float64)
    return np.floor(0.299 * r + 0.587 * g + 0.114 * b + 0.5).astype(np.uint8)


def otsu_threshold(gray: np.ndarray) -> int:
    """Otsu's between-class-variance-maximizing threshold over the
    256-bin histogram — what cv2.THRESH_OTSU computes. Returns t; the
    binary rule is ``pixel > t → 255 else 0`` (THRESH_BINARY)."""
    hist = np.bincount(gray.reshape(-1), minlength=256).astype(np.float64)
    total = hist.sum()
    if total == 0:
        return 0
    bins = np.arange(256, dtype=np.float64)
    w0 = np.cumsum(hist)                  # pixels <= t
    m0 = np.cumsum(hist * bins)           # mass <= t
    mu_total = m0[-1]
    w1 = total - w0
    valid = (w0 > 0) & (w1 > 0)
    if not valid.any():                   # constant image
        return 0
    mean0 = np.where(valid, m0 / np.maximum(w0, 1), 0.0)
    mean1 = np.where(valid, (mu_total - m0) / np.maximum(w1, 1), 0.0)
    between = w0 * w1 * (mean0 - mean1) ** 2
    between[~valid] = -1.0
    return int(np.argmax(between))


def binarize_img(img: np.ndarray) -> np.ndarray:
    """``utils/utility.py:70-76``: 3-channel BGR → gray → Otsu binary
    → replicated back to 3 channels; anything else passes through."""
    if img.ndim == 3 and img.shape[2] == 3:
        gray = bgr_to_gray(img)
        t = otsu_threshold(gray)
        binary = np.where(gray > t, 255, 0).astype(np.uint8)
        img = np.repeat(binary[:, :, None], 3, axis=2)
    return img


def alpha_to_color(img: np.ndarray,
                   alpha_color=(255, 255, 255)) -> np.ndarray:
    """``utils/utility.py:79-90``: composite BGRA over a solid
    background: C' = bg*(1-a) + C*a, truncated to uint8 exactly as the
    reference's ``.astype(np.uint8)`` does. alpha_color is (R, G, B)
    applied to the (R, G, B) channels respectively (the reference
    blends R with alpha_color[0] etc.)."""
    if img.ndim == 3 and img.shape[2] == 4:
        a = img[..., 3].astype(np.float64) / 255.0
        out = np.empty(img.shape[:2] + (3,), dtype=np.uint8)
        # channel order BGR; alpha_color indexed RGB as in the reference
        for ch, bg in ((0, alpha_color[2]), (1, alpha_color[1]),
                       (2, alpha_color[0])):
            out[..., ch] = (bg * (1.0 - a)
                            + img[..., ch].astype(np.float64) * a
                            ).astype(np.uint8)
        img = out
    return img
