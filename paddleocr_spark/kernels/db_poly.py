"""DB detection post-processing, polygon (`box_type="poly"`) mode.

From-scratch NumPy re-creation of the reference's curved-text decode:

- ``DBPostProcess.polygons_from_bitmap`` — ``toddleocr/postprocess/db.py:38-84``
  (contour -> 0.002*arcLength approxPolyDP -> score -> round-join
  unclip -> mini-box side gate -> rescale)
- ``use_dilation`` 2x2 kernel             — ``db.py:35,213-216``
- ``filter_tag_det_res_only_clip``        — ``toddleocr/utils/utility.py:252-261``

The reference leans on cv2 (findContours/approxPolyDP/arcLength) and
pyclipper (JT_ROUND offset); neither exists in this environment, so
each primitive is re-derived from its published definition:

- contours: Moore-neighbor border following (radial sweep, 8-connected,
  Jacob's stopping criterion) over the repo's run-based connected
  components, traced clockwise in image coordinates from the
  topmost-leftmost pixel, then CHAIN_APPROX_SIMPLE-style compression
  (drop vertices whose incoming and outgoing chain codes match).
  Contours are emitted in first-pixel raster order — deterministic,
  though not cv2's internal ordering (only observable past
  ``max_candidates``). Like ``component_score_slow`` (kernels/db.py),
  hole borders are not emitted: the DB binarization maps this corpus
  produces have no holed components.
- approxPolyDP: classic closed-curve Douglas-Peucker — split at the
  farthest vertex pair, recurse each chain on perpendicular
  line-distance > eps. Same contract (vertex subset, eps tolerance),
  not bit-for-bit cv2 (cv2's variant is unpublished beyond "DP").
- unclip: outward polygon offset by d = area*ratio/perimeter, the
  ClipperOffset JT_ROUND algorithm re-derived: build the RAW offset
  outline (convex joins get arc samples at pyclipper's default 0.25
  arc tolerance; reflex joins get offset-point / vertex / offset-point,
  exactly Clipper's outline construction), then resolve the outline's
  self-overlaps the way Clipper's Execute does — a NONZERO-winding
  fill — realized on a 2x-subpixel raster whose outer border is traced
  and Douglas-Peucker-cleaned at one-subpixel tolerance. A fill that
  splits into multiple components is the multi-polygon pyclipper
  result, and the candidate is skipped as the reference does
  (``db.py:66-68``). Vertex positions are therefore quantized to the
  subpixel grid; the pipeline's final round-to-destination-pixel
  (``db.py:76-81``) is coarser, so the quantization is invisible in
  the output coordinates.

Determinism: every step is pure float64/int arithmetic with fixed
iteration order — the sequential golden path and the distributed Spark
decode share these kernels bit-for-bit.
"""

from __future__ import annotations

import math

import numpy as np

from .db import DBParams, get_mini_boxes
from .geometry import connected_components, polygon_area, polygon_perimeter

__all__ = ["dilate_2x2", "find_contours", "arc_length", "approx_poly_dp",
           "polygon_mask_mean_eo", "offset_polygon_round",
           "polygons_from_bitmap", "db_postprocess_poly"]


def dilate_2x2(bitmap: np.ndarray) -> np.ndarray:
    """cv2.dilate with the reference's ``np.array([[1,1],[1,1]])``
    kernel (``db.py:35``): anchor at (1,1), so a pixel turns on if
    itself or its left / upper / upper-left neighbor is on. Border
    pixels see only in-bounds neighbors (cv2's dilation border value
    is the identity for max)."""
    b = bitmap.astype(bool)
    out = b.copy()
    out[1:, :] |= b[:-1, :]
    out[:, 1:] |= b[:, :-1]
    out[1:, 1:] |= b[:-1, :-1]
    return out


# Moore neighborhood, CLOCKWISE in image coords (y down), starting W.
_MOORE = [(-1, 0), (-1, -1), (0, -1), (1, -1),
          (1, 0), (1, 1), (0, 1), (-1, 1)]
_MOORE_IDX = {d: i for i, d in enumerate(_MOORE)}


def _trace_component(mask: np.ndarray, sy: int, sx: int) -> list:
    """Outer border of the component containing (sy, sx) — which must
    be its topmost-then-leftmost pixel — as [x, y] vertices, clockwise.
    Radial-sweep Moore tracing with Jacob's criterion (terminate on
    re-entering the start pixel from the start backtrack)."""
    h, w = mask.shape

    def on(x, y):
        return 0 <= x < w and 0 <= y < h and mask[y, x]

    start = (sx, sy)
    # topmost-leftmost => W and N neighbors are background
    back = (sx - 1, sy)
    contour = [start]
    cur = start
    first_state = None
    # a border pixel is visited at most 8 times (once per entry dir)
    for _ in range(8 * int(mask.sum()) + 8):
        dx, dy = back[0] - cur[0], back[1] - cur[1]
        k0 = _MOORE_IDX[(dx, dy)]
        nxt = None
        prev = back
        for j in range(1, 9):
            d = _MOORE[(k0 + j) % 8]
            cand = (cur[0] + d[0], cur[1] + d[1])
            if on(cand[0], cand[1]):
                nxt = cand
                break
            prev = cand
        if nxt is None:  # isolated pixel
            break
        state = (cur, prev, nxt)
        if first_state is None:
            first_state = state
        elif state == first_state:
            contour.pop()  # the re-entered start was appended last
            break
        back = prev
        cur = nxt
        contour.append(cur)
    if len(contour) > 1 and contour[-1] == contour[0]:
        contour.pop()
    return [[float(x), float(y)] for x, y in contour]


def _compress_chain(pts: list) -> list:
    """CHAIN_APPROX_SIMPLE: drop vertices whose incoming and outgoing
    unit chain codes are equal (closed sequence)."""
    n = len(pts)
    if n < 3:
        return pts
    out = []
    for i in range(n):
        px, py = pts[(i - 1) % n]
        cx, cy = pts[i]
        nx, ny = pts[(i + 1) % n]
        din = (_sgn(cx - px), _sgn(cy - py))
        dout = (_sgn(nx - cx), _sgn(ny - cy))
        if din != dout:
            out.append(pts[i])
    return out if out else pts[:1]


def _sgn(v: float) -> int:
    return (v > 0) - (v < 0)


def find_contours(bitmap: np.ndarray) -> list:
    """Outer contours of every 8-connected component, cv2-style
    ``findContours(RETR_LIST, CHAIN_APPROX_SIMPLE)`` semantics for
    hole-free maps. Returns a list of (N, 2) float64 [x, y] arrays in
    first-pixel raster order."""
    comps = connected_components(bitmap, connectivity=8)
    h, w = bitmap.shape
    contours = []
    for runs in comps:
        # rebuild the component's own mask (runs are alternating
        # left/right endpoints per row) so tracing never wanders onto
        # a touching neighbor component
        xs = [int(p[0]) for p in runs]
        ys = [int(p[1]) for p in runs]
        x0, x1 = min(xs), max(xs)
        y0, y1 = min(ys), max(ys)
        m = np.zeros((y1 - y0 + 1, x1 - x0 + 1), dtype=bool)
        for k in range(0, len(runs), 2):
            lx, y = int(runs[k][0]), int(runs[k][1])
            rx = int(runs[k + 1][0])
            m[y - y0, lx - x0:rx - x0 + 1] = True
        # topmost-leftmost pixel of the component
        sy = int(np.argmax(m.any(axis=1)))
        sx = int(np.argmax(m[sy]))
        pts = _trace_component(m, sy, sx)
        pts = _compress_chain(pts)
        arr = np.asarray(pts, dtype=np.float64)
        arr[:, 0] += x0
        arr[:, 1] += y0
        contours.append(arr)
    contours.sort(key=lambda c: (c[0, 1], c[0, 0]))
    return contours


def arc_length(pts: np.ndarray, closed: bool = True) -> float:
    """cv2.arcLength: polyline length (+ closing edge when closed)."""
    p = np.asarray(pts, dtype=np.float64)
    n = len(p)
    if n < 2:
        return 0.0
    total = 0.0
    last = n if closed else n - 1
    for i in range(last):
        dx = p[(i + 1) % n][0] - p[i][0]
        dy = p[(i + 1) % n][1] - p[i][1]
        total += math.sqrt(dx * dx + dy * dy)
    return total


def _line_dist(p, a, b) -> float:
    ax, ay = a
    bx, by = b
    ex, ey = bx - ax, by - ay
    ln = math.sqrt(ex * ex + ey * ey)
    if ln == 0:
        return math.hypot(p[0] - ax, p[1] - ay)
    return abs(ex * (p[1] - ay) - ey * (p[0] - ax)) / ln


def _dp_open(pts: list, eps: float) -> list:
    """Douglas-Peucker on an open chain (endpoints kept)."""
    if len(pts) < 3:
        return list(pts)
    stack = [(0, len(pts) - 1)]
    keep = [False] * len(pts)
    keep[0] = keep[-1] = True
    while stack:
        i, j = stack.pop()
        if j - i < 2:
            continue
        best, bd = -1, eps
        for k in range(i + 1, j):
            d = _line_dist(pts[k], pts[i], pts[j])
            if d > bd:
                best, bd = k, d
        if best >= 0:
            keep[best] = True
            stack.append((i, best))
            stack.append((best, j))
    return [pts[k] for k in range(len(pts)) if keep[k]]


def approx_poly_dp(pts: np.ndarray, eps: float) -> np.ndarray:
    """Closed-curve Douglas-Peucker (cv2.approxPolyDP(closed=True)
    contract): split the ring at its farthest vertex pair, simplify
    each half to tolerance ``eps``, rejoin."""
    p = np.asarray(pts, dtype=np.float64)
    n = len(p)
    if n < 3:
        return p.copy()
    pl = p.tolist()
    bi, bj, bd = 0, 1 % n, -1.0
    for i in range(n):
        for j in range(i + 1, n):
            dx = pl[j][0] - pl[i][0]
            dy = pl[j][1] - pl[i][1]
            d = dx * dx + dy * dy
            if d > bd:
                bi, bj, bd = i, j, d
    chain1 = pl[bi:bj + 1]
    chain2 = pl[bj:] + pl[:bi + 1]
    k1 = _dp_open(chain1, eps)
    k2 = _dp_open(chain2, eps)
    return np.asarray(k1[:-1] + k2[:-1], dtype=np.float64)


def polygon_mask_mean_eo(bitmap: np.ndarray, poly: np.ndarray) -> float:
    """``box_score_fast`` (``db.py:163-178``) for a GENERAL (possibly
    non-convex) polygon: mean of ``bitmap`` over the even-odd fill of
    the int-truncated polygon, clipped to its bounding box. Boundary
    pixels (the rasterized outline) are included, as cv2.fillPoly
    draws them."""
    h, w = bitmap.shape[:2]
    pts = np.asarray(poly, dtype=np.float64).tolist()
    xs = [q[0] for q in pts]
    ys = [q[1] for q in pts]
    xmin = min(max(math.floor(min(xs)), 0), w - 1)
    xmax = min(max(math.ceil(max(xs)), 0), w - 1)
    ymin = min(max(math.floor(min(ys)), 0), h - 1)
    ymax = min(max(math.ceil(max(ys)), 0), h - 1)
    mh, mw = ymax - ymin + 1, xmax - xmin + 1
    # reference casts the shifted polygon to int32 (trunc toward zero)
    sp = [(int(q[0] - xmin), int(q[1] - ymin)) for q in pts]
    mask = np.zeros((mh, mw), dtype=bool)
    n = len(sp)
    # even-odd scanline at integer rows (half-open edge rule)
    for y in range(mh):
        xs_hit = []
        for i in range(n):
            x0, y0 = sp[i]
            x1, y1 = sp[(i + 1) % n]
            if (y0 > y) != (y1 > y):
                xs_hit.append(x0 + (y - y0) * (x1 - x0) / (y1 - y0))
        xs_hit.sort()
        for k in range(0, len(xs_hit) - 1, 2):
            a = max(0, math.ceil(xs_hit[k]))
            b = min(mw - 1, math.floor(xs_hit[k + 1]))
            if b >= a:
                mask[y, a:b + 1] = True
    # outline pixels (cv2.fillPoly includes the drawn border)
    for i in range(n):
        x0, y0 = sp[i]
        x1, y1 = sp[(i + 1) % n]
        steps = max(abs(x1 - x0), abs(y1 - y0), 1)
        for s in range(steps + 1):
            x = int(round(x0 + (x1 - x0) * s / steps))
            y = int(round(y0 + (y1 - y0) * s / steps))
            if 0 <= x < mw and 0 <= y < mh:
                mask[y, x] = True
    sub = bitmap[ymin:ymax + 1, xmin:xmax + 1]
    cnt = int(mask.sum())
    if cnt == 0:
        return 0.0
    return float(sub[mask].sum() / cnt)


def _raw_offset_outline(pts: np.ndarray, distance: float,
                        arc_tol: float = 0.25):
    """ClipperOffset's raw JT_ROUND outline: per edge the two offset
    endpoints; convex joins bridged by arc samples at step
    ``2*acos(1 - arc_tol/d)``, reflex joins by offset-point / ORIGINAL
    VERTEX / offset-point (Clipper inserts the vertex so the nonzero
    fill resolves the overlap). Returns (M, 2) float64 or None for
    degenerate input."""
    p = np.asarray(pts, dtype=np.float64)
    n = len(p)
    t = [p[i][0] * p[(i + 1) % n][1] - p[(i + 1) % n][0] * p[i][1]
         for i in range(n)]
    signed = math.fsum(t) / 2.0
    if signed == 0:
        return None
    w = 1.0 if signed > 0 else -1.0
    normals = []
    for i in range(n):
        ex = p[(i + 1) % n][0] - p[i][0]
        ey = p[(i + 1) % n][1] - p[i][1]
        ln = math.sqrt(ex * ex + ey * ey)
        normals.append(None if ln == 0
                       else (w * ey / ln, w * -ex / ln))
    step = 2.0 * math.acos(max(-1.0, min(1.0, 1.0 - arc_tol / distance)))
    out = []
    for i in range(n):
        n0 = normals[(i - 1) % n]
        n1 = normals[i]
        if n0 is None and n1 is None:
            continue
        if n0 is None or n1 is None:
            nn = n1 if n0 is None else n0
            out.append([p[i][0] + distance * nn[0],
                        p[i][1] + distance * nn[1]])
            continue
        crossz = n0[0] * n1[1] - n0[1] * n1[0]
        # convex join iff the normal rotates with the winding
        if crossz * w >= 0:
            a0 = math.atan2(n0[1], n0[0])
            a1 = math.atan2(n1[1], n1[0])
            delta = a1 - a0
            while delta * w < 0:
                delta += w * 2.0 * math.pi
            while abs(delta) > 2.0 * math.pi:
                delta -= w * 2.0 * math.pi
            ksteps = max(1, int(math.ceil(abs(delta) / step)))
            for s in range(ksteps + 1):
                a = a0 + delta * s / ksteps
                out.append([p[i][0] + distance * math.cos(a),
                            p[i][1] + distance * math.sin(a)])
        else:
            out.append([p[i][0] + distance * n0[0],
                        p[i][1] + distance * n0[1]])
            out.append([p[i][0], p[i][1]])
            out.append([p[i][0] + distance * n1[0],
                        p[i][1] + distance * n1[1]])
    return np.asarray(out, dtype=np.float64) if len(out) >= 3 else None


_OFFSET_SCALE = 4  # subpixel raster scale for the nonzero-fill union


def _nonzero_fill(outline: np.ndarray, scale: int):
    """Nonzero-winding fill of a (self-overlapping) closed outline on
    a ``scale``x subpixel grid, sampled at pixel centers. Returns
    (mask, gx0, gy0): mask[iy, ix] covers the point
    ((gx0 + ix + 0.5)/scale, (gy0 + iy + 0.5)/scale)."""
    sp = outline * scale
    gx0 = int(math.floor(sp[:, 0].min())) - 1
    gy0 = int(math.floor(sp[:, 1].min())) - 1
    gw = int(math.ceil(sp[:, 0].max())) - gx0 + 2
    gh = int(math.ceil(sp[:, 1].max())) - gy0 + 2
    mask = np.zeros((gh, gw), dtype=bool)
    ex0 = sp[:, 0]
    ey0 = sp[:, 1]
    ex1 = np.roll(ex0, -1)
    ey1 = np.roll(ey0, -1)
    with np.errstate(divide="ignore", invalid="ignore"):
        slope = (ex1 - ex0) / (ey1 - ey0)  # horizontals never selected
    for iy in range(gh):
        yc = gy0 + iy + 0.5
        sel = ((ey0 <= yc) & (yc < ey1)) | ((ey1 <= yc) & (yc < ey0))
        if not sel.any():
            continue
        xi = ex0[sel] + (yc - ey0[sel]) * slope[sel]
        di = np.where(ey1[sel] > ey0[sel], 1, -1)
        order = np.argsort(xi, kind="stable")
        xi = xi[order]
        wind = np.cumsum(di[order])
        for k in np.nonzero(wind[:-1] != 0)[0]:
            a = max(0, int(math.ceil(xi[k] - 0.5)) - gx0)
            b = min(gw - 1, int(math.floor(xi[k + 1] - 0.5)) - gx0)
            if b >= a:
                mask[iy, a:b + 1] = True
    return mask, gx0, gy0


def offset_polygon_round(pts: np.ndarray, distance: float,
                         arc_tol: float = 0.25):
    """Outward offset of a simple polygon with ROUND joins — the
    pyclipper ``JT_ROUND`` ``Execute(distance)`` the reference's
    ``unclip`` performs (``db.py:134-140``): raw Clipper outline, then
    nonzero-winding union on a 2x subpixel raster, outer border traced
    and DP-cleaned at one-subpixel tolerance. Returns
    an (M, 2) float64 polygon, or None when the union yields zero or
    multiple polygons (the reference skips those candidates,
    ``db.py:66-68``)."""
    p = np.asarray(pts, dtype=np.float64)
    if len(p) < 3 or distance <= 0:
        return p.copy()
    outline = _raw_offset_outline(p, distance, arc_tol)
    if outline is None:
        return None
    mask, gx0, gy0 = _nonzero_fill(outline, _OFFSET_SCALE)
    comps = connected_components(mask, connectivity=8)
    if len(comps) != 1:
        return None  # pyclipper multi-polygon result -> caller skips
    sy = int(np.argmax(mask.any(axis=1)))
    sx = int(np.argmax(mask[sy]))
    traced = _compress_chain(_trace_component(mask, sy, sx))
    s = float(_OFFSET_SCALE)
    poly = [[(gx0 + x + 0.5) / s, (gy0 + y + 0.5) / s]
            for x, y in traced]
    if len(poly) < 3:
        return None
    cleaned = _dp_open(poly + [poly[0]], 1.0 / s)[:-1]
    if len(cleaned) < 3:
        return None
    return np.asarray(cleaned, dtype=np.float64)


def polygons_from_bitmap(
    pred: np.ndarray,
    bitmap: np.ndarray,
    dest_width: float,
    dest_height: float,
    params: DBParams | None = None,
):
    """Binary map -> scored polygons in destination coords —
    ``DBPostProcess.polygons_from_bitmap`` (``db.py:38-84``).

    Returns (polys: list of (Ni, 2) float64, scores: list[float]).
    """
    p = params or DBParams()
    height, width = bitmap.shape
    polys = []
    scores = []
    for contour in find_contours(bitmap)[: p.max_candidates]:
        eps = 0.002 * arc_length(contour, closed=True)
        points = approx_poly_dp(contour, eps)
        if points.shape[0] < 4:
            continue
        score = polygon_mask_mean_eo(pred, points)
        if p.box_thresh > score:
            continue
        # unclip distance = shapely Polygon area * ratio / perimeter
        area = polygon_area(points)
        length = polygon_perimeter(points)
        if length == 0:
            continue
        box = offset_polygon_round(points, area * p.unclip_ratio / length)
        if box is None:
            continue
        _, sside = get_mini_boxes(box)
        if sside < p.min_size + 2:
            continue
        out = np.empty_like(box)
        # np.round half-even, then clip to [0, dest] (db.py:76-81 —
        # poly mode keeps floats; quad mode is the int32 path)
        for k, (x, y) in enumerate(box.tolist()):
            out[k, 0] = min(max(float(round(x / width * dest_width)),
                                0.0), dest_width)
            out[k, 1] = min(max(float(round(y / height * dest_height)),
                                0.0), dest_height)
        polys.append(out)
        scores.append(score)
    return polys, scores


def db_postprocess_poly(
    prob_map: np.ndarray,
    shape_list,
    params: DBParams | None = None,
    use_dilation: bool = True,
):
    """Full poly-mode det stage for one media item: prob map (H, W) +
    shape_list [src_h, src_w, ratio_h, ratio_w] -> (polys, scores) in
    source-image coordinates, clipped (``filter_tag_det_res_only_clip``,
    ``utility.py:252-261`` — no corner reordering, no side-length gate).
    Mirrors ``DBPostProcess.__call__`` with ``box_type='poly'`` and the
    ``use_dilation`` branch (``db.py:201-230``)."""
    p = params or DBParams()
    src_h, src_w = float(shape_list[0]), float(shape_list[1])
    segmentation = prob_map > p.thresh
    mask = dilate_2x2(segmentation) if use_dilation else segmentation
    polys, scores = polygons_from_bitmap(prob_map, mask, src_w, src_h, p)
    clipped = []
    for poly in polys:
        q = poly.copy()
        q[:, 0] = np.clip(q[:, 0], 0, src_w - 1)
        q[:, 1] = np.clip(q[:, 1], 0, src_h - 1)
        clipped.append(q)
    return clipped, scores
