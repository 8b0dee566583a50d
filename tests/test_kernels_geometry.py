import numpy as np
import pytest

from paddleocr_spark.kernels.geometry import (
    connected_components,
    convex_hull,
    min_area_rect,
    polygon_area,
    polygon_mask_mean,
    polygon_perimeter,
    unclip_rect,
)


def rect_map(h, w, rects, fg=1.0, bg=0.0):
    m = np.full((h, w), bg, dtype=np.float64)
    for (x0, y0, x1, y1, p) in rects:
        m[y0 : y1 + 1, x0 : x1 + 1] = p
    return m


def test_connected_components_two_rects():
    m = rect_map(64, 96, [(5, 5, 30, 12, 1.0), (40, 20, 80, 50, 1.0)]) > 0.5
    comps = connected_components(m)
    assert len(comps) == 2
    # topmost rect first (deterministic order)
    xs0, ys0 = comps[0][:, 0], comps[0][:, 1]
    assert xs0.min() == 5 and xs0.max() == 30 and ys0.min() == 5 and ys0.max() == 12
    xs1, ys1 = comps[1][:, 0], comps[1][:, 1]
    assert xs1.min() == 40 and xs1.max() == 80 and ys1.min() == 20 and ys1.max() == 50


def test_connected_components_diagonal_8conn():
    m = np.zeros((4, 4), dtype=bool)
    m[0, 0] = m[1, 1] = m[2, 2] = True
    assert len(connected_components(m, connectivity=8)) == 1
    assert len(connected_components(m, connectivity=4)) == 3


def test_connected_components_empty():
    assert connected_components(np.zeros((8, 8), dtype=bool)) == []


def test_convex_hull_square():
    pts = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [2, 2], [1, 3]])
    hull = convex_hull(pts)
    assert len(hull) == 4
    assert set(map(tuple, hull.astype(int))) == {(0, 0), (4, 0), (4, 4), (0, 4)}


def test_min_area_rect_axis_aligned():
    pts = np.array([[10, 20], [50, 20], [50, 35], [10, 35]])
    corners, (w, h) = min_area_rect(pts)
    assert sorted([round(w), round(h)]) == [15, 40]
    assert set(map(tuple, np.round(corners).astype(int))) == {
        (10, 20),
        (50, 20),
        (50, 35),
        (10, 35),
    }


def test_min_area_rect_rotated():
    # a 45-degree rotated rectangle: corners of a diamond
    pts = np.array([[10, 0], [20, 10], [10, 20], [0, 10]], dtype=float)
    corners, (w, h) = min_area_rect(pts)
    side = 10 * np.sqrt(2)
    assert w == pytest.approx(side, abs=1e-9)
    assert h == pytest.approx(side, abs=1e-9)
    assert polygon_area(corners) == pytest.approx(200.0, abs=1e-6)


def test_min_area_rect_contains_all_points():
    rng = np.random.default_rng(7)
    for _ in range(20):
        pts = rng.uniform(0, 100, size=(12, 2))
        corners, (w, h) = min_area_rect(pts)
        # every point inside the rect (within eps): project on rect axes
        u = corners[1] - corners[0]
        v = corners[3] - corners[0]
        for axis, L in ((u, np.linalg.norm(u)), (v, np.linalg.norm(v))):
            if L == 0:
                continue
            proj = (pts - corners[0]) @ (axis / L)
            assert proj.min() >= -1e-6 and proj.max() <= L + 1e-6
        # not larger than the axis-aligned bbox
        bb = (pts[:, 0].max() - pts[:, 0].min()) * (pts[:, 1].max() - pts[:, 1].min())
        assert w * h <= bb + 1e-6


def test_polygon_area_perimeter():
    sq = np.array([[0, 0], [4, 0], [4, 3], [0, 3]], dtype=float)
    assert polygon_area(sq) == 12.0
    assert polygon_perimeter(sq) == 14.0


def test_polygon_mask_mean_rect():
    m = rect_map(40, 60, [(10, 10, 29, 19, 0.9)], bg=0.1)
    box = np.array([[10, 10], [29, 10], [29, 19], [10, 19]], dtype=float)
    assert polygon_mask_mean(m, box) == pytest.approx(0.9)


def test_polygon_mask_mean_partial():
    # box covering half foreground half background
    m = rect_map(40, 60, [(10, 10, 19, 19, 1.0)], bg=0.0)
    box = np.array([[10, 10], [29, 10], [29, 19], [10, 19]], dtype=float)
    assert polygon_mask_mean(m, box) == pytest.approx(0.5)


def test_unclip_rect_axis_aligned():
    box = np.array([[10, 10], [50, 10], [50, 30], [10, 30]], dtype=float)
    w, h = 40.0, 20.0
    d = (w * h) * 2.0 / (2 * (w + h))
    out = unclip_rect(box, 2.0)
    exp = np.array(
        [[10 - d, 10 - d], [50 + d, 10 - d], [50 + d, 30 + d], [10 - d, 30 + d]]
    )
    np.testing.assert_allclose(out, exp, atol=1e-9)


def test_unclip_rect_rotated_preserves_shape():
    # rotated rect: expansion adds d to each side length
    c, s = np.cos(0.5), np.sin(0.5)
    R = np.array([[c, -s], [s, c]])
    base = np.array([[0, 0], [40, 0], [40, 20], [0, 20]], dtype=float) @ R.T + 100
    d = (40 * 20) * 2.0 / (2 * (40 + 20))
    out = unclip_rect(base, 2.0)
    _, (w2, h2) = min_area_rect(out)
    assert sorted([w2, h2]) == pytest.approx(sorted([20 + 2 * d, 40 + 2 * d]), abs=1e-6)
