"""Unit tests for host-side computational geometry (genRegion/calcSlopes
parity, reference TrajectoryOptimizer.cpp:84-201; ValidityChecker parity,
eOMPL.cpp:22-111)."""
import numpy as np
import pytest

from etol_tpu.core import geometry as g

SQUARE = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
# the canonical nonconvex 5-corner obstacle from mip_2d_ex1.xml
EXZ0 = np.array(
    [[3.2, 2.5], [3.4, 2.6], [3.5, 3.4], [3.3, 3.0], [3.1, 3.5]]
)


def test_area_and_winding():
    assert g.polygon_area(SQUARE) == pytest.approx(1.0)
    assert g.polygon_area(SQUARE[::-1]) == pytest.approx(-1.0)
    assert g.polygon_area(g.ensure_ccw(SQUARE[::-1])) == pytest.approx(1.0)


def test_point_in_polygon():
    assert g.point_in_polygon([0.5, 0.5], SQUARE)
    assert not g.point_in_polygon([1.5, 0.5], SQUARE)
    # boundary counts as inside (eOMPL onSegment semantics)
    assert g.point_in_polygon([1.0, 0.5], SQUARE)
    assert g.point_in_polygon([0.0, 0.0], SQUARE)


def test_triangulate_square():
    tris = g.triangulate(SQUARE)
    assert len(tris) == 2
    area = sum(
        abs(g.cross2(SQUARE[a], SQUARE[b], SQUARE[c])) / 2.0
        for a, b, c in tris
    )
    assert area == pytest.approx(1.0)


def test_convex_partition_convex_input_is_identity():
    pieces = g.convex_partition(SQUARE)
    assert len(pieces) == 1
    assert len(pieces[0]) == 4


def _total_area(pieces):
    return sum(abs(g.polygon_area(p)) for p in pieces)


def test_convex_partition_nonconvex():
    pieces = g.convex_partition(EXZ0)
    # partition covers the polygon exactly and every piece is convex
    assert _total_area(pieces) == pytest.approx(
        abs(g.polygon_area(EXZ0)), abs=1e-9
    )
    for p in pieces:
        n = len(p)
        for i in range(n):
            assert (
                g.cross2(p[(i - 1) % n], p[i], p[(i + 1) % n]) >= -1e-9
            )
    # the 5-corner star-ish polygon needs at least 2 pieces
    assert len(pieces) >= 2


def test_halfspaces_contain_interior():
    pieces = g.convex_partition(EXZ0)
    for p in pieces:
        hs = g.piece_halfspaces(p)
        centroid = p.mean(axis=0)
        margins = hs[:, 2] - hs[:, :2] @ centroid
        assert np.all(margins > 0)
        # a point far away violates at least one halfspace
        far = np.array([100.0, 100.0])
        assert np.any(hs[:, 2] - hs[:, :2] @ far < 0)


def test_chains_and_slopes():
    lower, upper = g.lower_upper_chains(SQUARE)
    assert lower[0][0] == pytest.approx(0.0)
    assert lower[-1][0] == pytest.approx(1.0)
    assert upper[0][0] == pytest.approx(0.0)
    assert upper[-1][0] == pytest.approx(1.0)
    # lower chain of a square is below the upper chain at interior x
    edges = g.chain_edges(np.array([[0.0, 0.0], [1.0, 1.0], [1.0, 2.0]]))
    assert edges[0][2] == pytest.approx(1.0)  # slope
    assert np.isinf(edges[1][2])  # vertical edge
    assert edges[0][3] == pytest.approx(np.sqrt(2.0))  # length


def test_edge_ellipses_cover_edges():
    rows = g.edge_ellipses(EXZ0)
    assert rows.shape == (5, 6)
    # each edge midpoint is strictly inside its ellipse (g > 0)
    n = len(EXZ0)
    for i in range(n):
        a, b = EXZ0[i], EXZ0[(i + 1) % n]
        c = (a + b) / 2.0
        cx, cy, ct, st, asq, bsq = rows[i]
        dx, dy = c[0] - cx, c[1] - cy
        delx = ct * dx - st * dy
        dely = st * dx + ct * dy
        val = asq * bsq - (bsq * delx**2 + asq * dely**2)
        assert val > 0
        # the edge endpoints are exactly on the ellipse boundary
        dx, dy = a[0] - cx, a[1] - cy
        delx = ct * dx - st * dy
        dely = st * dx + ct * dy
        val = asq * bsq - (bsq * delx**2 + asq * dely**2)
        assert val == pytest.approx(0.0, abs=1e-9)


def test_point_in_polygon_3d_corners():
    """Obstacle arrays may carry a stored z column (reference corner_t,
    ETOL_Types.hpp:59; stored since the r5 lossless XML round trip).
    The xy footprint test must accept them — on BOTH the native path
    and the pure-Python fallback (the native kernel reads 2 doubles per
    point, so the wrapper must slice before the call)."""
    import numpy as np

    from etol_tpu.core import _native

    sq3 = np.array(
        [[0.0, 0.0, 7.0], [1.0, 0.0, 7.0], [1.0, 1.0, 7.0],
         [0.0, 1.0, 7.0]]
    )
    assert g.point_in_polygon([0.5, 0.5], sq3)
    assert not g.point_in_polygon([1.5, 0.5], sq3)
    if _native.available():
        # force the fallback too
        import unittest.mock as mock

        with mock.patch.object(
            _native, "point_in_polygon", lambda *a: None
        ):
            assert g.point_in_polygon([0.5, 0.5], sq3)
            assert not g.point_in_polygon([1.5, 0.5], sq3)
