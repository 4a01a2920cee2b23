"""Native geometry engine vs pure-Python parity (native/geometry.cpp)."""
import numpy as np
import pytest

from etol_tpu.core import _native
from etol_tpu.core import geometry as g

pytestmark = pytest.mark.skipif(
    not _native.available(), reason="native geometry library not built"
)

POLYS = [
    np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]]),
    np.array([[3.2, 2.5], [3.4, 2.6], [3.5, 3.4], [3.3, 3.0], [3.1, 3.5]]),
    np.array([[2.2, 2.5], [2.4, 2.6], [2.5, 3.4], [2.1, 3.5]]),
    # an L-shape (reflex vertex)
    np.array(
        [[0, 0], [2, 0], [2, 1], [1, 1], [1, 2], [0, 2]], dtype=float
    ),
]


@pytest.mark.parametrize("poly", POLYS, ids=range(len(POLYS)))
def test_partition_valid(poly):
    ccw = g.ensure_ccw(poly)
    pieces = _native.convex_partition_indices(ccw)
    assert pieces is not None and len(pieces) >= 1
    # exact area cover + all pieces convex
    total = sum(abs(g.polygon_area(ccw[p])) for p in pieces)
    assert total == pytest.approx(abs(g.polygon_area(ccw)), abs=1e-9)
    for p in pieces:
        assert len(p) >= 3
        piece = ccw[p]
        n = len(piece)
        for i in range(n):
            assert (
                g.cross2(piece[(i - 1) % n], piece[i], piece[(i + 1) % n])
                >= -1e-9
            )


@pytest.mark.parametrize("poly", POLYS, ids=range(len(POLYS)))
def test_point_in_polygon_matches_python(poly):
    rng = np.random.default_rng(0)
    lo = poly.min(axis=0) - 0.5
    hi = poly.max(axis=0) + 0.5
    pts = rng.uniform(lo, hi, size=(128, 2))
    for p in pts:
        nat = _native.point_in_polygon(p, poly)
        # compare against the pure-python path (bypass native)
        ref = _py_pip(p, poly)
        assert nat == ref, p


def _py_pip(point, poly):
    # inline copy of the pure-python ray cast to dodge the native fast path
    x, y = float(point[0]), float(point[1])
    poly = np.asarray(poly, dtype=np.float64)
    n = len(poly)
    inside = False
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        if (
            min(x1, x2) - 1e-12 <= x <= max(x1, x2) + 1e-12
            and min(y1, y2) - 1e-12 <= y <= max(y1, y2) + 1e-12
            and abs((x2 - x1) * (y - y1) - (y2 - y1) * (x - x1)) < 1e-9
        ):
            return True
        if (y1 > y) != (y2 > y):
            xint = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
            if x < xint:
                inside = not inside
    return inside


@pytest.mark.parametrize("poly", POLYS, ids=range(len(POLYS)))
def test_halfspaces_and_ellipses_match_python(poly):
    ccw = g.ensure_ccw(poly)
    pieces = g.convex_partition(ccw)
    for piece in pieces:
        nat = _native.piece_halfspaces(piece)
        ref = g.piece_halfspaces(piece)
        np.testing.assert_allclose(nat, ref, atol=1e-12)
    nat_e = _native.edge_ellipses(ccw, 0.2)
    ref_e = g.edge_ellipses(ccw, 0.2)
    np.testing.assert_allclose(nat_e, ref_e, atol=1e-12)
