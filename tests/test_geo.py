"""Geometry utilities (quickhull / sdlp / geo_utils parity)."""

import numpy as np
import pytest

from svsdf_tpu.utils import geo


def test_hull_square_with_interior_points():
    rng = np.random.default_rng(0)
    corners = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], float)
    pts = np.vstack([corners, rng.uniform(0.1, 0.9, (50, 2))])
    h = geo.convex_hull_2d(pts)
    assert len(h) == 4
    assert abs(geo.polygon_area(h) - 1.0) < 1e-12
    assert geo.polygon_area(h) > 0  # CCW


def test_hull_collinear():
    pts = np.asarray([[0, 0], [1, 1], [2, 2], [3, 3]], float)
    h = geo.convex_hull_2d(pts)
    assert len(h) == 2


def test_point_in_convex():
    h = geo.convex_hull_2d(
        np.asarray([[0, 0], [2, 0], [2, 2], [0, 2]], float))
    assert geo.point_in_convex_2d(h, [1, 1])
    assert not geo.point_in_convex_2d(h, [3, 1])


def test_seidel_lp_2d_matches_vertex():
    # min -x-y  s.t. x+y<=1, x>=0 (as -x<=0), y>=0  -> any point on
    # x+y=1 is optimal with value -1
    x = geo.seidel_lp(np.asarray([-1.0, -1.0]),
                      np.asarray([[1.0, 1.0], [-1.0, 0.0],
                                  [0.0, -1.0]]),
                      np.asarray([1.0, 0.0, 0.0]))
    assert abs(x.sum() - 1.0) < 1e-8
    assert (x >= -1e-9).all()


def test_seidel_lp_3d_random_vs_bruteforce():
    rng = np.random.default_rng(3)
    for trial in range(10):
        A = rng.normal(0, 1, (12, 3))
        b = rng.uniform(0.5, 2.0, 12)   # origin strictly feasible
        c = rng.normal(0, 1, 3)
        x = geo.seidel_lp(c, A, b, seed=trial)
        assert (A @ x <= b + 1e-6).all()
        # brute-force: enumerate 3-subsets of active constraints
        best = np.inf
        n = len(A)
        from itertools import combinations
        for ijk in combinations(range(n), 3):
            M = A[list(ijk)]
            if abs(np.linalg.det(M)) < 1e-9:
                continue
            v = np.linalg.solve(M, b[list(ijk)])
            if (A @ v <= b + 1e-7).all() and np.abs(v).max() < 1e6:
                best = min(best, c @ v)
        if np.isfinite(best):
            assert c @ x <= best + 1e-5


def test_seidel_lp_infeasible_raises():
    with pytest.raises(ValueError):
        geo.seidel_lp(np.asarray([1.0, 0.0]),
                      np.asarray([[1.0, 0.0], [-1.0, 0.0]]),
                      np.asarray([-1.0, -1.0]))   # x<=-1 and x>=1


def test_halfspace_vertices_unit_box():
    A = np.asarray([[1.0, 0], [-1, 0], [0, 1], [0, -1]])
    b = np.ones(4)
    v = geo.halfspace_polytope_vertices_2d(A, b)
    assert len(v) == 4
    assert abs(geo.polygon_area(v) - 4.0) < 1e-9
