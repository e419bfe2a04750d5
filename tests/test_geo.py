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


def test_convex_hull_3d_cube_with_interior_points():
    """Hull of cube corners + interior points = exactly the 8 corners,
    watertight (Euler V-E+F=2), outward faces, volume 8."""
    rng = np.random.default_rng(0)
    corners = np.asarray([[x, y, z] for x in (-1.0, 1.0)
                          for y in (-1.0, 1.0) for z in (-1.0, 1.0)])
    interior = rng.uniform(-0.9, 0.9, (200, 3))
    V, F = geo.convex_hull_3d(np.concatenate([corners, interior]))
    assert len(V) == 8
    assert {tuple(v) for v in V} == {tuple(c) for c in corners}
    edges = {frozenset((f[i], f[(i + 1) % 3])) for f in F
             for i in range(3)}
    assert len(V) - len(edges) + len(F) == 2        # Euler
    assert abs(geo.polytope_volume_3d(V, F) - 8.0) < 1e-9
    # outward orientation: every vertex on/behind every face plane
    for f in F:
        n = np.cross(V[f[1]] - V[f[0]], V[f[2]] - V[f[0]])
        assert ((V - V[f[0]]) @ n <= 1e-9).all()


def test_convex_hull_3d_random_cloud_contains_all_points():
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(300, 3))
    V, F = geo.convex_hull_3d(pts)
    for f in F:
        n = np.cross(V[f[1]] - V[f[0]], V[f[2]] - V[f[0]])
        n /= np.linalg.norm(n)
        assert ((pts - V[f[0]]) @ n <= 1e-7).all()
    # hull vertices are a subset of the input
    inp = {tuple(np.round(p, 12)) for p in pts}
    assert all(tuple(np.round(v, 12)) in inp for v in V)
    # volume below the bounding box's, above a centered octahedron's
    bb = pts.max(0) - pts.min(0)
    vol = geo.polytope_volume_3d(V, F)
    assert 0.0 < vol < np.prod(bb)


def test_convex_hull_3d_degenerate_raises():
    with pytest.raises(ValueError):
        geo.convex_hull_3d(np.zeros((10, 3)))        # coincident
    line = np.linspace(0, 1, 9)[:, None] * np.ones((1, 3))
    with pytest.raises(ValueError):
        geo.convex_hull_3d(line)                     # collinear
    rng = np.random.default_rng(1)
    planar = np.concatenate([rng.normal(size=(20, 2)),
                             np.zeros((20, 1))], axis=1)
    with pytest.raises(ValueError):
        geo.convex_hull_3d(planar)                   # coplanar
