"""Environment layer + A* front end tests: PCD parsing, voxelization,
AABB harvest, kernels/feasibility convs, A* on synthetic and fixture
maps, ESDF vs brute force."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from svsdf_tpu.models import shapes
from svsdf_tpu.ops import esdf as esdf_ops
from svsdf_tpu.ops import kernels as kops
from svsdf_tpu.planner import astar
from svsdf_tpu.utils import fixtures
from svsdf_tpu.utils.gridmap import GridMap

HAVE_REF = os.path.isdir(fixtures.REFERENCE_ROOT)


def _wall_map(gap_lo=4, gap_hi=8):
    """20x12 map with a vertical wall at x=10, gap in y [gap_lo, gap_hi]."""
    pts = []
    for y in range(12):
        if gap_lo <= y <= gap_hi:
            continue
        for z in range(2):
            pts.append((10.2, y + 0.5, z + 0.5))
    # corner markers to set bounds
    pts += [(0.1, 0.1, 0.1), (19.9, 11.9, 1.9)]
    return np.asarray(pts)


def test_gridmap_voxelize():
    g = GridMap.from_points(_wall_map(), 1.0, 1)
    assert g.size == (20, 12, 2)
    assert g.occ[10, 0, 0] == 1      # wall cell
    assert g.occ[10, 5, 0] == 0      # gap
    assert g.occ[5, 5, 0] == 0
    # out-of-map occupied semantics
    assert g.is_occupied_idx(-1, 0, 0)
    assert g.is_occupied_idx(25, 0, 0)


def test_gridmap_rejects_empty_or_malformed_cloud():
    import pytest
    with pytest.raises(ValueError, match=r"non-empty \(N, 3\)"):
        GridMap.from_points(np.zeros((0, 3)), 1.0, 1)
    with pytest.raises(ValueError, match=r"non-empty \(N, 3\)"):
        GridMap.from_points(np.zeros((5, 2)), 1.0, 1)


def test_aabb_harvest_dedup():
    g = GridMap.from_points(_wall_map(), 1.0, 1)
    pts = g.harvest_along_path([np.array([10.5, 1.5, 0.0]),
                                np.array([10.5, 2.0, 0.0])],
                               half=2.0)
    # dedup: overlapping AABBs must not double-count voxels
    assert len(pts) == len({tuple(np.round(p, 6)) for p in map(tuple, pts)})
    assert len(pts) >= 3


def test_feasibility_maps_circle():
    g = GridMap.from_points(_wall_map(), 1.0, 1)
    shape = shapes.make_shape("Circle")    # radius 1
    ker = kops.rasterize_shape_kernels(shape, 5, 4, 1.0, 0.5)
    feas = np.asarray(kops.feasibility_maps(jnp.asarray(g.occ2d), ker))
    assert feas.shape == (4, 20, 12)
    # far from wall: feasible in every yaw bin
    assert feas[:, 3, 3].all()
    # on the wall: infeasible
    assert not feas[:, 10, 1].any()
    # in the gap center: the circle (radius 1 + margin) fits
    assert feas[:, 10, 6].all()


def test_astar_through_gap():
    g = GridMap.from_points(_wall_map(), 1.0, 1)
    shape = shapes.make_shape("Circle")
    ker = kops.rasterize_shape_kernels(shape, 5, 4, 1.0, 0.5)
    feas = np.asarray(kops.feasibility_maps(jnp.asarray(g.occ2d), ker))
    st = kops.transition_stencils(shape, 4, 1.0, guard_half_world=3.0)
    tf = np.asarray(kops.transition_feasibility(jnp.asarray(g.occ2d), st))
    res = astar.search(g, feas, tf, np.array([2.5, 6.5, 0.0]),
                       np.array([17.5, 6.5, 0.0]), 4)
    assert res.success
    # the path must pass through the gap band
    xs_at_wall = res.path[np.abs(res.path[:, 0] - 10.5) < 0.6]
    assert len(xs_at_wall) > 0
    assert (xs_at_wall[:, 1] > 4.0).all() and (xs_at_wall[:, 1] < 9.5).all()
    # unwrapped yaw: consecutive yaw deltas bounded by BFS depth * bin
    dyaw = np.abs(np.diff(res.path[:, 2]))
    assert dyaw.max() <= 5 * (2 * np.pi / 4) + 1e-9


def test_astar_blocked():
    pts = [(10.2, y + 0.5, 0.5) for y in range(12)]
    pts += [(0.1, 0.1, 0.1), (19.9, 11.9, 1.9)]
    g = GridMap.from_points(np.asarray(pts), 1.0, 1)
    shape = shapes.make_shape("Circle")
    ker = kops.rasterize_shape_kernels(shape, 5, 4, 1.0, 0.5)
    feas = np.asarray(kops.feasibility_maps(jnp.asarray(g.occ2d), ker))
    res = astar.search(g, feas, None, np.array([2.5, 6.5, 0.0]),
                       np.array([17.5, 6.5, 0.0]), 4)
    assert not res.success


def test_esdf_matches_bruteforce():
    occ = np.zeros((16, 12), np.uint8)
    occ[4:6, 3:9] = 1
    occ[12, 2] = 1
    field = np.asarray(esdf_ops.esdf(occ, resolution=0.5))
    # brute force
    oi, oj = np.nonzero(occ)
    fi, fj = np.nonzero(1 - occ)
    for k in range(0, len(fi), 7):
        i, j = fi[k], fj[k]
        d = np.sqrt((oi - i) ** 2 + (oj - j) ** 2).min() * 0.5
        np.testing.assert_allclose(field[i, j], d, atol=1e-6)
    ii, jj = np.nonzero(occ)
    for k in range(len(ii)):
        i, j = ii[k], jj[k]
        d = np.sqrt((fi - i) ** 2 + (fj - j) ** 2).min() * 0.5
        np.testing.assert_allclose(field[i, j], -d, atol=1e-6)


def test_esdf_interp():
    occ = np.zeros((8, 8, 4), np.uint8)
    occ[4, 4, 1] = 1
    f = esdf_ops.esdf(occ, 1.0)
    v = esdf_ops.interp_sdf(f, np.zeros(3), 1.0,
                            jnp.asarray([[1.0, 4.5, 1.5]]))
    # ~3.5 cells from the obstacle center
    assert 2.5 < float(v[0]) < 4.5


@pytest.mark.skipif(not HAVE_REF, reason="reference fixtures not mounted")
def test_fixture_loading():
    names = fixtures.list_scenarios()
    assert "sdHeart" in names and len(names) == 13
    sc = fixtures.load_scenario("sdHeart")
    assert sc.map_points.shape[1] == 3
    assert sc.config.kernel_size == 21
    assert abs(sc.start[0] - 15.966060638427734) < 1e-9
    assert abs(sc.goal[1] - 3.9720420837402344) < 1e-9


@pytest.mark.skipif(not HAVE_REF, reason="reference fixtures not mounted")
def test_astar_on_sdheart_fixture():
    sc = fixtures.load_scenario("sdHeart")
    g = GridMap.from_points(sc.map_points, sc.config.occupancy_resolution,
                            sc.config.sta_threshold)
    shape = shapes.shape_from_objpath(sc.config.inputdata,
                                      sc.config.poly_params)
    ker = kops.rasterize_shape_kernels(
        shape, sc.config.kernel_size, sc.config.kernel_yaw_num,
        sc.config.occupancy_resolution, 0.5)
    feas = np.asarray(kops.feasibility_maps(jnp.asarray(g.occ2d), ker))
    res = astar.search(g, feas, None, sc.start, sc.goal,
                       sc.config.kernel_yaw_num)
    assert res.success
    assert len(res.path) > 40
    np.testing.assert_allclose(res.path[0][:2], [15.5, 62.508], atol=1e-6)


def test_gridmap_esdf_convenience():
    """GridMap.generate_esdf / sdf_value / sdf_value_with_grad parity
    with the standalone ops (GridMap3D.h:55-128 API surface)."""
    import jax.numpy as jnp
    from svsdf_tpu.utils.gridmap import GridMap
    occ = np.zeros((8, 8, 4), np.uint8)
    occ[4, 4, :] = 1
    g = GridMap(resolution=0.5, xyz_min=np.zeros(3), occ=occ)
    f = np.asarray(g.generate_esdf())
    assert f.shape == occ.shape and f[4, 4, 0] < 0 < f[0, 0, 0]
    p = np.asarray([[0.6, 0.6, 0.5], [2.25, 2.25, 0.5]])
    v = np.asarray(g.sdf_value(p))
    assert v[0] > 0 and v[1] < 0.3
    v2, grad = g.sdf_value_with_grad(p)
    np.testing.assert_allclose(np.asarray(v2), v, atol=1e-6)
    assert np.asarray(grad).shape == (2, 3)
    # gradient points away from the occupied column at a free point
    d = np.asarray(grad)[0][:2]
    assert np.dot(d, np.asarray([0.6, 0.6]) - np.asarray([2.25, 2.25])) > 0


def test_conservative_yaw_kernels_superset():
    """yaw_substeps>1 stencils contain the bin-center stencil and grow
    with the substep count (union over the bin's yaw range)."""
    from svsdf_tpu.models import shapes
    from svsdf_tpu.ops import kernels as kops
    shape = shapes.make_shape("sdUnevenCapsule")
    plain = np.asarray(kops.rasterize_shape_kernels(shape, 15, 8, 1.0,
                                                    0.5))
    cons = np.asarray(kops.rasterize_shape_kernels(shape, 15, 8, 1.0,
                                                   0.5, yaw_substeps=5))
    assert np.all(cons[plain])           # superset per bin
    assert cons.sum() > plain.sum()      # strictly grows for this shape


def test_esdf_grad_no_boundary_wraparound():
    """Gradients at map edges use one-sided differences — the field's
    own finite difference, never values rolled in from the opposite
    border (regression for the jnp.roll wraparound)."""
    occ = np.zeros((16, 12, 1))
    occ[14, 6, 0] = 1                      # obstacle near the +x edge
    f, g = esdf_ops.esdf_with_grad(jnp.asarray(occ), 1.0)
    f = np.asarray(f)[..., 0]
    g = np.asarray(g)[..., 0, :]
    # at i=0 the x-gradient must match (f[1]-f[0])/h exactly
    np.testing.assert_allclose(g[0, :, 0], f[1] - f[0], atol=1e-6)
    np.testing.assert_allclose(g[-1, :, 0], f[-1] - f[-2], atol=1e-6)
    # distance to the obstacle DECREASES toward it: gradient at the
    # far edge (i=0) points away from the obstacle (positive df/dx
    # would mean distance grows with x; here it must shrink)
    assert np.all(g[0, 5:8, 0] < 0.0)
    # interior stays central
    np.testing.assert_allclose(g[7, :, 0], (f[8] - f[6]) / 2.0,
                               atol=1e-6)


def test_shape_kernels_rotate_poly_param_offset_with_robot():
    """A shape whose poly_params carry a translation must have its
    stencil offset rotate WITH the yaw bin (the body-frame convention
    used by the SVSDF query and the transition stencils)."""
    import math
    shape = shapes.make_shape("Circle", poly_params=(0.0, -3.0, 0.0))
    K = 4
    kern = np.asarray(kops.rasterize_shape_kernels(
        shape, 15, K, 1.0, 0.5))
    for b in range(K):
        yaw = kops.bin_yaw(K, b)
        # circle center in the world frame: R(yaw) @ t
        cx = -math.sin(yaw) * -3.0
        cy = math.cos(yaw) * -3.0
        ii, jj = np.nonzero(kern[b])
        cells = np.stack([ii - 7, jj - 7], -1).astype(float)  # world offs
        d = np.linalg.norm(cells - [cx, cy], axis=1)
        assert d.max() < 1.0 + 0.5 + 0.8   # radius + margin + cell diag
