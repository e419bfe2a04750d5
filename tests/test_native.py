"""Native C++ runtime (svsdf_tpu/native/runtime.cpp) vs the pure-Python
oracles: A* search, voxelization, marching squares, ESDF.

The native layer is the framework's host runtime (the counterpart of
the reference's C++ front end / map manager, front_end_Astar.hpp:243,
PCSmap_manager.cpp:88); every kernel must agree with the Python
fallback it replaces.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from svsdf_tpu import native
from svsdf_tpu.models import shapes
from svsdf_tpu.ops import esdf as esdf_ops
from svsdf_tpu.ops import kernels as kops
from svsdf_tpu.planner import astar
from svsdf_tpu.utils.gridmap import GridMap

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native runtime not built")


def _random_world(seed, n=400):
    rng = np.random.default_rng(seed)
    pts = rng.uniform([0, 0, 0], [30, 20, 2], size=(n, 3))
    # keep corridors open around start/goal
    keep = ~(((pts[:, 0] < 6) & (pts[:, 1] < 6))
             | ((pts[:, 0] > 24) & (pts[:, 1] > 14)))
    pts = pts[keep]
    pts = np.vstack([pts, [[0.0, 0.0, 0.0], [30.0, 20.0, 2.0]]])
    return pts


def test_voxelize_matches_numpy():
    pts = _random_world(0)
    g_native = GridMap.from_points(pts, 1.0, 1)
    # force the numpy path by voxelizing by hand
    xyz_min = pts.min(axis=0)
    shape = np.maximum(np.ceil((pts.max(0) - xyz_min) / 1.0).astype(int),
                       1)
    idx = np.clip(np.floor((pts - xyz_min) / 1.0).astype(int), 0,
                  shape - 1)
    counts = np.zeros(shape, np.int32)
    np.add.at(counts, (idx[:, 0], idx[:, 1], idx[:, 2]), 1)
    np.testing.assert_array_equal(g_native.occ, (counts >= 1))


@pytest.mark.parametrize("seed", [1, 2, 3])
@pytest.mark.parametrize("with_trans", [False, True])
def test_astar_native_matches_python(seed, with_trans):
    pts = _random_world(seed)
    grid = GridMap.from_points(pts, 1.0, 1)
    shape = shapes.make_shape("Circle")
    K = 4
    kern = kops.rasterize_shape_kernels(shape, 5, K, 1.0, 0.3)
    feas = np.asarray(kops.feasibility_maps(jnp.asarray(grid.occ2d),
                                            kern))
    trans = None
    if with_trans:
        st = kops.transition_stencils(shape, K, 1.0, 2.0)
        trans = np.asarray(kops.transition_feasibility(
            jnp.asarray(grid.occ2d), st))
    start = np.array([1.0, 1.0, 0.0])
    goal = np.array([28.5, 18.5, 0.0])
    r_py = astar.search(grid, feas, trans, start, goal, K,
                        use_native=False)
    r_cc = astar.search(grid, feas, trans, start, goal, K,
                        use_native=True)
    assert r_py.success == r_cc.success
    if r_py.success:
        # identical expansion semantics -> identical path and cost
        np.testing.assert_allclose(r_cc.path, r_py.path, atol=1e-9)
        np.testing.assert_array_equal(r_cc.yaw_bins, r_py.yaw_bins)


def test_astar_native_no_path():
    occ = np.zeros((12, 12, 1), np.uint8)
    occ[6, :, 0] = 1                     # full wall
    grid = GridMap(resolution=1.0, xyz_min=np.zeros(3), occ=occ)
    feas = (~occ[:, :, 0].astype(bool))[None].repeat(4, axis=0)
    r = astar.search(grid, feas, None, np.array([1.0, 1.0, 0.0]),
                     np.array([10.0, 10.0, 0.0]), 4, use_native=True)
    assert not r.success


def test_marching_squares_matches_python():
    from svsdf_tpu.viz import swept_surface as ss
    xs = np.arange(-2.0, 2.01, 0.1)
    ys = np.arange(-2.0, 2.01, 0.1)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    field = np.sqrt(gx ** 2 + gy ** 2) - 1.3      # circle
    segs_cc = ss.marching_squares(xs, ys, field)   # native path
    # python fallback
    native._lib, keep = None, native._lib
    native._failed = True
    try:
        segs_py = ss.marching_squares(xs, ys, field)
    finally:
        native._lib, native._failed = keep, False
    assert len(segs_cc) == len(segs_py)
    tot_cc = sum(np.linalg.norm(b - a) for a, b in segs_cc)
    tot_py = sum(np.linalg.norm(b - a) for a, b in segs_py)
    # both reconstruct the circle perimeter 2*pi*1.3
    assert abs(tot_cc - tot_py) < 1e-6
    assert abs(tot_cc - 2 * np.pi * 1.3) < 0.05
    # every native segment endpoint lies on the zero level set
    for a, b in segs_cc:
        for p in (a, b):
            assert abs(np.hypot(*p) - 1.3) < 0.01


def test_esdf2d_matches_device_op():
    rng = np.random.default_rng(5)
    occ = (rng.random((40, 30)) < 0.1)
    occ[0, 0] = True                       # at least one obstacle
    d_cc = native.esdf2d(occ, 0.5)
    d_dev = np.asarray(esdf_ops.esdf(jnp.asarray(occ[..., None]), 0.5)
                       )[:, :, 0]
    np.testing.assert_allclose(d_cc, d_dev, atol=1e-4)
