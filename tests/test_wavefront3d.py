"""Tests for the 3-D (yaw, x, y) wavefront front end and the DP yaw
assignment (planner/wavefront.py distance_field_3d / extract_path_3d /
assign_yaws_dp) — the device analogue of the reference A*'s
checkSubSWCollision transition veto (front_end_Astar.hpp:218-227)
promoted into the search graph."""

import itertools

import numpy as np
import jax.numpy as jnp
import pytest

from svsdf_tpu.planner import wavefront


def _brute_force_dp(fpath, K):
    """Minimal total circular rotation assignment by enumeration."""
    L = len(fpath)
    best = None
    for combo in itertools.product(range(K), repeat=L):
        if not all(fpath[i][combo[i]] for i in range(L)):
            continue
        cost = sum(min((combo[i + 1] - combo[i]) % K,
                       (combo[i] - combo[i + 1]) % K)
                   for i in range(L - 1))
        if best is None or cost < best:
            best = cost
    return best


def test_assign_yaws_dp_matches_bruteforce_optimum():
    rng = np.random.default_rng(0)
    K, L = 5, 6
    for _ in range(8):
        fpath = rng.random((L, K)) < 0.55
        fpath[:, rng.integers(0, K)] |= True    # keep it feasible
        feas = np.zeros((K, L, 1), bool)
        feas[:, np.arange(L), 0] = fpath.T
        path = jnp.asarray(np.stack([np.arange(L),
                                     np.zeros(L, int)], -1))
        bins = np.asarray(wavefront.assign_yaws_dp(jnp.asarray(feas),
                                                   path))
        assert all(fpath[i][bins[i]] for i in range(L))
        cost = sum(min((bins[i + 1] - bins[i]) % K,
                       (bins[i] - bins[i + 1]) % K)
                   for i in range(L - 1))
        assert cost == _brute_force_dp(fpath, K)


def _tiny_world():
    """4-bin, 6x5 world. trans_feas allows +-1 bin per move except
    through a 'rotation-blocked' column x=3 where only delta=0 passes."""
    K, X, Y = 4, 6, 5
    feas = np.ones((K, X, Y), bool)
    D = 3   # deltas 0, -1, +1 (YAW_BFS_DELTAS order)
    trans = np.ones((K, D, 8, X, Y), bool)
    trans[:, 1:, :, 3, :] = False        # no rotation INTO column 3
    return (jnp.asarray(feas), jnp.asarray(trans)), (K, X, Y)


def test_distance_field_3d_reaches_goal_and_respects_transitions():
    (feas, trans), (K, X, Y) = _tiny_world()
    goal = jnp.asarray([5, 2])
    d3 = wavefront.distance_field_3d(feas, trans, goal)
    assert d3.shape == (K, X, Y)
    assert float(d3[:, 5, 2].min()) == 0.0
    path, bins, length, ok = wavefront.extract_path_3d(
        d3, trans, jnp.asarray([0, 2]), max_len=32)
    assert bool(ok)
    L = int(length)
    p = np.asarray(path)[:L]
    b = np.asarray(bins)[:L]
    assert tuple(p[-1]) == (5, 2)
    # every move is one of the 8 neighbors, every rotation <= 1 bin,
    # and no rotation lands into column x=3
    for i in range(L - 1):
        step = p[i + 1] - p[i]
        assert max(abs(step)) == 1
        db = min((b[i + 1] - b[i]) % K, (b[i] - b[i + 1]) % K)
        assert db <= 1
        if p[i + 1][0] == 3:
            assert db == 0


def test_distance_field_3d_unreachable_when_rotation_required():
    """Goal requires a different bin beyond a column that admits no
    rotation AND is bin-infeasible for the start bin family."""
    K, X, Y = 4, 6, 3
    feas = np.ones((K, X, Y), bool)
    feas[0, 3, :] = False                 # bin 0 cannot occupy x=3
    trans = np.ones((K, 3, 8, X, Y), bool)
    trans[:, 1:, :, :, :] = False         # NO rotations anywhere
    trans[0, :, :, 3, :] = False          # bin 0 cannot enter x=3
    # feasible states beyond x=3 only reachable in bins 1..3, but with
    # no rotation edges a bin-0 start can never cross
    d3 = wavefront.distance_field_3d(jnp.asarray(feas),
                                     jnp.asarray(trans),
                                     jnp.asarray([5, 1]))
    assert float(d3[0, 0, 1]) >= wavefront.INF


def test_distance_field_3d_cell_cost_biases_midchannel():
    """With a clearance cost peaking at y=0 walls, the extracted path
    prefers the mid-channel row even though both are geodesics."""
    K, X, Y = 2, 7, 5
    feas = np.ones((K, X, Y), bool)
    trans = np.ones((K, 3, 8, X, Y), bool)
    cell_cost = np.zeros((X, Y), np.float32)
    cell_cost[:, 0] = 2.0                 # wall-hugging row is pricey
    cell_cost[:, 4] = 2.0
    d3 = wavefront.distance_field_3d(
        jnp.asarray(feas), jnp.asarray(trans), jnp.asarray([6, 2]),
        cell_cost=jnp.asarray(cell_cost))
    path, bins, length, ok = wavefront.extract_path_3d(
        d3, jnp.asarray(trans), jnp.asarray([0, 0]), max_len=32,
        cell_cost=jnp.asarray(cell_cost))
    assert bool(ok)
    p = np.asarray(path)[:int(length)]
    # leaves the expensive wall row immediately, rides the middle
    assert (p[2:, 1] != 0).all() and (p[2:, 1] != 4).all()


@pytest.mark.slow
def test_e2e_certify_refine_certifies_tight_gate():
    """plan_batch_e2e with the in-dispatch certify-refine + 3-D front
    end produces a positive certificate on a gate map sized so the
    plain staged solve alone is at best marginal."""
    from svsdf_tpu.ops import kernels as kops
    from svsdf_tpu.parallel import batch as pbatch
    from svsdf_tpu.utils import fixtures
    from svsdf_tpu.utils.config import PlannerConfig
    from svsdf_tpu.utils.gridmap import GridMap

    sc = fixtures.synthetic_scenario("sdMoon")
    cfg = sc.config
    from svsdf_tpu.models import shapes
    shape = shapes.shape_from_objpath(cfg.inputdata, cfg.poly_params)
    grid = GridMap.from_points(sc.map_points,
                               cfg.occupancy_resolution,
                               cfg.sta_threshold)
    safemargin = max(cfg.front_end_safeh,
                     cfg.occupancy_resolution / 2.0)
    kernels = kops.rasterize_shape_kernels(
        shape, cfg.kernel_size, cfg.kernel_yaw_num,
        cfg.occupancy_resolution, safemargin)
    feas = kops.feasibility_maps(jnp.asarray(grid.occ2d), kernels)
    guard = (cfg.kernel_size // 2 + 2) * cfg.occupancy_resolution
    stencils = kops.transition_stencils(shape, cfg.kernel_yaw_num,
                                        cfg.occupancy_resolution,
                                        guard, n_deltas=5)
    trans_feas = kops.transition_feasibility(jnp.asarray(grid.occ2d),
                                             stencils)
    ii, jj = np.nonzero(grid.occ2d)
    occ_pts = jnp.asarray(np.stack(
        [grid.xyz_min[0] + (ii + 0.5) * grid.resolution,
         grid.xyz_min[1] + (jj + 0.5) * grid.resolution], -1),
        jnp.float32)
    s = jnp.asarray(np.asarray(
        grid.grid_index(np.asarray([sc.start[0], sc.start[1],
                                    grid.xyz_min[2] + 1e-6])))[:2],
        jnp.int32)[None]
    g = jnp.asarray(np.asarray(
        grid.grid_index(np.asarray([sc.goal[0], sc.goal[1],
                                    grid.xyz_min[2] + 1e-6])))[:2],
        jnp.int32)[None]
    stages = pbatch.default_stages(40)
    out = pbatch.plan_batch_e2e(
        shape, feas, occ_pts, s, g, cfg, stages, 8,
        min(48, occ_pts.shape[0]), grid.resolution,
        jnp.asarray(grid.xyz_min[:2], jnp.float32),
        refine_rounds=4, refine_iters=10,
        cert_margin=0.25 * cfg.safety_hor, trans_feas=trans_feas)
    assert bool(out.front_ok[0])
    assert float(out.cert_min[0]) > 0.0, float(out.cert_min[0])
