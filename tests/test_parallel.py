"""Multi-chip sharded planning on the 8-device virtual CPU mesh:
the sharded cost/grad must match the unsharded computation exactly
(the psum over the obs axis replaces the reference's omp-critical
gradient merge, SURVEY.md §2.6)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from svsdf_tpu.models import shapes
from svsdf_tpu.ops import minco
from svsdf_tpu.ops.svsdf import SVSDFConfig
from svsdf_tpu.parallel import batch as pbatch
from svsdf_tpu.planner import back_end
from svsdf_tpu.utils.config import PlannerConfig
from svsdf_tpu.utils.transforms import backward_t, forward_t

SVS = SVSDFConfig(coarse_n=32, refine_rounds=1, refine_n=8,
                  use_inside=False, use_pallas=False)
CFG = PlannerConfig()
N = 4


def _problem(batch, n_obs, seed=0):
    rng = np.random.default_rng(seed)
    head = np.zeros((batch, 3, 3), np.float32)
    tail = np.zeros((batch, 3, 3), np.float32)
    tail[:, 0, :2] = rng.uniform([4, -1], [6, 1], (batch, 2))
    frac = np.linspace(0, 1, N + 1)[1:-1]
    wps = (tail[:, 0][:, None, :2] * frac[None, :, None])
    wps = np.concatenate(
        [wps, np.zeros((batch, N - 1, 1), np.float32)], -1)
    obs = rng.uniform([0, -2], [6, 2], (batch, n_obs, 2)).astype(
        np.float32)
    tau = np.tile(np.asarray(backward_t(jnp.full((N,), 1.4))),
                  (batch, 1))
    x0 = np.concatenate([tau, wps.reshape(batch, -1)],
                        axis=1).astype(np.float32)
    return (jnp.asarray(head), jnp.asarray(tail), jnp.asarray(obs),
            jnp.asarray(x0))


@pytest.mark.parametrize("mesh_shape", [
    (2, 4),
    # the other mesh layouts exercise the same psum/out_spec logic at
    # ~70 s each on the 2-core CI host — slow-lane only
    pytest.param((4, 2), marks=pytest.mark.slow),
    pytest.param((8, 1), marks=pytest.mark.slow),
])
def test_sharded_value_and_grad_matches_unsharded(mesh_shape):
    n_scn, n_obs_ax = mesh_shape
    if len(jax.devices()) < n_scn * n_obs_ax:
        pytest.skip("needs 8 virtual devices")
    shape = shapes.make_shape("Circle")
    batch, n_obs = n_scn * 2, n_obs_ax * 4
    head, tail, obs, x0 = _problem(batch, n_obs)
    mesh = pbatch.make_mesh(n_scn, n_obs_ax)
    vg = pbatch.sharded_value_and_grad(shape, mesh, CFG, SVS, N)
    cost_s, grad_s = vg(x0, head, tail, obs)

    # unsharded oracle
    def one(x, h, t, o):
        def c(xx):
            times = forward_t(xx[:N])
            wps = xx[N:].reshape(N - 1, 3)
            traj = minco.solve(times, h, t, wps)
            pen, _ = back_end.svsdf_penalty(shape, traj, o, CFG, SVS)
            return minco.energy(traj) + CFG.rho * jnp.sum(times) + pen
        return jax.value_and_grad(c)(x)

    cost_u, grad_u = jax.vmap(one)(x0, head, tail, obs)
    np.testing.assert_allclose(np.asarray(cost_s), np.asarray(cost_u),
                               rtol=2e-5)
    # f32 everywhere (inputs are f32): the obs-axis psum sums partial
    # gradients in a different order than the unsharded reduction, and
    # the CR solver's refinement step propagates that rounding — ~6e-4
    # relative on near-zero components is reduction-order noise, not a
    # sharding bug.
    np.testing.assert_allclose(np.asarray(grad_s), np.asarray(grad_u),
                               rtol=1e-3, atol=1e-4)


def test_sharded_step_decreases_cost():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    shape = shapes.make_shape("Circle")
    mesh = pbatch.make_mesh(4, 2)
    head, tail, obs, x0 = _problem(8, 8, seed=1)
    step = pbatch.sharded_step(shape, mesh, CFG, SVS, N, lr=1e-3)
    x1, c0 = step(x0, head, tail, obs)
    _, c1 = step(x1, head, tail, obs)
    assert float(c1.mean()) < float(c0.mean())


def test_plan_batch_runs_and_converges_somewhere():
    shape = shapes.make_shape("Circle")
    head, tail, obs, x0 = _problem(4, 8, seed=2)
    probs = back_end.BackEndProblem(head, tail, obs)
    out = pbatch.plan_batch(shape, x0, probs, CFG, SVS, N, 25)
    assert out.cost.shape == (4,)
    assert np.isfinite(np.asarray(out.cost)).all()


@pytest.mark.slow
def test_plan_batch_staged_with_per_stage_ls():
    """Staged solve with (cfg, iters) and (cfg, iters, ls) stage forms;
    warm-started stages must not increase the final-stage cost family
    and bf16 coarse scan must produce finite results."""
    head, tail, obs, x0 = _problem(4, 8)
    probs = back_end.BackEndProblem(head, tail, obs)
    svs_bf16 = SVSDFConfig(coarse_n=32, refine_rounds=1, refine_n=8,
                           use_inside=False, use_pallas=False,
                           scan_dtype="bfloat16")
    stages = ((svs_bf16, 6, 2), (SVS, 4))     # mixed tuple arities
    out = pbatch.plan_batch_staged(shapes.make_shape("Circle"), x0,
                                   probs, CFG, stages, N)
    assert out.cost.shape == (4,)
    assert bool(jnp.all(jnp.isfinite(out.cost)))
    # staged result is no worse than the plain 4-iter single-stage run
    out1 = pbatch.plan_batch(shapes.make_shape("Circle"), x0, probs,
                             CFG, SVS, N, 4)
    assert float(out.cost.mean()) <= float(out1.cost.mean()) * 1.5


@pytest.mark.slow
def test_sharded_full_solve_matches_unsharded():
    """sharded_plan_batch (full L-BFGS inside shard_map, obs-psum per
    iteration) must match the single-device vmapped solve."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    shape = shapes.make_shape("Circle")
    head, tail, obs, x0 = _problem(2, 8)
    mesh = pbatch.make_mesh(2, 2)
    run = pbatch.sharded_plan_batch(shape, mesh, CFG, SVS, N,
                                    max_iters=15, max_linesearch=4)
    xs, fs, its, conv = run(x0, head, tail, obs)
    probs = back_end.BackEndProblem(head, tail, obs)
    ref = pbatch.plan_batch(shape, x0, probs, CFG, SVS, N, 15)
    # The obs-psum reassociates the penalty sum; over a branchy
    # nonsmooth line search the iterate paths diverge at fp-noise
    # scale, so compare converged QUALITY, not the iterate path.
    np.testing.assert_allclose(np.asarray(fs), np.asarray(ref.cost),
                               rtol=2e-3)
    # and the very first evaluation must match tightly (pure psum).
    # f32 inputs: the per-shard partial sums + psum reassociate the
    # penalty reduction and the CR solver's fusions round differently
    # under shard_map vs vmap, so "tight" is f32-noise (~1e-7), not
    # bitwise — 1e-6 still catches structural bugs like the obs-axis
    # gradient truncation this test originally guarded.
    vg = pbatch.sharded_value_and_grad(shape, mesh, CFG, SVS, N)
    f0s, g0s = vg(x0, head, tail, obs)
    f0 = jax.vmap(lambda x, h, t, o: back_end.make_cost_fn(
        shape, back_end.BackEndProblem(h, t, o), CFG, SVS, N)(x))(
            x0, head, tail, obs)
    np.testing.assert_allclose(np.asarray(f0s), np.asarray(f0),
                               rtol=1e-6)


def test_plan_batch_e2e_device_pipeline():
    """Fully-batched end-to-end planning (wavefront front end +
    resample + harvest + staged solve) in one dispatch."""
    from svsdf_tpu.ops import kernels as kops
    from svsdf_tpu.utils.gridmap import GridMap

    # corridor map with a gap (same layout as test_planner_e2e)
    pts = []
    for x in range(24):
        for z in range(2):
            if not (10 <= x <= 13):
                pts.append((x + 0.5, 7.2, z + 0.5))
    pts += [(0.05, 0.05, 0.05), (23.9, 15.9, 1.9)]
    grid = GridMap.from_points(np.asarray(pts), 1.0, 1)
    shape = shapes.make_shape("Circle")
    kernels = kops.rasterize_shape_kernels(shape, 7, 4, 1.0, 0.5)
    feas = kops.feasibility_maps(jnp.asarray(grid.occ2d), kernels)

    ii, jj = np.nonzero(grid.occ2d)
    occ_pts = np.stack([grid.xyz_min[0] + (ii + 0.5) * 1.0,
                        grid.xyz_min[1] + (jj + 0.5) * 1.0], -1)
    occ_pts = jnp.asarray(occ_pts, jnp.float32)

    starts = jnp.asarray([[3, 3], [2, 5], [4, 2]], jnp.int32)
    goals = jnp.asarray([[20, 12], [21, 11], [19, 13]], jnp.int32)
    svs = SVSDFConfig(coarse_n=48, refine_rounds=1, refine_n=8,
                      use_inside=False, use_pallas=False)
    stages = ((svs, 15, 2),)
    out = pbatch.plan_batch_e2e(shape, feas, occ_pts, starts, goals,
                                CFG, stages, 6, 16, 1.0,
                                jnp.asarray(grid.xyz_min[:2],
                                            jnp.float32))
    assert bool(jnp.all(out.front_ok))
    assert bool(jnp.all(jnp.isfinite(out.cost)))
    # every plan clears its harvested obstacle set
    assert float(out.cert_min.min()) > 0.0
    # endpoints honored: tail position is the goal cell center
    goal_xy = grid.xyz_min[None, :2] + (np.asarray(goals) + 0.5) * 1.0
    np.testing.assert_allclose(np.asarray(out.tail[:, 0, :2]), goal_xy,
                               atol=1e-4)


@pytest.mark.slow
def test_sharded_plan_batch_e2e_matches_single_device():
    """Sharded e2e planning (scn-axis data parallel) matches the
    single-device call on the same inputs."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from svsdf_tpu.ops import kernels as kops
    from svsdf_tpu.utils.gridmap import GridMap

    pts = [(x + 0.5, 7.2, 0.5) for x in range(24)
           if not (10 <= x <= 13)]
    pts += [(0.05, 0.05, 0.05), (23.9, 15.9, 1.9)]
    grid = GridMap.from_points(np.asarray(pts), 1.0, 1)
    shape = shapes.make_shape("Circle")
    kernels = kops.rasterize_shape_kernels(shape, 7, 4, 1.0, 0.5)
    feas = kops.feasibility_maps(jnp.asarray(grid.occ2d), kernels)
    ii, jj = np.nonzero(grid.occ2d)
    occ_pts = jnp.asarray(np.stack(
        [grid.xyz_min[0] + (ii + 0.5), grid.xyz_min[1] + (jj + 0.5)],
        -1), jnp.float32)
    starts = jnp.asarray([[3, 3], [2, 5], [4, 2], [3, 4]], jnp.int32)
    goals = jnp.asarray([[20, 12], [21, 11], [19, 13], [20, 11]],
                        jnp.int32)
    svs = SVSDFConfig(coarse_n=48, refine_rounds=1, refine_n=8,
                      use_inside=False, use_pallas=False)
    stages = ((svs, 10, 2),)
    xy_min = jnp.asarray(grid.xyz_min[:2], jnp.float32)
    mesh = pbatch.make_mesh(4, 1)
    run = pbatch.sharded_plan_batch_e2e(shape, mesh, CFG, stages, 6,
                                        16, 1.0, xy_min)
    out_s = run(feas, occ_pts, starts, goals)
    out_1 = pbatch.plan_batch_e2e(shape, feas, occ_pts, starts, goals,
                                  CFG, stages, 6, 16, 1.0, xy_min)
    assert bool(jnp.all(out_s.front_ok))
    np.testing.assert_allclose(np.asarray(out_s.cost),
                               np.asarray(out_1.cost), rtol=2e-3)


@pytest.mark.slow
def test_plan_batch_staged_parallel_linesearch():
    """4-element stage tuples (cfg, iters, ls, ls_candidates) select
    the batched parallel line search; results stay finite and sane."""
    head, tail, obs, x0 = _problem(4, 8)
    probs = back_end.BackEndProblem(head, tail, obs)
    stages = ((SVS, 8, 2, 4),)
    out = pbatch.plan_batch_staged(shapes.make_shape("Circle"), x0,
                                   probs, CFG, stages, N)
    assert bool(jnp.all(jnp.isfinite(out.cost)))
    ref = pbatch.plan_batch(shapes.make_shape("Circle"), x0, probs,
                            CFG, SVS, N, 8)
    assert float(out.cost.mean()) <= float(ref.cost.mean()) * 1.5
