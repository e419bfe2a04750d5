"""Back-end solver selection: nonsmooth L-BFGS (default) vs LMBM."""

import numpy as np
import jax.numpy as jnp
import pytest

from svsdf_tpu.models import shapes
from svsdf_tpu.ops.svsdf import SVSDFConfig
from svsdf_tpu.planner import back_end
from svsdf_tpu.utils.transforms import backward_t

SVS = SVSDFConfig(coarse_n=48, refine_rounds=1, refine_n=8,
                  use_inside=False, use_pallas=False)


def _problem(n=4, n_obs=12, seed=0):
    rng = np.random.default_rng(seed)
    head = np.zeros((3, 3), np.float32)
    tail = np.zeros((3, 3), np.float32)
    tail[0] = [6.0, 0.5, 0.3]
    wps = np.stack([np.linspace(1.5, 4.5, n - 1),
                    rng.normal(0, 0.2, n - 1),
                    np.linspace(0, 0.2, n - 1)], -1).astype(np.float32)
    obs = rng.uniform([0, -2.5], [6, 2.5], (n_obs, 2)).astype(np.float32)
    x0 = np.concatenate([np.asarray(backward_t(jnp.full((n,), 1.4))),
                         wps.ravel()]).astype(np.float32)
    return head, tail, obs, x0


@pytest.mark.slow
@pytest.mark.parametrize("solver", ["lbfgs", "lmbm"])
def test_back_end_solver_improves_cost(solver):
    shape = shapes.make_shape("Circle")
    head, tail, obs, x0 = _problem()
    n = 4
    cost0 = back_end.make_cost_fn(
        shape, back_end.BackEndProblem(jnp.asarray(head),
                                       jnp.asarray(tail),
                                       jnp.asarray(obs)),
        __import__("svsdf_tpu.utils.config",
                   fromlist=["PlannerConfig"]).PlannerConfig(),
        SVS, n)(jnp.asarray(x0))
    res = back_end.optimize(shape, head, tail, obs, x0, svs_cfg=SVS,
                            max_iters=40, solver=solver)
    assert float(res.cost) < float(cost0)
    assert np.isfinite(float(res.cost))
    assert res.traj.coeffs.shape[0] == n


def _min_svsdf(shape, traj, obs):
    from svsdf_tpu.ops.svsdf import svsdf_query
    return float(svsdf_query(shape, traj, jnp.asarray(obs), SVS,
                             with_inside=False).sdf.min())


@pytest.mark.slow
def test_solvers_reach_comparable_cost():
    """L-BFGS (our default) and LMBM (the reference's solver,
    lmbm.h:214) must land in the same cost regime on a corridor
    problem — neither is allowed to be a stub that barely moves."""
    shape = shapes.make_shape("sdHeart")
    head, tail, obs, x0 = _problem(n=5, n_obs=24, seed=3)
    costs = {}
    for solver in ("lbfgs", "lmbm"):
        res = back_end.optimize(shape, head, tail, obs, x0,
                                svs_cfg=SVS, max_iters=80,
                                solver=solver)
        costs[solver] = float(res.cost)
    lo = min(costs.values())
    assert lo > 0
    for solver, c in costs.items():
        assert c < 1.6 * lo, costs


@pytest.mark.slow
def test_solvers_clear_obstacles_from_colliding_start():
    """Warm start threaded THROUGH an obstacle: both solvers must push
    the swept volume off the obstacle set (certificate improvement,
    the reference's whole point — back_end_optimizer.hpp:774-868)."""
    import dataclasses

    shape = shapes.make_shape("Circle")
    head = np.zeros((3, 3), np.float32)
    tail = np.zeros((3, 3), np.float32)
    tail[0] = [6.0, 0.0, 0.0]
    n = 4
    wps = np.stack([np.linspace(1.5, 4.5, n - 1), np.zeros(n - 1),
                    np.zeros(n - 1)], -1).astype(np.float32)
    # one obstacle slightly off the path axis: the interior GSIP
    # gradient points the escape direction unambiguously (a perfectly
    # centered symmetric set is a measure-zero equilibrium both
    # solvers can legitimately sit on)
    obs = np.asarray([[3.0, 0.25]], np.float32)
    x0 = np.concatenate([np.asarray(backward_t(jnp.full((n,), 1.4))),
                         wps.ravel()]).astype(np.float32)
    svs_in = dataclasses.replace(SVS, use_inside=True, gsip_iters=4,
                                 gsip_coarse_n=32)
    start_margin = None
    for solver in ("lbfgs", "lmbm"):
        res = back_end.optimize(shape, head, tail, obs, x0,
                                svs_cfg=svs_in, max_iters=100,
                                solver=solver)
        if start_margin is None:
            from svsdf_tpu.ops import minco
            from svsdf_tpu.utils.transforms import forward_t
            times = forward_t(jnp.asarray(x0[:n]))
            traj0 = minco.solve(times, jnp.asarray(head),
                                jnp.asarray(tail),
                                jnp.asarray(wps))
            start_margin = _min_svsdf(shape, traj0, obs)
        final = _min_svsdf(shape, res.traj, obs)
        assert start_margin < 0          # the warm start collides
        assert final > start_margin + 0.3, (solver, start_margin,
                                            final)


def test_scheduled_continuation_matches_staged_quality():
    """The single-loop traced-mu continuation (lbfgs
    minimize_scheduled) must reach the same cost basin as running the
    final-mu problem directly from the same warm start — the
    continuation is a robustness device, not a quality tax."""
    shape = shapes.make_shape("Circle")
    head, tail, obs, x0 = _problem(n=4, n_obs=16, seed=5)
    sched = back_end.optimize(shape, head, tail, obs, x0, svs_cfg=SVS,
                              max_iters=80,
                              mu_schedule=(0.5, 0.1, 0.01))
    sharp = back_end.optimize(shape, head, tail, obs, x0, svs_cfg=SVS,
                              max_iters=80, mu_schedule=(0.01,))
    assert float(sched.cost) < 1.3 * float(sharp.cost) + 1e-6
