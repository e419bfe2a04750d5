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
