"""Numeric parity instruments against the reference pipeline.

Two tools:

1. ``reference_cost`` — an evaluator of the reference back end's EXACT
   cost functional (costFunctionLmbmParallel,
   `src/planner_algorithm/include/planner_algorithm/back_end_optimizer.hpp:344-430`):

     J(traj) = minco energy                        (getEnergy)
             + rho * sum(T)                        (weightT * times.sum())
             + weight_p * sum_obs smoothedL1(safety_hor - SVSDF(p), mu)
                                                   (addSaftyPena..., :774-868;
                                                    mu hardcoded 0.01 in
                                                    grad_cost_p_sw, :1011)

   scoring OUR trajectories on the REFERENCE's own metric, so parity is
   a number, not an assertion.

2. ``reference_mode_plan`` — the pipeline restricted to the reference's
   algorithmic scope: A* -> mid end -> ONE back-end solve over the
   AABB-harvested obstacle set only. No map-wide certify-refine
   rounds, no retry ladder, no conservative kernels, no fine-yaw
   escalation (the reference has none of these,
   plan_manager.cpp:96-231). Running the map-wide certificate on the
   RESULT of this mode measures what the reference's algorithm ships:
   any negative margin here is a collision the reference's own
   pipeline would emit silently.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from svsdf_tpu.models.shapes import Shape2D
from svsdf_tpu.ops import minco
from svsdf_tpu.ops.svsdf import DEFAULT_CONFIG, SVSDFConfig, svsdf_query
from svsdf_tpu.utils import trajectory as trj
from svsdf_tpu.utils.config import PlannerConfig
from svsdf_tpu.utils.transforms import smoothed_l1


class ReferenceCost(NamedTuple):
    energy: float      # minco spline energy
    time: float        # rho * sum(T)
    penalty: float     # weight_p * sum smoothedL1(safety_hor - svsdf)
    total: float
    min_svsdf: float   # min true SVSDF over the obstacle set
    n_active: int      # obstacles with nonzero hinge


def reference_cost(shape: Shape2D, traj: trj.Trajectory, obstacles,
                   cfg: PlannerConfig,
                   svs_cfg: SVSDFConfig = DEFAULT_CONFIG,
                   mu: float = 0.01) -> ReferenceCost:
    """Score a trajectory on the reference's exact back-end functional
    (see module docstring). obstacles: (M, >=2) world points (the
    reference drops the z/yaw component, back_end_optimizer.hpp:792).
    The SVSDF is the TRUE one (GSIP interior distance), matching
    getTrueSDFofSweptVolume<true> (:795)."""
    obstacles = jnp.asarray(np.asarray(obstacles)[:, :2], jnp.float32)
    energy = float(minco.energy(traj))
    time_cost = float(cfg.rho * jnp.sum(traj.durations))
    if obstacles.shape[0]:
        res = svsdf_query(shape, traj, obstacles, svs_cfg,
                          with_inside=True)
        hinge = smoothed_l1(cfg.safety_hor - res.sdf, mu)
        penalty = float(cfg.weight_p * jnp.sum(hinge))
        min_sdf = float(jnp.min(res.sdf))
        n_active = int(jnp.sum(hinge > 0.0))
    else:
        penalty, min_sdf, n_active = 0.0, float("inf"), 0
    return ReferenceCost(energy, time_cost, penalty,
                         energy + time_cost + penalty, min_sdf,
                         n_active)


def reference_mode_plan(planner, start, goal, mid_iters: int = 100,
                        back_iters: int = 200):
    """Run the pipeline restricted to the reference's algorithmic
    scope (module docstring): one front-end pass, one mid-end solve,
    one back-end solve on the harvested AABB obstacle set — no
    certify-refine, no retries. Returns a PlanResult whose
    `certified`/`min_cert_sdf` report the map-wide certificate the
    reference never computes: negative means the reference-scope
    algorithm shipped a silently colliding trajectory."""
    import math as _math

    from svsdf_tpu.planner import back_end, mid_end
    from svsdf_tpu.planner.pipeline import PlanResult, _rotz

    start, goal = np.asarray(start), np.asarray(goal)
    front = planner.generate_path(start, goal)
    empty = np.zeros((0, 3))
    if not front.success:
        return PlanResult(False, None, None, front.path, empty,
                          float("nan"), float("nan"))
    path = front.path
    q = planner._subsample(path, 3.0)
    if len(q) == 0:
        q = path[len(path) // 2][None]
    obstacles = planner._harvest(q)
    n = len(q) + 1
    head = np.zeros((3, 3))
    tail = np.zeros((3, 3))
    head[0] = path[0]
    tail[0] = path[-1]
    times = np.full(n, planner.config.inittime)
    ref_rots = np.stack([_rotz(w[2]) for w in q])
    mid = mid_end.optimize(head, tail, q, times, ref_rots,
                           planner.config, max_iters=mid_iters)
    obstacles = planner._pad_obstacles(obstacles)
    back = back_end.optimize(planner.shape, head, tail, obstacles,
                             mid.opt_x, planner.config, planner.svs_cfg,
                             max_iters=back_iters, solver=planner.solver)
    pts, sdf = planner.certify(back.traj)
    min_sdf = float(sdf.min()) if len(sdf) else float("inf")
    return PlanResult(True, back.traj, mid.traj, path, obstacles,
                      float(mid.cost), float(back.cost),
                      certified=(min_sdf > 0.0), min_cert_sdf=min_sdf)
