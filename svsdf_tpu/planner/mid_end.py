"""Mid-end warm-start trajectory optimizer (MINCO + L-BFGS).

TPU-native re-design of OriTraj
(`src/planner_algorithm/include/planner_algorithm/mid_end.hpp` +
`mid_end.cpp`): given the A* path's subsampled waypoints Q and initial
piece times, minimize

  cost = spline energy
       + rho_mid_end * sum(T)
       + weight_pr * sum_i ||junction_i - Q_i||^3        (waypoint pull)
       + integral( weight_v * L1s(|vel|^2 - vmax^2)
                 + weight_omg * L1s(|omg|^2 - omgmax^2)
                 + WC2-windowed weight_ar * L1s(attitude) ) dt

over (tau, xi) with T = forward_t(tau), waypoints = xi. The entire cost
is one pure JAX function of the decision vector, differentiated with
jax.grad — replacing the reference's hand-assembled
gradC/gradT/propogateGrad plumbing (mid_end.hpp:277-331, 436-601).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from svsdf_tpu.ops import flatness, minco
from svsdf_tpu.utils import lbfgs
from svsdf_tpu.utils import trajectory as trj
from svsdf_tpu.utils.config import PlannerConfig
from svsdf_tpu.utils.transforms import (backward_t, forward_t, safe_norm,
                                        smoothed_l1)


def wc2(x):
    """C^1 window on [-1, 1] (WC2, mid_end.hpp:418-434)."""
    return jnp.where(
        x < -1.0, 0.0,
        jnp.where(x < -0.5, 2.0 * (x + 1.0) ** 2,
                  jnp.where(x < 0.5, 1.0 - 2.0 * x * x,
                            jnp.where(x < 1.0, 2.0 * (x - 1.0) ** 2, 0.0))))


class MidEndProblem(NamedTuple):
    head: jnp.ndarray        # (3, 3) rows pos/vel/acc
    tail: jnp.ndarray        # (3, 3)
    ref_points: jnp.ndarray  # (N-1, 3) A* waypoints Q
    ref_rots: jnp.ndarray    # (N-1, 3, 3) attitude refs (att_constraints)


def attitude_cost(quat, rot_ref):
    """Attitude attraction 6 - 2*tr(R_ref^T R(q)) expanded in quaternion
    components (costaltitude, mid_end.hpp:374-392). quat (..., 4) wxyz,
    rot_ref (..., 3, 3); zero iff R(q) == R_ref."""
    w, x, y, z = (quat[..., 0], quat[..., 1], quat[..., 2],
                  quat[..., 3])
    a0, a1, a2 = (rot_ref[..., 0, 0], rot_ref[..., 0, 1],
                  rot_ref[..., 0, 2])
    b0, b1, b2 = (rot_ref[..., 1, 0], rot_ref[..., 1, 1],
                  rot_ref[..., 1, 2])
    c0, c1, c2 = (rot_ref[..., 2, 0], rot_ref[..., 2, 1],
                  rot_ref[..., 2, 2])
    return (2 * a0 * (2 * y * y + 2 * z * z - 1)
            + 2 * b1 * (2 * x * x + 2 * z * z - 1)
            + 2 * c2 * (2 * x * x + 2 * y * y - 1)
            + 2 * a1 * (2 * w * z - 2 * x * y)
            - 2 * a2 * (2 * w * y + 2 * x * z)
            - 2 * b0 * (2 * w * z + 2 * x * y)
            + 2 * b2 * (2 * w * x - 2 * y * z)
            + 2 * c0 * (2 * w * y - 2 * x * z)
            - 2 * c1 * (2 * w * x + 2 * y * z) + 6)


def _integral_penalty(traj: trj.Trajectory, cfg: PlannerConfig,
                      fparams: flatness.FlatnessParams, ref_rots):
    """Quadrature dynamic-feasibility penalty
    (addTimeIntPenalty, mid_end.hpp:436-601)."""
    n = traj.num_pieces
    res = cfg.integralIntervs
    frac = jnp.arange(res + 1) / res                     # (J,)
    s = traj.durations[:, None] * frac[None, :]          # (N, J)
    c = traj.coeffs                                       # (N, 6, 3)

    def at(order):
        beta = trj._basis(s, order)                       # (N, J, 6)
        return jnp.einsum("njk,nkd->njd", beta, c)

    vel = at(1)
    acc = at(2)
    jer = at(3)
    zero = jnp.zeros(s.shape)
    _, quat, omg = flatness.forward(vel, acc, jer, zero, zero, fparams)

    viola_vel = jnp.sum(vel * vel, -1) - cfg.vmax ** 2
    viola_omg = jnp.sum(omg * omg, -1) - cfg.omgmax ** 2
    pena = (cfg.weight_v * smoothed_l1(viola_vel, cfg.smoothingEps)
            + cfg.weight_omg * smoothed_l1(viola_omg, cfg.smoothingEps))

    if cfg.weight_ar != 0.0:
        # attitude attraction toward per-junction reference rotations,
        # windowed by WC2 across each piece (mid_end.hpp:374-416,497-580)
        eye = jnp.eye(3)
        rot_l = jnp.concatenate([eye[None], ref_rots], axis=0)   # (N,3,3)
        rot_r = jnp.concatenate([ref_rots, eye[None]], axis=0)   # (N,3,3)
        mid = 0.5 * traj.durations[:, None]
        use_l = s <= mid
        norm_t = jnp.where(use_l, s / mid, (s - mid) / mid - 1.0)
        krt = wc2(norm_t)
        rot_ref = jnp.where(use_l[..., None, None], rot_l[:, None],
                            rot_r[:, None])
        cost_att = attitude_cost(quat, rot_ref)
        pena = pena + (krt * cfg.weight_ar
                       * smoothed_l1(cost_att, cfg.smoothingEps))

    node = jnp.full((res + 1,), 1.0).at[0].set(0.5).at[-1].set(0.5)
    step = traj.durations / res
    return jnp.sum(pena * node[None, :] * step[:, None])


def make_cost_fn(problem: MidEndProblem, cfg: PlannerConfig):
    """Returns cost(x) with x = [tau (N,); xi (3(N-1),)]."""
    n = problem.ref_points.shape[0] + 1
    fparams = flatness.FlatnessParams(
        mass=cfg.vehicleMass, grav=cfg.gravAcc, dh=cfg.horizDrag,
        dv=cfg.vertDrag, cp=cfg.parasDrag, veps=cfg.speedEps)

    def cost(x):
        tau = x[:n]
        wps = x[n:].reshape(n - 1, 3)
        times = forward_t(tau)
        traj = minco.solve(times, problem.head, problem.tail, wps)
        c = minco.energy(traj)
        # waypoint attraction ||junction - Q||^3 (addPosePenalty with
        # alpha=0 evaluates each segment start, mid_end.hpp:213-275)
        junctions = traj.coeffs[1:, 0, :]                # (N-1, 3)
        diff = junctions - problem.ref_points
        c = c + cfg.weight_pr * jnp.sum(safe_norm(diff) ** 3)
        c = c + _integral_penalty(traj, cfg, fparams, problem.ref_rots)
        c = c + cfg.rho_mid_end * jnp.sum(times)
        return c

    return cost


class MidEndResult(NamedTuple):
    traj: trj.Trajectory
    opt_x: jnp.ndarray
    cost: jnp.ndarray
    n_iters: jnp.ndarray


@functools.partial(jax.jit, static_argnums=(2, 3))
def _run(x0, problem, cfg: PlannerConfig, max_iters: int):
    n = problem.ref_points.shape[0] + 1
    cost = make_cost_fn(problem, cfg)
    params = lbfgs.LBFGSParams(
        mem_size=cfg.mem_size, max_iterations=max_iters,
        g_epsilon=max(cfg.g_epsilon, 1e-7), past=3,
        delta=cfg.relCostTolMidEnd)
    res = lbfgs.minimize(jax.value_and_grad(cost), x0, params)
    times = forward_t(res.x[:n])
    wps = res.x[n:].reshape(n - 1, 3)
    traj = minco.solve(times, problem.head, problem.tail, wps)
    return MidEndResult(traj, res.x, res.f, res.n_iters)


def optimize(head, tail, waypoints, times, ref_rots=None,
             cfg: PlannerConfig = PlannerConfig(),
             max_iters: int = 100) -> MidEndResult:
    """Run the mid end (getOriTraj, mid_end.cpp:3-94).

    head/tail: (3, 3) rows pos/vel/acc (columns of the reference's
    Matrix3d states); waypoints: (N-1, 3); times: (N,) initial piece
    durations (config.inittime each). max_iters=100 mirrors the
    earlyExit cap (mid_end.hpp:603-618: k > 1e2).
    """
    waypoints = jnp.asarray(waypoints)
    n = waypoints.shape[0] + 1
    if ref_rots is None:
        ref_rots = jnp.tile(jnp.eye(3)[None], (n - 1, 1, 1))
    problem = MidEndProblem(jnp.asarray(head), jnp.asarray(tail),
                            waypoints, jnp.asarray(ref_rots))
    x0 = jnp.concatenate([backward_t(jnp.asarray(times)),
                          waypoints.reshape(-1)])
    return _run(x0, problem, cfg, max_iters)
