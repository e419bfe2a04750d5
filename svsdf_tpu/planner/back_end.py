"""SVSDF back-end trajectory optimizer — the framework's centerpiece.

TPU-native re-design of TrajOptimizer
(`src/planner_algorithm/include/planner_algorithm/back_end_optimizer.hpp`
+ `back_end_optimizer.cpp`): minimize the nonsmooth cost

  cost = spline energy + rho * sum(T)
       + weight_p * sum_obstacles L1s(safety_hor - SVSDF(p_obs))

over (tau, xi). The reference evaluates each obstacle's true SVSDF with
an OpenMP loop (`#pragma omp parallel for`, back_end_optimizer.hpp:785)
and merges gradients in a critical section; here the whole obstacle
batch is ONE vmapped svsdf_query on device and the gradient reduction
is a dense sum the compiler fuses.

Gradient structure (matching grad_cost_p_sw, back_end_optimizer.hpp:
1031-1066, exactly but assembled by autodiff): the SVSDF oracle
(t*, sdf*, world gradient) is computed under stop_gradient — the
envelope theorem kills the dt* term at the minimizer — then the cost is
re-expressed through a first-order surrogate

  sdf~ = sdf* + g_rel0 . (p_rel(coeffs, T; t*) - p_rel0)

whose jax.grad reproduces the reference's hand chain rule: the -R*g
translation term, the VR_theta^T (p - x) yaw term, and the -vel.grad
time accumulation over preceding pieces (via the differentiable global
-time evaluation in utils/trajectory.py).

The nonsmooth solve uses L-BFGS with weak-Wolfe line search in place of
the Fortran LMBM bundle method (utils/lbfgs.py docstring discusses why).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from svsdf_tpu.models.shapes import Shape2D
from svsdf_tpu.ops import minco
from svsdf_tpu.ops.svsdf import DEFAULT_CONFIG, SVSDFConfig, svsdf_query
from svsdf_tpu.utils import lbfgs
from svsdf_tpu.utils import lmbm
from svsdf_tpu.utils import trajectory as trj
from svsdf_tpu.utils.config import PlannerConfig
from svsdf_tpu.utils.transforms import backward_t, forward_t, smoothed_l1


class BackEndProblem(NamedTuple):
    head: jnp.ndarray        # (3, 3)
    tail: jnp.ndarray        # (3, 3)
    obstacles: jnp.ndarray   # (M, 2) world xy obstacle points (z dropped)


class OracleState(NamedTuple):
    """Frozen SVSDF linearization at an iterate — everything the
    penalty needs that came out of the (expensive, stop-gradded)
    oracle. Small: O(M) per obstacle set. Reused by the frozen-oracle
    line search (utils/lbfgs.py `frozen=`): trial steps re-evaluate
    only the cheap differentiable surrogate against this state, so one
    optimizer iteration pays exactly ONE oracle evaluation however
    deep the line search goes."""
    sdf0: jnp.ndarray      # (M,) oracle SVSDF at the iterate
    alpha: jnp.ndarray     # (M,) t*/T_total fraction
    g_rel0: jnp.ndarray    # (M, 2) body-frame SDF gradient
    p_rel0: jnp.ndarray    # (M, 2) body-frame point at linearization


def svsdf_linearize(shape: Shape2D, traj: trj.Trajectory, obstacles,
                    svs_cfg: SVSDFConfig):
    """Run the SVSDF oracle (under stop_gradient — envelope theorem at
    t*) and package the penalty linearization state.

    Returns (OracleState, SVSDFResult)."""
    traj_sg = trj.Trajectory(jax.lax.stop_gradient(traj.coeffs),
                             jax.lax.stop_gradient(traj.durations))
    res = svsdf_query(shape, traj_sg, obstacles, svs_cfg,
                      with_inside=svs_cfg.use_inside)
    sdf0 = jax.lax.stop_gradient(res.sdf)
    t_star = jax.lax.stop_gradient(res.t_star)
    g_w = jax.lax.stop_gradient(res.grad_world)        # (M, 2)
    total = jnp.sum(traj_sg.durations)
    alpha = t_star / total
    t_eval = alpha * total
    xy0, yaw0, R0 = trj.state_se2(traj_sg, t_eval)
    p_rel0 = trj.world_to_body(xy0, R0, obstacles)     # (M, 2)
    # body-frame gradient at the linearization point: g_rel = R0^T g_w
    g_rel0 = jnp.einsum("mij,mi->mj", R0, g_w)
    return OracleState(sdf0, alpha, g_rel0, p_rel0), res


def penalty_from_state(traj: trj.Trajectory, obstacles,
                       st: OracleState, wp, sh, mu):
    """Differentiable penalty re-expression at the frozen oracle state
    (the exact surrogate whose jax.grad reproduces grad_cost_p_sw,
    back_end_optimizer.hpp:1031-1066). Parameterizing the query time
    as alpha x sum(T) keeps re-timing gradients exact at boundary
    minimizers (t* = 0 or T_total)."""
    total = jnp.sum(traj.durations)
    t_eval = st.alpha * total
    xy, yaw, R = trj.state_se2(traj, t_eval)           # diff wrt coeffs, T
    p_rel = trj.world_to_body(xy, R, obstacles)        # (M, 2)
    sdf_lin = st.sdf0 + jnp.sum(st.g_rel0 * (p_rel - st.p_rel0),
                                axis=-1)
    pen = smoothed_l1(sh - sdf_lin, mu)
    # wp / sh may be PER-POINT (M,) vectors: the certify-refine
    # escalation boosts only the VIOLATING points' weights — a
    # uniform escalation cannot move an equilibrium that balances one
    # deep violator against many shallow hinge margins on the
    # opposite side (both sides scale identically); an asymmetric one
    # must clear the violator
    return jnp.sum(wp * pen)


def svsdf_penalty(shape: Shape2D, traj: trj.Trajectory, obstacles,
                  cfg: PlannerConfig, svs_cfg: SVSDFConfig,
                  mu: float = 0.01, weight_p=None, safety_hor=None):
    """Differentiable SVSDF safety penalty over obstacle points
    (addSaftyPenaOnSweptVolumeParallelTrueSDF,
    back_end_optimizer.hpp:774-868). `mu` is the hinge smoothing; the
    reference hardcodes 0.01 (grad_cost_p_sw), larger values are used
    by the continuation schedule to widen the basin.

    weight_p / safety_hor optionally override the config values as
    TRACED scalars — the certify-refine escalation passes them here so
    every escalation round reuses one compiled executable instead of
    minting a new static config (= a full back-end recompile) per
    round."""
    wp = cfg.weight_p if weight_p is None else weight_p
    sh = cfg.safety_hor if safety_hor is None else safety_hor
    st, res = svsdf_linearize(shape, traj, obstacles, svs_cfg)
    return penalty_from_state(traj, obstacles, st, wp, sh, mu), res


def make_cost_fn(shape: Shape2D, problem: BackEndProblem,
                 cfg: PlannerConfig, svs_cfg: SVSDFConfig, n: int,
                 mu: float = 0.01, weight_p=None, safety_hor=None):
    def cost(x):
        tau = x[:n]
        wps = x[n:].reshape(n - 1, 3)
        times = forward_t(tau)
        traj = minco.solve(times, problem.head, problem.tail, wps)
        c = minco.energy(traj)
        pen, _ = svsdf_penalty(shape, traj, problem.obstacles, cfg,
                               svs_cfg, mu=mu, weight_p=weight_p,
                               safety_hor=safety_hor)
        return c + pen + cfg.rho * jnp.sum(times)

    return cost


def make_cost_pair_fn(shape: Shape2D, problem: BackEndProblem,
                      cfg: PlannerConfig, svs_cfg: SVSDFConfig, n: int,
                      mu: float = 0.01, weight_p=None,
                      safety_hor=None):
    """(full, frozen) cost pair for the frozen-oracle line search
    (utils/lbfgs.py `frozen=`).

      full(x)         -> (f, grad, OracleState)  — one oracle pass
      frozen(x, st)   -> (f~, grad~)             — surrogate only

    The surrogate holds the SVSDF linearization fixed at `st` (an
    SLP-style model: exact in the smooth energy/time terms, first-order
    in the penalty — the same first-order model whose gradient the full
    cost already uses, so the two agree to O(step^2))."""
    wp = cfg.weight_p if weight_p is None else weight_p
    sh = cfg.safety_hor if safety_hor is None else safety_hor

    def _traj(x):
        tau = x[:n]
        wps = x[n:].reshape(n - 1, 3)
        times = forward_t(tau)
        return minco.solve(times, problem.head, problem.tail, wps), times

    def _full_aux(x):
        traj, times = _traj(x)
        st, _ = svsdf_linearize(shape, traj, problem.obstacles, svs_cfg)
        pen = penalty_from_state(traj, problem.obstacles, st, wp, sh, mu)
        f = minco.energy(traj) + pen + cfg.rho * jnp.sum(times)
        return f, st

    def full(x):
        (f, st), g = jax.value_and_grad(_full_aux, has_aux=True)(x)
        return f, g, st

    def _frozen_f(x, st):
        traj, times = _traj(x)
        pen = penalty_from_state(traj, problem.obstacles, st, wp, sh, mu)
        return minco.energy(traj) + pen + cfg.rho * jnp.sum(times)

    def frozen(x, st):
        return jax.value_and_grad(_frozen_f)(x, st)

    return full, frozen


class BackEndResult(NamedTuple):
    traj: trj.Trajectory
    opt_x: jnp.ndarray
    cost: jnp.ndarray
    n_iters: jnp.ndarray
    converged: jnp.ndarray


#: static upper bound on the scheduled solve's while_loop (the actual
#: budget is a TRACED argument; this only caps the loop statically).
_MAX_ITER_BOUND = 1024


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5, 6, 12))
def _run(shape, x0, problem, cfg, svs_cfg, n: int, solver: str,
         mu_values, stage_bounds, total_iters, weight_p, safety_hor,
         live: bool = False):
    """Smoothing-continuation solve: the hinge smoothing mu anneals
    from wide to the reference's 0.01. The wide stages give the
    nonsmooth landscape a broad basin (the role LMBM's bundle plays in
    the reference) before the final sharp stage polishes.

    The whole continuation runs INSIDE one lbfgs.minimize_scheduled
    loop with mu selected per iteration from the TRACED `mu_values` /
    `stage_bounds` arrays: the compiled program holds ONE copy of the
    SVSDF cost graph (an unrolled per-stage loop weighed ~58 MB of
    TPU executable and took minutes to load per process), and every
    re-solve — certify-refine escalations, different budgets, different
    schedules of the same length — reuses the same executable.

    solver: "lbfgs" (default; weak-Wolfe nonsmooth L-BFGS) or "lmbm"
    (utils/lmbm.py, the reference's actual bundle method)."""
    del solver  # lbfgs only; LMBM goes through _run_lmbm

    def cost(x, it):
        stage = jnp.sum(it >= stage_bounds)
        mu = mu_values[stage]
        tau = x[:n]
        wps = x[n:].reshape(n - 1, 3)
        times = forward_t(tau)
        traj = minco.solve(times, problem.head, problem.tail, wps)
        c = minco.energy(traj)
        pen, _ = svsdf_penalty(shape, traj, problem.obstacles, cfg,
                               svs_cfg, mu=mu, weight_p=weight_p,
                               safety_hor=safety_hor)
        return c + pen + cfg.rho * jnp.sum(times)

    params = lbfgs.LBFGSParams(
        mem_size=cfg.mem_size, max_iterations=_MAX_ITER_BOUND,
        g_epsilon=max(cfg.g_epsilon, 1e-7), past=3,
        delta=max(cfg.relCostTol, getattr(cfg, "back_rel_stall", 0.0)),
        max_linesearch=getattr(cfg, "back_max_ls", 40), live=live)
    vg = jax.value_and_grad(cost, argnums=0)
    res = lbfgs.minimize_scheduled(lambda x, it: vg(x, it), x0, params,
                                   n_iters=total_iters,
                                   stage_bounds=stage_bounds)
    x = res.x
    times = forward_t(x[:n])
    wps = x[n:].reshape(n - 1, 3)
    traj = minco.solve(times, problem.head, problem.tail, wps)
    return BackEndResult(traj, x, res.f, res.n_iters, res.converged)


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5, 6, 7))
def _run_lmbm(shape, x0, problem, cfg, svs_cfg, n: int, max_iters: int,
              mu_schedule: tuple, weight_p=None, safety_hor=None):
    """Per-stage LMBM continuation (the reference's actual solver;
    back_end_optimizer.cpp:30). Kept as the static-schedule path: the
    bundle aggregation state is not schedule-aware, so each stage
    restarts the bundle."""
    x = x0
    iters_done = jnp.asarray(0)
    res = None
    for i, mu in enumerate(mu_schedule):
        cost = make_cost_fn(shape, problem, cfg, svs_cfg, n, mu=mu,
                            weight_p=weight_p, safety_hor=safety_hor)
        iters = max_iters if i == len(mu_schedule) - 1 else max(
            max_iters // 2, 40)
        res = lmbm.minimize(
            jax.value_and_grad(cost), x,
            lmbm.LMBMParams(mem_size=cfg.mem_size,
                            max_iterations=iters,
                            delta=max(cfg.relCostTol,
                                      getattr(cfg, "back_rel_stall",
                                              0.0))))
        x = res.x
        iters_done = iters_done + res.n_iters
    times = forward_t(x[:n])
    wps = x[n:].reshape(n - 1, 3)
    traj = minco.solve(times, problem.head, problem.tail, wps)
    return BackEndResult(traj, x, res.f, iters_done, res.converged)


def optimize(shape: Shape2D, head, tail, obstacles, opt_x,
             cfg: PlannerConfig = PlannerConfig(),
             svs_cfg: SVSDFConfig = DEFAULT_CONFIG,
             max_iters: int = 200,
             mu_schedule: tuple = (0.5, 0.1, 0.01),
             solver: str = "lbfgs",
             weight_p=None, safety_hor=None,
             live: bool = False) -> BackEndResult:
    """Run the back end from the mid end's warm-start decision vector
    (optimize_traj_lmbm, back_end_optimizer.cpp:3-96).

    obstacles: (M, >=2) obstacle points; the z/yaw component is dropped
    (pos_eva(2) = 0, back_end_optimizer.hpp:792).

    weight_p / safety_hor override the config values as TRACED
    scalars: penalty-escalation callers (the certify-refine loop) pass
    them here so every escalation reuses one compiled executable.
    """
    opt_x = jnp.asarray(opt_x)
    n = (opt_x.shape[0] + 3) // 4
    obstacles = jnp.asarray(obstacles)[:, :2]
    problem = BackEndProblem(jnp.asarray(head), jnp.asarray(tail),
                             obstacles)
    wp = jnp.asarray(cfg.weight_p if weight_p is None else weight_p,
                     jnp.float32)
    sh = jnp.asarray(cfg.safety_hor if safety_hor is None
                     else safety_hor, jnp.float32)
    if solver == "lmbm":
        return _run_lmbm(shape, opt_x, problem, cfg, svs_cfg, n,
                         max_iters, tuple(mu_schedule), wp, sh)
    # build the TRACED continuation schedule, padded to a fixed number
    # of stages so every schedule of any length shares one executable:
    # stage i in [bounds[i-1], bounds[i]); the last stage gets
    # max_iters, earlier ones max(max_iters // 2, 40) (the round-1
    # static-schedule budgets, preserved exactly).
    n_stage_slots = 3
    mus = list(mu_schedule)[:n_stage_slots]
    early = max(max_iters // 2, 40)
    iters = [early] * (len(mus) - 1) + [max_iters]
    while len(mus) < n_stage_slots:       # pad with zero-length stages
        mus.append(mus[-1])
        iters.append(0)
    bounds = np.cumsum(iters[:-1])
    total = int(np.sum(iters))
    return _run(shape, opt_x, problem, cfg, svs_cfg, n, "lbfgs",
                jnp.asarray(mus, jnp.float32),
                jnp.asarray(bounds, jnp.int32),
                jnp.asarray(total, jnp.int32), wp, sh, live)
