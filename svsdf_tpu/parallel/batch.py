"""Scenario batching and multi-chip sharded planning.

The reference's only parallelism is an OpenMP loop over obstacle points
inside one plan (SURVEY.md §2.6). The TPU equivalents implemented here:

  * plan_batch: `vmap` the whole back-end optimization over a batch of
    scenarios (same piece count N and obstacle count M) — thousands of
    independent plans advance in lockstep on one chip.
  * sharded_value_and_grad / sharded_step: `shard_map` over a device
    mesh with axes (scn, obs): scenarios are data-parallel, obstacle
    points within each scenario are model-parallel, and the penalty's
    cost/gradient reduction rides a `psum` over the obs axis — the
    moral replacement of the reference's `#pragma omp critical`
    gradient merge (back_end_optimizer.hpp:855-863).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from svsdf_tpu.models.shapes import Shape2D
from svsdf_tpu.ops import minco
from svsdf_tpu.ops.svsdf import DEFAULT_CONFIG, SVSDFConfig
from svsdf_tpu.planner import back_end
from svsdf_tpu.utils import lbfgs
from svsdf_tpu.utils.config import PlannerConfig
from svsdf_tpu.utils.transforms import backward_t, forward_t


def make_mesh(n_scn: int, n_obs: int, devices=None) -> Mesh:
    devices = jax.devices() if devices is None else devices
    assert n_scn * n_obs <= len(devices)
    import numpy as np
    dev = np.asarray(devices[:n_scn * n_obs]).reshape(n_scn, n_obs)
    return Mesh(dev, axis_names=("scn", "obs"))


# ---------------------------------------------------------------------------
# single-chip scenario batching
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5, 6, 7))
def plan_batch(shape: Shape2D, x0_b, problems_b, cfg: PlannerConfig,
               svs_cfg: SVSDFConfig, n: int, max_iters: int,
               max_linesearch: int = 4):
    """vmap the back-end solve over B scenarios.

    x0_b: (B, 4N-3); problems_b: BackEndProblem with leading batch dim
    on every leaf. Returns batched BackEndResult.

    max_linesearch=4 is the measured operating point on v5e: the
    vmapped while-loop line search runs as long as the WORST lane, so
    a deep bisection cap taxes every scenario — capping at 4 gave 3.8x
    throughput at statistically equal final cost (ls=16: 9.2 plans/s /
    mean cost 2665; ls=4: 35.3 plans/s / 2677 on the bench problem).
    """
    def solve_one(x0, head, tail, obstacles):
        prob = back_end.BackEndProblem(head, tail, obstacles)
        cost = back_end.make_cost_fn(shape, prob, cfg, svs_cfg, n)
        params = lbfgs.LBFGSParams(mem_size=cfg.mem_size,
                                   max_iterations=max_iters,
                                   g_epsilon=1e-7, past=3,
                                   delta=cfg.relCostTol,
                                   max_linesearch=max_linesearch)
        res = lbfgs.minimize(jax.value_and_grad(cost), x0, params)
        times = forward_t(res.x[:n])
        wps = res.x[n:].reshape(n - 1, 3)
        traj = minco.solve(times, head, tail, wps)
        return back_end.BackEndResult(traj, res.x, res.f, res.n_iters,
                                      res.converged)

    return jax.vmap(solve_one)(x0_b, problems_b.head, problems_b.tail,
                               problems_b.obstacles)


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5, 6))
def plan_batch_staged(shape: Shape2D, x0_b, problems_b,
                      cfg: PlannerConfig, stages: tuple, n: int,
                      max_linesearch: int = 4):
    """Staged batched solve: stages = ((SVSDFConfig, iters), ...) or
    ((SVSDFConfig, iters, ls_cap), ...) run back to back, each
    warm-starting the next.

    The measured operating point on v5e is a cheap outside-only stage
    followed by a short full-GSIP polish: vs a single full-fidelity
    solve at equal total iterations this is ~5x faster AND reaches a
    slightly LOWER high-fidelity cost (the cheap stage takes many more
    productive steps per second through the far-from-feasible early
    landscape, and the polish stage's interior solve only matters near
    the end). A per-stage ls_cap lets the cheap stage run an even
    shallower line search (the vmapped search runs at the worst lane's
    depth) while the polish stage keeps the careful one. See
    DEFAULT_STAGES.
    """
    def solve_one(x0, head, tail, obstacles):
        x, res, traj = _staged_solve(shape, cfg, stages, n,
                                     max_linesearch, x0, head, tail,
                                     obstacles)
        return back_end.BackEndResult(traj, x, res.f, res.n_iters,
                                      res.converged)

    return jax.vmap(solve_one)(x0_b, problems_b.head, problems_b.tail,
                               problems_b.obstacles)


def default_stages(total_iters: int = 50, ls: int = 4,
                   frozen_ls: bool = True,
                   scan_dtype: str | None = "bfloat16",
                   ls_candidates: int = 4) -> tuple:
    """The v5e-tuned two-stage schedule: 80% outside-only SVSDF
    (coarse_n=96, one refine round), 20% full GSIP polish — with the
    FROZEN-ORACLE line search (one SVSDF oracle evaluation per
    iteration; trials re-price only the carried linearization) run as
    a PARALLEL surrogate search since round 5 (ls_candidates trials in
    one batched eval, sequential depth 1).

    Round-5 adoption A/B (batch 512, 50 iters, hifi-scored median
    cost, same-session): frozen sequential ls=4 1099.2 plans/s /
    cost 2739.5; frozen PARALLEL C=4 1307.8 / 2721.7 (+19% at LOWER
    cost); C=3 1299.2 / 2717.7; C=6 1201.5 / 2721.9. The r3 negative
    result for the parallel search was for the NON-frozen variant,
    where each trial paid a full oracle pass; on the cheap surrogate
    the C-fold width is nearly free and removing the bisection's
    sequential depth dominates. Stacking the compact L-BFGS apply
    (utils/lbfgs.py) gives 1346.7 / 2721.0. Iteration ladder at the
    adopted point: 40 iters 1599.3 / 2735.7 (cost-neutral vs the r4
    record, the bench operating point); 35 iters 1787.9 / 2764.6
    (+0.9% cost). Shrinking the fast-stage scan to k=64 does NOT pay
    (1257.7 at equal cost — the parabola bracket coarsens and the
    line search eats the savings). ls_candidates=0 restores the
    round-4 sequential-bisection behavior.

    Frozen-oracle adoption (round-3 A/B, batch 256, 50 iters, hifi-
    scored median cost — same-session so directly comparable):

      baseline seq ls=2      892.4 plans/s   cost 2782.9
      frozen   ls=4          953.0 plans/s   cost 2790.3   <- default
      frozen   ls=8          694.2 plans/s   cost 2779.5
      frozen   ls=16         450.7 plans/s   cost 2777.6

    frozen ls=4 beats the sequential search by +6.8% plans/s at equal
    cost (+0.27%, inside the different-local-minima noise band);
    deeper frozen searches trade throughput for ~0.1-0.4% cost — the
    LMBM-style evaluation economy (one true eval per iteration,
    back_end_optimizer.hpp:344-430) pays off once the line search is
    effectively free. Pass frozen_ls=False for the round-2 sequential
    behavior.

    Measured operating points on a real v5e chip (batch 256, same
    128-dim problem set, high-fidelity final cost median / plans/s):

      ls=4 f32   2594 / 192     ls=4 bf16  2540 / 191
      ls=3 bf16  2656 / 280     ls=2 bf16  2688 / 346-408
      ls=1 bf16  2760 / 753-825
      ls=2 bf16 + fast-stage parabola refinement (refine_rounds=0,
      zero extra evals): 2706 / 410 (vs 2688 / 342 same-session A/B)

    The bf16 coarse scan is quality-neutral (only the bracketing
    argmin is low-precision; f32 refinement restores accuracy).
    Deeper line-search caps find ~2-5% lower-cost local minima at
    2-4x the wall clock — extra ITERATIONS at a shallow cap do not
    close that gap (the lanes converge to different minima, they are
    not under-converged). Default ls=2: within ~4% of the deepest
    search at twice the throughput; pass ls=4 for quality-critical
    solves, ls=1 for maximum throughput. The fast stage uses the free
    table-parabola t* refinement — its wide-refinement round costs
    per-point pose evals (one-hot piece gather) that rival the whole
    shared-table coarse scan, for accuracy the polish stage redoes
    anyway.

    Negative result worth keeping: the PARALLEL line search
    (ls_candidates>0 via 4-element stage tuples — C trial steps in one
    batched eval, depth 1) LOSES at batch>=256: 297/229/155 plans/s at
    C=3/4/6 vs 343 sequential ls=2 (same session) — at saturating
    batch the solve is compute-bound, so C-fold extra cost evals
    outweigh the removed sequential depth. It may still win for small
    batches / low-latency replans."""
    fast = SVSDFConfig(coarse_n=96, refine_rounds=0, refine_n=16,
                       use_inside=False, scan_dtype=scan_dtype)
    # gsip_topk=6: GSIP only the 6 most-interior obstacle points per
    # eval (the polish stage's dominant cost — its cost+grad eval
    # measures ~11x the fast stage's, scripts/perf_decompose.py r5).
    # Round-3 ladder at batch 256 (plans/s / hifi cost median):
    # topk=0 438/2747, topk=16 589/2721, topk=8 898/2765,
    # topk=4 1099/2787. Round-5 at the adopted parallel-frozen point
    # (batch 512, 40 iters): topk=8 1599.3/2735.7, topk=6
    # 1819.6/2746.9, topk=5 1942.2/2753.3 — 6 is the knee (+14%
    # throughput inside the local-minima noise band; 5 starts paying
    # real cost).
    polish = SVSDFConfig(coarse_n=128, refine_rounds=2, refine_n=16,
                         gsip_iters=3, gsip_coarse_n=32,
                         gsip_refine_rounds=1, gsip_topk=6,
                         scan_dtype=scan_dtype)
    k = max(total_iters // 5, 5)
    return ((fast, total_iters - k, ls, ls_candidates, frozen_ls),
            (polish, k, ls, ls_candidates, frozen_ls))


def default_stages_lowlat(total_iters: int = 50,
                          ls_candidates: int = 4,
                          scan_dtype: str | None = "bfloat16") -> tuple:
    """Low-LATENCY schedule for small batches / single replans: same
    two stages as default_stages but with the PARALLEL line search
    (C trial steps in one batched eval, sequential depth 1). At
    batch=1 the solve is depth-bound, so width-for-depth wins big:
    measured p50 single-plan replan 72 ms vs 150 ms sequential
    (C=4, v5e). At saturating batch use default_stages instead (the
    same trade loses 15-55% there — see its docstring)."""
    fast = SVSDFConfig(coarse_n=96, refine_rounds=0, refine_n=16,
                       use_inside=False, scan_dtype=scan_dtype)
    polish = SVSDFConfig(coarse_n=128, refine_rounds=2, refine_n=16,
                         gsip_iters=3, gsip_coarse_n=32,
                         gsip_refine_rounds=1, gsip_topk=8,
                         scan_dtype=scan_dtype)
    k = max(total_iters // 5, 5)
    return ((fast, total_iters - k, 2, ls_candidates),
            (polish, k, 2, ls_candidates))


# ---------------------------------------------------------------------------
# multi-chip sharded cost/gradient (scn x obs mesh)
# ---------------------------------------------------------------------------

def sharded_value_and_grad(shape: Shape2D, mesh: Mesh,
                           cfg: PlannerConfig, svs_cfg: SVSDFConfig,
                           n: int):
    """Returns f(x_b, head_b, tail_b, obs_b) -> (cost_b, grad_b) with
    obstacle points sharded over the 'obs' mesh axis and scenarios over
    'scn'. The obs-axis partial penalties are reduced with a psum
    INSIDE the shard_map, so the gradient collective rides ICI.
    """
    n_obs_shards = mesh.shape["obs"]

    def local_cost(x, head, tail, obs_shard):
        """Per-shard partial cost. The replicated base term is divided
        by the obs-shard count so that the psum of BOTH value and
        gradient below reconstructs the exact total — psumming only
        the penalty value (and not its gradient) leaves each device
        holding just its own shard's penalty gradient, which the
        out_specs then silently truncate."""
        tau = x[:n]
        wps = x[n:].reshape(n - 1, 3)
        times = forward_t(tau)
        traj = minco.solve(times, head, tail, wps)
        pen, _ = back_end.svsdf_penalty(shape, traj, obs_shard, cfg,
                                        svs_cfg)
        base = minco.energy(traj) + cfg.rho * jnp.sum(times)
        return base / n_obs_shards + pen

    def shard_fn(x_b, head_b, tail_b, obs_b):
        def one(x, head, tail, obs):
            f, g = jax.value_and_grad(local_cost)(x, head, tail, obs)
            # the collective gradient merge (the reference's
            # omp-critical, back_end_optimizer.hpp:855-863) rides ICI
            return (jax.lax.psum(f, axis_name="obs"),
                    jax.lax.psum(g, axis_name="obs"))
        return jax.vmap(one)(x_b, head_b, tail_b, obs_b)

    mapped = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("scn"), P("scn"), P("scn"), P("scn", "obs")),
        out_specs=(P("scn"), P("scn")),
        check_vma=False)
    return jax.jit(mapped)


def sharded_plan_batch(shape: Shape2D, mesh: Mesh, cfg: PlannerConfig,
                       svs_cfg: SVSDFConfig, n: int,
                       max_iters: int = 50, max_linesearch: int = 2):
    """FULL multi-chip solve: the nonsmooth L-BFGS loop runs inside
    shard_map with scenarios data-parallel over 'scn' and each
    scenario's obstacle set model-parallel over 'obs'. Every cost/grad
    evaluation inside the optimizer psums over the obs axis (the
    omp-critical merge riding ICI, each solve iteration), so the obs
    shards advance one identical replicated solve in lockstep —
    the cross-host batched-L-BFGS design of SURVEY.md §2.6/§5.

    Returns f(x_b, head_b, tail_b, obs_b) -> (x, cost, iters,
    converged), jitted over the mesh.
    """
    n_obs_shards = mesh.shape["obs"]

    def local_cost(x, head, tail, obs_shard):
        tau = x[:n]
        wps = x[n:].reshape(n - 1, 3)
        times = forward_t(tau)
        traj = minco.solve(times, head, tail, wps)
        pen, _ = back_end.svsdf_penalty(shape, traj, obs_shard, cfg,
                                        svs_cfg)
        base = minco.energy(traj) + cfg.rho * jnp.sum(times)
        return base / n_obs_shards + pen

    params = lbfgs.LBFGSParams(mem_size=cfg.mem_size,
                               max_iterations=max_iters,
                               g_epsilon=1e-7, past=3,
                               delta=cfg.relCostTol,
                               max_linesearch=max_linesearch)

    def shard_fn(x_b, head_b, tail_b, obs_b):
        def one(x0, head, tail, obs):
            def fun(x):
                f, g = jax.value_and_grad(local_cost)(x, head, tail,
                                                      obs)
                return (jax.lax.psum(f, axis_name="obs"),
                        jax.lax.psum(g, axis_name="obs"))
            res = lbfgs.minimize(fun, x0, params)
            return res.x, res.f, res.n_iters, res.converged
        return jax.vmap(one)(x_b, head_b, tail_b, obs_b)

    mapped = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("scn"), P("scn"), P("scn"), P("scn", "obs")),
        out_specs=(P("scn"), P("scn"), P("scn"), P("scn")),
        check_vma=False)
    return jax.jit(mapped)


def sharded_step(shape: Shape2D, mesh: Mesh, cfg: PlannerConfig,
                 svs_cfg: SVSDFConfig, n: int, lr: float = 1e-2):
    """One sharded gradient step over the full batch — the 'training
    step' of the planning workload (used by the multi-chip dry run)."""
    vg = sharded_value_and_grad(shape, mesh, cfg, svs_cfg, n)

    @jax.jit
    def step(x_b, head_b, tail_b, obs_b):
        cost, grad = vg(x_b, head_b, tail_b, obs_b)
        return x_b - lr * grad, cost

    return step


# ---------------------------------------------------------------------------
# fully-batched end-to-end planning (device wavefront front end +
# staged SVSDF back end in ONE dispatch)
# ---------------------------------------------------------------------------

class E2EBatchResult(NamedTuple):
    front_ok: jnp.ndarray     # (B,) wavefront reached the goal
    x: jnp.ndarray            # (B, 4N-3) final decision vectors
    cost: jnp.ndarray         # (B,)
    cert_min: jnp.ndarray     # (B,) min SVSDF over harvested obstacles
    head: jnp.ndarray         # (B, 3, 3)
    tail: jnp.ndarray         # (B, 3, 3)
    obstacles: jnp.ndarray    # (B, M, 2)
    #: solved trajectories, returned FROM the jitted program: an eager
    #: host-side re-solve costs dozens of tiny dispatches — ~1.3 s of
    #: a 1.4 s single replan over the tunneled backend
    coeffs: jnp.ndarray       # (B, N, 6, 3)
    durations: jnp.ndarray    # (B, N)


def _resample_path(path_ij, yaw_bins, length, n, resolution, xy_min,
                   yaw_num):
    """(L, 2) padded cells + bins -> head/tail (3,3), (n-1, 3)
    waypoints, evenly spaced by arc length, yaw unwrapped."""
    L = path_ij.shape[0]
    xy = xy_min[None] + (path_ij.astype(jnp.float32) + 0.5) * resolution
    yaw_raw = 2.0 * jnp.pi * yaw_bins.astype(jnp.float32) / yaw_num \
        - jnp.pi
    # unwrap along the path (padding repeats the last entry -> dy 0)
    dy = yaw_raw[1:] - yaw_raw[:-1]
    dy = (dy + jnp.pi) % (2.0 * jnp.pi) - jnp.pi
    yaw = jnp.concatenate([yaw_raw[:1], yaw_raw[0] + jnp.cumsum(dy)])
    seg = jnp.linalg.norm(xy[1:] - xy[:-1], axis=-1)
    cum = jnp.concatenate([jnp.zeros((1,)), jnp.cumsum(seg)])
    total = cum[jnp.minimum(length - 1, L - 1)]
    t = jnp.linspace(0.0, 1.0, n + 1) * total            # (n+1,)
    idx = jnp.clip(jnp.searchsorted(cum, t, side="right") - 1,
                   0, L - 2)
    c0 = cum[idx]
    w = jnp.where(seg[idx] > 1e-9, (t - c0) / jnp.maximum(seg[idx],
                                                          1e-9), 0.0)
    w = jnp.clip(w, 0.0, 1.0)[:, None]
    pos = xy[idx] * (1 - w) + xy[idx + 1] * w            # (n+1, 2)
    yw = yaw[idx] * (1 - w[:, 0]) + yaw[idx + 1] * w[:, 0]
    states = jnp.concatenate([pos, yw[:, None]], axis=-1)  # (n+1, 3)
    head = jnp.zeros((3, 3)).at[0].set(states[0])
    tail = jnp.zeros((3, 3)).at[0].set(states[-1])
    return head, tail, states


def _harvest_topm(occ_pts, states, m):
    """(Mocc, 2) occupied voxel centers -> the m closest to the path
    states — INCLUDING head/tail, so walls adjacent to the pinned
    endpoints enter the penalty and the certificate (fixed-shape
    batched AABB-harvest analogue)."""
    d = jnp.linalg.norm(occ_pts[:, None, :] - states[None, :, :2],
                        axis=-1).min(axis=1)             # (Mocc,)
    _, idx = jax.lax.top_k(-d, m)
    return occ_pts[idx]


def _staged_solve(shape, cfg, stages, n, max_linesearch,
                  x0, head, tail, obstacles):
    """Warm-started stage loop shared by plan_batch_staged and
    plan_batch_e2e. stages entries:
    (svs_cfg, iters[, ls[, ls_cand[, frozen_ls[, weight_mult]]]]) —
    frozen_ls=True selects the frozen-oracle line search (one SVSDF
    oracle evaluation per iteration; utils/lbfgs.py `frozen=`);
    weight_mult scales cfg.weight_p for that stage (in-solve penalty
    escalation: the single-dispatch analogue of the pipeline's
    certify-refine weight ladder)."""
    prob = back_end.BackEndProblem(head, tail, obstacles)
    x = x0
    res = None
    for stage in stages:
        svs_cfg, iters = stage[0], stage[1]
        ls = stage[2] if len(stage) > 2 else max_linesearch
        ls_cand = stage[3] if len(stage) > 3 else 0
        frozen_ls = stage[4] if len(stage) > 4 else False
        wmult = stage[5] if len(stage) > 5 else 1.0
        wp = cfg.weight_p * wmult if wmult != 1.0 else None
        params = lbfgs.LBFGSParams(
            mem_size=cfg.mem_size, max_iterations=iters,
            g_epsilon=1e-7, past=3, delta=cfg.relCostTol,
            max_linesearch=ls, ls_candidates=ls_cand)
        if frozen_ls:
            # frozen-oracle line search: trials re-evaluate only the
            # cheap surrogate against the carried SVSDF linearization;
            # ONE oracle pass per iteration (lbfgs.minimize frozen=)
            full, frz = back_end.make_cost_pair_fn(shape, prob, cfg,
                                                   svs_cfg, n,
                                                   weight_p=wp)
            res = lbfgs.minimize(full, x, params, frozen=frz)
        else:
            cost = back_end.make_cost_fn(shape, prob, cfg, svs_cfg, n,
                                         weight_p=wp)
            res = lbfgs.minimize(jax.value_and_grad(cost), x, params)
        x = res.x
    times = forward_t(x[:n])
    wps = x[n:].reshape(n - 1, 3)
    traj = minco.solve(times, head, tail, wps)
    return x, res, traj


#: per-round jax.debug.print tracing of the refine loop (dev knob)
_REFINE_DEBUG = False


def _certify_refine(shape, cfg, stages, n, max_linesearch, occ_pts,
                    n_obs, x, head, tail, obstacles,
                    refine_rounds: int, refine_iters: int,
                    refine_esc: float, cert_margin: float,
                    refine_fast: bool = True, cost0=None,
                    refine_svs_cfg=None):
    """In-dispatch certify-and-refine — the single-dispatch analogue of
    the pipeline's map-wide certify/escalate loop (pipeline.py
    `_attempt`; reference per-click product plan_manager.cpp:128-231).

    Each round: re-harvest the n_obs occupied voxels nearest the
    CURRENT sweep (the staged solve can drift off the front-end path's
    harvest), run the polish-fidelity certificate, and for violating
    lanes escalate the penalty weight (x refine_esc) and the demanded
    margin (+0.1 m) as per-lane TRACED scalars — then re-solve
    refine_iters more iterations warm-started. Non-violating lanes
    keep polishing at base weight. All fixed-shape: B lanes advance
    in lockstep under vmap, certified and colliding alike.

    Returns (x, obstacles, cost) after the last round.
    """
    import dataclasses as _dc

    from svsdf_tpu.ops.svsdf import svsdf_query
    from svsdf_tpu.utils import trajectory as trj

    # Certificate fidelity: the polish stage's bf16/k128 scan can
    # bracket the WRONG time window on long trajectories (measured
    # 0.17 m binding error on sdTunnel; FIDELITY.json) — certificates
    # use a denser f32 scan (error 0.000 on the worst map). One extra
    # oracle pass per round; the SOLVE keeps the cheap schedule.
    cert_cfg = _dc.replace(stages[-1][0],
                           coarse_n=max(192, stages[-1][0].coarse_n),
                           scan_dtype=None)
    # refine solves need polish fidelity too: an A/B with the cheap
    # fast-stage oracle regressed sdPie's certificate from +0.14 to
    # -0.94 at nearly equal wall time — at batch 1 the rounds are
    # sequential-depth-bound, so oracle economy buys nothing
    solve_stage = stages[0] if refine_fast else stages[-1]
    # the refine solve's oracle needs a denser F32 coarse scan: the
    # staged solve's k128-bf16 oracle can MISS a 14 cm penetration
    # outright — and on sdRoundedCross even k192-bf16 still flips the
    # margin's sign (FIDELITY.json) — and a refine loop steering by a
    # blind oracle spins. refine_svs_cfg overrides (the fidelity
    # consequence A/B steers by the full-GSIP oracle instead).
    if refine_svs_cfg is not None:
        svs_cfg = refine_svs_cfg
    else:
        # gsip_topk pinned at >=8: round 5 trimmed the THROUGHPUT
        # polish to topk=6, and refine solves inheriting it regressed
        # sdHeart's median certificate -0.054 -> -0.118 and
        # sdRoundedX's -0.02 -> -0.163 — the escalated interior
        # pushes need the wider GSIP coverage even though the staged
        # solve doesn't
        tk = solve_stage[0].gsip_topk
        svs_cfg = _dc.replace(solve_stage[0],
                              coarse_n=max(192, solve_stage[0].coarse_n),
                              scan_dtype=None,
                              gsip_topk=max(8, tk) if tk else 0)
    ls = solve_stage[2] if len(solve_stage) > 2 else max_linesearch
    # NOTE the width-for-depth parallel surrogate search was tried
    # here and regressed sdPie's certificate from +0.14 to -0.48 for
    # only -18% latency — escalated-weight refine steps need the deep
    # sequential bisection to land productive steps. Pinned to 0 (not
    # inherited from the stage tuple) since round 5 adopted the
    # parallel-frozen search for the THROUGHPUT stages: the refine
    # solves must keep the sequential search regardless.
    ls_cand = 0
    frozen_ls = solve_stage[4] if len(solve_stage) > 4 else False
    wp_base = jnp.asarray(cfg.weight_p, x.dtype)
    sh_base = jnp.asarray(cfg.safety_hor, x.dtype)
    cost = jnp.asarray(jnp.inf if cost0 is None else cost0, x.dtype)
    mult = jnp.asarray(1.0, x.dtype)

    # The rounds run as ONE lax.fori_loop body instead of a Python-
    # unrolled loop: the round-4 build embedded refine_rounds=6 copies
    # of the full solve graph in the executable, and the per-map
    # OnlineReplanner build (compile-dominated, 211-886 s,
    # online_replans.json r4) paid for every copy. One body also
    # makes extra rounds compile-free.
    def round_body(_, carry):
        # whole-round short-circuit: once the best certificate clears
        # the margin, the round is a no-op — on the batch-1 replan
        # path this skips the HARVEST + CERTIFICATE oracle too (they
        # used to run every round even after certification, putting a
        # rounds-proportional floor under certified maps' p50), so
        # raising refine_rounds is free for maps that certify early.
        # (Round 0 always runs: best_cert starts at -inf.)
        return jax.lax.cond(carry[4] >= cert_margin,
                            lambda c: c, _round_full, carry)

    def _round_full(carry):
        (x, cost, mult, best_x, best_cert, sdf_best, obstacles,
         grad_best, r) = carry
        times = forward_t(x[:n])
        wps = x[n:].reshape(n - 1, 3)
        traj = minco.solve(times, head, tail, wps)
        ts = jnp.linspace(0.0, jnp.sum(times), 4 * n + 1)
        sweep_xy, _, _ = trj.state_se2(traj, ts)
        obs_cand = _harvest_topm(occ_pts, sweep_xy, n_obs)
        q_cand = svsdf_query(shape, traj, obs_cand, cert_cfg,
                             with_inside=False)
        cert_cand = q_cand.sdf.min()
        # best-so-far state: an escalated re-solve can WRECK the
        # trajectory (measured: sdHeart -0.10 -> -1.14 in one round
        # when the one-sided push slammed the sweep into walls outside
        # the harvest); every round judges the previous solve against
        # the best-known certificate and always re-solves FROM the
        # best iterate, so the reported certificate is monotone.
        # (best_cert starts at -inf, so round 0 always adopts its own
        # candidate — the unrolled loop's r==0 initialization.)
        better = cert_cand > best_cert
        stalled = ~better                    # last solve didn't help
        best_x = jnp.where(better, x, best_x)
        best_cert = jnp.maximum(cert_cand, best_cert)
        sdf_best = jnp.where(better, q_cand.sdf, sdf_best)
        obstacles = jnp.where(better, obs_cand, obstacles)
        grad_best = jnp.where(better, q_cand.grad_world, grad_best)
        x = best_x
        cert = best_cert
        viol = cert < cert_margin
        # Stalled-equilibrium escape (the single-dispatch analogue of
        # pipeline._nudge_waypoints): when a round failed to improve
        # the best certificate, physically push the waypoints nearest
        # the worst violator along -grad(swept SDF) before re-solving.
        i_worst = jnp.argmin(sdf_best)
        g = grad_best[i_worst]
        gn = jnp.linalg.norm(g)
        push = jnp.where(gn > 1e-6,
                         (-cert + 0.1) / jnp.maximum(gn, 1e-6), 0.0)
        wps_b = x[n:].reshape(n - 1, 3)
        wdist = jnp.linalg.norm(wps_b[:, :2]
                                - obstacles[i_worst][None], axis=1)
        fall = jnp.exp(-(wdist / 3.0) ** 2)[:, None]
        # nudge only DEEP stalls: near-zero penetrations are better
        # polished by weights alone — a 0.3 m waypoint shove on a
        # -0.05 m violation wrecks more than it frees
        nudge_on = viol & stalled & (r > 0) & (cert < -0.15)
        wps_n = wps_b.at[:, :2].add(-g[None] * push * fall
                                    * jnp.where(nudge_on, 1.0, 0.0))
        x = jnp.concatenate([x[:n], wps_n.reshape(-1)])
        # PER-POINT GRADED escalation. A uniform (scalar) escalation
        # provably cannot move an equilibrium balancing one deep
        # violator against many shallow hinge margins on the opposite
        # side — both sides scale identically (measured: sdHeart
        # pinned at -0.64..-0.68 through wp x256). A BINARY per-point
        # boost (mult on violators, base elsewhere) overshoots into
        # walls that carried only base weight. The graded profile
        # interpolates mult^severity by current depth, so near-margin
        # points on the far side carry intermediate weight and brake
        # the push.
        mult = jnp.where(viol, mult * refine_esc, mult)
        # severity profile (tuned on the two thin-margin maps):
        # mult^1 deep inside, mult^0.5 at the margin (a depth-graded
        # exponent left near-zero violators at ~4x even at mult 4096
        # and the last centimeters never closed; full-mult at the
        # margin overshot into base-weight walls), braking to 0 at
        # margin + 0.3 m
        severity = jnp.clip((cert_margin + 0.3 - sdf_best) / 0.6,
                            0.0, 1.0)
        wp = wp_base * mult ** severity
        sh = sh_base + jnp.minimum(0.05 * (r + 1), 0.1) * (
            sdf_best < cert_margin)
        if _REFINE_DEBUG:
            jax.debug.print(
                "round {r}: cand={cc:.3f} best={c:.3f} stalled={s} "
                "mult={m:.0f} n_viol={v}", r=r, cc=cert_cand, c=cert,
                s=stalled, m=mult,
                v=jnp.sum(sdf_best < cert_margin))
        prob = back_end.BackEndProblem(head, tail, obstacles)
        params = lbfgs.LBFGSParams(
            mem_size=cfg.mem_size, max_iterations=refine_iters,
            g_epsilon=1e-7, past=3, delta=cfg.relCostTol,
            max_linesearch=ls, ls_candidates=ls_cand)

        def do_solve(x=x, wp=wp, sh=sh, prob=prob):
            if frozen_ls:
                full, frz = back_end.make_cost_pair_fn(
                    shape, prob, cfg, svs_cfg, n, weight_p=wp,
                    safety_hor=sh)
                res = lbfgs.minimize(full, x, params, frozen=frz)
            else:
                cfn = back_end.make_cost_fn(shape, prob, cfg, svs_cfg,
                                            n, weight_p=wp,
                                            safety_hor=sh)
                res = lbfgs.minimize(jax.value_and_grad(cfn), x,
                                     params)
            return res.x, res.f

        # certified lanes SKIP the solve. On the unbatched single-
        # replan path (plan_batch_e2e B=1 bypasses vmap) the cond
        # truly short-circuits, so extra rounds are ~free once the
        # plan certifies; under vmap it lowers to a select (all lanes
        # pay every round — lockstep batching semantics unchanged).
        x, cost = jax.lax.cond(viol, do_solve,
                               lambda x=x, cost=cost: (x, cost))
        # r counts EXECUTED rounds (skipped rounds don't escalate)
        return (x, cost, mult, best_x, best_cert, sdf_best, obstacles,
                grad_best, r + 1)

    m_obs = obstacles.shape[0]
    init = (x, cost, mult, x, jnp.asarray(-jnp.inf, x.dtype),
            jnp.zeros((m_obs,), x.dtype), obstacles,
            jnp.zeros((m_obs, 2), x.dtype), jnp.asarray(0))
    (x, cost, mult, best_x, best_cert, sdf_best, obstacles,
     grad_best, _) = jax.lax.fori_loop(0, refine_rounds, round_body,
                                       init)
    # final judgment: if the LAST solve regressed, return best_x
    times = forward_t(x[:n])
    traj = minco.solve(times, head, tail, x[n:].reshape(n - 1, 3))
    ts = jnp.linspace(0.0, jnp.sum(times), 4 * n + 1)
    sweep_xy, _, _ = trj.state_se2(traj, ts)
    obs_f = _harvest_topm(occ_pts, sweep_xy, n_obs)
    cert_f = svsdf_query(shape, traj, obs_f, cert_cfg,
                         with_inside=False).sdf.min()
    keep = cert_f >= best_cert
    x = jnp.where(keep, x, best_x)
    obstacles = jnp.where(keep, obs_f, obstacles)
    return x, obstacles, cost


@functools.partial(jax.jit,
                   static_argnums=(0, 5, 6, 7, 8, 11, 12, 13, 14, 15,
                                   16, 18, 19, 21))
def plan_batch_e2e(shape: Shape2D, feas, occ_pts, starts_ij, goals_ij,
                   cfg: PlannerConfig, stages: tuple, n: int,
                   n_obs: int, resolution, xy_min,
                   max_linesearch: int = 2,
                   max_path_len: int | None = None,
                   refine_rounds: int = 0, refine_iters: int = 12,
                   refine_esc: float = 4.0,
                   cert_margin: float = 0.0,
                   trans_feas=None,
                   yaw_weight: float = 0.25,
                   refine_fast: bool = False,
                   cell_cost=None,
                   refine_svs_cfg=None) -> E2EBatchResult:
    """Fully-batched END-TO-END planning in one dispatch: device
    wavefront front end (geodesic field + greedy descent + yaw-bin
    assignment), arc-length waypoint resampling to a fixed n-piece
    spline, fixed-M nearest-obstacle harvest, and the staged nonsmooth
    back-end solve — B complete plans advance together on the chip
    with no host round-trips (SURVEY.md §7 phase 6; the reference
    plans one scenario per process).

    feas: (K, X, Y) yaw-bin feasibility maps (shared map);
    occ_pts: (Mocc, 2) occupied voxel centers (pad with far dummies);
    starts_ij/goals_ij: (B, 2) int cells. max_path_len bounds the
    extracted path (and the distance-field sweep count): the default
    4*(X+Y) covers serpentine corridors several map-lengths long;
    raise it for maze-like maps (a geodesic can be up to X*Y/2 cells).

    refine_rounds > 0 enables the in-dispatch certify-and-refine loop
    (_certify_refine): after the staged solve, each round re-harvests
    obstacles near the current sweep, certifies, and re-solves
    violating lanes with escalated penalty weight — the per-click
    collision-free product of the reference (plan_manager.cpp:128-231)
    inside ONE cached executable. cert_margin is the violation
    threshold the escalation drives the certificate above (e.g.
    0.25 * safety_hor).

    Returns E2EBatchResult.
    """
    from svsdf_tpu.ops.svsdf import svsdf_query
    from svsdf_tpu.planner import wavefront
    free = jnp.any(feas, axis=0)
    resolution = jnp.asarray(resolution, jnp.float32)
    xy_min = jnp.asarray(xy_min, jnp.float32)
    if max_path_len is None:
        max_path_len = 4 * int(free.shape[0] + free.shape[1])

    def front(s, g):
        if trans_feas is not None:
            # yaw IN the search graph: edges are transition-checked
            # (cell, bin) moves, so the extracted path cannot demand
            # rotations whose sub-sweep collides (distance_field_3d)
            dist3 = wavefront.distance_field_3d(
                feas, trans_feas, g, yaw_weight,
                max_iters=max_path_len + 8, cell_cost=cell_cost)
            path, yaws, length, success = wavefront.extract_path_3d(
                dist3, trans_feas, s, max_path_len, yaw_weight,
                cell_cost=cell_cost)
        else:
            dist = wavefront.distance_field(free, g,
                                            max_iters=max_path_len + 8)
            path, length, success = wavefront.extract_path(
                dist, s, max_path_len)
            # Viterbi DP yaw assignment: globally minimal total
            # rotation subject to per-cell feasibility (the greedy
            # scan seeds spinning trajectories on big-shape maps —
            # see assign_yaws_dp's docstring)
            yaws = wavefront.assign_yaws_dp(feas, path)
        head, tail, states = _resample_path(
            path, yaws, length, n, resolution, xy_min, feas.shape[0])
        obs = _harvest_topm(occ_pts, states, n_obs)
        tau = backward_t(jnp.full((n,), cfg.inittime, jnp.float32))
        x0 = jnp.concatenate([tau, states[1:-1].reshape(-1)])
        return success, head, tail, obs, x0

    ok, head_b, tail_b, obs_b, x0_b = jax.vmap(front)(starts_ij,
                                                      goals_ij)

    def solve_one(x0, head, tail, obstacles):
        from svsdf_tpu.utils import trajectory as trj
        x, res, traj = _staged_solve(shape, cfg, stages, n,
                                     max_linesearch, x0, head, tail,
                                     obstacles)
        cost = res.f
        if refine_rounds > 0:
            x, obstacles, cost = _certify_refine(
                shape, cfg, stages, n, max_linesearch, occ_pts, n_obs,
                x, head, tail, obstacles, refine_rounds, refine_iters,
                refine_esc, cert_margin, refine_fast, cost0=cost,
                refine_svs_cfg=refine_svs_cfg)
            traj = minco.solve(forward_t(x[:n]), head, tail,
                               x[n:].reshape(n - 1, 3))
            # final certificate over a FRESH harvest at the refined
            # sweep (the last round's set predates its solve)
            ts = jnp.linspace(0.0, jnp.sum(traj.durations), 4 * n + 1)
            sweep_xy, _, _ = trj.state_se2(traj, ts)
            obstacles = _harvest_topm(occ_pts, sweep_xy, n_obs)
        import dataclasses as _dc
        cert_cfg = _dc.replace(stages[-1][0],
                               coarse_n=max(192, stages[-1][0].coarse_n),
                               scan_dtype=None)
        cert = svsdf_query(shape, traj, obstacles, cert_cfg,
                           with_inside=False).sdf.min()
        return x, cost, cert, obstacles, traj.coeffs, traj.durations

    if starts_ij.shape[0] == 1:
        # single-replan path: no vmap, so the certify-refine rounds'
        # lax.cond truly short-circuits once certified (under vmap a
        # cond lowers to a select and every lane pays every round)
        one = solve_one(x0_b[0], head_b[0], tail_b[0], obs_b[0])
        xs, costs, certs, obs_f, co, du = jax.tree.map(
            lambda a: a[None], one)
    else:
        xs, costs, certs, obs_f, co, du = jax.vmap(solve_one)(
            x0_b, head_b, tail_b, obs_b)
    return E2EBatchResult(ok, xs, costs, certs, head_b, tail_b, obs_f,
                          co, du)


def sharded_plan_batch_e2e(shape: Shape2D, mesh: Mesh,
                           cfg: PlannerConfig, stages: tuple, n: int,
                           n_obs: int, resolution, xy_min,
                           max_linesearch: int = 2,
                           refine_rounds: int = 0,
                           refine_iters: int = 12,
                           refine_esc: float = 4.0,
                           cert_margin: float = 0.0):
    """Multi-chip end-to-end planning: scenarios sharded over the
    mesh's 'scn' axis (the front end has no cross-scenario coupling,
    so e2e planning is embarrassingly data-parallel); the map products
    (feas, occ_pts) are replicated. Returns a jitted
    f(feas, occ_pts, starts_ij, goals_ij) -> E2EBatchResult with
    batch-sharded outputs."""
    def shard_fn(feas, occ_pts, starts, goals):
        return plan_batch_e2e(shape, feas, occ_pts, starts, goals,
                              cfg, stages, n, n_obs, resolution,
                              xy_min, max_linesearch,
                              refine_rounds=refine_rounds,
                              refine_iters=refine_iters,
                              refine_esc=refine_esc,
                              cert_margin=cert_margin)

    spec_b = E2EBatchResult(P("scn"), P("scn"), P("scn"), P("scn"),
                            P("scn"), P("scn"), P("scn"), P("scn"),
                            P("scn"))
    mapped = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P("scn"), P("scn")),
        out_specs=spec_b, check_vma=False)
    return jax.jit(mapped)
