"""Implicit swept-volume SDF queries — the framework's core op.

TPU-native re-design of SweptVolumeManager's SVSDF oracle
(`src/swept_volume/include/swept_volume/sw_manager.hpp:539-1018`):

  reference (CPU, per query point, data-dependent loops)
    choiceTInit: 4-layer coarse-to-fine scan over trajectory time
    gradientDescent: Armijo-type projected 1-D descent on t
    getTrueSDFofSweptVolume: GSIP expanding-disk solve for interior pts

  here (TPU, dense fixed-shape, vmapped over query points)
    _tstar_search: dense coarse scan (K samples over [0, T]) + R rounds
      of window refinement, all argmin reductions — no data-dependent
      control flow, everything fuses into big elementwise VPU work.
    gsip_inside: fixed-iteration expanding-disk loop over a static polar
      sample set mirroring SampleSet2D (sw_manager.hpp:25-124,916-1018),
      with a batch-global lax.cond so collision-free batches skip the
      expensive interior solve entirely.

Gradients: grad_prel is the *exact* `jax.grad` of the analytic shape
SDF at (p_rel, t*) — replacing the reference's 1e-6 central differences
— and is returned in the world frame (outside: R(t*)·∇sdf; inside: the
normalized direction to the GSIP corner point, matching
sw_manager.hpp:1010-1017).
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from svsdf_tpu.models.shapes import Shape2D
from svsdf_tpu.utils import trajectory as trj

PI = math.pi

#: per-GSIP-iteration theta resolution schedule, mirroring SampleSet2D
#: initSet/expandSet (theta_res0 = pi+0.1, /=3 each expand, floor 0.3).
_GSIP_THETA_RES = []
_tr = PI + 0.1
for _ in range(16):
    _GSIP_THETA_RES.append(_tr)
    _tr = max(0.3, _tr / 3.0)


@dataclasses.dataclass(frozen=True)
class SVSDFConfig:
    """Static search-resolution knobs (shapes must be trace-constant)."""
    coarse_n: int = 256       # dense time samples over [0, T]
    refine_rounds: int = 3    # argmin window refinements
    refine_n: int = 32        # samples per refinement round
    gsip_iters: int = 8       # expanding-disk iterations (sw_manager:989)
    gsip_max_samples: int = 21  # static pad of per-iter polar samples
    gsip_r0: float = 10.0     # initial disk radius (sw_manager:925)
    gsip_tol: float = 0.1     # |max g| stop threshold (sw_manager:996)
    gsip_coarse_n: int = 96   # cheaper t*-search for GSIP boundary evals
    gsip_refine_rounds: int = 0   # 0 = table-parabola refinement (free)
    use_inside: bool = True   # run the GSIP interior solve at all
    #: >0: run GSIP only on the K points with the most-negative
    #: outside-pass SDF and scatter the results back; the rest keep
    #: min-over-time SDF (still a valid interior value/direction, just
    #: not the disk distance). Inside an optimizer batch only a
    #: handful of the M obstacle points are interior at once, so this
    #: cuts the dominant polish-stage cost ~M/K-fold. Under a sharded
    #: obs axis (parallel/batch.py) the top-K is per shard — more
    #: total GSIP points than the unsharded global top-K, which is
    #: conservative (never less accurate), just not bitwise equal.
    gsip_topk: int = 0
    #: dtype for the dense coarse scans ("bfloat16" doubles VPU
    #: throughput on the dominant elementwise SDF work; the f32
    #: refinement rounds restore full precision — only the bracketing
    #: argmin comes from the low-precision pass). None = input dtype.
    scan_dtype: str | None = None
    #: run the GSIP iterations as a lax.fori_loop with a fixed padded
    #: sample count instead of unrolled per-iteration static counts.
    #: ~15% more boundary evals (masked), but the compiled program
    #: holds ONE GSIP body instead of gsip_iters copies — executables
    #: embedding the interior solve shrink several-fold, which is what
    #: bounds cold-start (and cache-load) time on the remote backend.
    gsip_fori: bool = False
    #: >0: the refinement rounds read the trajectory pose by LINEAR
    #: INTERPOLATION from a shared fine table of this many samples
    #: instead of evaluating the piecewise polynomial per (point,
    #: sample). The exact per-point pose eval materializes
    #: (M, S, N_pieces, 6) basis tensors — the single biggest HBM-
    #: traffic term in the whole op (roofline AI~0.15); the interp
    #: path costs two (M, S) gathers from a (K_f, 3) table. Pose
    #: interp error is O((T/K_f)^2 * |acc|) — ~1e-3 m at K_f=512 on
    #: the scenario trajectories, below the refinement's own bracket
    #: resolution. 0 = exact polynomial eval (reference semantics).
    refine_interp_n: int = 0
    #: Pallas coarse-scan kernel (ops/pallas_svsdf.py). Measured on a
    #: real v5e chip (K=256, honest host-readback sync): XLA's fused
    #: min/argmin-into-producer is ~1.4-4x faster than the hand kernel
    #: at M=262k..1M, so the default stays on the XLA path; True opts
    #: into the kernel (useful as a cross-check and for future tuning).
    use_pallas: bool | None = None
    pallas_min_points: int = 4096


DEFAULT_CONFIG = SVSDFConfig()


class SVSDFResult(NamedTuple):
    sdf: jnp.ndarray          # (...,) swept-volume SDF (negative inside)
    t_star: jnp.ndarray       # (...,) minimizing trajectory time
    grad_world: jnp.ndarray   # (..., 2) world-frame SDF spatial gradient


def sdf_at_time(shape: Shape2D, traj: trj.Trajectory, p_world, t):
    """Robot SDF at world points for trajectory time(s) t
    (getSDFAtTimeStamp, sw_manager.hpp:738-752). Broadcasts p (...,2)
    against t (...)."""
    xy, yaw, R = trj.state_se2(traj, t)
    p_rel = trj.world_to_body(xy, R, p_world)
    return shape.sdf_t(p_rel, t)


class PoseTable(NamedTuple):
    """Trajectory poses at K shared time samples — computed once and
    reused by every query point, GSIP iteration and boundary sample
    (the reference recomputes trajectory states per SDF call;
    sharing this table is the single biggest TPU win)."""
    ts: jnp.ndarray       # (K,)
    xy: jnp.ndarray       # (K, 2)
    cos: jnp.ndarray      # (K,)
    sin: jnp.ndarray      # (K,)


def make_pose_table(traj: trj.Trajectory, n: int) -> PoseTable:
    ts = jnp.linspace(0.0, traj.total_duration, n)
    xy, yaw, _ = trj.state_se2(traj, ts)
    return PoseTable(ts, xy, jnp.cos(yaw), jnp.sin(yaw))


def _sdf_from_table(shape: Shape2D, table: PoseTable, points,
                    dtype=None):
    """SDF of M points at the table's K shared times: (M, K).

    The trajectory pose comes precomputed and broadcast over the query
    points — the memory-traffic key to the whole op (a per-point pose
    eval would materialize (M, K, N, 6) basis tensors and go
    HBM-bound)."""
    if dtype is not None:
        table = PoseTable(*(v.astype(dtype) for v in table))
        points = points.astype(dtype)
    d = points[:, None, :] - table.xy[None]       # (M, K, 2)
    c, s = table.cos, table.sin
    prx = c[None] * d[..., 0] + s[None] * d[..., 1]
    pry = -s[None] * d[..., 0] + c[None] * d[..., 1]
    return shape.sdf_xy_t(prx, pry, table.ts[None])


def _sdf_many_times(shape: Shape2D, traj, points, ts):
    """SDF of M points at K shared trajectory times: (M, K)."""
    xy, yaw, _ = trj.state_se2(traj, ts)          # (K, 2), (K,)
    return _sdf_from_table(
        shape, PoseTable(ts, xy, jnp.cos(yaw), jnp.sin(yaw)), points)


def _sdf_points_times(shape: Shape2D, traj, points, t):
    """SDF of M points, each at its OWN S times: points (M,2), t (M,S)
    -> (M,S). Per-point pose eval (one-hot dense; utils/trajectory.py),
    used only by the narrow refinement rounds."""
    xy, yaw, _ = trj.state_se2(traj, t)           # (M,S,2), (M,S)
    d = points[:, None, :] - xy
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    prx = c * d[..., 0] + s * d[..., 1]
    pry = -s * d[..., 0] + c * d[..., 1]
    return shape.sdf_xy_t(prx, pry, t)


class FineTable(NamedTuple):
    """Dense (xy, yaw) pose samples for interpolated per-point pose
    reads (SVSDFConfig.refine_interp_n)."""
    xy: jnp.ndarray    # (K_f, 2)
    yaw: jnp.ndarray   # (K_f,)


def make_fine_table(traj: trj.Trajectory, n: int) -> FineTable:
    ts = jnp.linspace(0.0, traj.total_duration, n)
    xy, yaw, _ = trj.state_se2(traj, ts)
    return FineTable(xy, yaw)


def _sdf_points_times_interp(shape: Shape2D, ft: FineTable, total,
                             points, t):
    """Interpolated-pose variant of _sdf_points_times: pose at each
    (point, sample) time comes from a lerp of the shared fine table —
    two small gathers instead of an N_pieces-wide polynomial eval.
    Yaw lerps directly (the yaw channel is an unwrapped R spline
    coordinate, never seam-wrapped; utils/trajectory.py state_se2)."""
    kf = ft.xy.shape[0]
    u = jnp.clip(t / total, 0.0, 1.0) * (kf - 1)
    i0 = jnp.clip(u.astype(jnp.int32), 0, kf - 2)
    w = (u - i0)[..., None]
    xy = ft.xy[i0] * (1.0 - w) + ft.xy[i0 + 1] * w        # (M,S,2)
    yaw = ft.yaw[i0] * (1.0 - w[..., 0]) + ft.yaw[i0 + 1] * w[..., 0]
    d = points[:, None, :] - xy
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    prx = c * d[..., 0] + s * d[..., 1]
    pry = -s * d[..., 0] + c * d[..., 1]
    return shape.sdf_xy_t(prx, pry, t)


def tstar_search_batch(shape, traj, points, cfg: SVSDFConfig,
                       table: PoseTable | None = None):
    """Batched argmin of SDF over trajectory time for M points.

    Replaces choiceTInit + gradientDescent (sw_manager.hpp:539-725,
    1249-1334): a dense coarse scan over K shared time samples, then
    `refine_rounds` WIDE refinement rounds — each samples refine_n
    times across the bracketing cell at once and shrinks the bracket
    by ~2/(refine_n-1). Wide rounds beat a golden-section scan on TPU:
    sequential depth 2-3 instead of 16-24 at the same accuracy
    (bracket shrinks as (2/(S-1))^R vs 0.618^(8R)).
    Returns (sdf_min (M,), t_star (M,)).
    """
    total = traj.total_duration
    m = points.shape[0]
    # None = XLA path (measured faster on v5e; see SVSDFConfig.use_pallas)
    use_pallas = (bool(cfg.use_pallas) and m >= cfg.pallas_min_points
                  and not getattr(shape, "time_varying", False))
    if use_pallas:
        # fused VMEM K-loop: the (M, K) SDF matrix never hits HBM
        from svsdf_tpu.ops import pallas_svsdf
        ts = jnp.linspace(0.0, total, cfg.coarse_n)
        xy, yaw, _ = trj.state_se2(traj, ts)
        best, i = pallas_svsdf.coarse_scan(shape, points, xy, yaw)
        dt = total / (cfg.coarse_n - 1)
    else:
        if table is None:
            table = make_pose_table(traj, cfg.coarse_n)
        d = _sdf_from_table(shape, table, points,
                            dtype=cfg.scan_dtype)     # (M, K)
        i = jnp.argmin(d, axis=1)
        best = jnp.min(d, axis=1).astype(points.dtype)
        dt = total / (table.ts.shape[0] - 1)
    t0 = i * dt

    if cfg.refine_rounds == 0 and not use_pallas:
        # zero-extra-eval parabola refinement on the coarse table:
        # vertex of the quadratic through (f[i-1], f[i], f[i+1]).
        # Used by the GSIP inner searches where the reference itself
        # only needs |max g| < 0.1 accuracy (sw_manager.hpp:996).
        k = d.shape[1]
        im = jnp.clip(i - 1, 0, k - 1)
        ip = jnp.clip(i + 1, 0, k - 1)
        fm = jnp.take_along_axis(d, im[:, None], 1)[:, 0].astype(
            points.dtype)
        fp = jnp.take_along_axis(d, ip[:, None], 1)[:, 0].astype(
            points.dtype)
        denom = fm - 2.0 * best + fp
        delta = jnp.where(denom > 1e-9,
                          0.5 * (fm - fp) / jnp.where(denom > 1e-9,
                                                      denom, 1.0), 0.0)
        delta = jnp.clip(delta, -1.0, 1.0)
        interior = (i > 0) & (i < k - 1) & (denom > 1e-9)
        t_star = jnp.where(interior,
                           jnp.clip(t0 + delta * dt, 0.0, total), t0)
        f_star = jnp.where(interior, best - 0.25 * (fm - fp) * delta,
                           best)
        return jnp.minimum(f_star, best), t_star

    lo = jnp.clip(t0 - dt, 0.0, total)
    hi = jnp.clip(t0 + dt, 0.0, total)

    sn = max(cfg.refine_n, 4)
    u = jnp.linspace(0.0, 1.0, sn)
    t_star = t0
    if cfg.refine_interp_n > 0:
        ft = make_fine_table(traj, cfg.refine_interp_n)
        sample = lambda tc: _sdf_points_times_interp(shape, ft, total,
                                                     points, tc)
    else:
        sample = lambda tc: _sdf_points_times(shape, traj, points, tc)
    for _ in range(max(1, cfg.refine_rounds)):
        t_cand = lo[:, None] + (hi - lo)[:, None] * u[None]   # (M, S)
        f = sample(t_cand)
        j = jnp.argmin(f, axis=1)
        fj = jnp.min(f, axis=1)
        tj = jnp.take_along_axis(t_cand, j[:, None], 1)[:, 0]
        better = fj < best
        best = jnp.minimum(fj, best)
        t_star = jnp.where(better, tj, t_star)
        h = (hi - lo) / (sn - 1)
        lo = jnp.clip(tj - h, 0.0, total)
        hi = jnp.clip(tj + h, 0.0, total)
    return best, t_star


def _tstar_search(shape, traj, p, cfg: SVSDFConfig):
    """Single-point wrapper (kept for tests)."""
    sdf, t = tstar_search_batch(shape, traj, p[None], cfg)
    return sdf[0], t[0]


def _grad_world_at(shape, traj, p, t):
    """World-frame spatial SDF gradient at (p, t): R(t) @ dsdf/dp_rel."""
    xy, yaw, R = trj.state_se2(traj, t)
    p_rel = trj.world_to_body(xy, R, p)
    g_rel = jax.grad(lambda q: shape.sdf_t(q, t))(p_rel)
    return R @ g_rel


def _pick_gsip_velocity(traj, t_star):
    """Reference edge-case handling (sw_manager.hpp:927-950): if the
    velocity at t* is degenerate near either trajectory end, scan at
    0.1 s steps toward the interior for the first non-degenerate one."""
    total = traj.total_duration
    v = trj.eval_at(traj, t_star, 1)[:2]
    deg = jnp.linalg.norm(v) < 0.01
    sign = jnp.where(t_star < 0.1, 1.0, jnp.where(t_star > total - 0.1,
                                                  -1.0, 0.0))
    n_scan = 16
    cand_t = jnp.clip(t_star + sign * 0.1 * jnp.arange(1, n_scan + 1),
                      0.0, total)
    cand_v = trj.eval_at(traj, cand_t, 1)[:, :2]
    ok = jnp.linalg.norm(cand_v, axis=-1) >= 0.01
    first = jnp.argmax(ok)
    found = jnp.any(ok) & (sign != 0.0)
    v_repl = jnp.where(found, cand_v[first], v)
    return jnp.where(deg, v_repl, v)


def _gsip_inside(shape, traj, p, t_star0, cfg: SVSDFConfig,
                 table: PoseTable | None = None):
    """Expanding-disk GSIP solve for a point inside the swept volume
    (getTrueSDFofSweptVolume, sw_manager.hpp:916-1018).

    Finds r* = radius of the largest disk centered at p contained in
    the swept volume; returns (-r*, t*, world gradient toward the
    binding boundary point). `table` is the shared gsip_coarse_n pose
    table (built once per query batch in svsdf_query).
    """
    inner_cfg = dataclasses.replace(
        cfg, coarse_n=cfg.gsip_coarse_n,
        refine_rounds=cfg.gsip_refine_rounds,
        refine_n=min(cfg.refine_n, 16), use_pallas=False)
    if table is None:
        table = make_pose_table(traj, cfg.gsip_coarse_n)

    vel = _pick_gsip_velocity(traj, t_star0)
    theta_init = jnp.arctan2(vel[0], -vel[1])  # sw_manager.hpp:79

    carry = (jnp.asarray(cfg.gsip_r0, dtype=t_star0.dtype),
             theta_init, theta_init, t_star0,
             jnp.asarray(False))

    def gsip_iter(carry, theta_res, n_samp, count_mask=None):
        """One expanding-disk iteration over n_samp (static) polar
        samples; count_mask masks padded samples (fori path)."""
        r, theta0, theta_star, t_star, done = carry
        thetas = theta0 + theta_res * jnp.arange(n_samp)
        ys = p + r * jnp.stack([jnp.cos(thetas), jnp.sin(thetas)], -1)
        g, ts = tstar_search_batch(shape, traj, ys, inner_cfg,
                                   table=table)
        if count_mask is not None:
            g = jnp.where(count_mask, g, -jnp.inf)
        jstar = jnp.argmax(g)
        max_g = g[jstar]
        new_r = r - max_g
        new_theta_star = thetas[jstar]
        new_t_star = ts[jstar]
        new_done = done | (jnp.abs(max_g) < cfg.gsip_tol)
        # expandSet: next iteration re-centers thetas on theta_star
        return (jnp.where(done, r, new_r),
                jnp.where(done, theta0, new_theta_star),
                jnp.where(done, theta_star, new_theta_star),
                jnp.where(done, t_star, new_t_star),
                new_done)

    if cfg.gsip_fori:
        # single loop body, padded sample count (compile-size path)
        res_table = jnp.asarray(_GSIP_THETA_RES[:cfg.gsip_iters],
                                dtype=t_star0.dtype)
        counts = jnp.asarray(
            [min(int(math.ceil(2.0 * PI / _GSIP_THETA_RES[k])),
                 cfg.gsip_max_samples) for k in range(cfg.gsip_iters)])

        def body(k, c):
            mask = jnp.arange(cfg.gsip_max_samples) < counts[k]
            return gsip_iter(c, res_table[k], cfg.gsip_max_samples,
                             count_mask=mask)

        carry = jax.lax.fori_loop(0, cfg.gsip_iters, body, carry)
    else:
        # Unrolled with per-iteration STATIC sample counts from the
        # theta-resolution schedule (2, 6, 18, 21, ... samples) — no
        # masked/wasted boundary evals (throughput path).
        for k in range(cfg.gsip_iters):
            theta_res = _GSIP_THETA_RES[k]
            count = min(int(math.ceil(2.0 * PI / theta_res)),
                        cfg.gsip_max_samples)
            carry = gsip_iter(carry, theta_res, count)
    r_star, _, theta_star, t_star, _ = carry

    corner = p + r_star * jnp.stack([jnp.cos(theta_star),
                                     jnp.sin(theta_star)], -1)
    gdir = corner - p
    gnorm = jnp.linalg.norm(gdir)
    grad_world = jnp.where(gnorm > 1e-12, gdir / jnp.maximum(gnorm, 1e-12),
                           jnp.zeros_like(gdir))
    return -r_star, t_star, grad_world


def svsdf_query(shape: Shape2D, traj: trj.Trajectory, points,
                cfg: SVSDFConfig = DEFAULT_CONFIG,
                with_inside: bool = True) -> SVSDFResult:
    """Batched true swept-volume SDF query.

    points: (M, 2) world points -> SVSDFResult of (M,) / (M, 2).

    Outside points get min-over-time robot SDF; inside points (sdf < 0)
    get the GSIP interior distance. The GSIP pass runs under a
    batch-global lax.cond, so when nothing is inside (the common case
    near convergence) its cost vanishes.
    """
    points = jnp.asarray(points)
    sdf, t_star = tstar_search_batch(shape, traj, points, cfg)
    grad_world = jax.vmap(lambda q, t: _grad_world_at(shape, traj, q, t))(
        points, t_star)

    if not with_inside:
        return SVSDFResult(sdf, t_star, grad_world)

    inside = sdf < 0.0
    gsip_table = make_pose_table(traj, cfg.gsip_coarse_n)
    m = points.shape[0]
    topk = cfg.gsip_topk if 0 < cfg.gsip_topk < m else 0

    if topk:
        # compact: GSIP only the K most-interior points, scatter back.
        _, idx = jax.lax.top_k(-sdf, topk)
        pts_k, t_k = points[idx], t_star[idx]
        ins_k = inside[idx]

        def run_gsip(_):
            g_sdf, g_t, g_grad = jax.vmap(
                lambda q, t0: _gsip_inside(shape, traj, q, t0, cfg,
                                           table=gsip_table))(pts_k, t_k)
            s2 = sdf.at[idx].set(jnp.where(ins_k, g_sdf, sdf[idx]))
            t2 = t_star.at[idx].set(jnp.where(ins_k, g_t, t_star[idx]))
            g2 = grad_world.at[idx].set(
                jnp.where(ins_k[:, None], g_grad, grad_world[idx]))
            return s2, t2, g2
    else:
        def run_gsip(_):
            # compute for every point; mask below (vmap turns cond
            # into select)
            g_sdf, g_t, g_grad = jax.vmap(
                lambda q, t0: _gsip_inside(shape, traj, q, t0, cfg,
                                           table=gsip_table))(
                    points, t_star)
            return (jnp.where(inside, g_sdf, sdf),
                    jnp.where(inside, g_t, t_star),
                    jnp.where(inside[..., None], g_grad, grad_world))

    def skip(_):
        return sdf, t_star, grad_world

    sdf2, t2, g2 = jax.lax.cond(jnp.any(inside), run_gsip, skip, None)
    return SVSDFResult(sdf2, t2, g2)


def svsdf_grid(shape: Shape2D, traj: trj.Trajectory, xs, ys,
               cfg: SVSDFConfig = DEFAULT_CONFIG,
               with_inside: bool = False):
    """Dense SVSDF field over a 2-D grid (viz / benchmark path,
    replacing the continuation-meshing sw_calculate.cpp with a dense
    device sweep). Returns (len(xs), len(ys)) SDF array."""
    gx, gy = jnp.meshgrid(xs, ys, indexing="ij")
    pts = jnp.stack([gx.ravel(), gy.ravel()], axis=-1)
    res = svsdf_query(shape, traj, pts, cfg, with_inside=with_inside)
    return res.sdf.reshape(len(xs), len(ys))
