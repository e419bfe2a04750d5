"""Full planning pipeline: map -> A* -> mid end -> SVSDF back end.

Re-design of PlannerManager
(`src/plan_manager/src/plan_manager.cpp:47-231`): owns the shape, the
occupancy map, the device feasibility maps, and drives
generatePath (:96) / generateTraj (:128) on each (start, goal) request.
"""

from __future__ import annotations

import functools
import math
import time
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from svsdf_tpu.models import shapes
from svsdf_tpu.ops import kernels as kops
from svsdf_tpu.ops.svsdf import DEFAULT_CONFIG, SVSDFConfig, svsdf_query
from svsdf_tpu.planner import astar, back_end, mid_end
from svsdf_tpu.utils import cache
from svsdf_tpu.utils import trajectory as trj
from svsdf_tpu.utils.config import PlannerConfig
from svsdf_tpu.utils.gridmap import GridMap


class PlanResult(NamedTuple):
    success: bool
    traj: Optional[trj.Trajectory]       # final optimized trajectory
    mid_traj: Optional[trj.Trajectory]   # warm-start trajectory
    astar_path: np.ndarray               # (L, 3)
    obstacles: np.ndarray                # (M, 3) harvested SVSDF points
    mid_cost: float
    final_cost: float
    #: map-wide certificate: True iff every occupied voxel near the
    #: trajectory has positive swept-volume SDF (min_cert_sdf > 0).
    #: The reference has no such check and silently emits colliding
    #: trajectories in narrow-corridor cases. Defaults to False: an
    #: unexamined (e.g. failed) plan is not certified.
    certified: bool = False
    min_cert_sdf: float = float("nan")
    #: per-stage wall-clock breakdown of the WINNING attempt (front_s,
    #: mid_s, back_s, certify_s, refine_rounds, n_obstacles) plus
    #: plan-level counters added by plan() (attempts).
    timings: Optional[dict] = None


class Planner:
    """Holds per-(map, shape) state; plan() runs the full pipeline."""

    def __init__(self, config: PlannerConfig, map_points: np.ndarray,
                 svs_cfg: SVSDFConfig = DEFAULT_CONFIG,
                 use_transition_check: bool = True,
                 conservative_yaw_substeps: int = 1,
                 fine_yaw_factor: int = 2,
                 solver: str = "lbfgs",
                 shape: Optional[shapes.Shape2D] = None):
        cache.enable_persistent_compilation_cache()
        self.config = config
        self.svs_cfg = svs_cfg
        #: back-end nonsmooth solver: "lbfgs" (weak-Wolfe L-BFGS) or
        #: "lmbm" (the reference's bundle method, utils/lmbm.py)
        self.solver = solver
        #: last-resort retry rung: rebuild the planner with
        #: kernel_yaw_num * factor for factor in (fine_yaw_factor,
        #: fine_yaw_factor**2) when every attempt of the standard
        #: ladder leaves the trajectory uncertified (<=1 disables).
        #: Measured: sdCutDisk — uncertifiable at the reference's 18
        #: bins (min_cert_sdf -0.27 after the full ladder) — certifies
        #: at 36 bins (+0.83) because the finer bins give A* yaw
        #: options whose continuous interpolation the big cut-disk can
        #: actually follow. The second (factor²) step targets long
        #: thin shapes (sdRhombus spans ~9 m tip to tip): a 20°/bin
        #: discretization sweeps ~1.5 m laterally at the tips between
        #: bins, which no optimizer polish can certify away.
        self._fine_yaw_factor = max(int(fine_yaw_factor), 0)
        self._map_points = np.asarray(map_points)
        self._yaw_substeps = conservative_yaw_substeps
        self._fine_planners: dict = {}
        #: explicit shape overrides config.inputdata (deformable robots
        #: pass a ScaledShape whose scale schedule is a callable; its
        #: time-free sdf_xy is the conservative max-scale footprint the
        #: front-end kernels rasterize)
        self.shape = shape if shape is not None else \
            shapes.shape_from_objpath(config.inputdata,
                                      config.poly_params)
        self.grid = GridMap.from_points(
            map_points, config.occupancy_resolution, config.sta_threshold)
        # device precompute: yaw-bin + transition feasibility for the map
        safemargin = max(config.front_end_safeh,
                         config.occupancy_resolution / 2.0)
        self._shape_key = cache.shape_cache_key(self.shape)
        self._kernels = jnp.asarray(self._memo(
            f"kern:{config.kernel_size}:{config.kernel_yaw_num}:"
            f"{config.occupancy_resolution}:{safemargin}:"
            f"{conservative_yaw_substeps}",
            lambda: kops.rasterize_shape_kernels(
                self.shape, config.kernel_size, config.kernel_yaw_num,
                config.occupancy_resolution, safemargin,
                yaw_substeps=conservative_yaw_substeps)))
        occ2d = jnp.asarray(self.grid.occ2d)
        self.feas = np.asarray(kops.feasibility_maps(occ2d, self._kernels))
        self._occ2d_dev = occ2d
        if use_transition_check:
            # guard ladder: the exact full-footprint guard first (keeps
            # warm starts continuously feasible); if A* finds no path —
            # big shapes whose 20-degree bin sweeps are too fat for the
            # corridor — fall back to looser guards, ending at the
            # reference's +-2 m box (front_end_Astar.hpp:68,222).
            full = (config.kernel_size // 2 + 2) * \
                config.occupancy_resolution
            self.guard_ladder = [g for g in (full, 4.0, 2.0)
                                 if g <= full]
            if self.guard_ladder[-1] != 2.0:
                self.guard_ladder.append(2.0)
        else:
            self.guard_ladder = [None]
        self._trans_feas_cache = {}
        #: kernel bounding box, bdx = kernel_size * resolution
        #: (plan_manager.cpp:57-59)
        self.bd = config.kernel_size * config.occupancy_resolution

    # -- precompute memoization ---------------------------------------------

    def _memo(self, key: str, fn):
        """Disk-memoize a one-shot device precompute keyed on the shape
        identity + `key` (utils/cache.py). Shapes without a stable
        cross-process identity (time-varying scale callables) compute
        in-process only."""
        if self._shape_key is None:
            return np.asarray(fn())
        return cache.memoize_npz(f"{self._shape_key}|{key}", fn)

    # -- front end ---------------------------------------------------------

    def _stencils(self, guard):
        if guard not in self._trans_feas_cache:
            self._trans_feas_cache[guard] = jnp.asarray(self._memo(
                f"trans:{self.config.kernel_yaw_num}:"
                f"{self.config.occupancy_resolution}:{guard}",
                lambda: kops.transition_stencils(
                    self.shape, self.config.kernel_yaw_num,
                    self.config.occupancy_resolution,
                    guard_half_world=guard)))
        return self._trans_feas_cache[guard]

    def _trans_feas(self, guard, occ2d_dev=None):
        if guard is None:
            return None
        if occ2d_dev is None:            # cache the default-map result
            key = ("tf", guard)
            if key not in self._trans_feas_cache:
                self._trans_feas_cache[key] = np.asarray(
                    kops.transition_feasibility(self._occ2d_dev,
                                                self._stencils(guard)))
            return self._trans_feas_cache[key]
        return np.asarray(kops.transition_feasibility(
            occ2d_dev, self._stencils(guard)))

    def _conservative_feas(self, occ2d_dev=None):
        """Feasibility maps from conservative (yaw-range-union)
        kernels; lazily rasterized and cached for the default map."""
        if getattr(self, "_cons_kernels", None) is None:
            cfg = self.config
            safemargin = max(cfg.front_end_safeh,
                             cfg.occupancy_resolution / 2.0)
            self._cons_kernels = jnp.asarray(self._memo(
                f"kern:{cfg.kernel_size}:{cfg.kernel_yaw_num}:"
                f"{cfg.occupancy_resolution}:{safemargin}:5",
                lambda: kops.rasterize_shape_kernels(
                    self.shape, cfg.kernel_size, cfg.kernel_yaw_num,
                    cfg.occupancy_resolution, safemargin,
                    yaw_substeps=5)))
        if occ2d_dev is None:
            if getattr(self, "_cons_feas_cache", None) is None:
                self._cons_feas_cache = np.asarray(kops.feasibility_maps(
                    self._occ2d_dev, self._cons_kernels))
            return self._cons_feas_cache
        return np.asarray(kops.feasibility_maps(occ2d_dev,
                                                self._cons_kernels))

    def generate_path(self, start, goal, occ2d_dev=None,
                      conservative: bool = False) -> astar.AstarResult:
        """A* over the guard ladder. occ2d_dev optionally overrides the
        2-D occupancy slice (used by the homotopy retry to block cells
        a previous attempt's trajectory could not clear); conservative
        switches to yaw-range-union kernels whose feasibility holds
        for EVERY yaw in each bin."""
        if conservative:
            feas = self._conservative_feas(occ2d_dev)
        elif occ2d_dev is None:
            feas = self.feas
        else:
            feas = np.asarray(kops.feasibility_maps(occ2d_dev,
                                                    self._kernels))
        res = None
        for guard in self.guard_ladder:
            res = astar.search(self.grid, feas,
                               self._trans_feas(guard, occ2d_dev),
                               np.asarray(start), np.asarray(goal),
                               self.config.kernel_yaw_num)
            if res.success:
                return res
        return res

    # -- waypoint subsampling + obstacle harvest ---------------------------

    def _subsample(self, path: np.ndarray, parlength: float = 3.0):
        """Waypoint subsample every index_gap (generateTraj,
        plan_manager.cpp:130-144; traj_parlength = 3.0, :75)."""
        res = self.grid.resolution
        path_size = len(path)
        gap = math.ceil(parlength / res)
        while gap >= path_size - 1 and gap > 1:
            parlength /= 1.5
            gap = math.ceil(parlength / res)
        return path[gap:path_size - 1:gap]

    def _harvest(self, waypoints: np.ndarray) -> np.ndarray:
        """Obstacle voxel centers in AABBs around the waypoints
        (plan_manager.cpp:156-175: half extents bd/3 on each axis,
        centered at the raw (x, y, yaw) waypoint)."""
        return self.grid.harvest_along_path(waypoints, self.bd / 3.0)

    # -- collision certificate + active-set refinement ---------------------

    @property
    def _occ_pts(self) -> np.ndarray:
        """World xy centers of every occupied z=0 voxel (cached)."""
        if getattr(self, "_occ_pts_cache", None) is None:
            ii, jj = np.nonzero(self.grid.occ2d)
            self._occ_pts_cache = np.stack([
                self.grid.xyz_min[0] + (ii + 0.5) * self.grid.resolution,
                self.grid.xyz_min[1] + (jj + 0.5) * self.grid.resolution,
            ], axis=-1) if len(ii) else np.zeros((0, 2))
        return self._occ_pts_cache

    def certify(self, traj: trj.Trajectory, chunk: int = 0):
        """Map-wide swept-volume collision certificate: SVSDF of every
        occupied 2-D voxel center within the trajectory's bounding box
        (inflated by the kernel half-extent + safety horizon).

        Returns (points (M, 2), sdf (M,)) — min(sdf) > 0 certifies the
        trajectory collision-free against the whole map, a stronger
        check than the reference ever runs (it only penalizes the
        AABB-harvested subset, plan_manager.cpp:156-175).

        The query runs as ONE jitted dispatch on points padded to a
        power-of-two bucket: a ragged eager chunk loop here cost
        minutes per plan over the remote-TPU tunnel (one dispatch per
        jnp op x thousands of points); bucketing means each (pieces,
        bucket) pair compiles once — and only once ever, with the
        persistent compilation cache."""
        del chunk  # legacy knob: bucketing subsumes chunking
        pts = self._occ_pts
        if len(pts) == 0:
            return np.zeros((0, 2)), np.zeros((0,))
        # restrict to the trajectory's reachable band
        ts = np.linspace(0.0, float(traj.total_duration), 64)
        xy = np.asarray(trj.pos(traj, jnp.asarray(ts)))[:, :2]
        margin = self.bd / 2.0 + self.config.safety_hor + 1.0
        lo, hi = xy.min(0) - margin, xy.max(0) + margin
        keep = np.all((pts >= lo) & (pts <= hi), axis=1)
        pts = pts[keep]
        m = len(pts)
        if m == 0:
            return np.zeros((0, 2)), np.zeros((0,))
        bucket = max(512, 1 << (m - 1).bit_length())
        pad = np.full((bucket - m, 2), 1.0e4)
        padded = jnp.asarray(np.concatenate([pts, pad]), jnp.float32)
        sdf = _certify_sdf(self.shape, traj.coeffs, traj.durations,
                           padded, self.svs_cfg)
        return pts, np.asarray(sdf)[:m]

    def _pad_obstacles(self, obs: np.ndarray, bucket: int = 256,
                       headroom: int = 0) -> np.ndarray:
        """Pad the obstacle set to the next bucket multiple with
        far-away dummy points (zero penalty) so the jitted back-end
        solve recompiles only on bucket changes, not every M.

        `headroom` pre-sizes for expected growth (the certify-refine
        rounds add up to max_active_add points per round); the chosen
        size is also kept as a monotone per-planner floor so every
        re-solve in a plan reuses ONE compiled back-end executable
        instead of recompiling each time the active set grows."""
        m = len(obs)
        target = ((m + headroom + bucket - 1) // bucket) * bucket
        target = max(target, getattr(self, "_obs_bucket_floor", 0))
        self._obs_bucket_floor = target
        if target == m:
            return obs
        pad = np.tile(np.asarray([[1e4, 1e4, 0.0]]), (target - m, 1))
        return np.concatenate([obs, pad[:, :obs.shape[1]]], axis=0)

    # -- full pipeline -----------------------------------------------------

    def plan(self, start, goal, mid_iters: int = 100,
             back_iters: int = 200, certify_rounds: int = 2,
             max_active_add: int = 512,
             certify_retries: int = 3,
             parlength: float = 3.0) -> PlanResult:
        """Full pipeline with map-wide certification.

        Retry ladder when the certify-and-refine rounds leave the
        trajectory sweeping occupied voxels:

          attempt 0  as configured (reference-parity pipeline)
          attempt 1  waypoint spacing / 3, same corridor — residual
                     violations are usually under-actuation: 3 m
                     spacing gives too little yaw control to thread a
                     tight corridor (measured: sdHorseshoe certifies at
                     1.0 m spacing, -0.20 -> +0.09; 1.5 m is not
                     enough)
          attempt 2+ additionally block the violated cells in the
                     occupancy slice, forcing A* into a different
                     homotopy class (measured: certifies
                     sdOrientedVesica, -0.32 -> +0.70 at LOWER cost)
          last       conservative front end: yaw-range-union kernels
                     (feasible for EVERY yaw in each bin) on the
                     unblocked map — picks corridors the continuous
                     shape can actually thread (measured: certifies
                     sdRhombus, -0.24 -> +0.68 at 20x lower cost), or
                     honestly refuses when none exists (sdCutDisk)

        Returns the best attempt; `certified`/`min_cert_sdf` report the
        map-wide certificate honestly (the reference never checks this
        and silently emits colliding trajectories in these cases)."""
        from svsdf_tpu.utils.debugbus import BUS
        best = None
        occ2d_dev = None
        pl = parlength
        stopped = False
        n_attempts = 1 + max(certify_retries, 0)
        attempt = -1
        attempt_log = []   # per-rung wall/outcome breakdown (timings)
        while attempt + 1 < n_attempts:
            attempt += 1
            if attempt > 0 and BUS.stop_requested:
                # debug_cmd early exit: best-so-far (§3.5). One-shot:
                # consume the request so it cannot silently degrade
                # every FUTURE plan (the reference's code-21 aborts
                # exactly one optimization run). `stopped` also skips
                # the fine-yaw escalation below — an abort must not
                # trigger minutes of fine-kernel rebuilds.
                BUS.clear_stop()
                stopped = True
                break
            conservative = (n_attempts >= 3
                            and attempt == n_attempts - 1)
            res = self._attempt(start, goal,
                                None if conservative else occ2d_dev,
                                mid_iters, back_iters, certify_rounds,
                                max_active_add,
                                # the conservative corridor is feasible
                                # at pose level — standard spacing
                                # suffices (and ~90-piece splines from
                                # densified spacing optimize poorly)
                                parlength if conservative else pl,
                                conservative=conservative)
            n_attempts_run = attempt + 1
            attempt_log.append({
                "rung": ("conservative" if conservative else attempt),
                **{k: v for k, v in (res.timings or {}).items()},
                "success": bool(res.success),
                "certified": bool(res.certified),
                "min_cert_sdf": (round(res.min_cert_sdf, 3)
                                 if math.isfinite(res.min_cert_sdf)
                                 else None)})
            if not res.success:
                # a failed front end must not gate the LATER rungs:
                # the homotopy-block retry can kill A* (no alternative
                # corridor on the blocked map) while the conservative
                # rung — which always plans on the UNBLOCKED map — and
                # the fine-yaw rung can still succeed (measured:
                # sdRhombus attempt 2 fails in 1 s, the conservative
                # rung then certifies).
                if best is None:
                    best = res
                if not conservative and occ2d_dev is None:
                    # the search is deterministic and neither the
                    # blocked map nor the conservative stencils would
                    # change on the next rung's inputs — rerunning the
                    # identical attempt fails identically. Jump
                    # straight to the conservative rung (or give up
                    # if the ladder has none).
                    if n_attempts >= 3:
                        attempt = n_attempts - 2
                    else:
                        break
                continue
            if res.certified or math.isnan(res.min_cert_sdf):
                return _stamp_attempts(res, n_attempts_run,
                                       attempt_log)
            if best is None or res.min_cert_sdf > best.min_cert_sdf:
                best = res
            if attempt == n_attempts - 1:
                break
            if attempt == 0:
                # densify to the measured-good 1 m spacing (3 m / 3):
                # sdHorseshoe certifies at 1.0 m but not 1.5 m
                pl = pl / 3.0
                continue             # attempt 1: same corridor, denser
            # attempt >= 2: block the violated voxels (plus a one-cell
            # dilation) and let A* find another homotopy class.
            # _attempt's refine loop already certified the returned
            # trajectory — reuse that certificate instead of paying
            # the full map-wide query again.
            cached = getattr(self, "_last_cert", None)
            if cached is not None:
                pts, sdf = cached
            else:
                pts, sdf = self.certify(res.traj)
            viol = pts[sdf < 0.0]
            if len(viol) == 0:
                break
            occ = np.asarray(self._occ2d_dev if occ2d_dev is None
                             else occ2d_dev).copy()
            ij = np.round((viol - self.grid.xyz_min[None, :2])
                          / self.grid.resolution - 0.5).astype(np.int64)
            for di in (-1, 0, 1):
                for dj in (-1, 0, 1):
                    ii = np.clip(ij[:, 0] + di, 0, occ.shape[0] - 1)
                    jj = np.clip(ij[:, 1] + dj, 0, occ.shape[1] - 1)
                    occ[ii, jj] = 1
            occ2d_dev = jnp.asarray(occ)
        # Last rung: the whole ladder left the best trajectory
        # uncertified — retry at escalating yaw discretizations (see
        # __init__: sdCutDisk certifies at 36 bins, never at 18;
        # long thin shapes may need the factor² step).
        if self._fine_yaw_factor > 1 and not stopped:
            f = self._fine_yaw_factor
            for factor in (f, f * f):
                if best is not None and best.certified:
                    break
                if factor == f * f and (best is None
                                        or not best.success):
                    break   # nothing plannable even at factor f —
                    # don't pay the factor² build for a lost cause
                    # (e.g. unreachable goal)
                fine = self._get_fine_planner(factor)
                t_fine = time.time()
                res = fine.plan(start, goal, mid_iters=mid_iters,
                                back_iters=back_iters,
                                certify_rounds=certify_rounds,
                                max_active_add=max_active_add,
                                certify_retries=certify_retries,
                                parlength=parlength)
                attempt_log.append({
                    "rung": f"fine_yaw_x{factor}",
                    "wall_s": round(time.time() - t_fine, 2),
                    "success": bool(res is not None and res.success),
                    "certified": bool(res is not None
                                      and res.certified)})
                if res is not None and res.success and (
                        best is None
                        or not best.success
                        or res.certified
                        or (math.isfinite(res.min_cert_sdf)
                            and not (res.min_cert_sdf
                                     <= best.min_cert_sdf))):
                    best = res
        return _stamp_attempts(best, attempt + 1, attempt_log) \
            if best is not None else best

    def _get_fine_planner(self, factor: int) -> "Planner":
        """Lazily build (and cache) the fine-yaw retry planner: same
        map and config but kernel_yaw_num scaled by `factor`. The
        clone has its own rung disabled — plan() drives the
        escalation ladder explicitly."""
        if factor not in self._fine_planners:
            import dataclasses
            cfg = dataclasses.replace(
                self.config,
                kernel_yaw_num=self.config.kernel_yaw_num * factor)
            self._fine_planners[factor] = Planner(
                cfg, self._map_points, svs_cfg=self.svs_cfg,
                use_transition_check=self.guard_ladder != [None],
                conservative_yaw_substeps=self._yaw_substeps,
                fine_yaw_factor=0, solver=self.solver,
                shape=self.shape)
        return self._fine_planners[factor]

    def _attempt(self, start, goal, occ2d_dev, mid_iters, back_iters,
                 certify_rounds, max_active_add,
                 parlength: float = 3.0,
                 conservative: bool = False) -> PlanResult:
        self._last_cert = None
        tm = {"front_s": 0.0, "mid_s": 0.0, "back_s": 0.0,
              "certify_s": 0.0, "refine_rounds": 0}
        t0 = time.time()
        front = self.generate_path(np.asarray(start), np.asarray(goal),
                                   occ2d_dev=occ2d_dev,
                                   conservative=conservative)
        tm["front_s"] = round(time.time() - t0, 2)
        empty = np.zeros((0, 3))
        if not front.success:
            return PlanResult(False, None, None, front.path, empty,
                              float("nan"), float("nan"), timings=tm)
        path = front.path
        q = self._subsample(path, parlength)
        if len(q) == 0:
            # degenerate short path: single midpoint
            q = path[len(path) // 2][None]
        obstacles = self._harvest(q)

        n = len(q) + 1
        head = np.zeros((3, 3))
        tail = np.zeros((3, 3))
        head[0] = path[0]
        tail[0] = path[-1]
        # Pin the CONTINUOUS endpoints: xy from the requested start /
        # goal, yaw from the A* path's unwrapped endpoint yaw. The
        # reference snaps both ends to A* cell centers
        # (plan_manager.cpp:143-147) — up to res/2*sqrt(2) endpoint
        # error (0.49 m measured on sdOrientedVesica at res 1.0); the
        # requested pose lies in the same feasible cell, and the
        # map-wide certificate + retry ladder below still guard the
        # continuous sweep.
        head[0, :2] = np.asarray(start, float)[:2]
        tail[0, :2] = np.asarray(goal, float)[:2]
        times = np.full(n, self.config.inittime)
        ref_rots = np.stack([_rotz(w[2]) for w in q])

        t0 = time.time()
        mid = mid_end.optimize(head, tail, q, times, ref_rots,
                               self.config, max_iters=mid_iters)
        jax.block_until_ready(mid.opt_x)
        tm["mid_s"] = round(time.time() - t0, 2)

        if len(obstacles) == 0:
            # nothing harvested near the corridor: certify the mid-end
            # trajectory map-wide; on violation fall through to the
            # back end with the violators as the obstacle set
            t0 = time.time()
            pts, sdf = self.certify(mid.traj)
            tm["certify_s"] += round(time.time() - t0, 2)
            self._last_cert = (pts, sdf)
            if len(pts) == 0 or not np.any(sdf < 0.5 *
                                           self.config.safety_hor):
                m = float(sdf.min()) if len(sdf) else float("inf")
                return PlanResult(True, mid.traj, mid.traj, path,
                                  obstacles, float(mid.cost),
                                  float(mid.cost), certified=True,
                                  min_cert_sdf=m, timings=tm)
            bad = sdf < 0.5 * self.config.safety_hor
            obstacles = np.concatenate(
                [pts[bad], np.zeros((int(bad.sum()), 1))], axis=1)

        obstacles = self._pad_obstacles(obstacles, headroom=max_active_add)
        t0 = time.time()
        back = back_end.optimize(self.shape, head, tail, obstacles,
                                 mid.opt_x, self.config, self.svs_cfg,
                                 max_iters=back_iters, solver=self.solver)
        jax.block_until_ready(back.opt_x)
        tm["back_s"] = round(time.time() - t0, 2)

        # Certify-and-refine (active-set expansion): the reference only
        # ever penalizes the AABB-harvested subset, so trajectories can
        # sweep unseen map voxels; here every round re-checks the WHOLE
        # map, adds the worst violating/near-active voxels to the
        # obstacle set, escalates the penalty weight, and re-solves
        # warm-started from the previous solution.
        from svsdf_tpu.utils.debugbus import BUS
        cfg = self.config
        weight_p, safety_hor = cfg.weight_p, cfg.safety_hor
        min_sdf = float("inf")
        prev_min = None
        budget = certify_rounds
        round_ = 0
        while True:
            t0 = time.time()
            pts, sdf = self.certify(back.traj)
            tm["certify_s"] += round(time.time() - t0, 2)
            self._last_cert = (pts, sdf)   # reused by plan()'s retry
            if BUS.stop_requested and round_ > 0:
                min_sdf = float(sdf.min()) if len(sdf) else float("inf")
                BUS.clear_stop()           # one-shot consume (§3.5)
                break
            min_sdf = float(sdf.min()) if len(sdf) else float("inf")
            if len(pts) == 0 or not np.any(sdf < 0.0):
                break                      # collision-free: done
            if round_ == budget:
                # near-miss extension: the equilibrium settled a few cm
                # inside the boundary (not a wrong corridor). Extra
                # rounds are warm-started re-solves on the SAME compiled
                # executable (weight/margin are traced overrides) —
                # much cheaper than escalating to the next retry rung.
                # Band -0.15: sdRhombus' conservative-rung result
                # (-0.128) must qualify, it polishes to near zero.
                if -0.15 < min_sdf < 0.0 and budget < certify_rounds + 3:
                    budget += 1
                else:
                    break                  # out of refine budget
            bad = sdf < 0.5 * safety_hor
            order = np.argsort(sdf[bad])[:max_active_add]
            add = np.concatenate(
                [pts[bad][order], np.zeros((len(order), 1))], axis=1)
            merged = np.concatenate([obstacles, add], axis=0)
            # dedup on voxel identity so repeat rounds don't grow the set
            key = np.round(merged[:, :2] / self.grid.resolution).astype(
                np.int64)
            _, uniq = np.unique(key, axis=0, return_index=True)
            obstacles = self._pad_obstacles(merged[np.sort(uniq)])
            # escalate both the penalty weight and the demanded margin:
            # the weight fixes under-convergence, the margin bump fixes
            # equilibria that settle a few cm inside the boundary.
            # Passed as TRACED overrides (not a new frozen config) so
            # every round reuses one compiled back-end executable.
            weight_p = weight_p * 4.0
            safety_hor = safety_hor + 0.1
            warm_x = back.opt_x
            # Stalled-equilibrium escape: when an extension round fails
            # to improve min_sdf, penalty escalation alone is trapped
            # in the same local equilibrium — physically push the
            # nearest waypoints along the violated voxel's swept-SDF
            # gradient before re-solving. sdf_swept(v; traj + delta)
            # ≈ sdf(v) − g·delta, so delta = −ĝ·push increases the
            # violated point's clearance by ~push.
            stalled = (round_ >= certify_rounds and prev_min is not None
                       and min_sdf <= prev_min + 0.01)
            prev_min = min_sdf
            if stalled and math.isfinite(min_sdf):
                warm_x = self._nudge_waypoints(
                    np.asarray(warm_x), back.traj,
                    pts[int(np.argmin(sdf))], -min_sdf + 0.1, n)
            t0 = time.time()
            back = back_end.optimize(self.shape, head, tail, obstacles,
                                     warm_x, cfg, self.svs_cfg,
                                     weight_p=weight_p,
                                     safety_hor=safety_hor,
                                     max_iters=back_iters,
                                     mu_schedule=(0.1, 0.01),
                                     solver=self.solver)
            jax.block_until_ready(back.opt_x)
            tm["back_s"] += round(time.time() - t0, 2)
            round_ += 1
        tm["refine_rounds"] = round_
        tm["n_obstacles"] = int(len(obstacles))
        return PlanResult(True, back.traj, mid.traj, path, obstacles,
                          float(mid.cost), float(back.cost),
                          certified=(min_sdf > 0.0),
                          min_cert_sdf=min_sdf, timings=tm)

    def _nudge_waypoints(self, x: np.ndarray, traj, worst_pt,
                         push: float, n: int) -> np.ndarray:
        """Shift the waypoints nearest to the worst violated voxel
        along −(swept-SDF gradient) by `push` (Gaussian falloff with
        distance), escaping penalty equilibria the warm start keeps
        re-converging to. Returns a new decision vector
        [tau (n); waypoints ((n−1)·3)]."""
        from svsdf_tpu.ops.svsdf import svsdf_query
        x = np.array(x, copy=True)
        q = svsdf_query(self.shape, traj,
                        jnp.asarray(worst_pt[None, :2], jnp.float32),
                        self.svs_cfg)
        g = np.asarray(q.grad_world)[0]
        norm = float(np.linalg.norm(g))
        if not (np.isfinite(norm) and norm > 1e-6):
            return x
        delta = -(g / norm) * push
        wps = x[n:].reshape(n - 1, 3)
        d = np.linalg.norm(wps[:, :2] - np.asarray(worst_pt)[None, :2],
                           axis=1)
        w = np.exp(-(d / max(self.bd / 3.0, 1.0)) ** 2)
        wps[:, 0] += delta[0] * w
        wps[:, 1] += delta[1] * w
        return x


def _stamp_attempts(res: PlanResult, n: int,
                    attempt_log: list | None = None) -> PlanResult:
    tm = {**(res.timings or {}), "attempts": n}
    if attempt_log and len(attempt_log) > 1:
        tm["attempt_log"] = attempt_log
    return res._replace(timings=tm)


@functools.partial(jax.jit, static_argnums=(0, 4))
def _certify_sdf(shape, coeffs, durations, pts, svs_cfg):
    """One-dispatch certify query (jit cache key: shape, cfg, piece
    count, point bucket)."""
    traj = trj.Trajectory(coeffs, durations)
    return svsdf_query(shape, traj, pts, svs_cfg, with_inside=False).sdf


def _rotz(yaw: float) -> np.ndarray:
    c, s = math.cos(yaw), math.sin(yaw)
    return np.asarray([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
