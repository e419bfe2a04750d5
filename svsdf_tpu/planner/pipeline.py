"""Full planning pipeline: map -> A* -> mid end -> SVSDF back end.

Re-design of PlannerManager
(`src/plan_manager/src/plan_manager.cpp:47-231`): owns the shape, the
occupancy map, the device feasibility maps, and drives
generatePath (:96) / generateTraj (:128) on each (start, goal) request.
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Optional

import numpy as np
import jax.numpy as jnp

from svsdf_tpu.models import shapes
from svsdf_tpu.ops import kernels as kops
from svsdf_tpu.ops.svsdf import DEFAULT_CONFIG, SVSDFConfig
from svsdf_tpu.planner import astar, back_end, mid_end
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


class Planner:
    """Holds per-(map, shape) state; plan() runs the full pipeline."""

    def __init__(self, config: PlannerConfig, map_points: np.ndarray,
                 svs_cfg: SVSDFConfig = DEFAULT_CONFIG,
                 use_transition_check: bool = True):
        self.config = config
        self.svs_cfg = svs_cfg
        self.shape = shapes.shape_from_objpath(config.inputdata,
                                               config.poly_params)
        self.grid = GridMap.from_points(
            map_points, config.occupancy_resolution, config.sta_threshold)
        # device precompute: yaw-bin + transition feasibility for the map
        safemargin = max(config.front_end_safeh,
                         config.occupancy_resolution / 2.0)
        self._kernels = kops.rasterize_shape_kernels(
            self.shape, config.kernel_size, config.kernel_yaw_num,
            config.occupancy_resolution, safemargin)
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

    # -- front end ---------------------------------------------------------

    def _trans_feas(self, guard):
        if guard is None:
            return None
        if guard not in self._trans_feas_cache:
            stencils = kops.transition_stencils(
                self.shape, self.config.kernel_yaw_num,
                self.config.occupancy_resolution, guard_half_world=guard)
            self._trans_feas_cache[guard] = np.asarray(
                kops.transition_feasibility(self._occ2d_dev, stencils))
        return self._trans_feas_cache[guard]

    def generate_path(self, start, goal) -> astar.AstarResult:
        res = None
        for guard in self.guard_ladder:
            res = astar.search(self.grid, self.feas,
                               self._trans_feas(guard),
                               np.asarray(start), np.asarray(goal),
                               self.config.kernel_yaw_num)
            if res.success:
                return res
        return res

    # -- waypoint subsampling + obstacle harvest ---------------------------

    def _subsample(self, path: np.ndarray):
        """Waypoint subsample every index_gap (generateTraj,
        plan_manager.cpp:130-144; traj_parlength = 3.0, :75)."""
        parlength = 3.0
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

    # -- full pipeline -----------------------------------------------------

    def plan(self, start, goal, mid_iters: int = 100,
             back_iters: int = 200) -> PlanResult:
        front = self.generate_path(np.asarray(start), np.asarray(goal))
        empty = np.zeros((0, 3))
        if not front.success:
            return PlanResult(False, None, None, front.path, empty,
                              float("nan"), float("nan"))
        path = front.path
        q = self._subsample(path)
        if len(q) == 0:
            # degenerate short path: single midpoint
            q = path[len(path) // 2][None]
        obstacles = self._harvest(q)

        n = len(q) + 1
        head = np.zeros((3, 3))
        tail = np.zeros((3, 3))
        head[0] = path[0]
        tail[0] = path[-1]
        times = np.full(n, self.config.inittime)
        ref_rots = np.stack([_rotz(w[2]) for w in q])

        mid = mid_end.optimize(head, tail, q, times, ref_rots,
                               self.config, max_iters=mid_iters)

        if len(obstacles) == 0:
            # nothing to avoid: the mid-end trajectory is final
            return PlanResult(True, mid.traj, mid.traj, path, obstacles,
                              float(mid.cost), float(mid.cost))

        back = back_end.optimize(self.shape, head, tail, obstacles,
                                 mid.opt_x, self.config, self.svs_cfg,
                                 max_iters=back_iters)
        return PlanResult(True, back.traj, mid.traj, path, obstacles,
                          float(mid.cost), float(back.cost))


def _rotz(yaw: float) -> np.ndarray:
    c, s = math.cos(yaw), math.sin(yaw)
    return np.asarray([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
