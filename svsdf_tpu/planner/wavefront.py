"""Batched on-device wavefront front end.

The host A* (planner/astar.py) plans one scenario at a time; this is
the TPU-shaped alternative from SURVEY.md §7 ("batched device wavefront
planner as stretch"): a min-plus relaxation (Bellman–Ford over the
8-connected grid) computes the exact geodesic cost-to-go field for the
WHOLE grid, then a fixed-length greedy descent extracts the path.
Everything is `lax`-structured and `vmap`s over scenario batches —
hundreds of front ends advance together on one chip, feeding the
batched mid/back ends without host round-trips.

Semantics vs the reference front end (front_end_Astar.hpp:192-366):
same 8-connectivity and unit/diagonal move costs, same "outside map =
occupied" convention; yaw is assigned per path cell from the yaw-bin
feasibility maps by nearest-feasible-bin search around the previous
bin (checkKernelValue's BFS over bins, sw_manager.hpp:1102-1169),
vectorized. The A* remains the oracle in tests: on any grid where both
succeed, path costs agree (the distance field is exact, not heuristic).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

INF = 1e9
#: 8-neighborhood (dx, dy) and step costs
_DIRS = np.asarray([(1, 0), (-1, 0), (0, 1), (0, -1),
                    (1, 1), (1, -1), (-1, 1), (-1, -1)], np.int32)
_COSTS = np.asarray([1.0, 1.0, 1.0, 1.0] + [np.sqrt(2.0)] * 4,
                    np.float32)


class WavefrontResult(NamedTuple):
    success: jnp.ndarray      # () bool
    path_ij: jnp.ndarray      # (L, 2) int32 cells, padded with last
    yaw_bins: jnp.ndarray     # (L,) int32
    length: jnp.ndarray       # () int32 valid entries
    dist: jnp.ndarray         # (X, Y) cost-to-go field


def _shift(a, dx, dy, fill):
    """Shift a 2-D array by (dx, dy), filling vacated cells."""
    return jnp.roll(
        jnp.roll(a, dx, axis=0).at[_edge_x(dx, a.shape[0])].set(fill),
        dy, axis=1).at[:, _edge_y(dy, a.shape[1])].set(fill)


def _edge_x(dx, n):
    if dx > 0:
        return slice(None, dx)
    if dx < 0:
        return slice(n + dx, None)
    return slice(0, 0)


def _edge_y(dy, n):
    if dy > 0:
        return slice(None, dy)
    if dy < 0:
        return slice(n + dy, None)
    return slice(0, 0)


def distance_field(free, goal_ij, max_iters: int | None = None):
    """Exact 8-connected geodesic cost-to-go to goal_ij over free
    cells. free: (X, Y) bool. Returns (X, Y) float32 (INF = blocked /
    unreachable). Runs Bellman–Ford sweeps until the field stops
    changing (while_loop; under vmap lanes converge independently).
    max_iters is only a safety cap: it defaults to X*Y, the true
    worst-case geodesic length in cells (a serpentine corridor is
    ~X*Y/2 cells — a smaller default would silently truncate the
    relaxation and report reachable goals as unreachable). Callers
    with known-benign maps may pass a tighter cap; convergence stops
    the loop far earlier in practice."""
    X, Y = free.shape
    if max_iters is None:
        max_iters = X * Y
    d0 = jnp.full((X, Y), INF, jnp.float32)
    d0 = d0.at[goal_ij[0], goal_ij[1]].set(0.0)
    freef = jnp.where(free, 0.0, INF).astype(jnp.float32)

    def relax(d):
        best = d
        for (dx, dy), c in zip(_DIRS, _COSTS):
            # candidate: neighbor's dist + step cost, blocked cells INF
            cand = _shift(d, int(dx), int(dy), INF) + c + freef
            best = jnp.minimum(best, cand)
        return best

    def body(carry):
        d, _, it = carry
        d2 = relax(d)
        changed = jnp.any(d2 < d - 1e-6)
        return d2, changed, it + 1

    def cond(carry):
        _, changed, it = carry
        return changed & (it < max_iters)

    d, _, _ = jax.lax.while_loop(cond, body, (relax(d0),
                                              jnp.asarray(True),
                                              jnp.asarray(1)))
    return d


def extract_path(dist, start_ij, max_len: int = 512):
    """Greedy steepest-descent path from start to the dist==0 cell.
    Returns (path (max_len, 2), length, success). The path repeats its
    final cell once the goal is reached (static shape)."""
    X, Y = dist.shape
    dirs = jnp.asarray(_DIRS)
    costs = jnp.asarray(_COSTS)

    def step(carry, _):
        ij, done = carry
        here = dist[ij[0], ij[1]]
        nbr = ij[None, :] + dirs                       # (8, 2)
        ok = ((nbr[:, 0] >= 0) & (nbr[:, 0] < X) &
              (nbr[:, 1] >= 0) & (nbr[:, 1] < Y))
        nclip = jnp.clip(nbr, 0, jnp.asarray([X - 1, Y - 1]))
        nd = dist[nclip[:, 0], nclip[:, 1]] + costs
        nd = jnp.where(ok, nd, INF)
        j = jnp.argmin(nd)
        # tolerance: along an exact geodesic dist[n] + c == here, but
        # f32 accumulation over ~100-step fields drifts by O(1e-4) —
        # a 1e-6 tolerance stalls long paths at their first cell. The
        # minimum step cost is 1.0, so anything << 1 is safe. Gate to
        # finite fields so INF (unreachable) lanes never wander.
        improves = ((nd[j] < here + 1e-3 + 1e-5 * here)
                    & (nd[j] < 0.5 * INF))
        at_goal = here <= 0.0
        move = (~done) & (~at_goal) & improves
        ij_n = jnp.where(move, nbr[j], ij)
        done_n = done | at_goal | (~improves)
        return (ij_n, done_n), ij_n

    (final_ij, _), path = jax.lax.scan(
        step, (start_ij, jnp.asarray(False)), None, length=max_len - 1)
    path = jnp.concatenate([start_ij[None], path], axis=0)
    success = dist[final_ij[0], final_ij[1]] <= 0.0
    # valid length: first index where the path stops moving
    moved = jnp.any(path[1:] != path[:-1], axis=1)
    length = 1 + jnp.sum(moved.astype(jnp.int32))
    return path, length, success


def assign_yaws(feas, path, prev_bin0: int = 0):
    """Per-cell yaw bins along the path: nearest feasible bin to the
    previous cell's bin (circular), vectorized over bins via a masked
    argmin (the device analogue of visit_kernels_by_distance,
    sw_manager.hpp:1102-1169). feas: (K, X, Y) bool."""
    K = feas.shape[0]
    fpath = feas[:, path[:, 0], path[:, 1]].T        # (L, K)
    bins = jnp.arange(K)

    def step(prev, f):
        delta = jnp.minimum((bins - prev) % K, (prev - bins) % K)
        score = jnp.where(f, delta, K + 1)
        b = jnp.argmin(score)
        b = jnp.where(jnp.any(f), b, prev)
        return b, b

    _, out = jax.lax.scan(step, jnp.asarray(prev_bin0), fpath)
    return out


def plan(free, feas, start_ij, goal_ij, max_len: int = 512,
         start_bin: int = 0) -> WavefrontResult:
    """Full device front end for one scenario; `jax.vmap(plan,
    in_axes=(0, 0, 0, 0))` batches it. free: (X, Y) bool (typically
    feas.any(0) — any feasible yaw); feas: (K, X, Y) yaw feasibility."""
    dist = distance_field(free, goal_ij)
    path, length, success = extract_path(dist, start_ij, max_len)
    yaws = assign_yaws(feas, path, start_bin)
    return WavefrontResult(success, path, yaws, length, dist)


def path_to_world(grid, path_ij, yaw_bins, length, yaw_num: int):
    """Host helper: (L,2) cells + bins -> (length, 3) world x,y,yaw
    (getastarSE3Path's output convention, front_end_Astar.hpp:392)."""
    path_ij = np.asarray(path_ij)[:int(length)]
    yaw_bins = np.asarray(yaw_bins)[:int(length)]
    xy = np.asarray([grid.cube_center((i, j, 0))[:2]
                     for (i, j) in path_ij])
    # short-arc yaw unwrapping, identical to astar._emit_path: yaw is
    # an R^3 spline coordinate downstream, so consecutive values must
    # differ by the physical rotation, never jump the +-pi bin seam
    yaw = np.zeros(len(path_ij))
    acc = 0.0
    prev_b = int(yaw_bins[0]) if len(yaw_bins) else 0
    half = yaw_num // 2
    for i, b in enumerate(yaw_bins):
        dbin = (int(b) - prev_b + half) % yaw_num - half
        acc += dbin * (2.0 * np.pi / yaw_num)
        yaw[i] = acc
        prev_b = int(b)
    return np.concatenate([xy, yaw[:, None]], axis=1)
