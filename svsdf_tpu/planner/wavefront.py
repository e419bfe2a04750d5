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


def distance_field_3d(feas, trans_feas, goal_ij,
                      yaw_weight: float = 0.25,
                      max_iters: int | None = None,
                      cell_cost=None):
    """Exact cost-to-go over the (yaw_bin, x, y) STATE space, with
    edges gated by the sub-swept-volume transition stencils — the
    device analogue of the reference A*'s checkSubSWCollision veto
    (front_end_Astar.hpp:218-227) promoted into the search graph
    itself.

    The 2-D wavefront treats a cell as traversable if ANY yaw fits
    (free = feas.any(0)) and assigns yaw afterwards — on big-shape
    maps that emits paths whose per-cell feasible yaw sets don't
    connect (adjacent cells force 120 deg+ bin jumps), seeding the
    optimizer with a spinning, wall-grinding warm start it can never
    unwind. Here a state is (bin k, cell ij); an edge moves one cell
    in one of 8 directions while rotating delta bins, allowed iff the
    interpolated sub-sweep is collision-free
    (trans_feas[k, delta_idx, dir_idx, x', y'], ops/kernels.py), with
    cost step_len + yaw_weight * |delta|. Rotation cost makes the
    field prefer corridors the shape can thread without spinning.

    feas: (K, X, Y) bool; trans_feas: (K, D, 8, X, Y) bool with the D
    axis ordered like YAW_BFS_DELTAS (ops/kernels.py) — pass as many
    delta slices as the rotation rate should allow (D=3 -> 0, -1, +1
    bins per cell move). goal_ij: (2,) int; any feasible goal yaw is
    accepted (the reference snaps goal yaw too, plan_manager.cpp).
    cell_cost: optional (X, Y) float32 added on ENTERING a cell — the
    clearance shaping term (e.g. w * relu(d_safe - esdf)): a pure
    geodesic hugs walls, leaving the optimizer a warm start that must
    squeeze out of zero-clearance corners; a small wall-proximity cost
    routes the SAME corridors mid-channel. Extraction must use the
    same shaping (extract_path_3d cell_cost).

    Returns (K, X, Y) float32 cost-to-go (INF = unreachable).
    """
    from svsdf_tpu.ops.kernels import YAW_BFS_DELTAS
    K, X, Y = feas.shape
    D = trans_feas.shape[1]
    if max_iters is None:
        max_iters = X * Y + 4 * K
    d0 = jnp.full((K, X, Y), INF, jnp.float32)
    d0 = d0.at[:, goal_ij[0], goal_ij[1]].set(
        jnp.where(feas[:, goal_ij[0], goal_ij[1]], 0.0, INF))

    from svsdf_tpu.ops.kernels import DIRS8
    deltas = YAW_BFS_DELTAS[:D]
    edges = []          # (delta, delta_idx, (di, dj), dir_idx, cost)
    # IMPORTANT: the stencil's direction axis is ordered by
    # ops.kernels.DIRS8, which is a DIFFERENT enumeration from this
    # module's _DIRS — indexing trans_feas with the wrong permutation
    # admits genuinely-blocked sub-sweeps (caught as a -0.50 m
    # penetration on a "transition-checked" sdHeart path)
    for d_idx, de in enumerate(deltas):
        for m_idx, (di, dj) in enumerate(DIRS8):
            step = (2.0 ** 0.5) if (di != 0 and dj != 0) else 1.0
            c = step + yaw_weight * abs(de)
            edges.append((int(de), d_idx, (int(di), int(dj)), m_idx, c))

    def _shift3(a, de, di, dj, fill):
        # child state (k+de, i+di, j+dj) value aligned to (k, i, j):
        # K axis is circular (roll), spatial edges filled
        a = jnp.roll(a, -de, axis=0)
        a = jnp.roll(a, -di, axis=1).at[:, _edge_x(-di, X)].set(fill)
        a = jnp.roll(a, -dj, axis=2).at[:, :, _edge_y(-dj, Y)].set(fill)
        return a

    def _shift2(a, di, dj, fill):
        a = jnp.roll(a, -di, axis=1).at[:, _edge_x(-di, X)].set(fill)
        return jnp.roll(a, -dj, axis=2).at[:, :, _edge_y(-dj, Y)].set(
            fill)

    # cost-to-go accumulates the CHILD cell's entry cost, aligned to
    # the father position like the child distance below
    ccost = (None if cell_cost is None
             else jnp.asarray(cell_cost, jnp.float32))

    def relax(d):
        best = d
        for de, d_idx, (di, dj), m_idx, c in edges:
            child = _shift3(d, de, di, dj, INF)
            # trans_feas[k, d_idx, m_idx, x', y'] marks the transition
            # INTO cell (x', y') from direction m with father bin k —
            # align the child cell's flag to the father position
            allowed = _shift2(trans_feas[:, d_idx, m_idx], di, dj,
                              False)
            cand = child + c + jnp.where(allowed, 0.0, INF)
            if ccost is not None:
                cand = cand + _shift2(ccost[None], di, dj, 0.0)[0]
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


def extract_path_3d(dist3, trans_feas, start_ij, max_len: int = 512,
                    yaw_weight: float = 0.25, cell_cost=None):
    """Greedy steepest-descent through the 3-D field: returns
    (path (max_len, 2), bins (max_len,), length, success). The start
    bin is the cheapest feasible bin at the start cell (the reference
    snaps the start yaw to a kernel bin as well)."""
    from svsdf_tpu.ops.kernels import DIRS8, YAW_BFS_DELTAS
    K, X, Y = dist3.shape
    D = trans_feas.shape[1]
    deltas = jnp.asarray(YAW_BFS_DELTAS[:D], jnp.int32)      # (D,)
    # direction axis MUST follow ops.kernels.DIRS8 (the stencil's
    # enumeration), not this module's _DIRS — see distance_field_3d
    dirs = jnp.asarray(np.asarray(DIRS8, np.int32))          # (8, 2)
    step_costs = jnp.asarray([np.sqrt(2.0) if (di and dj) else 1.0
                              for di, dj in DIRS8], jnp.float32)
    costs = (step_costs[None, :]
             + yaw_weight * jnp.abs(deltas.astype(jnp.float32))[:, None]
             )                                               # (D, 8)

    b0 = jnp.argmin(dist3[:, start_ij[0], start_ij[1]]).astype(
        jnp.int32)

    def step(carry, _):
        b, ij, done = carry
        here = dist3[b, ij[0], ij[1]]
        nbr = ij[None, :] + dirs                             # (8, 2)
        ok = ((nbr[:, 0] >= 0) & (nbr[:, 0] < X) &
              (nbr[:, 1] >= 0) & (nbr[:, 1] < Y))            # (8,)
        nclip = jnp.clip(nbr, 0, jnp.asarray([X - 1, Y - 1]))
        nb = (b + deltas[:, None]) % K                       # (D, 8)
        child = dist3[nb, nclip[None, :, 0], nclip[None, :, 1]]
        # allowed[d, m] = trans_feas[b, d, m, nclip[m]] — dir index m
        # must pair with neighbor m
        allowed = trans_feas[b][:, jnp.arange(8), nclip[:, 0],
                               nclip[:, 1]]                  # (D, 8)
        nd = child + costs + jnp.where(allowed & ok[None], 0.0, INF)
        if cell_cost is not None:
            nd = nd + cell_cost[nclip[:, 0], nclip[:, 1]][None]
        j = jnp.argmin(nd)
        dj, mj = jnp.unravel_index(j, nd.shape)
        improves = (nd[dj, mj] < here + 1e-3 + 1e-5 * here) \
            & (nd[dj, mj] < 0.5 * INF)
        at_goal = here <= 0.0
        move = (~done) & (~at_goal) & improves
        ij_n = jnp.where(move, nbr[mj], ij)
        b_n = jnp.where(move, nb[dj, mj], b)
        done_n = done | at_goal | (~improves)
        return (b_n, ij_n, done_n), (ij_n, b_n)

    (bf, final_ij, _), (path, bins) = jax.lax.scan(
        step, (b0, start_ij, jnp.asarray(False)), None,
        length=max_len - 1)
    path = jnp.concatenate([start_ij[None], path], axis=0)
    bins = jnp.concatenate([b0[None], bins], axis=0)
    success = dist3[bf, final_ij[0], final_ij[1]] <= 0.0
    moved = jnp.any(path[1:] != path[:-1], axis=1)
    length = 1 + jnp.sum(moved.astype(jnp.int32))
    return path, bins, length, success


def assign_yaws_dp(feas, path):
    """Globally smoothest yaw assignment along the path: a Viterbi DP
    over (cell, bin) minimizing total circular bin rotation subject to
    per-cell feasibility.

    The greedy nearest-bin scan (assign_yaws) is myopic: entering a
    region whose feasible set has rotated away from the carried bin
    forces a large jump there, and later cells inherit the bad branch —
    measured on the sdPie map it emits bin sequences jumping 6+ bins
    (120 deg+) between adjacent cells, seeding the back end with a
    wildly spinning initial trajectory whose swept volume grinds
    through walls (a colliding equilibrium penalty escalation cannot
    unwind — the rotation is topologically trapped). The DP plans the
    rotation globally: total |delta bin| is minimized end to end, so
    the robot pre-rotates gradually where the corridor demands it.

    feas: (K, X, Y) bool; path: (L, 2) int cells (padding repeats the
    last cell — identity transitions, zero added cost). Returns (L,)
    int32 bins. O(L*K^2) tiny matrix work, scan over L.
    """
    K = feas.shape[0]
    fpath = feas[:, path[:, 0], path[:, 1]].T        # (L, K)
    bins = jnp.arange(K)
    delta = jnp.minimum((bins[:, None] - bins[None, :]) % K,
                        (bins[None, :] - bins[:, None]) % K
                        ).astype(jnp.float32)        # (K_prev, K)
    big = jnp.float32(1e6)
    cost0 = jnp.where(fpath[0], 0.0, big)

    def fwd(c_prev, f):
        cand = c_prev[:, None] + delta               # (K_prev, K)
        best_prev = jnp.argmin(cand, axis=0)         # (K,)
        c = jnp.min(cand, axis=0)
        c = jnp.where(f, c, big)
        # infeasible cell (shouldn't happen on free = feas.any(0)
        # paths): carry costs through, backtrack stays in place
        any_f = jnp.any(f)
        c = jnp.where(any_f, c, c_prev)
        best_prev = jnp.where(any_f, best_prev, bins)
        return c, best_prev.astype(jnp.int32)

    c_final, back = jax.lax.scan(fwd, cost0, fpath[1:])  # (L-1, K)

    def bwd(b, bp):
        # b = chosen bin at cell i+1; bp = back-pointers for the
        # i -> i+1 transition; emit the bin at cell i
        nb = bp[b]
        return nb, nb

    b_last = jnp.argmin(c_final).astype(jnp.int32)
    _, rev = jax.lax.scan(bwd, b_last, back, reverse=True)
    return jnp.concatenate([rev, b_last[None]]).astype(jnp.int32)


def plan(free, feas, start_ij, goal_ij, max_len: int = 512,
         start_bin: int = 0) -> WavefrontResult:
    """Full device front end for one scenario; `jax.vmap(plan,
    in_axes=(0, 0, 0, 0))` batches it. free: (X, Y) bool (typically
    feas.any(0) — any feasible yaw); feas: (K, X, Y) yaw feasibility."""
    dist = distance_field(free, goal_ij)
    path, length, success = extract_path(dist, start_ij, max_len)
    del start_bin  # the DP optimizes the whole profile globally
    yaws = assign_yaws_dp(feas, path)
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
