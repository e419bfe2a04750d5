"""Yaw-binned shape kernels + map feasibility convolutions (device).

TPU-native re-design of the front end's collision machinery:

  reference (CPU, per-A*-expansion byte tricks)
    Shape.hpp:386-430   initShape: per-yaw boolean stencils of the
                        rotated shape (SDF <= safemargin), bit-packed
    sw_manager.hpp:1033 kernelConv: byte-AND of the stencil against an
                        inflated bit-packed map, per expansion
    sw_manager.hpp:1171 checkSubSWCollision: 50-step linear sweep of
                        the shape between parent/child poses vs points
                        in a +-2 m box

  here (TPU, one-shot dense precompute)
    rasterize_shape_kernels: all yaw stencils in one vmapped SDF eval
    feasibility_maps: ONE `lax.conv` of the z=0 occupancy slice with
      all yaw stencils -> feasible[yaw_bin, x, y] for the whole map.
      The MXU does in one conv what the reference does per-expansion.
    transition_stencils / transition_feasibility: the sub-swept-volume
      transition check becomes per-(father-bin, delta-bin, direction)
      swept stencils (min-over-interpolation SDF rasterized on the
      +-2 m guard box) convolved with the map once.

The host A* (planner/astar.py) then does O(1) array lookups per
expansion — no SDF evaluation in the search loop at all.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from svsdf_tpu.models.shapes import Shape2D

PI = math.pi

#: 8-connected neighbor directions in (di, dj) A* order (i=-1..1, j=-1..1)
DIRS8 = [(i, j) for i in (-1, 0, 1) for j in (-1, 0, 1) if (i, j) != (0, 0)]

#: yaw-bin BFS visit offsets, mirroring visit_kernels_by_distance
#: (sw_manager.hpp:1102-1156): start bin, then +-1, +-2, ... depth 5.
YAW_BFS_DELTAS = [0, -1, 1, -2, 2, -3, 3, -4, 4, -5, 5]


def bin_yaw(yaw_num: int, ind) -> float:
    """Bin index -> yaw value (sw_manager.hpp:1166: 2*pi*i/K - pi)."""
    return 2.0 * PI * ind / yaw_num - PI


def yaw_bin(yaw_num: int, yaw: float) -> int:
    """Yaw -> bin index (sw_manager.hpp:1160)."""
    return int(yaw_num * ((yaw + PI) / (2.0 * PI))) % yaw_num


def rasterize_shape_kernels(shape: Shape2D, kernel_size: int,
                            yaw_num: int, resolution: float,
                            safemargin: float,
                            yaw_substeps: int = 1) -> jnp.ndarray:
    """(yaw_num, ks, ks) bool stencils: cell (a, b) at world offset
    res*(a-side, b-side) is inside the rotated shape within safemargin
    (initShape, Shape.hpp:386-430; safemargin = max(front_end_safeh,
    res/2), Shape.hpp:399).

    yaw_substeps > 1 makes each bin's stencil CONSERVATIVE: the union
    of the footprint over yaws sub-sampled across the bin's full
    range, so a kernel-feasible pose is feasible for EVERY yaw the bin
    represents, not just its center. The reference rasterizes only the
    bin center, which admits poses that collide a few degrees off-bin
    (observable on sdCutDisk: an A*-feasible corridor whose continuous
    trajectory cannot avoid ~0.7 m penetration)."""
    side = (kernel_size - 1) // 2
    offs = (jnp.arange(kernel_size) - side) * resolution
    ox, oy = jnp.meshgrid(offs, offs, indexing="ij")
    pts = jnp.stack([ox, oy], axis=-1)                   # (ks, ks, 2)
    yaws = bin_yaw(yaw_num, jnp.arange(yaw_num))
    half_bin = PI / yaw_num
    # force an odd sample count so the bin-CENTER yaw (the one the
    # planner actually assigns) is always in the union — an even
    # linspace(-h, h, k) excludes 0 and could be LESS safe than the
    # plain stencil
    k = max(int(yaw_substeps), 1)
    if k > 1 and k % 2 == 0:
        k += 1
    deltas = (jnp.linspace(-half_bin, half_bin, k) if k > 1
              else jnp.zeros((1,)))

    def one(yaw):
        def at(dy):
            # body frame via p_rel = R(yaw)^T p — the SAME convention
            # as the transition stencils, the SVSDF query and the
            # certifier (posEva2Rel, sw_manager.hpp:521), so a shape
            # whose poly_params carry a translation keeps its offset
            # rotating WITH the robot everywhere. (The reference's
            # kernel path holds the offset world-fixed instead,
            # Shape.hpp:481-484 — inconsistent with its own
            # trajectory-time queries; with sdCutDisk's
            # poly_params=[0,-3,0] the two placements differ by up
            # to 6 m across yaw bins.)
            yy = yaw + dy
            c, s = jnp.cos(yy), jnp.sin(yy)
            prx = c * pts[..., 0] + s * pts[..., 1]
            pry = -s * pts[..., 0] + c * pts[..., 1]
            return shape.sdf_xy(prx, pry) <= safemargin
        return jnp.any(jax.vmap(at)(deltas), axis=0)

    return jax.vmap(one)(yaws)


def _conv_occ(occ2d, filters):
    """Correlate (X, Y) occupancy with (O, ks, ks) filters, SAME zero
    padding (out-of-map is free, matching the zero-margin inflated
    bitmap of generateMapKernel2D, PCSmap_manager.h:81-107).
    Returns (O, X, Y) overlap counts."""
    ks = filters.shape[-1]
    side = (ks - 1) // 2
    x = occ2d.astype(jnp.float32)[None, None]            # (1,1,X,Y)
    f = filters.astype(jnp.float32)[:, None]             # (O,1,ks,ks)
    # occupancy-count exactness: the TPU MXU's default precision
    # rounds operands to bf16, whose integers are exact only to 256 —
    # kernel footprints reach kernel_size^2 > 256 cells, and a +-1
    # count error flips feasibility
    out = jax.lax.conv_general_dilated(
        x, f, window_strides=(1, 1),
        padding=[(side, side), (side, side)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST)
    return out[0]


def feasibility_maps(occ2d, kernels) -> jnp.ndarray:
    """(yaw_num, X, Y) bool: placing the shape at cell (x, y) with yaw
    bin k causes no overlap with occupied cells (kernelConv semantics,
    sw_manager.hpp:1069-1098)."""
    return _conv_occ(jnp.asarray(occ2d), jnp.asarray(kernels)) < 0.5


def transition_stencils(shape: Shape2D, yaw_num: int, resolution: float,
                        guard_half_world: float,
                        n_t: int = 51,
                        n_deltas: int | None = None) -> jnp.ndarray:
    """Swept stencils for the sub-swept-volume transition check.

    Returns (yaw_num, n_delta, 8, s, s) bool where entry
    [f, d, m, a, b] means: moving from father pose (cell - dir_m,
    yaw bin f) to child pose (cell, yaw bin f+delta_d), the linearly
    interpolated shape covers the voxel center at offset (a, b) from
    the child cell at some t (checkSubSWCollision, sw_manager.hpp:
    1171-1213; 0.02 t-steps => 51 samples).

    The reference only guards a +-2 m box around the child cell (the
    A* searcher's kernel_size/2+1 = 2, front_end_Astar.hpp:68,222),
    which lets large yaw swings sweep the shape through obstacles
    OUTSIDE the box and poisons the optimizer's warm start with an
    infeasible corridor. Pass guard_half_world >= shape radius +
    cell diagonal to make the transition veto exact on the grid —
    the stencils are a one-shot device precompute either way.

    n_deltas limits the emitted delta slices to the first n of
    YAW_BFS_DELTAS (0, -1, +1, -2, ...) — the 3-D wavefront
    (planner/wavefront.py distance_field_3d) only walks small
    per-cell rotations, and on big grids the full 11-delta tensor is
    the dominant memory term.
    """
    half_cells = int(math.floor(guard_half_world / resolution))
    s = 2 * half_cells + 1
    offs = (jnp.arange(s) - half_cells) * resolution
    ox, oy = jnp.meshgrid(offs, offs, indexing="ij")
    pts = jnp.stack([ox, oy], axis=-1)                   # (s, s, 2)

    t = jnp.linspace(0.0, 1.0, n_t)                      # (T,)
    deltas = jnp.asarray(YAW_BFS_DELTAS[:n_deltas]
                         if n_deltas else YAW_BFS_DELTAS)
    fbins = jnp.arange(yaw_num)
    dirs = jnp.asarray(DIRS8, dtype=pts.dtype) * resolution  # (8, 2)

    def one(fbin, delta, dvec):
        father_yaw = bin_yaw(yaw_num, fbin)
        # short-arc yaw interpolation: the physical rotation between the
        # bins is delta * 2pi/K. (The reference lerps RAW yaw values,
        # sw_manager.hpp:1193 — across the +-pi seam that sweeps a
        # near-full spin and spuriously blocks/admits transitions; the
        # planner treats yaw as an R^3 spline coordinate, so the A*
        # path yaws are unwrapped to match, planner/astar.py.)
        child_yaw = father_yaw + delta * (2.0 * PI / yaw_num)
        yaw_t = (1.0 - t) * father_yaw + t * child_yaw
        # shape center at time t, relative to the child cell
        cx = -(1.0 - t)[:, None] * dvec                  # (T, 2)
        d = pts[None] - cx[:, None, None]                # (T, s, s, 2)
        c, sn = jnp.cos(yaw_t), jnp.sin(yaw_t)
        # p_rel = R(yaw)^T d (posEva2Rel, sw_manager.hpp:521)
        prx = c[:, None, None] * d[..., 0] + sn[:, None, None] * d[..., 1]
        pry = -sn[:, None, None] * d[..., 0] + c[:, None, None] * d[..., 1]
        sd = shape.sdf_xy(prx, pry)                      # (T, s, s)
        return jnp.any(sd < 0.0, axis=0)

    # outer yaw-bin axis runs SEQUENTIALLY (lax.map): the fully-vmapped
    # version materializes (K, D, 8, T, s, s) SDF intermediates — at
    # fine yaw resolutions (K>=36) that transiently exceeds v5e HBM.
    # This is a one-shot precompute; peak memory beats latency here.
    f_inner = lambda fb: jax.vmap(lambda de: jax.vmap(
        lambda dv: one(fb, de, dv))(dirs))(deltas)
    return jax.lax.map(f_inner, fbins)                   # (K, D, 8, s, s)


def transition_feasibility(occ2d, stencils) -> jnp.ndarray:
    """(yaw_num, n_delta, 8, X, Y) bool: transition INTO cell (x, y)
    from direction dir with yaw change delta is collision-free."""
    k, d, m, s, _ = stencils.shape
    flat = stencils.reshape(k * d * m, s, s)
    out = _conv_occ(jnp.asarray(occ2d), flat) < 0.5
    return out.reshape(k, d, m, *occ2d.shape)
