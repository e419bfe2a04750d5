"""Swept-volume surface extraction for visualization/export.

Replaces sw_calculate's continuation-based sparse voxel marching +
igl::marching_cubes (`src/swept_volume/src/sw_calculate.cpp:5-222`,
`sw_calculate.hpp:107-128`) with the TPU-idiomatic equivalent: a dense
SVSDF field over a regular grid (one batched device query — the
pointer-chasing continuation algorithm is hostile to XLA, and the
dense sweep is fast enough to be interactive), then host-side marching
squares for the 2-D swept boundary, optionally extruded to a 3-D OBJ
(writeSVtoObj, sw_manager.hpp:176-185).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import jax.numpy as jnp

from svsdf_tpu.ops.svsdf import DEFAULT_CONFIG, svsdf_grid

#: marching-squares segment table: for each 4-bit cell case, pairs of
#: edges (0: bottom, 1: right, 2: top, 3: left) crossed by the contour.
_MS_TABLE = {
    0: [], 15: [],
    1: [(3, 0)], 2: [(0, 1)], 3: [(3, 1)], 4: [(1, 2)],
    5: [(3, 2), (1, 0)],     # saddle
    6: [(0, 2)], 7: [(3, 2)], 8: [(2, 3)], 9: [(2, 0)],
    10: [(0, 3), (2, 1)],    # saddle
    11: [(2, 1)], 12: [(1, 3)], 13: [(1, 0)], 14: [(0, 3)],
}


def svsdf_field(shape, traj, bounds, eps: float,
                cfg=DEFAULT_CONFIG, level_inside: bool = False):
    """Dense SVSDF field: bounds = (xmin, xmax, ymin, ymax), eps = grid
    step (the config's swept-mesh resolution, config.hpp `eps`).
    Returns (xs, ys, field) as numpy."""
    xmin, xmax, ymin, ymax = bounds
    xs = np.arange(xmin, xmax + eps, eps)
    ys = np.arange(ymin, ymax + eps, eps)
    field = svsdf_grid(shape, traj, jnp.asarray(xs), jnp.asarray(ys),
                       cfg, with_inside=level_inside)
    return xs, ys, np.asarray(field)


def marching_squares(xs, ys, field, level: float = 0.0
                     ) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Extract iso-contour segments at `level`.

    Returns a list of ((x0, y0), (x1, y1)) segments with linear
    interpolation along cell edges (the 2-D analogue of the
    igl::marching_cubes call at sw_calculate.hpp:125)."""
    from svsdf_tpu import native
    xs = np.asarray(xs)
    ys = np.asarray(ys)
    # The native kernel assumes one shared uniform step for both axes.
    uniform = (len(xs) > 1 and len(ys) > 1
               and np.allclose(np.diff(xs), xs[1] - xs[0])
               and np.allclose(np.diff(ys), ys[1] - ys[0])
               and np.isclose(ys[1] - ys[0], xs[1] - xs[0]))
    if native.available() and uniform:
        segs_arr = native.marching_squares(
            np.asarray(field) - level, float(xs[0]), float(ys[0]),
            float(xs[1] - xs[0]), 0.0)
        return [(s[0], s[1]) for s in segs_arr]
    f = field - level
    segs = []
    nx, ny = f.shape

    def interp(p0, p1, v0, v1):
        t = v0 / (v0 - v1) if v0 != v1 else 0.5
        return (p0[0] + t * (p1[0] - p0[0]), p0[1] + t * (p1[1] - p0[1]))

    for i in range(nx - 1):
        for j in range(ny - 1):
            v = [f[i, j], f[i + 1, j], f[i + 1, j + 1], f[i, j + 1]]
            case = sum(1 << k for k in range(4) if v[k] < 0.0)
            if case in (0, 15):
                continue
            corners = [(xs[i], ys[j]), (xs[i + 1], ys[j]),
                       (xs[i + 1], ys[j + 1]), (xs[i], ys[j + 1])]
            edges = {}
            edge_pairs = [(0, 1), (1, 2), (2, 3), (3, 0)]
            for e, (a, b) in enumerate(edge_pairs):
                if (v[a] < 0.0) != (v[b] < 0.0):
                    edges[e] = interp(corners[a], corners[b], v[a], v[b])
            for e0, e1 in _MS_TABLE[case]:
                if e0 in edges and e1 in edges:
                    segs.append((np.asarray(edges[e0]),
                                 np.asarray(edges[e1])))
    return segs


def extract_swept_boundary(shape, traj, bounds, eps: float,
                           cfg=DEFAULT_CONFIG):
    """Dense field + marching squares in one call (the calculateSwept
    pipeline, sw_manager.hpp:321-337)."""
    xs, ys, field = svsdf_field(shape, traj, bounds, eps, cfg)
    return marching_squares(xs, ys, field, level=0.0)


def write_swept_obj(segments, path: str, z0: float = 0.0,
                    z1: float = 1.0):
    """Extrude 2-D boundary segments into 3-D side quads and write an
    OBJ (writeSVtoObj equivalent, sw_manager.hpp:176-185)."""
    verts = []
    faces = []
    for (a, b) in segments:
        base = len(verts)
        verts.extend([(a[0], a[1], z0), (b[0], b[1], z0),
                      (b[0], b[1], z1), (a[0], a[1], z1)])
        faces.append((base + 1, base + 2, base + 3))
        faces.append((base + 1, base + 3, base + 4))
    with open(path, "w") as fh:
        for v in verts:
            fh.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for f in faces:
            fh.write(f"f {f[0]} {f[1]} {f[2]}\n")
    return len(verts), len(faces)
