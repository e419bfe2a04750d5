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


# ---------------------------------------------------------------------------
# True 3-D swept-volume surface (mesh robots): dense volumetric swept
# field + marching tetrahedra. The reference extracts this surface with
# continuation voxel marching + igl::marching_cubes
# (sw_calculate.cpp:5-222, sw_calculate.hpp:107-128); here the field is
# one batched device sweep and the mesher is table-free marching
# tetrahedra (a consistent Freudenthal 6-tet split of every cube keeps
# the mesh watertight across cube faces).

#: Freudenthal decomposition: 6 tetrahedra per cube, all sharing the
#: main diagonal v0-v7 (corner k has offset bits (k>>2, k>>1&1, k&1)).
_TETS = np.asarray([
    (0, 4, 6, 7), (0, 4, 5, 7), (0, 2, 6, 7),
    (0, 2, 3, 7), (0, 1, 5, 7), (0, 1, 3, 7)], np.int64)

#: mask (4-bit inside pattern) -> triangles as local-vertex edge pairs.
#: Orientation is fixed post-hoc toward the positive (outside) field.
_TET_TRIS: dict = {}
for _m in range(1, 15):
    _ins = [i for i in range(4) if _m >> i & 1]
    _out = [i for i in range(4) if not _m >> i & 1]
    if len(_ins) == 1:
        a = _ins[0]
        _TET_TRIS[_m] = [((a, _out[0]), (a, _out[1]), (a, _out[2]))]
    elif len(_ins) == 3:
        o = _out[0]
        _TET_TRIS[_m] = [((o, _ins[0]), (o, _ins[1]), (o, _ins[2]))]
    else:
        a, b = _ins
        c, d = _out
        _TET_TRIS[_m] = [((a, c), (a, d), (b, d)),
                         ((a, c), (b, d), (b, c))]


def swept_field_3d(sdf_xyz, traj, bounds, eps: float, n_t: int = 128):
    """Volumetric swept SDF field: min over n_t trajectory times of the
    robot's 3-D SDF. bounds = (xmin, xmax, ymin, ymax, zmin, zmax);
    sdf_xyz(px, py, pz) is the body-frame SDF (models/mesh_sdf.py
    GridSDF3D.sdf_xyz). The SE(2) pose leaves z unchanged. Runs as a
    lax.scan with a running min so the (M, K) matrix never
    materializes. Returns (xs, ys, zs, field) as numpy."""
    import jax
    from svsdf_tpu.utils import trajectory as trj

    xmin, xmax, ymin, ymax, zmin, zmax = bounds
    xs = np.arange(xmin, xmax + eps, eps)
    ys = np.arange(ymin, ymax + eps, eps)
    zs = np.arange(zmin, zmax + eps, eps)
    gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
    px = jnp.asarray(gx.ravel(), jnp.float32)
    py = jnp.asarray(gy.ravel(), jnp.float32)
    pz = jnp.asarray(gz.ravel(), jnp.float32)

    ts = jnp.linspace(0.0, traj.total_duration, n_t)
    xy, yaw, _ = trj.state_se2(traj, ts)
    c, s = jnp.cos(yaw), jnp.sin(yaw)

    @jax.jit
    def sweep(px, py, pz, xy, c, s):
        def step(best, pose):
            cx, cy, ck, sk = pose
            dx, dy = px - cx, py - cy
            prx = ck * dx + sk * dy
            pry = -sk * dx + ck * dy
            sd = sdf_xyz(prx, pry, pz).astype(best.dtype)
            return jnp.minimum(best, sd), None
        init = jnp.full(px.shape, jnp.inf, px.dtype)
        poses = jnp.stack([xy[:, 0], xy[:, 1], c, s], axis=-1)
        best, _ = jax.lax.scan(step, init, poses)
        return best

    field = np.asarray(sweep(px, py, pz, xy, c, s)).reshape(
        len(xs), len(ys), len(zs))
    return xs, ys, zs, field


def marching_tetrahedra(xs, ys, zs, field, level: float = 0.0):
    """Extract the iso-surface at `level` as a watertight triangle mesh.

    Returns (V (n,3) float, F (m,3) int) with outward orientation
    (normals toward field > level). Vertices on shared tet edges are
    deduplicated by global grid-edge identity, so the surface is
    closed wherever the level set doesn't cross the grid boundary."""
    nx, ny, nz = field.shape
    f = np.asarray(field, float).ravel()
    pts = np.stack(np.meshgrid(xs, ys, zs, indexing="ij"),
                   axis=-1).reshape(-1, 3)

    # global flat ids of every cube's 8 corners: (C, 8)
    ci, cj, ck = np.meshgrid(np.arange(nx - 1), np.arange(ny - 1),
                             np.arange(nz - 1), indexing="ij")
    base = (ci * ny + cj) * nz + ck
    off = np.asarray([( (k >> 2) * ny + ((k >> 1) & 1) ) * nz + (k & 1)
                      for k in range(8)])
    corners = base.ravel()[:, None] + off[None]          # (C, 8)
    tets = corners[:, _TETS.reshape(-1)].reshape(-1, 4)  # (6C, 4)

    fv = f[tets]                                          # (T, 4)
    inside = fv < level
    mask = (inside * (1 << np.arange(4))[None]).sum(axis=1)

    tri_edges = []     # (K, 3, 2) global vertex-id pairs per triangle
    tri_tet = []       # generating tet row ids (for orientation)
    for m, rows in _TET_TRIS.items():
        sel = np.nonzero(mask == m)[0]
        if not len(sel):
            continue
        t = tets[sel]
        for tri in rows:
            e = np.stack([np.stack([t[:, a], t[:, b]], axis=-1)
                          for (a, b) in tri], axis=1)    # (S, 3, 2)
            tri_edges.append(e)
            tri_tet.append(sel)
    if not tri_edges:
        return np.zeros((0, 3)), np.zeros((0, 3), np.int64)
    tri_edges = np.concatenate(tri_edges)                 # (K, 3, 2)
    tri_tet = np.concatenate(tri_tet)

    # dedup crossing points by undirected global edge identity
    e_flat = np.sort(tri_edges.reshape(-1, 2), axis=1)
    uniq, inv = np.unique(e_flat, axis=0, return_inverse=True)
    u, v = uniq[:, 0], uniq[:, 1]
    t_lin = (level - f[u]) / np.where(np.abs(f[v] - f[u]) > 1e-300,
                                      f[v] - f[u], 1.0)
    t_lin = np.clip(t_lin, 0.0, 1.0)
    V = pts[u] + t_lin[:, None] * (pts[v] - pts[u])
    F = inv.reshape(-1, 3)

    # orient outward: normal toward the generating tet's outside side
    tv = tets[tri_tet]                                    # (K, 4)
    ins = f[tv] < level
    w_in = ins / np.maximum(ins.sum(axis=1, keepdims=True), 1)
    w_out = (~ins) / np.maximum((~ins).sum(axis=1, keepdims=True), 1)
    cen_in = np.einsum("kc,kcd->kd", w_in, pts[tv])
    cen_out = np.einsum("kc,kcd->kd", w_out, pts[tv])
    n = np.cross(V[F[:, 1]] - V[F[:, 0]], V[F[:, 2]] - V[F[:, 0]])
    flip = np.einsum("kd,kd->k", n, cen_out - cen_in) < 0.0
    F[flip] = F[flip][:, [0, 2, 1]]
    return V, F


def extract_swept_volume_3d(sdf_xyz, traj, bounds, eps: float,
                            n_t: int = 128):
    """Full 3-D pipeline (the calculateSwept equivalent for mesh
    robots): volumetric swept field -> marching tetrahedra."""
    xs, ys, zs, field = swept_field_3d(sdf_xyz, traj, bounds, eps, n_t)
    return marching_tetrahedra(xs, ys, zs, field)


def write_trimesh_obj(V, F, path: str):
    """Write a triangle mesh to OBJ (writeSVtoObj, sw_manager:176-185)."""
    with open(path, "w") as fh:
        for v in V:
            fh.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for f in np.asarray(F) + 1:
            fh.write(f"f {f[0]} {f[1]} {f[2]}\n")
    return len(V), len(F)
