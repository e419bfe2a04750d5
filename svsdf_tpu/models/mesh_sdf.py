"""Mesh-based robot shapes: .obj -> precomputed SDF grid -> device interp.

Replaces the reference's libigl mesh-SDF path (BasicShape:
igl::AABB point-mesh distance + fast winding number sign,
`Shape.hpp:311-340`) with a one-time host precompute — exact
point-triangle distances and generalized winding numbers in vectorized
numpy — producing a planar SDF grid of the mesh's z=0 cross-section
slab, which the device then samples with bilinear interpolation
(mirroring the grid-SDF interpolation of GridMap3D.h:55-128). The
planner's robots are 2.5D (SE(2) pose), so the z=0 slice is the live
surface; the reference queries its 3-D mesh SDF at z=0 points the same
way (sw_manager.hpp:760-775).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from svsdf_tpu.models.shapes import Shape2D


def load_obj(path: str):
    """Minimal OBJ reader: returns (V (n,3) float64, F (m,3) int)."""
    verts, faces = [], []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                verts.append([float(parts[1]), float(parts[2]),
                              float(parts[3])])
            elif line.startswith("f "):
                idx = [int(p.split("/")[0]) - 1 for p in line.split()[1:]]
                for k in range(1, len(idx) - 1):   # fan-triangulate
                    faces.append([idx[0], idx[k], idx[k + 1]])
    return np.asarray(verts, float), np.asarray(faces, int)


def _point_tri_dist_sq(p, v0, v1, v2):
    """Squared distance from points p (P,3) to triangles (T,3) —
    vectorized Ericson point-triangle distance. Returns (P, T)."""
    ab = v1 - v0
    ac = v2 - v0
    ap = p[:, None, :] - v0[None]
    d1 = np.einsum("tk,ptk->pt", ab, ap)
    d2 = np.einsum("tk,ptk->pt", ac, ap)
    bp = p[:, None, :] - v1[None]
    d3 = np.einsum("tk,ptk->pt", ab, bp)
    d4 = np.einsum("tk,ptk->pt", ac, bp)
    cp = p[:, None, :] - v2[None]
    d5 = np.einsum("tk,ptk->pt", ab, cp)
    d6 = np.einsum("tk,ptk->pt", ac, cp)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2
    denom = np.maximum(va + vb + vc, 1e-30)
    v = np.clip(vb / denom, 0.0, 1.0)
    w = np.clip(vc / denom, 0.0, 1.0)
    # interior projection
    closest = (v0[None] + v[..., None] * ab[None]
               + w[..., None] * ac[None])

    # region tests (vertex/edge closest points)
    # vertex A
    closest = np.where(((d1 <= 0) & (d2 <= 0))[..., None], v0[None],
                       closest)
    # vertex B
    closest = np.where(((d3 >= 0) & (d4 <= d3))[..., None], v1[None],
                       closest)
    # vertex C
    closest = np.where(((d6 >= 0) & (d5 <= d6))[..., None], v2[None],
                       closest)
    # edge AB
    vab = np.where(np.abs(d1 - d3) > 1e-30, d1 / np.maximum(d1 - d3,
                                                            1e-30), 0.0)
    on_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    closest = np.where(on_ab[..., None],
                       v0[None] + np.clip(vab, 0, 1)[..., None] * ab[None],
                       closest)
    # edge AC
    vac = np.where(np.abs(d2 - d6) > 1e-30, d2 / np.maximum(d2 - d6,
                                                            1e-30), 0.0)
    on_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    closest = np.where(on_ac[..., None],
                       v0[None] + np.clip(vac, 0, 1)[..., None] * ac[None],
                       closest)
    # edge BC
    num = d4 - d3
    den = (d4 - d3) + (d5 - d6)
    vbc = np.where(np.abs(den) > 1e-30, num / np.maximum(den, 1e-30), 0.0)
    on_bc = (va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0)
    closest = np.where(on_bc[..., None],
                       v1[None] + np.clip(vbc, 0, 1)[..., None]
                       * (v2 - v1)[None], closest)

    diff = p[:, None, :] - closest
    return np.einsum("ptk,ptk->pt", diff, diff)


def _winding_number(p, V, F):
    """Generalized winding number of points p (P,3) w.r.t. mesh (V, F)
    via the exact per-triangle solid angle (the quantity
    igl::fast_winding_number approximates, Shape.hpp:332-340)."""
    a = V[F[:, 0]][None] - p[:, None, :]
    b = V[F[:, 1]][None] - p[:, None, :]
    c = V[F[:, 2]][None] - p[:, None, :]
    la = np.linalg.norm(a, axis=-1)
    lb = np.linalg.norm(b, axis=-1)
    lc = np.linalg.norm(c, axis=-1)
    det = np.einsum("ptk,ptk->pt", a, np.cross(b, c))
    denom = (la * lb * lc + np.einsum("ptk,ptk->pt", a, b) * lc
             + np.einsum("ptk,ptk->pt", b, c) * la
             + np.einsum("ptk,ptk->pt", a, c) * lb)
    omega = 2.0 * np.arctan2(det, denom)
    return omega.sum(axis=1) / (4.0 * np.pi)


def mesh_sdf_points(points3, V, F, chunk=2048):
    """Signed distance of 3-D points to the mesh: sign(1 - 2w) * dist
    (getonlySDF_igl, Shape.hpp:332-340)."""
    out = np.zeros(len(points3))
    v0, v1, v2 = V[F[:, 0]], V[F[:, 1]], V[F[:, 2]]
    for s in range(0, len(points3), chunk):
        p = points3[s:s + chunk]
        d = np.sqrt(_point_tri_dist_sq(p, v0, v1, v2).min(axis=1))
        w = _winding_number(p, V, F)
        out[s:s + chunk] = np.sign(1.0 - 2.0 * w) * d
    return out


def slice_z0(V, F):
    """Intersect the mesh with the z=0 plane -> 2-D boundary segments
    (S, 2, 2). The robots are thin extrusions about z=0 (the reference
    queries its 3-D mesh SDF at z=0 points, sw_manager.hpp:760-775);
    the slice contour is the exact planar cross-section boundary."""
    tri = V[F]                                   # (T, 3, 3)
    z = tri[..., 2]
    segs = []
    edges = [(0, 1), (1, 2), (2, 0)]
    for t in range(len(tri)):
        pts = []
        for a, b in edges:
            za, zb = z[t, a], z[t, b]
            if (za > 0) != (zb > 0):
                s = za / (za - zb)
                p = tri[t, a] + s * (tri[t, b] - tri[t, a])
                pts.append(p[:2])
        if len(pts) == 2:
            segs.append(pts)
    return np.asarray(segs) if segs else np.zeros((0, 2, 2))


def planar_sdf_points(points2, segs):
    """Exact 2-D signed distance of points (P,2) to the sliced contour:
    unsigned min point-segment distance, sign by even-odd ray crossing
    (the planar analogue of sign(1-2w)*dist, Shape.hpp:332-340)."""
    a = segs[:, 0]                                # (S, 2)
    b = segs[:, 1]
    ab = b - a                                    # (S, 2)
    ab2 = np.maximum(np.einsum("sk,sk->s", ab, ab), 1e-30)
    ap = points2[:, None, :] - a[None]            # (P, S, 2)
    h = np.clip(np.einsum("psk,sk->ps", ap, ab) / ab2, 0.0, 1.0)
    d = ap - h[..., None] * ab[None]
    dist = np.sqrt(np.einsum("psk,psk->ps", d, d).min(axis=1))
    # even-odd crossing count of a +x ray
    ya, yb = a[:, 1], b[:, 1]
    py = points2[:, 1][:, None]
    crosses = (ya[None] > py) != (yb[None] > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        tcr = (py - ya[None]) / np.where(np.abs(yb - ya)[None] > 1e-30,
                                         (yb - ya)[None], 1.0)
    xhit = a[:, 0][None] + tcr * (b[:, 0] - a[:, 0])[None]
    inside = (np.sum(crosses & (xhit > points2[:, 0][:, None]),
                     axis=1) % 2) == 1
    return np.where(inside, -dist, dist)


@dataclasses.dataclass(frozen=True)
class GridSDF2D:
    """Planar SDF grid with bilinear device interpolation."""
    values: tuple          # hashable wrapper; use .field for the array
    x0: float
    y0: float
    step: float
    nx: int
    ny: int

    @property
    def field(self):
        return jnp.asarray(np.asarray(self.values).reshape(self.nx,
                                                           self.ny))

    def sdf_xy(self, px, py):
        f = self.field
        gx = (px - self.x0) / self.step
        gy = (py - self.y0) / self.step
        # outside the grid: fall back to distance-to-grid-border plus
        # the border value (keeps the field 1-Lipschitz-ish far away)
        gx_c = jnp.clip(gx, 0.0, self.nx - 1.001)
        gy_c = jnp.clip(gy, 0.0, self.ny - 1.001)
        ix = jnp.floor(gx_c).astype(jnp.int32)
        iy = jnp.floor(gy_c).astype(jnp.int32)
        fx = gx_c - ix
        fy = gy_c - iy
        v00 = f[ix, iy]
        v10 = f[ix + 1, iy]
        v01 = f[ix, iy + 1]
        v11 = f[ix + 1, iy + 1]
        v = ((1 - fx) * (1 - fy) * v00 + fx * (1 - fy) * v10
             + (1 - fx) * fy * v01 + fx * fy * v11)
        d2 = (jnp.maximum(gx - gx_c, 0.0) ** 2
              + jnp.maximum(gy - gy_c, 0.0) ** 2
              + jnp.maximum(-gx, 0.0) ** 2 + jnp.maximum(-gy, 0.0) ** 2)
        # sqrt guarded at 0 so jax.grad stays finite inside the grid
        outside = self.step * jnp.where(d2 > 0.0,
                                        jnp.sqrt(jnp.where(d2 > 0.0, d2,
                                                           1.0)), 0.0)
        return v + outside

    def sdf(self, p):
        return self.sdf_xy(p[..., 0], p[..., 1])


@dataclasses.dataclass(frozen=True)
class GridSDF3D:
    """Volumetric SDF grid with trilinear device interpolation —
    the 3-D analogue of GridSDF2D, used by the 3-D swept-volume
    surface extraction (viz/swept_surface.py). Mirrors the grid-SDF
    trilinear scheme of the reference's map (GridMap3D.h:55-128)
    applied to the robot mesh instead of per-query libigl evaluation
    (Shape.hpp:332-340)."""
    values: tuple
    x0: float
    y0: float
    z0: float
    step: float
    nx: int
    ny: int
    nz: int

    @property
    def field(self):
        return jnp.asarray(np.asarray(self.values).reshape(
            self.nx, self.ny, self.nz))

    def sdf_xyz(self, px, py, pz):
        f = self.field
        gx = (px - self.x0) / self.step
        gy = (py - self.y0) / self.step
        gz = (pz - self.z0) / self.step
        gx_c = jnp.clip(gx, 0.0, self.nx - 1.001)
        gy_c = jnp.clip(gy, 0.0, self.ny - 1.001)
        gz_c = jnp.clip(gz, 0.0, self.nz - 1.001)
        ix = jnp.floor(gx_c).astype(jnp.int32)
        iy = jnp.floor(gy_c).astype(jnp.int32)
        iz = jnp.floor(gz_c).astype(jnp.int32)
        fx, fy, fz = gx_c - ix, gy_c - iy, gz_c - iz
        v = 0.0
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    w = ((fx if dx else 1 - fx) * (fy if dy else 1 - fy)
                         * (fz if dz else 1 - fz))
                    v = v + w * f[ix + dx, iy + dy, iz + dz]
        d2 = (jnp.maximum(gx - gx_c, 0.0) ** 2
              + jnp.maximum(-gx, 0.0) ** 2
              + jnp.maximum(gy - gy_c, 0.0) ** 2
              + jnp.maximum(-gy, 0.0) ** 2
              + jnp.maximum(gz - gz_c, 0.0) ** 2
              + jnp.maximum(-gz, 0.0) ** 2)
        outside = self.step * jnp.where(
            d2 > 0.0, jnp.sqrt(jnp.where(d2 > 0.0, d2, 1.0)), 0.0)
        return v + outside


def grid_sdf_3d(V, F, resolution: float = 0.1,
                margin: float = 1.0) -> GridSDF3D:
    """One-time host precompute of a mesh's volumetric SDF grid
    (exact point-triangle distance + generalized winding-number sign,
    the quantities igl::AABB/fast_winding_number produce in
    Shape.hpp:311-340)."""
    lo = V.min(axis=0) - margin
    hi = V.max(axis=0) + margin
    ns = [int(np.ceil((hi[k] - lo[k]) / resolution)) + 1
          for k in range(3)]
    axes = [lo[k] + np.arange(ns[k]) * resolution for k in range(3)]
    gx, gy, gz = np.meshgrid(*axes, indexing="ij")
    pts = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], axis=-1)
    vals = mesh_sdf_points(pts, V, F).astype(np.float32)
    return GridSDF3D(values=tuple(vals.tolist()),
                     x0=float(lo[0]), y0=float(lo[1]), z0=float(lo[2]),
                     step=float(resolution),
                     nx=ns[0], ny=ns[1], nz=ns[2])


def shape_from_mesh(objpath: str, resolution: float = 0.05,
                    margin: float = 2.0,
                    poly_params=(0.0, 0.0, 0.0)) -> Shape2D:
    """Build a Shape2D whose body SDF is the mesh's z=0 planar SDF
    sampled on a grid (the TPU-native equivalent of the reference's
    per-query libigl evaluation). `resolution` mirrors config
    selfmapresu (config.hpp:42)."""
    V, F = load_obj(objpath)
    lo = V.min(axis=0)[:2] - margin
    hi = V.max(axis=0)[:2] + margin
    nx = int(np.ceil((hi[0] - lo[0]) / resolution)) + 1
    ny = int(np.ceil((hi[1] - lo[1]) / resolution)) + 1
    xs = lo[0] + np.arange(nx) * resolution
    ys = lo[1] + np.arange(ny) * resolution
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    pts2 = np.stack([gx.ravel(), gy.ravel()], axis=-1)
    segs = slice_z0(V, F)
    if len(segs):
        vals = np.empty(len(pts2), np.float32)
        for s in range(0, len(pts2), 4096):
            vals[s:s + 4096] = planar_sdf_points(pts2[s:s + 4096], segs)
    else:
        # degenerate (flat) mesh: fall back to the 3-D mesh SDF at z=0
        pts = np.concatenate([pts2, np.zeros((len(pts2), 1))], axis=-1)
        vals = mesh_sdf_points(pts, V, F).astype(np.float32)
    grid = GridSDF2D(values=tuple(vals.tolist()), x0=float(lo[0]),
                     y0=float(lo[1]), step=float(resolution),
                     nx=nx, ny=ny)
    tx, ty, yaw_deg = (list(poly_params) + [0.0] * 3)[:3]
    name = objpath.rsplit("/", 1)[-1].removesuffix(".obj")
    return Shape2D(name=f"mesh:{name}", body_sdf=grid.sdf_xy,
                   tx=tx, ty=ty, yaw0=yaw_deg * np.pi / 180.0)
