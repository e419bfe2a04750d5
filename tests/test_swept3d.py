"""3-D swept-volume surface extraction (viz/swept_surface.py):
volumetric swept field + marching tetrahedra, the TPU-side equivalent
of the reference's continuation marching + igl::marching_cubes
(sw_calculate.cpp:5-222)."""

import numpy as np
import jax.numpy as jnp
import pytest

from svsdf_tpu.models import mesh_sdf
from svsdf_tpu.ops import minco
from svsdf_tpu.utils import geo
from svsdf_tpu.viz import swept_surface as sw3


def _watertight(V, F):
    """Every undirected edge shared by exactly two triangles."""
    edges = np.sort(np.concatenate([F[:, [0, 1]], F[:, [1, 2]],
                                    F[:, [2, 0]]]), axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    return (counts == 2).all()


def test_marching_tetrahedra_sphere():
    """Iso-surface of an analytic sphere field: watertight, outward,
    vertices on the sphere, volume within grid tolerance."""
    eps = 0.125
    ax = np.arange(-1.6, 1.6 + eps, eps)
    gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
    r = 1.0
    field = np.sqrt(gx**2 + gy**2 + gz**2) - r
    V, F = sw3.marching_tetrahedra(ax, ax, ax, field)
    assert len(V) > 100 and len(F) > 100
    assert _watertight(V, F)
    d = np.abs(np.linalg.norm(V, axis=1) - r)
    assert d.max() < eps                      # vertices near the sphere
    vol = geo.polytope_volume_3d(V, F)        # needs outward orientation
    assert abs(vol - 4.0 / 3.0 * np.pi * r**3) < 0.35


def _unit_cube_mesh():
    V = np.asarray([[x, y, z] for x in (-0.5, 0.5) for y in (-0.5, 0.5)
                    for z in (-0.5, 0.5)], float)
    # 12 outward triangles (corner k = 4x+2y+z)
    F = np.asarray([
        [0, 1, 3], [0, 3, 2],         # x = -0.5 face (normal -x)
        [4, 7, 5], [4, 6, 7],         # x = +0.5
        [0, 5, 1], [0, 4, 5],         # y = -0.5
        [2, 3, 7], [2, 7, 6],         # y = +0.5
        [0, 2, 6], [0, 6, 4],         # z = -0.5
        [1, 5, 7], [1, 7, 3],         # z = +0.5
    ], np.int64)
    return V, F


def test_mesh_grid_sdf3d_cube_values():
    V, F = _unit_cube_mesh()
    g = mesh_sdf.grid_sdf_3d(V, F, resolution=0.1, margin=0.8)
    got = np.asarray(g.sdf_xyz(jnp.asarray([0.0, 0.0, 1.0]),
                               jnp.asarray([0.0, 0.45, 0.0]),
                               jnp.asarray([0.0, 0.0, 0.0])))
    assert got[0] < -0.3                      # deep inside
    assert abs(got[1] - (-0.05)) < 0.03       # near the +y face
    assert abs(got[2] - 0.5) < 0.05           # 0.5 outside the +x face


def test_swept_volume_3d_straight_sweep_of_cube():
    """Unit cube swept 2 m along +x with no rotation: the swept volume
    is a 3x1x1 box. Extracted surface must be watertight, have the
    right bounding box and volume, and contain the start/end poses."""
    V, F = _unit_cube_mesh()
    g = mesh_sdf.grid_sdf_3d(V, F, resolution=0.1, margin=0.6)

    head = jnp.zeros((3, 3)); tail = jnp.zeros((3, 3))
    tail = tail.at[0, 0].set(2.0)             # (x, y, yaw) end state
    wps = jnp.asarray([[0.7, 0.0, 0.0], [1.4, 0.0, 0.0]])
    traj = minco.solve(jnp.asarray([1.0, 1.0, 1.0]), head, tail, wps)

    eps = 0.125
    Vs, Fs = sw3.extract_swept_volume_3d(
        g.sdf_xyz, traj, (-1.2, 3.2, -1.2, 1.2, -1.2, 1.2), eps, n_t=96)
    assert _watertight(Vs, Fs)
    lo, hi = Vs.min(axis=0), Vs.max(axis=0)
    assert np.allclose(lo, [-0.5, -0.5, -0.5], atol=2 * eps)
    assert np.allclose(hi, [2.5, 0.5, 0.5], atol=2 * eps)
    vol = geo.polytope_volume_3d(Vs, Fs)
    assert abs(vol - 3.0) < 0.45              # 3x1x1 box, grid tolerance
    # OBJ round trip through the mesh loader
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "sv.obj")
        nv, nf = sw3.write_trimesh_obj(Vs, Fs, p)
        V2, F2 = mesh_sdf.load_obj(p)
        assert len(V2) == nv and len(F2) == nf


def test_marching_tetrahedra_empty_field():
    ax = np.arange(0.0, 1.0, 0.25)
    field = np.ones((len(ax),) * 3)           # no crossing
    V, F = sw3.marching_tetrahedra(ax, ax, ax, field)
    assert len(V) == 0 and len(F) == 0
