"""Mesh-SDF path: .obj -> host winding-number/point-triangle SDF grid
-> device bilinear sampling (svsdf_tpu/models/mesh_sdf.py), validated
against the analytic SDF of the same solid.

Mirrors the role of the reference's libigl mesh SDF (BasicShape,
Shape.hpp:311-340) which backs every shape's fallback distance query.
"""

import math
import os
import tempfile

import numpy as np
import pytest

from svsdf_tpu.models.mesh_sdf import (load_obj, mesh_sdf_points,
                                       shape_from_mesh)
from svsdf_tpu.models.shapes import shape_from_objpath


def _write_cylinder_obj(path, r=1.5, h=1.0, n=64):
    """Closed triangulated cylinder of radius r about z in [-h/2, h/2]:
    its z=0 cross-section SDF is the circle SDF |p| - r."""
    ang = np.linspace(0, 2 * math.pi, n, endpoint=False)
    ring = np.stack([r * np.cos(ang), r * np.sin(ang)], axis=-1)
    verts = []
    for z in (-h / 2, h / 2):
        for x, y in ring:
            verts.append((x, y, z))
    verts.append((0.0, 0.0, -h / 2))   # bottom center
    verts.append((0.0, 0.0, h / 2))    # top center
    bot, top = 2 * n, 2 * n + 1
    faces = []
    for i in range(n):
        j = (i + 1) % n
        # side quad (outward normal) as two triangles
        faces.append((i, j, n + j))
        faces.append((i, n + j, n + i))
        # caps
        faces.append((j, i, bot))
        faces.append((n + i, n + j, top))
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for a, b, c in faces:
            f.write(f"f {a + 1} {b + 1} {c + 1}\n")


@pytest.fixture(scope="module")
def cyl_obj():
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "roundRobot.obj")
        _write_cylinder_obj(p)
        yield p


def test_load_obj(cyl_obj):
    V, F = load_obj(cyl_obj)
    assert V.shape == (130, 3) and F.shape == (256, 3)


def test_mesh_sdf_matches_cylinder(cyl_obj):
    V, F = load_obj(cyl_obj)
    rng = np.random.default_rng(3)
    pts = rng.uniform([-3, -3, -0.3], [3, 3, 0.3], size=(200, 3))
    got = mesh_sdf_points(pts, V, F)
    radial = np.linalg.norm(pts[:, :2], axis=1) - 1.5
    axial = np.abs(pts[:, 2]) - 0.5
    exact = np.where((radial < 0) & (axial < 0),
                     np.maximum(radial, axial),
                     np.hypot(np.maximum(radial, 0), np.maximum(axial, 0)))
    # n=64 polygonalization of the circle -> O(r * (pi/n)^2) facet error
    assert np.max(np.abs(got - exact)) < 0.01


def test_shape_from_mesh_device_sampling(cyl_obj):
    shape = shape_from_mesh(cyl_obj, resolution=0.04)
    rng = np.random.default_rng(7)
    pts = rng.uniform(-2.5, 2.5, size=(64, 2)).astype(np.float32)
    got = np.asarray(shape.sdf(pts))
    exact = np.linalg.norm(pts, axis=1) - 1.5
    assert np.max(np.abs(got - exact)) < 0.03      # grid + facet error
    # gradient is the radial direction away from the boundary
    _, grad = shape.sdf_grad(pts[np.linalg.norm(pts, axis=1) > 0.3])
    sel = pts[np.linalg.norm(pts, axis=1) > 0.3]
    radial = sel / np.linalg.norm(sel, axis=1, keepdims=True)
    cos = np.sum(np.asarray(grad) * radial, axis=1) / np.maximum(
        np.linalg.norm(np.asarray(grad), axis=1), 1e-9)
    assert np.min(cos) > 0.95


def test_outside_grid_falls_back_gracefully(cyl_obj):
    shape = shape_from_mesh(cyl_obj, resolution=0.1, margin=1.0)
    far = np.array([[30.0, 0.0], [0.0, -40.0]], dtype=np.float32)
    vals = np.asarray(shape.sdf(far))
    # 1-Lipschitz-ish growth: positive and increasing with distance
    assert np.all(vals > 20.0)


def test_factory_routes_unknown_obj_to_mesh(cyl_obj):
    shape = shape_from_objpath(cyl_obj)
    assert shape.name.startswith("mesh:")
    v = float(np.asarray(shape.sdf(np.zeros((1, 2), np.float32)))[0])
    assert abs(v - (-1.5)) < 0.05


def test_factory_prefers_analytic_name(tmp_path):
    # an .obj named after an analytic shape still uses the formula
    p = tmp_path / "sdHeart.obj"
    p.write_text("v 0 0 0\n")
    shape = shape_from_objpath(str(p))
    assert shape.name == "sdHeart"
