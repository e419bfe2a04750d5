"""Reference scenario fixture loading.

The reference's de facto regression suite is its 13 shape scenarios:
(config/<shape>.yaml, pcds/map_<shape>.pcd, pcds/trajectory_<shape>.txt
with "Start:"/"End:" lines) — see SURVEY.md §4 and the loader
LoadStartEnd (`src/plan_manager/src/plan_manager.cpp:359-422`). This
module reads those fixtures (from the read-only reference checkout or a
copy) into plain numpy/python objects.
"""

from __future__ import annotations

import dataclasses
import os
import re
from typing import Optional, Tuple

import numpy as np

from svsdf_tpu.utils.config import PlannerConfig
from svsdf_tpu.utils.pcd import read_pcd

REFERENCE_ROOT = os.environ.get("SVSDF_REFERENCE_ROOT", "/root/reference")
_PM = "src/plan_manager"


@dataclasses.dataclass
class Scenario:
    name: str
    config: PlannerConfig
    map_points: np.ndarray     # (N, 3)
    start: np.ndarray          # (3,) x, y, yaw
    goal: np.ndarray           # (3,)
    #: prebuilt robot shape overriding config.inputdata (deformable
    #: scenarios: the time-varying scale is a callable, not a config
    #: string)
    shape: object = None


def list_scenarios(root: str = REFERENCE_ROOT):
    cfg_dir = os.path.join(root, _PM, "config")
    names = []
    for f in sorted(os.listdir(cfg_dir)):
        if f.endswith(".yaml"):
            name = f[:-5]
            if os.path.exists(os.path.join(root, _PM, "pcds",
                                           f"map_{name}.pcd")):
                names.append(name)
    return names


def load_start_end(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Parse the "Start: x y z" / "End: x y z" fixture lines
    (plan_manager.cpp:396-421)."""
    start = np.zeros(3)
    end = np.zeros(3)
    with open(path) as f:
        for line in f:
            m = re.match(r"\s*Start:\s+([-\d.eE]+)\s+([-\d.eE]+)"
                         r"\s+([-\d.eE]+)", line)
            if m:
                start = np.asarray([float(g) for g in m.groups()])
            m = re.match(r"\s*End:\s+([-\d.eE]+)\s+([-\d.eE]+)"
                         r"\s+([-\d.eE]+)", line)
            if m:
                end = np.asarray([float(g) for g in m.groups()])
    return start, end


def load_scenario(name: str, root: str = REFERENCE_ROOT) -> Scenario:
    cfg = PlannerConfig.from_yaml(
        os.path.join(root, _PM, "config", f"{name}.yaml"))
    pts = read_pcd(os.path.join(root, _PM, "pcds", f"map_{name}.pcd"))
    start, goal = load_start_end(
        os.path.join(root, _PM, "pcds", f"trajectory_{name}.txt"))
    return Scenario(name=name, config=cfg, map_points=pts,
                    start=start, goal=goal)


# ---------------------------------------------------------------------------
# Synthetic scenarios for the analytic shapes the reference ships no
# demo fixtures for (its 13 launch/config/pcd triples cover 13 of the
# 18 Shape.hpp SDFs). Each is a gate map (one wall, one gap) sized to
# the shape, so every shape family is exercisable end-to-end.

#: shape -> (max body radius [m], kernel_size, kernel_yaw_num)
_SYNTHETIC = {
    "Circle": (1.0, 7, 4),
    "sdTrapezoid": (3.6, 11, 12),
    "bigX": (3.8, 11, 12),
    "sdMoon": (3.0, 9, 12),
    "Polygon": (6.0, 15, 18),
}


def list_synthetic_scenarios():
    return sorted(_SYNTHETIC)


def synthetic_scenario(name: str) -> Scenario:
    """Gate-map scenario for a shape without a reference fixture.
    The gap is radius+1 m on each side of the wall center — passable,
    but tight enough that the swept-volume penalty is live."""
    if name not in _SYNTHETIC:
        raise KeyError(f"no synthetic scenario for {name!r}; "
                       f"have {list_synthetic_scenarios()}")
    radius, ksize, yawn = _SYNTHETIC[name]
    half_gap = radius + 1.0
    height = max(24.0, 4.0 * radius + 12.0)
    mid = height / 2.0
    pts = []
    for x in (24.0, 25.0):                   # 2-voxel-thick wall
        for y in np.arange(0.5, height, 1.0):
            if abs(y - mid) > half_gap:
                for z in (0.5, 1.5):
                    pts.append((x + 0.5, y, z))
    # domain markers (map bounds are measured from the cloud)
    pts += [(0.05, 0.05, 0.05), (49.9, height - 0.1, 1.9)]
    cfg = PlannerConfig(inputdata=f"shapes/{name}.obj",
                        kernel_size=ksize, kernel_yaw_num=yawn,
                        occupancy_resolution=1.0, safety_hor=0.4,
                        loadStartEnd=False)
    start = np.asarray([6.5, mid + 0.5, 0.0])
    goal = np.asarray([43.5, mid + 0.5, 0.0])
    return Scenario(name=f"synthetic_{name}", config=cfg,
                    map_points=np.asarray(pts), start=start, goal=goal)


def list_deformable_scenarios():
    return ["deformable_heart", "deformable_rhombus", "deformable_star"]


def deformable_scenario(name: str = "deformable_star") -> Scenario:
    """Breathing-scale robot scenario — the paper's `useScale` demos
    (sw_manager.hpp:495-518, shipped commented-out behind the
    compile-time flag). A star robot with s(t) = 1 + 0.35 sin(0.9 t)
    threads a gate sized for its MAXIMUM inflation: the front end
    plans with conservative max-scale kernels (ScaledShape.sdf_xy
    evaluates at kernel_scale), while the SVSDF certificate sees the
    true time-varying sweep.
    """
    if name not in list_deformable_scenarios():
        raise KeyError(name)
    import jax.numpy as jnp

    from svsdf_tpu.models import shapes

    if name == "deformable_heart":
        # breathing sdHeart (max body radius ~4.6 m, +25% inflation):
        # a SECOND deformable family exercising the scale hook on a
        # curved, asymmetric SDF (sw_manager.hpp:495-518)
        scale_fn = lambda t: 1.0 + 0.25 * jnp.sin(0.8 * t)  # noqa: E731
        shape = shapes.make_scaled_shape("sdHeart", scale_fn,
                                         kernel_scale=1.25)
        half_gap, height = 6.4, 36.0
        mid = height / 2.0
        pts = []
        for x in (24.5, 25.5):
            for y in np.arange(0.5, height, 1.0):
                if abs(y - mid) > half_gap:
                    for z in (0.5, 1.5):
                        pts.append((x, y, z))
        pts += [(0.05, 0.05, 0.05), (49.9, height - 0.1, 1.9)]
        cfg = PlannerConfig(inputdata="shapes/sdHeart.obj",
                            kernel_size=15, kernel_yaw_num=12,
                            occupancy_resolution=1.0, safety_hor=0.4,
                            loadStartEnd=False)
        return Scenario(name="deformable_heart", config=cfg,
                        map_points=np.asarray(pts),
                        start=np.asarray([6.5, mid + 0.5, 0.0]),
                        goal=np.asarray([43.5, mid + 0.5, 0.0]),
                        shape=shape)
    if name == "deformable_rhombus":
        # breathing sdRhombus: long-axis ~4.4 m but narrow across, so
        # it threads the 3.6 m half-gap SIDEWAYS while inflating 20%
        # — the tight deformable demo where wall voxels land inside
        # the harvest band and the certify-refine machinery is live
        # (the heart variant's round footprint cannot thread tighter
        # than its max-scale width, so its gate is roomy by
        # construction)
        scale_fn = lambda t: 1.0 + 0.2 * jnp.sin(0.8 * t)  # noqa: E731
        shape = shapes.make_scaled_shape("sdRhombus", scale_fn,
                                         kernel_scale=1.2)
        half_gap, height = 3.6, 28.0
        mid = height / 2.0
        pts = []
        for x in (24.5, 25.5):
            for y in np.arange(0.5, height, 1.0):
                if abs(y - mid) > half_gap:
                    for z in (0.5, 1.5):
                        pts.append((x, y, z))
        pts += [(0.05, 0.05, 0.05), (49.9, height - 0.1, 1.9)]
        cfg = PlannerConfig(inputdata="shapes/sdRhombus.obj",
                            kernel_size=13, kernel_yaw_num=12,
                            occupancy_resolution=1.0, safety_hor=0.4,
                            loadStartEnd=False)
        return Scenario(name="deformable_rhombus", config=cfg,
                        map_points=np.asarray(pts),
                        start=np.asarray([6.5, mid + 0.5, 0.0]),
                        goal=np.asarray([43.5, mid + 0.5, 0.0]),
                        shape=shape)
    scale_fn = lambda t: 1.0 + 0.35 * jnp.sin(0.9 * t)    # noqa: E731
    shape = shapes.make_scaled_shape("star", scale_fn,
                                     kernel_scale=1.35)
    # gate map: max-scale star radius ~ 3.8 m -> half_gap 4.2 m keeps
    # the conservative front end feasible while putting wall voxels
    # inside the bd/3 harvest band, so the back-end SVSDF penalty and
    # the certify-refine machinery are actually exercised
    half_gap, height = 4.2, 28.0
    mid = height / 2.0
    pts = []
    for x in (24.5, 25.5):
        for y in np.arange(0.5, height, 1.0):
            if abs(y - mid) > half_gap:
                for z in (0.5, 1.5):
                    pts.append((x, y, z))
    pts += [(0.05, 0.05, 0.05), (49.9, height - 0.1, 1.9)]
    cfg = PlannerConfig(inputdata="shapes/star.obj", kernel_size=13,
                        kernel_yaw_num=12, occupancy_resolution=1.0,
                        safety_hor=0.4, loadStartEnd=False)
    return Scenario(name="deformable_star", config=cfg,
                    map_points=np.asarray(pts),
                    start=np.asarray([6.5, mid + 0.5, 0.0]),
                    goal=np.asarray([43.5, mid + 0.5, 0.0]),
                    shape=shape)


def load_any(name: str, root: str = REFERENCE_ROOT) -> Scenario:
    """Load ANY scenario by name, dispatching on the naming convention
    used throughout the repo: `synthetic_*` -> gate maps for shapes
    without reference fixtures, `deformable_*` -> breathing-scale
    scenarios, `mesh_*` -> reference maps with the mesh-SDF robot,
    anything else -> the reference launch/config/pcds triple
    (plan_manager.cpp:359-422). This is the single loader the golden
    replay lane and scripts/run_scenarios.py share, so a scenario that
    certifies in the recorder is replayable by the same name in CI."""
    if name.startswith("synthetic_"):
        return synthetic_scenario(name.removeprefix("synthetic_"))
    if name.startswith("deformable_"):
        return deformable_scenario(name)
    if name.startswith("mesh_"):
        return mesh_scenario(name.removeprefix("mesh_"), root=root)
    return load_scenario(name, root=root)


def mesh_scenario(ref_name: str, root: str = REFERENCE_ROOT,
                  resolution: float = 0.05) -> Scenario:
    """Reference scenario planned with the robot loaded from the
    reference's SHIPPED `.obj` mesh (src/plan_manager/shapes/) through
    the mesh-SDF path (models/mesh_sdf.py) instead of the analytic
    SDF — exercising the BasicShape igl-mesh route (Shape.hpp:284-340)
    on the reference's own robot geometry."""
    from svsdf_tpu.models.mesh_sdf import shape_from_mesh

    sc = load_scenario(ref_name, root=root)
    objpath = os.path.join(root, _PM, "shapes", f"{ref_name}.obj")
    if not os.path.isfile(objpath):
        raise FileNotFoundError(objpath)
    shape = shape_from_mesh(objpath, resolution=resolution,
                            poly_params=sc.config.poly_params)
    sc.name = f"mesh_{ref_name}"
    sc.shape = shape
    return sc
