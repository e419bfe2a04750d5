"""Visualization layer: scene render, OBJ export, HTML dashboard."""

import os

import numpy as np
import jax.numpy as jnp

from svsdf_tpu.models import shapes
from svsdf_tpu.ops import minco
from svsdf_tpu.utils.debugbus import DebugBus
from svsdf_tpu.viz import dashboard, scene


def _traj(n=4):
    head = jnp.zeros((3, 3), jnp.float32)
    tail = jnp.zeros((3, 3), jnp.float32)
    tail = tail.at[0].set(jnp.asarray([6.0, 1.0, 0.5]))
    wps = jnp.asarray(
        np.stack([np.linspace(1.5, 4.5, n - 1),
                  np.sin(np.linspace(0, 2, n - 1)),
                  np.linspace(0, 0.4, n - 1)], -1), jnp.float32)
    return minco.solve(jnp.full((n,), 1.2, jnp.float32), head, tail, wps)


def test_render_scene_all_layers(tmp_path):
    shape = shapes.make_shape("Circle")
    traj = _traj()
    occ = np.zeros((40, 30), bool)
    occ[10:14, 5:25] = True
    out = scene.render_scene(
        str(tmp_path / "scene.png"), occupancy=occ, origin=(-2, -3),
        resolution=0.25,
        obstacles=np.random.default_rng(0).uniform(-2, 6, (30, 2)),
        astar_path=np.asarray([[0, 0], [2, 1], [4, 1], [6, 1]]),
        traj=traj, shape=shape, n_poses=3,
        swept_contours=[np.asarray([[0, -1], [3, -1], [6, 0]])],
        title="test scene")
    assert os.path.getsize(out) > 10_000


def test_shape_outline_closed_and_near_zero_level():
    shape = shapes.make_shape("Circle")
    o = scene.shape_outline(shape, yaw=0.3)
    assert len(o) > 20
    r = np.linalg.norm(o, axis=1)
    np.testing.assert_allclose(r, 1.0, atol=0.12)  # unit circle level set


def test_write_obj_roundtrip(tmp_path):
    v = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], float)
    f = np.asarray([[0, 1, 2]])
    p = scene.write_obj(str(tmp_path / "m.obj"), v, f)
    txt = open(p).read()
    assert txt.count("v ") == 3 and "f 1 2 3" in txt


def test_dashboard_roundtrip(tmp_path):
    bus = DebugBus()
    bus.send("back_end", "optimization started", iters=50)
    for i in range(20):
        bus.log_scalar("cost", 100.0 / (i + 1), step=i)
    bus.log_scalar("lonely", 3.14)
    with bus.section("plan"):
        pass
    jl = str(tmp_path / "bus.jsonl")
    bus.dump_jsonl(jl)
    bus2 = dashboard.load_bus_jsonl(jl)
    assert len(bus2.events) == 1
    assert len(bus2.series["cost"]) == 20
    out = dashboard.render_dashboard(bus2, str(tmp_path / "dash.html"))
    txt = open(out).read()
    assert "polyline" in txt and "optimization started" in txt
    assert "plan" in txt
