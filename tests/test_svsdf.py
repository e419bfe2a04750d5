"""SVSDF oracle tests vs brute-force dense time sampling (the natural
oracle per SURVEY.md §4): min-over-time robot SDF, t* location, exact
gradient direction, and GSIP interior distance on a translating circle
(where the swept volume is known in closed form)."""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from svsdf_tpu.models import shapes
from svsdf_tpu.ops import minco, svsdf
from svsdf_tpu.utils import trajectory as trj


def _straight_traj(n=4, speed_to=(10.0, 0.0), t_piece=2.0):
    """Straight-line x-axis trajectory from (0,0) to (10,0), yaw=0."""
    times = jnp.ones(n) * t_piece
    head = jnp.array([[0.0, 0.0, 0.0], [0.0] * 3, [0.0] * 3])
    tail = jnp.array([[speed_to[0], speed_to[1], 0.0], [0.0] * 3, [0.0] * 3])
    frac = jnp.linspace(0, 1, n + 1)[1:-1]
    wps = jnp.stack([frac * speed_to[0], frac * speed_to[1],
                     jnp.zeros_like(frac)], axis=-1)
    return minco.solve(times, head, tail, wps)


def _wavy_traj(n=5):
    times = jnp.ones(n) * 2.0
    head = jnp.array([[0.0, 0.0, 0.0], [0.0] * 3, [0.0] * 3])
    tail = jnp.array([[8.0, 0.0, 1.0], [0.0] * 3, [0.0] * 3])
    xs = jnp.linspace(0, 8.0, n + 1)[1:-1]
    ys = jnp.sin(xs)
    yaws = 0.2 * xs
    wps = jnp.stack([xs, ys, yaws], axis=-1)
    return minco.solve(times, head, tail, wps)


def test_outside_matches_bruteforce():
    shape = shapes.make_shape("sdHeart")
    traj = _wavy_traj()
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform([-3, -6], [11, 6], size=(40, 2)))
    res = svsdf.svsdf_query(shape, traj, pts, with_inside=False)

    # brute-force oracle: very dense uniform time sampling
    total = float(traj.total_duration)
    ts = jnp.linspace(0.0, total, 60001)
    d = jax.vmap(lambda p: jnp.min(svsdf.sdf_at_time(shape, traj, p, ts)))(
        pts)
    np.testing.assert_allclose(np.asarray(res.sdf), np.asarray(d), atol=2e-4)


def test_tstar_is_minimizer():
    shape = shapes.make_shape("star")
    traj = _wavy_traj()
    pts = jnp.array([[4.0, 4.0], [0.0, -3.0], [8.0, 2.0]])
    res = svsdf.svsdf_query(shape, traj, pts, with_inside=False)
    for i in range(pts.shape[0]):
        v_star = float(svsdf.sdf_at_time(shape, traj, pts[i],
                                         res.t_star[i]))
        np.testing.assert_allclose(v_star, float(res.sdf[i]), atol=1e-8)
        # perturbing t must not decrease the SDF noticeably
        for dt in (0.05, -0.05, 0.3, -0.3):
            t2 = jnp.clip(res.t_star[i] + dt, 0.0, traj.total_duration)
            v2 = float(svsdf.sdf_at_time(shape, traj, pts[i], t2))
            assert v2 >= v_star - 1e-6


def test_translating_circle_closed_form():
    """A radius-1 circle translating along the x-axis sweeps a stadium:
    SDF(p) = dist(p, segment[(0,0),(10,0)]) - 1 (outside AND inside)."""
    shape = shapes.make_shape("Circle")
    traj = _straight_traj()
    pts = jnp.array([
        [5.0, 3.0],    # above mid: dist 3 - 1 = 2
        [-2.0, 0.0],   # before start: 2 - 1 = 1
        [12.0, 0.0],   # past end: 2 - 1 = 1
        [5.0, 1.5],    # above: 0.5
        [5.0, 0.5],    # inside: -0.5
        [5.0, 0.0],    # centerline: -1
    ])
    res = svsdf.svsdf_query(shape, traj, pts, with_inside=True)
    seg_dist = np.array([3.0, 2.0, 2.0, 1.5, 0.5, 0.0]) - 1.0
    got = np.asarray(res.sdf)
    # outside values: tight; GSIP interior: ref stops at |max g|<0.1
    np.testing.assert_allclose(got[:4], seg_dist[:4], atol=1e-3)
    np.testing.assert_allclose(got[4:], seg_dist[4:], atol=0.12)
    # gradient above the stadium should point +y for the outside points
    g = np.asarray(res.grad_world)
    assert g[0, 1] > 0.99
    assert g[3, 1] > 0.99
    # inside point (5, .5): nearest exit upward => grad ~ +y
    assert g[4, 1] > 0.9


@pytest.mark.slow
def test_grad_world_matches_fd():
    """World gradient == finite difference of the swept SDF (outside)."""
    shape = shapes.make_shape("sdRoundedX")
    traj = _wavy_traj()
    pts = jnp.array([[5.0, 4.0], [-1.0, -2.0]])
    res = svsdf.svsdf_query(shape, traj, pts, with_inside=False)
    eps = 1e-5
    for i in range(pts.shape[0]):
        for k in range(2):
            dp = jnp.zeros(2).at[k].set(eps)
            rp = svsdf.svsdf_query(shape, traj, (pts[i] + dp)[None],
                                   with_inside=False)
            rm = svsdf.svsdf_query(shape, traj, (pts[i] - dp)[None],
                                   with_inside=False)
            fd = float(rp.sdf[0] - rm.sdf[0]) / (2 * eps)
            np.testing.assert_allclose(float(res.grad_world[i, k]), fd,
                                       atol=2e-3)


@pytest.mark.slow
def test_grid_query_shape():
    shape = shapes.make_shape("Circle")
    traj = _straight_traj(n=3)
    xs = jnp.linspace(-2, 12, 16)
    ys = jnp.linspace(-4, 4, 8)
    field = svsdf.svsdf_grid(shape, traj, xs, ys)
    assert field.shape == (16, 8)
    # far corner is far outside
    assert float(field[0, 0]) > 1.0


@pytest.mark.slow
def test_gsip_topk_matches_full():
    """gsip_topk restricts the interior GSIP solve to the K
    most-interior points; with K >= the number of interior points it
    must reproduce the full-GSIP result exactly, and with a small K
    the selected interior points must still get GSIP values while the
    rest keep the (valid, conservative) min-over-time SDF."""
    import dataclasses

    shape = shapes.make_shape("Circle")
    traj = _straight_traj()
    # 3 interior points (|y| < 1 inside the swept stadium), 5 outside
    pts = jnp.array([
        [5.0, 0.5], [3.0, 0.0], [7.0, -0.4],
        [5.0, 3.0], [-2.0, 0.0], [12.0, 0.0], [5.0, 1.5], [0.0, 4.0],
    ])
    full = svsdf.svsdf_query(shape, traj, pts, with_inside=True)

    cfg_cover = dataclasses.replace(svsdf.DEFAULT_CONFIG, gsip_topk=3)
    got = svsdf.svsdf_query(shape, traj, pts, cfg=cfg_cover,
                            with_inside=True)
    np.testing.assert_allclose(np.asarray(got.sdf),
                               np.asarray(full.sdf), atol=1e-7)
    np.testing.assert_allclose(np.asarray(got.grad_world),
                               np.asarray(full.grad_world), atol=1e-7)

    # K=1: only the most-interior point (centerline-nearest) gets the
    # GSIP value; the other interior points keep min-over-time SDF,
    # which for interior points is >= the true (negative) distance.
    cfg_one = dataclasses.replace(svsdf.DEFAULT_CONFIG, gsip_topk=1)
    part = svsdf.svsdf_query(shape, traj, pts, cfg=cfg_one,
                             with_inside=True)
    deepest = int(np.argmin(np.asarray(full.sdf)))
    np.testing.assert_allclose(float(part.sdf[deepest]),
                               float(full.sdf[deepest]), atol=1e-7)
    # non-selected interior points: min-over-time SDF is an upper
    # bound... the true interior distance is MORE negative
    for i in range(3):
        if i != deepest:
            assert float(part.sdf[i]) >= float(full.sdf[i]) - 1e-6
    # outside points are untouched by the topk path
    np.testing.assert_allclose(np.asarray(part.sdf[3:]),
                               np.asarray(full.sdf[3:]), atol=1e-7)


def test_interp_refinement_matches_exact():
    """refine_interp_n: pose-interpolated refinement rounds agree with
    the exact per-point polynomial pose eval to interp error (the
    tables are dense enough that only the lerp differs)."""
    import dataclasses

    shape = shapes.make_shape("sdHeart")
    traj = _wavy_traj()
    rng = np.random.default_rng(3)
    pts = jnp.asarray(rng.uniform([-3, -6], [11, 6], size=(128, 2)))
    c0 = svsdf.SVSDFConfig(coarse_n=128, refine_rounds=2)
    c1 = dataclasses.replace(c0, refine_interp_n=512)
    s0, t0 = svsdf.tstar_search_batch(shape, traj, pts, c0)
    s1, t1 = svsdf.tstar_search_batch(shape, traj, pts, c1)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=5e-4)
