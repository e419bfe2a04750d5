"""Deformable (time-varying uniformly scaled) robot shapes.

The reference gates this behind the `useScale` flag and the
getScale/getDotScale hooks (`sw_manager.hpp:17,495-518`); here a
ScaledShape threads s(t) through the whole SVSDF query stack exactly
(sdf_s(p) = s * sdf(p/s)) with `jax.grad` scale derivatives.
"""

import numpy as np
import jax
import jax.numpy as jnp

from svsdf_tpu.models import shapes
from svsdf_tpu.ops import minco, svsdf
from svsdf_tpu.utils import trajectory as trj


def _straight_traj(n=4, t_piece=2.0):
    times = jnp.ones(n) * t_piece
    head = jnp.array([[0.0, 0.0, 0.0], [0.0] * 3, [0.0] * 3])
    tail = jnp.array([[10.0, 0.0, 0.0], [0.0] * 3, [0.0] * 3])
    frac = jnp.linspace(0, 1, n + 1)[1:-1]
    wps = jnp.stack([frac * 10.0, jnp.zeros_like(frac),
                     jnp.zeros_like(frac)], axis=-1)
    return minco.solve(times, head, tail, wps)


def _breathing_circle(amp=0.5):
    # unit circle with s(t) = 1 + amp*sin(t)
    return shapes.make_scaled_shape(
        "Circle", lambda t: 1.0 + amp * jnp.sin(t))


def test_scaled_shape_sdf_exactness():
    s = _breathing_circle()
    # circle r=1 scaled by s: sdf = |p| - s(t)
    for t in [0.0, 0.7, 2.0]:
        st = 1.0 + 0.5 * np.sin(t)
        v = float(s.sdf_xy_t(jnp.asarray(3.0), jnp.asarray(4.0),
                             jnp.asarray(t)))
        np.testing.assert_allclose(v, 5.0 - st, rtol=1e-6)


def test_dot_scale_matches_fd():
    s = _breathing_circle()
    ts = jnp.asarray([0.1, 1.3, 4.0])
    ds = np.asarray(s.dot_scale(ts))
    fd = (np.asarray(s.scale(ts + 1e-6)) - np.asarray(s.scale(ts - 1e-6))) \
        / 2e-6
    np.testing.assert_allclose(ds, fd, rtol=1e-4)


def test_svsdf_matches_bruteforce_deformable():
    shape = _breathing_circle()
    traj = _straight_traj()
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.uniform([-2, -4], [12, 4], size=(24, 2)))
    res = svsdf.svsdf_query(shape, traj, pts, with_inside=False)

    total = float(traj.total_duration)
    ts = jnp.linspace(0.0, total, 60001)
    d = jax.vmap(lambda p: jnp.min(svsdf.sdf_at_time(shape, traj, p, ts)))(
        pts)
    np.testing.assert_allclose(np.asarray(res.sdf), np.asarray(d), atol=3e-4)


def test_deformable_closed_form_straight_line():
    """Growing circle along the x-axis: outside SVSDF at a point above
    the path is min_t sqrt((px - x(t))^2 + py^2) - s(t). With s
    monotone over the sweep window the binding time shifts from the
    perpendicular foot — check against dense sampling AND confirm it
    differs from the rigid answer (i.e. the scale actually matters)."""
    shape = _breathing_circle(amp=0.8)
    rigid = shapes.make_shape("Circle")
    traj = _straight_traj()
    p = jnp.asarray([[5.0, 3.5]])
    res_def = svsdf.svsdf_query(shape, traj, p, with_inside=False)
    res_rig = svsdf.svsdf_query(rigid, traj, p, with_inside=False)
    # closed form: min_t ||p - x(t)|| - s(t) on a dense grid
    ts = jnp.linspace(0.0, float(traj.total_duration), 100001)
    xy = trj.pos(traj, ts)[..., :2]
    dist = jnp.linalg.norm(p[0][None] - xy, axis=-1)
    want_def = float(jnp.min(dist - (1.0 + 0.8 * jnp.sin(ts))))
    want_rig = float(jnp.min(dist - 1.0))
    np.testing.assert_allclose(float(res_def.sdf[0]), want_def, atol=3e-4)
    np.testing.assert_allclose(float(res_rig.sdf[0]), want_rig, atol=3e-4)
    assert abs(want_def - want_rig) > 0.05  # the scale actually matters


def test_deformable_grad_world_matches_fd():
    shape = _breathing_circle()
    traj = _straight_traj()
    pts = jnp.asarray([[5.0, 2.5], [1.0, -3.0]])
    res = svsdf.svsdf_query(shape, traj, pts, with_inside=False)
    eps = 1e-4
    for i in range(pts.shape[0]):
        g_fd = np.zeros(2)
        for k in range(2):
            dp = np.zeros(2)
            dp[k] = eps
            hi = svsdf.svsdf_query(shape, traj, pts[i:i + 1] + dp,
                                   with_inside=False).sdf[0]
            lo = svsdf.svsdf_query(shape, traj, pts[i:i + 1] - dp,
                                   with_inside=False).sdf[0]
            g_fd[k] = (float(hi) - float(lo)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(res.grad_world[i]), g_fd,
                                   atol=5e-3)


def test_deformable_gsip_inside():
    """Interior point of the swept tube of a breathing circle: the GSIP
    distance must be negative and within the tube's radius bounds."""
    shape = _breathing_circle(amp=0.3)
    traj = _straight_traj()
    p = jnp.asarray([[5.0, 0.0]])
    res = svsdf.svsdf_query(shape, traj, p, with_inside=True)
    v = float(res.sdf[0])
    assert v < 0.0
    # the tube's half-width at x=5 is in [0.7, 1.3]; GSIP radius can't
    # exceed the max radius anywhere
    assert v > -1.35


def test_kernel_rasterization_uses_kernel_scale():
    s = shapes.make_scaled_shape("Circle", lambda t: 1.0 + 0.5 * jnp.sin(t),
                                 kernel_scale=1.5)
    v = float(s.sdf_xy(jnp.asarray(3.0), jnp.asarray(0.0)))
    np.testing.assert_allclose(v, 3.0 - 1.5, rtol=1e-6)
