"""Simulation stack: kinematic fake drone, quadrotor ODE + SO(3)
controller, closed-loop tracking of a planned trajectory."""

import numpy as np
import jax
import jax.numpy as jnp

from svsdf_tpu.ops import minco
from svsdf_tpu.planner import traj_server
from svsdf_tpu.sim import closed_loop, kinematic, quadrotor, so3_control


def _line_traj(n=3, length=6.0, t_piece=2.0):
    head = jnp.array([[0.0, 0.0, 0.0], [0.0] * 3, [0.0] * 3])
    tail = jnp.array([[length, 0.0, 0.0], [0.0] * 3, [0.0] * 3])
    frac = np.linspace(0, 1, n + 1)[1:-1]
    wps = jnp.asarray(np.stack([length * frac, 0 * frac, 0 * frac], -1))
    return minco.solve(jnp.ones(n) * t_piece, head, tail, wps)


def test_kinematic_odom():
    traj = _line_traj()
    cmds = traj_server.sample_commands(traj)
    odom = kinematic.odom_from_commands(cmds)
    assert odom.pos.shape == cmds.pos.shape
    # unit quaternions
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(odom.quat), axis=-1), 1.0, atol=1e-5)
    # at rest (t=0, zero acc) orientation is yaw-only: zero tilt
    q0 = np.asarray(odom.quat[0])
    assert abs(q0[1]) < 1e-5 and abs(q0[2]) < 1e-5


def test_quadrotor_hover():
    p = quadrotor.QuadParams()
    s0 = quadrotor.hover_state((0.0, 0.0, 1.0))
    n = 200
    f = jnp.full((n,), p.mass * quadrotor.GRAV)
    M = jnp.zeros((n, 3))
    s_end, hist = quadrotor.simulate(s0, f, M, 0.01, p)
    # perfect hover: stays put
    np.testing.assert_allclose(np.asarray(s_end.pos), [0, 0, 1],
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(s_end.vel), 0, atol=1e-4)


def test_so3_controller_stabilizes():
    """From an offset + tilt, the controller should bring the quad to
    the setpoint."""
    p = quadrotor.QuadParams()
    s = quadrotor.QuadState(
        jnp.asarray([0.5, -0.3, 0.8]), jnp.zeros(3),
        jnp.asarray([0.9990, 0.0314, 0.0314, 0.0]),  # small tilt
        jnp.zeros(3))
    s = s._replace(quat=s.quat / jnp.linalg.norm(s.quat))
    tgt = jnp.asarray([0.0, 0.0, 1.0])

    def tick(s, _):
        f, M = so3_control.control(s, tgt, jnp.zeros(3), jnp.zeros(3),
                                   jnp.asarray(0.0), p=p)
        return quadrotor.step_rk4(s, f, M, 0.01, p), None

    s_end, _ = jax.lax.scan(tick, s, None, length=600)
    assert float(jnp.linalg.norm(s_end.pos - tgt)) < 0.05
    assert float(jnp.linalg.norm(s_end.vel)) < 0.05


def test_closed_loop_tracks_plan():
    traj = _line_traj(length=6.0, t_piece=2.5)
    # not jittable wholesale: the tick count comes from the concrete
    # duration (sample_commands); the scans inside are compiled.
    log = closed_loop.fly(traj)
    err = np.asarray(log.track_err)
    # transient at start is small (starts on the reference), steady
    # tracking within 15 cm for a gentle trajectory
    assert err.max() < 0.15, err.max()
    assert err[-1] < 0.05
