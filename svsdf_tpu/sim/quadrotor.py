"""Rigid-body quadrotor dynamics, RK4-integrated under lax.scan.

Re-design of so3_quadrotor_simulator
(`src/uav_simulator/so3_quadrotor_simulator/include/quadrotor_simulator/
Quadrotor.h:10` + `src/quadrotor_simulator_so3.cpp`): the reference
integrates a boost.odeint ODE per 100 Hz ROS tick in its own process;
here the full rollout is one `lax.scan` of fixed RK4 substeps — pure,
jittable, `vmap`-able over fleets of drones, differentiable through
the whole flight.

State: (pos (3,), vel (3,), quat (4,) wxyz body->world, omega (3,)
body rates). Inputs: collective thrust f (N) along body z and body
torque M (3,) — the interface so3_control produces.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

GRAV = 9.81


@dataclasses.dataclass(frozen=True)
class QuadParams:
    """Defaults mirror the reference's simulator config
    (so3_quadrotor_simulator/config + Quadrotor.h defaults)."""
    mass: float = 0.98
    inertia: tuple = (2.64e-3, 2.64e-3, 4.96e-3)   # diagonal J
    drag: float = 0.10                              # linear drag coeff
    f_max: float = 4.0 * 6.0                        # 4 motors x 6 N
    m_max: float = 1.0                              # torque clamp


class QuadState(NamedTuple):
    pos: jnp.ndarray
    vel: jnp.ndarray
    quat: jnp.ndarray
    omega: jnp.ndarray


def hover_state(pos=(0.0, 0.0, 0.0)) -> QuadState:
    # default float dtype (f32 in production, f64 under the x64 tests)
    pos = jnp.asarray(pos) * 1.0
    return QuadState(pos, jnp.zeros(3, pos.dtype),
                     jnp.asarray([1.0, 0.0, 0.0, 0.0], pos.dtype),
                     jnp.zeros(3, pos.dtype))


def quat_to_rot(q):
    """(…, 4) wxyz -> (…, 3, 3) body->world."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                   2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                   2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                   1 - 2 * (x * x + y * y)], -1),
    ], axis=-2)


def _deriv(s: QuadState, f, M, p: QuadParams):
    R = quat_to_rot(s.quat)
    e3 = jnp.asarray([0.0, 0.0, 1.0])
    thrust_w = R[..., :, 2] * f / p.mass
    dvel = thrust_w - GRAV * e3 - p.drag / p.mass * s.vel
    w, x, y, z = (s.quat[..., 0], s.quat[..., 1], s.quat[..., 2],
                  s.quat[..., 3])
    ox, oy, oz = s.omega[..., 0], s.omega[..., 1], s.omega[..., 2]
    dquat = 0.5 * jnp.stack([
        -x * ox - y * oy - z * oz,
        w * ox + y * oz - z * oy,
        w * oy - x * oz + z * ox,
        w * oz + x * oy - y * ox], axis=-1)
    J = jnp.asarray(p.inertia)
    domega = (M - jnp.cross(s.omega, J * s.omega)) / J
    return QuadState(s.vel, dvel, dquat, domega)


def step_rk4(s: QuadState, f, M, dt, p: QuadParams) -> QuadState:
    f = jnp.clip(f, 0.0, p.f_max)
    M = jnp.clip(M, -p.m_max, p.m_max)

    def add(a: QuadState, b: QuadState, h):
        return QuadState(a.pos + h * b.pos, a.vel + h * b.vel,
                         a.quat + h * b.quat, a.omega + h * b.omega)

    k1 = _deriv(s, f, M, p)
    k2 = _deriv(add(s, k1, dt / 2), f, M, p)
    k3 = _deriv(add(s, k2, dt / 2), f, M, p)
    k4 = _deriv(add(s, k3, dt), f, M, p)
    out = QuadState(
        s.pos + dt / 6 * (k1.pos + 2 * k2.pos + 2 * k3.pos + k4.pos),
        s.vel + dt / 6 * (k1.vel + 2 * k2.vel + 2 * k3.vel + k4.vel),
        s.quat + dt / 6 * (k1.quat + 2 * k2.quat + 2 * k3.quat + k4.quat),
        s.omega + dt / 6 * (k1.omega + 2 * k2.omega + 2 * k3.omega
                            + k4.omega))
    q = out.quat / jnp.linalg.norm(out.quat, axis=-1, keepdims=True)
    return out._replace(quat=q)


def simulate(s0: QuadState, f_seq, M_seq, dt,
             p: QuadParams = QuadParams()):
    """Roll out T control ticks: f_seq (T,), M_seq (T, 3). Returns the
    final state and the full QuadState history stacked over T."""
    def body(s, u):
        f, M = u
        s2 = step_rk4(s, f, M, dt, p)
        return s2, s2

    return jax.lax.scan(body, s0, (f_seq, M_seq))
