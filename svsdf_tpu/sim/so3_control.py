"""Geometric SO(3) position/attitude controller.

Re-design of so3_control
(`src/uav_simulator/so3_control/include/so3_control/SO3Control.h:6` +
`src/SO3Control.cpp`): the standard Lee geometric controller — PD on
position/velocity error giving a desired force, desired attitude from
the force direction + commanded yaw, then PD on the SO(3) attitude
error (eR = 0.5 vee(Rd^T R - R^T Rd)) for torque. Pure function;
`vmap` over a fleet.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from svsdf_tpu.sim.quadrotor import GRAV, QuadParams, QuadState, quat_to_rot


@dataclasses.dataclass(frozen=True)
class SO3Gains:
    """Gain defaults mirror so3_control's config (gains.launch)."""
    kx: tuple = (5.7, 5.7, 6.2)
    kv: tuple = (3.4, 3.4, 4.0)
    kr: tuple = (1.5, 1.5, 1.0)
    kw: tuple = (0.13, 0.13, 0.1)


def _vee(m):
    return jnp.stack([m[..., 2, 1] - m[..., 1, 2],
                      m[..., 0, 2] - m[..., 2, 0],
                      m[..., 1, 0] - m[..., 0, 1]], -1) * 0.5


def control(state: QuadState, pos_des, vel_des, acc_des, yaw_des,
            gains: SO3Gains = SO3Gains(),
            p: QuadParams = QuadParams()):
    """One control tick: desired (pos, vel, acc, yaw) -> (thrust f,
    body torque M) for sim/quadrotor.step_rk4 (SO3Control.cpp
    calculateControl)."""
    kx = jnp.asarray(gains.kx)
    kv = jnp.asarray(gains.kv)
    e3 = jnp.asarray([0.0, 0.0, 1.0])
    force = (p.mass * (acc_des + GRAV * e3)
             + p.mass * kx * (pos_des - state.pos)
             + p.mass * kv * (vel_des - state.vel))
    R = quat_to_rot(state.quat)
    f = jnp.sum(force * R[..., :, 2], axis=-1)

    # desired frame: b3 along force, b1 from yaw
    b3 = force / jnp.maximum(jnp.linalg.norm(force, axis=-1,
                                             keepdims=True), 1e-6)
    c1 = jnp.stack([jnp.cos(yaw_des), jnp.sin(yaw_des),
                    jnp.zeros_like(yaw_des)], -1)
    b2 = jnp.cross(b3, c1)
    b2 = b2 / jnp.maximum(jnp.linalg.norm(b2, axis=-1, keepdims=True),
                          1e-6)
    b1 = jnp.cross(b2, b3)
    Rd = jnp.stack([b1, b2, b3], axis=-1)

    eR = _vee(jnp.swapaxes(Rd, -1, -2) @ R - jnp.swapaxes(R, -1, -2) @ Rd)
    eW = state.omega            # omega_des = 0 (SO3Control.cpp)
    J = jnp.asarray(p.inertia)
    M = (-jnp.asarray(gains.kr) * eR - jnp.asarray(gains.kw) * eW
         + jnp.cross(state.omega, J * state.omega))
    return f, M
