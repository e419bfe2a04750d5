"""Kinematic "fake drone": position commands -> perfect odometry.

Re-design of fake_drone/poscmd_2_odom
(`src/uav_simulator/fake_drone/src/poscmd_2_odom.cpp:16-60`), the
closed-loop "simulator" of every shipped demo: the drone is assumed to
track commands perfectly, and the odometry orientation is
reconstructed from the commanded acceleration + gravity and yaw.

Instead of a 100 Hz ROS callback, the whole odometry stream is one
vectorized function of the command stream (planner/traj_server.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from svsdf_tpu.planner.traj_server import CommandStream

GRAV = 9.81


class OdomStream(NamedTuple):
    t: jnp.ndarray       # (T,)
    pos: jnp.ndarray     # (T, 3)
    vel: jnp.ndarray     # (T, 3)
    quat: jnp.ndarray    # (T, 4) wxyz body->world


def odom_from_commands(cmds: CommandStream) -> OdomStream:
    """Perfect-tracking odometry (poscmd_2_odom.cpp:22-60): body z axis
    along (acc + g*e3), yaw from the command, quaternion assembled from
    the tilt + yaw decomposition."""
    acc = cmds.acc
    zb = acc + jnp.asarray([0.0, 0.0, GRAV])
    zb = zb / jnp.linalg.norm(zb, axis=-1, keepdims=True)
    z0, z1, z2 = zb[..., 0], zb[..., 1], zb[..., 2]
    # tilt quaternion (rotation taking e3 to zb), then yaw about body z
    den = jnp.sqrt(2.0 * (1.0 + z2))
    tw = 0.5 * den
    tx = -z1 / den
    ty = z0 / den
    ch = jnp.cos(0.5 * cmds.yaw)
    sh = jnp.sin(0.5 * cmds.yaw)
    quat = jnp.stack([tw * ch, tx * ch + ty * sh,
                      ty * ch - tx * sh, tw * sh], axis=-1)
    return OdomStream(cmds.t, cmds.pos, cmds.vel, quat)
