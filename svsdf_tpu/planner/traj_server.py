"""Trajectory server: optimized spline -> rate-limited position commands.

Re-design of the traj_server node
(`src/plan_manager/src/traj_server.cpp:38-336`): samples the quintic
trajectory at a fixed command rate into (pos, vel, acc, jerk, yaw,
yaw_rate) commands with the reference's look-ahead yaw plus
acceleration/rate limiting (calculate_yaw, traj_server.cpp:77-136) and
the heartbeat watchdog semantics (hold position after `watchdog_s` of
planner silence, traj_server.cpp:178-184).

The whole command stream is computed as one batched device sample
(positions/derivatives for every tick at once); the yaw rate limiting
is an inherently sequential recurrence and runs as a lax.scan.
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from svsdf_tpu.utils import trajectory as trj

PI = math.pi


@dataclasses.dataclass(frozen=True)
class TrajServerConfig:
    rate_hz: float = 100.0            # cmdCallback timer rate
    time_forward: float = 1.0         # yaw look-ahead horizon
    yaw_dot_max: float = 2.0 * PI     # YAW_DOT_MAX_PER_SEC
    yaw_ddot_max: float = 5.0 * PI    # YAW_DOT_DOT_MAX_PER_SEC
    watchdog_s: float = 0.5           # heartbeat hold threshold


class CommandStream(NamedTuple):
    t: jnp.ndarray          # (T,)
    pos: jnp.ndarray        # (T, 3)
    vel: jnp.ndarray        # (T, 3)
    acc: jnp.ndarray        # (T, 3)
    jerk: jnp.ndarray       # (T, 3)
    yaw: jnp.ndarray        # (T,)
    yaw_rate: jnp.ndarray   # (T,)


def _wrap(a):
    return (a + PI) % (2.0 * PI) - PI


def sample_commands(traj: trj.Trajectory,
                    cfg: TrajServerConfig = TrajServerConfig()
                    ) -> CommandStream:
    """Sample the full command stream for the trajectory duration."""
    total = traj.total_duration
    dt = 1.0 / cfg.rate_hz
    n_steps = int(jax.lax.stop_gradient(total) / dt) + 1
    ts = jnp.arange(n_steps) * dt
    ts = jnp.minimum(ts, total)
    pos = trj.eval_at(traj, ts, 0)
    vel = trj.eval_at(traj, ts, 1)
    acc = trj.eval_at(traj, ts, 2)
    jerk = trj.eval_at(traj, ts, 3)

    # look-ahead yaw target (traj_server.cpp:84-89)
    ahead = jnp.minimum(ts + cfg.time_forward, total)
    dir_ = trj.eval_at(traj, ahead, 0)[:, :2] - pos[:, :2]
    dir_norm = jnp.linalg.norm(dir_, axis=-1)
    yaw_tgt = jnp.arctan2(dir_[:, 1], dir_[:, 0])

    def step(carry, inp):
        last_yaw, last_yd = carry
        tgt, ok = inp
        tgt = jnp.where(ok, tgt, last_yaw)
        d = _wrap(tgt - last_yaw)
        ydm = jnp.where(d >= 0, cfg.yaw_dot_max, -cfg.yaw_dot_max)
        yddm = jnp.where(d >= 0, cfg.yaw_ddot_max, -cfg.yaw_ddot_max)
        # accel-limited max change this tick (traj_server.cpp:105-116)
        can_accel = jnp.abs(last_yd + dt * yddm) <= jnp.abs(ydm)
        d_max_a = last_yd * dt + 0.5 * yddm * dt * dt
        t1 = (ydm - last_yd) / yddm
        d_max_b = ((dt - t1) + dt) * (ydm - last_yd) / 2.0
        d_max = jnp.where(can_accel, d_max_a, d_max_b)
        d = jnp.where(jnp.abs(d) > jnp.abs(d_max), d_max, d)
        yd = d / dt
        yaw = _wrap(last_yaw + d)
        return (yaw, yd), (yaw, yd)

    ok = dir_norm > 0.1
    (_, _), (yaw, yaw_rate) = jax.lax.scan(
        step, (yaw_tgt[0] * 0.0, jnp.asarray(0.0, pos.dtype)),
        (yaw_tgt, ok))
    return CommandStream(ts, pos, vel, acc, jerk, yaw, yaw_rate)


def hold_command(last_pos):
    """Watchdog hold-position command (traj_server.cpp:178-184)."""
    z = jnp.zeros_like(last_pos)
    return last_pos, z, z
