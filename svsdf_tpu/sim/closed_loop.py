"""Closed-loop flight: planned trajectory -> controller -> dynamics.

The reference wires traj_server -> so3_control -> so3_quadrotor_
simulator as three ROS processes exchanging topics at 100 Hz
(run_sdHeart.launch:22-48); here the identical loop is ONE jitted
`lax.scan` over control ticks — trajectory sampling, SO(3) control,
and RK4 dynamics fused into a single device program, `vmap`-able over
scenario fleets and differentiable end to end (e.g. for gain tuning).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from svsdf_tpu.planner import traj_server
from svsdf_tpu.sim import so3_control
from svsdf_tpu.sim.quadrotor import (QuadParams, QuadState, hover_state,
                                     step_rk4)
from svsdf_tpu.utils import trajectory as trj


class FlightLog(NamedTuple):
    t: jnp.ndarray           # (T,)
    pos: jnp.ndarray         # (T, 3) simulated positions
    ref_pos: jnp.ndarray     # (T, 3) commanded positions
    vel: jnp.ndarray         # (T, 3)
    track_err: jnp.ndarray   # (T,) |pos - ref|


def fly(traj: trj.Trajectory,
        cfg: traj_server.TrajServerConfig = traj_server.TrajServerConfig(),
        gains: so3_control.SO3Gains = so3_control.SO3Gains(),
        params: QuadParams = QuadParams(),
        substeps: int = 5) -> FlightLog:
    """Fly the planned SE(2) trajectory (x, y, yaw in z-slot) with the
    full dynamic stack at cfg.rate_hz; z is held at 0 reference."""
    cmds = traj_server.sample_commands(traj, cfg)
    # SE(2) plan: z-component of pos is YAW (SURVEY: 2.5D state) — the
    # simulated drone flies the xy path at constant altitude.
    ref_pos = cmds.pos.at[:, 2].set(0.0)
    ref_vel = cmds.vel.at[:, 2].set(0.0)
    ref_acc = cmds.acc.at[:, 2].set(0.0)
    dt = 1.0 / cfg.rate_hz
    sub_dt = dt / substeps

    s0 = hover_state(ref_pos[0])

    def tick(s: QuadState, inp):
        pd, vd, ad, yd = inp
        f, M = so3_control.control(s, pd, vd, ad, yd, gains, params)

        def sub(s2, _):
            return step_rk4(s2, f, M, sub_dt, params), None

        s, _ = jax.lax.scan(sub, s, None, length=substeps)
        return s, (s.pos, s.vel)

    _, (pos, vel) = jax.lax.scan(
        tick, s0, (ref_pos, ref_vel, ref_acc, cmds.yaw))
    err = jnp.linalg.norm(pos - ref_pos, axis=-1)
    return FlightLog(cmds.t, pos, ref_pos, vel, err)
