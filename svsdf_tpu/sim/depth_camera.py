"""Depth-camera rendering from a global point cloud — TPU-native
re-design of the reference's only CUDA component
(`src/uav_simulator/local_sensing/src/depth_render.cu`,
`pcl_render_node.cpp:37-51,168-298`).

The CUDA kernel assigns one thread per cloud point, projects it through
the pinhole model and atomically min-updates an int millimeter z-buffer.
The XLA equivalent is a batched projection of the whole cloud followed
by a `scatter-min` into the flat image — one fused pass, no atomics,
and it `vmap`s over camera poses (the reference renders one pose per
ROS tick; a TPU renders a pose batch per dispatch).

Also provides `depth_to_points` (the depth -> local point cloud
back-projection of `pcl_render_node.cpp:234-261`) and a pose-batched
`render_depth_batch`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class CameraModel(NamedTuple):
    """Pinhole intrinsics (`pcl_render_node.cpp:48` fx,fy,cx,cy +
    width/height)."""
    fx: float = 387.0
    fy: float = 387.0
    cx: float = 321.0
    cy: float = 243.0
    width: int = 642
    height: int = 482
    max_depth: float = 500.0   # reference clamps >=500 m to empty
    min_depth: float = 0.02


def render_depth(points, R_wc, t_wc, cam: CameraModel):
    """Render one depth image.

    points: (P, 3) world cloud; R_wc, t_wc: camera-to-world rotation
    (3,3) and translation (3,) — the pose published by the simulator.
    Returns (H, W) float32 depth in meters, 0 = no return (reference
    encodes empties as 0 after clamping, `pcl_render_node.cpp:292-294`).
    """
    pts_c = (points - t_wc) @ R_wc            # world -> camera frame
    x, y, z = pts_c[:, 0], pts_c[:, 1], pts_c[:, 2]
    valid = (z > cam.min_depth) & (z < cam.max_depth)
    u = jnp.round(cam.fx * x / z + cam.cx).astype(jnp.int32)
    v = jnp.round(cam.fy * y / z + cam.cy).astype(jnp.int32)
    valid &= (u >= 0) & (u < cam.width) & (v >= 0) & (v < cam.height)
    flat = jnp.where(valid, v * cam.width + u, 0)
    z_in = jnp.where(valid, z, jnp.inf)
    buf = jnp.full((cam.height * cam.width,), jnp.inf, points.dtype)
    buf = buf.at[flat].min(z_in, mode="drop")
    img = buf.reshape(cam.height, cam.width)
    return jnp.where(jnp.isfinite(img), img, 0.0)


def render_depth_batch(points, R_wc_b, t_wc_b, cam: CameraModel):
    """vmap over a (B,) batch of camera poses — the TPU-shaped call."""
    return jax.vmap(lambda R, t: render_depth(points, R, t, cam))(
        R_wc_b, t_wc_b)


def depth_to_points(depth, R_wc, t_wc, cam: CameraModel,
                    stride: int = 2):
    """Back-project a depth image to a world point cloud — the local
    map the reference publishes (`pcl_render_node.cpp:231-261`, which
    also subsamples by 2 in u,v). Zero pixels are dropped; the output
    is host numpy (ragged size)."""
    depth = np.asarray(depth)
    vs, us = np.mgrid[0:cam.height:stride, 0:cam.width:stride]
    d = depth[::stride, ::stride].ravel()
    us, vs = us.ravel(), vs.ravel()
    keep = d > 0
    d, us, vs = d[keep], us[keep], vs[keep]
    x = (us - cam.cx) * d / cam.fx
    y = (vs - cam.cy) * d / cam.fy
    pts_c = np.stack([x, y, d], -1)
    return pts_c @ np.asarray(R_wc).T + np.asarray(t_wc)


def sensing_pose_from_odom(position, yaw, pitch_down: float = 0.0):
    """Camera pose from planar odometry: z-forward pinhole camera
    looking along the body +x axis (the reference mounts the depth
    camera forward on the drone, `pcl_render_node.cpp:264-283`).
    Returns (R_wc, t_wc)."""
    cy, sy = np.cos(yaw), np.sin(yaw)
    cp, sp = np.cos(pitch_down), np.sin(pitch_down)
    # camera axes in world frame: z = forward, x = right, y = down
    fwd = np.array([cy * cp, sy * cp, -sp])
    right = np.array([-sy, cy, 0.0])
    down = np.cross(fwd, right)
    R_wc = np.stack([right, down, fwd], axis=1)   # columns = cam axes
    return R_wc.astype(np.float32), np.asarray(position, np.float32)
