"""Depth-camera renderer (local_sensing parity) tests."""

import numpy as np
import jax.numpy as jnp

from svsdf_tpu.sim.depth_camera import (CameraModel, depth_to_points,
                                        render_depth,
                                        render_depth_batch,
                                        sensing_pose_from_odom)

CAM = CameraModel(fx=100.0, fy=100.0, cx=32.0, cy=24.0,
                  width=64, height=48)


def _identity_pose():
    return np.eye(3, dtype=np.float32), np.zeros(3, np.float32)


def test_single_point_lands_at_projection():
    R, t = _identity_pose()
    pts = jnp.asarray([[0.5, 0.25, 5.0]], jnp.float32)  # cam frame = world
    img = np.asarray(render_depth(pts, R, t, CAM))
    u = round(100.0 * 0.5 / 5.0 + 32.0)
    v = round(100.0 * 0.25 / 5.0 + 24.0)
    assert img[v, u] == np.float32(5.0)
    assert (img > 0).sum() == 1


def test_zbuffer_keeps_nearest():
    R, t = _identity_pose()
    pts = jnp.asarray([[0.0, 0.0, 5.0], [0.0, 0.0, 2.0]], jnp.float32)
    img = np.asarray(render_depth(pts, R, t, CAM))
    assert img[24, 32] == np.float32(2.0)


def test_behind_camera_and_out_of_frame_dropped():
    R, t = _identity_pose()
    pts = jnp.asarray([[0.0, 0.0, -3.0], [100.0, 0.0, 1.0]], jnp.float32)
    img = np.asarray(render_depth(pts, R, t, CAM))
    assert (img > 0).sum() == 0


def test_backprojection_roundtrip():
    R, t = _identity_pose()
    rng = np.random.default_rng(0)
    pts = rng.uniform([-0.5, -0.4, 2.0], [0.5, 0.4, 8.0],
                      (200, 3)).astype(np.float32)
    img = render_depth(jnp.asarray(pts), R, t, CAM)
    back = depth_to_points(img, R, t, CAM, stride=1)
    assert back.shape[0] > 100
    # every back-projected point is close to SOME input point
    d2 = ((back[:, None] - pts[None]) ** 2).sum(-1)
    assert np.sqrt(d2.min(axis=1)).max() < 0.1


def test_pose_batched_render():
    R, t = _identity_pose()
    pts = jnp.asarray([[0.0, 0.0, 4.0]], jnp.float32)
    Rb = jnp.stack([jnp.asarray(R)] * 3)
    tb = jnp.stack([jnp.asarray(t),
                    jnp.asarray([0.0, 0.0, 1.0], jnp.float32),
                    jnp.asarray([0.0, 0.0, 10.0], jnp.float32)])
    imgs = np.asarray(render_depth_batch(pts, Rb, tb, CAM))
    assert imgs.shape == (3, 48, 64)
    assert imgs[0, 24, 32] == np.float32(4.0)
    assert imgs[1, 24, 32] == np.float32(3.0)
    assert (imgs[2] > 0).sum() == 0   # behind the camera


def test_sensing_pose_looks_forward():
    R, t = sensing_pose_from_odom(np.zeros(3), yaw=0.0)
    # a world point ahead (+x) must project near the image center
    pts = jnp.asarray([[5.0, 0.0, 0.0]], jnp.float32)
    img = np.asarray(render_depth(pts, R, t, CAM))
    assert img[24, 32] == np.float32(5.0)
