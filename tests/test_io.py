"""Wire-format round trips (traj_utils / quadrotor_msgs parity)."""

import numpy as np
import jax.numpy as jnp
import pytest

from svsdf_tpu.io import (PolyTraj, decode_minco_traj, decode_poly_traj,
                          encode_minco_traj, encode_poly_traj)
from svsdf_tpu.ops import minco
from svsdf_tpu.utils import trajectory as trj


def _traj(n=4, dim=3, seed=0):
    rng = np.random.default_rng(seed)
    head = np.zeros((3, 3), np.float32)
    tail = np.zeros((3, 3), np.float32)
    tail[0] = [8.0, 1.0, 0.5]
    wps = rng.normal(0, 1, (n - 1, 3)).astype(np.float32)
    wps[:, 0] = np.linspace(2, 6, n - 1)
    times = np.full((n,), 1.2, np.float32)
    return minco.solve(jnp.asarray(times), jnp.asarray(head),
                       jnp.asarray(tail), jnp.asarray(wps))


def test_polytraj_roundtrip():
    traj = _traj()
    msg = encode_poly_traj(traj, drone_id=3, traj_id=7, start_time=1.5)
    assert msg.order == 5
    assert len(msg.coef_x) == traj.num_pieces * 6
    back = decode_poly_traj(msg)
    ts = np.linspace(0, float(traj.total_duration), 50)
    for order in (0, 1, 2, 3):
        a = np.asarray(trj.eval_at(traj, jnp.asarray(ts), order))
        b = np.asarray(trj.eval_at(back, jnp.asarray(ts), order))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_polytraj_json_roundtrip():
    traj = _traj(seed=1)
    msg = encode_poly_traj(traj)
    msg2 = PolyTraj.from_json(msg.to_json())
    np.testing.assert_allclose(msg.coef_x, msg2.coef_x)
    np.testing.assert_allclose(msg.duration, msg2.duration)
    back = decode_poly_traj(msg2)
    np.testing.assert_allclose(np.asarray(back.durations),
                               np.asarray(traj.durations), rtol=1e-6)


def test_polytraj_rejects_bad_order():
    traj = _traj()
    msg = encode_poly_traj(traj)._replace(order=4)
    with pytest.raises(ValueError):
        decode_poly_traj(msg)


def test_polytraj_rejects_inconsistent_lengths():
    traj = _traj()
    msg = encode_poly_traj(traj)
    msg = msg._replace(coef_x=msg.coef_x[:-1])
    with pytest.raises(ValueError):
        decode_poly_traj(msg)


def test_minco_traj_roundtrip():
    rng = np.random.default_rng(2)
    n = 5
    head = np.zeros((3, 3), np.float32)
    tail = np.zeros((3, 3), np.float32)
    tail[0] = [10.0, -1.0, 0.3]
    wps = rng.normal(0, 1, (n - 1, 3)).astype(np.float32)
    times = np.linspace(1.0, 2.0, n).astype(np.float32)
    traj = minco.solve(jnp.asarray(times), jnp.asarray(head),
                       jnp.asarray(tail), jnp.asarray(wps))
    msg = encode_minco_traj(times, head, tail, wps)
    back = decode_minco_traj(MincoRoundTrip(msg))
    ts = np.linspace(0, float(traj.total_duration), 40)
    a = np.asarray(trj.eval_at(traj, jnp.asarray(ts), 0))
    b = np.asarray(trj.eval_at(back, jnp.asarray(ts), 0))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def MincoRoundTrip(msg):
    """dict -> object round trip, exercising serialization."""
    from svsdf_tpu.io import MincoTraj
    return MincoTraj.from_dict(msg.to_dict())
