"""MINCO S3NU spline solve tests: boundary conditions, C^4 continuity,
waypoint interpolation, energy vs numerical quadrature, and gradient
sanity (autodiff through the solve replaces propogateGrad)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from svsdf_tpu.ops import minco
from svsdf_tpu.utils import trajectory as trj


def _problem(n=5, d=3, seed=0):
    rng = np.random.default_rng(seed)
    times = jnp.asarray(rng.uniform(0.8, 2.5, size=n))
    head = jnp.asarray(np.stack([rng.uniform(-5, 5, d),
                                 rng.uniform(-1, 1, d),
                                 rng.uniform(-1, 1, d)]))
    tail = jnp.asarray(np.stack([rng.uniform(-5, 5, d),
                                 rng.uniform(-1, 1, d),
                                 rng.uniform(-1, 1, d)]))
    wps = jnp.asarray(rng.uniform(-5, 5, size=(n - 1, d)))
    return times, head, tail, wps


def test_boundary_conditions():
    times, head, tail, wps = _problem()
    traj = minco.solve(times, head, tail, wps)
    t_end = float(jnp.sum(times))
    for k in range(3):
        np.testing.assert_allclose(np.asarray(trj.eval_at(traj, 0.0, k)),
                                   np.asarray(head[k]), atol=1e-8)
        np.testing.assert_allclose(
            np.asarray(trj.eval_at(traj, t_end - 1e-12, k)),
            np.asarray(tail[k]), atol=1e-7)


def test_waypoints_and_c4_continuity():
    times, head, tail, wps = _problem(n=6)
    traj = minco.solve(times, head, tail, wps)
    cum = np.cumsum(np.asarray(times))
    for i, tj in enumerate(cum[:-1]):
        # waypoint interpolation
        np.testing.assert_allclose(
            np.asarray(trj.eval_at(traj, tj - 1e-10, 0)),
            np.asarray(wps[i]), atol=1e-7)
        # derivative continuity orders 1..4 across the junction:
        # evaluate piece i at s=T_i and piece i+1 at s=0 directly.
        c_l = traj.coeffs[i]
        c_r = traj.coeffs[i + 1]
        s = times[i]
        for order in range(1, 5):
            beta_l = np.asarray(trj._basis(s, order))
            beta_r = np.asarray(trj._basis(jnp.zeros(()), order))
            left = beta_l @ np.asarray(c_l)
            right = beta_r @ np.asarray(c_r)
            np.testing.assert_allclose(left, right, atol=1e-6,
                                       err_msg=f"order {order} junction {i}")


def test_energy_matches_quadrature():
    times, head, tail, wps = _problem(n=4)
    traj = minco.solve(times, head, tail, wps)
    e = float(minco.energy(traj))
    # numerical integral of |jerk|^2
    t_end = float(jnp.sum(times))
    ts = jnp.linspace(0.0, t_end - 1e-9, 20001)
    j = trj.eval_at(traj, ts, 3)
    e_num = float(jnp.trapezoid(jnp.sum(j * j, -1), ts))
    np.testing.assert_allclose(e, e_num, rtol=1e-5)


def test_min_jerk_straight_line():
    """With zero vel/acc boundary and collinear waypoints on a straight
    line, the optimal-energy trajectory stays near the segment."""
    n = 3
    times = jnp.ones(n) * 2.0
    head = jnp.array([[0.0, 0.0, 0.0], [0.0] * 3, [0.0] * 3])
    tail = jnp.array([[3.0, 0.0, 0.0], [0.0] * 3, [0.0] * 3])
    wps = jnp.array([[1.0, 0.0, 0.0], [2.0, 0.0, 0.0]])
    traj = minco.solve(times, head, tail, wps)
    ts = jnp.linspace(0, 6.0 - 1e-9, 101)
    p = np.asarray(trj.eval_at(traj, ts, 0))
    assert np.abs(p[:, 1]).max() < 1e-8
    assert p[:, 0].min() > -1e-6 and p[:, 0].max() < 3.0 + 1e-6


def test_grad_through_solve():
    """jax.grad of energy w.r.t. (waypoints, times) is finite and matches
    finite differences (replaces getEnergyPartialGrad* + propogateGrad,
    minco.hpp:556-656)."""
    times, head, tail, wps = _problem(n=4)

    def f(t, w):
        return minco.energy(minco.solve(t, head, tail, w))

    g_t, g_w = jax.grad(f, argnums=(0, 1))(times, wps)
    eps = 1e-6
    for i in range(len(times)):
        tp = times.at[i].add(eps)
        tm = times.at[i].add(-eps)
        fd = (f(tp, wps) - f(tm, wps)) / (2 * eps)
        np.testing.assert_allclose(float(g_t[i]), float(fd), rtol=2e-4,
                                   atol=1e-5)
    wp = wps.at[0, 0].add(eps)
    wm = wps.at[0, 0].add(-eps)
    fd = (f(times, wp) - f(times, wm)) / (2 * eps)
    np.testing.assert_allclose(float(g_w[0, 0]), float(fd), rtol=2e-4)


def test_vmap_batch():
    probs = [_problem(n=4, seed=s) for s in range(3)]
    times = jnp.stack([p[0] for p in probs])
    head = jnp.stack([p[1] for p in probs])
    tail = jnp.stack([p[2] for p in probs])
    wps = jnp.stack([p[3] for p in probs])
    batched = jax.vmap(minco.solve)(times, head, tail, wps)
    for b in range(3):
        single = minco.solve(times[b], head[b], tail[b], wps[b])
        np.testing.assert_allclose(np.asarray(batched.coeffs[b]),
                                   np.asarray(single.coeffs), atol=1e-9)


@pytest.mark.slow
def test_eval_dense_matches_gather():
    """The dense one-hot eval path must match the gather path exactly,
    including out-of-range clamping and duration gradients."""
    times, head, tail, wps = _problem(n=5, seed=9)
    traj = minco.solve(times, head, tail, wps)
    total = float(jnp.sum(times))
    ts = jnp.asarray(np.r_[np.linspace(-0.5, total + 0.5, 97),
                           np.cumsum(np.asarray(times))])
    for order in range(5):
        a = trj.eval_at(traj, ts, order)
        b = trj.eval_at_gather(traj, ts, order)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-9, err_msg=f"order {order}")

    def f_dense(T):
        tr = minco.solve(T, head, tail, wps)
        return jnp.sum(trj.eval_at(tr, ts, 0) ** 2)

    def f_gather(T):
        tr = minco.solve(T, head, tail, wps)
        return jnp.sum(trj.eval_at_gather(tr, ts, 0) ** 2)

    g1 = jax.grad(f_dense)(times)
    g2 = jax.grad(f_gather)(times)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-7)


@pytest.mark.slow
def test_minco_general_family():
    """S2/S3/S4 via the general solver: boundary + waypoint interpolation
    and continuity (minco.hpp MINCO_S2NU:201 / S3NU:397 / S4NU:658)."""
    import numpy as np
    import jax.numpy as jnp
    from svsdf_tpu.ops import minco
    from svsdf_tpu.utils import trajectory as trj

    n = 4
    rng = np.random.default_rng(3)
    times = jnp.asarray(rng.uniform(1.0, 2.0, n))
    wps = jnp.asarray(rng.normal(0, 2, (n - 1, 3)))
    for s in (2, 3, 4):
        head = jnp.zeros((s, 3)).at[0].set(jnp.asarray([0.0, 0.0, 0.0]))
        tail = jnp.zeros((s, 3)).at[0].set(jnp.asarray([5.0, 1.0, 0.5]))
        traj = minco.solve_s(s, times, head, tail, wps)
        assert traj.coeffs.shape == (n, 2 * s, 3)
        # boundary interpolation
        np.testing.assert_allclose(np.asarray(trj.pos(traj, 0.0)),
                                   np.asarray(head[0]), atol=1e-8)
        tot = float(traj.total_duration)
        np.testing.assert_allclose(np.asarray(trj.pos(traj, tot)),
                                   np.asarray(tail[0]), atol=1e-7)
        # waypoint interpolation
        tcum = np.cumsum(np.asarray(times))
        for j in range(n - 1):
            np.testing.assert_allclose(
                np.asarray(trj.pos(traj, tcum[j])), np.asarray(wps[j]),
                atol=1e-7)
        # C^{2s-2} continuity at junctions
        for j in range(n - 1):
            for o in range(2 * s - 1):
                a = np.asarray(trj.eval_at(traj, jnp.asarray(
                    [tcum[j] - 1e-7]), o))[0]
                b = np.asarray(trj.eval_at(traj, jnp.asarray(
                    [tcum[j] + 1e-7]), o))[0]
                np.testing.assert_allclose(a, b, atol=1e-3 * 10 ** o)
        # energy positive, zero for a straight constant-velocity line
        e = float(minco.energy_s(traj, s))
        assert e >= -1e-9


def test_minco_s3_matches_general():
    import numpy as np
    import jax.numpy as jnp
    from svsdf_tpu.ops import minco

    n = 5
    rng = np.random.default_rng(0)
    times = jnp.asarray(rng.uniform(0.8, 2.5, n))
    head = jnp.asarray(rng.normal(0, 1, (3, 3)))
    tail = jnp.asarray(rng.normal(0, 1, (3, 3)))
    wps = jnp.asarray(rng.normal(0, 2, (n - 1, 3)))
    a = minco.solve(times, head, tail, wps)
    b = minco.solve_s(3, times, head, tail, wps)
    np.testing.assert_allclose(np.asarray(a.coeffs),
                               np.asarray(b.coeffs), atol=1e-6)
    np.testing.assert_allclose(float(minco.energy(a)),
                               float(minco.energy_s(b, 3)), rtol=1e-8)


def test_max_rate_exact():
    """Closed-form check: 1-D cubic with known max velocity."""
    import numpy as np
    import jax.numpy as jnp
    from svsdf_tpu.utils import trajectory as trj

    # p(t) = t^2 (2 - t) on [0, 1]: v = 4t - 3t^2 has its interior
    # max at t=2/3 -> 4/3 (v(0)=0, v(1)=1)
    coeffs = np.zeros((1, 6, 3))
    coeffs[0, 2, 0] = 2.0
    coeffs[0, 3, 0] = -1.0
    traj = trj.Trajectory(jnp.asarray(coeffs), jnp.asarray([1.0]))
    v = trj.max_vel_rate(traj, dims=(0,))
    np.testing.assert_allclose(v, 4.0 / 3.0, rtol=1e-9)
    # acceleration: a = 4 - 6t, endpoint max |a(0)| = 4
    a = trj.max_acc_rate(traj, dims=(0,))
    np.testing.assert_allclose(a, 4.0, rtol=1e-9)


def test_normalized_solve_matches_dense_oracle():
    """The normalized-time assembly (ops/minco.py _index_plan_norm)
    must reproduce the dense x64 oracle exactly — same spline, just a
    better-conditioned linear system."""
    import numpy as np
    import jax.numpy as jnp
    from svsdf_tpu.ops import minco

    rng = np.random.default_rng(5)
    n = 12
    times = jnp.asarray(rng.uniform(0.8, 5.0, n))
    head = jnp.asarray(rng.normal(0, 1, (3, 3)))
    tail = jnp.asarray(rng.normal(0, 1, (3, 3)))
    wps = jnp.asarray(rng.normal(0, 5, (n - 1, 3)))
    got = minco.solve(times, head, tail, wps)
    want = minco.solve_dense(times, head, tail, wps)
    np.testing.assert_allclose(np.asarray(got.coeffs),
                               np.asarray(want.coeffs),
                               rtol=1e-8, atol=1e-8)


def test_normalized_solve_f32_holds_boundary_conditions():
    """Round-3 regression: the raw f32 quintic system's conditioning
    (~(T^5)^2 entry spread) left solved trajectories missing their own
    pinned endpoints by up to 0.36 m on TPU scenario runs. The
    normalized-time solve must hold the tail to ~1e-3 m in f32."""
    import numpy as np
    import jax.numpy as jnp
    from svsdf_tpu.ops import minco
    from svsdf_tpu.utils import trajectory as trj

    rng = np.random.default_rng(7)
    n = 24
    times = jnp.asarray(rng.uniform(1.0, 4.5, n).astype(np.float32))
    head = jnp.zeros((3, 3), jnp.float32).at[0].set(
        jnp.asarray([25.5, 2.4, 0.0]))
    tail = jnp.zeros((3, 3), jnp.float32).at[0].set(
        jnp.asarray([6.3, 63.9, 2.4]))
    wps = jnp.asarray(
        (np.linspace([25.5, 2.4, 0], [6.3, 63.9, 2.4], n + 1)[1:-1]
         + rng.normal(0, 0.5, (n - 1, 3))).astype(np.float32))
    traj = minco.solve(times, head, tail, wps)
    total = float(np.asarray(times, np.float64).sum())
    p0 = np.asarray(trj.pos(traj, jnp.float32(0.0)))
    pT = np.asarray(trj.pos(traj, jnp.float32(total - 1e-5)))
    assert np.linalg.norm(p0[:2] - [25.5, 2.4]) < 1e-3, p0
    assert np.linalg.norm(pT[:2] - [6.3, 63.9]) < 1e-2, pT
    # the raw assembly shows the failure this guards against: its f32
    # endpoint error on the same system is orders of magnitude worse
    raw = minco.solve_raw(times, head, tail, wps)
    pT_raw = np.asarray(trj.pos(raw, jnp.float32(total - 1e-5)))
    err_raw = np.linalg.norm(pT_raw[:2] - [6.3, 63.9])
    err_norm = np.linalg.norm(pT[:2] - [6.3, 63.9])
    assert err_norm <= err_raw + 1e-6, (err_norm, err_raw)
