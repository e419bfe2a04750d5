"""Banded LU solver vs dense oracle, values and gradients."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from svsdf_tpu.ops import banded, minco


def _rand_banded(n, seed=0):
    rng = np.random.default_rng(seed)
    m = np.zeros((n, n))
    for i in range(n):
        lo, hi = max(0, i - banded.LBW), min(n, i + banded.UBW + 1)
        m[i, lo:hi] = rng.uniform(-1, 1, hi - lo)
    m += np.eye(n) * (banded.LBW + 2)   # diagonally dominant, no pivots
    return jnp.asarray(m)


def test_solve_matches_dense():
    n, d = 30, 3
    m = _rand_banded(n)
    rhs = jnp.asarray(np.random.default_rng(1).normal(size=(n, d)))
    x = banded.banded_solve(banded.dense_to_bands(m), rhs)
    x_ref = jnp.linalg.solve(m, rhs)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               atol=1e-10)


def test_grad_matches_dense():
    n, d = 18, 2
    m = _rand_banded(n, seed=3)
    rhs0 = jnp.asarray(np.random.default_rng(2).normal(size=(n, d)))
    bands0 = banded.dense_to_bands(m)

    def f_band(bands, rhs):
        return jnp.sum(jnp.sin(banded.banded_solve(bands, rhs)))

    def f_dense(bands, rhs):
        # rebuild dense from bands to share parameterization
        nn = bands.shape[0]
        i = jnp.arange(nn)[:, None]
        dd = jnp.arange(banded.NDIAG)[None, :]
        j = i + dd - banded.LBW
        valid = (j >= 0) & (j < nn)
        mm = jnp.zeros((nn, nn)).at[
            jnp.broadcast_to(i, j.shape)[valid], j[valid]].set(
                bands[valid])
        return jnp.sum(jnp.sin(jnp.linalg.solve(mm, rhs)))

    g1 = jax.grad(f_band, argnums=(0, 1))(bands0, rhs0)
    g2 = jax.grad(f_dense, argnums=(0, 1))(bands0, rhs0)
    # band gradient only meaningful at valid positions
    nn = bands0.shape[0]
    i = np.arange(nn)[:, None]
    dd = np.arange(banded.NDIAG)[None, :]
    j = i + dd - banded.LBW
    valid = (j >= 0) & (j < nn)
    np.testing.assert_allclose(np.asarray(g1[0])[valid],
                               np.asarray(g2[0])[valid], atol=1e-8)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                               atol=1e-8)


@pytest.mark.slow
def test_minco_banded_matches_dense():
    rng = np.random.default_rng(5)
    n = 6
    times = jnp.asarray(rng.uniform(1.0, 2.5, n))
    head = jnp.asarray(rng.normal(size=(3, 3)))
    tail = jnp.asarray(rng.normal(size=(3, 3)))
    wps = jnp.asarray(rng.normal(size=(n - 1, 3)))
    t1 = minco.solve(times, head, tail, wps)
    t2 = minco.solve_dense(times, head, tail, wps)
    np.testing.assert_allclose(np.asarray(t1.coeffs),
                               np.asarray(t2.coeffs), atol=1e-8)

    def e_band(t, w):
        return minco.energy(minco.solve(t, head, tail, w))

    def e_dense(t, w):
        return minco.energy(minco.solve_dense(t, head, tail, w))

    g1 = jax.grad(e_band, argnums=(0, 1))(times, wps)
    g2 = jax.grad(e_dense, argnums=(0, 1))(times, wps)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                               rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                               rtol=1e-7, atol=1e-8)


def test_vmap_banded():
    rng = np.random.default_rng(7)
    n = 4
    times = jnp.asarray(rng.uniform(1.0, 2.0, (5, n)))
    head = jnp.asarray(rng.normal(size=(5, 3, 3)))
    tail = jnp.asarray(rng.normal(size=(5, 3, 3)))
    wps = jnp.asarray(rng.normal(size=(5, n - 1, 3)))
    out = jax.vmap(minco.solve)(times, head, tail, wps)
    for b in range(5):
        ref = minco.solve_dense(times[b], head[b], tail[b], wps[b])
        np.testing.assert_allclose(np.asarray(out.coeffs[b]),
                                   np.asarray(ref.coeffs), atol=1e-8)


# ---------------------------------------------------------------------------
# block cyclic reduction (ops/block_cr.py) — the TPU hot-path solver
# ---------------------------------------------------------------------------

def _minco_like(n, seed):
    """A realistic MINCO system (the matrix family CR must handle)."""
    rng = np.random.default_rng(seed)
    times = jnp.asarray(rng.uniform(0.2, 5.0, n))
    head = jnp.zeros((3, 3)).at[0].set(jnp.asarray(rng.uniform(-5, 5, 3)))
    tail = jnp.zeros((3, 3)).at[0].set(jnp.asarray(rng.uniform(-5, 25, 3)))
    wps = jnp.asarray(rng.uniform(-5, 25, (max(n - 1, 1), 3))[:n - 1])
    return minco.build_bands(times, head, tail, wps), \
        minco.build_system(times, head, tail, wps)


@pytest.mark.slow
def test_cr_matches_dense_minco_family():
    from svsdf_tpu.ops import block_cr
    for n in [1, 2, 3, 4, 5, 7, 8, 9, 16, 33]:
        (bands, rhs), (m, r) = _minco_like(n, seed=n)
        x_ref = jnp.linalg.solve(m, r)
        x_cr = block_cr.banded_solve_cr(bands, rhs)
        scale = 1.0 + float(jnp.abs(x_ref).max())
        err = float(jnp.abs(x_cr - x_ref).max()) / scale
        assert err < 1e-9, (n, err)


@pytest.mark.slow
def test_cr_f32_accuracy():
    """Equilibrated CR + 1 refinement in f32 matches the sequential
    scan's accuracy class (~1e-5 relative) on planner-like systems —
    raw unequilibrated CR is off by ~1e+2 on the same family."""
    from svsdf_tpu.ops import block_cr
    for n in [4, 8, 32]:
        (bands, rhs), (m, r) = _minco_like(n, seed=100 + n)
        x64 = np.linalg.solve(np.asarray(m, np.float64),
                              np.asarray(r, np.float64))
        scale = 1.0 + np.abs(x64).max()
        b32 = jnp.asarray(bands, jnp.float32)
        r32 = jnp.asarray(rhs, jnp.float32)
        x_cr = np.asarray(block_cr.banded_solve_cr(b32, r32), np.float64)
        assert np.abs(x_cr - x64).max() / scale < 3e-5, n


def test_cr_grad_matches_scan():
    from svsdf_tpu.ops import block_cr
    rng = np.random.default_rng(7)
    n = 8
    times = jnp.asarray(rng.uniform(0.3, 3.0, n))
    head = jnp.zeros((3, 3)).at[0].set(jnp.asarray([0.0, 0.0, 0.0]))
    tail = jnp.zeros((3, 3)).at[0].set(jnp.asarray([10.0, 2.0, 1.0]))
    wps = jnp.asarray(rng.uniform(-2, 12, (n - 1, 3)))

    def loss(solver, t):
        bands, rhs = minco.build_bands(t, head, tail, wps)
        return jnp.sum(jnp.sin(solver(bands, rhs)))

    g_cr = jax.grad(lambda t: loss(block_cr.banded_solve_cr, t))(times)
    g_sc = jax.grad(lambda t: loss(banded.banded_solve, t))(times)
    np.testing.assert_allclose(np.asarray(g_cr), np.asarray(g_sc),
                               rtol=1e-6, atol=1e-8)


@pytest.mark.slow
def test_cr_vmap():
    from svsdf_tpu.ops import block_cr
    rng = np.random.default_rng(9)
    n, b = 5, 4
    times = jnp.asarray(rng.uniform(0.5, 2.0, (b, n)))
    head = jnp.zeros((b, 3, 3))
    tail = jnp.zeros((b, 3, 3)).at[:, 0, :2].set(
        jnp.asarray(rng.uniform(3, 8, (b, 2))))
    wps = jnp.asarray(rng.uniform(0, 8, (b, n - 1, 3)))

    def one(t, h, tl, w):
        bands, rhs = minco.build_bands(t, h, tl, w)
        return block_cr.banded_solve_cr(bands, rhs)

    xs = jax.vmap(one)(times, head, tail, wps)
    for i in range(b):
        x_ref = one(times[i], head[i], tail[i], wps[i])
        np.testing.assert_allclose(np.asarray(xs[i]), np.asarray(x_ref),
                                   rtol=1e-8, atol=1e-8)
