"""LMBM solver on classic nonsmooth test problems (the problem set
LMBM was published against: MAXQ, MXHILB, chained LQ...)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from svsdf_tpu.utils import lmbm


def _vg(f):
    return jax.value_and_grad(f)


def test_smooth_quadratic():
    A = jnp.diag(jnp.asarray([1.0, 4.0, 9.0, 16.0]))

    def f(x):
        return 0.5 * x @ A @ x

    res = lmbm.minimize(_vg(f), jnp.asarray([1.0, -2.0, 3.0, -4.0]),
                        lmbm.LMBMParams(max_iterations=200))
    assert float(res.f) < 1e-6


def test_maxq():
    """MAXQ: f = max_i x_i^2, n=10, f* = 0 (nonsmooth at optimum)."""
    def f(x):
        return jnp.max(x ** 2)

    x0 = jnp.asarray(np.concatenate([np.arange(1.0, 6.0),
                                     -np.arange(6.0, 11.0)]),
                     jnp.float32)
    res = lmbm.minimize(_vg(f), x0,
                        lmbm.LMBMParams(max_iterations=400, eps=1e-8))
    assert float(res.f) < 1e-3


def test_mxhilb():
    """MXHILB: f = max_i |sum_j x_j / (i+j-1)|, f* = 0."""
    n = 10
    i = np.arange(1, n + 1)
    H = 1.0 / (i[:, None] + i[None, :] - 1.0)
    Hj = jnp.asarray(H, jnp.float32)

    def f(x):
        return jnp.max(jnp.abs(Hj @ x))

    res = lmbm.minimize(_vg(f), jnp.ones((n,), jnp.float32),
                        lmbm.LMBMParams(max_iterations=400, eps=1e-10))
    assert float(res.f) < 5e-3


def test_chained_lq():
    """Chained LQ: f = sum -x_i - x_{i+1} + max(x_i^2 + x_{i+1}^2 - 1, 0)
    via max of two branches; f* = -(n-1) sqrt(2) at x = 1/sqrt(2)."""
    n = 6

    def f(x):
        a = -x[:-1] - x[1:]
        b = a + (x[:-1] ** 2 + x[1:] ** 2 - 1.0)
        return jnp.sum(jnp.maximum(a, b))

    x0 = jnp.full((n,), -0.5, jnp.float32)
    res = lmbm.minimize(_vg(f), x0,
                        lmbm.LMBMParams(max_iterations=500, eps=1e-10))
    fstar = -(n - 1) * np.sqrt(2.0)
    assert float(res.f) < fstar + 2e-2


def test_l1_norm_kink():
    """f = ||x||_1 — subdifferential everywhere, f* = 0 at the kink."""
    def f(x):
        return jnp.sum(jnp.abs(x))

    res = lmbm.minimize(_vg(f), jnp.asarray([0.7, -1.3, 0.2]),
                        lmbm.LMBMParams(max_iterations=300, eps=1e-10))
    assert float(res.f) < 5e-3


def test_batched_vmap():
    def f(x):
        return jnp.max(x ** 2)

    x0 = jnp.asarray(np.random.default_rng(0).normal(
        0, 2, (8, 5)), jnp.float32)
    res = lmbm.minimize_batched(_vg(f), x0,
                                lmbm.LMBMParams(max_iterations=300))
    assert np.asarray(res.f).max() < 1e-2


def test_simplex_qp3_vertices_and_interior():
    # G = I, b = 0 -> interior uniform
    lam = lmbm._simplex_qp3(jnp.eye(3), jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(lam), np.ones(3) / 3,
                               atol=1e-5)
    # huge penalty on components 2,3 -> vertex e1
    lam = lmbm._simplex_qp3(jnp.eye(3), jnp.asarray([0.0, 10.0, 10.0]))
    np.testing.assert_allclose(np.asarray(lam), [1.0, 0.0, 0.0],
                               atol=1e-5)


@pytest.mark.parametrize("rho", [0.1, 1.0])
def test_matches_reference_solver_on_svsdf_like_hinge(rho):
    """A miniature of the back-end cost shape: smooth energy + hinge
    penalties. LMBM should reach the same basin as scipy-free L-BFGS
    (utils/lbfgs.py)."""
    from svsdf_tpu.utils import lbfgs

    rng = np.random.default_rng(1)
    A = jnp.asarray(rng.normal(0, 1, (6, 6)).astype(np.float32))
    Q = A @ A.T / 6 + jnp.eye(6)
    c = jnp.asarray(rng.normal(0, 1, (4, 6)).astype(np.float32))

    def f(x):
        return (0.5 * x @ Q @ x
                + rho * jnp.sum(jnp.maximum(c @ x + 0.3, 0.0)))

    x0 = jnp.asarray(rng.normal(0, 2, (6,)).astype(np.float32))
    r1 = lmbm.minimize(_vg(f), x0, lmbm.LMBMParams(max_iterations=400))
    r2 = lbfgs.minimize(_vg(f), x0,
                        lbfgs.LBFGSParams(max_iterations=400))
    assert float(r1.f) < float(r2.f) + 1e-2
