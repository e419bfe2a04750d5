"""L-BFGS (weak-Wolfe / nonsmooth) solver tests: smooth classics,
nonsmooth L1-type objectives (the SVSDF cost class), and batching."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from svsdf_tpu.utils import lbfgs


def _fun(f):
    return jax.value_and_grad(f)


def test_quadratic():
    A = jnp.array([[3.0, 1.0], [1.0, 2.0]])
    b = jnp.array([1.0, -2.0])

    def f(x):
        return 0.5 * x @ A @ x - b @ x

    res = lbfgs.minimize(_fun(f), jnp.zeros(2),
                         lbfgs.LBFGSParams(max_iterations=100))
    x_star = jnp.linalg.solve(A, b)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_star),
                               atol=1e-6)


def test_rosenbrock():
    def f(x):
        return (1 - x[0]) ** 2 + 100.0 * (x[1] - x[0] ** 2) ** 2

    res = lbfgs.minimize(_fun(f), jnp.array([-1.2, 1.0]),
                         lbfgs.LBFGSParams(max_iterations=300,
                                           g_epsilon=1e-10, delta=0.0))
    np.testing.assert_allclose(np.asarray(res.x), [1.0, 1.0], atol=1e-5)


def test_nonsmooth_l1():
    """min |x-3| + |y+1| + 0.01*(x^2+y^2): kink at the optimum —
    exactly the failure mode LMBM exists for."""
    def f(x):
        return (jnp.abs(x[0] - 3.0) + jnp.abs(x[1] + 1.0)
                + 0.01 * jnp.sum(x * x))

    res = lbfgs.minimize(_fun(f), jnp.array([10.0, 10.0]),
                         lbfgs.LBFGSParams(max_iterations=500,
                                           g_epsilon=0.0, delta=1e-14))
    np.testing.assert_allclose(np.asarray(res.x), [3.0, -1.0], atol=5e-2)


def test_smoothed_hinge_sum():
    """Sum of smoothed-L1 hinges (the actual SVSDF penalty smoother)."""
    from svsdf_tpu.utils.transforms import smoothed_l1

    targets = jnp.linspace(-2.0, 2.0, 8)

    def f(x):
        return jnp.sum(smoothed_l1(targets - x[0], 1e-2)) + 0.05 * x[0] ** 2

    res = lbfgs.minimize(_fun(f), jnp.array([-5.0]),
                         lbfgs.LBFGSParams(max_iterations=200))
    # optimum balances hinge slope (count above x) against 0.1 x
    assert 1.0 < float(res.x[0]) < 2.2


def test_batched():
    def f(x):
        return jnp.sum((x - jnp.array([2.0, -1.0])) ** 2)

    x0 = jnp.stack([jnp.zeros(2), jnp.ones(2) * 5, -jnp.ones(2) * 3])
    res = lbfgs.minimize_batched(_fun(f), x0,
                                 lbfgs.LBFGSParams(max_iterations=100))
    for b in range(3):
        np.testing.assert_allclose(np.asarray(res.x[b]), [2.0, -1.0],
                                   atol=1e-5)


def test_jittable():
    def f(x):
        return jnp.sum(x ** 2)

    run = jax.jit(lambda x0: lbfgs.minimize(_fun(f), x0).x)
    np.testing.assert_allclose(np.asarray(run(jnp.ones(4))),
                               np.zeros(4), atol=1e-6)


def test_minimize_scheduled_stage_jumping():
    """minimize_scheduled: the objective switches targets at the stage
    bounds; early convergence in a stage must JUMP to the next stage
    (not exit), and the final iterate must track the LAST stage's
    target. Also: the traced n_iters budget is respected."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from svsdf_tpu.utils import lbfgs

    targets = jnp.asarray([0.0, 3.0, -2.0])
    bounds = jnp.asarray([20, 40])

    def fun(x, it):
        stage = jnp.sum(it >= bounds)
        c = targets[stage]
        f = jnp.sum((x - c) ** 2)
        return f, 2.0 * (x - c)

    p = lbfgs.LBFGSParams(mem_size=4, max_iterations=128,
                          g_epsilon=1e-10, delta=0.0)
    res = lbfgs.minimize_scheduled(fun, jnp.asarray([10.0, -7.0]), p,
                                   n_iters=jnp.asarray(60),
                                   stage_bounds=bounds)
    np.testing.assert_allclose(np.asarray(res.x), [-2.0, -2.0],
                               atol=1e-4)
    # quadratic converges in ~2 iterations per stage; the jumps mean
    # total iterations stay far below the 60 budget
    assert int(res.n_iters) <= 60


def test_frozen_oracle_line_search_matches_plain():
    """minimize(frozen=) with a surrogate that IS the true model must
    behave like a plain solve (same minimizer within tolerance); and
    on a quadratic with an 'expensive' state (the Hessian diag) the
    frozen path must converge using one true eval per iteration."""
    import jax
    import jax.numpy as jnp

    from svsdf_tpu.utils import lbfgs

    A = jnp.asarray([3.0, 1.0, 0.5, 7.0, 2.0])
    b = jnp.asarray([1.0, -2.0, 0.5, 3.0, -1.0])

    def f_only(x):
        f = jnp.sum(A * (x - b) ** 2)
        return f, 2.0 * A * (x - b)

    n_true = {"count": 0}

    def full(x):
        f, g = f_only(x)
        return f, g, A          # state = 'oracle byproduct'

    def frozen(x, st):
        f = jnp.sum(st * (x - b) ** 2)
        return f, 2.0 * st * (x - b)

    p = lbfgs.LBFGSParams(max_iterations=60, g_epsilon=1e-8)
    x0 = jnp.zeros(5)
    r_plain = lbfgs.minimize(f_only, x0, p)
    r_frozen = lbfgs.minimize(full, x0, p, frozen=frozen)
    assert float(jnp.max(jnp.abs(r_frozen.x - b))) < 1e-5
    assert float(jnp.max(jnp.abs(r_plain.x - r_frozen.x))) < 1e-4
    assert bool(r_frozen.converged)


def test_frozen_oracle_rejects_bad_surrogate_steps():
    """When the surrogate is WRONG (scaled gradient), the true-cost
    accept gate must still guarantee monotone decrease."""
    import jax.numpy as jnp

    from svsdf_tpu.utils import lbfgs

    A = jnp.asarray([5.0, 0.2, 1.0])

    def full(x):
        f = jnp.sum(A * x ** 2) + jnp.sum(jnp.abs(x))   # nonsmooth
        g = 2.0 * A * x + jnp.sign(x)
        return f, g, jnp.zeros(())

    def frozen(x, st):
        # deliberately mis-scaled surrogate
        f = 3.0 * jnp.sum(A * x ** 2)
        return f, 6.0 * A * x

    p = lbfgs.LBFGSParams(max_iterations=80, g_epsilon=1e-9,
                          delta=0.0)
    x0 = jnp.asarray([2.0, -3.0, 1.5])
    res = lbfgs.minimize(full, x0, p, frozen=frozen)
    f0 = float(jnp.sum(A * x0 ** 2) + jnp.sum(jnp.abs(x0)))
    assert float(res.f) < f0          # decreased despite bad model
    assert float(res.f) < 1.0         # made real progress toward 0


def test_compact_representation_matches_two_loop():
    """LBFGSParams.compact applies the SAME inverse Hessian via the
    Byrd-Nocedal-Schnabel compact form (batched matmuls + two m x m
    triangular solves) instead of the sequential two-loop recursion —
    iterates must agree to float tolerance on both a smooth quadratic
    and a nonsmooth L1-regularized problem."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from svsdf_tpu.utils import lbfgs

    rng = np.random.default_rng(7)
    dim = 17
    A = jnp.asarray(rng.normal(size=(dim, dim)))
    A = A @ A.T / dim + jnp.eye(dim)
    b = jnp.asarray(rng.normal(size=(dim,)))

    def quad(x):
        f = 0.5 * x @ A @ x + b @ x
        return f, A @ x + b

    def nonsmooth(x):
        f, g = quad(x)
        return f + jnp.sum(jnp.abs(x)), g + jnp.sign(x)

    x0 = jnp.asarray(rng.normal(size=(dim,)))
    for fun in (quad, nonsmooth):
        for iters in (3, 10, 40):
            pa = lbfgs.LBFGSParams(mem_size=6, max_iterations=iters,
                                   g_epsilon=0.0, delta=0.0,
                                   max_linesearch=8)
            pb = dataclasses.replace(pa, compact=True)
            ra = lbfgs.minimize(fun, x0, pa)
            rb = lbfgs.minimize(fun, x0, pb)
            np.testing.assert_allclose(np.asarray(ra.x),
                                       np.asarray(rb.x),
                                       atol=1e-6, rtol=1e-5)
            # n_iters may diverge by a step or two deep into
            # nonsmooth runs (fp path divergence at kinks); the
            # ITERATES agreeing is the math-equality claim
            assert abs(int(ra.n_iters) - int(rb.n_iters)) <= 3
