"""Decision-variable transforms and penalty smoothers.

Mirrors the tau<->T diffeomorphism and smoothed-L1 used by both
optimizers (mid_end.hpp:64-142, back_end_optimizer.hpp:199-344). All
functions are pure jnp and differentiable, so the reference's
hand-written backwardGradT/backwardGradP are subsumed by jax.grad.
"""

from __future__ import annotations

import jax.numpy as jnp


def forward_t(tau):
    """tau -> T (strictly positive), mid_end.hpp:115-127."""
    pos = (0.5 * tau + 1.0) * tau + 1.0
    neg = 1.0 / ((0.5 * tau - 1.0) * tau + 1.0)
    return jnp.where(tau > 0.0, pos, neg)


def backward_t(t):
    """T -> tau (inverse of forward_t), mid_end.hpp:129-142."""
    hi = jnp.sqrt(jnp.maximum(2.0 * t - 1.0, 0.0)) - 1.0
    lo = 1.0 - jnp.sqrt(jnp.maximum(2.0 / jnp.maximum(t, 1e-30) - 1.0, 0.0))
    return jnp.where(t > 1.0, hi, lo)


def smoothed_l1(x, mu):
    """C^2 smoothed hinge: 0 for x<=0, cubic blend on (0, mu],
    x - mu/2 beyond (mid_end.hpp:64-88). Returns the value only; use
    jax.grad for the derivative."""
    xdmu = x / mu
    blend = (mu - 0.5 * x) * xdmu * xdmu * xdmu
    return jnp.where(x <= 0.0, 0.0, jnp.where(x > mu, x - 0.5 * mu, blend))


def safe_norm(v, axis=-1, eps=0.0):
    """Norm with zero (not NaN) gradient at v == 0."""
    n2 = jnp.sum(v * v, axis=axis)
    safe = jnp.where(n2 > 0.0, n2, 1.0)
    return jnp.where(n2 > 0.0, jnp.sqrt(safe), eps)
