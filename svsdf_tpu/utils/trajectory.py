"""Piecewise-polynomial trajectory evaluation (batched, static-shape).

TPU-native re-design of Trajectory<5>/Piece<5>
(`src/utils/include/utils/trajectory.hpp:37-626`). A trajectory is a
pytree of

  coeffs:    (N, 6, D)  ascending-power coefficients per piece
             (pos(s) = sum_k coeffs[i, k] * s**k, s local time)
  durations: (N,)       per-piece durations

All evaluation is pure jnp: piece location is a `searchsorted` over the
cumulative durations (replacing the in-place locatePieceIdx,
trajectory.hpp:498), local-time powers are a fixed (6,) basis, so every
function `vmap`s over query-time batches and scenario batches.

`eval_at` keeps the *global* time differentiable w.r.t. durations: the
local time is s = t - cumsum(T)[i-1] with the piece index i taken
through stop_gradient, so d s/d T_j = -1 for j < i. Combined with
jax.grad this reproduces the reference's hand-assembled time-gradient
propagation (back_end_optimizer.hpp:855-863) automatically.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


class Trajectory(NamedTuple):
    coeffs: jnp.ndarray     # (N, 6, D)
    durations: jnp.ndarray  # (N,)

    @property
    def num_pieces(self):
        return self.coeffs.shape[0]

    @property
    def dim(self):
        return self.coeffs.shape[-1]

    @property
    def total_duration(self):
        return jnp.sum(self.durations)


def _basis(s, order: int, nc: int = 6):
    """Time-power basis row beta_order(s): (..., nc).

    beta_k = k!/(k-order)! * s^(k-order) for k >= order, else 0
    (mid_end.hpp:509-517 writes out the nc=6 cases by hand).
    """
    if not 0 <= order < nc:
        raise ValueError(order)
    z = jnp.zeros_like(s)
    o = jnp.ones_like(s)
    rows = [z] * order
    for k in range(order, nc):
        fac = 1.0
        for j in range(order):
            fac *= (k - j)
        p = k - order
        rows.append(fac * o if p == 0 else fac * s ** p)
    return jnp.stack(rows, axis=-1)


def locate_piece(durations, t):
    """(piece index, local time) for global times t (broadcasts).

    Out-of-range times clamp to the first/last piece like the reference
    (trajectory.hpp:498-520). The returned local time is differentiable
    w.r.t. durations at fixed t (index goes through stop_gradient).
    """
    cum = jnp.cumsum(durations)
    n = durations.shape[0]
    idx = jnp.clip(jnp.searchsorted(jax.lax.stop_gradient(cum), t,
                                    side="right"), 0, n - 1)
    start = jnp.where(idx > 0, jnp.take(jnp.concatenate(
        [jnp.zeros_like(cum[:1]), cum]), idx), 0.0)
    s = t - start
    # clamp local time into [0, T_i] without killing dT gradients off-range
    Ti = jnp.take(durations, idx)
    s = jnp.clip(s, 0.0, jax.lax.stop_gradient(Ti))
    return idx, s


def eval_at_gather(traj: Trajectory, t, order: int = 0):
    """Evaluate via piece gather (reference semantics; kept for tests —
    gathers are slow on TPU, prefer eval_at)."""
    idx, s = locate_piece(traj.durations, t)
    c = jnp.take(traj.coeffs, idx, axis=0)          # (..., nc, D)
    beta = _basis(s, order, traj.coeffs.shape[1])    # (..., nc)
    return jnp.einsum("...k,...kd->...d", beta, c,
                      precision="float32")


def eval_at(traj: Trajectory, t, order: int = 0):
    """Evaluate the `order`-th derivative at global times t.

    t: scalar or (...,) array -> returns (..., D).

    TPU-native strategy: instead of locating the piece and gathering
    its coefficients (gathers serialize badly on TPU for big query
    batches), evaluate EVERY piece's polynomial at its clipped local
    time and combine with a dense one-hot piece mask — N x more (tiny)
    FLOPs, zero gathers, fully vectorized over any query batch. The
    local time stays differentiable w.r.t. durations exactly like
    locate_piece (stop_gradient on the mask and the clip bound).
    """
    t = jnp.asarray(t)
    n = traj.coeffs.shape[0]
    cum = jnp.cumsum(traj.durations)                 # (N,)
    starts = jnp.concatenate([jnp.zeros_like(cum[:1]), cum[:-1]])
    # piece index = number of interior boundaries <= t
    cum_sg = jax.lax.stop_gradient(cum)
    idx = jnp.sum(t[..., None] >= cum_sg[:-1], axis=-1)   # (...,)
    one_hot = (idx[..., None] ==
               jnp.arange(n)).astype(traj.coeffs.dtype)   # (..., N)
    s = t[..., None] - starts                             # (..., N)
    s = jnp.clip(s, 0.0, jax.lax.stop_gradient(traj.durations))
    beta = _basis(s, order, traj.coeffs.shape[1])         # (..., N, nc)
    # float32 contraction: the default TPU matmul precision rounds the
    # coefficients to bf16 (~0.4% relative), a cm-scale pose error
    # that would defeat the endpoint pinning and fuzz certificates
    vals = jnp.einsum("...nk,nkd->...nd", beta, traj.coeffs,
                      precision="float32")
    return jnp.einsum("...n,...nd->...d", one_hot, vals,
                      precision="float32")


def pos(traj, t):
    return eval_at(traj, t, 0)


def vel(traj, t):
    return eval_at(traj, t, 1)


def acc(traj, t):
    return eval_at(traj, t, 2)


def jerk(traj, t):
    return eval_at(traj, t, 3)


def snap(traj, t):
    return eval_at(traj, t, 4)


def state_se2(traj: Trajectory, t):
    """(x, y, yaw) pose + planar rotation at time t for a 2.5D
    trajectory whose 3rd channel is yaw (plan_manager.cpp:109-111).

    Returns (xy (...,2), yaw (...), R (...,2,2)).
    """
    p = eval_at(traj, t, 0)
    xy = p[..., :2]
    yaw = p[..., 2]
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    R = jnp.stack([jnp.stack([c, -s], axis=-1),
                   jnp.stack([s, c], axis=-1)], axis=-2)
    return xy, yaw, R


def world_to_body(xy, R, p_world):
    """p_rel = R^T (p - x) for planar pose (posEva2Rel, sw_manager.hpp:521)."""
    d = p_world - xy
    return jnp.stack([R[..., 0, 0] * d[..., 0] + R[..., 1, 0] * d[..., 1],
                      R[..., 0, 1] * d[..., 0] + R[..., 1, 1] * d[..., 1]],
                     axis=-1)


def _piece_deriv_coeffs(coeffs: np.ndarray, order: int) -> np.ndarray:
    """Ascending-power coefficients of the order-th derivative."""
    c = np.asarray(coeffs, float)
    for _ in range(order):
        nc = c.shape[0]
        c = c[1:] * np.arange(1, nc)[:, None]
    return c


def max_rate(traj: Trajectory, order: int = 1, dims=(0, 1)) -> float:
    """Exact max |d^order p/dt^order| over the trajectory for the given
    dims (Piece::getMaxVelRate/getMaxAccRate, trajectory.hpp:206-303:
    stationary points of |v|^2 via polynomial root isolation — here
    numpy companion-matrix roots on host; exact up to root polish).
    """
    coeffs = np.asarray(traj.coeffs, float)       # (N, nc, D)
    durs = np.asarray(traj.durations, float)
    best = 0.0
    for i in range(coeffs.shape[0]):
        d = _piece_deriv_coeffs(coeffs[i], order)[:, list(dims)]
        # |v|^2 polynomial (ascending powers) and its derivative
        sq = np.zeros(2 * d.shape[0] - 1)
        for k in range(d.shape[1]):
            sq += np.convolve(d[:, k], d[:, k])
        dsq = sq[1:] * np.arange(1, len(sq))
        cands = [0.0, durs[i]]
        nz = np.nonzero(np.abs(dsq) > 1e-14)[0]
        if len(nz):
            dsq_t = dsq[:nz[-1] + 1]
            if len(dsq_t) > 1:
                roots = np.roots(dsq_t[::-1])
                cands += [float(r.real) for r in roots
                          if abs(r.imag) < 1e-9
                          and 0.0 <= r.real <= durs[i]]
        for t in cands:
            v = np.polyval(sq[::-1], t)
            best = max(best, float(v))
    return float(np.sqrt(max(best, 0.0)))


def max_vel_rate(traj: Trajectory, dims=(0, 1)) -> float:
    return max_rate(traj, 1, dims)


def max_acc_rate(traj: Trajectory, dims=(0, 1)) -> float:
    return max_rate(traj, 2, dims)
