"""MINCO S3 (minimum-jerk) spline parameterization, batched + differentiable.

TPU-native re-design of minco::MINCO_S3NU
(`src/utils/include/utils/minco.hpp:397-656`): quintic pieces with
non-uniform times; given head/tail states (pos, vel, acc), intermediate
waypoints, and piece durations, solve the C^4-continuity linear system
for the polynomial coefficients.

Design differences vs the reference (intentional, idiomatic):
  * The reference factorizes a banded 6Nx6N system with a custom
    banded-LU (minco.hpp:43-198) and hand-derives the adjoint solve
    (propogateGrad, minco.hpp:586-656). Here the same system is built
    as a dense (6N, 6N) matrix via one vectorized scatter and solved
    with `jnp.linalg.solve`; gradients w.r.t. waypoints AND times come
    for free (and exactly) from JAX autodiff through the solve — no
    hand-written adjoint. For planner-scale N (<= ~64 pieces) the dense
    batched solve is negligible next to the SVSDF queries and maps
    cleanly onto the MXU when vmapped over scenarios.
  * Coefficients are returned ascending-power, matching
    utils/trajectory.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from svsdf_tpu.utils.trajectory import Trajectory


@functools.lru_cache(maxsize=None)
def _index_plan(n: int):
    """Static (rows, cols, kind, coef) scatter plan for N pieces.

    kind k in 0..5 selects the T-power factor: value = coef * T_i^k
    (k=0 means constant). `piece` maps each entry to its piece index.
    Mirrors the matrix stencil of minco.hpp:433-509.
    """
    rows, cols, piece, power, coef = [], [], [], [], []

    def add(r, c, i, k, a):
        rows.append(r); cols.append(c); piece.append(i)
        power.append(k); coef.append(a)

    # head conditions (pos/vel/acc of piece 0 at s=0)
    add(0, 0, 0, 0, 1.0)
    add(1, 1, 0, 0, 1.0)
    add(2, 2, 0, 0, 2.0)

    for i in range(n - 1):
        r = 6 * i + 3
        add(r, 6 * i + 3, i, 0, 6.0)
        add(r, 6 * i + 4, i, 1, 24.0)
        add(r, 6 * i + 5, i, 2, 60.0)
        add(r, 6 * i + 9, i, 0, -6.0)
        r = 6 * i + 4
        add(r, 6 * i + 4, i, 0, 24.0)
        add(r, 6 * i + 5, i, 1, 120.0)
        add(r, 6 * i + 10, i, 0, -24.0)
        r = 6 * i + 5
        for k in range(6):
            add(r, 6 * i + k, i, k, 1.0)
        r = 6 * i + 6
        for k in range(6):
            add(r, 6 * i + k, i, k, 1.0)
        add(r, 6 * i + 6, i, 0, -1.0)
        r = 6 * i + 7
        for k in range(1, 6):
            add(r, 6 * i + k, i, k - 1, float(k))
        add(r, 6 * i + 7, i, 0, -1.0)
        r = 6 * i + 8
        for k in range(2, 6):
            add(r, 6 * i + k, i, k - 2, float(k * (k - 1)))
        add(r, 6 * i + 8, i, 0, -2.0)

    # tail conditions (pos/vel/acc of piece N-1 at s=T)
    i = n - 1
    r = 6 * n - 3
    for k in range(6):
        add(r, 6 * i + k, i, k, 1.0)
    r = 6 * n - 2
    for k in range(1, 6):
        add(r, 6 * i + k, i, k - 1, float(k))
    r = 6 * n - 1
    for k in range(2, 6):
        add(r, 6 * i + k, i, k - 2, float(k * (k - 1)))

    return (np.asarray(rows), np.asarray(cols), np.asarray(piece),
            np.asarray(power), np.asarray(coef, dtype=np.float64))


def build_system(times, head, tail, waypoints):
    """Assemble (M, rhs) of the C^4 continuity system.

    times:     (N,)      piece durations
    head:      (3, D)    [pos; vel; acc] rows at t=0
    tail:      (3, D)    [pos; vel; acc] rows at t=T_total
    waypoints: (N-1, D)  intermediate junction positions
    Returns M (6N, 6N), rhs (6N, D).
    """
    n = times.shape[0]
    d = head.shape[-1]
    dtype = times.dtype
    rows, cols, piece, power, coef = _index_plan(n)

    tp = jnp.stack([times ** k for k in range(6)], axis=0)  # (6, N)
    vals = jnp.asarray(coef, dtype=dtype) * tp[power, piece]

    m = jnp.zeros((6 * n, 6 * n), dtype=dtype)
    m = m.at[rows, cols].add(vals)

    rhs = jnp.zeros((6 * n, d), dtype=dtype)
    rhs = rhs.at[0:3, :].set(head)
    if n > 1:
        rhs = rhs.at[6 * np.arange(n - 1) + 5, :].set(waypoints)
    rhs = rhs.at[6 * n - 3:, :].set(tail)
    return m, rhs


@functools.lru_cache(maxsize=None)
def _band_scatter_matrix(n: int):
    """Static one-hot (6N*13, E) matrix mapping the E stencil values
    to flattened band storage. Assembling the bands as ONE matmul
    instead of a scatter-add matters on TPU: the ~31N-element
    .at[rows, diag].add() scatter serializes and measured ~0.5 ms per
    cost evaluation inside the back-end loop; the matmul fuses."""
    from svsdf_tpu.ops.banded import LBW, NDIAG

    rows, cols, piece, power, coef = _index_plan(n)
    diag = cols - rows + LBW
    assert (diag >= 0).all() and (diag < NDIAG).all()
    e = len(rows)
    s = np.zeros((6 * n * NDIAG, e), np.float64)
    flat = rows * NDIAG + diag
    for k in range(e):
        s[flat[k], k] += 1.0
    return s, np.asarray(piece), np.asarray(power), \
        np.asarray(coef, np.float64)


def build_bands(times, head, tail, waypoints):
    """Assemble the system directly in banded storage (bandwidth 6 —
    the same structure the reference's BandedSystem exploits,
    minco.hpp:43-198). Returns bands (6N, 13), rhs (6N, D)."""
    from svsdf_tpu.ops.banded import NDIAG

    n = times.shape[0]
    d = head.shape[-1]
    dtype = times.dtype
    s, piece, power, coef = _band_scatter_matrix(int(n))

    tp = jnp.stack([times ** k for k in range(6)], axis=0)  # (6, N)
    vals = jnp.asarray(coef, dtype=dtype) * tp[power, piece]
    # the 0/1 scatter matmul must NOT round vals to bf16 (TPU default
    # matmul precision) — these are the system entries themselves
    bands = jnp.matmul(jnp.asarray(s, dtype=dtype), vals,
                       precision="float32").reshape(6 * n, NDIAG)

    rhs = jnp.zeros((6 * n, d), dtype=dtype)
    rhs = rhs.at[0:3, :].set(head)
    if n > 1:
        rhs = rhs.at[6 * np.arange(n - 1) + 5, :].set(waypoints)
    rhs = rhs.at[6 * n - 3:, :].set(tail)
    return bands, rhs


#: hot-path linear solver: "cr" = block cyclic reduction (O(log N)
#: sequential depth, ops/block_cr.py — the TPU default), "scan" =
#: sequential banded-LU lax.scan (ops/banded.py, the oracle; CR with
#: equilibration + refinement matches its f32 accuracy class).
SOLVER = "cr"


@functools.lru_cache(maxsize=None)
def _index_plan_norm(n: int):
    """Scatter plan for the PER-PIECE NORMALIZED-TIME system.

    Each piece is parameterized on u = s/T_i: p_i(u) = sum_k c^_k u^k.
    A derivative-order-o continuity row between pieces i and i+1,
    multiplied through by T_{i+1}^o, has piece-i entries
    dcoef(k, o) * rho_i^o with rho_i = T_{i+1}/T_i and a CONSTANT
    -dcoef(o, o) entry on the i+1 side — so the matrix entries scale
    as duration RATIOS (<= ~rho^4), not absolute durations (T^5 in the
    raw parameterization, minco.hpp:433-509). In f32 the raw system's
    condition (~(T^5)^2 spread) left the solved trajectory missing its
    own boundary conditions by up to 0.36 m on scenario trajectories;
    the normalized system holds them to ~1e-4 m.

    Entry value = coef * rho_piece^power (power = 0 for constant
    entries; rho_{n-1} := 1, unused).
    """
    rows, cols, piece, power, coef = [], [], [], [], []

    def add(r, c, i, k, a):
        rows.append(r); cols.append(c); piece.append(i)
        power.append(k); coef.append(a)

    def dcoef(k, o):
        a = 1.0
        for j in range(o):
            a *= (k - j)
        return a

    # head conditions on normalized derivatives (rhs scaled by T_0^o)
    add(0, 0, 0, 0, 1.0)
    add(1, 1, 0, 0, 1.0)
    add(2, 2, 0, 0, 2.0)

    for i in range(n - 1):
        # jerk continuity (o=3), x T_{i+1}^3
        r = 6 * i + 3
        for k in range(3, 6):
            add(r, 6 * i + k, i, 3, dcoef(k, 3))
        add(r, 6 * i + 9, i, 0, -6.0)
        # snap continuity (o=4), x T_{i+1}^4
        r = 6 * i + 4
        for k in range(4, 6):
            add(r, 6 * i + k, i, 4, dcoef(k, 4))
        add(r, 6 * i + 10, i, 0, -24.0)
        # waypoint position (u=1)
        r = 6 * i + 5
        for k in range(6):
            add(r, 6 * i + k, i, 0, 1.0)
        # position continuity
        r = 6 * i + 6
        for k in range(6):
            add(r, 6 * i + k, i, 0, 1.0)
        add(r, 6 * i + 6, i, 0, -1.0)
        # velocity continuity (o=1), x T_{i+1}
        r = 6 * i + 7
        for k in range(1, 6):
            add(r, 6 * i + k, i, 1, dcoef(k, 1))
        add(r, 6 * i + 7, i, 0, -1.0)
        # acceleration continuity (o=2), x T_{i+1}^2
        r = 6 * i + 8
        for k in range(2, 6):
            add(r, 6 * i + k, i, 2, dcoef(k, 2))
        add(r, 6 * i + 8, i, 0, -2.0)

    # tail conditions at u=1 (rhs scaled by T_{n-1}^o)
    i = n - 1
    for o, r in ((0, 6 * n - 3), (1, 6 * n - 2), (2, 6 * n - 1)):
        for k in range(o, 6):
            add(r, 6 * i + k, i, 0, dcoef(k, o))

    return (np.asarray(rows), np.asarray(cols), np.asarray(piece),
            np.asarray(power), np.asarray(coef, dtype=np.float64))


@functools.lru_cache(maxsize=None)
def _band_scatter_matrix_norm(n: int):
    """Band-storage scatter for the normalized plan (same machinery as
    _band_scatter_matrix; the sparsity pattern is identical)."""
    from svsdf_tpu.ops.banded import LBW, NDIAG

    rows, cols, piece, power, coef = _index_plan_norm(n)
    diag = cols - rows + LBW
    assert (diag >= 0).all() and (diag < NDIAG).all()
    e = len(rows)
    s = np.zeros((6 * n * NDIAG, e), np.float64)
    flat = rows * NDIAG + diag
    for k in range(e):
        s[flat[k], k] += 1.0
    return s, np.asarray(piece), np.asarray(power), \
        np.asarray(coef, np.float64)


def build_bands_norm(times, head, tail, waypoints):
    """Assemble the normalized-time system in banded storage.
    Returns bands (6N, 13), rhs (6N, D); the solution is the
    NORMALIZED coefficient vector (convert via c_k = c^_k / T_i^k)."""
    from svsdf_tpu.ops.banded import NDIAG

    n = times.shape[0]
    d = head.shape[-1]
    dtype = times.dtype
    s, piece, power, coef = _band_scatter_matrix_norm(int(n))

    rho = jnp.concatenate([times[1:] / times[:-1],
                           jnp.ones((1,), dtype)])          # (N,)
    rp = jnp.stack([rho ** k for k in range(5)], axis=0)    # (5, N)
    vals = jnp.asarray(coef, dtype=dtype) * rp[power, piece]
    bands = jnp.matmul(jnp.asarray(s, dtype=dtype), vals,
                       precision="float32").reshape(6 * n, NDIAG)

    t0 = times[0]
    tn = times[-1]
    scale_h = jnp.stack([jnp.ones((), dtype), t0, t0 * t0])
    scale_t = jnp.stack([jnp.ones((), dtype), tn, tn * tn])
    rhs = jnp.zeros((6 * n, d), dtype=dtype)
    rhs = rhs.at[0:3, :].set(head * scale_h[:, None])
    if n > 1:
        rhs = rhs.at[6 * np.arange(n - 1) + 5, :].set(waypoints)
    rhs = rhs.at[6 * n - 3:, :].set(tail * scale_t[:, None])
    return bands, rhs


def solve(times, head, tail, waypoints) -> Trajectory:
    """Waypoints + times -> quintic Trajectory (setParameters +
    getTrajectory, minco.hpp:433-530). Fully differentiable. The
    solve is block cyclic reduction by default (see SOLVER): inside
    the back-end L-BFGS loop the O(6N)-step banded scan measured
    ~60% of every optimizer iteration; CR cuts the full-cost
    iteration ~3.8 -> ~2.3 ms (batch 256, v5e). The system is
    assembled in per-piece normalized time (see _index_plan_norm) so
    the f32 solve holds its boundary conditions."""
    n = times.shape[0]
    bands, rhs = build_bands_norm(times, head, tail, waypoints)
    if SOLVER == "cr":
        from svsdf_tpu.ops.block_cr import banded_solve_cr
        ch = banded_solve_cr(bands, rhs)
    else:
        from svsdf_tpu.ops.banded import banded_solve
        ch = banded_solve(bands, rhs)
    ch = ch.reshape(n, 6, -1)
    # normalized -> physical ascending-power coefficients
    tinv = jnp.stack([times ** (-k) for k in range(6)], axis=1)  # (N, 6)
    return Trajectory(coeffs=ch * tinv[:, :, None], durations=times)


def solve_raw(times, head, tail, waypoints) -> Trajectory:
    """Raw (unnormalized) banded solve — the round-2 hot path, kept as
    an oracle cross-check for the normalized assembly."""
    n = times.shape[0]
    bands, rhs = build_bands(times, head, tail, waypoints)
    if SOLVER == "cr":
        from svsdf_tpu.ops.block_cr import banded_solve_cr
        c = banded_solve_cr(bands, rhs)
    else:
        from svsdf_tpu.ops.banded import banded_solve
        c = banded_solve(bands, rhs)
    return Trajectory(coeffs=c.reshape(n, 6, -1), durations=times)


def solve_dense(times, head, tail, waypoints) -> Trajectory:
    """Reference implementation via dense jnp.linalg.solve (tests)."""
    n = times.shape[0]
    m, rhs = build_system(times, head, tail, waypoints)
    c = jnp.linalg.solve(m, rhs)
    return Trajectory(coeffs=c.reshape(n, 6, -1), durations=times)


def energy(traj: Trajectory):
    """Integral of squared jerk (getEnergy, minco.hpp:536-550)."""
    c3 = traj.coeffs[:, 3, :]
    c4 = traj.coeffs[:, 4, :]
    c5 = traj.coeffs[:, 5, :]
    t1 = traj.durations
    t2 = t1 * t1
    t3 = t2 * t1
    t4 = t2 * t2
    t5 = t4 * t1
    per_piece = (36.0 * jnp.sum(c3 * c3, -1) * t1 +
                 144.0 * jnp.sum(c4 * c3, -1) * t2 +
                 192.0 * jnp.sum(c4 * c4, -1) * t3 +
                 240.0 * jnp.sum(c5 * c3, -1) * t3 +
                 720.0 * jnp.sum(c5 * c4, -1) * t4 +
                 720.0 * jnp.sum(c5 * c5, -1) * t5)
    return jnp.sum(per_piece)


# ---------------------------------------------------------------------------
# General MINCO_S{s}NU: s = 2 (cubic, min-acc), 3 (quintic, min-jerk),
# 4 (septic, min-snap) — the full family of minco.hpp (MINCO_S2NU :201,
# MINCO_S3NU :397, MINCO_S4NU :658). The planner uses s=3 (the banded
# fast path above); S2/S4 share the same vectorized-scatter assembly
# with a dense solve (they are not on the optimizer hot path).
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _index_plan_s(n: int, s: int):
    """Scatter plan for the 2sN x 2sN C^{2s-2} continuity system."""
    nc = 2 * s                      # coefficients per piece
    rows, cols, piece, power, coef = [], [], [], [], []

    def add(r, c, i, k, a):
        rows.append(r); cols.append(c); piece.append(i)
        power.append(k); coef.append(a)

    def dcoef(k, order):
        """d^order/ds^order of s^k evaluated with remaining power."""
        a = 1.0
        for j in range(order):
            a *= (k - j)
        return a

    # head: derivatives 0..s-1 of piece 0 at local time 0
    for o in range(s):
        add(o, o, 0, 0, dcoef(o, o))

    for i in range(n - 1):
        r0 = nc * i + s
        # high-order continuity: orders s..2s-2  (s-1 rows)
        for idx, o in enumerate(range(s, 2 * s - 1)):
            r = r0 + idx
            for k in range(o, nc):
                add(r, nc * i + k, i, k - o, dcoef(k, o))
            add(r, nc * (i + 1) + o, i, 0, -dcoef(o, o))
        # waypoint position row
        r = r0 + (s - 1)
        for k in range(nc):
            add(r, nc * i + k, i, k, 1.0)
        # low-order continuity: orders 0..s-1 (s rows)
        for o in range(s):
            r = r0 + s + o
            for k in range(o, nc):
                add(r, nc * i + k, i, k - o, dcoef(k, o))
            add(r, nc * (i + 1) + o, i, 0, -dcoef(o, o))

    # tail: derivatives 0..s-1 of piece n-1 at local time T
    i = n - 1
    for o in range(s):
        r = nc * n - s + o
        for k in range(o, nc):
            add(r, nc * i + k, i, k - o, dcoef(k, o))

    return (np.asarray(rows), np.asarray(cols), np.asarray(piece),
            np.asarray(power), np.asarray(coef, dtype=np.float64))


def solve_s(s: int, times, head, tail, waypoints) -> Trajectory:
    """General MINCO solve of order s. head/tail: (s, D) boundary
    derivative rows; waypoints: (N-1, D). Returns a Trajectory with
    2s coefficients per piece."""
    n = times.shape[0]
    nc = 2 * s
    d = head.shape[-1]
    dtype = times.dtype
    rows, cols, piece, power, coef = _index_plan_s(n, s)

    tp = jnp.stack([times ** k for k in range(nc)], axis=0)
    vals = jnp.asarray(coef, dtype=dtype) * tp[power, piece]
    m = jnp.zeros((nc * n, nc * n), dtype=dtype)
    m = m.at[rows, cols].add(vals)

    rhs = jnp.zeros((nc * n, d), dtype=dtype)
    rhs = rhs.at[0:s, :].set(head)
    if n > 1:
        rhs = rhs.at[nc * np.arange(n - 1) + s + (s - 1), :].set(waypoints)
    rhs = rhs.at[nc * n - s:, :].set(tail)
    c = jnp.linalg.solve(m, rhs)
    return Trajectory(coeffs=c.reshape(n, nc, -1), durations=times)


def energy_s(traj: Trajectory, s: int):
    """Integral of the squared s-th derivative over the trajectory
    (getEnergy for each MINCO family: minco.hpp:341,536,816)."""
    nc = traj.coeffs.shape[1]
    degs = np.arange(nc)
    fac = np.ones(nc)
    for j in range(s):
        fac *= np.maximum(degs - j, 0)
    d = traj.coeffs * jnp.asarray(fac)[None, :, None]   # s-th deriv coefs
    d = d[:, s:, :]                                      # powers 0..nc-s-1
    k = d.shape[1]
    j1 = np.arange(k)[:, None]
    j2 = np.arange(k)[None, :]
    powers = j1 + j2 + 1
    t = traj.durations[:, None, None] ** jnp.asarray(powers)[None]
    gram = jnp.einsum("nid,njd->nij", d, d)
    return jnp.sum(gram * t / jnp.asarray(powers)[None])
