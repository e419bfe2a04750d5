"""Block cyclic-reduction solve of the MINCO continuity system.

The 6Nx6N MINCO system (BandedSystem, minco.hpp:43-198) has lower and
upper bandwidth 6, i.e. it is block-TRIDIAGONAL in 6x6 blocks:

    A_i x_{i-1} + B_i x_i + C_i x_{i+1} = d_i ,   i = 0..N-1

ops/banded.py solves it with a lax.scan whose sequential depth is
O(6N) tiny dynamic-slice steps — numerically excellent, but
latency-bound on TPU: the back end calls the solve (and its adjoint)
inside EVERY L-BFGS cost evaluation, and the ~150-kernel critical
path of the scans measured ~60% of each optimizer iteration.

This module replaces it on the hot path with even-odd block cyclic
reduction: eliminate the odd-indexed block unknowns (one batched
6x6 Gauss-Jordan per level), recurse on the even half, then
back-substitute — sequential depth O(log2 N) levels of wide batched
arithmetic, which is the shape the TPU wants. The recursion unrolls
at trace time (N is static under jit).

Numerics (measured, see tests/test_banded.py):
  * Raw CR on MINCO bands is unusable in f32 — entries span T^0..T^5
    and the Schur updates amplify; worst relative error ~1e+2.
  * Two-sided max equilibration (rows then columns scaled to unit
    max) brings it to ~1e-2..1e-4.
  * ONE round of iterative refinement (residual via a 13-shift band
    matvec, re-solve the correction with the same reduced system)
    lands in the sequential scan's accuracy class (~1e-6..1e-5
    relative) while total depth stays ~2 CR passes.
  * The 6x6 block solves do NOT pivot (the per-batch gather that
    partial pivoting needs measured 3x the whole solve); pivots are
    clamped away from zero and refinement mops up. The reference's
    own banded LU also never pivots (minco.hpp:99).

The custom VJP solves M^T ybar = xbar by cyclic reduction on the
transposed block system (A'_i = C_{i-1}^T, B'_i = B_i^T,
C'_i = A_{i+1}^T), with the same refinement — the analogue of the
reference's solveAdj (minco.hpp:167-198).

Measured in the back-end L-BFGS loop (batch 256, n=8, v5e):
~0.8 ms/iteration for the MINCO value-and-grad path vs ~2.4 ms with
the scan solver; full-cost iteration 3.8 -> ~2.3 ms.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from svsdf_tpu.ops.banded import LBW, NDIAG

BS = 6   # block size (quintic pieces: 6 coefficients)

#: refinement rounds (env knob for A/B)
_REFINE = int(os.environ.get("SVSDF_CR_REFINE", "1"))


def _bmm(a, b):
    """Batched exact-f32 block product on the VPU.

    The TPU MXU's DEFAULT precision rounds f32 operands to bfloat16
    (8-bit mantissa), which corrupted the CR Schur complements badly
    enough that solved splines missed their own boundary conditions by
    ~0.3 m (round-2 records); requesting float32 MXU precision fixed
    the numerics but cost 40% of bench throughput (6 decomposed
    passes over padding-dominated 6x6 tiles). These blocks are far too
    small for the systolic array — a broadcast multiply + sum runs on
    the VPU at native f32: exact AND fast. a (..., i, k), b (..., k, j).
    """
    return jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)

#: pivot clamp for the unpivoted 6x6 elimination (post-equilibration
#: entries are O(1), so 1e-30 only guards exact zeros)
_PIV_EPS = 1e-30


def bands_to_blocks(bands):
    """(6N, 13) band storage -> block tridiagonal (A, B, C), each
    (N, 6, 6), with A[0] = C[N-1] = 0.

    Band layout: bands[r, d] = M[r, r + d - 6] (ops/banded.py). For
    row r = 6*i + a (a in 0..5) and column c = 6*j + b, the entry sits
    at d = c - r + 6; block columns j in {i-1, i, i+1} map to
    d = 6*o + b - a + 6 for o in {-1, 0, +1}.
    """
    n6 = bands.shape[0]
    n = n6 // BS
    rows = bands.reshape(n, BS, NDIAG)               # [i, a, d]
    a = jnp.arange(BS)[:, None]
    b = jnp.arange(BS)[None, :]
    out = []
    for o in (-1, 0, 1):
        d = 6 * o + b - a + 6                        # (6, 6)
        valid = (d >= 0) & (d < NDIAG)
        dc = jnp.clip(d, 0, NDIAG - 1)
        blk = jnp.take_along_axis(
            rows, jnp.broadcast_to(dc[None], (n, BS, BS)), axis=2)
        out.append(jnp.where(valid[None], blk, 0.0))
    A, B, C = out
    A = A.at[0].set(0.0)
    C = C.at[n - 1].set(0.0)
    return A, B, C


def _solve_blocks(B, rhs):
    """Batched 6x6 solve: B (k,6,6), rhs (k,6,m) -> (k,6,m).

    Unrolled Gauss-Jordan, NO pivoting (see module docstring):
    6 levels of 3 wide fused ops each. jnp.linalg.solve lowers to
    XLA's generic LuDecomposition expander, which measured ~5x
    slower in context for these shapes."""
    aug = jnp.concatenate([B, rhs], axis=-1)         # (k, 6, 6+m)
    for j in range(BS):
        piv = aug[:, j, j][:, None]
        piv = jnp.where(jnp.abs(piv) < _PIV_EPS,
                        jnp.where(piv < 0, -_PIV_EPS, _PIV_EPS), piv)
        rj = aug[:, j] / piv                         # (k, 6+m)
        fac = aug[:, :, j][:, :, None]               # (k, 6, 1)
        aug = aug - fac * rj[:, None, :]
        aug = aug.at[:, j].set(rj)
    return aug[..., BS:]


def block_tridiag_solve(A, B, C, d):
    """Solve the block-tridiagonal system by even-odd cyclic
    reduction. A, B, C: (N, 6, 6) with A[0] = C[N-1] = 0;
    d: (N, 6, D). Returns x (N, 6, D)."""
    n = A.shape[0]
    if n == 1:
        return _solve_blocks(B, d)

    n_orig = n
    if n % 2:
        # pad with a decoupled identity block (x_pad = 0)
        eye = jnp.broadcast_to(jnp.eye(BS, dtype=B.dtype)[None],
                               (1, BS, BS))
        zero = jnp.zeros((1, BS, BS), B.dtype)
        A = jnp.concatenate([A, zero])
        B = jnp.concatenate([B, eye])
        C = jnp.concatenate([C, zero])
        d = jnp.concatenate([d, jnp.zeros((1,) + d.shape[1:], d.dtype)])
        n += 1

    Ae, Be, Ce, de = A[0::2], B[0::2], C[0::2], d[0::2]
    Ao, Bo, Co, do = A[1::2], B[1::2], C[1::2], d[1::2]

    # one batched elimination of every odd diagonal block, reused for
    # the [A_o | C_o | d_o] triple solve
    dd = d.shape[-1]
    sol = _solve_blocks(Bo, jnp.concatenate([Ao, Co, do], axis=-1))
    SA, SC, Sd = sol[..., :BS], sol[..., BS:2 * BS], sol[..., 2 * BS:]

    # even equation 2k couples odd neighbours 2k-1 (odd idx k-1) and
    # 2k+1 (odd idx k):
    #   x_{2k+1} = Sd[k] - SA[k] x_{2k} - SC[k] x_{2k+2}
    SC_dn = jnp.concatenate([jnp.zeros((1, BS, BS), SC.dtype), SC[:-1]])
    SA_dn = jnp.concatenate([jnp.zeros((1, BS, BS), SA.dtype), SA[:-1]])
    Sd_dn = jnp.concatenate([jnp.zeros((1, BS, dd), Sd.dtype), Sd[:-1]])

    Bp = Be - _bmm(Ae, SC_dn) - _bmm(Ce, SA)
    Ap = -_bmm(Ae, SA_dn)
    Cp = -_bmm(Ce, SC)
    dp = de - _bmm(Ae, Sd_dn) - _bmm(Ce, Sd)
    Ap = Ap.at[0].set(0.0)
    Cp = Cp.at[-1].set(0.0)

    xe = block_tridiag_solve(Ap, Bp, Cp, dp)

    xe_up = jnp.concatenate([xe[1:], jnp.zeros((1, BS, dd), xe.dtype)])
    xo = Sd - _bmm(SA, xe) - _bmm(SC, xe_up)

    x = jnp.zeros((n, BS, dd), xe.dtype)
    x = x.at[0::2].set(xe)
    x = x.at[1::2].set(xo)
    return x[:n_orig]


def equilibrate(bands):
    """Two-sided max equilibration of a band matrix: returns
    (scaled_bands, r, c) with scaled[i,d] = r[i]*bands[i,d]*c[i+d-6],
    every row and column max ~1. Solving M x = b then becomes
    x = c * solve(scaled, r * b)."""
    n = bands.shape[0]
    r = 1.0 / jnp.maximum(jnp.max(jnp.abs(bands), axis=1), 1e-30)
    b1 = bands * r[:, None]
    pad = jnp.zeros((LBW, NDIAG), b1.dtype)
    bp = jnp.concatenate([pad, jnp.abs(b1), pad])
    # column j entries live at bands[j + 6 - d, d]
    cols = jnp.stack([bp[LBW + 6 - d: LBW + 6 - d + n, d]
                      for d in range(NDIAG)], axis=0)   # (13, n)
    c = 1.0 / jnp.maximum(jnp.max(cols, axis=0), 1e-30)
    cpad = jnp.concatenate([jnp.ones((LBW,), c.dtype), c,
                            jnp.ones((LBW,), c.dtype)])
    idx = jnp.arange(n)[:, None] + jnp.arange(NDIAG)[None, :]
    return b1 * cpad[idx], r, c


def band_matvec(bands, x):
    """y[i] = sum_d bands[i, d] * x[i + d - 6]; x (n, D)."""
    n, d = x.shape
    xp = jnp.concatenate([jnp.zeros((LBW, d), x.dtype), x,
                          jnp.zeros((LBW, d), x.dtype)])
    acc = bands[:, 0:1] * xp[0:n]
    for dd in range(1, NDIAG):
        acc = acc + bands[:, dd:dd + 1] * xp[dd:dd + n]
    return acc


def band_matvec_t(bands, x):
    """y = M^T x for band storage: M^T[i, j] = M[j, i] =
    bands[j, i - j + 6], i.e. bandsT[i, d] = bands[i + d - 6, 12 - d]."""
    n, d = x.shape
    pad = jnp.zeros((LBW, NDIAG), bands.dtype)
    bp = jnp.concatenate([pad, bands, pad])
    bt = jnp.stack([bp[dd: dd + n, NDIAG - 1 - dd]
                    for dd in range(NDIAG)], axis=1)
    return band_matvec(bt, x)


def _cr_core(bands, rhs, refine_rounds, transpose):
    """Equilibrated CR solve of M x = rhs (or M^T x = rhs) with
    iterative refinement."""
    n6, d = rhs.shape
    sb, r, c = equilibrate(bands)
    A, B, C = bands_to_blocks(sb)
    if transpose:
        # (D_r M D_c)^T = D_c M^T D_r: solve M^T x = b as
        # x = r * CR_T(scaled)(c * b)
        At = jnp.concatenate([jnp.zeros_like(C[:1]),
                              jnp.swapaxes(C[:-1], -1, -2)])
        Bt = jnp.swapaxes(B, -1, -2)
        Ct = jnp.concatenate([jnp.swapaxes(A[1:], -1, -2),
                              jnp.zeros_like(A[:1])])
        A, B, C = At, Bt, Ct
        pre, post = c, r
        matvec = band_matvec_t
    else:
        pre, post = r, c
        matvec = band_matvec

    def solve_once(b):
        y = block_tridiag_solve(A, B, C,
                                (b * pre[:, None]).reshape(-1, BS, d))
        return y.reshape(n6, d) * post[:, None]

    x = solve_once(rhs)
    for _ in range(refine_rounds):
        x = x + solve_once(rhs - matvec(bands, x))
    return x


@jax.custom_vjp
def banded_solve_cr(bands, rhs):
    """Solve M x = rhs, M in (6N, 13) band storage, by equilibrated
    block cyclic reduction + refinement (SVSDF_CR_REFINE rounds; the
    block algebra runs exact-f32 on the VPU, see _bmm). Drop-in
    replacement for ops/banded.banded_solve with O(log N) sequential
    depth; gradients to bands and rhs via the transposed CR solve."""
    return _cr_core(bands, rhs, _REFINE, False)


def _cr_fwd(bands, rhs):
    x = _cr_core(bands, rhs, _REFINE, False)
    return x, (bands, x)


def _cr_bwd(res, x_bar):
    bands, x = res
    n = x.shape[0]
    rhs_bar = _cr_core(bands, x_bar, _REFINE, True)
    i = jnp.arange(n)[:, None]
    d = jnp.arange(NDIAG)[None, :]
    j = i + d - LBW
    valid = (j >= 0) & (j < n)
    outer = jnp.matmul(rhs_bar, x.T,
                       precision="float32")          # (n, n), tiny
    bands_bar = jnp.where(valid, -outer[i, jnp.clip(j, 0, n - 1)], 0.0)
    return bands_bar, rhs_bar


banded_solve_cr.defvjp(_cr_fwd, _cr_bwd)
