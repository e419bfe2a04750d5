"""Limited-Memory Bundle Method (LMBM) — JAX re-design of the
reference back end's Fortran solver (`src/utils/include/utils/lmbm.h:214`,
`lmbm_main.f`/`lmbm_sub.f`; Haarala–Miettinen–Mäkelä 2004).

The reference marshals the nonsmooth SVSDF cost through a C wrapper
into 6k lines of Fortran. Here the same *method* is a fixed-shape,
jittable, `vmap`-able pure function:

  * limited-memory L-BFGS metric D (two-loop recursion) shared with
    utils/lbfgs.py's machinery,
  * SERIOUS / NULL step dichotomy with the two-point line search:
    a serious step requires sufficient decrease; otherwise the trial
    point's subgradient enters the bundle and x stays,
  * the 3-element subgradient AGGREGATION of lmbm_sub.f: minimize over
    the simplex the quadratic
        phi(l) = || l1 xi_m + l2 xi_k + l3 xi_a ||_D^2
                 + 2 (l2 beta_k + l3 beta_a)
    where xi_m is the subgradient at x, xi_k the trial subgradient,
    xi_a the previous aggregate, and beta are the SUBGRADIENT LOCALITY
    MEASURES beta = max(|f(x) - f(y) + xi.(x-y)|, gamma ||x-y||^2)
    (the nonconvexity correction). The 3-simplex QP is solved in
    closed form by enumerating its 7 faces — branchless and batched.
  * stopping test w = ||xi_agg||_D^2 + 2 beta_agg <= eps, the LMBM
    criterion (not a gradient norm — meaningless at a kink).

API mirrors utils/lbfgs.py: `minimize(fun, x0, params)` with
fun: x -> (f, subgradient).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class LMBMParams(NamedTuple):
    mem_size: int = 7
    max_iterations: int = 200
    eps: float = 1e-5           # stopping tolerance on w
    gamma: float = 0.25         # distance-measure parameter (rpar(4))
    eps_l: float = 1e-4         # sufficient-decrease coeff (rpar(2) epsl)
    eps_r: float = 0.25         # null-step threshold coeff
    theta_max: float = 2.0      # max step
    t_min: float = 1e-12
    max_nulls: int = 30         # consecutive nulls before giving up
    delta: float = 1e-9         # relative cost stall tolerance
    past: int = 5


class LMBMResult(NamedTuple):
    x: jnp.ndarray
    f: jnp.ndarray
    g: jnp.ndarray              # final aggregate subgradient
    n_iters: jnp.ndarray
    converged: jnp.ndarray


def _simplex_qp3(G, b):
    """argmin_{l in 3-simplex} l^T G l + 2 b^T l, by face enumeration.

    G: (3,3) PSD Gram matrix, b: (3,). Returns l (3,). Fixed shape,
    branchless: evaluates all 7 faces (3 vertices, 3 edges, interior)
    and picks the feasible minimizer.
    """
    eye = jnp.eye(3, dtype=G.dtype)
    cands = [eye[0], eye[1], eye[2]]
    # edges: l = (u, 1-u) on pairs (i, j)
    for i, j in ((0, 1), (0, 2), (1, 2)):
        # minimize over u in [0,1]: quadratic in u
        a2 = G[i, i] - 2 * G[i, j] + G[j, j]
        a1 = G[i, j] - G[j, j] + b[i] - b[j]
        u = jnp.clip(-a1 / jnp.maximum(a2, 1e-30), 0.0, 1.0)
        u = jnp.where(a2 > 1e-30, u, jnp.where(a1 > 0, 0.0, 1.0))
        li = jnp.zeros(3, G.dtype).at[i].set(u).at[j].set(1.0 - u)
        cands.append(li)
    # interior: solve KKT (G l + b = nu 1, 1^T l = 1) via 3x3 solve
    Gr = G + 1e-10 * eye
    K = jnp.block([[2.0 * Gr, jnp.ones((3, 1), G.dtype)],
                   [jnp.ones((1, 3), G.dtype),
                    jnp.zeros((1, 1), G.dtype)]])
    rhs = jnp.concatenate([-2.0 * b, jnp.ones((1,), G.dtype)])
    sol = jnp.linalg.solve(K, rhs)
    l_int = sol[:3]
    feas = jnp.all(l_int >= -1e-9)
    cands.append(jnp.where(feas, jnp.clip(l_int, 0.0, 1.0), eye[0]))
    L = jnp.stack(cands)                       # (7, 3)
    L = L / jnp.maximum(L.sum(-1, keepdims=True), 1e-30)
    vals = jnp.einsum("ki,ij,kj->k", L, G, L) + 2.0 * (L @ b)
    return L[jnp.argmin(vals)]


def minimize(fun: Callable, x0, params: LMBMParams = LMBMParams()
             ) -> LMBMResult:
    """Minimize nonsmooth fun: x -> (f, subgradient). Jittable; vmap
    over a leading batch by vmapping this function."""
    p = params
    n = x0.shape[-1]
    m = p.mem_size
    dtype = x0.dtype

    def fun_c(x):
        f, g = fun(x)
        return jnp.asarray(f, dtype), jnp.asarray(g, dtype)

    f0, g0 = fun_c(x0)

    class Carry(NamedTuple):
        x: jnp.ndarray
        f: jnp.ndarray
        g: jnp.ndarray          # subgradient at x (xi_m)
        ga: jnp.ndarray         # aggregate subgradient (xi_a)
        beta_a: jnp.ndarray     # aggregate locality measure
        s_hist: jnp.ndarray
        y_hist: jnp.ndarray
        rho: jnp.ndarray
        n_corr: jnp.ndarray
        head: jnp.ndarray
        past_f: jnp.ndarray
        nulls: jnp.ndarray
        it: jnp.ndarray
        done: jnp.ndarray
        converged: jnp.ndarray

    def apply_D(v, c: Carry):
        """D v via the standard two-loop recursion."""
        idxs = (c.head - 1 - jnp.arange(m)) % m
        valid = jnp.arange(m) < c.n_corr

        def bwd(q, i):
            s, y, r = c.s_hist[idxs[i]], c.y_hist[idxs[i]], c.rho[idxs[i]]
            a = jnp.where(valid[i], r * jnp.vdot(s, q), 0.0)
            return q - a * y * valid[i], a

        q, alphas = jax.lax.scan(bwd, v, jnp.arange(m))
        newest = idxs[0]
        sy = jnp.vdot(c.s_hist[newest], c.y_hist[newest])
        yy = jnp.vdot(c.y_hist[newest], c.y_hist[newest])
        gamma = jnp.where((c.n_corr > 0) & (yy > 0),
                          sy / jnp.maximum(yy, 1e-30), 1.0)
        r_ = q * gamma

        def fwd(r_, i):
            ii = m - 1 - i
            s, y, rh = (c.s_hist[idxs[ii]], c.y_hist[idxs[ii]],
                        c.rho[idxs[ii]])
            b = jnp.where(valid[ii], rh * jnp.vdot(y, r_), 0.0)
            return r_ + (alphas[ii] - b) * s * valid[ii], None

        r_, _ = jax.lax.scan(fwd, r_, jnp.arange(m))
        return r_

    def step(c: Carry) -> Carry:
        d = -apply_D(c.ga, c)
        dga = jnp.vdot(d, c.ga)
        d = jnp.where(dga < 0, d, -c.ga)   # safeguard descent

        # desirable decrease w = -xi_a.d + 2 beta_a  (lmbm wk)
        w = -jnp.vdot(c.ga, d) + 2.0 * c.beta_a
        w = jnp.maximum(w, 1e-30)

        # ---- two-point line search (serious/null; lmbm_sub.f LLS) ----
        # Cap the move length at theta_max (the Fortran XMAX step
        # bound) — unbounded first steps jump across several kinks and
        # poison the aggregation with far-field subgradients.
        dnorm = jnp.maximum(jnp.linalg.norm(d), 1e-30)
        t = jnp.minimum(jnp.asarray(1.0, dtype),
                        jnp.asarray(p.theta_max, dtype) / dnorm)

        def ls_body(carry):
            t, t_e, _, _, _, k = carry
            y = c.x + t * d
            fy, gy = fun_c(y)
            serious = fy <= c.f - p.eps_l * t * w
            t_next = jnp.where(serious, t, 0.5 * t)
            return (t_next, t, fy, gy, serious, k + 1)

        def ls_cond(carry):
            t, _, _, _, serious, k = carry
            return (~serious) & (k < 10) & (t > p.t_min)

        y0 = c.x + t * d
        fy0, gy0 = fun_c(y0)
        serious0 = fy0 <= c.f - p.eps_l * t * w
        # carry tracks (next trial t, t of the LAST EVALUATION) so the
        # exit state always knows where (fy, gy) was computed.
        _, t_eval, fy, gy, serious, _ = jax.lax.while_loop(
            ls_cond, ls_body, (jnp.where(serious0, t, 0.5 * t), t,
                               fy0, gy0, serious0, jnp.asarray(1)))
        y = c.x + t_eval * d

        # ---- serious step ----
        s = y - c.x
        u = gy - c.g
        sy_ = jnp.vdot(s, u)
        do_update = serious & (sy_ > 1e-12)
        head = c.head
        s_hist = jnp.where(do_update, c.s_hist.at[head].set(s), c.s_hist)
        y_hist = jnp.where(do_update, c.y_hist.at[head].set(u), c.y_hist)
        rho = jnp.where(do_update,
                        c.rho.at[head].set(1.0 / jnp.maximum(sy_, 1e-30)),
                        c.rho)
        head_n = jnp.where(do_update, (head + 1) % m, head)
        n_corr = jnp.where(do_update, jnp.minimum(c.n_corr + 1, m),
                           c.n_corr)

        # ---- null step: 3-subgradient aggregation ----
        dxy = y - c.x
        beta_k = jnp.maximum(
            jnp.abs(c.f - fy + jnp.vdot(gy, dxy)),
            p.gamma * jnp.vdot(dxy, dxy))
        xs = jnp.stack([c.g, gy, c.ga])                 # (3, n)
        Dx = jax.vmap(lambda v: apply_D(v, c))(xs)      # (3, n)
        G = xs @ Dx.T
        G = 0.5 * (G + G.T)
        b = jnp.stack([jnp.zeros((), dtype), beta_k, c.beta_a])
        lam = _simplex_qp3(G.astype(dtype), b)
        ga_new = lam @ xs
        beta_new = lam[1] * beta_k + lam[2] * c.beta_a

        x_n = jnp.where(serious, y, c.x)
        f_n = jnp.where(serious, fy, c.f)
        g_n = jnp.where(serious, gy, c.g)
        ga_n = jnp.where(serious, gy, ga_new)
        beta_n = jnp.where(serious, 0.0, beta_new)
        nulls = jnp.where(serious, 0, c.nulls + 1)

        # ---- RESTART (lmbm_main.f irest): a near-zero aggregate with
        # a large locality measure means the bundle's far-field
        # subgradients cancelled — no direction, no convergence proof.
        # Reset the aggregate to the subgradient at x and drop the
        # metric so the next step is a fresh steepest descent.
        deadlock = (~serious) & (jnp.vdot(ga_n, ga_n)
                                 < 1e-4 * jnp.vdot(g_n, g_n)) \
            & (beta_n > p.eps)
        ga_n = jnp.where(deadlock, g_n, ga_n)
        beta_n = jnp.where(deadlock, 0.0, beta_n)
        n_corr = jnp.where(deadlock, 0, n_corr)

        # ---- stopping: w_stop = xi_a . D xi_a + 2 beta_a ----
        c_tmp = c._replace(s_hist=s_hist, y_hist=y_hist, rho=rho,
                           head=head_n, n_corr=n_corr)
        w_stop = jnp.vdot(ga_n, apply_D(ga_n, c_tmp)) + 2.0 * beta_n
        small = w_stop < p.eps
        fpast = c.past_f[c.it % p.past]
        rel_dec = (fpast - f_n) / jnp.maximum(jnp.abs(f_n), 1e-30)
        stalled = serious & (c.it >= p.past) & (rel_dec < p.delta)
        converged = small | stalled
        done = converged | (nulls >= p.max_nulls)
        past_f = c.past_f.at[c.it % p.past].set(f_n)

        return Carry(x_n, f_n, g_n, ga_n, beta_n, s_hist, y_hist, rho,
                     n_corr, head_n, past_f, nulls, c.it + 1, done,
                     converged)

    init = Carry(
        x=x0, f=f0, g=g0, ga=g0, beta_a=jnp.asarray(0.0, dtype),
        s_hist=jnp.zeros((m, n), dtype),
        y_hist=jnp.zeros((m, n), dtype),
        rho=jnp.zeros((m,), dtype), n_corr=jnp.asarray(0),
        head=jnp.asarray(0),
        past_f=jnp.full((p.past,), jnp.inf, dtype).at[0].set(f0),
        nulls=jnp.asarray(0), it=jnp.asarray(0),
        done=jnp.vdot(g0, g0) < p.eps,
        converged=jnp.vdot(g0, g0) < p.eps)

    out = jax.lax.while_loop(
        lambda c: (~c.done) & (c.it < p.max_iterations), step, init)
    return LMBMResult(out.x, out.f, out.ga, out.it, out.converged)


def minimize_batched(fun, x0_batch, params: LMBMParams = LMBMParams()):
    return jax.vmap(lambda x0: minimize(fun, x0, params))(x0_batch)
