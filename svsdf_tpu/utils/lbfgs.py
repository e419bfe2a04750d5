"""Nonsmooth-capable L-BFGS with weak-Wolfe (Lewis–Overton) line search.

JAX-native replacement for both of the reference's solvers:
  * `lbfgs::lbfgs_optimize` (src/utils/include/utils/lbfgs.hpp:290-479),
    the mid-end's smooth(ish) solver with Lewis–Overton line search, and
  * the Fortran LMBM bundle method (src/utils/include/utils/lmbm.h:214,
    lmbm_*.f) used by the SVSDF back end for its genuinely nonsmooth
    cost. L-BFGS with a weak-Wolfe bisection line search and cautious
    (Li–Fukushima) updates is the standard JAX-able alternative for
    such costs — the reference itself uses exactly this for the
    nonsmooth mid-end objective.

Fully jittable: fixed memory, `lax.while_loop` outer iteration and a
fixed-bound bisection line search; `vmap`-able for scenario batches
(every lane runs the same instruction stream, convergence handled by a
`done` mask inside the carry).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

#: default for LBFGSParams.compact=None. ON since round 5: the on-chip
#: A/B at the bench operating point (batch 512, 50 iters) measured
#: two-loop 1099.2 plans/s vs compact 1136.1 at bit-equal final cost,
#: and compact stacks with the parallel-frozen line search (1307.8 ->
#: 1346.7). SVSDF_LBFGS_COMPACT=0 restores the two-loop recursion.
COMPACT_DEFAULT = os.environ.get("SVSDF_LBFGS_COMPACT", "1") == "1"


@dataclasses.dataclass(frozen=True)
class LBFGSParams:
    mem_size: int = 16          # conf.mem_size (sdHeart.yaml:69)
    max_iterations: int = 300
    g_epsilon: float = 1e-6     # ||g||_inf termination
    past: int = 3               # delta-based convergence window
    delta: float = 1e-9         # relative cost-decrease tolerance
    max_linesearch: int = 40
    f_dec_coeff: float = 1e-4   # Armijo c1
    s_curv_coeff: float = 0.9   # weak-Wolfe c2
    cautious_factor: float = 1e-6
    init_step: float = 1.0
    max_nulls: int = 12         # consecutive null steps before giving up
    #: >0 switches the Lewis–Overton bisection to a PARALLEL line
    #: search: ls_candidates trial steps on a geometric grid evaluated
    #: as one batched call (sequential depth 1 instead of up to
    #: max_linesearch). The TPU-native trade — width for depth — and
    #: the batched (vmapped) solver's answer to one stubborn lane
    #: forcing every lane through its worst-case bisection.
    ls_candidates: int = 0
    #: lax.scan unroll factor for the two-loop recursion (the per-
    #: iteration direction build: 2m tiny vdot steps). The staged
    #: batched solve is dispatch/serialization-bound (README roofline),
    #: so merging the 2m scan steps into 2m/unroll fused kernels
    #: shaves fixed overhead off every optimizer iteration.
    scan_unroll: int = 4
    #: apply the inverse Hessian via the COMPACT representation
    #: (Byrd–Nocedal–Schnabel 1994) instead of the two-loop recursion:
    #: H g = gamma g + S t3 - gamma Y t1 with two m x m triangular
    #: solves — a handful of batched matmuls at sequential depth O(1)
    #: per iteration, vs 2m serialized (B, dim) vdot scan steps.
    #: Mathematically identical H (tests pin agreement to f32 eps);
    #: the win is dispatch depth on TPU at large batch. None resolves
    #: to the module default (SVSDF_LBFGS_COMPACT=1 env for A/Bs).
    compact: bool | None = None
    #: stream per-iteration (it, f, ||g||_inf) to the debugbus from
    #: INSIDE the compiled loop via jax.experimental.io_callback — the
    #: reference's DBSendOptiStep/DBSendLogCost live wire (§3.5). The
    #: callback also services the bus's pause/step gate (the
    #: reference's debugpause step-through, back_end_optimizer.hpp:
    #: 1093-1103) and returns the stop flag, so a debug_cmd code-21
    #: aborts the solve MID-LOOP (earlyExitLMBM parity), not just at
    #: the next host round boundary. Single-solve paths only — the
    #: ordered callback forbids vmap.
    live: bool = False


class LBFGSResult(NamedTuple):
    x: jnp.ndarray
    f: jnp.ndarray
    g: jnp.ndarray
    n_iters: jnp.ndarray
    converged: jnp.ndarray


def _weak_wolfe_search(fun, x, f0, g0, d, p: LBFGSParams, t0=None):
    """Lewis–Overton bisection line search (lbfgs.hpp:290-405).

    Returns (t, x_new, f_new, g_new, ok)."""
    dg0 = jnp.vdot(g0, d)
    if t0 is None:
        t0 = jnp.asarray(p.init_step, x.dtype)

    def body(carry):
        k, t, lo, hi, _, _, _, _ = carry
        xt = x + t * d
        ft, gt = fun(xt)
        armijo = ft <= f0 + p.f_dec_coeff * t * dg0
        curv = jnp.vdot(gt, d) >= p.s_curv_coeff * dg0
        ok = armijo & curv
        new_hi = jnp.where(armijo, hi, t)
        new_lo = jnp.where(armijo & ~curv, t, lo)
        new_t = jnp.where(
            ok, t,
            jnp.where(jnp.isinf(new_hi), 2.0 * new_t_base(new_lo, t),
                      0.5 * (new_lo + new_hi)))
        return k + 1, new_t, new_lo, new_hi, xt, ft, gt, ok

    def new_t_base(lo, t):
        return jnp.maximum(lo, t)

    def cond(carry):
        k, t, lo, hi, xt, ft, gt, ok = carry
        return (k < p.max_linesearch) & (~ok)

    init = (jnp.asarray(0), t0,
            jnp.asarray(0.0, x.dtype), jnp.asarray(jnp.inf, x.dtype),
            x, f0, g0, jnp.asarray(False))
    k, t, lo, hi, xt, ft, gt, ok = jax.lax.while_loop(cond, body, init)
    # Even if Wolfe wasn't satisfied, accept the point if it decreased f
    # (bundle-method style tolerance for nonsmooth kinks).
    accept = ok | (ft < f0)
    x_new = jnp.where(accept, xt, x)
    f_new = jnp.where(accept, ft, f0)
    g_new = jnp.where(accept, gt, g0)
    # On failure, (xt, ft, gt) is the last (rejected) trial — its
    # subgradient is the bundle information for a null step.
    return t, x_new, f_new, g_new, accept, xt, gt


#: geometric trial-step grid for the parallel search, descending so
#: "largest Armijo-passing step" = first passing entry.
_LS_GRID = (2.0, 1.0, 0.5, 0.25, 0.125, 0.0625, 0.03125, 0.015625,
            0.0078125, 0.00390625, 0.001953125, 0.0009765625)


def _parallel_line_search(fun, x, f0, g0, d, p: LBFGSParams, t0):
    """Evaluate ls_candidates trial steps at once; pick the largest
    Armijo-passing one, else the best plain decrease, else null step.

    Returns the same tuple as _weak_wolfe_search."""
    dg0 = jnp.vdot(g0, d)
    c = p.ls_candidates
    ts = t0 * jnp.asarray(_LS_GRID[:c], x.dtype)           # (C,)
    xt = x[None] + ts[:, None] * d[None]                   # (C, n)
    ft, gt = jax.vmap(fun)(xt)                             # (C,), (C, n)
    armijo = ft <= f0 + p.f_dec_coeff * ts * dg0
    any_armijo = jnp.any(armijo)
    first_pass = jnp.argmax(armijo)          # largest passing t (grid desc)
    best = jnp.argmin(ft)
    pick = jnp.where(any_armijo, first_pass, best)
    t = ts[pick]
    xp, fp, gp = xt[pick], ft[pick], gt[pick]
    accept = any_armijo | (fp < f0)
    x_new = jnp.where(accept, xp, x)
    f_new = jnp.where(accept, fp, f0)
    g_new = jnp.where(accept, gp, g0)
    # on failure the lowest trial is the bundle info for the null step
    return t, x_new, f_new, g_new, accept, xp, gp


def _live_observer(it, f, gnorm):
    """Host side of LBFGSParams.live: record the iteration on the
    debugbus, service the pause/step gate, and report whether a stop
    was requested (consumed by the compiled loop as `done`)."""
    import numpy as np

    from svsdf_tpu.utils.debugbus import BUS

    BUS.log_scalar("opti_cost", float(f), step=int(it))
    BUS.log_scalar("opti_gnorm", float(gnorm), step=int(it))
    BUS.wait_if_paused()
    return np.bool_(BUS.stop_requested)


def minimize(fun: Callable, x0, params: LBFGSParams = LBFGSParams(),
             frozen: Callable | None = None) -> LBFGSResult:
    """Minimize fun. Jittable; vmap for batches.

    Without `frozen`: fun: x -> (f, g).
    With `frozen` (frozen-oracle line search): fun: x -> (f, g, state)
    where `state` is an arbitrary pytree of expensive by-products
    (e.g. the SVSDF linearization, planner/back_end.py OracleState),
    and frozen: (x, state) -> (f~, g~) is the cheap surrogate whose
    value/gradient MATCH fun at the state's own iterate. The line
    search then runs entirely on the surrogate and the true cost is
    evaluated ONCE per iteration, at the chosen trial point."""
    if frozen is None:
        return minimize_scheduled(lambda x, it: fun(x), x0, params)
    return minimize_scheduled(lambda x, it: fun(x), x0, params,
                              frozen=lambda x, it, st: frozen(x, st))


def minimize_scheduled(fun: Callable, x0,
                       params: LBFGSParams = LBFGSParams(),
                       n_iters=None, stage_bounds=None,
                       frozen: Callable | None = None) -> LBFGSResult:
    """Minimize fun: (x, it) -> (f, g), where `it` is the (traced)
    outer iteration counter — the hook for continuation schedules
    (e.g. the back end's hinge-smoothing mu ladder) to live INSIDE one
    optimizer loop instead of unrolling one L-BFGS program per stage.
    The compiled program then contains ONE copy of the cost graph;
    the unrolled 3-stage back-end solve weighed ~58 MB of executable,
    which the remote-TPU backend took minutes to (re)load per process.

    n_iters: optional TRACED iteration budget (<= params.max_iterations,
    which remains the static loop bound) — lets callers with different
    budgets share one executable.

    stage_bounds: optional (S,) traced iteration indices where the
    objective changes. When the solver converges before the last
    bound, it JUMPS to the next bound (entering the next continuation
    stage) instead of exiting, and clears the stall/null-step state —
    reproducing the per-stage restart semantics of a staged solve.
    Curvature pairs carry across stages (cautious updates reject any
    that disagree with the new landscape).

    frozen: optional surrogate (x, it, state) -> (f~, g~). When given,
    fun must be (x, it) -> (f, g, state); see `minimize`. Each
    iteration line-searches on the surrogate at the carried state,
    then pays ONE true evaluation at the chosen trial point; a trial
    whose TRUE cost does not decrease becomes a null step (with the
    true subgradient at the trial feeding the LMBM-style aggregation).
    """
    p = params
    n = x0.shape[-1]
    m = p.mem_size
    dtype = x0.dtype
    total = (jnp.asarray(p.max_iterations) if n_iters is None
             else jnp.asarray(n_iters))
    bounds = (None if stage_bounds is None
              else jnp.asarray(stage_bounds))

    if frozen is None:
        f0, g0 = fun(x0, jnp.asarray(0))
        fro0 = jnp.zeros((), dtype)         # placeholder pytree leaf
    else:
        f0, g0, fro0 = fun(x0, jnp.asarray(0))

    class Carry(NamedTuple):
        x: jnp.ndarray
        f: jnp.ndarray
        g: jnp.ndarray        # gradient at x
        ga: jnp.ndarray       # aggregate subgradient (LMBM-style)
        fro: object           # frozen-oracle state pytree (or dummy)
        s_hist: jnp.ndarray   # (m, n)
        y_hist: jnp.ndarray   # (m, n)
        rho: jnp.ndarray      # (m,)
        n_corr: jnp.ndarray   # number of valid corrections
        head: jnp.ndarray     # ring-buffer write position
        past_f: jnp.ndarray   # (past,) cost history
        nulls: jnp.ndarray    # consecutive null steps
        it: jnp.ndarray
        done: jnp.ndarray
        converged: jnp.ndarray

    def two_loop(g, s_hist, y_hist, rho, n_corr, head):
        """Standard two-loop recursion over the ring buffer."""
        idxs = (head - 1 - jnp.arange(m)) % m       # newest -> oldest
        valid = jnp.arange(m) < n_corr

        def bwd(q, i):
            valid_i = valid[i]
            s, y, r = s_hist[idxs[i]], y_hist[idxs[i]], rho[idxs[i]]
            a = r * jnp.vdot(s, q)
            a = jnp.where(valid_i, a, 0.0)
            return q - a * y * valid_i, a

        q, alphas = jax.lax.scan(bwd, g, jnp.arange(m),
                                 unroll=min(p.scan_unroll, m))
        # initial Hessian scaling gamma = s.y / y.y of newest pair
        newest = idxs[0]
        sy = jnp.vdot(s_hist[newest], y_hist[newest])
        yy = jnp.vdot(y_hist[newest], y_hist[newest])
        gamma = jnp.where((n_corr > 0) & (yy > 0), sy / jnp.maximum(yy, 1e-30),
                          1.0)
        r_ = q * gamma

        def fwd(r_, i):
            ii = m - 1 - i                            # oldest -> newest
            valid_i = valid[ii]
            s, y, rh = s_hist[idxs[ii]], y_hist[idxs[ii]], rho[idxs[ii]]
            b = rh * jnp.vdot(y, r_)
            b = jnp.where(valid_i, b, 0.0)
            return r_ + (alphas[ii] - b) * s * valid_i, None

        r_, _ = jax.lax.scan(fwd, r_, jnp.arange(m),
                             unroll=min(p.scan_unroll, m))
        return r_

    def compact_apply(g, s_hist, y_hist, rho, n_corr, head):
        """H g via the compact representation (BNS 1994):

          H = gamma I + [S gY] [[R^-T (D + g Y'Y) R^-1, -R^-T],
                                [-R^-1,                 0    ]] [S'; gY']

        with columns ordered oldest->newest and invalid ring slots
        neutralized (zero column, unit diagonal). Equal to two_loop's
        H for the same pairs/gamma; all work is (m, dim) matmuls and
        two (m, m) triangular solves — sequential depth O(1)."""
        order = (head - m + jnp.arange(m)) % m        # oldest..newest
        valid = jnp.arange(m) >= (m - n_corr)
        S = jnp.where(valid[:, None], s_hist[order], 0.0)   # (m, n)
        Y = jnp.where(valid[:, None], y_hist[order], 0.0)
        StY = S @ Y.T                                 # (m, m)
        D = jnp.diagonal(StY)
        R = jnp.triu(StY) + jnp.diag(jnp.where(valid, 0.0, 1.0))
        YtY = Y @ Y.T
        newest = (head - 1) % m
        sy = jnp.vdot(s_hist[newest], y_hist[newest])
        yy = jnp.vdot(y_hist[newest], y_hist[newest])
        gamma = jnp.where((n_corr > 0) & (yy > 0),
                          sy / jnp.maximum(yy, 1e-30), 1.0)
        p = S @ g                                     # (m,)
        q = Y @ g
        t1 = jax.scipy.linalg.solve_triangular(R, p, lower=False)
        t2 = D * t1 + gamma * (YtY @ t1) - gamma * q
        t3 = jax.scipy.linalg.solve_triangular(R.T, t2, lower=True)
        return gamma * g + t3 @ S - gamma * (t1 @ Y)

    def step(c: Carry) -> Carry:
        fun_it = lambda x: fun(x, c.it)
        use_compact = (COMPACT_DEFAULT if p.compact is None
                       else p.compact)
        apply_h = compact_apply if use_compact else two_loop
        d = -apply_h(c.ga, c.s_hist, c.y_hist, c.rho, c.n_corr, c.head)
        # safeguard: ensure descent direction; else steepest descent
        dg = jnp.vdot(d, c.ga)
        d = jnp.where(dg < 0, d, -c.ga)

        # with no curvature history, scale the first trial step to a
        # unit move (lbfgs.hpp initializes step = 1/||d||)
        t0 = jnp.where(c.n_corr == 0,
                       1.0 / jnp.maximum(jnp.linalg.norm(d), 1.0),
                       jnp.asarray(p.init_step, c.x.dtype))
        search = (_parallel_line_search if p.ls_candidates > 0
                  else _weak_wolfe_search)
        if frozen is None:
            t, x_new, f_new, g_new, ok, x_trial, g_trial = search(
                fun_it, c.x, c.f, c.ga, d, p, t0=t0)
            fro_new = c.fro
        else:
            # line search on the frozen surrogate (cheap), then ONE
            # true evaluation at the chosen trial point. The surrogate
            # agrees with the true cost at c.x (frozen state was
            # computed there), so its Armijo baseline c.f is exact.
            fro_fun = lambda xt: frozen(xt, c.it, c.fro)
            t, _, _, _, _, x_trial, _ = search(
                fro_fun, c.x, c.f, c.ga, d, p, t0=t0)
            f_t, g_t, fro_t = fun(x_trial, c.it)
            # Armijo gate on the TRUE cost (ADVICE r2): a bare strict
            # decrease let arbitrarily tiny decreases count as accepted
            # steps, so the max_nulls safeguard never tripped and
            # termination leaned on the delta stall test alone.
            ok = f_t <= c.f + p.f_dec_coeff * t * jnp.vdot(c.ga, d)
            x_new = jnp.where(ok, x_trial, c.x)
            f_new = jnp.where(ok, f_t, c.f)
            g_new = jnp.where(ok, g_t, c.g)
            g_trial = g_t
            fro_new = jax.tree.map(
                lambda a, b: jnp.where(ok, a, b), fro_t, c.fro)

        s = x_new - c.x
        y = g_new - c.g
        sy = jnp.vdot(s, y)
        # cautious update (Li–Fukushima; lbfgs.hpp cautious flag)
        gnorm = jnp.linalg.norm(c.g)
        do_update = ok & (sy > p.cautious_factor * jnp.vdot(s, s) * gnorm)
        head = c.head
        s_hist = jnp.where(do_update, c.s_hist.at[head].set(s), c.s_hist)
        y_hist = jnp.where(do_update, c.y_hist.at[head].set(y), c.y_hist)
        rho = jnp.where(do_update,
                        c.rho.at[head].set(1.0 / jnp.maximum(sy, 1e-30)),
                        c.rho)
        head = jnp.where(do_update, (head + 1) % m, head)
        n_corr = jnp.where(do_update, jnp.minimum(c.n_corr + 1, m), c.n_corr)

        # --- LMBM-style null step: the line search failed to decrease.
        # Aggregate the rejected trial's subgradient with the current
        # aggregate (min-norm convex combination, the 2-element bundle
        # of lmbm_sub.f's aggregation) and stay at x. At a kink where
        # two smooth pieces meet, the aggregate turns the conflicting
        # subgradients into a genuine descent direction.
        diff = g_trial - c.ga
        denom = jnp.vdot(diff, diff)
        lam = jnp.clip(jnp.vdot(c.ga, c.ga - g_trial) /
                       jnp.maximum(denom, 1e-30), 0.0, 1.0)
        ga_null = lam * g_trial + (1.0 - lam) * c.ga
        ga = jnp.where(ok, g_new, ga_null)
        nulls = jnp.where(ok, 0, c.nulls + 1)

        # convergence tests
        g_inf = jnp.max(jnp.abs(ga)) / jnp.maximum(
            1.0, jnp.linalg.norm(x_new))
        small_grad = g_inf < p.g_epsilon
        fpast = c.past_f[c.it % p.past]
        rel_dec = (fpast - f_new) / jnp.maximum(jnp.abs(f_new), 1e-30)
        stalled = ok & (c.it >= p.past) & (rel_dec < p.delta)
        converged = small_grad | stalled
        exhausted = nulls >= p.max_nulls
        finished = converged | exhausted

        past_f = c.past_f.at[c.it % p.past].set(f_new)
        # on a null step x is unchanged — keep the true gradient at x
        g_at_x = jnp.where(ok, g_new, c.g)
        it_next = c.it + 1
        done = finished
        if bounds is not None:
            # continuation: finished a stage early -> jump to the next
            # stage boundary (the objective changes there) and clear
            # the stall/null state; only finishing the LAST stage ends
            # the solve. The objective is DIFFERENT past the bound, so
            # f/gradient/aggregate must be re-evaluated there — a stale
            # zero gradient from the finished stage would read as
            # instant convergence of the next one.
            nb = jnp.min(jnp.where(bounds > c.it, bounds, total))
            jump = finished & (nb < total)
            it_next = jnp.where(jump, nb, it_next)
            nulls = jnp.where(jump, 0, nulls)
            past_f = jnp.where(jump, jnp.full_like(past_f, jnp.inf),
                               past_f)
            done = finished & ~jump
            if frozen is None:
                f_j, g_j = jax.lax.cond(
                    jump, lambda: fun(x_new, nb),
                    lambda: (f_new, g_at_x))
            else:
                f_j, g_j, fro_j = jax.lax.cond(
                    jump, lambda: fun(x_new, nb),
                    lambda: (f_new, g_at_x, fro_new))
                fro_new = jax.tree.map(
                    lambda a, b: jnp.where(jump, a, b), fro_j, fro_new)
            f_new = jnp.where(jump, f_j, f_new)
            g_at_x = jnp.where(jump, g_j, g_at_x)
            ga = jnp.where(jump, g_j, ga)
        if p.live:
            from jax.experimental import io_callback

            stop = io_callback(_live_observer,
                               jax.ShapeDtypeStruct((), jnp.bool_),
                               c.it, f_new,
                               jnp.max(jnp.abs(ga)), ordered=True)
            done = done | stop
        return Carry(x_new, f_new, g_at_x, ga, fro_new, s_hist,
                     y_hist, rho, n_corr, head, past_f, nulls, it_next,
                     done, converged)

    init = Carry(
        x=x0, f=f0, g=g0, ga=g0, fro=fro0,
        s_hist=jnp.zeros((m, n), dtype), y_hist=jnp.zeros((m, n), dtype),
        rho=jnp.zeros((m,), dtype), n_corr=jnp.asarray(0),
        head=jnp.asarray(0),
        past_f=jnp.full((p.past,), jnp.inf, dtype).at[0].set(f0),
        nulls=jnp.asarray(0),
        it=jnp.asarray(0), done=jnp.max(jnp.abs(g0)) < p.g_epsilon,
        converged=jnp.max(jnp.abs(g0)) < p.g_epsilon)

    def cond(c: Carry):
        return (~c.done) & (c.it < total) & (c.it < p.max_iterations)

    out = jax.lax.while_loop(cond, step, init)
    return LBFGSResult(out.x, out.f, out.g, out.it, out.converged)


def minimize_batched(fun, x0_batch, params: LBFGSParams = LBFGSParams()):
    """Lockstep batched minimize: fun maps (B, n) -> ((B,), (B, n)) is
    NOT required — fun is per-sample (n,)->(f,g); we vmap the whole
    solver so every scenario converges independently (masked)."""
    return jax.vmap(lambda x0: minimize(fun, x0, params))(x0_batch)
