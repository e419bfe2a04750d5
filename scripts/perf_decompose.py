"""Decompose the staged-solve wall clock (VERDICT item 2 work).

Measures, on the real chip, with honest per-rep fresh-input + host
readback sync:
  1. the bench headline (default_stages(50), batch B)
  2. fast stage alone (40 iters)
  3. polish stage alone (10 iters)
  4. raw cost+grad eval throughput: 150 chained vg evals in one scan
     (no optimizer) — the oracle+surrogate cost floor
  5. fast-stage cost+grad eval alone (same chained protocol)
  6. two_loop + line-search overhead: solver iterations on a frozen
     quadratic with matching dimension (no SVSDF at all)

Prints one JSON line per experiment.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.makedirs("/root/.cache/jax_comp", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp

from bench import _problem, _BENCH_MEM_SIZE

B = int(os.environ.get("PD_BATCH", "256"))
N_PIECES = 8
N_OBS = 64


def timeit(run, x0, reps=3):
    out = run(x0)
    jax.block_until_ready(out)
    rng = np.random.default_rng(1)
    times = []
    for _ in range(reps):
        xx = x0 + jnp.asarray(
            rng.uniform(-1e-3, 1e-3, x0.shape).astype(np.float32))
        t0 = time.perf_counter()
        out = run(xx)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    from svsdf_tpu.models import shapes
    from svsdf_tpu.parallel import batch as pbatch
    from svsdf_tpu.planner import back_end
    from svsdf_tpu.utils import lbfgs
    from svsdf_tpu.utils.config import PlannerConfig

    cfg = PlannerConfig(mem_size=_BENCH_MEM_SIZE)
    shape = shapes.make_shape("sdHeart")
    head, tail, obs, x0 = _problem(N_PIECES, N_OBS, B)
    probs = back_end.BackEndProblem(head, tail, obs)
    stages = pbatch.default_stages(50)
    fast_cfg, fast_iters, fast_ls = stages[0][:3]
    pol_cfg, pol_iters, pol_ls = stages[1][:3]

    def rep(name, dt, per="batch"):
        print(json.dumps({"exp": name, "wall_ms": round(dt * 1e3, 2),
                          "batch": B}), flush=True)
        return dt

    # 1. headline
    run_full = jax.jit(lambda xx: pbatch.plan_batch_staged(
        shape, xx, probs, cfg, stages, N_PIECES).cost)
    dt = timeit(run_full, x0)
    rep("full_staged_50it", dt)
    print(json.dumps({"exp": "plans_per_s", "value": round(B / dt, 1)}),
          flush=True)

    # 2/3. stages alone
    for name, st in (("fast_stage_40it", ((fast_cfg, fast_iters,
                                           fast_ls),)),
                     ("polish_stage_10it", ((pol_cfg, pol_iters,
                                             pol_ls),))):
        run = jax.jit(lambda xx, st=st: pbatch.plan_batch_staged(
            shape, xx, probs, cfg, st, N_PIECES).cost)
        rep(name, timeit(run, x0))

    # 4/5. chained raw cost+grad evals (oracle floor), per stage cfg
    for name, scfg, n_chain in (("vg_chain_polish_x50", pol_cfg, 50),
                                ("vg_chain_fast_x150", fast_cfg, 150)):
        def mk(scfg, n_chain):
            def one(x, h, t, ob):
                c = back_end.make_cost_fn(
                    shape, back_end.BackEndProblem(h, t, ob), cfg,
                    scfg, N_PIECES)
                vg = jax.value_and_grad(c)

                def step(xc, _):
                    f, g = vg(xc)
                    return xc - 1e-6 * g, f
                xT, fs = jax.lax.scan(step, x, None, length=n_chain)
                return fs.sum()
            return jax.jit(lambda xx: jax.vmap(one)(xx, head, tail,
                                                    obs).sum())
        dt = rep(name, timeit(mk(scfg, n_chain), x0))
        print(json.dumps({"exp": name + "_per_eval_us",
                          "value": round(dt / n_chain * 1e6, 1)}),
              flush=True)

    # 6. solver-overhead floor: same dim, trivial quadratic cost
    dim = x0.shape[1]
    A = jnp.asarray(np.random.default_rng(0)
                    .normal(size=(dim,)).astype(np.float32)) ** 2 + 0.1

    def quad_solve(xx):
        def one(x):
            fun = lambda xc: (jnp.sum(A * xc * xc),
                              2.0 * A * xc)
            p = lbfgs.LBFGSParams(mem_size=_BENCH_MEM_SIZE,
                                  max_iterations=50, g_epsilon=0.0,
                                  delta=0.0, max_linesearch=2)
            return lbfgs.minimize(fun, x, p).f
        return jax.vmap(one)(xx).sum()
    rep("quad_solver_50it_overhead", timeit(jax.jit(quad_solve), x0))


if __name__ == "__main__":
    main()
