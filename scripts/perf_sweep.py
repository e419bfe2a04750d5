"""A/B knob sweep for the staged batched solve (VERDICT r1 item 2).

Each experiment reports plans/s AND the high-fidelity final cost
median of the returned solutions (scored with one full-GSIP evaluation
per scenario) — throughput gains only count at equal-or-lower cost.

Usage: python scripts/perf_sweep.py [exp ...]
  exps: batch512 batch1024 ls1 ls1fast interp polish_topk4 base
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

import dataclasses
import numpy as np
import jax.numpy as jnp

from bench import _problem, _BENCH_MEM_SIZE

N_PIECES = 8
N_OBS = 64
ITERS = 50


def hifi_cost(shape, cfg, probs, xs):
    """Score solutions on one full-fidelity functional (shared across
    experiments so costs are comparable)."""
    from svsdf_tpu.ops.svsdf import SVSDFConfig
    from svsdf_tpu.planner import back_end

    hifi = SVSDFConfig(coarse_n=256, refine_rounds=3, gsip_iters=8,
                       gsip_coarse_n=96, gsip_refine_rounds=1)

    def one(x, h, t, ob):
        c = back_end.make_cost_fn(
            shape, back_end.BackEndProblem(h, t, ob), cfg, hifi,
            N_PIECES)
        return c(x)

    f = jax.jit(lambda xb: jax.vmap(one)(xb, probs.head, probs.tail,
                                         probs.obstacles))
    return float(jnp.median(f(xs)))


def run_exp(name, batch, stages):
    from svsdf_tpu.models import shapes
    from svsdf_tpu.parallel import batch as pbatch
    from svsdf_tpu.planner.back_end import BackEndProblem
    from svsdf_tpu.utils.config import PlannerConfig

    cfg = PlannerConfig(mem_size=_BENCH_MEM_SIZE)
    shape = shapes.make_shape("sdHeart")
    head, tail, obs, x0 = _problem(N_PIECES, N_OBS, batch)
    probs = BackEndProblem(head, tail, obs)
    run = jax.jit(lambda xx: pbatch.plan_batch_staged(
        shape, xx, probs, cfg, stages, N_PIECES))
    out = run(x0)
    jax.block_until_ready(out.cost)
    rng = np.random.default_rng(1)
    times = []
    for _ in range(3):
        xx = x0 + jnp.asarray(rng.uniform(-1e-3, 1e-3, x0.shape)
                              .astype(np.float32))
        t0 = time.perf_counter()
        out = run(xx)
        jax.block_until_ready(out.cost)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    cost = hifi_cost(shape, cfg, probs, out.opt_x)
    print(json.dumps({"exp": name, "batch": batch,
                      "plans_per_s": round(batch / dt, 1),
                      "wall_s": round(dt, 3),
                      "hifi_cost_median": round(cost, 1)}), flush=True)


def stages_variant(ls_fast=2, ls_pol=2, topk=8, interp=0,
                   fast_coarse=96, frozen=False):
    from svsdf_tpu.ops.svsdf import SVSDFConfig
    fast = SVSDFConfig(coarse_n=fast_coarse, refine_rounds=0,
                       refine_n=16, use_inside=False,
                       scan_dtype="bfloat16")
    polish = SVSDFConfig(coarse_n=128, refine_rounds=2, refine_n=16,
                         gsip_iters=3, gsip_coarse_n=32,
                         gsip_refine_rounds=1, gsip_topk=topk,
                         scan_dtype="bfloat16",
                         refine_interp_n=interp)
    k = max(ITERS // 5, 5)
    return ((fast, ITERS - k, ls_fast, 0, frozen),
            (polish, k, ls_pol, 0, frozen))


EXPS = {
    "base": lambda: run_exp("base", 256, stages_variant()),
    "batch512": lambda: run_exp("batch512", 512, stages_variant()),
    "batch1024": lambda: run_exp("batch1024", 1024, stages_variant()),
    "ls1": lambda: run_exp("ls1", 256, stages_variant(1, 1)),
    "ls1fast": lambda: run_exp("ls1fast", 256, stages_variant(1, 2)),
    "interp": lambda: run_exp("interp", 256,
                              stages_variant(interp=256)),
    "polish_topk4": lambda: run_exp("polish_topk4", 256,
                                    stages_variant(topk=4)),
    "frozen": lambda: run_exp("frozen", 256,
                              stages_variant(frozen=True)),
    "frozen_ls4": lambda: run_exp("frozen_ls4", 256,
                                  stages_variant(4, 4, frozen=True)),
    "frozen_b512": lambda: run_exp("frozen_b512", 512,
                                   stages_variant(frozen=True)),
    # round-4 frontier: the bench operating point (frozen ls=4, b512)
    # +/- one knob each. Run "r4compact" under SVSDF_LBFGS_COMPACT=1.
    "r4base": lambda: run_exp("r4base", 512,
                              stages_variant(4, 4, frozen=True)),
    "r4interp": lambda: run_exp("r4interp", 512,
                                stages_variant(4, 4, interp=256,
                                               frozen=True)),
    "r4interp512": lambda: run_exp("r4interp512", 512,
                                   stages_variant(4, 4, interp=512,
                                                  frozen=True)),
    "r4compact": lambda: run_exp("r4compact", 512,
                                 stages_variant(4, 4, frozen=True)),
}


def main():
    names = sys.argv[1:] or list(EXPS)
    for n in names:
        try:
            EXPS[n]()
        except Exception as e:                         # noqa: BLE001
            print(json.dumps({"exp": n,
                              "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
