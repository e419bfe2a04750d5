"""Round-5 perf ladder: A/B the staged-solve variants on the real chip.

VERDICT r4 item 1: the flagship dispatch has sat at 16.6% HBM / 1.7%
VPU for two rounds. This script measures plans/s AND high-fidelity
final cost (the quality guard — a variant that wins throughput by
converging worse is not a win) for a ladder of candidate variants:

  base            round-4 operating point (two-loop L-BFGS)
  compact         SVSDF_LBFGS_COMPACT H·g (utils/lbfgs.py:292) — the
                  already-written-but-never-A/B'd round-4 experiment
  compact_m16     compact with mem_size 16 (the compact apply makes
                  larger memory nearly free: matmul width, not depth)
  par_frozen      frozen-oracle + PARALLEL surrogate line search
                  (C trials in one batched eval, depth 1) — the r3
                  negative result was for the NON-frozen search where
                  each trial paid a full oracle pass
  interp          refine_interp_n pose interpolation in the polish
                  stage (kills the one-hot piece-gather HBM term)

Usage: python scripts/perf_r5.py [variant ...]   (default: all)
Prints one JSON line per variant.
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

B = int(os.environ.get("PR5_BATCH", "512"))
N_PIECES = 8
N_OBS = 64
ITERS = 50


def hifi_cost(shape, cfg, x_b, head, tail, obs, n):
    """Score final iterates under ONE shared high-fidelity objective
    (scripts/run_scenarios.py score_fixed semantics)."""
    import dataclasses as dc

    from svsdf_tpu.ops.svsdf import SVSDFConfig
    from svsdf_tpu.planner import back_end

    hifi = SVSDFConfig(coarse_n=256, refine_rounds=3, refine_n=32,
                       gsip_iters=8)

    @jax.jit
    def score(x_b):
        def one(x, h, t, ob):
            prob = back_end.BackEndProblem(h, t, ob)
            return back_end.make_cost_fn(shape, prob, cfg, hifi,
                                         n)(x)
        return jax.vmap(one)(x_b, head, tail, obs)

    return np.asarray(score(x_b))


def measure(name, run, x0, reps=3):
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
    return float(np.median(times)), out


def main():
    import dataclasses as dc

    from svsdf_tpu.models import shapes
    from svsdf_tpu.parallel import batch as pbatch
    from svsdf_tpu.planner import back_end
    from svsdf_tpu.utils.config import PlannerConfig

    shape = shapes.make_shape("sdHeart")
    head, tail, obs, x0 = _problem(N_PIECES, N_OBS, B)
    probs = back_end.BackEndProblem(head, tail, obs)

    def stages_variant(compact=None, ls_cand=0, ls=4, frozen=True,
                       interp=0, mem=None, iters=ITERS, coarse=None,
                       topk=None, polish_iters=None, polish_refine=None):
        st = pbatch.default_stages(iters)
        out = []
        for i, s in enumerate(st):
            scfg, n_it = s[0], s[1]
            last = i == len(st) - 1
            if interp:
                scfg = dc.replace(scfg, refine_interp_n=interp)
            if coarse and i == 0:
                scfg = dc.replace(scfg, coarse_n=coarse)
            if topk is not None and last:
                scfg = dc.replace(scfg, gsip_topk=topk)
            if polish_refine is not None and last:
                scfg = dc.replace(scfg, refine_rounds=polish_refine)
            if polish_iters is not None:
                n_it = (polish_iters if last
                        else iters - polish_iters)
            out.append((scfg, n_it, ls, ls_cand, frozen))
        return tuple(out)

    variants = {
        "base": dict(),
        "compact": dict(compact=True),
        "compact_m16": dict(compact=True, mem=16),
        "par_frozen": dict(ls_cand=4, ls=2),
        "par_frozen_c6": dict(ls_cand=6, ls=2),
        "par_frozen_c3": dict(ls_cand=3, ls=2),
        "par_frozen_compact": dict(ls_cand=4, ls=2, compact=True),
        "par_frozen_interp": dict(ls_cand=4, ls=2, interp=512),
        "par_frozen_all": dict(ls_cand=4, ls=2, compact=True,
                               interp=512),
        "interp": dict(interp=512),
        "compact_interp": dict(compact=True, interp=512),
        "pf_i40": dict(ls_cand=4, ls=2, iters=40),
        "pf_i35": dict(ls_cand=4, ls=2, iters=35),
        "pf_k64": dict(ls_cand=4, ls=2, coarse=64),
        "pf_i40_k64": dict(ls_cand=4, ls=2, iters=40, coarse=64),
        "pf_i40_p5": dict(ls_cand=4, ls=2, iters=40, polish_iters=5),
        "pf_i40_r1": dict(ls_cand=4, ls=2, iters=40, polish_refine=1),
        "pf_i40_t6": dict(ls_cand=4, ls=2, iters=40, topk=6),
        "pf_i40_p5r1": dict(ls_cand=4, ls=2, iters=40, polish_iters=5,
                            polish_refine=1),
        "pf_i40_t6_c": dict(ls_cand=4, ls=2, iters=40, topk=6,
                            compact=True),
        "pf_i40_t5": dict(ls_cand=4, ls=2, iters=40, topk=5),
        "pf_i45_t6": dict(ls_cand=4, ls=2, iters=45, topk=6),
    }
    want = sys.argv[1:] or list(variants)

    for name in want:
        kw = variants[name]
        mem = kw.get("mem") or _BENCH_MEM_SIZE
        cfg = PlannerConfig(mem_size=mem)
        stages = stages_variant(ls_cand=kw.get("ls_cand", 0),
                                ls=kw.get("ls", 4),
                                interp=kw.get("interp", 0),
                                iters=kw.get("iters", ITERS),
                                coarse=kw.get("coarse"),
                                topk=kw.get("topk"),
                                polish_iters=kw.get("polish_iters"),
                                polish_refine=kw.get("polish_refine"))
        compact = kw.get("compact")
        if compact is not None:
            os.environ["SVSDF_LBFGS_COMPACT"] = "1" if compact else ""
            import svsdf_tpu.utils.lbfgs as _l
            _l.COMPACT_DEFAULT = bool(compact)
        else:
            import svsdf_tpu.utils.lbfgs as _l
            _l.COMPACT_DEFAULT = False

        run = lambda xx: pbatch.plan_batch_staged(
            shape, xx, probs, cfg, stages, N_PIECES).opt_x
        try:
            dt, out = measure(name, run, x0)
            cost = hifi_cost(shape, cfg, out, head, tail, obs,
                             N_PIECES)
            print(json.dumps({
                "variant": name, "batch": B,
                "plans_per_s": round(B / dt, 1),
                "wall_ms": round(dt * 1e3, 1),
                "hifi_cost_median": round(float(np.median(cost)), 1),
                "hifi_cost_mean": round(float(np.mean(cost)), 1),
            }), flush=True)
        except Exception as e:                       # noqa: BLE001
            print(json.dumps({"variant": name,
                              "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
