"""Benchmark: batched SVSDF planning throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Primary metric: batched back-end plans/s (full nonsmooth L-BFGS solve,
50 iterations, over a vmapped scenario batch). The reference publishes
no numbers (BASELINE.md); the north-star target is >=1000 plans/s on a
v5e-16, i.e. 62.5 plans/s/chip — vs_baseline is measured against that.
Also reports dense SVSDF grid queries/s/chip as a secondary field.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _enable_comp_cache():
    """Persistent compilation cache — repeat runs (and the driver's
    repeated bench invocations) skip the slow remote TPU recompiles."""
    import os as _os
    import jax as _jax
    _os.makedirs("/root/.cache/jax_comp", exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir",
                       "/root/.cache/jax_comp")
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


_enable_comp_cache()

import numpy as np
import jax
import jax.numpy as jnp


def _problem(n_pieces, n_obs, batch, seed=0):
    from svsdf_tpu.utils.transforms import backward_t
    rng = np.random.default_rng(seed)
    head = np.zeros((batch, 3, 3), np.float32)
    tail = np.zeros((batch, 3, 3), np.float32)
    goals = rng.uniform([6, -2], [10, 2], size=(batch, 2))
    tail[:, 0, :2] = goals
    tail[:, 0, 2] = rng.uniform(-1, 1, batch)
    frac = np.linspace(0, 1, n_pieces + 1)[1:-1]
    wps = (head[:, 0][:, None, :] * (1 - frac)[None, :, None]
           + tail[:, 0][:, None, :] * frac[None, :, None])
    wps = wps + rng.normal(0, 0.2, wps.shape)
    obs = rng.uniform([-1, -5], [11, 5], size=(batch, n_obs, 2))
    tau = np.tile(np.asarray(backward_t(jnp.full((n_pieces,), 1.5))),
                  (batch, 1))
    x0 = np.concatenate([tau, wps.reshape(batch, -1)], axis=1)
    return (jnp.asarray(head), jnp.asarray(tail), jnp.asarray(obs),
            jnp.asarray(x0.astype(np.float32)))


#: mem_size=8 for the batched solves: measured on v5e (batch 256,
#: same problem set, scan_unroll=4) m16 894 plans/s / cost 2714.0 vs
#: m8 918 plans/s / 2707.7 — the shorter two-loop recursion cuts the
#: serialization-bound iteration and the final cost is statistically
#: equal. Single-plan/API users keep the reference-parity default 16.
_BENCH_MEM_SIZE = 8


def bench_plans(n_pieces=8, n_obs=64, iters=50):
    """Full-featured (GSIP interior solve enabled) batched planning
    throughput. Tries a batch ladder — very large batches with the
    interior solve compiled in can exceed the TPU compiler's limits."""
    from svsdf_tpu.models import shapes
    from svsdf_tpu.ops.svsdf import SVSDFConfig
    from svsdf_tpu.parallel import batch as pbatch
    from svsdf_tpu.planner.back_end import BackEndProblem
    from svsdf_tpu.utils.config import PlannerConfig

    cfg = PlannerConfig(mem_size=_BENCH_MEM_SIZE)
    # v5e-tuned two-stage schedule (outside-only + GSIP polish, bf16
    # coarse scans, line-search cap 2) — see default_stages for the
    # measured speed/quality ladder.
    stages = pbatch.default_stages(iters)
    shape = shapes.make_shape("sdHeart")
    for batch in (256, 128, 32):
        try:
            head, tail, obs, x0 = _problem(n_pieces, n_obs, batch)
            probs = BackEndProblem(head, tail, obs)
            run = lambda xx: pbatch.plan_batch_staged(
                shape, xx, probs, cfg, stages, n_pieces)
            # NOTE measurement hygiene (learned on the axon backend):
            # identical re-executions can be served from a result cache
            # and async dispatch can make block_until_ready return at
            # enqueue — so every rep gets unique inputs and the timer
            # is closed by a host readback of a device reduction.
            out = run(x0)            # compile + first run
            float(out.cost.sum())
            rng = np.random.default_rng(1)
            times = []
            for _ in range(3):       # per-rep sync, fresh inputs
                xx = x0 + jnp.asarray(
                    rng.uniform(-1e-3, 1e-3, x0.shape).astype(
                        np.float32))
                t0 = time.perf_counter()
                out = run(xx)
                float(out.cost.sum())
                times.append(time.perf_counter() - t0)
            dt = float(np.median(times))
            return batch / dt, dt, batch
        except Exception as e:                     # noqa: BLE001
            print(f"# batch={batch} failed: {str(e)[:120]}",
                  file=sys.stderr)
    return float("nan"), float("nan"), 0


def bench_grid_queries(grid=256, coarse_n=256):
    from svsdf_tpu.models import shapes
    from svsdf_tpu.ops import minco
    from svsdf_tpu.ops.svsdf import SVSDFConfig, svsdf_query

    shape = shapes.make_shape("sdHeart")
    n = 6
    head = jnp.asarray([[0.0, 0.0, 0.0], [0.0] * 3, [0.0] * 3],
                       jnp.float32)
    tail = jnp.asarray([[10.0, 0.0, 1.0], [0.0] * 3, [0.0] * 3],
                       jnp.float32)
    frac = np.linspace(0, 1, n + 1)[1:-1]
    wps = jnp.asarray(np.stack([10 * frac, np.sin(5 * frac), frac], -1),
                      jnp.float32)
    traj = minco.solve(jnp.full((n,), 1.5, jnp.float32), head, tail, wps)
    xs = np.linspace(-4, 14, grid)
    ys = np.linspace(-8, 8, grid)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    pts = jnp.asarray(np.stack([gx.ravel(), gy.ravel()], -1), jnp.float32)
    svs_cfg = SVSDFConfig(coarse_n=coarse_n, refine_rounds=3)

    # Measurement: R perturbed query batches chained in ONE dispatch
    # (lax.scan carrying a running sum), closed by one host readback.
    # Fresh inputs per evaluation keep the result-cache hygiene of the
    # per-rep protocol, while the chaining amortizes the remote-chip
    # dispatch+readback latency (measured ~34 ms FLOOR per dispatch on
    # the tunneled axon backend — a 65k-point coarse scan and a 262k
    # one both "took" 34 ms host-to-host; per-rep sync was measuring
    # the tunnel, not the device).
    reps = 8
    rng = np.random.default_rng(1)
    deltas = jnp.asarray(rng.uniform(-0.1, 0.1, (reps,) + pts.shape)
                         .astype(np.float32))

    @jax.jit
    def run_chain(p, ds):
        def step(acc, d):
            s = svsdf_query(shape, traj, p + d, svs_cfg,
                            with_inside=False).sdf
            return acc + s.sum(), None
        acc, _ = jax.lax.scan(step, jnp.float32(0.0), ds)
        return acc

    float(run_chain(pts, deltas))    # compile + first run
    times = []
    for i in range(3):
        ds = deltas + jnp.float32(1e-5 * (i + 1))
        t0 = time.perf_counter()
        float(run_chain(pts, ds))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    return reps * pts.shape[0] / dt, dt / reps


def bench_e2e(batch=256, n_pieces=8, n_obs=48, iters=40):
    """Fully end-to-end batched plans/s: device wavefront front end +
    resample + harvest + staged solve, one dispatch (plan_batch_e2e)."""
    import jax.numpy as jnp
    from svsdf_tpu.models import shapes
    from svsdf_tpu.ops import kernels as kops
    from svsdf_tpu.parallel import batch as pbatch
    from svsdf_tpu.utils.config import PlannerConfig
    from svsdf_tpu.utils.gridmap import GridMap
    from svsdf_tpu.utils import mapgen

    pts = mapgen.map_forest(res=0.5, seed=3, n_trees=14)
    grid = GridMap.from_points(pts, 1.0, 1)
    shape = shapes.make_shape("sdHeart")
    cfg = PlannerConfig(mem_size=_BENCH_MEM_SIZE)
    kernels = kops.rasterize_shape_kernels(shape, 15, 8, 1.0, 0.5)
    feas = kops.feasibility_maps(jnp.asarray(grid.occ2d), kernels)
    free = np.asarray(jnp.any(feas, axis=0))
    ii, jj = np.nonzero(grid.occ2d)
    occ_pts = jnp.asarray(np.stack(
        [grid.xyz_min[0] + (ii + 0.5) * grid.resolution,
         grid.xyz_min[1] + (jj + 0.5) * grid.resolution], -1),
        jnp.float32)
    # sample start/goal from ONE connected free component so every
    # scenario is reachable (a big shape disconnects pockets of the
    # forest; unreachable pairs would just measure the front end's
    # failure path)
    from svsdf_tpu.planner import wavefront
    fi0, fj0 = np.nonzero(free)
    seed_cell = jnp.asarray([fi0[len(fi0) // 2], fj0[len(fj0) // 2]])
    dist = np.asarray(wavefront.distance_field(jnp.asarray(free),
                                               seed_cell))
    fi, fj = np.nonzero(free & (dist < 1e8))
    rng = np.random.default_rng(0)
    pick = lambda: np.stack([fi, fj], -1)[rng.integers(0, len(fi),
                                                       batch)]
    starts = jnp.asarray(pick(), jnp.int32)
    goals = jnp.asarray(pick(), jnp.int32)
    stages = pbatch.default_stages(iters)
    run = lambda s, g: pbatch.plan_batch_e2e(
        shape, feas, occ_pts, s, g, cfg, stages, n_pieces, n_obs,
        grid.resolution, jnp.asarray(grid.xyz_min[:2], jnp.float32))
    out = run(starts, goals)
    float(out.cost.sum())
    times = []
    for _ in range(3):
        s2 = jnp.asarray(pick(), jnp.int32)
        g2 = jnp.asarray(pick(), jnp.int32)
        t0 = time.perf_counter()
        out = run(s2, g2)
        float(out.cost.sum())
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    ok = float(np.mean(np.asarray(out.front_ok)))
    return batch / dt, ok


def bench_replan_latency(n_pieces=8, n_obs=64, iters=50, reps=15):
    """p50 single-plan replan latency (batch=1 staged solve) — the
    SURVEY.md §6 'p50 replan latency at 1 chip' metric. Uses the
    low-latency schedule (parallel line search: width for depth —
    measured 72 ms vs 150 ms with the throughput schedule)."""
    from svsdf_tpu.models import shapes
    from svsdf_tpu.parallel import batch as pbatch
    from svsdf_tpu.planner.back_end import BackEndProblem
    from svsdf_tpu.utils.config import PlannerConfig

    cfg = PlannerConfig()
    stages = pbatch.default_stages_lowlat(iters)
    shape = shapes.make_shape("sdHeart")
    head, tail, obs, x0 = _problem(n_pieces, n_obs, reps + 1)
    lat = []
    for i in range(reps + 1):
        probs = BackEndProblem(head[i:i + 1], tail[i:i + 1],
                               obs[i:i + 1])
        t0 = time.perf_counter()
        out = pbatch.plan_batch_staged(shape, x0[i:i + 1], probs, cfg,
                                       stages, n_pieces)
        float(out.cost.sum())
        if i > 0:                  # drop the compile run
            lat.append(time.perf_counter() - t0)
    return float(np.median(lat))


def main():
    plans_per_s, plan_dt, used_batch = bench_plans()
    queries_per_s, grid_dt = bench_grid_queries()
    try:
        replan_p50 = bench_replan_latency()
    except Exception:                              # noqa: BLE001
        replan_p50 = float("nan")
    try:
        e2e_per_s, e2e_ok = bench_e2e()
    except Exception as e:                         # noqa: BLE001
        print(f"# e2e bench failed: {str(e)[:120]}", file=sys.stderr)
        e2e_per_s, e2e_ok = float("nan"), 0.0
    target_per_chip = 1000.0 / 16.0   # north star: 1000 plans/s on v5e-16
    print(json.dumps({
        "metric": "batched_svsdf_plans_per_s_per_chip",
        "value": round(plans_per_s, 2),
        "unit": "plans/s",
        "vs_baseline": round(plans_per_s / target_per_chip, 3),
        "extra": {
            "e2e_plans_per_s": round(e2e_per_s, 2),
            "e2e_frontend_success_rate": round(e2e_ok, 3),
            "replan_latency_p50_ms": round(replan_p50 * 1e3, 2),
            "svsdf_grid_queries_per_s": round(queries_per_s, 1),
            "grid_query_batch_ms": round(grid_dt * 1e3, 2),
            "plan_batch_wall_s": round(plan_dt, 3),
            "plan_batch_size": used_batch,
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
