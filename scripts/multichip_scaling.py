"""Multi-device scaling evidence for the sharded planners
(parallel/batch.py sharded_plan_batch / sharded_plan_batch_e2e) on the
virtual CPU mesh — VERDICT r3 item 4.

Two kinds of evidence, honestly separated:

1. WALL-CLOCK weak scaling, valid only while virtual devices map to
   real cores (this host has `nproc` cores; beyond that the devices
   timeshare and wall time measures the host, not the sharding).
   Recorded for every n anyway, with `cores_oversubscribed` flagged.

2. COMPILED-COLLECTIVE accounting for every n: the all-reduce /
   all-gather / collective-permute ops and their byte volumes parsed
   from the compiled HLO. This is the n-independent *design* evidence:
   scenario-data-parallel sharding must compile to ZERO cross-device
   collectives (embarrassingly parallel), and the obs-sharded lockstep
   solve's psum bytes per plan must not grow with n (each iteration
   reduces one (f, grad) pair whatever the mesh width — the
   omp-critical replacement, back_end_optimizer.hpp:855-863). Modeled
   ICI time uses the v5e inter-chip link bound (~45 GB/s/direction,
   1-D ring all-reduce moves 2*(n-1)/n * bytes per device).

Writes MULTICHIP_SCALING.json; pinned by
tests/test_multichip_scaling.py.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       JAX_PLATFORMS=cpu python scripts/multichip_scaling.py
"""

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np

ICI_BW = 4.5e10          # v5e ICI, bytes/s/direction (scaling-book bound)

_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all")

#: f32 bytes of an HLO shape string like "f32[256,29]" or a tuple
_SHAPE_RE = re.compile(r"(f32|f64|bf16|s32|u32|pred)\[([0-9,]*)\]")

_BYTES = {"f32": 4, "f64": 8, "bf16": 2, "s32": 4, "u32": 4, "pred": 1}


_GROUPS_RE = re.compile(r"replica_groups=\{([^}]*(?:\},\{[^}]*)*)\}")


def collective_stats(compiled) -> dict:
    """Parse collective ops + byte volumes out of compiled HLO text,
    split into CROSS-DEVICE collectives (replica group size > 1 — the
    ones that ride ICI) and trivial self-group ones (a psum over a
    1-wide mesh axis compiles to a singleton all-reduce, which is
    free)."""
    txt = compiled.as_text()
    ops, ops_trivial = {}, {}
    cross_bytes = 0
    for line in txt.splitlines():
        s = line.strip()
        # instruction lines look like "%x = f32[..] all-reduce(...)"
        for c in _COLLECTIVES:
            if re.search(rf"\b{c}\b", s) and "=" in s:
                gm = _GROUPS_RE.search(s)
                group_sz = 1
                if gm:
                    first = gm.group(1).split("},{")[0].strip("{}")
                    group_sz = len([t for t in first.split(",") if t])
                target = ops if group_sz > 1 else ops_trivial
                target[c] = target.get(c, 0) + 1
                if group_sz > 1:
                    m = _SHAPE_RE.search(s.split("=", 1)[1])
                    if m:
                        dt, dims = m.groups()
                        size = 1
                        for d in dims.split(","):
                            if d:
                                size *= int(d)
                        cross_bytes += size * _BYTES[dt]
                break
    return {"cross_device_collectives": ops,
            "trivial_self_collectives": ops_trivial,
            "cross_device_collective_bytes": cross_bytes}


def bench_fn(fn, args, reps=3):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax
        jax.config.update("jax_platforms", want)
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from bench import _problem, _BENCH_MEM_SIZE
    from svsdf_tpu.models import shapes
    from svsdf_tpu.ops.svsdf import SVSDFConfig
    from svsdf_tpu.parallel import batch as pbatch
    from svsdf_tpu.planner.back_end import BackEndProblem
    from svsdf_tpu.utils.config import PlannerConfig

    n_cores = os.cpu_count() or 1
    devices = jax.devices()
    assert len(devices) >= 8, devices
    shape = shapes.make_shape("sdHeart")
    cfg = PlannerConfig(mem_size=_BENCH_MEM_SIZE)
    svs = SVSDFConfig(coarse_n=64, refine_rounds=1, refine_n=8,
                      use_inside=False)
    iters = 20
    per_dev = 8            # weak scaling: lanes per device
    n_obs = 32
    rows = {"host_cores": n_cores, "n_virtual_devices": len(devices),
            "iters": iters, "per_device_batch": per_dev,
            "note": "wall-clock efficiency on virtual CPU devices is "
                    "confounded twice on this host: only "
                    f"{n_cores} physical cores back 8 devices, and "
                    "the single-device XLA:CPU baseline itself "
                    "multithreads across all cores. The committed "
                    "scaling evidence is the compiled-collective "
                    "accounting: cross-device payload per iteration "
                    "is n-independent and its modeled ICI time is "
                    "<0.1% of the measured v5e per-iteration compute "
                    "(BENCH_r03), so real-chip scaling is "
                    "compute-bound (linear).",
            "data_parallel": [], "obs_sharded": []}

    # ---- scenario-data-parallel (scn axis): zero-collective design
    base_rate = None
    for n in (1, 2, 4, 8):
        mesh = Mesh(np.asarray(devices[:n]).reshape(n, 1),
                    ("scn", "obs"))
        b = per_dev * n
        head, tail, obs, x0 = _problem(8, n_obs, b)
        solver = pbatch.sharded_plan_batch(shape, mesh, cfg, svs, 8,
                                           max_iters=iters)
        args = (x0, head, tail, obs)
        lowered = solver.lower(*args)
        comp = lowered.compile()
        stats = collective_stats(comp)
        dt = bench_fn(solver, args)
        rate = b / dt
        if base_rate is None:
            base_rate = rate
        rows["data_parallel"].append({
            "n_devices": n, "batch": b, "wall_s": round(dt, 4),
            "plans_per_s": round(rate, 2),
            "efficiency": round(rate / (n * base_rate), 3),
            "cores_oversubscribed": n > n_cores, **stats})
        print(json.dumps(rows["data_parallel"][-1]), flush=True)

    # ---- obstacle-model-parallel (obs axis): psum every iteration
    base_rate = None
    for n in (1, 2, 4, 8):
        mesh = Mesh(np.asarray(devices[:n]).reshape(1, n),
                    ("scn", "obs"))
        b = per_dev
        head, tail, obs, x0 = _problem(8, n_obs * n, b)
        solver = pbatch.sharded_plan_batch(shape, mesh, cfg, svs, 8,
                                           max_iters=iters)
        args = (x0, head, tail, obs)
        comp = solver.lower(*args).compile()
        stats = collective_stats(comp)
        dt = bench_fn(solver, args)
        # per-iteration psum payload: (f scalar + grad dim) f32 per lane
        dim = x0.shape[1]
        payload = 4 * (1 + dim) * b
        ring = 2.0 * (n - 1) / max(n, 1)
        ici_s_per_iter = ring * payload / ICI_BW
        # measured v5e compute floor: BENCH_r03 plan_batch_staged at
        # 1140 plans/s x 50 iterations => ~17.5 us device time per
        # solver iteration per plan — the number the psum must hide
        # behind for linear scaling on real chips
        v5e_iter_s = 1.0 / (1140.0 * 50.0)
        rate = b * n_obs * n / dt          # obstacle-points/s proxy
        if base_rate is None:
            base_rate = rate
        rows["obs_sharded"].append({
            "n_devices": n, "batch": b, "n_obs_total": n_obs * n,
            "wall_s": round(dt, 4),
            "obs_points_per_s": round(rate, 1),
            "efficiency": round(rate / (n * base_rate), 3),
            "cores_oversubscribed": n > n_cores,
            "psum_payload_bytes_per_iter": payload,
            "modeled_ici_s_per_iter_v5e": ici_s_per_iter,
            "modeled_ici_share_v5e_vs_measured_iter": round(
                ici_s_per_iter / (ici_s_per_iter + b * v5e_iter_s),
                6), **stats})
        print(json.dumps(rows["obs_sharded"][-1]), flush=True)

    out = os.environ.get("SVSDF_SCALING_RESULTS",
                         "MULTICHIP_SCALING.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
