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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_max_isa" not in flags:
    # this host's XLA:CPU JIT segfaults intermittently above AVX2
    # (ISA misdetection; see tests/conftest.py)
    flags = (flags + " --xla_cpu_max_isa=AVX2").strip()
os.environ["XLA_FLAGS"] = flags

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


def _pinned_child(n: int) -> None:
    """Child entry for the core-pinned DP weak-scaling measurement:
    runs the n-device DP solve with the PROCESS restricted (by the
    parent's taskset) to n physical cores, so the n=1 baseline cannot
    borrow the whole host through XLA:CPU's intra-op threading — the
    confound behind round-4's unexplained 0.752 n=2 efficiency."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    from bench import _problem, _BENCH_MEM_SIZE
    from svsdf_tpu.models import shapes
    from svsdf_tpu.ops.svsdf import SVSDFConfig
    from svsdf_tpu.parallel import batch as pbatch
    from svsdf_tpu.utils.config import PlannerConfig

    shape = shapes.make_shape("sdHeart")
    cfg = PlannerConfig(mem_size=_BENCH_MEM_SIZE)
    svs = SVSDFConfig(coarse_n=64, refine_rounds=1, refine_n=8,
                      use_inside=False)
    devices = jax.devices()
    mesh = Mesh(np.asarray(devices[:n]).reshape(n, 1), ("scn", "obs"))
    b = 8 * n
    head, tail, obs, x0 = _problem(8, 32, b)
    solver = pbatch.sharded_plan_batch(shape, mesh, cfg, svs, 8,
                                       max_iters=20)
    dt = bench_fn(solver, (x0, head, tail, obs))
    print(json.dumps({"pinned_n": n, "wall_s": round(dt, 4),
                      "plans_per_s": round(b / dt, 2)}), flush=True)


def _pinned_rate(n: int):
    """Run _pinned_child under `taskset -c 0..n-1`; parse its rate."""
    import subprocess
    env = dict(os.environ, MS_PINNED_CHILD=str(n))
    cores = ",".join(str(i) for i in range(n))
    try:
        out = subprocess.run(
            ["taskset", "-c", cores, sys.executable,
             os.path.abspath(__file__)], env=env, timeout=1200,
            capture_output=True, text=True, check=False)
        for line in out.stdout.splitlines():
            if line.startswith("{") and "pinned_n" in line:
                return json.loads(line)
    except Exception as e:                             # noqa: BLE001
        return {"pinned_n": n, "error": str(e)[:120]}
    return {"pinned_n": n, "error": "no output",
            "stderr": out.stderr[-300:]}


def main():
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax
        jax.config.update("jax_platforms", want)
    if os.environ.get("MS_PINNED_CHILD"):
        _pinned_child(int(os.environ["MS_PINNED_CHILD"]))
        return
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

    # ---- core-pinned DP weak scaling (n <= physical cores): the
    # n-device measurement runs in a subprocess restricted to n cores,
    # so the 1-device baseline cannot borrow the whole host via
    # XLA:CPU intra-op threads (the round-4 0.752 n=2 confound)
    rows["data_parallel_pinned"] = []
    base = None
    for n in range(1, min(n_cores, 8) + 1):
        rec = _pinned_rate(n)
        if "plans_per_s" in rec:
            if base is None:
                base = rec["plans_per_s"]
            rec["efficiency_vs_pinned_base"] = round(
                rec["plans_per_s"] / (n * base), 3)
        rows["data_parallel_pinned"].append(rec)
        print(json.dumps(rec), flush=True)

    # ---- END-TO-END data-parallel sharding (sharded_plan_batch_e2e:
    # wavefront front end + staged solve, scenarios over 'scn'):
    # collective accounting at n = 1..8 + wall clock (oversubscription
    # flagged). The e2e program is front-end + solve with NO cross-
    # scenario coupling, so the design gate is zero cross-device
    # collectives, like plain DP.
    from svsdf_tpu.ops import kernels as kops
    from svsdf_tpu.utils import mapgen
    from svsdf_tpu.utils.gridmap import GridMap
    from svsdf_tpu.planner import wavefront

    pts = mapgen.map_forest(res=0.5, seed=3, n_trees=6, extent=18.0)
    grid = GridMap.from_points(pts, 1.0, 1)
    kernels = kops.rasterize_shape_kernels(shape, 15, 8, 1.0, 0.5)
    feas = kops.feasibility_maps(jnp.asarray(grid.occ2d), kernels)
    free = np.asarray(jnp.any(feas, axis=0))
    ii, jj = np.nonzero(grid.occ2d)
    occ_pts = jnp.asarray(np.stack(
        [grid.xyz_min[0] + (ii + 0.5) * grid.resolution,
         grid.xyz_min[1] + (jj + 0.5) * grid.resolution], -1),
        jnp.float32)
    fi0, fj0 = np.nonzero(free)
    seed_cell = jnp.asarray([fi0[len(fi0) // 2], fj0[len(fj0) // 2]])
    dist = np.asarray(wavefront.distance_field(jnp.asarray(free),
                                               seed_cell))
    fi, fj = np.nonzero(free & (dist < 1e8))
    rng = np.random.default_rng(0)
    stages = pbatch.default_stages(12)
    per_dev_e2e = 2
    rows["e2e_data_parallel"] = []
    base_rate = None
    for n in (1, 2, 4, 8):
        mesh = Mesh(np.asarray(devices[:n]), ("scn",))
        b = per_dev_e2e * n
        pick = lambda: np.stack([fi, fj], -1)[
            rng.integers(0, len(fi), b)]
        starts = jnp.asarray(pick(), jnp.int32)
        goals = jnp.asarray(pick(), jnp.int32)
        runner = pbatch.sharded_plan_batch_e2e(
            shape, mesh, cfg, stages, 6, 16, grid.resolution,
            jnp.asarray(grid.xyz_min[:2], jnp.float32))
        args = (feas, occ_pts, starts, goals)
        comp = runner.lower(*args).compile()
        stats = collective_stats(comp)
        dt = bench_fn(runner, args)
        rate = b / dt
        if base_rate is None:
            base_rate = rate
        rows["e2e_data_parallel"].append({
            "n_devices": n, "batch": b, "wall_s": round(dt, 4),
            "plans_per_s": round(rate, 2),
            "efficiency": round(rate / (n * base_rate), 3),
            "cores_oversubscribed": n > n_cores, **stats})
        print(json.dumps(rows["e2e_data_parallel"][-1]), flush=True)

    out = os.environ.get("SVSDF_SCALING_RESULTS",
                         "MULTICHIP_SCALING.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
