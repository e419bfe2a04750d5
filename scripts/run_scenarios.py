"""Reference-scenario regression harness.

The reference's de facto regression suite is its 13 shape scenarios
(SURVEY.md §4: launch/config/pcds fixture triples, replayed by hand).
This runner replays them end-to-end through the framework and records,
per scenario: plan success, mid/back-end costs, a collision-free
certificate (min SVSDF over the harvested obstacle set and over a
dense map-wide obstacle sample), per-stage timings, and — with
--warm — the warm replan wall time (a second plan() on the same
Planner, every executable already compiled: the number comparable to
the reference's interactive replan latency).

Usage:
    python scripts/run_scenarios.py                 # all 13 reference scenarios
    python scripts/run_scenarios.py sdHeart star    # subset
    python scripts/run_scenarios.py --extras        # + 5 synthetic gate maps
    python scripts/run_scenarios.py --warm          # also measure warm replan
    python scripts/run_scenarios.py --isolate      # subprocess per scenario
    python scripts/run_scenarios.py --solver lmbm   # back end via LMBM
    JAX_PLATFORMS=cpu python scripts/run_scenarios.py   # force CPU

Writes scenario_results.json in the CWD (or $SVSDF_RESULTS) and prints
one summary line per scenario.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_one(name: str, solver: str = "lbfgs", warm: bool = False) -> dict:
    import jax.numpy as jnp
    from svsdf_tpu.ops.svsdf import SVSDFConfig, svsdf_query
    from svsdf_tpu.planner.pipeline import Planner
    from svsdf_tpu.utils import fixtures
    from svsdf_tpu.utils import trajectory as trj

    rec = {"name": name}
    if solver != "lbfgs":
        rec["solver"] = solver
    import jax
    rec["backend"] = jax.default_backend()
    t0 = time.time()
    svs = SVSDFConfig(coarse_n=128, refine_rounds=2, gsip_iters=6,
                      gsip_coarse_n=64, gsip_refine_rounds=1, gsip_topk=16,
                      refine_interp_n=512, gsip_fori=True)
    try:
        sc = fixtures.load_any(name)
        planner = Planner(sc.config, sc.map_points, svs_cfg=svs,
                          solver=solver, shape=sc.shape)
        rec["build_s"] = round(time.time() - t0, 1)
        t0 = time.time()
        res = planner.plan(sc.start, sc.goal)
        rec["plan_s"] = round(time.time() - t0, 1)
        rec["success"] = bool(res.success)
        rec["certified"] = bool(res.certified)
        m = float(res.min_cert_sdf)
        # None (JSON null) for unexamined plans — NaN is not valid
        # strict JSON and breaks downstream parsers
        rec["min_cert_sdf"] = round(m, 4) if np.isfinite(m) else None
        if res.timings:
            rec["timings"] = res.timings
        if not res.success:
            return rec
        rec["astar_len"] = int(len(res.astar_path))
        rec["mid_cost"] = float(res.mid_cost)
        rec["final_cost"] = float(res.final_cost)
        total = float(res.traj.total_duration)
        rec["duration_s"] = round(total, 2)
        # endpoint error vs the REQUESTED goal (the pipeline pins the
        # continuous goal xy into the spline tail; the reference's
        # cell-center snap left up to res/2*sqrt(2) here)
        pT = np.asarray(trj.pos(res.traj, total - 1e-6))[:2]
        rec["goal_err_m"] = round(float(np.linalg.norm(
            pT - np.asarray(sc.goal)[:2])), 4)
        # certificate 1: harvested obstacle set
        if len(res.obstacles):
            q = svsdf_query(planner.shape, res.traj,
                            jnp.asarray(res.obstacles[:, :2]), svs)
            rec["min_svsdf_harvest"] = round(float(q.sdf.min()), 4)
        # fixed-objective re-score: energy + rho*T + base-weight SVSDF
        # penalty (reference weights, mu=0.01) of the FINAL trajectory
        # — comparable across solvers and refine ladders, unlike
        # final_cost whose penalty weight escalates per refine round
        # (VERDICT r3 weak #4)
        rec["score_fixed"] = round(score_fixed(planner, res, svs), 2)
        # certificate 2: every occupied voxel center in the 2-D slice
        # near the trajectory (one jitted dispatch via Planner.certify)
        pts, sdf = planner.certify(res.traj)
        if len(pts):
            rec["min_svsdf_map"] = round(float(sdf.min()), 4)
        if warm:
            # warm replan: same planner, every executable compiled —
            # the reference-comparable interactive replan number
            t0 = time.time()
            res2 = planner.plan(sc.start, sc.goal)
            rec["plan_warm_s"] = round(time.time() - t0, 1)
            rec["warm_certified"] = bool(res2.certified)
        if name.startswith("mesh_"):
            rec["swept_obj"] = export_swept_3d(name, sc, res)
    except Exception as e:                             # noqa: BLE001
        rec["success"] = False
        rec["error"] = f"{type(e).__name__}: {e}"
    return rec


def score_fixed(planner, res, svs) -> float:
    """One fixed objective for cross-solver comparison: spline energy
    + rho * total time + the base-weight smoothed-L1 SVSDF penalty
    (mu = 0.01, the reference's grad_cost_p_sw constant) over the
    plan's harvested obstacle set."""
    import jax.numpy as jnp
    from svsdf_tpu.ops import minco
    from svsdf_tpu.planner import back_end

    base = float(minco.energy(res.traj)
                 + planner.config.rho * jnp.sum(res.traj.durations))
    if len(res.obstacles) == 0:
        return base
    pen, _ = back_end.svsdf_penalty(
        planner.shape, res.traj, jnp.asarray(res.obstacles[:, :2]),
        planner.config, svs)
    return base + float(pen)


def export_swept_3d(name, sc, res) -> str:
    """3-D swept-volume surface of a mesh-robot plan -> OBJ artifact
    (the reference's sw_calculate + igl::marching_cubes path,
    sw_calculate.cpp:5-222, done as a dense device sweep + marching
    tetrahedra)."""
    import numpy as _np
    from svsdf_tpu.models.mesh_sdf import grid_sdf_3d, load_obj
    from svsdf_tpu.utils import trajectory as trj
    from svsdf_tpu.viz import swept_surface as sw3

    ref = name.removeprefix("mesh_")
    objpath = os.path.join(fixtures_root(), "src/plan_manager/shapes",
                           f"{ref}.obj")
    V, F = load_obj(objpath)
    g3 = grid_sdf_3d(V, F, resolution=0.15, margin=1.0)
    ts = _np.linspace(0, float(res.traj.total_duration), 64)
    xy = _np.asarray(trj.pos(res.traj, ts))[:, :2]
    r = float(_np.abs(V[:, :2]).max()) + 0.5
    bounds = (xy[:, 0].min() - r, xy[:, 0].max() + r,
              xy[:, 1].min() - r, xy[:, 1].max() + r,
              float(V[:, 2].min()) - 0.3, float(V[:, 2].max()) + 0.3)
    Vs, Fs = sw3.extract_swept_volume_3d(g3.sdf_xyz, res.traj, bounds,
                                         eps=0.25, n_t=128)
    out = f"swept_{name}.obj"
    sw3.write_trimesh_obj(Vs, Fs, out)
    return out


def fixtures_root():
    from svsdf_tpu.utils import fixtures
    return fixtures.REFERENCE_ROOT


def main():
    # The axon sitecustomize force-sets jax_platforms="axon,cpu" at
    # interpreter start, which OVERRIDES the JAX_PLATFORMS env var —
    # re-assert the user's choice via jax.config (same workaround as
    # tests/conftest.py) so `JAX_PLATFORMS=cpu python run_scenarios.py`
    # really runs on CPU.
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax
        jax.config.update("jax_platforms", want)

    from svsdf_tpu.utils import fixtures

    argv = sys.argv[1:]
    solver = "lbfgs"
    if "--solver" in argv:
        i = argv.index("--solver")
        solver = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    flags = {a for a in argv if a.startswith("--")}
    args = [a for a in argv if not a.startswith("--")]
    full_run = not args
    names = args or fixtures.list_scenarios()
    if "--extras" in flags:
        # the 5 analytic shapes the reference ships no fixtures for,
        # plus the breathing-scale deformable demo
        names = names + ["synthetic_" + n
                         for n in fixtures.list_synthetic_scenarios()] \
            + fixtures.list_deformable_scenarios()
    results_path = os.environ.get("SVSDF_RESULTS",
                                  "scenario_results.json")
    isolate = "--isolate" in flags
    out = []
    for name in names:
        if isolate:
            rec = run_isolated(name, solver, "--warm" in flags,
                               results_path)
        else:
            rec = run_one(name, solver=solver, warm="--warm" in flags)
        out.append(rec)
        print(json.dumps(rec), flush=True)
        merge_result(results_path, rec)
    if full_run:
        # a full run defines the complete scenario set: prune rows for
        # renamed/removed scenarios so the file can't drift from the
        # printed summary (stale-row bug, ADVICE.md round 1)
        prune_results(results_path, {r["name"] for r in out})
    n_ok = sum(1 for r in out if r.get("success"))
    print(f"# {n_ok}/{len(out)} scenarios succeeded", flush=True)


#: substrings marking an INFRASTRUCTURE fault of the remote TPU
#: backend (device fault / tunnel hiccup), not a planner failure —
#: worth a clean-process retry. Round-2 regression: sdRoundedX died
#: with a one-off "UNAVAILABLE: TPU device error" during kernel build
#: and the suite recorded it as a scenario failure.
_TRANSIENT = ("UNAVAILABLE", "TPU device error", "DEADLINE_EXCEEDED",
              "Socket closed", "failed to connect")


def run_isolated(name: str, solver: str, warm: bool,
                 results_path: str, retries: int = 2) -> dict:
    """Run one scenario in a SUBPROCESS so a TPU device fault (which
    poisons the faulting process's JAX runtime — every later dispatch
    raises UNAVAILABLE) cannot take the rest of the suite down with
    it. The child writes to a temp results file; we read its row back.
    Transient backend faults (_TRANSIENT) get up to `retries` fresh
    child processes before the failure is recorded."""
    import subprocess
    import tempfile

    rec = None
    for attempt in range(1 + max(retries, 0)):
        with tempfile.TemporaryDirectory() as td:
            child_path = os.path.join(td, "one.json")
            env = dict(os.environ, SVSDF_RESULTS=child_path)
            argv = [sys.executable, os.path.abspath(__file__), name]
            if warm:
                argv.append("--warm")
            if solver != "lbfgs":
                argv += ["--solver", solver]
            try:
                subprocess.run(argv, env=env, timeout=3600, check=False)
                with open(child_path) as f:
                    rec = json.load(f)[0]
            except Exception as e:                     # noqa: BLE001
                rec = {"name": name, "success": False,
                       "error": f"isolated run failed: "
                                f"{type(e).__name__}: {e}"}
        err = rec.get("error", "")
        if rec.get("success") or not any(s in err for s in _TRANSIENT):
            break
        print(f"# {name}: transient backend fault, retrying "
              f"({attempt + 1}/{retries}): {err[:100]}", flush=True)
        time.sleep(10.0 * (attempt + 1))
        rec["retried"] = attempt + 1
    return rec


def merge_result(path: str, rec: dict) -> None:
    """Upsert one scenario record into the results file. A subset
    re-run (`run_scenarios.py sdCutDisk`) must update that one row and
    keep the other 12 — an interrupted full run once wiped them."""
    try:
        with open(path) as f:
            merged = {r["name"]: r for r in json.load(f)}
    except (OSError, ValueError):
        merged = {}
    merged[rec["name"]] = rec
    with open(path, "w") as f:
        json.dump(sorted(merged.values(), key=lambda r: r["name"]),
                  f, indent=1)


def prune_results(path: str, keep: set) -> None:
    """Drop rows not in `keep` (called only after a FULL run, where the
    run's scenario list is authoritative). Synthetic extras are kept:
    they are opt-in rows a plain full run doesn't re-produce."""
    try:
        with open(path) as f:
            rows = json.load(f)
    except (OSError, ValueError):
        return
    rows = [r for r in rows
            if r["name"] in keep
            or r["name"].startswith(("synthetic_", "deformable_",
                                     "mesh_"))]
    with open(path, "w") as f:
        json.dump(sorted(rows, key=lambda r: r["name"]), f, indent=1)


if __name__ == "__main__":
    main()
