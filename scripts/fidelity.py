"""Safety-fidelity sweep: certificate/penalty error of the throughput
SVSDF schedule vs the full-GSIP f32 oracle — VERDICT r3 weak #6.

The batched solves adopt gsip_topk=8 + bf16 coarse scans on
throughput/cost A/Bs; this quantifies what that costs in the quantity
that matters for the SAFETY claim: the swept-volume SDF margin at the
obstacle points. For each of the 13 reference maps we build the
UNOPTIMIZED front-end trajectory (A* path resampled through MINCO —
deliberately wall-hugging, the worst case for certificate accuracy),
harvest the nearest 160 occupied voxels, and evaluate svsdf_query
under

  throughput: polish config of parallel/batch.py default_stages
              (coarse_n=128, gsip_iters=3, gsip_coarse_n=32,
              gsip_topk=8, bf16 coarse scan)
  oracle:     full-GSIP f32 (coarse_n=512, refine_rounds=3,
              gsip_iters=8, gsip_coarse_n=96, gsip_topk=0)

recording per scenario the max/mean |delta sdf| over all points, the
error at the binding (min-sdf) point, and whether the two configs
DISAGREE about the sign of the certificate. Writes FIDELITY.json;
pinned by tests/test_fidelity.py.

Usage: JAX_PLATFORMS=cpu python scripts/fidelity.py   (any backend)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_one(name: str) -> dict:
    import jax.numpy as jnp

    from svsdf_tpu.ops import minco
    from svsdf_tpu.ops.svsdf import SVSDFConfig, svsdf_query
    from svsdf_tpu.planner.pipeline import Planner
    from svsdf_tpu.utils import fixtures
    from svsdf_tpu.utils.transforms import backward_t  # noqa: F401

    sc = fixtures.load_any(name)
    planner = Planner(sc.config, sc.map_points, shape=sc.shape)
    front = planner.generate_path(np.asarray(sc.start),
                                  np.asarray(sc.goal))
    rec = {"name": name, "front_ok": bool(front.success)}
    if not front.success:
        return rec
    path = front.path
    q = planner._subsample(path, 3.0)
    if len(q) == 0:
        q = path[len(path) // 2][None]
    n = len(q) + 1
    head = np.zeros((3, 3))
    tail = np.zeros((3, 3))
    head[0], tail[0] = path[0], path[-1]
    times = jnp.full((n,), sc.config.inittime, jnp.float32)
    traj = minco.solve(times, jnp.asarray(head, jnp.float32),
                       jnp.asarray(tail, jnp.float32),
                       jnp.asarray(q, jnp.float32))
    obstacles = planner._harvest(q)
    if len(obstacles) == 0:
        rec["n_obstacles"] = 0
        return rec
    pts = jnp.asarray(np.asarray(obstacles)[:160, :2], jnp.float32)
    rec["n_obstacles"] = int(pts.shape[0])

    # "cert" mirrors the ACTUAL certificate config of the e2e path
    # (parallel/batch.py: polish stage with k>=192 f32 scan); the
    # penalty row measures the cheap bf16/topk SOLVE oracle
    tp_cert = SVSDFConfig(coarse_n=192, refine_rounds=2, refine_n=16,
                          gsip_iters=3, gsip_coarse_n=32,
                          gsip_refine_rounds=1, gsip_topk=6,
                          scan_dtype=None)
    # topk=6 since round 5 (the shipped default_stages polish knee)
    tp_pen = SVSDFConfig(coarse_n=128, refine_rounds=2, refine_n=16,
                         gsip_iters=3, gsip_coarse_n=32,
                         gsip_refine_rounds=1, gsip_topk=6,
                         scan_dtype="bfloat16")
    oracle = SVSDFConfig(coarse_n=512, refine_rounds=3, refine_n=32,
                         gsip_iters=8, gsip_coarse_n=96,
                         gsip_refine_rounds=1, gsip_topk=0,
                         scan_dtype=None)
    import dataclasses as _dc
    # the refine solves pin gsip_topk>=8 regardless of the throughput
    # polish trim (parallel/batch.py _certify_refine)
    tp_refine = _dc.replace(tp_pen, coarse_n=192,
                            scan_dtype=None, gsip_topk=8)
    for label, with_inside, tp in (("cert", False, tp_cert),
                                   ("penalty", True, tp_pen),
                                   ("refine", True, tp_refine)):
        a = np.asarray(svsdf_query(planner.shape, traj, pts, tp,
                                   with_inside=with_inside).sdf,
                       np.float64)
        b = np.asarray(svsdf_query(planner.shape, traj, pts, oracle,
                                   with_inside=with_inside).sdf,
                       np.float64)
        d = np.abs(a - b)
        rec[f"{label}_max_abs_err"] = round(float(d.max()), 4)
        rec[f"{label}_mean_abs_err"] = round(float(d.mean()), 5)
        i = int(np.argmin(b))
        rec[f"{label}_err_at_binding"] = round(float(d[i]), 4)
        rec[f"{label}_margin_oracle"] = round(float(b.min()), 4)
        rec[f"{label}_margin_throughput"] = round(float(a.min()), 4)
        rec[f"{label}_sign_disagree"] = bool(
            (a.min() > 0) != (b.min() > 0))
    return rec


def refine_ab(name: str = "sdOrientedVesica", reps: int = 5) -> dict:
    """Consequence A/B for the refine-tier oracle economy (VERDICT r4
    weak #6): run the online replanner's certify-refine loop on the
    worst-fidelity map twice — steered by the default ECONOMY refine
    oracle (k192 f32 scan, gsip_iters=3/topk=8) and by the FULL-GSIP
    f32 oracle — and record whether both reach the same
    certified/uncertified outcome. Appends a `_refine_ab` row to
    FIDELITY.json (pinned by tests/test_fidelity.py)."""
    import numpy as np

    from svsdf_tpu.ops.svsdf import SVSDFConfig
    from svsdf_tpu.parallel import batch as pbatch
    from svsdf_tpu.planner.online import OnlineReplanner
    from svsdf_tpu.utils import fixtures

    sc = fixtures.load_any(name)
    full = SVSDFConfig(coarse_n=256, refine_rounds=2, refine_n=16,
                       gsip_iters=8, gsip_coarse_n=96,
                       gsip_refine_rounds=1, gsip_topk=0,
                       scan_dtype=None)
    out = {"name": "_refine_ab", "map": name, "reps": reps}
    for tag, ro in (("economy", None), ("full_gsip", full)):
        t0 = time.time()
        rp = OnlineReplanner(sc.config, sc.map_points, n_pieces=12,
                             n_obs=160,
                             stages=pbatch.default_stages(80),
                             refine_rounds=6, refine_iters=12,
                             refine_svs_cfg=ro)
        rp.replan(sc.start[:2], sc.goal[:2])
        rng = np.random.default_rng(0)
        jit_r = 0.25 * sc.config.occupancy_resolution
        certs = []
        for _ in range(reps):
            s = np.asarray(sc.start[:2]) + rng.uniform(-jit_r, jit_r, 2)
            g = np.asarray(sc.goal[:2]) + rng.uniform(-jit_r, jit_r, 2)
            certs.append(rp.replan(s, g).cert_min)
        out[f"cert_median_{tag}"] = round(float(np.median(certs)), 4)
        out[f"wall_s_{tag}"] = round(time.time() - t0, 1)
    out["same_outcome"] = bool(
        (out["cert_median_economy"] > 0)
        == (out["cert_median_full_gsip"] > 0))
    path = os.environ.get("SVSDF_FIDELITY_RESULTS", "FIDELITY.json")
    try:
        with open(path) as f:
            rows = [r for r in json.load(f)
                    if r.get("name") != "_refine_ab"]
    except (OSError, ValueError):
        rows = []
    rows.append(out)
    with open(path, "w") as f:
        json.dump(rows, f, indent=1)
    print(json.dumps(out), flush=True)
    return out


def main():
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax
        jax.config.update("jax_platforms", want)
    from svsdf_tpu.utils import cache, fixtures
    cache.enable_persistent_compilation_cache()

    if "--refine-ab" in sys.argv:
        args = [a for a in sys.argv[1:] if not a.startswith("--")]
        refine_ab(*(args or ["sdOrientedVesica"]))
        return

    names = sys.argv[1:] or fixtures.list_scenarios()
    out = []
    for name in names:
        t0 = time.time()
        try:
            rec = run_one(name)
        except Exception as e:                     # noqa: BLE001
            rec = {"name": name,
                   "error": f"{type(e).__name__}: {e}"}
        rec["wall_s"] = round(time.time() - t0, 1)
        out.append(rec)
        print(json.dumps(rec), flush=True)
    errs = [r.get("cert_max_abs_err") for r in out
            if r.get("cert_max_abs_err") is not None]
    summary = {"name": "_summary",
               "n_scenarios": len(errs),
               "cert_max_abs_err_overall": (round(max(errs), 4)
                                            if errs else None),
               "any_sign_disagree": any(r.get("cert_sign_disagree")
                                        for r in out)}
    out.append(summary)
    print(json.dumps(summary), flush=True)
    path = os.environ.get("SVSDF_FIDELITY_RESULTS", "FIDELITY.json")
    # preserve rows this sweep doesn't produce (the _refine_ab
    # consequence A/B is written by --refine-ab)
    try:
        with open(path) as f:
            keep = [r for r in json.load(f)
                    if r.get("name") == "_refine_ab"]
    except (OSError, ValueError):
        keep = []
    with open(path, "w") as f:
        json.dump(out + keep, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
