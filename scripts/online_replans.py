"""Record warm OnlineReplanner latency on the 13 reference maps.

The reference replans once per goal click in interactive time
(plan_manager.cpp:271); the framework's compile-once replanner
(planner/online.py) answers in one cached-executable dispatch. This
script builds an OnlineReplanner per reference scenario, pays the
compile once, then measures `reps` warm replans between the fixture
start/goal (jittered by a fraction of a voxel so the axon result
cache cannot serve a stale answer) and records the p50/p90 wall time
plus the plan's certificate.

Writes online_replans.json (or $SVSDF_ONLINE_RESULTS) and prints one
summary line per scenario. The fast lane pins the recorded file via
tests/test_golden_scenarios.py.

Usage:  python scripts/online_replans.py            # all 13, TPU
        python scripts/online_replans.py sdHeart    # subset
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_one(name: str, reps: int = 15) -> dict:
    from svsdf_tpu.planner.online import OnlineReplanner
    from svsdf_tpu.utils import fixtures

    from svsdf_tpu.parallel import batch as pbatch

    rec = {"name": name}
    t0 = time.time()
    sc = fixtures.load_any(name)
    # round-4 operating point (tuned on sdPie, the hardest map): the
    # 3-D transition-checked front end + 80-iteration throughput
    # schedule + 6 certify-refine rounds of 12 iters with early exit
    # — p50 ~144 ms with cert_min_median > 0 (scripts/tune_online.py)
    rp = OnlineReplanner(sc.config, sc.map_points, n_pieces=12,
                         n_obs=160,
                         stages=pbatch.default_stages(80),
                         refine_rounds=6, refine_iters=12)
    res = rp.replan(sc.start[:2], sc.goal[:2])    # compile + first run
    rec["build_s"] = round(time.time() - t0, 1)
    rec["build_breakdown"] = dict(rp.build_breakdown)
    rec["front_ok"] = bool(res.success)
    rng = np.random.default_rng(0)
    jit_r = 0.25 * sc.config.occupancy_resolution
    lat = []
    cert = []
    ok = []
    for _ in range(reps):
        s = np.asarray(sc.start[:2]) + rng.uniform(-jit_r, jit_r, 2)
        g = np.asarray(sc.goal[:2]) + rng.uniform(-jit_r, jit_r, 2)
        t0 = time.time()
        r = rp.replan(s, g)
        lat.append(time.time() - t0)
        cert.append(r.cert_min)
        ok.append(r.success)
    rec["replan_p50_ms"] = round(float(np.median(lat)) * 1e3, 1)
    rec["replan_p90_ms"] = round(float(np.percentile(lat, 90)) * 1e3, 1)
    rec["success_rate"] = round(float(np.mean(ok)), 3)
    rec["cert_min_median"] = round(float(np.median(cert)), 3)
    return rec


def main():
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax
        jax.config.update("jax_platforms", want)
    from svsdf_tpu.utils import cache, fixtures
    cache.enable_persistent_compilation_cache()

    names = sys.argv[1:] or fixtures.list_scenarios()
    path = os.environ.get("SVSDF_ONLINE_RESULTS", "online_replans.json")
    try:
        with open(path) as f:
            merged = {r["name"]: r for r in json.load(f)}
    except (OSError, ValueError):
        merged = {}
    for name in names:
        try:
            rec = run_one(name)
        except Exception as e:                     # noqa: BLE001
            rec = {"name": name, "front_ok": False,
                   "error": f"{type(e).__name__}: {e}"}
        merged[rec["name"]] = rec
        print(json.dumps(rec), flush=True)
        with open(path, "w") as f:
            json.dump(sorted(merged.values(),
                             key=lambda r: r["name"]), f, indent=1)


if __name__ == "__main__":
    main()
