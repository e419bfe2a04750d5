"""Hyperparameter probe for the in-dispatch certify-refine loop
(parallel/batch.py _certify_refine): build an OnlineReplanner on one
reference map with the given knobs and print replan latency +
certificate stats. Exploration tool behind scripts/online_replans.py's
recorded defaults.

Usage: python scripts/tune_online.py sdPie [rounds] [iters] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax
        jax.config.update("jax_platforms", want)
    from svsdf_tpu.utils import cache, fixtures
    cache.enable_persistent_compilation_cache()
    from svsdf_tpu.parallel import batch as pbatch
    from svsdf_tpu.planner.online import OnlineReplanner

    name = sys.argv[1] if len(sys.argv) > 1 else "sdPie"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 10
    sched = sys.argv[5] if len(sys.argv) > 5 else "tp"
    sched_iters = int(sys.argv[6]) if len(sys.argv) > 6 else 120
    stages = (pbatch.default_stages(sched_iters) if sched == "tp"
              else pbatch.default_stages_lowlat(sched_iters))

    sc = fixtures.load_any(name)
    yawn = os.environ.get("YAWN")
    if yawn:
        import dataclasses
        sc.config = dataclasses.replace(sc.config,
                                        kernel_yaw_num=int(yawn))
    t0 = time.time()
    cm = os.environ.get("CM")
    rp = OnlineReplanner(sc.config, sc.map_points, n_pieces=12,
                         n_obs=160, stages=stages,
                         refine_rounds=rounds, refine_iters=iters,
                         cert_margin=float(cm) if cm else None)
    res = rp.replan(sc.start[:2], sc.goal[:2])
    print(f"build+compile {time.time() - t0:.1f}s front_ok={res.success} "
          f"first cert={res.cert_min:.3f}")
    rng = np.random.default_rng(0)
    jit_r = 0.25 * sc.config.occupancy_resolution
    lat, cert = [], []
    for _ in range(reps):
        s = np.asarray(sc.start[:2]) + rng.uniform(-jit_r, jit_r, 2)
        g = np.asarray(sc.goal[:2]) + rng.uniform(-jit_r, jit_r, 2)
        t0 = time.time()
        r = rp.replan(s, g)
        lat.append(time.time() - t0)
        cert.append(r.cert_min)
    cert = np.asarray(cert)
    print(f"{name} rounds={rounds} iters={iters} sched={sched}{sched_iters}: "
          f"p50={np.median(lat)*1e3:.1f}ms p90={np.percentile(lat,90)*1e3:.1f}ms "
          f"cert_med={np.median(cert):.3f} cert_min={cert.min():.3f} "
          f"frac_cert={float(np.mean(cert > 0)):.2f}")


if __name__ == "__main__":
    main()
