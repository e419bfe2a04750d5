"""Localize the sdHorseshoe TPU device fault (UNAVAILABLE kernel
fault, reproduced twice on the axon backend; the identical plan
certifies clean on CPU with attempts=2).

Hypothesis: the fault is in an attempt-1 executable — the retry rung
densifies waypoint spacing 3 m -> 1 m, tripling the MINCO piece count
(n ~ 20 -> ~60), which mints much larger mid/back-end programs.

Runs each pipeline stage separately with unbuffered stage prints so
the last line before a fault names the faulting program. Stage order
mirrors Planner._attempt (pipeline.py:469).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    from svsdf_tpu.ops.svsdf import SVSDFConfig
    from svsdf_tpu.planner import back_end, mid_end
    from svsdf_tpu.planner.pipeline import Planner, _rotz
    from svsdf_tpu.utils import fixtures

    parlength = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    sc = fixtures.load_scenario("sdHorseshoe")
    svs = SVSDFConfig(coarse_n=128, refine_rounds=2, gsip_iters=6,
                      gsip_coarse_n=64, gsip_refine_rounds=1,
                      refine_interp_n=512, gsip_fori=True)
    log("backend:", jax.default_backend())
    t0 = time.time()
    p = Planner(sc.config, sc.map_points, svs_cfg=svs, shape=sc.shape)
    log("build ok", round(time.time() - t0, 1))

    t0 = time.time()
    front = p.generate_path(np.asarray(sc.start), np.asarray(sc.goal))
    log("front ok", front.success, "len", len(front.path),
        round(time.time() - t0, 1))
    path = front.path
    q = p._subsample(path, parlength)
    obstacles = p._harvest(q)
    n = len(q) + 1
    log("subsample parlength", parlength, "-> n_pieces", n,
        "n_obs", len(obstacles))

    head = np.zeros((3, 3))
    tail = np.zeros((3, 3))
    head[0] = path[0]
    tail[0] = path[-1]
    times = np.full(n, p.config.inittime)
    ref_rots = np.stack([_rotz(w[2]) for w in q])

    t0 = time.time()
    mid = mid_end.optimize(head, tail, q, times, ref_rots, p.config,
                           max_iters=100)
    jax.block_until_ready(mid.opt_x)
    log("mid ok", round(time.time() - t0, 1), "cost", float(mid.cost))

    obstacles = p._pad_obstacles(obstacles, headroom=512)
    t0 = time.time()
    back = back_end.optimize(p.shape, head, tail, obstacles, mid.opt_x,
                             p.config, p.svs_cfg, max_iters=200)
    jax.block_until_ready(back.opt_x)
    log("back ok", round(time.time() - t0, 1), "cost", float(back.cost))

    t0 = time.time()
    pts, sdf = p.certify(back.traj)
    log("certify ok", round(time.time() - t0, 1), "n_pts", len(pts),
        "min_sdf", float(sdf.min()) if len(sdf) else None)
    log("ALL STAGES OK at parlength", parlength)


if __name__ == "__main__":
    main()
