"""Deformable (shape-varying) robot demo — the paper's `useScale`
demos (SweptVolumeManager::getScale/getDotScale, sw_manager.hpp:
495-518, shipped commented-out behind the `useScale` flag).

A star robot breathing with s(t) = 1 + 0.35 sin(0.9 t) plans through
a gap narrower than its fully-inflated diameter: the optimizer times
the passage so the robot is contracted at the gap (the swept-volume
SDF sees the time-varying scale exactly, with d(scale)/dt from
jax.grad). Outputs:

  deformable_demo.json   — certificate + timing summary
  deformable_swept.obj   — swept-volume boundary mesh (if viz deps ok)

Run:  JAX_PLATFORMS=cpu python scripts/deformable_demo.py
"""

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

# re-assert JAX_PLATFORMS: the axon sitecustomize force-sets
# jax_platforms at interpreter start, overriding the env var
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp


def main():
    from svsdf_tpu.models import shapes
    from svsdf_tpu.ops.svsdf import SVSDFConfig, svsdf_query
    from svsdf_tpu.planner import back_end, mid_end
    from svsdf_tpu.utils import trajectory as trj
    from svsdf_tpu.utils.config import PlannerConfig

    scale_fn = lambda t: 1.0 + 0.35 * jnp.sin(0.9 * t)     # noqa: E731
    shape = shapes.make_scaled_shape("star", scale_fn,
                                     kernel_scale=1.35)

    # wall with a 6 m gap at x=10: the star needs diameter + 2*safety
    # <= 6.0, i.e. scale <= (6.0 - 0.8)/5.6 ~= 0.93 — it can ONLY pass
    # while contracted, so the optimizer must time the crossing to the
    # trough of s(t)
    obs_pts = []
    for y in np.arange(-10.0, 10.01, 0.5):
        if abs(y) > 3.0:
            obs_pts.append((10.0, y))
    obstacles = np.asarray(obs_pts, np.float32)

    cfg = PlannerConfig(safety_hor=0.4, weight_p=120.0)
    svs = SVSDFConfig(coarse_n=192, refine_rounds=2, gsip_iters=4,
                      gsip_coarse_n=48, gsip_refine_rounds=1)

    n = 6
    head = np.zeros((3, 3)); head[0] = [0.0, 0.0, 0.0]
    tail = np.zeros((3, 3)); tail[0] = [20.0, 0.0, 0.0]
    frac = np.linspace(0, 1, n + 1)[1:-1]
    wps = np.stack([20.0 * frac, np.zeros(n - 1), np.zeros(n - 1)], -1)
    times = np.full(n, 2.0)
    ref_rots = np.stack([np.eye(3)] * (n - 1))

    t0 = time.time()
    mid = mid_end.optimize(head, tail, wps, times, ref_rots, cfg,
                           max_iters=60)
    res = back_end.optimize(shape, head, tail,
                            np.concatenate([obstacles,
                                            np.zeros((len(obstacles), 1),
                                                     np.float32)], 1),
                            mid.opt_x, cfg, svs, max_iters=200)
    wall = time.time() - t0

    q = svsdf_query(shape, res.traj, jnp.asarray(obstacles), svs)
    min_sdf = float(q.sdf.min())
    T = float(res.traj.total_duration)
    # when does the robot cross the gap, and how contracted is it?
    ts = np.linspace(0, T, 400)
    xs = np.asarray(trj.pos(res.traj, jnp.asarray(ts)))[:, 0]
    t_gap = float(ts[np.argmin(np.abs(xs - 10.0))])
    s_gap = float(scale_fn(t_gap))
    s_max = float(np.max(np.asarray(scale_fn(jnp.asarray(ts)))))

    out = {
        "certified": min_sdf > 0.0,
        "min_svsdf": round(min_sdf, 4),
        "duration_s": round(T, 2),
        "scale_at_gap": round(s_gap, 3),
        "max_scale_on_horizon": round(s_max, 3),
        "final_cost": round(float(res.cost), 1),
        "wall_s": round(wall, 1),
    }
    print(json.dumps(out), flush=True)
    with open("deformable_demo.json", "w") as f:
        json.dump(out, f, indent=1)

    try:
        from svsdf_tpu.viz import swept_surface
        segs = swept_surface.extract_swept_boundary(
            shape, res.traj, (-4, 24, -8, 8), 0.25, svs)
        swept_surface.write_swept_obj(segs, "deformable_swept.obj")
        print("# wrote deformable_swept.obj", flush=True)
    except Exception as e:                            # noqa: BLE001
        print(f"# obj export skipped: {e}", flush=True)


if __name__ == "__main__":
    main()
