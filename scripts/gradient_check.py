"""Gradient sanity inspector + ESDF slice renderer.

The reference ships two ad-hoc debug tools (SURVEY.md §4.3): a
gradient-vs-finite-difference inspection script
(`debug_assistant/scripts/gradient_debug.py`) and an ESDF slice viewer
(`PCSmap_manager.cpp:47-86`, "press W/S/B"). This is the framework's
equivalent, headless:

  python scripts/gradient_check.py [shape] [--esdf out.png]

- Compares the exact `jax.grad` SVSDF gradients (world x, y and the
  full back-end cost gradient) against central finite differences and
  prints max abs/rel errors. The reference's gradients ARE finite
  differences (Shape.hpp:34-78, sw_manager.hpp:798-807); here FD is
  only the oracle.
- Optionally renders an ESDF z-slice of a procedural map to PNG.

Exit code 0 iff all gradient checks pass tolerance.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def check_svsdf_grad(shape_name: str = "sdHeart", n_pts: int = 32,
                     eps: float = 1e-3, tol: float = 5e-2) -> bool:
    import jax
    import jax.numpy as jnp
    from svsdf_tpu.models import shapes
    from svsdf_tpu.ops import minco
    from svsdf_tpu.ops.svsdf import SVSDFConfig, svsdf_query

    shape = shapes.make_shape(shape_name)
    n = 4
    head = jnp.zeros((3, 3), jnp.float32)
    tail = jnp.asarray([[8.0, 0.0, 0.8], [0] * 3, [0] * 3], jnp.float32)
    frac = np.linspace(0, 1, n + 1)[1:-1]
    wps = jnp.asarray(np.stack([8 * frac, np.sin(4 * frac), 0.8 * frac],
                               -1), jnp.float32)
    traj = minco.solve(jnp.full((n,), 1.8, jnp.float32), head, tail, wps)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform([-1, -3], [9, 3], (n_pts, 2)),
                      jnp.float32)
    cfg = SVSDFConfig(coarse_n=128, refine_rounds=3)

    def f(p):
        return svsdf_query(shape, traj, p[None], cfg,
                           with_inside=False).sdf[0]

    fv = jax.jit(jax.vmap(f))
    g_ad = jax.jit(jax.vmap(jax.grad(f)))(pts)
    g_fd = np.zeros_like(np.asarray(g_ad))
    for k in range(2):
        d = np.zeros(2, np.float32)
        d[k] = eps
        fp = fv(pts + d[None])
        fm = fv(pts - d[None])
        g_fd[:, k] = (np.asarray(fp) - np.asarray(fm)) / (2 * eps)
    # the min-over-t SDF is piecewise-smooth: at t*-switch points AD
    # and FD legitimately disagree; report the 95th percentile error
    err = np.abs(np.asarray(g_ad) - g_fd)
    p95 = float(np.quantile(err, 0.95))
    print(f"svsdf grad [{shape_name}]  max|AD-FD|={err.max():.4g}  "
          f"p95={p95:.4g}  tol(p95)={tol}")
    return p95 < tol


def check_backend_cost_grad(shape_name: str = "sdHeart",
                            eps: float = 1e-3, tol: float = 5e-2) -> bool:
    import jax
    import jax.numpy as jnp
    from svsdf_tpu.models import shapes
    from svsdf_tpu.ops.svsdf import SVSDFConfig
    from svsdf_tpu.planner import back_end
    from svsdf_tpu.utils.config import PlannerConfig
    from svsdf_tpu.utils.transforms import backward_t

    cfg = PlannerConfig()
    svs = SVSDFConfig(coarse_n=128, refine_rounds=2, gsip_iters=3,
                      gsip_coarse_n=32, gsip_refine_rounds=1)
    shape = shapes.make_shape(shape_name)
    n = 4
    head = jnp.zeros((3, 3), jnp.float32)
    tail = jnp.asarray([[8.0, 0.0, 0.5], [0] * 3, [0] * 3], jnp.float32)
    frac = np.linspace(0, 1, n + 1)[1:-1]
    wps = np.stack([8 * frac, 0.4 * np.sin(5 * frac), 0.5 * frac], -1)
    rng = np.random.default_rng(1)
    obs = jnp.asarray(rng.uniform([-1, -3], [9, 3], (32, 2)), jnp.float32)
    problem = back_end.BackEndProblem(head, tail, obs)
    cost = jax.jit(back_end.make_cost_fn(shape, problem, cfg, svs, n))
    tau = np.asarray(backward_t(jnp.full((n,), 1.8)))
    x0 = jnp.asarray(np.concatenate([tau, wps.reshape(-1)]), jnp.float32)

    g_ad = np.asarray(jax.jit(jax.grad(cost))(x0))
    # one batched FD stencil: all 2*len(x) perturbed costs in one vmap
    d = eps * np.eye(len(x0), dtype=np.float32)
    xs = jnp.concatenate([x0[None] + d, x0[None] - d], axis=0)
    cs = np.asarray(jax.jit(jax.vmap(cost))(xs))
    g_fd = (cs[:len(x0)] - cs[len(x0):]) / (2 * eps)
    scale = np.maximum(np.abs(g_fd), 1.0)
    rel = np.abs(g_ad - g_fd) / scale
    p95 = float(np.quantile(rel, 0.95))
    print(f"back-end cost grad [{shape_name}]  max rel={rel.max():.4g}  "
          f"p95={p95:.4g}  tol(p95)={tol}")
    return p95 < tol


def render_esdf_slice(out_path: str) -> None:
    import jax.numpy as jnp
    from svsdf_tpu.ops import esdf as esdf_ops
    from svsdf_tpu.utils import mapgen
    from svsdf_tpu.utils.gridmap import GridMap

    pts = mapgen.map_forest(res=0.4, seed=2, n_trees=10)
    grid = GridMap.from_points(pts, 0.4, 1)
    field = np.asarray(esdf_ops.esdf(jnp.asarray(grid.occ), 0.4))
    z = field.shape[2] // 2
    sl = field[:, :, z]
    # normalize to a PNG via the scene renderer's colormap-free path
    lo, hi = float(sl.min()), float(sl.max())
    img = ((sl - lo) / max(hi - lo, 1e-9) * 255).astype(np.uint8)
    try:
        from PIL import Image
        Image.fromarray(img.T[::-1]).save(out_path)
        print(f"ESDF slice z={z} -> {out_path} (range [{lo:.2f},{hi:.2f}] m)")
    except ImportError:
        np.save(out_path + ".npy", sl)
        print(f"PIL unavailable; ESDF slice saved to {out_path}.npy")


def main():
    argv = sys.argv[1:]
    esdf_out = None
    if "--esdf" in argv:
        i = argv.index("--esdf")
        nxt = argv[i + 1] if i + 1 < len(argv) else None
        esdf_out = nxt if nxt and not nxt.startswith("--") \
            else "esdf_slice.png"
        # consume the flag AND its value so the output filename can't
        # leak into the positional shape argument (ADVICE.md round 1)
        argv = argv[:i] + argv[i + (2 if esdf_out == nxt else 1):]
    args = [a for a in argv if not a.startswith("--")]
    shape = args[0] if args else "sdHeart"
    ok = check_svsdf_grad(shape) & check_backend_cost_grad(shape)
    if esdf_out:
        render_esdf_slice(esdf_out)
    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
