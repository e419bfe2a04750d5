"""Regenerate the committed memo-seed cache (svsdf_tpu/data/memo_seed).

Builds a Planner for every reference scenario (and the synthetic /
deformable extras), which populates the writable memo cache
(~/.cache/svsdf_tpu) with the one-shot stencil/kernel precomputes,
then copies every .npz entry into the repo's read-only seed dir. A
cold machine (or a wiped cache) then skips the minutes-long
rasterizations — round-2 cold build_s reached 1295 s on sdPie, almost
entirely transition-stencil compute (ops/kernels.py:136-193).

Usage:  python scripts/seed_memo_cache.py            # TPU or CPU
"""

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax
        jax.config.update("jax_platforms", want)

    from svsdf_tpu.ops.svsdf import SVSDFConfig
    from svsdf_tpu.planner.pipeline import Planner
    from svsdf_tpu.utils import cache, fixtures

    svs = SVSDFConfig(coarse_n=128, refine_rounds=2, gsip_iters=6,
                      gsip_coarse_n=64, gsip_refine_rounds=1,
                      refine_interp_n=512, gsip_fori=True)
    names = fixtures.list_scenarios()
    names += ["synthetic_" + n for n in
              fixtures.list_synthetic_scenarios()]
    for name in names:
        t0 = time.time()
        try:
            if name.startswith("synthetic_"):
                sc = fixtures.synthetic_scenario(
                    name.removeprefix("synthetic_"))
            else:
                sc = fixtures.load_scenario(name)
            p = Planner(sc.config, sc.map_points, svs_cfg=svs,
                        shape=sc.shape)
            # touch every memoized precompute the pipeline can reach:
            # guard-ladder transition stencils and the conservative
            # yaw-union kernels (the fine-yaw rung's planners build
            # their own entries only if a scenario escalates — seed
            # the first factor explicitly, it's the common rung)
            for guard in p.guard_ladder:
                if guard is not None:
                    p._stencils(guard)
            p._conservative_feas()
            fine = p._get_fine_planner(2)
            for guard in fine.guard_ladder:
                if guard is not None:
                    fine._stencils(guard)
        except Exception as e:                         # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}",
                  flush=True)
            continue
        print(f"{name}: {time.time() - t0:.1f}s", flush=True)

    seed = cache.SEED_DIR
    os.makedirs(seed, exist_ok=True)
    n = 0
    for f in os.listdir(cache.cache_dir()):
        if f.endswith(".npz"):
            shutil.copy2(os.path.join(cache.cache_dir(), f),
                         os.path.join(seed, f))
            n += 1
    print(f"seeded {n} entries -> {seed}")


if __name__ == "__main__":
    main()
