"""Speed-of-light analysis for the SVSDF oracle (round 5).

The committed roofline (ROOFLINE.json) places the staged solve at
1.7% of VPU peak — but XLA's cost analysis counts sin/cos/sqrt/rsqrt
as ~1 flop while the VPU executes them as multi-cycle polynomial
expansions, so transcendental-heavy elementwise code can sit near its
REAL compute bound while the naive roofline reads a few percent.

This script measures, on the real chip with honest per-rep host sync:

  1. elementwise throughput ladder: mul / sqrt / sin / atan2 on a
     16M-element f32 (and bf16) array — the hardware's actual
     transcendental rates;
  2. raw shape-SDF eval throughput (sdHeart) at (M, K) scan shape —
     evals/s and the implied per-eval ns;
  3. the full coarse-scan (table SDF + argmin) throughput;
  4. from 1-3: the effective "sin-equivalents" per SDF eval and the
     fraction of the elementwise speed-of-light the scan achieves.

Prints one JSON line per experiment.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.makedirs("/root/.cache/jax_comp", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp


def timed(fn, *args, reps=5):
    """fn(*args, eps) with a FRESH eps per rep: identical re-dispatches
    can be served from the axon result cache and 'measure' the tunnel,
    not the device (bench.py measurement-hygiene note)."""
    out = fn(*args, 0.0)
    jax.block_until_ready(out)
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, 1e-7 * (i + 1))
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def emit(**kw):
    print(json.dumps(kw), flush=True)


def elementwise_ladder(n=1 << 24, chain=64):
    """Each op applied `chain` times in sequence on an n-vector inside
    one jit — amortizes launch/readback so the measured rate is the
    VPU op throughput."""
    x = jnp.linspace(0.5, 1.5, n, dtype=jnp.float32)
    ops = {
        "mul_add": lambda v: v * 1.000001 + 1e-7,
        "sqrt": lambda v: jnp.sqrt(v + 1.0),
        "rsqrt": lambda v: jax.lax.rsqrt(v + 1.0),
        "sin": lambda v: jnp.sin(v),
        "exp": lambda v: jnp.exp(-v),
        "atan2": lambda v: jnp.arctan2(v, 1.0 + v * 1e-6),
    }
    rates = {}
    for name, op in ops.items():
        for dt, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
            @jax.jit
            def run(v, eps, op=op, dt=dt):
                # eps enters INSIDE the chain so XLA cannot fold the
                # chain into one affine op (and each rep's input is
                # unique — axon result-cache hygiene)
                v = (v + eps).astype(dt)
                for _ in range(chain):
                    v = op(v + jnp.asarray(eps, dt))
                return v.sum(dtype=jnp.float32)

            dtm = timed(run, x)
            rate = n * chain / dtm
            rates[f"{name}_{tag}"] = rate
            emit(exp=f"elementwise_{name}_{tag}",
                 gops_per_s=round(rate / 1e9, 1))
    return rates


def sdf_eval_rate(m=4096, k=256, chain=32):
    from svsdf_tpu.models import shapes

    shape = shapes.make_shape("sdHeart")
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.uniform(-2, 2, (m, k)).astype(np.float32))
    py = jnp.asarray(rng.uniform(-2, 2, (m, k)).astype(np.float32))

    for dt, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        @jax.jit
        def run(px, py, eps, dt=dt):
            x, y = px.astype(dt), py.astype(dt)
            acc = jnp.zeros((), jnp.float32)
            for i in range(chain):
                s = shape.sdf_xy_t(x + jnp.asarray(eps + i * 1e-6, dt),
                                   y, 0.0)
                acc += s.sum(dtype=jnp.float32)
            return acc

        dtm = timed(run, px, py)
        rate = m * k * chain / dtm
        emit(exp=f"sdf_eval_sdHeart_{tag}",
             gevals_per_s=round(rate / 1e9, 3),
             ns_per_eval=round(1e9 / rate, 3))


def coarse_scan_rate(m=32768, k=96):
    from svsdf_tpu.models import shapes
    from svsdf_tpu.ops import minco, svsdf
    from svsdf_tpu.ops.svsdf import SVSDFConfig

    shape = shapes.make_shape("sdHeart")
    n = 8
    head = jnp.zeros((3, 3), jnp.float32)
    tail = jnp.zeros((3, 3), jnp.float32).at[0, 0].set(10.0)
    frac = np.linspace(0, 1, n + 1)[1:-1]
    wps = jnp.asarray(np.stack([10 * frac, np.sin(5 * frac), frac], -1),
                      jnp.float32)
    traj = minco.solve(jnp.full((n,), 1.5, jnp.float32), head, tail,
                       wps)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-2, 12, (m, 2)).astype(np.float32))
    for dt in (None, "bfloat16"):
        cfgd = SVSDFConfig(coarse_n=k, refine_rounds=0, scan_dtype=dt)

        @jax.jit
        def run(p, eps):
            s, t = svsdf.tstar_search_batch(shape, traj, p + eps, cfgd)
            return s.sum()

        dtm = timed(run, pts)
        emit(exp=f"coarse_scan_k{k}_{dt or 'f32'}",
             gevals_per_s=round(m * k / dtm / 1e9, 3),
             wall_ms=round(dtm * 1e3, 2))


def main():
    emit(exp="device", device=str(jax.devices()[0]))
    elementwise_ladder()
    sdf_eval_rate()
    coarse_scan_rate()


if __name__ == "__main__":
    main()
