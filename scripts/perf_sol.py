"""Speed-of-light analysis for the SVSDF oracle (round 5).

The committed roofline (ROOFLINE.json) places the staged solve at a
few percent of "VPU peak" — but XLA's cost analysis counts
sin/cos/sqrt as ~1 flop while the VPU executes them as multi-cycle
polynomial expansions, so transcendental-heavy elementwise code can
sit near its REAL compute bound while the naive roofline reads low.

Measurement method (two layers of hygiene, both learned the hard way
on the tunneled axon backend):
  * fresh scalar input per rep + host float() readback — identical
    dispatches can be served from a result cache, and
    block_until_ready can return at enqueue;
  * every rate is computed from the DIFFERENCE between a long and a
    short chain of the same op inside one jit — the ~34 ms
    per-dispatch tunnel floor and any constant overhead cancel.

Reports, on the real chip:
  1. elementwise throughput: mul_add / sqrt / sin / exp on a
     16M-element vector (f32 + bf16) — the hardware's actual rates;
  2. raw sdHeart SDF eval throughput at (M, K) scan shape, and the
     implied "sqrt-equivalents" per SDF eval;
  3. the production coarse-scan (pose table + SDF + argmin) rate and
     its fraction of the raw-SDF speed of light.

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

N_ELEM = 1 << 24
C_SHORT, C_LONG = 16, 144      # chain lengths; rate from the delta


def timed(fn, *args, reps=5):
    float(fn(*args, 0.0))          # compile + warm
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        float(fn(*args, 1e-7 * (i + 1)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


_ROWS = []


def emit(**kw):
    _ROWS.append(kw)
    print(json.dumps(kw), flush=True)


def chain_rate(make_run, work_per_link):
    """make_run(chain) -> jitted fn(*args, eps) -> scalar. Returns
    ops/s from the (C_LONG - C_SHORT) delta."""
    t_s = timed(*make_run(C_SHORT))
    t_l = timed(*make_run(C_LONG))
    dt = max(t_l - t_s, 1e-9)
    return work_per_link * (C_LONG - C_SHORT) / dt, t_s, t_l


def elementwise_ladder():
    x = jnp.linspace(0.5, 1.5, N_ELEM, dtype=jnp.float32)
    ops = {
        "mul_add": lambda v, e: v * (1.000001 + e) + e,
        "sqrt": lambda v, e: jnp.sqrt(v + 1.0 + e),
        "sin": lambda v, e: jnp.sin(v + e),
        "exp": lambda v, e: jnp.exp(-v + e),
    }
    rates = {}
    for name, op in ops.items():
        for dt_, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
            def make(chain, op=op, dt_=dt_):
                @jax.jit
                def run(v, eps):
                    e = jnp.asarray(eps, dt_)
                    v = v.astype(dt_)
                    for _ in range(chain):
                        v = op(v, e)
                    return v.sum(dtype=jnp.float32)
                return run, x
            rate, t_s, t_l = chain_rate(make, N_ELEM)
            rates[f"{name}_{tag}"] = rate
            emit(exp=f"elementwise_{name}_{tag}",
                 gops_per_s=round(rate / 1e9, 1),
                 t_short_ms=round(t_s * 1e3, 1),
                 t_long_ms=round(t_l * 1e3, 1))
    return rates


def sdf_eval_rate(m=4096, k=256):
    from svsdf_tpu.models import shapes
    shape = shapes.make_shape("sdHeart")
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.uniform(-2, 2, (m, k)).astype(np.float32))
    py = jnp.asarray(rng.uniform(-2, 2, (m, k)).astype(np.float32))
    out = {}
    for dt_, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        def make(chain, dt_=dt_):
            @jax.jit
            def run(px, py, eps):
                xx, yy = px.astype(dt_), py.astype(dt_)
                e = jnp.asarray(eps, dt_)
                acc = jnp.zeros((), jnp.float32)
                for i in range(chain):
                    s = shape.sdf_xy_t(xx + e + i * jnp.asarray(1e-6, dt_),
                                       yy, 0.0)
                    acc += s.sum(dtype=jnp.float32)
                return acc
            return run, px, py
        rate, t_s, t_l = chain_rate(make, m * k)
        out[tag] = rate
        emit(exp=f"sdf_eval_sdHeart_{tag}",
             gevals_per_s=round(rate / 1e9, 3),
             ns_per_eval=round(1e9 / rate, 2))
    return out


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
    out = {}
    for dt_ in (None, "bfloat16"):
        cfgd = SVSDFConfig(coarse_n=k, refine_rounds=0, scan_dtype=dt_)

        def make(chain, cfgd=cfgd):
            @jax.jit
            def run(p, eps):
                def step(acc, i):
                    s, t = svsdf.tstar_search_batch(
                        shape, traj, p + eps + i * 1e-6, cfgd)
                    return acc + s.sum(), None
                acc, _ = jax.lax.scan(step, jnp.float32(0.0),
                                      jnp.arange(chain, dtype=jnp.float32))
                return acc
            return run, pts
        rate, t_s, t_l = chain_rate(make, m * k)
        out[dt_ or "f32"] = rate
        emit(exp=f"coarse_scan_k{k}_{dt_ or 'f32'}",
             gevals_per_s=round(rate / 1e9, 3))
    return out


def main():
    emit(exp="device", device=str(jax.devices()[0]))
    rates = elementwise_ladder()
    sdf = sdf_eval_rate()
    scan = coarse_scan_rate()
    # effective hardware cost of one SDF eval, in sqrt-equivalents,
    # and the production scan's fraction of the raw-SDF ceiling
    sqrt_rate = rates.get("sqrt_f32")
    if sqrt_rate and sdf.get("f32"):
        emit(exp="sdf_sqrt_equivalents_f32",
             value=round(sqrt_rate / sdf["f32"], 1))
    if sdf.get("f32") and scan.get("f32"):
        emit(exp="scan_fraction_of_raw_sdf_f32",
             value=round(scan["f32"] / sdf["f32"], 3))
    if sdf.get("bf16") and scan.get("bfloat16"):
        emit(exp="scan_fraction_of_raw_sdf_bf16",
             value=round(scan["bfloat16"] / sdf["bf16"], 3))
    path = os.environ.get("SVSDF_SOL_RESULTS", "PERF_SOL.json")
    try:
        with open(path) as f:
            prev = json.load(f)
    except (OSError, ValueError):
        prev = {}
    prev.update({"device": str(jax.devices()[0]),
                 "experiments": _ROWS})
    with open(path, "w") as f:
        json.dump(prev, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
