"""Structured profiling — the reference's ad-hoc chrono accumulators
(SURVEY.md §5: A* per-expansion timing `front_end_Astar.hpp:65-67`,
back-end `total_opt_time/total_sdf_time/total_AABB_time`
`back_end_optimizer.hpp:31-33`) replaced with a TPU-aware toolkit:

  * `stage(name)` — wall-clock context manager that records into the
    module Profile and (optionally) opens a `jax.profiler.TraceAnnotation`
    so the stage shows up in XLA device traces.
  * `device_trace(logdir)` — wraps `jax.profiler.trace` for capturing
    a TensorBoard-viewable device profile of a region.
  * `timed(fn)` — decorator variant of `stage`.
  * `Profile.report()` — per-stage count/total/mean table.

All device timings are honest: `stage` BLOCKS on the result if you
pass it the output pytree (`stage(..., block=out)`), since an async
dispatch returns at enqueue time on TPU.
"""

from __future__ import annotations

import contextlib
import functools
import time
from collections import defaultdict
from typing import Any, Dict, Optional

import jax


class Profile:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    def add(self, name: str, seconds: float):
        self.totals[name] += seconds
        self.counts[name] += 1

    def report(self) -> str:
        rows = ["stage                          count   total_ms    mean_ms"]
        for name in sorted(self.totals, key=lambda k: -self.totals[k]):
            tot = self.totals[name] * 1e3
            n = self.counts[name]
            rows.append(f"{name:<30} {n:>5} {tot:>10.2f} {tot / n:>10.3f}")
        return "\n".join(rows)

    def clear(self):
        self.totals.clear()
        self.counts.clear()


#: module-level profile, like the reference's global accumulators
PROFILE = Profile()


def _block(x):
    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()


@contextlib.contextmanager
def stage(name: str, profile: Optional[Profile] = None,
          annotate: bool = True):
    """Time a stage. Inside jit-traced code the wall time is
    meaningless — use this around dispatch+block boundaries.

    with profiling.stage("back_end") as s:
        out = plan(...)
        s.block(out)        # count until the device result is real
    """
    prof = profile if profile is not None else PROFILE

    class _Handle:
        def block(self, x):
            _block(x)

    ctx = (jax.profiler.TraceAnnotation(name) if annotate
           else contextlib.nullcontext())
    t0 = time.perf_counter()
    try:
        with ctx:
            yield _Handle()
    finally:
        prof.add(name, time.perf_counter() - t0)


def timed(name: Optional[str] = None,
          profile: Optional[Profile] = None):
    """Decorator: time each call, blocking on the returned pytree."""
    def deco(fn):
        sname = name or fn.__name__

        @functools.wraps(fn)
        def wrapper(*a, **kw):
            with stage(sname, profile=profile) as s:
                out = fn(*a, **kw)
                s.block(out)
            return out

        return wrapper

    return deco


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture an XLA device trace viewable in TensorBoard/Perfetto
    (the structured replacement for printf timing; SURVEY.md §5)."""
    with jax.profiler.trace(logdir):
        yield


def bench_fn(fn, *args, reps: int = 5, warmup: int = 1,
             perturb=None) -> Dict[str, Any]:
    """Honest microbenchmark of a jitted fn: per-rep unique inputs
    (axon's result cache serves repeat executions) and a host readback
    closing the timer. perturb: fn(args, i) -> args for rep i; default
    adds 1e-5*i to the first array arg."""
    import numpy as np
    import jax.numpy as jnp

    def default_perturb(a, i):
        head = jnp.asarray(a[0]) + np.float32(1e-5 * (i + 1))
        return (head,) + tuple(a[1:])

    perturb = perturb or default_perturb
    out = fn(*args)
    _block(out)
    for _ in range(warmup):
        out = fn(*perturb(args, 997))
        _block(out)
    times = []
    for i in range(reps):
        a = perturb(args, i)
        t0 = time.perf_counter()
        out = fn(*a)
        _block(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return {"median_s": times[len(times) // 2], "min_s": times[0],
            "mean_s": sum(times) / len(times), "reps": reps}
