"""REAL multi-process multi-host execution test.

Round 1 only ever exercised parallel/multihost.py in single-process
pass-through mode. Here we spawn 2 actual OS processes, each with 4
virtual CPU devices, join them into one JAX job via
`multihost.initialize` (localhost coordinator), lay a (scn, obs)
pod_mesh over the 8 global devices, run the FULL sharded back-end
solve (`sharded_plan_batch`, per-iteration psum gradient merges across
the obs axis), and assert the result equals the single-process
8-virtual-device run of the identical problem.

This is the framework's own §2.6/§5 design obligation (the reference
has no distributed story at all — SURVEY.md §2.6).
"""

import json
import os
import socket
import subprocess
import sys
import tempfile

import numpy as np
import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# -- shared problem ---------------------------------------------------------

_N_PIECES = 5
_BATCH = 4        # scenarios (scn mesh axis)
_OBS_SHARDS = 2
_N_OBS = 16       # obstacle points per scenario (sharded over obs axis)
_MAX_ITERS = 12


def _problem():
    """Deterministic small planning batch (numpy only — safe to build
    identically in every process)."""
    rng = np.random.default_rng(7)
    head = np.zeros((_BATCH, 3, 3), np.float32)
    tail = np.zeros((_BATCH, 3, 3), np.float32)
    tail[:, 0, :2] = rng.uniform([6, -2], [9, 2], size=(_BATCH, 2))
    frac = np.linspace(0, 1, _N_PIECES + 1)[1:-1]
    wps = (head[:, 0][:, None, :] * (1 - frac)[None, :, None]
           + tail[:, 0][:, None, :] * frac[None, :, None])
    wps = wps + rng.normal(0, 0.1, wps.shape).astype(np.float32)
    obs = rng.uniform([-1, -4], [10, 4],
                      size=(_BATCH, _N_OBS, 2)).astype(np.float32)
    tau = np.zeros((_BATCH, _N_PIECES), np.float32)
    x0 = np.concatenate([tau, wps.reshape(_BATCH, -1)],
                        axis=1).astype(np.float32)
    return head, tail, obs, x0


def _solve(mesh):
    """Build + run the sharded solve on the given mesh; returns
    (x, cost) as numpy (global view)."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from svsdf_tpu.models import shapes
    from svsdf_tpu.ops.svsdf import SVSDFConfig
    from svsdf_tpu.parallel import batch as pbatch
    from svsdf_tpu.parallel import multihost
    from svsdf_tpu.utils.config import PlannerConfig

    head, tail, obs, x0 = _problem()
    shape = shapes.make_shape("sdHeart")
    cfg = PlannerConfig()
    svs = SVSDFConfig(coarse_n=48, refine_rounds=1, refine_n=8,
                      use_inside=False)
    solve = pbatch.sharded_plan_batch(shape, mesh, cfg, svs, _N_PIECES,
                                      max_iters=_MAX_ITERS,
                                      max_linesearch=2)
    sl = multihost.process_slice(_BATCH)
    xb = multihost.global_batch_array(x0[sl], mesh, P("scn"))
    hb = multihost.global_batch_array(head[sl], mesh, P("scn"))
    tb = multihost.global_batch_array(tail[sl], mesh, P("scn"))
    # obstacle axis sharded: each process holds its scn slice, full obs
    ob = multihost.global_batch_array(obs[sl], mesh, P("scn", "obs"))
    x, cost, iters, conv = solve(xb, hb, tb, ob)
    return multihost.fetch_global(x), multihost.fetch_global(cost)


def _worker(rank: int, port: int, outdir: str):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    from svsdf_tpu.parallel import multihost

    active = multihost.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2,
        process_id=rank)
    assert active, "distributed runtime did not come up"
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8, jax.devices()
    mesh = multihost.pod_mesh(n_obs_shards=_OBS_SHARDS)
    x, cost = _solve(mesh)
    multihost.barrier("test-done")
    if rank == 0:
        np.savez(os.path.join(outdir, "multi.npz"), x=x, cost=cost)


def _single(outdir: str):
    """Single-process 8-virtual-device baseline (same dtype/env as the
    workers — the in-test pytest process runs x64, which diverges from
    the f32 workers after a few nonsmooth iterations)."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    from svsdf_tpu.parallel import multihost

    assert len(jax.devices()) == 8, jax.devices()
    mesh = multihost.pod_mesh(n_obs_shards=_OBS_SHARDS)
    x, cost = _solve(mesh)
    np.savez(os.path.join(outdir, "single.npz"), x=x, cost=cost)


@pytest.mark.slow
def test_two_process_sharded_plan_matches_single():
    port = _free_port()
    with tempfile.TemporaryDirectory() as outdir:
        procs = []
        for rank in range(2):
            env = dict(
                os.environ,
                JAX_PLATFORMS="cpu",
                XLA_FLAGS="--xla_force_host_platform_device_count=4",
                PYTHONPATH=_ROOT + os.pathsep
                + os.environ.get("PYTHONPATH", ""),
            )
            procs.append(subprocess.Popen(
                [sys.executable, os.path.abspath(__file__),
                 "worker", str(rank), str(port), outdir],
                env=env, stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT))
        logs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=420)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                pytest.fail("multi-process worker timed out")
            logs.append(out.decode(errors="replace"))
        for rank, (p, log) in enumerate(zip(procs, logs)):
            assert p.returncode == 0, f"rank {rank} failed:\n{log}"

        with np.load(os.path.join(outdir, "multi.npz")) as z:
            x_multi, cost_multi = z["x"], z["cost"]

        # single-process baseline: spawned with the identical env so
        # dtype and device count match the workers exactly
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=8",
            PYTHONPATH=_ROOT + os.pathsep
            + os.environ.get("PYTHONPATH", ""),
        )
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "single",
             outdir], env=env, capture_output=True, timeout=420)
        assert p.returncode == 0, p.stdout.decode() + p.stderr.decode()
        with np.load(os.path.join(outdir, "single.npz")) as z:
            x_single, cost_single = z["x"], z["cost"]

        np.testing.assert_allclose(cost_multi, cost_single,
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(x_multi, x_single,
                                   rtol=1e-3, atol=1e-3)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "worker":
        _worker(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    elif len(sys.argv) >= 2 and sys.argv[1] == "single":
        _single(sys.argv[2])
