"""Aux subsystems: profiling and checkpoint/resume."""

import numpy as np
import jax
import jax.numpy as jnp

from svsdf_tpu.ops import minco
from svsdf_tpu.utils import checkpoint, profiling
from svsdf_tpu.utils import trajectory as trj
from svsdf_tpu.utils.fixtures import load_start_end


def test_profile_stage_and_report():
    prof = profiling.Profile()
    with profiling.stage("work", profile=prof) as s:
        x = jnp.ones((64, 64)) @ jnp.ones((64, 64))
        s.block(x)
    with profiling.stage("work", profile=prof):
        pass
    assert prof.counts["work"] == 2
    assert prof.totals["work"] > 0
    assert "work" in prof.report()


def test_timed_decorator():
    prof = profiling.Profile()

    @profiling.timed("f", profile=prof)
    def f(x):
        return x * 2

    assert float(f(jnp.asarray(3.0))) == 6.0
    assert prof.counts["f"] == 1


def test_bench_fn_returns_stats():
    fn = jax.jit(lambda x: (x @ x).sum())
    out = profiling.bench_fn(fn, jnp.ones((32, 32)), reps=3)
    assert out["median_s"] > 0 and out["min_s"] <= out["median_s"]


def _traj():
    head = jnp.zeros((3, 3), jnp.float32)
    tail = jnp.zeros((3, 3), jnp.float32).at[0, 0].set(5.0)
    wps = jnp.asarray([[1.5, 0.1, 0.0], [3.5, -0.1, 0.1]], jnp.float32)
    return minco.solve(jnp.full((3,), 1.5, jnp.float32), head, tail, wps)


def test_plan_checkpoint_roundtrip(tmp_path):
    traj = _traj()
    x = np.arange(9, dtype=np.float32)
    p = checkpoint.save_plan(str(tmp_path / "plan.npz"), x, traj,
                             scenario="sdHeart", final_cost=42.0)
    ck = checkpoint.load_plan(p)
    np.testing.assert_allclose(ck.opt_x, x)
    np.testing.assert_allclose(np.asarray(ck.traj.coeffs),
                               np.asarray(traj.coeffs), rtol=1e-6)
    assert ck.meta["scenario"] == "sdHeart"
    ts = np.linspace(0, float(traj.total_duration), 20)
    np.testing.assert_allclose(
        np.asarray(trj.eval_at(ck.traj, jnp.asarray(ts), 0)),
        np.asarray(trj.eval_at(traj, jnp.asarray(ts), 0)), rtol=1e-5)


def test_batch_checkpoint_resume_mask(tmp_path):
    x = np.random.default_rng(0).normal(0, 1, (6, 10)).astype(np.float32)
    cost = np.arange(6.0)
    conv = np.asarray([True, False, True, False, False, True])
    p = checkpoint.save_batch(str(tmp_path / "b.npz"), x, cost, conv,
                              it=17, stage="mu=0.1")
    ck = checkpoint.load_batch(p)
    assert ck.it == 17
    assert ck.meta["stage"] == "mu=0.1"
    np.testing.assert_array_equal(ck.resume_mask,
                                  [False, True, False, True, True,
                                   False])


def test_start_end_fixture_roundtrip(tmp_path):
    p = checkpoint.save_start_end(str(tmp_path / "se.txt"),
                                  [1.0, 2.0, 0.5], [8.0, -1.0, 0.1])
    start, goal = load_start_end(p)
    np.testing.assert_allclose(start, [1.0, 2.0, 0.5])
    np.testing.assert_allclose(goal, [8.0, -1.0, 0.1])


def test_scenario_results_merge_preserves_other_rows(tmp_path):
    """A subset scenario re-run must upsert its row, not clobber the
    full results file (scripts/run_scenarios.py merge_result)."""
    import importlib.util
    import json
    import os

    spec = importlib.util.spec_from_file_location(
        "run_scenarios",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts", "run_scenarios.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    path = str(tmp_path / "scenario_results.json")
    with open(path, "w") as f:
        json.dump([{"name": "sdHeart", "success": True},
                   {"name": "sdCutDisk", "success": False}], f)
    mod.merge_result(path, {"name": "sdCutDisk", "success": True})
    with open(path) as f:
        rows = {r["name"]: r for r in json.load(f)}
    assert rows["sdCutDisk"]["success"] is True
    assert rows["sdHeart"]["success"] is True      # preserved
    # fresh file: merge into nothing
    path2 = str(tmp_path / "new.json")
    mod.merge_result(path2, {"name": "star", "success": True})
    with open(path2) as f:
        assert [r["name"] for r in json.load(f)] == ["star"]


def test_memoize_npz_seed_fallback(tmp_path, monkeypatch):
    """memoize_npz consults the committed read-only seed cache after
    the writable dir (utils/cache.py SEED_DIR): a cold machine reuses
    shipped stencil precomputes instead of recomputing for minutes."""
    import hashlib

    import numpy as np

    from svsdf_tpu.utils import cache

    writable = tmp_path / "writable"
    seed = tmp_path / "seed"
    writable.mkdir()
    seed.mkdir()
    monkeypatch.setenv("SVSDF_CACHE_DIR", str(writable))
    monkeypatch.setattr(cache, "SEED_DIR", str(seed))

    key = "unit-test-key"
    fname = hashlib.md5(key.encode()).hexdigest() + ".npz"
    np.savez_compressed(seed / fname, arr=np.asarray([1, 2, 3]))

    def boom():
        raise AssertionError("seed hit must not recompute")

    np.testing.assert_array_equal(cache.memoize_npz(key, boom),
                                  [1, 2, 3])
    # a miss computes and lands in the WRITABLE dir, not the seed
    out = cache.memoize_npz("other-key", lambda: np.ones(2))
    np.testing.assert_array_equal(out, [1.0, 1.0])
    assert len(list(writable.glob("*.npz"))) == 1
    assert len(list(seed.glob("*.npz"))) == 1
