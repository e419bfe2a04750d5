"""Live optimizer observability: per-iteration streaming from INSIDE
the compiled solve (io_callback), live dashboard rendering during the
solve, pause/single-step, and mid-loop abort — the reference's
debug_assistant loop (plan_manager.cpp:431-445, DBSendOptiStep /
DBSendLogCost, debugpause step-through back_end_optimizer.hpp:
1093-1103)."""

import threading
import time

import numpy as np
import jax.numpy as jnp

from svsdf_tpu.models import shapes
from svsdf_tpu.ops.svsdf import SVSDFConfig
from svsdf_tpu.planner import back_end
from svsdf_tpu.utils.debugbus import BUS
from svsdf_tpu.utils.transforms import backward_t

SVS = SVSDFConfig(coarse_n=32, refine_rounds=1, refine_n=8,
                  use_inside=False)


def _problem(n=4):
    rng = np.random.default_rng(0)
    head = np.zeros((3, 3), np.float32)
    tail = np.zeros((3, 3), np.float32)
    tail[0] = [6.0, 0.5, 0.3]
    wps = np.stack([np.linspace(1.5, 4.5, n - 1),
                    rng.normal(0, 0.2, n - 1),
                    np.zeros(n - 1)], -1).astype(np.float32)
    obs = rng.uniform([0, -2.5], [6, 2.5], (12, 2)).astype(np.float32)
    x0 = np.concatenate([np.asarray(backward_t(jnp.full((n,), 1.4))),
                         wps.ravel()]).astype(np.float32)
    return head, tail, obs, x0


def _reset_bus():
    BUS.series.clear()
    BUS.events.clear()
    BUS.clear_stop()
    BUS.resume()


def _optimize(live=True, max_iters=40):
    shape = shapes.make_shape("Circle")
    head, tail, obs, x0 = _problem()
    return back_end.optimize(shape, head, tail, obs, x0, svs_cfg=SVS,
                             max_iters=max_iters, live=live)


def test_live_stream_renders_dashboard_during_solve(tmp_path):
    from svsdf_tpu.viz.dashboard import LiveDashboard

    _reset_bus()
    out = str(tmp_path / "live.html")
    with LiveDashboard(BUS, out, interval_s=0.05) as live:
        res = _optimize(live=True)
    assert np.isfinite(float(res.cost))
    steps = BUS.series.get("opti_cost", [])
    assert len(steps) >= 5                 # one entry per iteration
    # costs are (t, step, value); the final cost must appear and the
    # dashboard must have rendered at least once DURING the solve
    assert live.renders >= 1
    with open(out) as f:
        html = f.read()
    assert "opti_cost" in html


def test_stop_request_aborts_mid_solve():
    _reset_bus()
    BUS.request_stop()
    try:
        res = _optimize(live=True, max_iters=200)
        # the compiled loop consumed the stop flag on iteration 0/1
        assert int(res.n_iters) <= 2
    finally:
        _reset_bus()


def test_pause_and_single_step():
    _reset_bus()
    BUS.pause()
    done = {}

    def run():
        done["res"] = _optimize(live=True, max_iters=30)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    # paused: the device loop blocks inside the ordered callback after
    # the first iteration's observer call
    deadline = time.time() + 120
    while not BUS.series.get("opti_cost") and time.time() < deadline:
        time.sleep(0.02)
    n0 = len(BUS.series.get("opti_cost", []))
    assert n0 >= 1
    time.sleep(0.5)
    assert len(BUS.series["opti_cost"]) <= n0 + 1   # stalled
    BUS.step()                       # release exactly one iteration
    time.sleep(1.0)
    n1 = len(BUS.series["opti_cost"])
    assert n1 <= n0 + 2
    BUS.resume()                     # release the gate; solve finishes
    t.join(timeout=120)
    assert not t.is_alive()
    assert "res" in done and np.isfinite(float(done["res"].cost))
    assert len(BUS.series["opti_cost"]) > n1
