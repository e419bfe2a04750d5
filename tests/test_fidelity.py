"""Pin the committed throughput-schedule fidelity sweep
(FIDELITY.json, scripts/fidelity.py) — VERDICT r3 weak #6.

The batched solves run gsip_topk=8 + bf16 coarse scans; the committed
sweep measures what that costs against the full-GSIP f32 oracle on
the 13 reference maps. The SAFETY quantity is the error at the
binding (minimum-SDF) obstacle point — the certificate margin — which
must stay within the front end's own voxel-rounding noise. Large
max-point errors far from the binding point are expected: gsip_topk
leaves non-binding deep-interior points with their (more negative)
min-over-time SDF, which is conservative for the penalty."""

import json
import os

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_PATH = os.path.join(_ROOT, "FIDELITY.json")


def _rows():
    with open(_PATH) as f:
        return [r for r in json.load(f) if r["name"] != "_summary"]


def test_fidelity_margin_error_bounded():
    rows = [r for r in _rows() if "cert_err_at_binding" in r]
    assert len(rows) >= 13, [r["name"] for r in rows]
    for r in rows:
        # certificate-margin error of the throughput schedule
        assert r["cert_err_at_binding"] < 0.05, r
        assert not r["cert_sign_disagree"], r
        # the binding-point penalty error must also be small (the
        # optimizer steers by it near convergence)
        assert r["penalty_err_at_binding"] < 0.15, r
        assert not r["penalty_sign_disagree"], r


def test_fidelity_penalty_errors_are_conservative_at_depth():
    """Where gsip_topk truncation bites (penalty_max_abs_err large),
    the throughput value must err NEGATIVE (deeper penetration =>
    larger penalty), never optimistic at the margin."""
    for r in _rows():
        if "penalty_margin_throughput" not in r:
            continue
        # allow binding-error slack; beyond it the throughput margin
        # must not be more optimistic than the oracle
        assert (r["penalty_margin_throughput"]
                <= r["penalty_margin_oracle"]
                + r["penalty_err_at_binding"] + 1e-6), r
