"""Pin the committed throughput-schedule fidelity sweep
(FIDELITY.json, scripts/fidelity.py) — VERDICT r3 weak #6.

The safety quantity is the CERTIFICATE margin error: the e2e path's
certificate config (k>=192 f32 scan) must match the full-GSIP f32
oracle at the binding obstacle point to sub-centimeter accuracy and
never disagree about the certificate's sign. The PENALTY (solve)
oracle is deliberately cheaper (bf16 scans, gsip_topk=8): at deeply
penetrating warm starts the topk truncation leaves non-binding
interior points with min-over-time SDF, so large penalty-value errors
at depth are the documented economy — what must hold is sign
agreement (the hinge drives escape either way); the final safety
claim rests on the certificate, which the refine loop gates."""

import json
import os

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_PATH = os.path.join(_ROOT, "FIDELITY.json")


def _rows():
    with open(_PATH) as f:
        return [r for r in json.load(f) if r["name"] != "_summary"]


def test_certificate_margin_error_bounded():
    rows = [r for r in _rows() if "cert_err_at_binding" in r]
    assert len(rows) >= 13, [r["name"] for r in rows]
    for r in rows:
        assert r["cert_err_at_binding"] < 0.01, r
        assert not r["cert_sign_disagree"], r


def test_refine_oracle_error_stays_inside_hinge_zone():
    """The REFINE rounds' solve oracle (k192 f32 scan, economy GSIP)
    may mis-value a barely-interior point (the gsip_iters=3 disk
    solve returned +0.0008 where the full GSIP says -0.139 on
    sdRoundedCross) — what must hold is that the error stays well
    inside the hinge's ACTIVE zone (smallest reference safety_hor is
    0.7 m): the smoothed-L1 penalty is live for sdf < safety_hor, so
    a bounded value error shifts the force a little without ever
    switching it off. The actual safety gate is the CERTIFICATE tier,
    tested above at millimeter accuracy."""
    rows = [r for r in _rows() if "refine_err_at_binding" in r]
    assert len(rows) >= 13
    for r in rows:
        # CONSERVATIVE error (throughput deeper than oracle — the
        # gsip_topk economy leaving min-over-time values at deep
        # points) is unbounded by design: it only pushes harder.
        # OPTIMISTIC error (throughput shallower) must stay inside
        # the hinge's active zone.
        optimistic = max(0.0, r["refine_margin_throughput"]
                         - r["refine_margin_oracle"])
        # bound tightened from 0.35 to measured-worst (0.156 m,
        # sdOrientedVesica) + margin (VERDICT r4 weak #6); the
        # consequence A/B (same certified outcome under economy vs f32
        # steering) is recorded in FIDELITY.json `_refine_ab`
        assert optimistic < 0.20, r


def test_refine_oracle_economy_consequence_ab():
    """The refine loop steered by the ECONOMY oracle must reach the
    same certified/uncertified outcome as one steered by the full-GSIP
    f32 oracle on the worst-fidelity map (scripts/fidelity.py
    --refine-ab; VERDICT r4 weak #6's consequence study)."""
    with open(_PATH) as f:
        rows = [r for r in json.load(f) if r["name"] == "_refine_ab"]
    assert rows, "run scripts/fidelity.py --refine-ab"
    r = rows[0]
    assert r["same_outcome"], r
    assert r["cert_median_economy"] > 0, r
