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


def test_refine_oracle_sign_agrees():
    """The REFINE rounds' solve oracle (k192 bf16) must never flip the
    margin's sign — the staged solve's cheaper k128 oracle may (the
    cert+refine loop exists to correct it), but the oracle the
    escalation steers by must see what it is fixing."""
    rows = [r for r in _rows() if "refine_sign_disagree" in r]
    assert len(rows) >= 13
    for r in rows:
        assert not r["refine_sign_disagree"], r
