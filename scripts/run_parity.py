"""Numeric parity run: score the framework on the reference's own
cost functional and measure what the reference-scope algorithm ships.

Per scenario this records:
  * reference-mode plan (A* -> mid -> one back-end solve, no
    certify-refine / retries — the reference's exact algorithmic
    scope, svsdf_tpu/planner/parity.py) + its MAP-WIDE certificate:
    a negative min_cert_sdf is a collision the reference pipeline
    would emit silently (it never checks the whole map).
  * the full pipeline's certified result.
  * both trajectories scored on the reference's EXACT back-end
    functional (energy + rho*sumT + weight_p*smoothedL1 hinge at
    mu=0.01; back_end_optimizer.hpp:344-430) over the reference-style
    AABB-harvested obstacle set.

Writes parity_results.json and regenerates the table in docs/PARITY.md
between the AUTOGEN markers.

Usage:
    python scripts/run_parity.py               # all 13
    python scripts/run_parity.py sdHeart star  # subset
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_one(name: str) -> dict:
    from svsdf_tpu.ops.svsdf import SVSDFConfig
    from svsdf_tpu.planner import parity
    from svsdf_tpu.planner.pipeline import Planner
    from svsdf_tpu.utils import fixtures

    sc = fixtures.load_scenario(name)
    svs = SVSDFConfig(coarse_n=128, refine_rounds=2, gsip_iters=6,
                      gsip_coarse_n=64, gsip_refine_rounds=1,
                      refine_interp_n=512, gsip_fori=True)
    planner = Planner(sc.config, sc.map_points, svs_cfg=svs)
    rec = {"name": name}

    t0 = time.time()
    ref_res = parity.reference_mode_plan(planner, sc.start, sc.goal)
    rec["refmode_s"] = round(time.time() - t0, 1)
    rec["refmode_success"] = bool(ref_res.success)
    if ref_res.success:
        rec["refmode_min_cert_sdf"] = round(float(ref_res.min_cert_sdf), 4)
        rec["refmode_collides"] = bool(ref_res.min_cert_sdf < 0.0)
        rc = parity.reference_cost(planner.shape, ref_res.traj,
                                   ref_res.obstacles, sc.config, svs)
        rec["refmode_ref_cost"] = {
            "energy": round(rc.energy, 2), "time": round(rc.time, 2),
            "penalty": round(rc.penalty, 2),
            "total": round(rc.total, 2),
            "min_svsdf": round(rc.min_svsdf, 4),
            "n_active": rc.n_active}

    t0 = time.time()
    full = planner.plan(sc.start, sc.goal)
    rec["full_s"] = round(time.time() - t0, 1)
    rec["full_success"] = bool(full.success)
    if full.success:
        rec["full_certified"] = bool(full.certified)
        rec["full_min_cert_sdf"] = round(float(full.min_cert_sdf), 4)
        rc = parity.reference_cost(planner.shape, full.traj,
                                   full.obstacles, sc.config, svs)
        rec["full_ref_cost"] = {
            "energy": round(rc.energy, 2), "time": round(rc.time, 2),
            "penalty": round(rc.penalty, 2),
            "total": round(rc.total, 2),
            "min_svsdf": round(rc.min_svsdf, 4),
            "n_active": rc.n_active}
    return rec


AUTOGEN_BEGIN = "<!-- AUTOGEN:parity-table begin -->"
AUTOGEN_END = "<!-- AUTOGEN:parity-table end -->"


def render_table(rows: list) -> str:
    lines = [
        AUTOGEN_BEGIN,
        "",
        "| scenario | ref-mode J_ref | ref-mode map margin | ref-mode"
        " collides | full J_ref | full map margin | certified |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in sorted(rows, key=lambda r: r["name"]):
        rm = r.get("refmode_ref_cost", {})
        fl = r.get("full_ref_cost", {})
        lines.append(
            f"| {r['name']} | {rm.get('total', '—')} | "
            f"{r.get('refmode_min_cert_sdf', '—')} | "
            f"{'YES' if r.get('refmode_collides') else 'no'} | "
            f"{fl.get('total', '—')} | "
            f"{r.get('full_min_cert_sdf', '—')} | "
            f"{'yes' if r.get('full_certified') else 'NO'} |")
    n_col = sum(1 for r in rows if r.get("refmode_collides"))
    lines += [
        "",
        f"Reference-scope algorithm ships a map-wide collision in "
        f"**{n_col}/{len(rows)}** scenarios (negative margin); the "
        "full pipeline's certify-refine ladder repairs them. "
        "J_ref = the reference's exact back-end functional "
        "(energy + rho*sumT + weight_p*smoothedL1(safety_hor - SVSDF),"
        " mu=0.01) over the AABB-harvested obstacle set.",
        AUTOGEN_END,
    ]
    return "\n".join(lines)


def update_doc(rows: list, doc="docs/PARITY.md"):
    table = render_table(rows)
    try:
        with open(doc) as f:
            text = f.read()
    except OSError:
        text = "# Parity vs the reference\n\n"
    if AUTOGEN_BEGIN in text and AUTOGEN_END in text:
        pre = text.split(AUTOGEN_BEGIN)[0]
        post = text.split(AUTOGEN_END)[1]
        text = pre + table + post
    else:
        text = text.rstrip() + "\n\n## Measured parity table\n\n" + \
            table + "\n"
    with open(doc, "w") as f:
        f.write(text)


def main():
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax
        jax.config.update("jax_platforms", want)
    from svsdf_tpu.utils import fixtures

    names = [a for a in sys.argv[1:] if not a.startswith("--")] \
        or fixtures.list_scenarios()
    path = "parity_results.json"
    try:
        with open(path) as f:
            merged = {r["name"]: r for r in json.load(f)}
    except (OSError, ValueError):
        merged = {}
    for name in names:
        rec = run_one(name)
        merged[rec["name"]] = rec
        print(json.dumps(rec), flush=True)
        with open(path, "w") as f:
            json.dump(sorted(merged.values(), key=lambda r: r["name"]),
                      f, indent=1)
        update_doc(list(merged.values()))
    print(f"# parity recorded for {len(merged)} scenarios", flush=True)


if __name__ == "__main__":
    main()
