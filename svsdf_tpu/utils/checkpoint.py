"""Checkpoint / resume for planning runs.

The reference's only persistence is start/goal fixture files
(`plan_manager.cpp:359-422`), an OBJ export, and the in-memory mid-end
-> back-end `opt_x` warm-start handoff (SURVEY.md §5). This module
makes all three first-class and adds batch-run checkpointing:

  * `save_plan` / `load_plan` — one plan artifact: decision vector,
    trajectory coefficients/durations, costs, config echo. The loaded
    `opt_x` warm-starts `back_end.optimize` (the reference's two-phase
    handoff, now resumable across processes).
  * `save_batch` / `load_batch` — a batched run's decision vectors +
    per-scenario costs/converged flags; `resume_mask` tells the caller
    which scenarios still need iterations (elastic re-dispatch after
    preemption: re-run only the unconverged lanes).
  * plain `.npz` + JSON metadata — host-portable, no framework lock-in.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, NamedTuple, Optional

import numpy as np

from svsdf_tpu.utils import trajectory as trj


class PlanCheckpoint(NamedTuple):
    opt_x: np.ndarray
    traj: Optional[trj.Trajectory]
    meta: Dict[str, Any]


def save_plan(path: str, opt_x, traj: Optional[trj.Trajectory] = None,
              **meta) -> str:
    """Write one plan checkpoint (atomic: tmp + rename)."""
    arrays = {"opt_x": np.asarray(opt_x)}
    if traj is not None:
        arrays["coeffs"] = np.asarray(traj.coeffs)
        arrays["durations"] = np.asarray(traj.durations)
    arrays["meta_json"] = np.frombuffer(
        json.dumps(meta, default=float).encode(), dtype=np.uint8)
    tmp = path + ".tmp"
    np.savez(tmp, **arrays)
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)
    return path


def load_plan(path: str) -> PlanCheckpoint:
    with np.load(path) as z:
        meta = json.loads(bytes(z["meta_json"]).decode())
        traj = None
        if "coeffs" in z:
            traj = trj.Trajectory(z["coeffs"], z["durations"])
        return PlanCheckpoint(z["opt_x"], traj, meta)


def save_batch(path: str, x_b, cost_b, converged_b, it: int = 0,
               **meta) -> str:
    """Checkpoint a batched solve mid-run (e.g. between continuation
    stages or multi-host steps)."""
    arrays = {
        "x": np.asarray(x_b),
        "cost": np.asarray(cost_b),
        "converged": np.asarray(converged_b),
        "it": np.asarray(it),
        "meta_json": np.frombuffer(
            json.dumps(meta, default=float).encode(), dtype=np.uint8),
    }
    tmp = path + ".tmp"
    np.savez(tmp, **arrays)
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)
    return path


class BatchCheckpoint(NamedTuple):
    x: np.ndarray
    cost: np.ndarray
    converged: np.ndarray
    it: int
    meta: Dict[str, Any]

    @property
    def resume_mask(self) -> np.ndarray:
        """Scenarios that still need work after a restart."""
        return ~self.converged.astype(bool)


def load_batch(path: str) -> BatchCheckpoint:
    with np.load(path) as z:
        meta = json.loads(bytes(z["meta_json"]).decode())
        return BatchCheckpoint(z["x"], z["cost"], z["converged"],
                               int(z["it"]), meta)


def save_start_end(path: str, start, goal) -> str:
    """The reference's fixture format (`plan_manager.cpp:359-422`,
    `pcds/trajectory_<shape>.txt`): 'Start:' / 'End:' lines with
    x y yaw."""
    start = np.asarray(start, float).ravel()
    goal = np.asarray(goal, float).ravel()
    with open(path, "w") as f:
        f.write(f"Start: {start[0]} {start[1]} {start[2]}\n")
        f.write(f"End: {goal[0]} {goal[1]} {goal[2]}\n")
    return path
