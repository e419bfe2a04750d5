"""Reference scenario fixture loading.

The reference's de facto regression suite is its 13 shape scenarios:
(config/<shape>.yaml, pcds/map_<shape>.pcd, pcds/trajectory_<shape>.txt
with "Start:"/"End:" lines) — see SURVEY.md §4 and the loader
LoadStartEnd (`src/plan_manager/src/plan_manager.cpp:359-422`). This
module reads those fixtures (from the read-only reference checkout or a
copy) into plain numpy/python objects.
"""

from __future__ import annotations

import dataclasses
import os
import re
from typing import Optional, Tuple

import numpy as np

from svsdf_tpu.utils.config import PlannerConfig
from svsdf_tpu.utils.pcd import read_pcd

REFERENCE_ROOT = os.environ.get("SVSDF_REFERENCE_ROOT", "/root/reference")
_PM = "src/plan_manager"


@dataclasses.dataclass
class Scenario:
    name: str
    config: PlannerConfig
    map_points: np.ndarray     # (N, 3)
    start: np.ndarray          # (3,) x, y, yaw
    goal: np.ndarray           # (3,)


def list_scenarios(root: str = REFERENCE_ROOT):
    cfg_dir = os.path.join(root, _PM, "config")
    names = []
    for f in sorted(os.listdir(cfg_dir)):
        if f.endswith(".yaml"):
            name = f[:-5]
            if os.path.exists(os.path.join(root, _PM, "pcds",
                                           f"map_{name}.pcd")):
                names.append(name)
    return names


def load_start_end(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Parse the "Start: x y z" / "End: x y z" fixture lines
    (plan_manager.cpp:396-421)."""
    start = np.zeros(3)
    end = np.zeros(3)
    with open(path) as f:
        for line in f:
            m = re.match(r"\s*Start:\s+([-\d.eE]+)\s+([-\d.eE]+)"
                         r"\s+([-\d.eE]+)", line)
            if m:
                start = np.asarray([float(g) for g in m.groups()])
            m = re.match(r"\s*End:\s+([-\d.eE]+)\s+([-\d.eE]+)"
                         r"\s+([-\d.eE]+)", line)
            if m:
                end = np.asarray([float(g) for g in m.groups()])
    return start, end


def load_scenario(name: str, root: str = REFERENCE_ROOT) -> Scenario:
    cfg = PlannerConfig.from_yaml(
        os.path.join(root, _PM, "config", f"{name}.yaml"))
    pts = read_pcd(os.path.join(root, _PM, "pcds", f"map_{name}.pcd"))
    start, goal = load_start_end(
        os.path.join(root, _PM, "pcds", f"trajectory_{name}.txt"))
    return Scenario(name=name, config=cfg, map_points=pts,
                    start=start, goal=goal)
