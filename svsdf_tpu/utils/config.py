"""Flat planner configuration mirroring the reference Config struct.

Field names match `src/utils/include/utils/config.hpp:13-95` so the 13
shipped per-shape YAML files (`src/plan_manager/config/*.yaml`) load
unmodified. The reference fills this from the ROS parameter server
(LOAD_PARAM macro, config.hpp:96-223); here it is a plain dataclass +
PyYAML loader.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence


@dataclasses.dataclass(frozen=True)
class PlannerConfig:
    # shape / robot
    inputdata: str = "shapes/sdHeart.obj"
    poly_params: Sequence[float] = (0.0, 0.0, 0.0)
    loadStartEnd: bool = True
    colli_thres: float = 0.15
    selfmapresu: float = 0.05
    threads_num: int = 12          # kept for parity; TPU batches instead

    momentum: float = 0.0
    eps: float = 0.3               # swept-mesh surface resolution (viz)
    testRate: float = 100.0
    scale: float = 2.0
    ts: float = 2.0

    # flatness model
    vehicleMass: float = 0.61
    gravAcc: float = 9.8
    horizDrag: float = 0.10
    vertDrag: float = 0.10
    parasDrag: float = 0.01
    speedEps: float = 0.0001

    # map
    mapTopic: str = "/voxel_map"
    voxelWidth: float = 0.15
    mapBound: Sequence[float] = (-25.0, 25.0, -25.0, 25.0, 0.0, 15.0)
    occupancy_resolution: float = 1.0
    debug_output: bool = False
    sta_threshold: int = 1
    kernel_size: int = 21          # odd; kernel extent in voxels
    kernel_yaw_num: int = 18       # even; yaw bins for shape kernels
    front_end_safeh: float = 0.0

    # back end
    enableearlyExit: bool = True
    debugpause: int = 1
    smoothingEps: float = 1.0e-2
    integralIntervs: int = 4
    relCostTol: float = 1.0e-20
    relCostTolMidEnd: float = 1.0e-10
    vmax: float = 10.0
    omgmax: float = 10.0
    thetamax: float = 100.0
    weight_v: float = 10.0
    weight_a: float = 10.0
    weight_p: float = 60.0
    weight_pr: float = 40.0
    weight_ar: float = 0.0
    weight_omg: float = 10.0
    weight_theta: float = 10.0
    rho_mid_end: float = 2.0
    rho: float = 3.8
    safety_hor: float = 0.8
    inittime: float = 2.5

    # L-BFGS / LMBM solver knobs
    mem_size: int = 16
    past: int = 64
    min_step: float = 1.0e-32
    g_epsilon: float = 0.0
    #: single-plan back-end solver economy (fields the reference lacks;
    #: its LMBM terminates on its own bundle criteria). The shipped
    #: YAMLs set relCostTol=1e-20, which makes the L-BFGS stall test
    #: vacuous — every solve then burns its full iteration schedule
    #: (measured: star warm replan 140 s, 138 s of it in 4 full-budget
    #: back-end dispatches). back_rel_stall is the effective relative-
    #: decrease stall for back-end solves (delta = max(relCostTol,
    #: back_rel_stall)); back_max_ls caps the Lewis–Overton bisection
    #: (the batched-bench quality ladder: ls=4 within ~2-5% of ls=16
    #: at a fraction of the evals).
    back_rel_stall: float = 1.0e-6
    back_max_ls: int = 8

    # topics kept for config-file compatibility (unused here)
    meshTopic: str = "/polyve/mesh"
    edgeTopic: str = "/polyve/edge"
    vertexTopic: str = "/polyve/vert"

    def __post_init__(self):
        # keep hashable (frozen config is a static jit argument)
        object.__setattr__(self, "poly_params", tuple(self.poly_params))
        object.__setattr__(self, "mapBound", tuple(self.mapBound))

    @property
    def shape_name(self) -> str:
        stem = self.inputdata.rsplit("/", 1)[-1]
        return stem[:-4] if stem.endswith(".obj") else stem

    @classmethod
    def from_yaml(cls, path: str) -> "PlannerConfig":
        import yaml
        with open(path) as f:
            raw = yaml.safe_load(f)
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in raw.items() if k in known}
        return cls(**kwargs)
