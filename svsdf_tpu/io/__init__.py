"""Wire formats and serialization (traj_utils / quadrotor_msgs parity)."""

from svsdf_tpu.io.polytraj import (  # noqa: F401
    MincoTraj,
    PolyTraj,
    PositionCommand,
    TrajectoryStatus,
    decode_minco_traj,
    decode_poly_traj,
    encode_minco_traj,
    encode_poly_traj,
)
