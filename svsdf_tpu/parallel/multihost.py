"""Multi-host (pod-scale) runtime hooks.

The reference is a single-process shared-memory program (SURVEY.md
§2.6); scaling it means launching more ROS processes by hand. Here the
multi-host story is first-class JAX: one `initialize()` call per host
process joins the pod, `pod_mesh()` lays a (scn, obs) mesh over every
chip in the job with the obs axis innermost (so the per-iteration
psum gradient merges ride ICI within a host/slice and only the rare
cross-scenario traffic touches DCN), and the host-local array helpers
move each process's shard of a global planning batch in and out of the
sharded solvers in parallel/batch.py.

Single-process sessions (tests, the one-chip bench) pass through every
helper unchanged, so the same driver script runs from a laptop CPU to
a v5e pod without modification.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Join (or skip joining) a multi-host JAX job.

    A thin idempotent wrapper over `jax.distributed.initialize`:

      * explicit args win;
      * else standard cluster env vars are honored (JAX autodetects
        TPU pod metadata, SLURM and Open MPI; `JAX_COORDINATOR_ADDRESS`
        / `JAX_NUM_PROCESSES` / `JAX_PROCESS_ID` force the generic
        bootstrap);
      * with neither, this is a single-process session and the call is
        a no-op.

    Returns True iff a multi-process runtime is (now) active. Safe to
    call twice — an already-initialized runtime is left alone.
    """
    # NB: the idempotence guard must NOT call jax.process_count() —
    # that initializes the backend, after which distributed.initialize
    # refuses to run (found by tests/test_multihost_spawn.py).
    if jax.distributed.is_initialized():
        return jax.process_count() > 1

    env = os.environ
    coordinator_address = (coordinator_address
                           or env.get("JAX_COORDINATOR_ADDRESS"))
    if num_processes is None and "JAX_NUM_PROCESSES" in env:
        num_processes = int(env["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in env:
        process_id = int(env["JAX_PROCESS_ID"])

    if coordinator_address is None and num_processes is None:
        return False  # single-process session
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    return jax.process_count() > 1


def pod_mesh(n_obs_shards: int = 1,
             axis_names: Sequence[str] = ("scn", "obs"),
             devices=None) -> Mesh:
    """A (scn, obs) mesh over every device in the job.

    The obs axis — the per-iteration psum gradient merge of
    parallel/batch.py's sharded solvers, the framework's hottest
    collective — is laid out INNERMOST over `jax.devices()`' order, so
    it maps to physically adjacent chips (ICI) and never crosses DCN
    when n_obs_shards divides the per-host/per-slice chip count.
    Scenarios (embarrassingly parallel: one all-gather at the end of a
    solve at most) take the outer, possibly cross-host, axis.
    """
    devices = list(jax.devices() if devices is None else devices)
    n = len(devices)
    if n % n_obs_shards != 0:
        raise ValueError(f"{n} devices not divisible by "
                         f"n_obs_shards={n_obs_shards}")
    dev = np.asarray(devices).reshape(n // n_obs_shards, n_obs_shards)
    return Mesh(dev, axis_names=tuple(axis_names))


def process_slice(global_batch_size: int,
                  process_index: int | None = None,
                  process_count: int | None = None) -> slice:
    """This process's contiguous slice of a globally-sharded batch
    axis (scenario order = process order, matching pod_mesh's outer
    axis over `jax.devices()`)."""
    pc = jax.process_count() if process_count is None else process_count
    pi = jax.process_index() if process_index is None else process_index
    if global_batch_size % pc != 0:
        raise ValueError(f"global batch {global_batch_size} not "
                         f"divisible by process count {pc}")
    per = global_batch_size // pc
    return slice(pi * per, (pi + 1) * per)


def global_batch_array(host_local, mesh: Mesh, spec: P):
    """Assemble a global jax.Array from each process's host-local shard
    (the multi-host input path: every process holds only its
    `process_slice` of the scenario batch).

    Single-process: equivalent to device_put with the sharding."""
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(host_local, sharding)
    return jax.make_array_from_process_local_data(sharding, host_local)


def fetch_global(arr) -> np.ndarray:
    """Gather a (possibly cross-process) sharded array to every host as
    a numpy array — the output path for result collection/logging.
    Single-process: a plain device-to-host copy."""
    if jax.process_count() == 1:
        return np.asarray(arr)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(arr,
                                                        tiled=True))


def barrier(name: str = "svsdf_tpu") -> None:
    """Cross-host sync point (checkpoint/bench epoch boundaries).
    No-op in single-process sessions."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)
