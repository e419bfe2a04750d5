"""Multi-host hooks (parallel/multihost.py) on the 8-device CPU mesh.

True multi-process behavior needs a pod; these tests pin down the
single-process pass-through semantics (which every helper promises)
plus the mesh-layout and slicing math that multi-host correctness
rides on.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from svsdf_tpu.parallel import multihost as mh


def test_initialize_noop_single_process():
    # no env, no args -> stays single-process, returns False
    assert mh.initialize() is False
    assert jax.process_count() == 1


def test_pod_mesh_layout():
    mesh = mh.pod_mesh(n_obs_shards=2)
    assert mesh.axis_names == ("scn", "obs")
    assert mesh.shape["scn"] == 4 and mesh.shape["obs"] == 2
    # obs innermost: each scn row holds ADJACENT devices in
    # jax.devices() order (= ICI-adjacent on real hardware)
    dev = np.asarray(mesh.devices)
    ids = np.asarray([[d.id for d in row] for row in dev])
    flat = [d.id for d in jax.devices()]
    assert ids.ravel().tolist() == flat


def test_pod_mesh_indivisible_raises():
    try:
        mh.pod_mesh(n_obs_shards=3)
    except ValueError:
        return
    raise AssertionError("expected ValueError")


def test_process_slice_math():
    # simulated 4-process job over a 32-scenario batch
    slices = [mh.process_slice(32, process_index=i, process_count=4)
              for i in range(4)]
    idx = np.arange(32)
    parts = [idx[s] for s in slices]
    assert np.concatenate(parts).tolist() == idx.tolist()
    assert all(len(p) == 8 for p in parts)


def test_global_batch_array_and_fetch_roundtrip():
    mesh = mh.pod_mesh(n_obs_shards=1)
    x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    arr = mh.global_batch_array(x, mesh, P("scn"))
    assert arr.sharding.is_equivalent_to(
        jax.NamedSharding(mesh, P("scn")), arr.ndim)
    out = mh.fetch_global(arr)
    np.testing.assert_array_equal(out, x)


def test_sharded_compute_on_pod_mesh():
    # a psum-reducing shard_map over the pod mesh runs end to end
    mesh = mh.pod_mesh(n_obs_shards=2)
    x = np.ones((4, 6), np.float32)
    arr = mh.global_batch_array(x, mesh, P("scn", "obs"))

    def f(block):
        return jax.lax.psum(jnp.sum(block), axis_name="obs")[None]

    out = jax.jit(jax.shard_map(f, mesh=mesh,
                                in_specs=P("scn", "obs"),
                                out_specs=P("scn"), check_vma=False))(arr)
    np.testing.assert_allclose(mh.fetch_global(out), np.full(4, 6.0))


def test_barrier_noop():
    mh.barrier("unit")  # must not raise in single-process sessions
