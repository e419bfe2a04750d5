"""Pallas TPU kernel for the SVSDF dense coarse time-scan.

The hot loop of every SVSDF query is the coarse scan: for M query
points and K trajectory time samples, evaluate the robot SDF of each
point against each sampled pose and reduce (min, argmin) over K
(tstar_search_batch, ops/svsdf.py — the TPU replacement of
choiceTInit, `sw_manager.hpp:539-725`). In pure JAX the (M, K) SDF
matrix round-trips HBM (M=256k grid points x K=256 times = 256 MB);
this kernel keeps the K-loop in VMEM with a running (min, argmin) so
only the M-sized results ever leave the chip, and the pose table
(4 x K floats) rides in SMEM.

Layout: points are padded to a multiple of _TILE_S*128 and viewed as
(M/128, 128) so each grid step owns a (_TILE_S, 128) float32 tile.
The shape's analytic SDF (models/shapes.py) is traced straight into
the kernel body in xy-form — pure elementwise jnp on full tiles, which
Mosaic maps onto the VPU with no packed-axis relayouts.

Used by ops/svsdf.py when running on TPU with a large point batch;
the pure-JAX path remains the oracle it is tested against
(tests/test_pallas_svsdf.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svsdf_tpu.models.shapes import Shape2D

#: sublane x lane tile of one grid step. 256 sublanes (32k points) per
#: step gives the k-loop body enough parallel work that the sequential
#: pose loop stops being latency-bound (an (8, 128) tile measured 13x
#: slower than XLA's fused scan; this layout beats it).
_TILE_S = 256
_TILE_L = 128
_TILE = _TILE_S * _TILE_L

#: poses consumed per loop iteration (statically unrolled for ILP)
_K_CHUNK = 8


def _sdf_xy(shape: Shape2D, px, py):
    """Evaluate the shape SDF on coordinate planes px/py: with the
    xy-native shape library every intermediate keeps the caller's full
    tile shape — no packed minor-2 axis anywhere in the kernel."""
    return shape.sdf_xy(px, py)


def _scan_kernel(shape, n_k, poses_ref, px_ref, py_ref, min_ref, arg_ref):
    """One (256, 128) point tile: running (min, argmin) over K poses.

    The pose loop walks chunks of _K_CHUNK poses, statically unrolled,
    so the VPU always has several independent SDF evaluations in
    flight. n_k is padded to a _K_CHUNK multiple by the caller (pad
    poses repeat pose 0; a repeated pose can never steal the argmin
    because the update is strict `<`)."""
    px = px_ref[:]
    py = py_ref[:]

    def one(k, best, argb):
        cx = poses_ref[0, k]
        cy = poses_ref[1, k]
        c = poses_ref[2, k]
        s = poses_ref[3, k]
        dx = px - cx
        dy = py - cy
        # p_rel = R(yaw)^T (p - c)   (posEva2Rel, sw_manager.hpp:521)
        prx = c * dx + s * dy
        pry = -s * dx + c * dy
        sd = _sdf_xy(shape, prx, pry)
        upd = sd < best
        return jnp.where(upd, sd, best), jnp.where(upd, k, argb)

    def body(kc, carry):
        best, argb = carry
        k0 = kc * _K_CHUNK
        for j in range(_K_CHUNK):
            best, argb = one(k0 + j, best, argb)
        return best, argb

    init = (jnp.full((_TILE_S, _TILE_L), jnp.inf, jnp.float32),
            jnp.zeros((_TILE_S, _TILE_L), jnp.int32))
    best, argb = jax.lax.fori_loop(0, n_k // _K_CHUNK, body, init)
    min_ref[:] = best
    arg_ref[:] = argb


@functools.partial(jax.jit, static_argnums=(0, 4))
def _coarse_scan_padded(shape: Shape2D, px2, py2, poses,
                        interpret: bool = False):
    """px2/py2: (R, 128) padded point planes; poses: (4, K) f32 rows
    [cx, cy, cos(yaw), sin(yaw)]. Returns ((R, 128) min, (R, 128) arg).
    """
    rows, _ = px2.shape
    n_k = poses.shape[1]
    grid = (rows // _TILE_S,)
    kern = functools.partial(_scan_kernel, shape, n_k)
    return pl.pallas_call(
        kern,
        interpret=interpret,
        grid=grid,
        in_specs=[
            pl.BlockSpec((4, n_k), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_TILE_S, _TILE_L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_S, _TILE_L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_TILE_S, _TILE_L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_S, _TILE_L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, _TILE_L), jnp.float32),
            jax.ShapeDtypeStruct((rows, _TILE_L), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=rows * _TILE_L * n_k * 60,
            bytes_accessed=rows * _TILE_L * 4 * 4 + 4 * n_k * 4,
            transcendentals=rows * _TILE_L * n_k * 4,
        ),
    )(poses, px2, py2)


def coarse_scan(shape: Shape2D, points, xy, yaw):
    """(min_sdf (M,), argmin_k (M,)) of shape SDF over the K poses.

    points: (M, 2) world points; xy: (K, 2) pose centers; yaw: (K,).
    Pure function of f32 inputs; pads M up to a multiple of 1024.
    """
    points = jnp.asarray(points, jnp.float32)
    m = points.shape[0]
    pad = (-m) % _TILE
    px = jnp.pad(points[:, 0], (0, pad))
    py = jnp.pad(points[:, 1], (0, pad))
    rows = (m + pad) // _TILE_L
    px2 = px.reshape(rows, _TILE_L)
    py2 = py.reshape(rows, _TILE_L)
    poses = jnp.stack([xy[:, 0], xy[:, 1], jnp.cos(yaw), jnp.sin(yaw)],
                      axis=0).astype(jnp.float32)
    kpad = (-poses.shape[1]) % _K_CHUNK
    if kpad:
        # pad with copies of pose 0: evaluated first at k=0, a copy can
        # never win the strict `<` argmin update again
        poses = jnp.concatenate(
            [poses, jnp.repeat(poses[:, :1], kpad, axis=1)], axis=1)
    mn, ar = _coarse_scan_padded(shape, px2, py2, poses,
                                 interpret=_interpret_forced())
    return mn.reshape(-1)[:m], ar.reshape(-1)[:m]


def coarse_scan_reference(shape: Shape2D, points, xy, yaw):
    """Pure-JAX oracle with identical semantics (first-min tie-break)."""
    d = points[:, None, :] - xy[None]
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    prx = c[None] * d[..., 0] + s[None] * d[..., 1]
    pry = -s[None] * d[..., 0] + c[None] * d[..., 1]
    sd = _sdf_xy(shape, prx, pry)
    return jnp.min(sd, axis=1), jnp.argmin(sd, axis=1).astype(jnp.int32)


def available() -> bool:
    """Pallas TPU lowering needs a TPU backend (the axon PJRT plugin
    registers the tpu lowering rules under its own platform name), or
    interpreter mode for CPU testing."""
    try:
        return (jax.default_backend() in ("tpu", "axon")
                or _interpret_forced())
    except Exception:                                  # noqa: BLE001
        return False


def _interpret_forced() -> bool:
    import os

    return os.environ.get("SVSDF_PALLAS_INTERPRET") == "1"
