"""svsdf_tpu — TPU-native implicit swept-volume-SDF trajectory optimization.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
ZJU-FAST-Lab/Implicit-SVSDF-Planner (SIGGRAPH'24): continuous
collision-free SE(2) trajectory generation for arbitrary 2D shapes,
where the swept-volume SDF is queried *implicitly* (a minimization of
the robot SDF over trajectory time, plus a GSIP expanding-disk solve
for interior points) and its value/gradient drives a MINCO-spline
trajectory optimizer.

Everything inside the optimizer loop is pure, batched, differentiable
JAX: analytic shape SDFs with exact `jax.grad` gradients, a dense
fixed-shape coarse-to-fine t*-search (replacing data-dependent descent
loops), and a nonsmooth-capable L-BFGS with weak-Wolfe line search.
The ragged outer machinery (A* front end, fixture IO) runs host-side.

Layout:
  models/    robot-shape SDF library (18 analytic shapes, polygon, grid SDF)
  ops/       compute ops: MINCO spline solve, SVSDF oracle, ESDF, kernels
  planner/   A* front end, mid-end warm start, SVSDF back end, pipeline
  parallel/  device-mesh scenario batching and sharded query reduction
  utils/     trajectory container, config, L-BFGS, fixture/PCD IO
  viz/       swept-surface extraction (dense SVSDF grid + marching cubes)
"""

__version__ = "0.1.0"

# TPU matmul precision: JAX's DEFAULT lowers f32 dot/conv operands to
# bfloat16 on the MXU (8-bit mantissa). That silently corrupted every
# exactness-critical contraction in the planner — measured on a v5e
# chip, solved f32 splines missed their own pinned endpoints by
# 0.33-1.99 m. Rather than a global jax_default_matmul_precision
# override (measured -41% bench throughput), the exactness-critical
# contractions request float32 precision EXPLICITLY at their call
# sites: the MINCO band assembly + cyclic-reduction block solves
# (ops/minco.py, ops/block_cr.py), trajectory-evaluation einsums
# (utils/trajectory.py), and the occupancy-count feasibility
# convolutions (ops/kernels.py — integer counts above 256 are not
# bf16-exact). The hot SVSDF scan path is elementwise VPU work with
# its own explicit bf16 opt-in (SVSDFConfig.scan_dtype) and runs at
# hardware speed either way. Endpoint error after the targeted fixes:
# ~1.5e-6 m (same as the global override), at full bench throughput.
