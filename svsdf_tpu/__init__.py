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
