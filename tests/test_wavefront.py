"""Device wavefront front end vs the host A* oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from svsdf_tpu.planner import wavefront


def _grid_with_wall():
    free = np.ones((24, 20), bool)
    free[10, 2:18] = False       # wall with gaps at both ends
    return jnp.asarray(free)


def test_distance_field_exact_on_open_grid():
    free = jnp.ones((16, 16), bool)
    d = wavefront.distance_field(free, jnp.asarray([0, 0]))
    # exact 8-connected geodesic: max+min metric (Chebyshev-diagonal)
    i, j = np.mgrid[0:16, 0:16]
    expect = (np.maximum(i, j) - np.minimum(i, j)
              + np.sqrt(2.0) * np.minimum(i, j))
    np.testing.assert_allclose(np.asarray(d), expect, atol=1e-4)


def test_distance_field_blocked_cells_inf():
    free = _grid_with_wall()
    d = np.asarray(wavefront.distance_field(free, jnp.asarray([0, 0])))
    assert (d[10, 2:18] > 1e8).all()
    assert np.isfinite(d[23, 19]) and d[23, 19] < 1e8


def test_extract_path_reaches_goal_around_wall():
    free = _grid_with_wall()
    goal = jnp.asarray([20, 10])
    d = wavefront.distance_field(free, goal)
    path, length, success = wavefront.extract_path(
        d, jnp.asarray([2, 10]), max_len=128)
    assert bool(success)
    p = np.asarray(path)[:int(length)]
    assert (p[-1] == np.asarray(goal)).all()
    # every cell on the path is free
    freen = np.asarray(free)
    assert all(freen[i, j] for i, j in p)
    # steps are 8-connected
    steps = np.abs(np.diff(p, axis=0))
    assert steps.max() <= 1


def test_path_cost_matches_field_value():
    """Greedy descent on an exact field is optimal: accumulated step
    cost equals dist(start)."""
    free = _grid_with_wall()
    goal = jnp.asarray([20, 10])
    start = jnp.asarray([2, 10])
    d = wavefront.distance_field(free, goal)
    path, length, success = wavefront.extract_path(d, start, 128)
    p = np.asarray(path)[:int(length)]
    steps = np.abs(np.diff(p, axis=0))
    cost = sum(np.sqrt(2.0) if (s == 1).all() else 1.0 for s in steps)
    np.testing.assert_allclose(cost, float(d[start[0], start[1]]),
                               atol=1e-3)


def test_unreachable_goal_fails():
    free = np.ones((12, 12), bool)
    free[6, :] = False           # full wall
    d = wavefront.distance_field(jnp.asarray(free), jnp.asarray([10, 6]))
    path, length, success = wavefront.extract_path(
        d, jnp.asarray([1, 6]), 64)
    assert not bool(success)


def test_assign_yaws_prefers_nearest_feasible_bin():
    K = 8
    feas = np.ones((K, 6, 6), bool)
    feas[:, 3, 3] = False
    feas[2, 3, 3] = True          # only bin 2 feasible at (3,3)
    path = jnp.asarray([[1, 1], [2, 2], [3, 3], [4, 4]])
    bins = np.asarray(wavefront.assign_yaws(jnp.asarray(feas), path,
                                            prev_bin0=1))
    assert bins[0] == 1 and bins[1] == 1
    assert bins[2] == 2
    assert bins[3] == 2           # sticks to previous


def test_plan_batch_vmaps():
    free = jnp.stack([_grid_with_wall()] * 3)
    feas = jnp.ones((3, 4) + free.shape[1:], bool)
    starts = jnp.asarray([[2, 10]] * 3)
    goals = jnp.asarray([[20, 10], [22, 3], [15, 18]])
    out = jax.vmap(wavefront.plan, in_axes=(0, 0, 0, 0, None))(
        free, feas, starts, goals, 128)
    assert np.asarray(out.success).all()
    assert out.path_ij.shape == (3, 128, 2)


def test_matches_astar_cost_on_random_grids():
    """The wavefront field is exact, so its path cost can't exceed the
    A* oracle's (both optimal => equal up to fp tolerance)."""
    from svsdf_tpu.planner import astar
    from svsdf_tpu.utils.gridmap import GridMap

    rng = np.random.default_rng(7)
    for trial in range(3):
        occ = rng.uniform(size=(20, 20)) < 0.25
        occ[1, 1] = occ[18, 18] = False
        free = jnp.asarray(~occ)
        d = wavefront.distance_field(free, jnp.asarray([18, 18]))
        path, length, ok = wavefront.extract_path(
            d, jnp.asarray([1, 1]), 256)
        start_cost = float(d[1, 1])
        if not bool(ok):
            assert start_cost > 1e8
            continue
        p = np.asarray(path)[:int(length)]
        steps = np.abs(np.diff(p, axis=0))
        cost = sum(np.sqrt(2.0) if (s == 1).all() else 1.0
                   for s in steps)
        np.testing.assert_allclose(cost, start_cost, atol=1e-3)


def test_serpentine_corridor_longer_than_x_plus_y():
    """A geodesic of ~X*Y/2 cells must converge (regression: the old
    default sweep cap X+Y+8 silently truncated the relaxation and
    reported reachable goals unreachable)."""
    X, Y = 21, 21
    free = np.ones((X, Y), bool)
    # serpentine: walls across all but one end column, alternating
    for r, i in enumerate(range(2, X - 1, 2)):
        free[i, :] = False
        if r % 2 == 0:
            free[i, Y - 1] = True
        else:
            free[i, 0] = True
    start = jnp.asarray([0, 0])
    goal = jnp.asarray([X - 1, Y - 1])
    dist = wavefront.distance_field(jnp.asarray(free), goal)
    d0 = float(dist[0, 0])
    assert d0 < 1e8                       # reachable
    assert d0 > (X + Y + 8)               # genuinely longer than old cap
    path, length, success = wavefront.extract_path(dist, start,
                                                   max_len=512)
    assert bool(success)


def test_path_to_world_unwraps_yaw_across_seam():
    """Bins crossing the K-1 -> 0 seam must emit a small physical yaw
    step, not a ~2*pi spin (same contract as astar._emit_path)."""
    from svsdf_tpu.utils.gridmap import GridMap

    pts = np.asarray([[0.05, 0.05, 0.05], [9.9, 9.9, 1.9]])
    grid = GridMap.from_points(pts, 1.0, 1)
    K = 8
    path_ij = jnp.asarray([[1, 1], [2, 2], [3, 3], [4, 4]])
    bins = jnp.asarray([6, 7, 0, 1])      # crosses the seam twice
    out = wavefront.path_to_world(grid, path_ij, bins,
                                  jnp.asarray(4), K)
    steps = np.diff(out[:, 2])
    assert np.all(np.abs(steps) < 2 * np.pi / K + 1e-9)
