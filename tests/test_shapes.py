"""Shape SDF library unit tests.

Strategy (SURVEY.md §4): the reference ships no tests; we validate each
analytic SDF against metric properties that any exact SDF must satisfy
(|grad| == 1 a.e., boundary consistency, eikonal sampling) plus golden
checks against independently hand-evaluated IQ formulas.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from svsdf_tpu.models import shapes


ALL_NAMES = list(shapes.shape_names())


def _rand_points(n, scale, seed):
    rng = np.random.default_rng(seed)
    return rng.uniform(-scale, scale, size=(n, 2))


@pytest.mark.parametrize("name", ALL_NAMES)
def test_gradient_norm_is_one(name):
    """SDF gradient must have unit norm almost everywhere."""
    shape = shapes.make_shape(name)
    pts = jnp.asarray(_rand_points(512, 8.0, seed=hash(name) % 2**31))
    val, grad = shape.sdf_grad(pts)
    gn = np.asarray(jnp.linalg.norm(grad, axis=-1))
    # discard points near kinks/medial axis where the gradient jumps
    ok = np.isfinite(gn)
    assert ok.all(), f"non-finite gradients for {name}"
    frac_unit = np.mean(np.abs(gn - 1.0) < 1e-4)
    assert frac_unit > 0.95, f"{name}: only {frac_unit:.2%} unit gradients"


@pytest.mark.parametrize("name", ALL_NAMES)
def test_metric_consistency(name):
    """March distance d along -grad from outside points: the SDF must
    decrease by ~d (true signed distance property)."""
    shape = shapes.make_shape(name)
    pts = jnp.asarray(_rand_points(256, 7.0, seed=3))
    val, grad = shape.sdf_grad(pts)
    val = np.asarray(val)
    grad = np.asarray(grad)
    outside = val > 0.5
    step = 0.25
    moved = np.asarray(pts) - step * grad
    val2 = np.asarray(shape.sdf(jnp.asarray(moved)))
    err = np.abs((val[outside] - step) - val2[outside])
    assert np.median(err) < 1e-6
    assert np.mean(err < 1e-3) > 0.9


def test_circle_exact():
    shape = shapes.make_shape("Circle")
    p = jnp.array([[3.0, 4.0], [0.3, 0.4], [0.0, 0.0]])
    np.testing.assert_allclose(np.asarray(shape.sdf(p)),
                               [4.0, -0.5, -1.0], atol=1e-12)


def test_heart_golden():
    """Hand-evaluated sdHeart (Shape.hpp:939-952): scale-4 IQ heart."""
    shape = shapes.make_shape("sdHeart")
    # center of the lobes region: p=(0, 2) -> p/4=(0, .5); x+y<=1;
    # v1 = |(0,.5)-(0,1)|^2=0.25, m=.5, v2=|(0,.5)-(.25,.25)|^2=0.125
    # sign(x-y)=sign(-0.5)=-1 -> 4*sqrt(0.125)*-1
    expect = 4.0 * math.sqrt(0.125) * -1.0
    np.testing.assert_allclose(float(shape.sdf(jnp.array([0.0, 2.0]))),
                               expect, atol=1e-9)
    # top region: p=(2,4) -> (0.5,1.0); x+y>1 -> 4*(|p-(0.25,0.75)|-sqrt2/4)
    expect_top = 4.0 * (math.hypot(0.25, 0.25) - math.sqrt(2.0) / 4.0)
    np.testing.assert_allclose(float(shape.sdf(jnp.array([2.0, 4.0]))),
                               expect_top, atol=1e-9)


def test_rounded_x_golden():
    """sdRoundedX (Shape.hpp:988-993): w=3, r=0.25."""
    shape = shapes.make_shape("sdRoundedX")
    # p=(4,0): ax+ay=4>3 -> m=1.5, d=|(2.5,-1.5)|-0.25
    expect = math.hypot(2.5, 1.5) - 0.25
    np.testing.assert_allclose(float(shape.sdf(jnp.array([4.0, 0.0]))),
                               expect, atol=1e-9)
    # p=(1,1): ax+ay=2<3 -> m=1, d=|(0,0)|-0.25 = -0.25
    np.testing.assert_allclose(float(shape.sdf(jnp.array([1.0, 1.0]))),
                               -0.25, atol=1e-9)


def test_uneven_capsule_golden():
    shape = shapes.make_shape("sdUnevenCapsule")
    # p=(0,-3): k = a*(-3) < 0 -> |p| - r1 = 1
    np.testing.assert_allclose(float(shape.sdf(jnp.array([0.0, -3.0]))),
                               1.0, atol=1e-9)
    # p=(0,7): k = 7a > 5a -> |(0,2)| - r2 = 1
    np.testing.assert_allclose(float(shape.sdf(jnp.array([0.0, 7.0]))),
                               1.0, atol=1e-9)


def test_polygon_square():
    shape = shapes.make_shape("Polygon",
                              vertices=[(1, 1), (-1, 1), (-1, -1), (1, -1)])
    vals = np.asarray(shape.sdf(jnp.array(
        [[0.0, 0.0], [2.0, 0.0], [0.0, 3.0], [2.0, 2.0]])))
    np.testing.assert_allclose(vals, [-1.0, 1.0, 2.0, math.sqrt(2.0)],
                               atol=1e-9)


def test_fallback_rect():
    """Unknown names fall back to the 12x0.2 rectangle
    (sw_manager.hpp:365-371)."""
    shape = shapes.make_shape("definitely_not_a_shape")
    assert shape.name == "Polygon"
    np.testing.assert_allclose(float(shape.sdf(jnp.array([0.0, 0.0]))),
                               -0.1, atol=1e-6)
    np.testing.assert_allclose(float(shape.sdf(jnp.array([7.0, 0.0]))),
                               1.0, atol=1e-6)


def test_pre_transform():
    """poly_params (x, y, yaw_deg) pre-transform (Shape.hpp:284-301)."""
    base = shapes.make_shape("Circle")
    moved = shapes.make_shape("Circle", poly_params=(2.0, 0.0, 90.0))
    # circle centered at (2, 0) now
    np.testing.assert_allclose(float(moved.sdf(jnp.array([2.0, 0.0]))),
                               -1.0, atol=1e-7)
    np.testing.assert_allclose(float(moved.sdf(jnp.array([4.0, 0.0]))),
                               1.0, atol=1e-7)
    del base


def test_sdf_with_rot_matches_kernel_path():
    """sdf_with_rot(p, yaw) == body sdf at R^T p for zero pre-transform."""
    shape = shapes.make_shape("sdHeart")
    p = jnp.array([1.3, 0.4])
    yaw = 0.7
    c, s = math.cos(yaw), math.sin(yaw)
    pr = jnp.array([c * p[0] + s * p[1], -s * p[0] + c * p[1]])
    np.testing.assert_allclose(float(shape.sdf_with_rot(p, yaw)),
                               float(shape.sdf(pr)), atol=1e-9)


def test_batch_shapes_vmap():
    shape = shapes.make_shape("star")
    pts = jnp.asarray(_rand_points(64, 5.0, seed=11)).reshape(4, 16, 2)
    out = shape.sdf(pts)
    assert out.shape == (4, 16)
    flat = shape.sdf(pts.reshape(-1, 2))
    np.testing.assert_allclose(np.asarray(out).ravel(), np.asarray(flat),
                               atol=1e-12)
