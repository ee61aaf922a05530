"""Parity fillers: direction sampling, Triangle ops, log_space_lerp."""

import jax.numpy as jnp
import numpy as np

from ngp_tpu.utils.camera import log_space_lerp
from ngp_tpu.utils.qmc import (
    cosine_hemisphere,
    cylindrical_to_dir,
    dir_to_cylindrical,
    fibonacci_dir,
    random_uniform_disc,
)
from ngp_tpu.utils.triangle import (
    ray_triangle_intersect,
    sample_triangle_uniform,
    triangle_area,
    triangle_centroid,
)


def test_cylindrical_roundtrip():
    p = jnp.asarray(np.random.default_rng(0).uniform(0.05, 0.95, (32, 2)), jnp.float32)
    d = cylindrical_to_dir(p)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-5)
    p2 = dir_to_cylindrical(d)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p), atol=1e-5)


def test_cosine_hemisphere_upper():
    u = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (64, 2)), jnp.float32)
    d = np.asarray(cosine_hemisphere(u))
    assert (d[:, 2] >= 0).all()
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)


def test_fibonacci_dirs_spread():
    n = 64
    d = np.asarray(fibonacci_dir(jnp.arange(n), n, jnp.zeros((n, 2))))
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    # roughly isotropic: mean close to zero
    assert np.abs(d.mean(0)).max() < 0.2


def test_disc_sampling():
    u = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (128, 2)), jnp.float32)
    p = np.asarray(random_uniform_disc(u))
    assert (np.linalg.norm(p, axis=-1) <= 1.0 + 1e-6).all()


def test_triangle_ops():
    a = jnp.asarray([0.0, 0.0, 0.0])
    b = jnp.asarray([1.0, 0.0, 0.0])
    c = jnp.asarray([0.0, 1.0, 0.0])
    assert float(triangle_area(a, b, c)) == 0.5
    np.testing.assert_allclose(np.asarray(triangle_centroid(a, b, c)), [1 / 3, 1 / 3, 0])
    # sample points stay inside the triangle
    u = jnp.asarray(np.random.default_rng(3).uniform(0, 1, (64, 2)), jnp.float32)
    p = np.asarray(sample_triangle_uniform(a, b, c, u))
    assert (p[:, 0] >= -1e-6).all() and (p[:, 1] >= -1e-6).all()
    assert (p[:, 0] + p[:, 1] <= 1 + 1e-5).all()
    # ray hit / miss
    o = jnp.asarray([0.2, 0.2, 1.0])
    t = float(ray_triangle_intersect(o, jnp.asarray([0.0, 0.0, -1.0]), a, b, c))
    np.testing.assert_allclose(t, 1.0, rtol=1e-6)
    t = float(ray_triangle_intersect(o, jnp.asarray([0.0, 0.0, 1.0]), a, b, c))
    assert np.isinf(t)


def test_log_space_lerp_endpoints_and_midpoint():
    rng = np.random.default_rng(4)
    # random rigid poses
    def rand_pose():
        q = rng.normal(size=3) * 0.5
        from ngp_tpu.utils.camera import _so3_exp

        m = np.zeros((3, 4), np.float32)
        m[:, :3] = _so3_exp(q)
        m[:, 3] = rng.normal(size=3)
        return m

    a, b = rand_pose(), rand_pose()
    np.testing.assert_allclose(log_space_lerp(a, b, 0.0), a, atol=1e-5)
    np.testing.assert_allclose(log_space_lerp(a, b, 1.0), b, atol=1e-4)
    mid = log_space_lerp(a, b, 0.5)
    # midpoint rotation is orthonormal
    r = mid[:, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
