"""Triangle primitives — parity with reference internal/sampler/triangle.h.

The reference carries a Triangle struct (area sampling, Moeller-Trumbore ray
intersection, centroid) that the NeRF path never uses (SURVEY.md §2.1 #13:
vestigial mesh support referenced only by BoundingBox's triangle methods).
Kept here for inventory parity, as vectorized jnp functions.
"""

import jax.numpy as jnp


def triangle_area(a, b, c):
    """(..., 3) vertices -> area (triangle.h sampling support)."""
    return 0.5 * jnp.linalg.norm(jnp.cross(b - a, c - a), axis=-1)


def triangle_centroid(a, b, c):
    return (a + b + c) / 3.0


def sample_triangle_uniform(a, b, c, u):
    """Uniform point on a triangle from (..., 2) uniforms (sqrt warp)."""
    su = jnp.sqrt(u[..., 0:1])
    v = u[..., 1:2]
    return a * (1.0 - su) + b * (su * (1.0 - v)) + c * (su * v)


def ray_triangle_intersect(o, d, a, b, c, eps: float = 1e-9):
    """Moeller-Trumbore. Returns t (+inf on miss), broadcast over leading dims."""
    e1 = b - a
    e2 = c - a
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > eps, 1.0 / det, 0.0)
    tvec = o - a
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    hit = (jnp.abs(det) > eps) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > eps)
    return jnp.where(hit, t, jnp.inf)
