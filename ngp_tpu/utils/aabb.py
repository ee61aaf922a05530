"""Axis-aligned bounding box ops on jnp arrays.

The scene box is the unit cube inflated by aabb_scale around its center
(reference internal/sampler/occupancy_sampler.cu:605-607). Parity targets:
  * contains / relative_pos / diag:  internal/sampler/bounding_box.h
  * ray_intersect (slab test):       internal/sampler/bounding_box.h:151-186
  * warp/unwarp position/direction/dt: internal/utils/common_device.h:347-404
"""

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class AABB:
    """Static (python-level) bounding box; min/max are float tuples."""

    lo: tuple
    hi: tuple

    @staticmethod
    def scene(aabb_scale: float) -> "AABB":
        # unit cube centered at 0.5, inflated by 0.5 * aabb_scale
        # (occupancy_sampler.cu:605-607: box {0.5,0.5} then inflate(0.5*scale))
        r = 0.5 * aabb_scale
        return AABB((0.5 - r,) * 3, (0.5 + r,) * 3)

    @property
    def lo_arr(self):
        return jnp.asarray(self.lo, jnp.float32)

    @property
    def hi_arr(self):
        return jnp.asarray(self.hi, jnp.float32)

    @property
    def diag(self):
        return jnp.asarray(np.asarray(self.hi) - np.asarray(self.lo), jnp.float32)

    def contains(self, pos):
        """pos: (..., 3) -> bool (...,)."""
        return jnp.all((pos >= self.lo_arr) & (pos <= self.hi_arr), axis=-1)

    def relative_pos(self, pos):
        return (pos - self.lo_arr) / self.diag

    def ray_intersect(self, o, d):
        """Slab test. o, d: (..., 3). Returns (tmin, tmax) with tmin clamped >= 0.

        Where the ray misses the box, tmin > tmax (callers mask on that), same
        contract as BoundingBox::ray_intersect.
        """
        inv_d = 1.0 / d
        t0 = (self.lo_arr - o) * inv_d
        t1 = (self.hi_arr - o) * inv_d
        tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
        tmin = jnp.maximum(tmin, 0.0)
        return tmin, tmax


def warp_position(pos, aabb: AABB):
    """AABB-relative position in [0,1]^3 (common_device.h:347-351)."""
    return aabb.relative_pos(pos)


def unwarp_position(pos, aabb: AABB):
    return aabb.lo_arr + pos * aabb.diag


def warp_direction(d):
    """Unit direction -> [0,1]^3 (common_device.h:375-377)."""
    return (d + 1.0) * 0.5


def unwarp_direction(d):
    return d * 2.0 - 1.0


def warp_dt(dt, min_cone_stepsize, n_cascades):
    """dt -> [0,1] over [min, min * 2^(n_cascades-1)] (common_device.h:395-398)."""
    max_stepsize = min_cone_stepsize * (1 << (n_cascades - 1))
    return (dt - min_cone_stepsize) / (max_stepsize - min_cone_stepsize)


def unwarp_dt(dt, min_cone_stepsize, n_cascades):
    max_stepsize = min_cone_stepsize * (1 << (n_cascades - 1))
    return dt * (max_stepsize - min_cone_stepsize) + min_cone_stepsize
