"""Morton (Z-order) 3D encode/decode as vectorized jnp bit-twiddling.

The reference addresses its density grid in Morton order via tcnn::morton3D /
morton3D_invert (used throughout internal/sampler/occupancy_sampler.cu, e.g.
cu:33-35, cu:248-252). Our grid uses *linear* addressing internally — there is
no warp locality to exploit on a TPU — but Morton codes remain part of the
public op inventory (SURVEY.md §2.3) and are used when importing/exporting
reference-ordered snapshots.
"""

import jax.numpy as jnp


def _part1by2(x):
    """Spread the low 10 bits of x so each lands 3 positions apart."""
    x = jnp.asarray(x, jnp.uint32) & jnp.uint32(0x3FF)
    x = (x | (x << 16)) & jnp.uint32(0x030000FF)
    x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x09249249)
    return x


def _compact1by2(x):
    x = jnp.asarray(x, jnp.uint32) & jnp.uint32(0x09249249)
    x = (x | (x >> 2)) & jnp.uint32(0x030C30C3)
    x = (x | (x >> 4)) & jnp.uint32(0x0300F00F)
    x = (x | (x >> 8)) & jnp.uint32(0x030000FF)
    x = (x | (x >> 16)) & jnp.uint32(0x000003FF)
    return x


def morton3d(x, y, z):
    """Interleave bits: bit i of x/y/z -> bit 3i / 3i+1 / 3i+2."""
    return _part1by2(x) | (_part1by2(y) << 1) | (_part1by2(z) << 2)


def morton3d_invert(code):
    """Extract every 3rd bit starting at bit 0 (pass code>>1, code>>2 for y,z)."""
    return _compact1by2(code)


def morton3d_decode(code):
    """code -> (x, y, z)."""
    code = jnp.asarray(code, jnp.uint32)
    return _compact1by2(code), _compact1by2(code >> 1), _compact1by2(code >> 2)
