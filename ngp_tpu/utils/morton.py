"""Morton (Z-order) 3D encode/decode as vectorized jnp bit-twiddling.

The reference addresses its density grid in Morton order via tcnn::morton3D /
morton3D_invert (used throughout internal/sampler/occupancy_sampler.cu, e.g.
cu:33-35, cu:248-252). Our grid uses *linear* addressing internally — there is
no warp locality to exploit on a TPU — but Morton codes remain part of the
public op inventory (SURVEY.md §2.3) and are used when importing/exporting
reference-ordered snapshots.
"""

import jax.numpy as jnp
import numpy as np


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


# ---------------------------------------------------------------------------
# Host-side (numpy) density-grid reorder for reference-snapshot interchange.
#
# The reference's density grid is indexed by Morton code within each cascade
# (occupancy_sampler.cu:33-35, 97-99, 200-204) and serialized verbatim
# (testbed.cu:132-136). Ours is linear x-fastest (d = z*G^2 + y*G + x;
# grid/occupancy.py reshape/transpose). These run on host at snapshot IO time,
# hence numpy, not jnp.
# ---------------------------------------------------------------------------


def _np_part1by2(x):
    x = np.asarray(x, np.uint32) & np.uint32(0x3FF)
    x = (x | (x << np.uint32(16))) & np.uint32(0x030000FF)
    x = (x | (x << np.uint32(8))) & np.uint32(0x0300F00F)
    x = (x | (x << np.uint32(4))) & np.uint32(0x030C30C3)
    x = (x | (x << np.uint32(2))) & np.uint32(0x09249249)
    return x


def morton_of_linear(grid_size: int) -> np.ndarray:
    """Morton code of each cell in our linear (x-fastest) order, (G^3,) int64.

    perm[d] = morton3d(x, y, z) for d = z*G^2 + y*G + x.
    """
    d = np.arange(grid_size**3, dtype=np.uint32)
    x = d % grid_size
    y = (d // grid_size) % grid_size
    z = d // (grid_size * grid_size)
    code = _np_part1by2(x) | (_np_part1by2(y) << np.uint32(1)) | (_np_part1by2(z) << np.uint32(2))
    return code.astype(np.int64)


def density_grid_from_reference(grid, grid_size: int, n_cascades: int) -> np.ndarray:
    """Morton-ordered reference density grid -> our linear order, (C*G^3,) fp32."""
    g3 = grid_size**3
    grid = np.asarray(grid, np.float32).reshape(n_cascades, g3)
    return grid[:, morton_of_linear(grid_size)].reshape(-1)


def density_grid_to_reference(grid, grid_size: int, n_cascades: int) -> np.ndarray:
    """Our linear-order density grid -> the reference's Morton order, (C*G^3,) fp32."""
    g3 = grid_size**3
    grid = np.asarray(grid, np.float32).reshape(n_cascades, g3)
    out = np.empty_like(grid)
    out[:, morton_of_linear(grid_size)] = grid
    return out.reshape(-1)
