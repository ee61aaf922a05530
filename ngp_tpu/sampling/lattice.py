"""Closed-form t-lattice ray marching — the TPU replacement for per-thread DDA.

Why a lattice: the reference's marcher (occupancy_sampler.cu:310-449) either
*samples* at t (occupied voxel) or *skips* via advance_to_next_voxel
(cu:287-308), which — in its shipped "regular stepping" mode — advances t by
whole multiples of dt until past the next voxel boundary. With the cone angle
constant c = 0 (base.json:7), dt == min_cone_stepsize always (calc_dt,
cu:207-214), so every t the reference ever visits lies on the fixed lattice

    t_i = startt + i * min_cone_stepsize.

The divergent per-ray while-loop is therefore exactly equivalent to: evaluate
occupancy at all lattice points in parallel, mask to points inside the AABB
(a prefix, since t_i is increasing and the box is convex), and keep the first
`n_max_steps` occupied points. That is a pure fixed-shape vector program —
ideal for the VPU — and what this module implements.

(c > 0 makes the lattice piecewise-geometric but still closed-form; no
shipped config uses it, and `assert_supported` documents the restriction.)

Memory discipline: [n_rays, n_lattice] position tensors are never
materialized; everything walks the lattice in chunks via lax.scan, keeping
peak extra memory at [n_rays, chunk, 3]. The only full-width product is the
1-byte occupied mask, which sampling/training.py compacts with a row sort.
"""

import jax
import jax.numpy as jnp

from ngp_tpu.grid.occupancy import mip_from_pos, occupancy_lookup, static_dt_mip
from ngp_tpu.utils.aabb import AABB, warp_dt
from ngp_tpu.utils.config import SamplerConfig

_CHUNK = 128


def assert_supported(cfg: SamplerConfig):
    if cfg.cone_angle_constant != 0.0:
        raise NotImplementedError(
            "cone_angle_constant > 0 (geometric stepping) is not implemented; "
            "every shipped reference config uses 0 (base.json:7)."
        )


def n_lattice_points(cfg: SamplerConfig) -> int:
    """Static lattice length: enough steps to cross the scene AABB diagonal."""
    import math

    diag = math.sqrt(3.0) * cfg.aabb_scale
    n = int(math.ceil(diag / cfg.min_cone_stepsize)) + 1
    return -(-n // _CHUNK) * _CHUNK  # round up to a whole number of chunks


def _chunk_mask(cfg: SamplerConfig, aabb: AABB, occupancy, o, d, startt, chunk_start, taken_so_far, still_inside):
    """Occupied-sample mask for lattice points [chunk_start, chunk_start+_CHUNK).

    Returns (mask (R, CHUNK), t, ordinal, still_inside'). The reference's
    march loop BREAKS at the first lattice point outside the AABB
    (occupancy_sampler.cu:397) — `still_inside` carries that prefix property
    across chunks. `taken_so_far` caps occupied samples per ray at
    n_max_steps (the `j < n_max_steps` bound).
    """
    dt = cfg.min_cone_stepsize
    i = chunk_start + jnp.arange(_CHUNK, dtype=jnp.float32)
    t = startt[:, None] + i[None, :] * dt  # (R, CHUNK)
    pos = o[:, None, :] + t[..., None] * d[:, None, :]  # (R, CHUNK, 3)
    inside = aabb.contains(pos)
    # prefix-AND: a point is reachable only if every earlier point was inside
    reachable = still_inside[:, None] & (jnp.cumprod(inside, axis=1) > 0)
    # dt is config-static, so its mip floor is too (cu:223-230)
    mip = mip_from_pos(pos, cfg.n_cascades)
    dt_mip = static_dt_mip(dt, cfg.grid_size, cfg.n_cascades)
    if dt_mip >= 0:
        mip = jnp.maximum(mip, dt_mip)
    occ = occupancy_lookup(cfg, occupancy, pos, mip)
    mask = reachable & occ
    # enforce the per-ray sample cap (the reference's `j < n_max_steps`)
    ordinal = taken_so_far[:, None] + jnp.cumsum(mask, axis=1) - mask.astype(jnp.int32)
    mask = mask & (ordinal < cfg.maximum_marching_steps)
    return mask, t, ordinal, reachable[:, -1]


def count_samples(cfg: SamplerConfig, aabb: AABB, occupancy, o, d, startt, n_lattice: int, return_masks: bool = False):
    """Pass 1: per-ray occupied-sample counts (R,) int32.

    Mirrors the reference's first marching pass (occupancy_sampler.cu:389-407).
    With return_masks=True also returns the (R, n_lattice) occupied mask so
    pass 2 can skip re-doing the occupancy gathers (1 byte/lattice point).
    """

    def body(carry, chunk_idx):
        taken, still = carry
        mask, _, _, still = _chunk_mask(cfg, aabb, occupancy, o, d, startt, chunk_idx * _CHUNK, taken, still)
        return (taken + jnp.sum(mask, axis=1, dtype=jnp.int32), still), (mask if return_masks else None)

    R = o.shape[0]
    (taken, _), masks = jax.lax.scan(
        body, (jnp.zeros(R, jnp.int32), jnp.ones(R, bool)), jnp.arange(n_lattice // _CHUNK)
    )
    if return_masks:
        # (n_chunks, R, CHUNK) -> (R, n_lattice)
        return taken, jnp.transpose(masks, (1, 0, 2)).reshape(R, n_lattice)
    return taken
