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
peak extra memory at [n_rays, chunk, 3].
"""

import jax
import jax.numpy as jnp

from ngp_tpu.grid.occupancy import mip_from_dt, occupancy_lookup
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
    mip = mip_from_dt(jnp.full_like(t, dt), pos, cfg.grid_size, cfg.n_cascades)
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


def scatter_samples(
    cfg: SamplerConfig,
    aabb: AABB,
    occupancy,
    o,
    d,
    startt,
    base,
    ray_valid,
    n_lattice: int,
    capacity: int,
    masks=None,
):
    """Pass 2: scatter each ray's occupied samples into flat [capacity] buffers.

    Ray r's j-th occupied sample lands at flat index base[r] + j — the
    prefix-sum replacement for the reference's atomicAdd compaction
    (occupancy_sampler.cu:413-426). Returns (pos_w, dir_w, dt, ray_ids,
    valid): positions/directions warped per common_device.h:347-404, dt
    UNWARPED (the network never consumes dt — the reference's encodings read
    only dims 0-2 and 4-6 of the Coordinate struct, ngp_network.h:244-253 —
    while the composite needs the real step size).

    `masks` (R, n_lattice), from count_samples(return_masks=True), skips the
    second round of occupancy gathers.
    """
    dt = cfg.min_cone_stepsize
    R = o.shape[0]

    # one packed scatter per chunk: [pos.xyz, t, ray_id bits] in a single
    # (capacity, 5) buffer (every .at[].set is its own XLA scatter whose cost
    # scales with *input* rows, so fewer+wider beats many+narrow)
    flat = jnp.full((capacity, 5), -1.0, jnp.float32)

    def body(carry, chunk_idx):
        taken, still, flat = carry
        if masks is not None:
            cmask = jax.lax.dynamic_slice(masks, (0, chunk_idx * _CHUNK), (R, _CHUNK))
            i = chunk_idx * _CHUNK + jnp.arange(_CHUNK, dtype=jnp.float32)
            t = startt[:, None] + i[None, :] * dt
            ordinal = taken[:, None] + jnp.cumsum(cmask, axis=1) - cmask.astype(jnp.int32)
            mask = cmask
        else:
            mask, t, ordinal, still = _chunk_mask(cfg, aabb, occupancy, o, d, startt, chunk_idx * _CHUNK, taken, still)
        mask = mask & ray_valid[:, None]
        dest = base[:, None] + ordinal  # (R, CHUNK)
        dest = jnp.where(mask, dest, capacity)  # out-of-range drops in scatter
        pos = o[:, None, :] + t[..., None] * d[:, None, :]
        ray_ids = jnp.broadcast_to(jnp.arange(R, dtype=jnp.int32)[:, None], mask.shape)
        # ray id stored as an exact float (R < 2^24); empty slots stay -1.0
        packed = jnp.concatenate(
            [aabb.relative_pos(pos), t[..., None], ray_ids.astype(jnp.float32)[..., None]],
            axis=-1,
        )  # (R, CHUNK, 5)
        flat = flat.at[dest.reshape(-1)].set(packed.reshape(-1, 5), mode="drop")
        taken = taken + jnp.sum(mask, axis=1, dtype=jnp.int32)
        return (taken, still, flat), None

    init = (jnp.zeros(R, jnp.int32), jnp.ones(R, bool), flat)
    (taken, _, flat), _ = jax.lax.scan(body, init, jnp.arange(n_lattice // _CHUNK))

    flat_pos = flat[:, :3]
    flat_t = flat[:, 3]
    flat_valid = flat[:, 4] >= 0.0  # empty slots keep the -1.0 fill
    flat_ray = jnp.where(flat_valid, flat[:, 4], 0.0).astype(jnp.int32)

    dir_w = (d[flat_ray] + 1.0) * 0.5
    dts = jnp.full((capacity,), dt, jnp.float32)
    return flat_pos, dir_w, dts, flat_ray, flat_valid
