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
import numpy as np

from ngp_tpu.grid.occupancy import (
    mip_from_dt,
    mip_from_pos,
    occupancy_lookup,
    packed_chunk_lookup,
    packed_cover_lookup,
    pooled_lookup,
    static_dt_mip,
)
from ngp_tpu.utils.aabb import AABB, warp_dt
from ngp_tpu.utils.config import SamplerConfig

_CHUNK = 128
_SEG = 8  # fine lattice points per coarse segment (== grid/occupancy._POOL)


def _march_mip(cfg: SamplerConfig, pos, dt: float):
    """Cascade index for occupancy tests along a constant-dt march.

    For aabb_scale == 1 the scene box is the unit cube, where every in-box
    point has |pos-0.5|_inf <= 0.5 and hence mip_from_pos == 0 except on the
    measure-zero boundary (reference mip_from_pos, occupancy_sampler.cu:
    216-221) — so the mip is the STATIC dt floor and the per-point
    frexp/cascade select drops out entirely. Out-of-box points get the wrong
    cascade, but every caller masks them with the AABB contains() test
    before use (count_samples' reachable prefix; the coarse pass only ever
    DROPS segments whose samples the fine phase would mask anyway).
    """
    fl = max(static_dt_mip(dt, cfg.grid_size, cfg.n_cascades), 0)
    if cfg.aabb_scale == 1:
        return jnp.full(pos.shape[:-1], fl, jnp.int32)
    mip = mip_from_pos(pos, cfg.n_cascades)
    return jnp.maximum(mip, fl) if fl > 0 else mip


def packed_march_supported(cfg: SamplerConfig) -> bool:
    """ONE packed-neighborhood gather per 8-step chunk replaces 8 single-cell
    occupancy gather rows (grid/occupancy.packed_neighborhood; XLA gathers
    cost per ROW). Exact under: arithmetic lattice (constant dt), aabb_scale
    1 (the march mip is then constantly 0 — _march_mip; the bound below
    implies the static dt-mip floor is <= 0 too), and the chunk half-extent
    within one fine cell — |t_point - t_mid| <= 3.5*dt and 3.5*dt*G <= 1
    keep every point's cell within +-1 of the midpoint's per axis (default
    config: 3.5*sqrt(3)/1024*128 = 0.76)."""
    return (
        cfg.cone_angle_constant == 0.0
        and cfg.aabb_scale == 1
        and 3.5 * cfg.min_cone_stepsize * cfg.grid_size <= 1.0
    )


def _packed_group_occ(cfg: SamplerConfig, packed, pos, step_vec=None):
    """Occupancy of lattice positions `pos` (R, W, 3) via one packed gather
    per 8-point group. Columns must be CONSECUTIVE lattice ordinals within
    each aligned group of _SEG: the group midpoint (ordinal offset +3.5) is
    then the average of points 3 and 4 on the straight ray, so every point
    sits within 3.5*dt of it — packed_march_supported's coverage bound.

    With `step_vec` ((R, 3), the ray's dt*d) the test turns CONSERVATIVE
    over a +dt march-start jitter: point i reports True iff ANY cell touched
    by the segment [pos_i, pos_i + dt*d] is occupied (jitter_cover_supported;
    see packed_cover_lookup). A jittered sample t_i + delta, delta in
    [0, dt), lands in one of exactly those cells (per-axis monotonicity of
    the straight segment), so the cover mask is a superset of EVERY pass's
    exact mask — one march serves all spp passes."""
    R, W, _ = pos.shape
    pg = pos.reshape(R, W // _SEG, _SEG, 3)
    pos_mid = 0.5 * (pg[:, :, 3, :] + pg[:, :, 4, :])
    if step_vec is None:
        return packed_chunk_lookup(cfg, packed, pos_mid, pg).reshape(R, W)
    pg2 = pg + step_vec[:, None, None, :]
    return packed_cover_lookup(cfg, packed, pos_mid, pg, pg2).reshape(R, W)


def jitter_cover_supported(cfg: SamplerConfig) -> bool:
    """The shared-march (jitter-cover) test needs the packed march PLUS one
    extra step of chunk half-extent: point 7's segment endpoint pos + dt*d is
    4.5*dt from the group midpoint, so every tested cell stays within +-1 of
    the midpoint's only when 4.5*dt*G <= 1 (default config: 0.97)."""
    return packed_march_supported(cfg) and 4.5 * cfg.min_cone_stepsize * cfg.grid_size <= 1.0


def segments_supported(cfg: SamplerConfig) -> bool:
    """The two-level (coarse-premask) march assumes the arithmetic lattice
    (cone_angle_constant == 0): segment midpoints are closed-form and the
    8*dt segment extent is far below the superblock edge. Cone-stepping
    configs use the exact full-window march instead."""
    return cfg.cone_angle_constant == 0.0


def coarse_segment_mask(cfg: SamplerConfig, pooled, o, d, startt, n_seg: int, k0):
    """(R, n_seg) bool: segment j (fine ordinals k0 + 8j .. 8j+7) may hold an
    occupied sample — a conservative superset via the HALO-pooled grid
    (grid/occupancy.pooled_occupancy): one lookup at the segment midpoint
    covers every fine point within _HALO (3) fine cells of the midpoint's
    superblock, which absorbs the (4+1)*dt half-extent (march-start jitter
    < dt included; see pooled_occupancy). False positives only cost
    fine-phase work; the fine phase re-tests exactly.

    Cascades: occupancy is monotone in mip — update_grid_bitfield OR-merges
    the 2x-pooled finer cascade into each coarser one's central octant
    (grid/occupancy.update_occupancy; reference occupancy_sampler.cu:182-205)
    and cascade m's cube IS cascade m+1's central octant — so a lookup at the
    midpoint's own mip covers every fine point at that mip OR BELOW. A fine
    point can sit one mip ABOVE the midpoint's only when the midpoint is
    within the march slack of its mip-cube boundary (maxval = 2^(mip-1));
    that thin shell additionally ORs the next mip's lookup.
    """
    dt = cfg.min_cone_stepsize
    j = jnp.arange(n_seg, dtype=jnp.float32)
    tm = startt[:, None] + (k0.astype(jnp.float32)[:, None] + _SEG * j[None, :] + 4.0) * dt
    pos = o[:, None, :] + tm[..., None] * d[:, None, :]
    mip = _march_mip(cfg, pos, dt)
    occ = pooled_lookup(cfg, pooled, pos, mip)
    maxval = jnp.max(jnp.abs(pos - 0.5), axis=-1)
    if cfg.n_cascades > 1:
        # upper bound of mip m's range is maxval = 2^(m-1) (mip_from_pos)
        bound = jax.lax.bitcast_convert_type((126 + mip) << 23, jnp.float32)
        near = maxval >= bound - 16.0 * dt
        mip_hi = jnp.minimum(mip + 1, cfg.n_cascades - 1)
        occ = occ | (near & pooled_lookup(cfg, pooled, pos, mip_hi))
    # segments whose whole (4+1)*dt extent lies outside the scene cube cannot
    # contribute (the fine phase masks by aabb.contains). Without this test
    # the boundary-clipped pooled_lookup reads a boundary superblock for every
    # post-exit midpoint — windows are sized to the occupied-box DIAGONAL, so
    # most rays march past their cube exit, and occupancy at a cube face would
    # flood the controller's kept-segment counts with phantom segments.
    scene_half = 0.5 * float(cfg.aabb_scale)
    return occ & (maxval <= scene_half + 8.0 * dt)


def count_samples_segments(cfg: SamplerConfig, aabb: AABB, occupancy, o, d, startt, k0, seg_idx, packed=None, jitter_cover: bool = False):
    """Fine march restricted to pre-masked coarse segments.

    seg_idx: (R, C) int32 ASCENDING kept-segment ordinals (padding sentinel
    >= the frame's segment count). Returns (counts (R,), masks (R, C*8),
    lat (R, C*8)) with `lat` the k0-relative fine lattice ordinals in march
    order. Produces exactly count_samples' sample set when seg_idx covers
    every coarse-occupied segment (pooled_occupancy guarantee): for the
    convex scene AABB with the march starting inside, the reference's
    break-on-exit prefix (occupancy_sampler.cu:397) is equivalent to the
    pointwise contains() test, and skipped segments contribute no samples
    by construction.

    jitter_cover=True (requires `packed` + jitter_cover_supported): `startt`
    is the UNJITTERED march start, and the returned mask is a conservative
    superset of the exact mask for every jittered start in
    [startt, startt + dt) — one march serves all spp passes of a frame
    (occupancy via packed_cover_lookup; the AABB prefix likewise covers the
    segment [t, t + dt]). False positives cost only composite work: the
    composite re-masks contains() pointwise and evaluates the network at the
    jittered position, where the field — not the grid — decides the
    contribution.
    """
    dt = cfg.min_cone_stepsize
    R, C = seg_idx.shape
    j8 = jnp.arange(_SEG, dtype=jnp.int32)
    lat = (seg_idx[:, :, None] * _SEG + j8[None, None, :]).reshape(R, C * _SEG)
    t = startt[:, None] + (k0[:, None] + lat).astype(jnp.float32) * dt
    pos = o[:, None, :] + t[..., None] * d[:, None, :]
    # break-on-exit prefix (occupancy_sampler.cu:397) for the convex scene
    # box == pointwise contains AND the window's FIRST lattice point inside
    # (a march starting outside the box yields nothing, exactly as the
    # full-window cumprod does)
    t0p = startt + k0.astype(jnp.float32) * dt
    inside0 = aabb.contains(o + t0p[:, None] * d)
    inside = aabb.contains(pos)
    if jitter_cover:
        step_vec = d * dt
        inside = inside | aabb.contains(pos + step_vec[:, None, :])
        inside0 = inside0 | aabb.contains(o + (t0p + dt)[:, None] * d)
        occ = _packed_group_occ(cfg, packed, pos, step_vec=step_vec)
    elif packed is not None:
        # each kept segment is one aligned 8-ordinal group: ONE packed gather
        # per (ray, segment) instead of 8 single-cell rows (exact;
        # packed_march_supported)
        occ = _packed_group_occ(cfg, packed, pos)
    else:
        mip = _march_mip(cfg, pos, dt)
        occ = occupancy_lookup(cfg, occupancy, pos, mip)
    mask = inside & inside0[:, None] & occ
    ordinal = jnp.cumsum(mask, axis=1) - mask.astype(jnp.int32)
    mask = mask & (ordinal < cfg.maximum_marching_steps)
    return jnp.sum(mask, axis=1, dtype=jnp.int32), mask, lat


def assert_supported(cfg: SamplerConfig):
    """All shipped stepping modes are supported (c = 0 and c > 0)."""


def n_lattice_points(cfg: SamplerConfig) -> int:
    """Static lattice length: enough steps to cross the scene AABB diagonal.

    For cone_angle_constant c > 0 the lattice is arithmetic(m) →
    geometric(1+c) → arithmetic(M) (calc_dt, occupancy_sampler.cu:207-214),
    so far fewer steps cover the diagonal; the bound below is the worst case
    over any start t >= 0.
    """
    import math

    diag = math.sqrt(3.0) * cfg.aabb_scale
    m = cfg.min_cone_stepsize
    c = cfg.cone_angle_constant
    if c == 0.0:
        n = int(math.ceil(diag / m)) + 1
    else:
        M = cfg.max_cone_stepsize
        n_a = int(math.ceil(1.0 / c)) + 1  # region A worst case (t0 = 0)
        n_b = int(math.ceil(math.log(max(M / m, 1.0)) / math.log1p(c))) + 1
        n_c = int(math.ceil(diag / M)) + 1
        n = n_a + n_b + n_c
    return -(-n // _CHUNK) * _CHUNK  # round up to a whole number of chunks


def lattice_t(cfg: SamplerConfig, startt, idx):
    """t of lattice index `idx` for a march starting at `startt` (broadcast).

    c = 0: t = startt + idx*m. c > 0: closed form of the reference's
    per-step recurrence t' = t + clamp(c*t, m, M) (calc_dt, cu:207-214):
    arithmetic at m while c*t < m, geometric ratio (1+c) while m <= c*t < M,
    then arithmetic at M.
    """
    m = cfg.min_cone_stepsize
    c = cfg.cone_angle_constant
    i = idx.astype(jnp.float32) if hasattr(idx, "astype") else jnp.asarray(idx, jnp.float32)
    if c == 0.0:
        return startt + i * m
    M = cfg.max_cone_stepsize
    t0 = jnp.asarray(startt, jnp.float32)
    iA = jnp.ceil(jnp.maximum(m / c - t0, 0.0) / m)
    tA = t0 + iA * m
    log1pc = float(np.log1p(c))
    nB = jnp.ceil(jnp.log(jnp.maximum(M / (c * jnp.maximum(tA, 1e-30)), 1.0)) / log1pc)
    tC = tA * jnp.exp(nB * log1pc)
    iC = iA + nB
    t_a = t0 + i * m
    t_b = tA * jnp.exp((i - iA) * log1pc)
    t_c = tC + (i - iC) * M
    return jnp.where(i <= iA, t_a, jnp.where(i <= iC, t_b, t_c))


def lattice_dt(cfg: SamplerConfig, t):
    """Step size at t: clamp(c*t, m, M) for c > 0, else the constant m."""
    c = cfg.cone_angle_constant
    if c == 0.0:
        return jnp.full_like(t, cfg.min_cone_stepsize)
    return jnp.clip(c * t, cfg.min_cone_stepsize, cfg.max_cone_stepsize)


def ray_box_span(box, o, d):
    """Slab test of rays against a TRACED box (2, 3) -> (tmin, tmax) per ray.

    Misses have tmax < tmin. Zero direction components are nudged so the
    0/0 case can't produce NaNs (the huge finite ts behave like the exact
    ±inf slabs)."""
    dd = jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
    t1 = (box[0] - o) / dd
    t2 = (box[1] - o) / dd
    return jnp.max(jnp.minimum(t1, t2), axis=-1), jnp.min(jnp.maximum(t1, t2), axis=-1)


def occupied_window_start(occ_aabb, o, d, startt, dt: float, n_lattice: int):
    """Per-ray first lattice index whose t can possibly be occupied.

    Skipping to it is EXACT: every earlier lattice point is outside the
    occupied-cell AABB, where occupancy is false by construction, and the
    skipped prefix lies inside the (convex) scene box whenever any later
    point does, so the reference's break-on-exit semantics are unaffected.
    """
    t_lo, t_hi = ray_box_span(occ_aabb, o, d)
    k0 = jnp.floor((t_lo - startt) / dt).astype(jnp.int32)
    miss = t_hi < jnp.maximum(t_lo, startt)
    return jnp.clip(jnp.where(miss, n_lattice, k0), 0, n_lattice)


def _chunk_mask(cfg: SamplerConfig, aabb: AABB, occupancy, o, d, startt, chunk_start, taken_so_far, still_inside, k0=None, packed=None, jitter_cover: bool = False):
    """Occupied-sample mask for lattice points [chunk_start, chunk_start+_CHUNK).

    Returns (mask (R, CHUNK), t, ordinal, still_inside'). The reference's
    march loop BREAKS at the first lattice point outside the AABB
    (occupancy_sampler.cu:397) — `still_inside` carries that prefix property
    across chunks. `taken_so_far` caps occupied samples per ray at
    n_max_steps (the `j < n_max_steps` bound). `k0` shifts each ray's lattice
    window to its occupied-AABB entry (occupied_window_start).
    """
    dt = cfg.min_cone_stepsize
    i = chunk_start + jnp.arange(_CHUNK, dtype=jnp.float32)
    if k0 is not None:
        i = k0.astype(jnp.float32)[:, None] + i[None, :]
    else:
        i = jnp.broadcast_to(i[None, :], (o.shape[0], _CHUNK))
    t = lattice_t(cfg, startt[:, None], i)  # (R, CHUNK)
    pos = o[:, None, :] + t[..., None] * d[:, None, :]  # (R, CHUNK, 3)
    inside = aabb.contains(pos)
    if jitter_cover:
        # conservative over a +dt start jitter (see count_samples_segments)
        inside = inside | aabb.contains(pos + (d * dt)[:, None, :])
    # prefix-AND: a point is reachable only if every earlier point was inside
    reachable = still_inside[:, None] & (jnp.cumprod(inside, axis=1) > 0)
    if jitter_cover:
        occ = _packed_group_occ(cfg, packed, pos, step_vec=d * dt)
    elif packed is not None:
        # single gather per 8-step group (exact; packed_march_supported)
        occ = _packed_group_occ(cfg, packed, pos)
    elif cfg.cone_angle_constant == 0.0:
        # dt is config-static, so its mip floor is too (cu:223-230)
        mip = _march_mip(cfg, pos, dt)
        occ = occupancy_lookup(cfg, occupancy, pos, mip)
    else:
        mip = mip_from_dt(lattice_dt(cfg, t), pos, cfg.grid_size, cfg.n_cascades)
        occ = occupancy_lookup(cfg, occupancy, pos, mip)
    mask = reachable & occ
    # enforce the per-ray sample cap (the reference's `j < n_max_steps`)
    ordinal = taken_so_far[:, None] + jnp.cumsum(mask, axis=1) - mask.astype(jnp.int32)
    mask = mask & (ordinal < cfg.maximum_marching_steps)
    return mask, t, ordinal, reachable[:, -1]


def count_samples(cfg: SamplerConfig, aabb: AABB, occupancy, o, d, startt, n_window: int, return_masks: bool = False, k0=None, packed=None, jitter_cover: bool = False):
    """Pass 1: per-ray occupied-sample counts (R,) int32.

    Mirrors the reference's first marching pass (occupancy_sampler.cu:389-407).
    With return_masks=True also returns the (R, n_window) occupied mask so
    pass 2 can skip re-doing the occupancy gathers (1 byte/lattice point).
    `k0` (R,) shifts each ray's window start — mask column j then refers to
    lattice index k0 + j. `n_window` must cover the longest possible occupied
    span (the occupied-AABB diagonal in lattice steps when k0 is used, else
    the full lattice).
    """

    def body(carry, chunk_idx):
        taken, still = carry
        mask, _, _, still = _chunk_mask(cfg, aabb, occupancy, o, d, startt, chunk_idx * _CHUNK, taken, still, k0=k0, packed=packed, jitter_cover=jitter_cover)
        return (taken + jnp.sum(mask, axis=1, dtype=jnp.int32), still), (mask if return_masks else None)

    R = o.shape[0]
    (taken, _), masks = jax.lax.scan(
        body, (jnp.zeros(R, jnp.int32), jnp.ones(R, bool)), jnp.arange(n_window // _CHUNK)
    )
    if return_masks:
        # (n_chunks, R, CHUNK) -> (R, n_window)
        return taken, jnp.transpose(masks, (1, 0, 2)).reshape(R, n_window)
    return taken
