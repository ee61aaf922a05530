"""Training ray/sample generation — fixed-shape rebuild of
generate_training_samples_nerf (reference occupancy_sampler.cu:310-449).

Per step: pick an image per ray (deterministic stride, cu:348), a uniform
pixel (snapped to centers, cu:356-358), build the ray from the camera
matrix (cu:362-370), clip to the scene AABB with the near-distance guard
(cu:373-375), jitter the march start by a random fraction of dt (cu:385),
march the t-lattice, and compact each ray's occupied samples.

Compaction strategy (v2, all gathers — no large scatters):
 1. ONE lattice pass produces the per-ray occupied mask (R, n_lattice) and
    counts (sampling/lattice.py).
 2. Per-ray compaction is a batched row SORT of `where(mask, lattice_index,
    BIG)` — occupied lattice indices are already in march order, so sorting
    left-justifies them; the first S columns are the padded sample list.
    (The reference's atomicAdd emit pass, cu:413-426, becomes this sort.)
 3. Sample positions are CLOSED-FORM from the lattice index (t = startt +
    i*dt), so nothing else needs moving; the flat network batch gathers its
    per-slot lattice index through the flat<->padded bijection
    (ops/layout.py), and rays overflowing the 2^18 sample budget are
    dropped whole (cu:414-416), as are rays longer than the padded width S
    (a tail the S controller sizes away; the reference has no such drop but
    also caps at maximum_marching_steps).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ngp_tpu.data.nerf_synthetic import read_rgba
from ngp_tpu.ops.layout import SampleLayout, build_layout
from ngp_tpu.sampling.lattice import (
    _SEG,
    coarse_segment_mask,
    count_samples,
    count_samples_segments,
    lattice_dt,
    lattice_t,
    occupied_window_start,
    packed_march_supported,
)
from ngp_tpu.utils.aabb import AABB
from ngp_tpu.utils.config import SamplerConfig


class TrainingBatch(NamedTuple):
    # per-ray
    rays_o: jnp.ndarray  # (R, 3)
    rays_d: jnp.ndarray  # (R, 3)
    rgba: jnp.ndarray  # (R, 4) premultiplied-linear target
    ray_valid: jnp.ndarray  # (R,) bool — all kept rays (either bucket)
    layout: SampleLayout  # SHORT bucket: all R rays at width S_short
    # LONG bucket: the n_long longest rays, row-compacted at width S_long —
    # the composite's dense cost is rows x width, so splitting the long tail
    # off cuts padded slots ~2.8x (None when bucketing is off)
    layout_long: SampleLayout | None
    sel_long: jnp.ndarray | None  # (n_long,) ray indices of the long rows
    valid_long: jnp.ndarray | None  # (n_long,) bool
    valid_short: jnp.ndarray  # (R,) bool — kept rays composited in SHORT
    # flat samples (capacity C), network inputs
    pos: jnp.ndarray  # (C, 3) warped
    dirs: jnp.ndarray  # (C, 3) warped
    # per-sample step sizes in padded layout per bucket; None when the
    # constant min_cone_stepsize applies everywhere (cone_angle_constant == 0)
    dt_pad: jnp.ndarray | None
    dt_pad_long: jnp.ndarray | None
    # telemetry
    n_samples: jnp.ndarray  # () int32 — generated samples before drops
    max_ray_count: jnp.ndarray  # () int32 — longest ray this step (S controller)
    count_at_split: jnp.ndarray  # () int32 — longest SHORT-bucket count (S_short controller)
    # p99.5 of per-ray coarse-occupied segment counts (pre-truncation; the
    # seg-cap controller's signal). A MAX here lets ONE worst-case ray park
    # the cap above the engage threshold and silently disable the premask —
    # the controller sizes from this quantile instead, truncating the <=0.5%
    # longest rays to their first cap segments (the s_pad-truncation
    # philosophy; the reference likewise caps occupied samples at
    # n_max_steps, occupancy_sampler.cu:408). Zero when the coarse pass
    # didn't run.
    seg_count_hi: jnp.ndarray = 0


def generate_training_batch(
    cfg: SamplerConfig,
    aabb: AABB,
    images,  # (N, H, W, 4) fp16
    xforms,  # (N, 3, 4)
    focal_length,
    principal_point,
    occupancy,  # (n_cascades, G, G, G) bool
    key,
    n_rays: int,
    n_rays_shift,
    capacity: int,
    n_lattice: int,
    s_pad: int,
    stride_denom: int = 0,
    index_offset=0,
    occ_aabb=None,
    n_window: int = 0,
    s_short: int = 0,
    n_long: int = 0,
    n_seg_cap: int = 0,
    want_seg_stat: bool = False,
) -> TrainingBatch:
    """`stride_denom`/`index_offset` let a data-parallel shard generate its
    slice [index_offset, index_offset + n_rays) of a `stride_denom`-ray
    global batch while keeping the reference's image-pick formula global.

    `occ_aabb` (2, 3) + static `n_window` clip each ray's lattice march to
    its entry into the occupied-cell AABB (exact empty-space skip; the
    window must cover the box diagonal in lattice steps — the TrainingLoop
    sizes it from the box each train() call).

    `s_short`/`n_long` enable the two-bucket composite layout: the n_long
    longest rays go to a compacted (n_long, s_pad) bucket, everything else
    to the (R, s_short) bucket; a ray outside the top-n_long whose count
    exceeds s_short is dropped whole (same whole-ray drop philosophy as the
    s_pad cap — the TrainingLoop sizes s_short from the count_at_split stat
    so such drops are rare).

    `n_seg_cap > 0` enables the two-level march (arithmetic lattice only):
    a coarse pass over the halo-pooled super-occupancy keeps at most
    n_seg_cap 8-step segments per ray and the fine occupancy march touches
    only those — the exact sample set of the full-window march whenever the
    cap covers every coarse-occupied segment (conservative premask,
    lattice.count_samples_segments), at ~n_seg_cap*8/n_window of its cost.
    Rays with more kept segments are TRUNCATED to the first n_seg_cap (the
    march-order prefix — the same semantics as the s_pad truncation; the
    seg_count_hi stat lets the TrainingLoop size the cap so this is rare).
    `want_seg_stat` computes seg_count_hi even when the premask is off, so
    the controller can decide when to engage it."""
    n_images, h, w = images.shape[0], images.shape[1], images.shape[2]
    denom = stride_denom or n_rays
    n_window = min(n_window or n_lattice, n_lattice)
    s_pad = min(s_pad, n_window)  # counts can never exceed the window

    # image pick: uint32 stride arithmetic, parity with cu:348
    i = jnp.arange(n_rays, dtype=jnp.uint32) + jnp.uint32(index_offset)
    img = (((jnp.uint32(n_rays_shift) + i) * jnp.uint32(n_images)) // jnp.uint32(denom)) % jnp.uint32(n_images)
    img = img.astype(jnp.int32)

    # Partition-invariant per-ray draws: two u32 salts from the (global,
    # chip-independent) key, then pixel xy and the march-start jitter come
    # from the counter-based pcg4d hash over the GLOBAL ray index — so an
    # N-chip data-parallel mesh generating slices of this batch draws the
    # EXACT same global ray set as one chip (tests/test_dp_equivalence.py).
    # The reference's per-ray rng is likewise a counter-seeded pcg32
    # (occupancy_sampler.cu:318-321).
    from ngp_tpu.grid.occupancy import _pcg4d

    salts = jax.random.bits(key, (2,), jnp.uint32)
    ctr = jnp.stack(
        [
            i,
            jnp.broadcast_to(salts[0], i.shape),
            jnp.broadcast_to(salts[1], i.shape),
            jnp.broadcast_to(jnp.uint32(0x9E3779B9), i.shape),
        ],
        axis=-1,
    )
    h0, h1, h2, _ = _pcg4d(ctr)
    inv24 = jnp.float32(1.0 / (1 << 24))
    xy = jnp.stack([(h0 >> 8), (h1 >> 8)], axis=-1).astype(jnp.float32) * inv24
    jitter_u = (h2 >> 8).astype(jnp.float32) * inv24
    if cfg.snap_to_pixel_centers_in_training:
        res = jnp.array([w, h], jnp.float32)
        xy = (jnp.clip(jnp.floor(xy * res), 0, res - 1) + 0.5) / res

    xf = xforms[img]  # (R, 3, 4)
    fx, fy = focal_length
    d_cam = jnp.stack(
        [
            (xy[:, 0] - principal_point[0]) * w / fx,
            (xy[:, 1] - principal_point[1]) * h / fy,
            jnp.ones((n_rays,), jnp.float32),
        ],
        axis=-1,
    )
    d = jnp.einsum("rij,rj->ri", xf[:, :, :3], d_cam)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = xf[:, :, 3]

    tmin, tmax = aabb.ray_intersect(o, d)
    tmin = jnp.maximum(tmin, cfg.near_distance)
    dt = cfg.min_cone_stepsize
    # march-start jitter by a fraction of the LOCAL step (cu:385)
    startt = tmin + lattice_dt(cfg, tmin) * jitter_u
    hits = tmin < tmax

    if occ_aabb is not None and cfg.cone_angle_constant == 0.0:
        k0 = occupied_window_start(occ_aabb, o, d, startt, dt, n_lattice)
    else:
        # the window-start inversion assumes the arithmetic lattice; c > 0
        # marches the full (much shorter) cone lattice instead
        n_window = n_lattice
        k0 = jnp.zeros((n_rays,), jnp.int32)
    # coarse premask (and/or its controller stat): one halo-pooled lookup per
    # 8-step segment, conservative for the jittered march (lattice.py)
    coarse_ok = cfg.cone_angle_constant == 0.0 and occ_aabb is not None and n_window % _SEG == 0
    seg_on = n_seg_cap > 0 and coarse_ok
    seg_count_hi = jnp.zeros((), jnp.int32)
    if seg_on or (want_seg_stat and coarse_ok):
        from ngp_tpu.grid.occupancy import pooled_occupancy

        n_seg = n_window // _SEG
        pooled = pooled_occupancy(cfg, occupancy)
        cmask = coarse_segment_mask(cfg, pooled, o, d, startt, n_seg, k0) & hits[:, None]
        k_hi = min(int(0.995 * n_rays), n_rays - 1)
        seg_count_hi = jax.lax.sort(jnp.sum(cmask, axis=1, dtype=jnp.int32))[k_hi]

    # packed-neighborhood march (single-cascade arithmetic lattice): one
    # uint32 gather answers 8 occupancy tests; built in-step from the grid
    # (27 shifted ORs over G^3 — negligible next to the gathers it removes)
    packed = None
    if packed_march_supported(cfg):
        from ngp_tpu.grid.occupancy import packed_neighborhood

        packed = packed_neighborhood(cfg, occupancy)

    lat_all = None
    if seg_on:
        j_seg = jnp.arange(n_seg, dtype=jnp.int32)[None, :]
        seg_idx = jax.lax.sort(jnp.where(cmask, j_seg, jnp.int32(n_seg)), dimension=1)[:, :n_seg_cap]
        counts, masks, lat_all = count_samples_segments(cfg, aabb, occupancy, o, d, startt, k0, seg_idx, packed=packed)
        s_pad = min(s_pad, n_seg_cap * _SEG)  # counts can't exceed the kept width
    else:
        counts, masks = count_samples(cfg, aabb, occupancy, o, d, startt, n_window, return_masks=True, k0=k0, packed=packed)
    masks = masks & hits[:, None]
    counts = jnp.where(hits, counts, 0)
    n_samples = jnp.sum(counts)
    max_ray_count = jnp.max(counts)  # pre-truncation, so the S controller sees the true tail
    # when the memory cap pins s_pad below the longest ray, TRUNCATE to the
    # first s_pad samples instead of dropping the ray whole — the reference
    # likewise truncates the march at n_max_steps (occupancy_sampler.cu:408)
    # rather than removing supervision for long-span pixels
    counts = jnp.minimum(counts, s_pad)

    # bucket split: the n_long longest rays composite in a compacted
    # (n_long, s_pad) layout, the rest in (R, s_short)
    bucketed = 0 < s_short < s_pad and 0 < n_long < n_rays
    if not bucketed:
        s_short = s_pad

    # whole-ray drops: zero samples, longer than the bucket width, or
    # overflowing the flat sample budget (cu:408, cu:414-416 semantics —
    # dropped rays keep their flat reservation as holes)
    if bucketed:
        order = jnp.argsort(-counts)
        # ascending ray order: build_layout ranks rows by their flat `base`
        # offset (cumsum of scattered marks), so the long bucket's base array
        # must be ascending or the backward's rank->row map scrambles and the
        # bucket's gradients silently vanish (layout.py:59-75)
        sel_long = jax.lax.sort(order[:n_long])
        is_long = jnp.zeros((n_rays,), bool).at[sel_long].set(True)
        count_at_split = counts[order[n_long]]
        ray_valid = (counts > 0) & jnp.where(is_long, counts <= s_pad, counts <= s_short)
    else:
        sel_long = None
        is_long = jnp.zeros((n_rays,), bool)
        # honest split stat even when bucketing is OFF: the controller sizes
        # s_short from the longest count OUTSIDE the would-be top bucket. With
        # max_ray_count here instead, s_short pins to s_pad (= "off") and the
        # two-bucket composite can never re-engage at steady state.
        if 0 < n_long < n_rays:
            count_at_split = jax.lax.top_k(counts, n_long + 1)[0][n_long]
        else:
            count_at_split = max_ray_count
        ray_valid = (counts > 0) & (counts <= s_pad)
    counts_res = jnp.where(ray_valid, counts, 0)
    base = jnp.cumsum(counts_res) - counts_res
    ray_valid = ray_valid & (base + counts_res <= capacity)
    valid_short = ray_valid & ~is_long
    layout = build_layout(base, counts, valid_short, capacity, s_short)
    layout_long = valid_long = None
    if bucketed:
        valid_long = (ray_valid & is_long)[sel_long]
        layout_long = build_layout(base[sel_long], counts[sel_long], valid_long, capacity, s_pad)

    # per-ray compaction: occupied window indices are increasing, so a row
    # sort of where(mask, j, SENTINEL) left-justifies them in march order.
    # On the seg path the mask columns carry their own lattice ordinals
    # (count_samples_segments' `lat`), already ascending across kept segments.
    if seg_on:
        lat_vals, sentinel = lat_all, jnp.int32((n_seg + 1) * _SEG)
    else:
        lat_vals = jnp.arange(n_window, dtype=jnp.int32)[None, :]
        sentinel = jnp.int32(n_window)
    keys = jnp.where(masks & ray_valid[:, None], lat_vals, sentinel)
    lat_pad = jax.lax.sort(keys, dimension=1)[:, :s_pad]  # (R, S_long), k0-relative

    # flat network inputs, all closed-form from the lattice index k0 + j;
    # a FULL-width throwaway layout supplies the flat-slot -> (ray, j) map
    # (the composite buckets never materialize this width)
    lay_all = build_layout(base, counts, ray_valid, capacity, s_pad) if bucketed else layout
    rid = lay_all.ray_ids
    flat_lat = jnp.where(lay_all.flat_valid, k0[rid] + lat_pad[rid, lay_all.pos_in_ray], 0)
    flat_t = lattice_t(cfg, startt[rid], flat_lat)
    flat_pos = o[rid] + flat_t[:, None] * d[rid]
    flat_dirs = (d[rid] + 1.0) * 0.5

    dt_pad = dt_pad_long = None
    if cfg.cone_angle_constant != 0.0:
        t_pad = lattice_t(cfg, startt[:, None], k0[:, None] + lat_pad)
        dts = lattice_dt(cfg, t_pad)  # (R, S_long)
        dt_pad = dts[:, :s_short]
        if bucketed:
            dt_pad_long = dts[sel_long]

    rgba = read_rgba(images, xy, img)
    return TrainingBatch(
        rays_o=o,
        rays_d=d,
        rgba=rgba,
        ray_valid=ray_valid,
        layout=layout,
        layout_long=layout_long,
        sel_long=sel_long,
        valid_long=valid_long,
        valid_short=valid_short,
        pos=aabb.relative_pos(flat_pos),
        dirs=flat_dirs,
        dt_pad=dt_pad,
        dt_pad_long=dt_pad_long,
        n_samples=n_samples,
        max_ray_count=max_ray_count,
        count_at_split=count_at_split,
        seg_count_hi=seg_count_hi,
    )
