"""Training ray/sample generation — fixed-shape rebuild of
generate_training_samples_nerf (reference occupancy_sampler.cu:310-449).

Per step: pick an image per ray (deterministic stride, cu:348), a uniform
pixel (snapped to centers, cu:356-358), build the ray from the camera
matrix (cu:362-370), clip to the scene AABB with the near-distance guard
(cu:373-375), jitter the march start by a random fraction of dt (cu:385),
march the t-lattice, and compact all rays' occupied samples into flat
capacity-bounded buffers (prefix-sum replaces the reference's atomicAdd;
rays overflowing capacity are dropped whole, matching cu:414-416).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ngp_tpu.data.nerf_synthetic import read_rgba
from ngp_tpu.sampling.lattice import count_samples, scatter_samples
from ngp_tpu.utils.aabb import AABB
from ngp_tpu.utils.config import SamplerConfig


class TrainingBatch(NamedTuple):
    # per-ray
    rays_o: jnp.ndarray  # (R, 3)
    rays_d: jnp.ndarray  # (R, 3)
    rgba: jnp.ndarray  # (R, 4) premultiplied-linear target
    counts: jnp.ndarray  # (R,) int32
    base: jnp.ndarray  # (R,) int32 flat offsets
    ray_valid: jnp.ndarray  # (R,) bool
    # flat samples (capacity C)
    pos: jnp.ndarray  # (C, 3) warped
    dirs: jnp.ndarray  # (C, 3) warped
    dt: jnp.ndarray  # (C,) unwarped step size
    ray_ids: jnp.ndarray  # (C,) int32
    valid: jnp.ndarray  # (C,) bool
    n_samples: jnp.ndarray  # () int32 — uncompacted measured batch size


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
    stride_denom: int = 0,
    index_offset=0,
) -> TrainingBatch:
    """`stride_denom`/`index_offset` let a data-parallel shard generate its
    slice [index_offset, index_offset + n_rays) of a `stride_denom`-ray
    global batch while keeping the reference's image-pick formula global."""
    n_images, h, w = images.shape[0], images.shape[1], images.shape[2]
    k_pixel, k_jitter = jax.random.split(key)
    denom = stride_denom or n_rays

    # image pick: uint32 stride arithmetic, parity with cu:348
    i = jnp.arange(n_rays, dtype=jnp.uint32) + jnp.uint32(index_offset)
    img = (((jnp.uint32(n_rays_shift) + i) * jnp.uint32(n_images)) // jnp.uint32(denom)) % jnp.uint32(n_images)
    img = img.astype(jnp.int32)

    xy = jax.random.uniform(k_pixel, (n_rays, 2))
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
    startt = tmin + dt * jax.random.uniform(k_jitter, (n_rays,))
    hits = tmin < tmax

    counts, masks = count_samples(cfg, aabb, occupancy, o, d, startt, n_lattice, return_masks=True)
    masks = masks & hits[:, None]
    counts = jnp.where(hits, counts, 0)
    ray_valid = counts > 0
    base = jnp.cumsum(counts) - counts  # exclusive prefix (cu:413 atomicAdd)
    n_samples = jnp.sum(counts)
    ray_valid = ray_valid & (base + counts <= capacity)  # cu:414-416 overflow drop

    pos, dirs, dts, ray_ids, valid = scatter_samples(
        cfg, aabb, occupancy, o, d, startt, base, ray_valid, n_lattice, capacity, masks=masks
    )

    rgba = read_rgba(images, xy, img)
    return TrainingBatch(
        rays_o=o,
        rays_d=d,
        rgba=rgba,
        counts=jnp.where(ray_valid, counts, 0),
        base=base,
        ray_valid=ray_valid,
        pos=pos,
        dirs=dirs,
        dt=dts,
        ray_ids=ray_ids,
        valid=valid,
        n_samples=n_samples,
    )
