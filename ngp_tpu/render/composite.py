"""Differentiable emission-absorption compositing in padded ray-major layout.

TPU-native rebuild of the reference's training ray marcher
(internal/render/ray_marcher.cu:15-213, volume_rendering_with_loss_and_
gradient_kernal). The reference hand-derives ~250 lines of chain rule
(cu:156-188, including the "suffix" trick for density gradients); here the
composite is written once and `jax.grad` derives the backward pass — tests
validate it against the reference's closed-form gradient formulas.

Layout: the composite runs on the PADDED (R, S) view of the sample buffer
(ops/layout.py) — one row per ray, samples left-justified. Per-ray prefix
transmittance is then a plain `cumsum(axis=1)` over vector lanes; the
network's flat (C,) outputs enter through the gather-only flat->padded
bijection, so neither direction of the autodiff emits a scatter. Measured
on v5e this replaces a ~200 ms segment-op composite with ~5 ms of dense
vector work plus one 4.3 ns/row gather (tools/mb2.py).

Key exact identity exploited: log(1 - alpha_j) = -sigma_j * dt_j, so the
transmittance prefix product is exp(-cumsum(sigma dt)) with zero numerical
drama even when alpha -> 1.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ngp_tpu.ops import losses
from ngp_tpu.ops.layout import SampleLayout, pad_layout
from ngp_tpu.utils.config import LOSS_SCALE


class CompositeResult(NamedTuple):
    rgb_ray: jnp.ndarray  # (R, 3) composited color (incl. background term)
    trans_end: jnp.ndarray  # (R,) transmittance after the included samples
    include: jnp.ndarray  # (R, S) bool — samples contributing (T >= threshold)
    n_included: jnp.ndarray  # (R,) int32 — "compacted" sample counts
    exhausted: jnp.ndarray  # (R,) bool — marched all samples without early stop


def composite_rays(
    rgb,  # (R, S, 3) post-activation colors
    sigma,  # (R, S) post-activation densities
    dt,  # scalar or (R, S) unwarped step sizes
    valid,  # (R, S) bool — j < counts[r]
    counts,  # (R,) int32 valid samples per ray
    background,  # (3,) or (R, 3) color composited behind exhausted rays
    transmittance_threshold: float,
) -> CompositeResult:
    """Forward composite with the reference's early-stop semantics.

    A sample is included iff the transmittance *before* it is >= threshold
    (the reference breaks out of the loop at that point, ray_marcher.cu:72);
    the background is added only for rays that were not early-stopped
    (cu:123-126).
    """
    n_rays = sigma.shape[0]
    sdt = jnp.where(valid, sigma * dt, 0.0)
    acc_before = jnp.cumsum(sdt, axis=1) - sdt  # exclusive per-ray prefix
    trans = jnp.exp(-acc_before)

    include = valid & (trans >= transmittance_threshold)
    alpha = 1.0 - jnp.exp(-sdt)
    weight = jnp.where(include, alpha * trans, 0.0)

    rgb_ray = jnp.sum(weight[..., None] * rgb, axis=1)  # (R, 3)
    n_included = jnp.sum(include, axis=1, dtype=jnp.int32)
    trans_end = jnp.exp(-jnp.sum(jnp.where(include, sdt, 0.0), axis=1))

    exhausted = n_included == counts
    bg = jnp.broadcast_to(jnp.asarray(background, jnp.float32), (n_rays, 3))
    rgb_ray = rgb_ray + jnp.where(exhausted[:, None], trans_end[:, None] * bg, 0.0)
    return CompositeResult(rgb_ray, trans_end, include, n_included, exhausted)


def train_loss(
    rgb_raw,  # (C, 3) pre-activation network rgb, flat layout
    sigma_raw,  # (C,) pre-activation network density, flat layout
    layout: SampleLayout,  # flat<->padded bijection (ops/layout.py)
    dt,  # scalar or (R, S) step sizes
    ray_valid,  # (R,) bool — ray kept (>=1 sample, no overflow; cu:408,414-416)
    rgb_target,  # (R, 3)
    background,  # (3,) or (R, 3), linear, already the *training* background
    *,
    n_rays_denom: int,
    loss_type: str,
    transmittance_threshold: float,
    rgb_activation: str,
    density_activation: str,
    mean_density,
    min_optical_thickness: float,
    apply_rgb_activation,
    apply_density_activation,
    extra_buckets=(),  # [(layout, dt, ray_valid_rows, rgb_target_rows, background_rows)]
):
    """Scalar training objective; `jax.grad` of this reproduces the
    reference's hand-derived sample gradients (ray_marcher.cu:156-188).

    Effective objective (after folding the reference's LOSS_SCALE handling,
    cu:148-153 and tcnn Trainer's divide-by-loss-scale):

      L = (1/n_rays) sum_rays mean_rgb loss(target, composited)
        + [rgb act == Exponential] (1e-4 / n_rays) * 0.5 * relu(rgb_raw)^2
        + [mean_density < min_opt]  (1e-4 / LOSS_SCALE) * relu(-sigma_raw)
          (the reference adds the density-L1 term unscaled by loss_scale,
           cu:182 — we reproduce the effective magnitude exactly)

    `extra_buckets` lets the caller split rays over several (rows, width)
    padded layouts over the SAME flat buffer (each ray composited in exactly
    one bucket): the dense composite work scales with rows x width, and a
    short-wide split cuts the padding a long-tailed ray distribution forces
    on a single layout (~2.8x fewer padded slots in practice). Losses and
    stats are summed across buckets.

    Returns (loss_scalar, aux dict).
    """
    packed = jnp.concatenate([rgb_raw, sigma_raw[:, None]], axis=-1)  # (C, 4)

    loss = jnp.zeros(())
    loss_sum = jnp.zeros(())
    measured = jnp.zeros((), jnp.int32)
    aux = {}
    l1_coeff = jnp.where(mean_density < min_optical_thickness, 1e-4 / LOSS_SCALE, 0.0)

    for b, (lay, dt_b, rv_b, tgt_b, bg_b) in enumerate(
        ((layout, dt, ray_valid, rgb_target, background),) + tuple(extra_buckets)
    ):
        # flat -> padded through the gather-only bijection, ONE wide transfer
        padded = pad_layout(lay, packed)  # (Rb, Sb, 4)
        rgb_raw_p, sigma_raw_p = padded[..., :3], padded[..., 3]

        sigma = apply_density_activation(sigma_raw_p, density_activation)
        rgb = apply_rgb_activation(rgb_raw_p, rgb_activation)

        valid = lay.pad_valid & rv_b[:, None]
        res = composite_rays(
            rgb, sigma, dt_b, valid, lay.counts, bg_b, transmittance_threshold
        )
        per_ray_loss = jnp.mean(losses.loss_value(tgt_b, res.rgb_ray, loss_type), axis=-1)
        per_ray_loss = jnp.where(rv_b, per_ray_loss, 0.0)
        loss = loss + jnp.sum(per_ray_loss) / n_rays_denom

        include = jax.lax.stop_gradient(res.include)
        if rgb_activation.lower() == "exponential":
            reg = 0.5 * 1e-4 * jnp.sum(jnp.where(include[..., None], jax.nn.relu(rgb_raw_p) ** 2, 0.0))
            loss = loss + reg / n_rays_denom
        loss = loss + l1_coeff * jnp.sum(jnp.where(include, jax.nn.relu(-sigma_raw_p), 0.0))

        loss_sum = loss_sum + jnp.sum(per_ray_loss)
        measured = measured + jnp.sum(res.n_included)
        if b == 0:
            aux["per_ray_loss"] = per_ray_loss
            aux["rgb_ray"] = res.rgb_ray
            aux["n_included"] = res.n_included
        # per-bucket composite outputs for the envmap gradient path
        # (ray_marcher.cu:190-212 needs rgb_ray, the final transmittance and
        # the did-not-early-stop flag per ray); gradients don't flow through
        # aux, but stop_gradient makes that explicit
        aux.setdefault("bucket_rays", []).append(
            jax.lax.stop_gradient((res.rgb_ray, res.trans_end, res.exhausted))
        )

    aux["bucket_rays"] = tuple(aux["bucket_rays"])
    aux["loss_sum"] = loss_sum
    aux["measured_batch_size"] = measured
    return loss, aux
