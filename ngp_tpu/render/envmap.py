"""Trainable environment-map background — optional subsystem (off by default).

Rebuild of reference internal/utils/envmap.h + trainable_buffer.h:
 * `read_envmap` (envmap.h:19-53): bilinear lat-long sphere lookup. The
   direction is first remapped (z, -x, y) then converted to spherical unorm
   coords (theta/pi, phi/2pi + 0.5) — random_val.cuh:46-52 — with
   wrap-around in phi and clamping in theta.
 * the gradient splat (deposit_envmap_gradient, envmap.h:56-88) is simply
   the lookup's autodiff transpose here — `jax.grad` through `read_envmap`
   produces the identical bilinear scatter-add, deterministically.
 * TrainableBuffer + its own Ema(ExpDecay(Adam)) trainer (testbed.cu:83-90)
   becomes a plain (H, W, 4) param array + a second optax chain.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ngp_tpu.utils.config import EnvmapConfig, OptimizerConfig
from ngp_tpu.train.optimizer import create_optimizer_flat, ema_update


def dir_to_spherical_unorm(d):
    """(..., 3) -> (theta/pi, phi/2pi+0.5) in [0,1]^2 (random_val.cuh:46-52)."""
    cos_theta = jnp.clip(d[..., 2], -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    phi = jnp.arctan2(d[..., 1], d[..., 0])
    import numpy as np

    return jnp.stack([theta / np.pi, phi / (2 * np.pi) + 0.5], axis=-1)


def read_envmap(envmap, dirs):
    """envmap: (H, W, 4); dirs: (..., 3) unit -> (..., 4) bilinear sample.

    Differentiable in `envmap`; the autodiff transpose reproduces the
    reference's bilinear gradient splat.
    """
    h, w = envmap.shape[0], envmap.shape[1]
    d = jnp.stack([dirs[..., 2], -dirs[..., 0], dirs[..., 1]], axis=-1)
    cyl = dir_to_spherical_unorm(d)
    fx = cyl[..., 1] * (w - 1)
    fy = cyl[..., 0] * (h - 1)
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    wx = (fx - x0)[..., None]
    wy = (fy - y0)[..., None]

    def at(x, y):
        x = jnp.mod(x, w)  # phi wraps
        y = jnp.clip(y, 0, h - 1)  # theta clamps
        return envmap[y, x]

    return (
        (1 - wx) * (1 - wy) * at(x0, y0)
        + wx * (1 - wy) * at(x0 + 1, y0)
        + (1 - wx) * wy * at(x0, y0 + 1)
        + wx * wy * at(x0 + 1, y0 + 1)
    )


class EnvmapState(NamedTuple):
    params: jnp.ndarray  # (H, W, 4) fp32
    ema_params: jnp.ndarray
    opt_state: tuple
    # gradients accumulate across the inner steps of one train() call and the
    # optimizer steps ONCE per call with their mean — the reference zeroes the
    # gradient buffer per train_nerf call, deposits across all n_training_steps
    # steps, and calls optimizer_step(LOSS_SCALE * n_training_steps) once
    # (testbed.cu:235-238, 295-298)
    grad_accum: jnp.ndarray = None  # (H, W, 4) fp32
    n_accum: jnp.ndarray = None  # () int32 — inner steps accumulated


def create_envmap_state(cfg: EnvmapConfig) -> EnvmapState:
    params = jnp.zeros((cfg.height, cfg.width, 4), jnp.float32)
    tx = create_optimizer_flat(cfg.optimizer)
    # distinct buffer for the EMA copy: donation rejects aliased arguments
    return EnvmapState(
        params=params,
        ema_params=params.copy(),
        opt_state=tx.init(params),
        grad_accum=jnp.zeros_like(params),
        n_accum=jnp.zeros((), jnp.int32),
    )


def envmap_optimizer(cfg: EnvmapConfig):
    return create_optimizer_flat(cfg.optimizer)


def envmap_gradient(
    envmap_params,  # (H, W, 4)
    dirs,  # (R, 3) ray directions
    rgb_ray,  # (R, 3) composited prediction (incl. background term)
    trans_end,  # (R,) final transmittance
    exhausted,  # (R,) bool — ray marched all samples without early stop
    ray_valid,  # (R,) bool
    rgb_target,  # (R, 3)
    bg_composite,  # (R, 3) or (3,) — the background as composited (post color-space)
    *,
    envmap_loss_type: str,
    train_in_linear_color: bool,
    n_rays_denom: int,
):
    """Exact rebuild of the reference's envmap gradient deposit
    (ray_marcher.cu:190-212): only rays that marched to completion deposit;
    the gradient is `envmap_loss_type`'s d(loss)/d(rgb_ray) (recomputed when
    it differs from the training loss), scaled by the final transmittance
    and — when not training in linear color — divided by
    srgb_to_linear_derivative(background) (the exact inverse-function chain
    rule through linear_to_srgb). The alpha-channel gradient is zero
    (cu:209-210 comments it out), and the bilinear texel splat
    (deposit_envmap_gradient, envmap.h:56-88) is the autodiff transpose of
    `read_envmap`. Returns the per-step mean-per-ray gradient (H, W, 4)."""
    from ngp_tpu.ops.losses import loss_and_gradient
    from ngp_tpu.utils.color import srgb_to_linear_derivative

    _, g = loss_and_gradient(rgb_target, rgb_ray, envmap_loss_type)
    mask = (exhausted & ray_valid)[:, None]
    dbg = jnp.where(mask, trans_end[:, None] * g, 0.0)
    if not train_in_linear_color:
        dbg = dbg / srgb_to_linear_derivative(jnp.broadcast_to(bg_composite, dbg.shape))
    cot = jnp.concatenate([dbg, jnp.zeros_like(dbg[..., :1])], axis=-1)
    _, vjp = jax.vjp(lambda e: read_envmap(e, dirs), envmap_params)
    (g_env,) = vjp(cot)
    return g_env / n_rays_denom


def envmap_accumulate(envmap_state: EnvmapState, grad) -> EnvmapState:
    """Add one inner step's gradient to the per-call accumulator."""
    return envmap_state._replace(
        grad_accum=envmap_state.grad_accum + grad,
        n_accum=envmap_state.n_accum + 1,
    )


def envmap_apply(cfg: EnvmapConfig, envmap_state: EnvmapState) -> EnvmapState:
    """One optimizer step with the mean accumulated gradient, then reset the
    accumulator — the once-per-train()-call semantics of testbed.cu:295-298."""
    tx = create_optimizer_flat(cfg.optimizer)
    grad = envmap_state.grad_accum / jnp.maximum(envmap_state.n_accum, 1).astype(jnp.float32)
    updates, opt_state = tx.update(grad, envmap_state.opt_state, envmap_state.params)
    params = optax.apply_updates(envmap_state.params, updates)
    ema = ema_update(envmap_state.ema_params, params, cfg.optimizer.ema_decay)
    return EnvmapState(
        params=params,
        ema_params=ema,
        opt_state=opt_state,
        grad_accum=jnp.zeros_like(envmap_state.grad_accum),
        n_accum=jnp.zeros((), jnp.int32),
    )
