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


def create_envmap_state(cfg: EnvmapConfig) -> EnvmapState:
    params = jnp.zeros((cfg.height, cfg.width, 4), jnp.float32)
    tx = create_optimizer_flat(cfg.optimizer)
    # distinct buffer for the EMA copy: donation rejects aliased arguments
    return EnvmapState(params=params, ema_params=params.copy(), opt_state=tx.init(params))


def envmap_optimizer(cfg: EnvmapConfig):
    return create_optimizer_flat(cfg.optimizer)
