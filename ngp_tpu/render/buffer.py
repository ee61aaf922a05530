"""Render buffer post-processing: spp accumulation + tonemap, pure jnp.

Rebuild of reference internal/utils/render_buffer.{h,cu} (CudaRenderBuffer):
 * accumulate_kernel (render_buffer.cu:51-86): running average over spp in
   linear or sRGB space (VisPosNeg folds the +/- channels)
 * tonemap_kernel (cu:147-180): exposure scale -> composite the (sRGB-
   specified) background behind the accumulated alpha -> tonemap curve
   (Identity / ACES / Hable / Reinhard, cu:88-145) -> output color space.

The CUDA surface object disappears: the "surface" is just the returned
(H, W, 4) array.
"""

import functools

import jax
import jax.numpy as jnp

from ngp_tpu.utils.color import linear_to_srgb, srgb_to_linear

TONEMAP_CURVES = ("Identity", "ACES", "Hable", "Reinhard")
COLOR_SPACES = ("Linear", "SRGB", "VisPosNeg")


@functools.partial(jax.jit, static_argnames=("color_space",))
def accumulate(accum, frame, spp, color_space: str = "Linear"):
    """Running average: accum_{n+1} = (accum*n + frame)/(n+1). spp = frames so far."""
    color_space = color_space.lower()
    rgb, a = frame[..., :3], frame[..., 3:4]
    if color_space == "visposneg":
        val = frame[..., 0:1] - frame[..., 1:2]
        tmp_val = accum[..., 0:1] - accum[..., 1:2]
        tmp_val = (tmp_val * spp + val) / (spp + 1)
        out_rgb = jnp.concatenate([jnp.maximum(tmp_val, 0.0), jnp.maximum(-tmp_val, 0.0), accum[..., 2:3]], axis=-1)
    else:
        if color_space == "srgb":
            rgb = linear_to_srgb(rgb)
        out_rgb = (accum[..., :3] * spp + rgb) / (spp + 1)
    out_a = (accum[..., 3:4] * spp + a) / (spp + 1)
    return jnp.concatenate([out_rgb, out_a], axis=-1)


def tonemap_curve(x, curve: str = "Identity"):
    curve = curve.lower()
    if curve == "identity":
        return x
    x = jnp.maximum(x, 0.0)
    if curve == "reinhard":
        y = x[..., 0] * 0.2126 + x[..., 1] * 0.7152 + x[..., 2] * 0.0722
        return x / (y[..., None] + 1.0)
    if curve == "aces":
        k0, k1, k2 = 0.36 * 2.51, 0.6 * 0.03, 0.0
        k3, k4, k5 = 0.36 * 2.43, 0.6 * 0.59, 0.14
    elif curve == "hable":
        a, b, c, d, e, f = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30
        k0, k1, k2 = a * f - a * e, c * b * f - b * e, 0.0
        k3, k4, k5 = a * f, b * f, d * f * f
        w = 11.2
        white_scale = (k3 * w * w + k4 * w + k5) / (k0 * w * w + k1 * w + k2)
        k0, k1, k2 = 4 * k0 * white_scale, 2 * k1 * white_scale, k2 * white_scale
        k3, k4 = 4 * k3, 2 * k4
    else:
        raise ValueError(f"Unknown tonemap curve {curve}")
    sq = x * x
    return (k0 * sq + k1 * x + k2) / (k3 * sq + k4 * x + k5)


@functools.partial(jax.jit, static_argnames=("exposure", "color_space", "output_color_space", "curve"))
def tonemap(accum, exposure: float, background_color, color_space: str, output_color_space: str, curve: str = "Identity"):
    """accum (H,W,4) -> final (H,W,4). background_color is 4-vec in sRGB."""
    bg = jnp.asarray(background_color, jnp.float32)
    rgb = accum[..., :3] * (2.0**exposure)
    a = accum[..., 3:4]

    bg_rgb = bg[:3]
    if color_space.lower() != "srgb":
        bg_rgb = srgb_to_linear(bg_rgb)
    weight = (1.0 - a) * bg[3]
    rgb = rgb + bg_rgb * weight
    a = a + weight

    if color_space.lower() == "srgb":
        rgb = srgb_to_linear(rgb)
    rgb = tonemap_curve(rgb, curve)
    if output_color_space.lower() == "srgb":
        rgb = linear_to_srgb(rgb)
    return jnp.concatenate([rgb, a], axis=-1)
