"""Color-space transforms (sRGB <-> linear), elementwise, jit/grad friendly.

Behavioral parity with reference internal/utils/common_device.h:71-101
(srgb_to_linear / linear_to_srgb and their derivatives). All functions are
pure jnp and differentiable; the closed-form *_derivative variants exist for
tests that validate against the reference's hand-derived chain rule.
"""

import jax.numpy as jnp

_SRGB_KNEE = 0.04045
_LIN_KNEE = 0.0031308
# The reference uses the truncated exponent 0.41666 (common_device.h:88),
# not 1/2.4; we match it exactly so PSNR-parity comparisons line up.
_INV_GAMMA = 0.41666


def srgb_to_linear(x):
    x = jnp.asarray(x)
    return jnp.where(x <= _SRGB_KNEE, x / 12.92, jnp.power((jnp.maximum(x, _SRGB_KNEE) + 0.055) / 1.055, 2.4))


def srgb_to_linear_derivative(x):
    x = jnp.asarray(x)
    return jnp.where(
        x <= _SRGB_KNEE,
        1.0 / 12.92,
        2.4 / 1.055 * jnp.power((jnp.maximum(x, _SRGB_KNEE) + 0.055) / 1.055, 1.4),
    )


def linear_to_srgb(x):
    x = jnp.asarray(x)
    return jnp.where(x < _LIN_KNEE, 12.92 * x, 1.055 * jnp.power(jnp.maximum(x, _LIN_KNEE), _INV_GAMMA) - 0.055)


def linear_to_srgb_derivative(x):
    x = jnp.asarray(x)
    return jnp.where(
        x < _LIN_KNEE,
        12.92,
        1.055 * _INV_GAMMA * jnp.power(jnp.maximum(x, _LIN_KNEE), _INV_GAMMA - 1.0),
    )
