"""Per-ray RGB losses, each returning (value, d/d_prediction) elementwise.

Behavioral parity with reference internal/utils/loss.cu:23-123: L2,
RelativeL2, L1, SmoothL1(alpha=0.1), LogL1, SMAPE, MAPE. Values and gradients
are closed-form (matching the reference's hand-derived pairs) so the training
path can be validated against `jax.grad` of the value in tests.

All functions take (target, prediction) broadcastable arrays and operate
elementwise (the reference applies them per RGB channel).
"""

import jax.numpy as jnp

LOSS_TYPES = ("L2", "RelativeL2", "L1", "Mape", "Smape", "SmoothL1", "LogL1")


def l2(target, prediction):
    d = prediction - target
    return d * d, 2.0 * d


def relative_l2(target, prediction):
    d = prediction - target
    factor = 1.0 / (prediction * prediction + 1e-2)
    return d * d * factor, 2.0 * d * factor


def l1(target, prediction):
    d = prediction - target
    return jnp.abs(d), _copysign_pos(jnp.ones_like(d), d)


def smooth_l1(target, prediction, alpha=0.1):
    # NeRF path uses alpha=0.1 (loss.cu:117: smooth_l1_loss(..., 0.1f))
    d = prediction - target
    ad = jnp.abs(d)
    quad = 0.5 / alpha * d * d
    val = jnp.where(ad > alpha, ad - 0.5 * alpha, quad)
    grad = jnp.where(ad > alpha, jnp.where(d > 0, 1.0, -1.0), d / alpha)
    return val, grad


def log_l1(target, prediction):
    d = prediction - target
    divisor = jnp.abs(d) + 1.0
    return jnp.log(divisor), _copysign_pos(1.0 / divisor, d)


def smape(target, prediction):
    d = prediction - target
    factor = 1.0 / (0.5 * (jnp.abs(prediction) + jnp.abs(target)) + 1e-2)
    return jnp.abs(d) * factor, _copysign_pos(factor, d)


def mape(target, prediction):
    d = prediction - target
    factor = 1.0 / (jnp.abs(prediction) + 1e-2)
    return jnp.abs(d) * factor, _copysign_pos(factor, d)


def _copysign_pos(mag, sign_src):
    # copysignf semantics with sign(+0) = +1
    return jnp.where(sign_src >= 0, mag, -mag)


_LOSSES = {
    "l2": l2,
    "relativel2": relative_l2,
    "l1": l1,
    "mape": mape,
    "smape": smape,
    "smoothl1": smooth_l1,
    "logl1": log_l1,
}


def loss_and_gradient(target, prediction, loss_type: str):
    """String-dispatched (value, gradient); parser parity loss.cu:105-123.

    Unknown names fall back to L2 like the reference's `default:` arm — but we
    raise instead, since a typo'd loss silently training with L2 is a footgun.
    """
    key = loss_type.lower()
    if key not in _LOSSES:
        raise ValueError(f"Unknown loss type: {loss_type!r} (expected one of {LOSS_TYPES})")
    return _LOSSES[key](target, prediction)


def loss_value(target, prediction, loss_type: str):
    return loss_and_gradient(target, prediction, loss_type)[0]
