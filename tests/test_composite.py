"""Validate jax.grad of the composite loss against the reference's
hand-derived chain rule (ray_marcher.cu:156-188), implemented independently
in numpy here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ngp_tpu.models.ngp import apply_density_activation, apply_rgb_activation
from ngp_tpu.ops import losses
from ngp_tpu.ops.layout import build_layout
from ngp_tpu.render.composite import composite_rays, train_loss


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def reference_gradients(rgb_raw, sigma_raw, dt, target, bg, loss_type, n_rays):
    """Single-ray reference gradient per ray_marcher.cu:66-188 (numpy).

    Assumes no early stop (all samples included), Logistic rgb activation,
    Exponential density activation, no regularizers.
    """
    k = len(sigma_raw)
    rgb = _sigmoid(rgb_raw)
    sigma = np.exp(sigma_raw)

    # forward composite
    T = 1.0
    rgb_ray = np.zeros(3)
    weights = np.zeros(k)
    for j in range(k):
        alpha = 1.0 - np.exp(-sigma[j] * dt[j])
        weights[j] = alpha * T
        rgb_ray += weights[j] * rgb[j]
        T *= 1.0 - alpha
    rgb_ray = rgb_ray + T * bg  # exhausted ray -> background term

    _, lg_grad = losses.loss_and_gradient(jnp.asarray(target), jnp.asarray(rgb_ray), loss_type)
    lg_grad = np.asarray(lg_grad)

    # backward pass (cu:156-188): scale = 1/n_rays (loss_scale folds away),
    # and the reference's mean over rgb channels divides by 3
    scale = 1.0 / n_rays / 3.0
    d_rgb_raw = np.zeros((k, 3))
    d_sigma_raw = np.zeros(k)
    rgb_ray2 = np.zeros(3)
    T = 1.0
    for j in range(k):
        alpha = 1.0 - np.exp(-sigma[j] * dt[j])
        w = alpha * T
        rgb_ray2 = rgb_ray2 + w * rgb[j]
        T *= 1.0 - alpha
        d_rgb_raw[j] = scale * (w * lg_grad) * (rgb[j] * (1.0 - rgb[j]))  # logistic deriv
        suffix = rgb_ray - rgb_ray2  # includes the background term
        density_deriv = np.exp(sigma_raw[j])  # exponential deriv
        d_sigma_raw[j] = scale * density_deriv * dt[j] * np.dot(lg_grad, T * rgb[j] - suffix)
    return rgb_ray, d_rgb_raw, d_sigma_raw


@pytest.mark.parametrize("loss_type", ["L2", "SmoothL1", "L1"])
def test_train_loss_grad_matches_reference_chain_rule(loss_type):
    rng = np.random.default_rng(5)
    k = 6
    n_rays = 4  # 1 real ray + padding rays with zero samples
    rgb_raw = rng.normal(0, 1, (k, 3)).astype(np.float32)
    sigma_raw = rng.normal(0, 1, (k,)).astype(np.float32)
    dt = np.full((k,), 0.02, np.float32)
    target = rng.uniform(0, 1, (3,)).astype(np.float32)
    bg = rng.uniform(0, 1, (3,)).astype(np.float32)

    C = 8  # capacity with padding
    pad = C - k
    rgb_raw_f = jnp.asarray(np.concatenate([rgb_raw, np.zeros((pad, 3), np.float32)]))
    sigma_raw_f = jnp.asarray(np.concatenate([sigma_raw, np.zeros((pad,), np.float32)]))
    base = jnp.asarray([0, k, k, k], jnp.int32)
    counts = jnp.asarray([k, 0, 0, 0], jnp.int32)
    ray_valid = jnp.asarray([True, False, False, False])
    layout = build_layout(base, counts, ray_valid, C, s_pad=8)
    targets = jnp.asarray(np.stack([target] + [np.zeros(3)] * 3), jnp.float32)

    def loss_fn(rgb_r, sig_r):
        loss, _ = train_loss(
            rgb_r,
            sig_r,
            layout,
            float(dt[0]),
            ray_valid,
            targets,
            jnp.asarray(bg),
            n_rays_denom=n_rays,
            loss_type=loss_type,
            transmittance_threshold=1e-4,
            rgb_activation="Logistic",
            density_activation="Exponential",
            mean_density=jnp.float32(1.0),  # disables the L1 density reg
            min_optical_thickness=0.01,
            apply_rgb_activation=apply_rgb_activation,
            apply_density_activation=apply_density_activation,
        )
        return loss

    g_rgb, g_sigma = jax.grad(loss_fn, argnums=(0, 1))(rgb_raw_f, sigma_raw_f)

    rgb_ray_ref, d_rgb_ref, d_sigma_ref = reference_gradients(
        rgb_raw, sigma_raw, dt, target, bg, loss_type, n_rays
    )
    np.testing.assert_allclose(np.asarray(g_rgb)[:k], d_rgb_ref, rtol=2e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g_sigma)[:k], d_sigma_ref, rtol=2e-4, atol=1e-7)


def test_composite_forward_matches_sequential():
    """composite_rays (padded layout) == a plain sequential loop."""
    rng = np.random.default_rng(7)
    R, S = 3, 32
    counts = np.array([10, 0, 22], np.int32)
    sigma = rng.uniform(0, 60, (R, S)).astype(np.float32)
    rgb = rng.uniform(0, 1, (R, S, 3)).astype(np.float32)
    dt = 0.05
    valid = np.arange(S)[None, :] < counts[:, None]
    bg = np.array([0.2, 0.3, 0.4], np.float32)
    thresh = 1e-2  # high threshold to exercise early stop

    res = composite_rays(
        jnp.asarray(rgb), jnp.asarray(sigma), dt, jnp.asarray(valid),
        jnp.asarray(counts), jnp.asarray(bg), thresh,
    )

    for r in range(R):
        T = 1.0
        out = np.zeros(3)
        included = 0
        for j in range(counts[r]):
            if T < thresh:
                break
            alpha = 1.0 - np.exp(-sigma[r, j] * dt)
            out += alpha * T * rgb[r, j]
            T *= 1.0 - alpha
            included += 1
        if included == counts[r]:
            out = out + T * bg
        np.testing.assert_allclose(np.asarray(res.rgb_ray)[r], out, rtol=1e-5, atol=1e-6)
        assert int(res.n_included[r]) == included
        assert bool(res.exhausted[r]) == (included == counts[r])
