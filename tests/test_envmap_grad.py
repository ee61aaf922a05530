"""Envmap gradient parity vs an independent numpy port of the reference's
deposit path (ray_marcher.cu:190-212 + envmap.h:56-88), plus the
once-per-train()-call stepping semantics (testbed.cu:235-238, 295-298)."""

import jax
import jax.numpy as jnp
import numpy as np

from ngp_tpu.render.envmap import (
    create_envmap_state,
    envmap_accumulate,
    envmap_apply,
    envmap_gradient,
    read_envmap,
)
from ngp_tpu.utils.config import EnvmapConfig


# ---------------------------------------------------------------- numpy port
def _np_relative_l2_grad(target, prediction):
    d = prediction - target
    return 2.0 * d / (prediction * prediction + 1e-2)


def _np_srgb_to_linear_derivative(srgb):
    # common_device.h:79-81
    return np.where(
        srgb <= 0.04045,
        1.0 / 12.92,
        2.4 / 1.055 * np.power((srgb + 0.055) / 1.055, 1.4),
    )


def _np_deposit(grad_buf, value4, dir, h, w):
    # envmap.h:56-88 — remap (z, -x, y), spherical unorm, bilinear splat with
    # phi wrap and theta clamp
    d = np.array([dir[2], -dir[0], dir[1]])
    cos_theta = np.clip(d[2], -1.0, 1.0)
    theta = np.arccos(cos_theta)
    phi = np.arctan2(d[1], d[0])
    cyl = np.array([theta / np.pi, phi / (2 * np.pi) + 0.5])
    fx, fy = cyl[1] * (w - 1), cyl[0] * (h - 1)
    x0, y0 = int(fx), int(fy)
    wx, wy = fx - x0, fy - y0

    def dep(weight, x, y):
        x = x % w
        y = min(max(y, 0), h - 1)
        grad_buf[y, x] += value4 * weight

    dep((1 - wx) * (1 - wy), x0, y0)
    dep(wx * (1 - wy), x0 + 1, y0)
    dep((1 - wx) * wy, x0, y0 + 1)
    dep(wx * wy, x0 + 1, y0 + 1)


def _np_envmap_gradient(dirs, rgb_ray, trans_end, exhausted, valid, target, bg_srgb, h, w, n_rays):
    # ray_marcher.cu:190-212: envmap loss RelativeL2 (differs from a SmoothL1
    # main loss); loss_scale folds away (deposited loss_scale/n_rays, trainer
    # divides by LOSS_SCALE)
    grad = np.zeros((h, w, 4), np.float64)
    for i in range(dirs.shape[0]):
        if not (exhausted[i] and valid[i]):
            continue
        g = _np_relative_l2_grad(target[i], rgb_ray[i])
        dbg = trans_end[i] * g / _np_srgb_to_linear_derivative(bg_srgb[i])
        _np_deposit(grad, np.concatenate([dbg, [0.0]]), dirs[i], h, w)
    return grad / n_rays


def test_envmap_gradient_matches_reference_port():
    h, w, n = 8, 16, 64
    rng = np.random.default_rng(7)
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    rgb_ray = rng.uniform(0.0, 1.0, (n, 3)).astype(np.float32)
    target = rng.uniform(0.0, 1.0, (n, 3)).astype(np.float32)
    trans_end = rng.uniform(0.0, 1.0, (n,)).astype(np.float32)
    exhausted = rng.uniform(size=n) > 0.3
    valid = rng.uniform(size=n) > 0.1
    bg_srgb = rng.uniform(0.01, 1.0, (n, 3)).astype(np.float32)
    env = jnp.asarray(rng.normal(size=(h, w, 4)), jnp.float32)

    got = envmap_gradient(
        env,
        jnp.asarray(dirs, jnp.float32),
        jnp.asarray(rgb_ray),
        jnp.asarray(trans_end),
        jnp.asarray(exhausted),
        jnp.asarray(valid),
        jnp.asarray(target),
        jnp.asarray(bg_srgb),
        envmap_loss_type="RelativeL2",  # main loss SmoothL1 — the differing-loss branch
        train_in_linear_color=False,
        n_rays_denom=n,
    )
    want = _np_envmap_gradient(
        dirs, rgb_ray, trans_end, exhausted, valid, target, bg_srgb, h, w, n
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=1e-6)


def test_envmap_gradient_linear_color_skips_srgb_correction():
    h, w, n = 4, 8, 8
    rng = np.random.default_rng(3)
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    args = dict(
        dirs=jnp.asarray(dirs, jnp.float32),
        rgb_ray=jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32),
        trans_end=jnp.ones((n,), jnp.float32),
        exhausted=jnp.ones((n,), bool),
        ray_valid=jnp.ones((n,), bool),
        rgb_target=jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32),
        bg_composite=jnp.full((n, 3), 0.5, jnp.float32),
    )
    env = jnp.zeros((h, w, 4), jnp.float32)
    g_lin = envmap_gradient(
        env, *args.values(), envmap_loss_type="L2", train_in_linear_color=True, n_rays_denom=n
    )
    g_srgb = envmap_gradient(
        env, *args.values(), envmap_loss_type="L2", train_in_linear_color=False, n_rays_denom=n
    )
    deriv = float(2.4 / 1.055 * ((0.5 + 0.055) / 1.055) ** 1.4)
    np.testing.assert_allclose(
        np.asarray(g_srgb)[..., :3] * deriv, np.asarray(g_lin)[..., :3], rtol=1e-5
    )
    # alpha channel receives no gradient (cu:209-210)
    assert np.all(np.asarray(g_srgb)[..., 3] == 0)


def test_envmap_accumulate_apply_steps_once():
    cfg = EnvmapConfig(train=True, height=4, width=8)
    st = create_envmap_state(cfg)
    g = jnp.ones((4, 8, 4), jnp.float32) * 0.5
    for _ in range(4):
        st = envmap_accumulate(st, g)
    assert int(st.n_accum) == 4
    np.testing.assert_allclose(np.asarray(st.grad_accum), 2.0)
    st2 = envmap_apply(cfg, st)
    # params moved once (Adam step on grad mean 0.5), accumulator reset
    assert not np.allclose(np.asarray(st2.params), 0.0)
    assert int(st2.n_accum) == 0
    np.testing.assert_allclose(np.asarray(st2.grad_accum), 0.0)


def test_trainer_envmap_steps_once_per_call(tmp_path):
    """e2e: envmap loss (RelativeL2) differs from the main loss (SmoothL1);
    the envmap updates once per train() call and actually learns."""
    from ngp_tpu.data.synthetic import write_synthetic_dataset
    from ngp_tpu.testbed import Testbed

    cfg = {
        "samlper": {"aabb_scale": 1, "grid_size": 16, "maximum_marching_steps": 128},
        "loss": "SmoothL1",
        "network": {
            "encoding": {"n_levels": 4, "log2_hashmap_size": 12, "base_resolution": 8, "desired_resolution": 64},
            "network": {"n_neurons": 64, "n_hidden_layers": 1},
            "dir_encoding": {"degree": 4},
            "rgb_network": {"n_neurons": 64, "n_hidden_layers": 2},
        },
        "render": {"train_with_random_bg_color": False},
        "envmap": {"train": True, "height": 8, "width": 16, "loss": "RelativeL2"},
    }
    train_json, _ = write_synthetic_dataset(tmp_path, n_train=2, n_test=1, width=24, height=24)
    tb = Testbed()
    tb.load_model_config_dict(cfg)
    tb._trainer.sample_capacity = 1 << 12
    tb.load_training_data(train_json)
    tb.train(16, 1 << 11)
    env1 = np.asarray(tb._state.envmap.params)
    assert np.abs(env1).max() > 0, "envmap received no gradient"
    # accumulator drained by the per-call apply
    assert int(tb._state.envmap.n_accum) == 0
