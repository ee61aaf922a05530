"""Envmap lookup/gradient + render-buffer accumulate/tonemap tests."""

import jax
import jax.numpy as jnp
import numpy as np

from ngp_tpu.render.buffer import accumulate, tonemap, tonemap_curve
from ngp_tpu.render.envmap import create_envmap_state, dir_to_spherical_unorm, read_envmap
from ngp_tpu.utils.color import linear_to_srgb, srgb_to_linear
from ngp_tpu.utils.config import EnvmapConfig


def test_dir_to_spherical_unorm():
    out = np.asarray(dir_to_spherical_unorm(jnp.asarray([[0.0, 0.0, 1.0]])))  # +z pole
    np.testing.assert_allclose(out[0, 0], 0.0, atol=1e-6)
    out = np.asarray(dir_to_spherical_unorm(jnp.asarray([[1.0, 0.0, 0.0]])))  # equator, phi=0
    np.testing.assert_allclose(out[0], [0.5, 0.5], atol=1e-6)


def test_read_envmap_constant_and_grad():
    env = jnp.full((8, 16, 4), 0.25)
    dirs = jnp.asarray(np.random.default_rng(0).normal(size=(32, 3)), jnp.float32)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    out = read_envmap(env, dirs)
    np.testing.assert_allclose(np.asarray(out), 0.25, atol=1e-6)

    # gradient = bilinear splat: weights per ray sum to 1 per channel
    def f(e):
        return jnp.sum(read_envmap(e, dirs))

    g = np.asarray(jax.grad(f)(env))
    np.testing.assert_allclose(g.sum(), 32 * 4, rtol=1e-5)
    assert (g >= 0).all()


def test_envmap_state():
    st = create_envmap_state(EnvmapConfig(height=16, width=32))
    assert st.params.shape == (16, 32, 4)


def test_accumulate_running_average():
    a = jnp.zeros((4, 4, 4))
    frames = [jnp.full((4, 4, 4), v) for v in (1.0, 2.0, 3.0)]
    for i, f in enumerate(frames):
        a = accumulate(a, f, i, "Linear")
    np.testing.assert_allclose(np.asarray(a), 2.0, rtol=1e-6)
    # SRGB accumulation averages srgb-converted rgb but linear alpha
    a = jnp.zeros((1, 1, 4))
    a = accumulate(a, jnp.asarray([[[0.5, 0.5, 0.5, 0.8]]]), 0, "SRGB")
    np.testing.assert_allclose(np.asarray(a)[0, 0, 0], float(linear_to_srgb(0.5)), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(a)[0, 0, 3], 0.8, rtol=1e-6)


def test_tonemap_curves():
    x = jnp.asarray(np.linspace(0, 4, 64, dtype=np.float32).reshape(-1, 1).repeat(3, 1))
    for curve in ("Identity", "ACES", "Hable", "Reinhard"):
        y = np.asarray(tonemap_curve(x, curve))
        assert np.isfinite(y).all(), curve
        if curve != "Identity":
            assert (y[-1] <= 1.5).all(), curve  # tonemappers compress highlights
    np.testing.assert_allclose(np.asarray(tonemap_curve(x, "Identity")), np.asarray(x))


def test_tonemap_background_composite_and_srgb():
    accum = jnp.zeros((2, 2, 4))  # fully transparent
    out = np.asarray(tonemap(accum, 0.0, [0.5, 0.5, 0.5, 1.0], "Linear", "Linear", "Identity"))
    # bg is srgb-specified -> linearized before compositing
    np.testing.assert_allclose(out[..., :3], float(srgb_to_linear(0.5)), rtol=1e-5)
    np.testing.assert_allclose(out[..., 3], 1.0)
    # to_srgb output path converts back
    out2 = np.asarray(tonemap(accum, 0.0, [0.5, 0.5, 0.5, 1.0], "Linear", "SRGB", "Identity"))
    np.testing.assert_allclose(out2[..., :3], 0.5, atol=2e-3)
    # exposure doubles linear rgb
    accum = jnp.concatenate([jnp.full((2, 2, 3), 0.25), jnp.ones((2, 2, 1))], axis=-1)
    out3 = np.asarray(tonemap(accum, 1.0, [0, 0, 0, 1], "Linear", "Linear", "Identity"))
    np.testing.assert_allclose(out3[..., :3], 0.5, rtol=1e-6)


def test_accumulate_visposneg_folds_signed_value():
    """render_buffer.cu:65-76: channels 0/1 accumulate the signed value
    frame0 - frame1 as positive/negative parts; channel 2 passes through."""
    import jax.numpy as jnp
    import numpy as np

    from ngp_tpu.render.buffer import accumulate

    accum = jnp.zeros((1, 1, 4))
    f1 = jnp.asarray([[[0.75, 0.25, 0.9, 1.0]]])  # signed value +0.5
    a1 = accumulate(accum, f1, 0, "VisPosNeg")
    np.testing.assert_allclose(np.asarray(a1)[0, 0], [0.5, 0.0, 0.0, 1.0], atol=1e-6)
    f2 = jnp.asarray([[[0.0, 1.5, 0.0, 1.0]]])  # signed value -1.5
    a2 = accumulate(a1, f2, 1, "VisPosNeg")
    # running signed mean: (0.5 - 1.5)/2 = -0.5 -> neg channel
    np.testing.assert_allclose(np.asarray(a2)[0, 0], [0.0, 0.5, 0.0, 1.0], atol=1e-6)
