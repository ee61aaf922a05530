"""Fused Pallas MLP heads (ops/fused_mlp.py) vs the XLA mlp_apply path.

Values and gradients must agree to bf16-matmul tolerance; the fused kernel
is the default training/inference head path for supported configs, so any
numeric drift here is a training-quality bug.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ngp_tpu.ops.fused_mlp import fused_rgbsigma, supports
from ngp_tpu.ops.mlp import mlp_apply, mlp_init


def ref_heads(dmlp, rmlp, enc, sh):
    dens = mlp_apply(dmlp, enc)
    rgb = mlp_apply(rmlp, jnp.concatenate([dens, sh], axis=-1))
    return rgb, dens


@pytest.mark.parametrize(
    "n,d_hidden,r_hidden,width",
    [(512, 1, 2, 64), (2048 + 257, 1, 2, 64), (1024, 2, 1, 64), (640, 1, 2, 128)],
)
def test_fused_matches_reference(n, d_hidden, r_hidden, width):
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    dmlp = mlp_init(k1, 32, width, 16, d_hidden)
    rmlp = mlp_init(k2, 32, width, 3, r_hidden)
    enc = jax.random.normal(k3, (n, 32), jnp.float32)
    sh = jax.random.normal(k4, (n, 16), jnp.float32)
    g_rgb = jax.random.normal(k5, (n, 3))
    g_sig = jax.random.normal(k6, (n,))

    rgb_ref, dens_ref = jax.jit(ref_heads)(dmlp, rmlp, enc, sh)
    rgb_f, dens_f = jax.jit(fused_rgbsigma)(dmlp, rmlp, enc, sh)
    np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(rgb_ref), rtol=2e-2, atol=3e-2)
    np.testing.assert_allclose(np.asarray(dens_f), np.asarray(dens_ref), rtol=2e-2, atol=3e-2)

    def loss_ref(dmlp, rmlp, enc):
        rgb, dens = ref_heads(dmlp, rmlp, enc, sh)
        return (rgb * g_rgb).sum() + (dens[:, 0] * g_sig).sum()

    def loss_fused(dmlp, rmlp, enc):
        rgb, dens = fused_rgbsigma(dmlp, rmlp, enc, sh)
        return (rgb * g_rgb).sum() + (dens[:, 0] * g_sig).sum()

    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(dmlp, rmlp, enc)
    gf = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2)))(dmlp, rmlp, enc)
    for a, b, name in [
        *[(x, y, f"dW{i}") for i, (x, y) in enumerate(zip(gr[0], gf[0], strict=True))],
        *[(x, y, f"dV{i}") for i, (x, y) in enumerate(zip(gr[1], gf[1], strict=True))],
        (gr[2], gf[2], "d_enc"),
    ]:
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(b, a, rtol=3e-2, atol=3e-2 * scale, err_msg=name)


def test_supports_gate():
    from ngp_tpu.utils.config import NGPConfig

    cfg = NGPConfig.from_json({})
    assert supports(cfg.network.density_mlp, cfg.network.rgb_mlp)

    cfg2 = NGPConfig.from_json({"network": {"network": {"activation": "Tanh"}}})
    assert not supports(cfg2.network.density_mlp, cfg2.network.rgb_mlp)


def test_model_uses_fused_and_matches_xla(monkeypatch):
    """model.rgbsigma_raw with/without NGP_FUSED_MLP=1 agrees."""
    from ngp_tpu.models.ngp import NGPModel
    from ngp_tpu.utils.config import NGPConfig

    cfg = NGPConfig.from_json(
        {
            "network": {
                "encoding": {"n_levels": 4, "log2_hashmap_size": 12, "base_resolution": 8, "desired_resolution": 64},
                "network": {"n_neurons": 64, "n_hidden_layers": 1},
                "dir_encoding": {"degree": 4},
                "rgb_network": {"n_neurons": 64, "n_hidden_layers": 2},
            }
        }
    )
    model = NGPModel.create(cfg.network)
    params = model.init(jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(2)
    pos = jax.random.uniform(key, (513, 3))
    dirs = jax.random.normal(key, (513, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    monkeypatch.setenv("NGP_FUSED_MLP", "1")
    rgb_f, sig_f = jax.jit(lambda p: model.rgbsigma_raw(p, pos, dirs))(params)
    monkeypatch.delenv("NGP_FUSED_MLP")
    rgb_x, sig_x = jax.jit(lambda p: model.rgbsigma_raw(p, pos, dirs))(params)
    np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(rgb_x), rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(sig_f), np.asarray(sig_x), rtol=2e-2, atol=2e-2)
