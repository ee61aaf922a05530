"""Tests for losses / SH / hash encoding / MLP ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ngp_tpu.ops import losses
from ngp_tpu.ops.hash_encoding import HashGridSpec, hash_encode, hash_table_init
from ngp_tpu.ops.mlp import mlp_apply, mlp_init
from ngp_tpu.ops.sh_encoding import sh_encode
from ngp_tpu.utils.config import HashEncodingConfig


# --------------------------------------------------------------------- losses
@pytest.mark.parametrize("name", ["L2", "L1", "SmoothL1", "LogL1"])
def test_loss_gradients_match_autodiff(name):
    rng = np.random.default_rng(3)
    target = jnp.asarray(rng.uniform(0, 1, (64,)), jnp.float32)
    pred = jnp.asarray(rng.uniform(-0.2, 1.2, (64,)), jnp.float32)
    val, grad = losses.loss_and_gradient(target, pred, name)
    auto = jax.grad(lambda p: losses.loss_value(target, p, name).sum())(pred)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(auto), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("name", ["RelativeL2", "Smape", "Mape"])
def test_ratio_loss_gradients_treat_factor_constant(name):
    """The reference's RelativeL2/SMAPE/MAPE gradients intentionally ignore the
    prediction-dependence of the normalization factor (loss.cu:31-103); verify
    our closed form does the same: grad == d(raw loss)/dp * factor."""
    rng = np.random.default_rng(4)
    target = jnp.asarray(rng.uniform(0, 1, (64,)), jnp.float32)
    pred = jnp.asarray(rng.uniform(-0.2, 1.2, (64,)), jnp.float32)
    _, grad = losses.loss_and_gradient(target, pred, name)
    d = pred - target
    if name == "RelativeL2":
        factor = 1.0 / (pred**2 + 1e-2)
        expect = 2.0 * d * factor
    elif name == "Smape":
        factor = 1.0 / (0.5 * (jnp.abs(pred) + jnp.abs(target)) + 1e-2)
        expect = jnp.where(d >= 0, factor, -factor)
    else:
        factor = 1.0 / (jnp.abs(pred) + 1e-2)
        expect = jnp.where(d >= 0, factor, -factor)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(expect), rtol=1e-5)


def test_loss_values_analytic():
    t = jnp.array([0.5])
    p = jnp.array([0.75])
    np.testing.assert_allclose(losses.l2(t, p)[0], [0.0625])
    np.testing.assert_allclose(losses.l1(t, p)[0], [0.25])
    # SmoothL1 alpha=0.1: |d|=0.25 > alpha -> |d| - alpha/2 = 0.2
    np.testing.assert_allclose(losses.smooth_l1(t, p)[0], [0.2], rtol=1e-6)
    np.testing.assert_allclose(losses.smooth_l1(t, jnp.array([0.55]))[0], [0.5 / 0.1 * 0.0025], rtol=1e-5)
    with pytest.raises(ValueError):
        losses.loss_and_gradient(t, p, "NotALoss")


# ------------------------------------------------------------------------ SH
def test_sh_constant_and_linear_bands():
    d = jnp.array([[0.5, 0.5, 1.0]])  # unwarps to (0,0,1)
    out = np.asarray(sh_encode(d, 4))[0]
    assert out.shape == (16,)
    np.testing.assert_allclose(out[0], 0.28209479, rtol=1e-6)
    # direction (0,0,1): band 1 = [-0.4886*y, 0.4886*z, -0.4886*x] = [0, 0.4886, 0]
    np.testing.assert_allclose(out[1:4], [0.0, 0.48860252, 0.0], atol=1e-6)
    # z=1: band-2 m=0 term 0.9462*z^2-0.3154
    np.testing.assert_allclose(out[6], 0.94617469 - 0.31539157, rtol=1e-5)


def test_sh_degrees():
    d = jnp.array([[0.2, 0.9, 0.4]])
    for deg in (1, 2, 3, 4):
        assert sh_encode(d, deg).shape == (1, deg**2)


# ---------------------------------------------------------------- hash grid
def _tiny_spec(n_levels=4, log2_T=8, base=4, variant="xadd"):
    return HashGridSpec.create(HashEncodingConfig(n_levels=n_levels, n_features_per_level=2, log2_hashmap_size=log2_T, base_resolution=base, desired_resolution=64.0, hash_variant=variant))


def test_hash_spec_layout():
    spec = _tiny_spec()
    assert spec.n_levels == 4 and spec.n_output_dims == 8
    # low levels dense, high levels hashed
    assert spec.dense[0] and not spec.dense[-1]
    assert spec.sizes[-1] == 256
    assert spec.offsets == tuple(np.cumsum([0] + list(spec.sizes[:-1])))


def test_hash_encode_interpolates_dense_level():
    """On a dense level, encoding at a grid vertex returns that vertex's features."""
    cfg = HashEncodingConfig(n_levels=1, n_features_per_level=2, log2_hashmap_size=12, base_resolution=5, per_level_scale=1.0)
    spec = HashGridSpec.create(cfg)
    res, scale = spec.resolutions[0], spec.scales[0]  # res=5, scale=4
    table = jnp.asarray(np.random.default_rng(0).normal(size=(1, spec.padded_size, 2)), jnp.float32)

    # scaled = pos*scale + 0.5, so grid vertex v sits at pos = (v - 0.5)/scale
    pos = jnp.array([[0.5 / scale, 1.5 / scale, 2.5 / scale]])
    out = np.asarray(hash_encode(table, pos, spec))[0]
    vertex_idx = 1 + 2 * res + 3 * res * res
    # forward gathers a bf16 view of the table -> bf16-level tolerance
    np.testing.assert_allclose(out, np.asarray(table)[0, vertex_idx], rtol=1e-2, atol=1e-3)

    # x midway between vertices 1 and 2, y/z exactly on vertices 1/1
    pos = jnp.array([[1.0 / scale, 0.5 / scale, 0.5 / scale]])
    out = np.asarray(hash_encode(table, pos, spec))[0]
    i1 = 1 + 1 * res + 1 * res * res
    i2 = 2 + 1 * res + 1 * res * res
    expect = 0.5 * (np.asarray(table)[0, i1] + np.asarray(table)[0, i2])
    np.testing.assert_allclose(out, expect, rtol=1e-2, atol=1e-3)


@pytest.mark.parametrize("variant", ["oadd", "xadd", "tcnn"])
def test_hash_encode_grad_is_scatter_add(variant):
    spec = _tiny_spec(variant=variant)
    table = hash_table_init(jax.random.PRNGKey(0), spec)
    pos = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (32, 3)), jnp.float32)

    def f(tbl):
        return jnp.sum(hash_encode(tbl, pos, spec) ** 2)

    g = jax.grad(f)(table)
    assert g.shape == table.shape
    assert float(jnp.sum(jnp.abs(g))) > 0
    # numerical check on one touched entry of the last level
    lvl = spec.n_levels - 1
    touched = int(jnp.argmax(jnp.abs(g[lvl]).sum(-1)))
    eps = 1e-3
    tp = table.at[lvl, touched, 0].add(eps)
    tm = table.at[lvl, touched, 0].add(-eps)
    fd = (f(tp) - f(tm)) / (2 * eps)
    np.testing.assert_allclose(float(g[lvl, touched, 0]), float(fd), rtol=2e-2, atol=1e-5)


@pytest.mark.parametrize("variant", ["oadd", "xadd", "tcnn"])
def test_hash_encode_pos_gradient(variant):
    """custom_vjp's analytic d/dpos vs finite differences."""
    spec = _tiny_spec(variant=variant)
    rng = np.random.default_rng(3)
    table = jnp.asarray(rng.normal(size=(spec.n_levels, spec.padded_size, 2)), jnp.float32)
    pos = jnp.asarray([[0.31, 0.62, 0.47]], jnp.float32)

    def f(p):
        return jnp.sum(hash_encode(table, p, spec) * jnp.arange(spec.n_output_dims))

    g = np.asarray(jax.grad(f)(pos))[0]
    eps = 1e-4
    for d in range(3):
        pp = pos.at[0, d].add(eps)
        pm = pos.at[0, d].add(-eps)
        fd = (float(f(pp)) - float(f(pm))) / (2 * eps)
        np.testing.assert_allclose(g[d], fd, rtol=5e-2, atol=1e-2)


@pytest.mark.parametrize("variant", ["oadd", "xadd", "tcnn"])
def test_hash_encode_continuity_across_cell(variant):
    """Encoding is continuous at cell boundaries (trilerp correctness)."""
    spec = _tiny_spec(variant=variant)
    rng = np.random.default_rng(2)
    table = jnp.asarray(rng.normal(size=(spec.n_levels, spec.padded_size, 2)), jnp.float32)
    p = 0.37
    eps = 1e-6
    a = hash_encode(table, jnp.array([[p - eps, 0.4, 0.6]]), spec)
    b = hash_encode(table, jnp.array([[p + eps, 0.4, 0.6]]), spec)
    # bounded by (max slope = |features| * finest scale) * 2eps
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def _xadd_8corner_reference(table, pos, spec):
    """Straightforward per-corner gather with the x-additive hash — the
    semantic ground truth the pair-packed fast path must reproduce."""
    P1, P2 = np.uint32(2654435761), np.uint32(805459861)
    N = pos.shape[0]
    out = np.zeros((N, spec.n_output_dims), np.float32)
    tbl = np.asarray(table)
    corners = [(cx, cy, cz) for cz in (0, 1) for cy in (0, 1) for cx in (0, 1)]
    for l in range(spec.n_levels):
        scale, res, size = spec.scales[l], spec.resolutions[l], spec.sizes[l]
        scaled = np.asarray(pos) * scale + 0.5
        base = np.floor(scaled).astype(np.int64)
        frac = scaled - base
        acc = np.zeros((N, spec.n_features), np.float32)
        for cx, cy, cz in corners:
            c = base + np.array([cx, cy, cz])
            w = np.prod(np.where(np.array([cx, cy, cz]) == 1, frac, 1 - frac), axis=-1)
            if spec.dense[l]:
                cc = np.clip(c, 0, res - 1)
                idx = cc[:, 0] + cc[:, 1] * res + cc[:, 2] * res * res
            else:
                u = c.astype(np.uint32)
                idx = (u[:, 0] + ((u[:, 1] * P1) ^ (u[:, 2] * P2))) % np.uint32(size)
            acc += w[:, None] * tbl[l, idx]
        out[:, l * spec.n_features : (l + 1) * spec.n_features] = acc
    return out


def test_xadd_pair_matches_8corner_reference():
    """Pair-packed fast path == plain 8-corner x-additive trilerp, including
    the dense x-boundary clamp and the hash mod-T pair wraparound."""
    spec = _tiny_spec()
    rng = np.random.default_rng(7)
    table = jnp.asarray(rng.normal(size=(spec.n_levels, spec.padded_size, 2)), jnp.float32)
    pos = rng.uniform(0, 1, (512, 3)).astype(np.float32)
    pos[:8] = [[0.999, 0.5, 0.5], [0.9999, 0.9999, 0.9999], [0.0, 0.0, 0.0],
               [1.0, 1.0, 1.0], [0.0001, 0.5, 0.9999], [0.999, 0.001, 0.5],
               [0.5, 0.5, 0.5], [0.25, 0.75, 0.999]]
    out = np.asarray(hash_encode(table, jnp.asarray(pos), spec))
    ref = _xadd_8corner_reference(table, pos, spec)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_xadd_custom_bwd_matches_autodiff():
    """The pair-scatter + roll-fold backward == XLA autodiff of the forward."""
    from ngp_tpu.ops.hash_encoding import _encode_xadd

    spec = _tiny_spec()
    rng = np.random.default_rng(8)
    table = jnp.asarray(rng.normal(size=(spec.n_levels, spec.padded_size, 2)), jnp.float32)
    pos = jnp.asarray(rng.uniform(0, 1, (256, 3)), jnp.float32)
    cot = jnp.asarray(rng.normal(size=(256, spec.n_output_dims)), jnp.float32)

    def f_custom(tbl, p):
        return jnp.sum(hash_encode(tbl, p, spec) * cot)

    def f_auto(tbl, p):
        return jnp.sum(_encode_xadd(tbl, p, spec) * cot)

    gt_c, gp_c = jax.grad(f_custom, argnums=(0, 1))(table, pos)
    gt_a, gp_a = jax.grad(f_auto, argnums=(0, 1))(table, pos)
    # table grads accumulate in bf16 in the custom path -> bf16 tolerance
    np.testing.assert_allclose(np.asarray(gt_c), np.asarray(gt_a), rtol=0.02, atol=0.02)
    np.testing.assert_allclose(np.asarray(gp_c), np.asarray(gp_a), rtol=1e-3, atol=1e-3)


def _oadd_8corner_reference(table, pos, spec):
    """Per-corner gather with the fully-additive linear hash — the semantic
    ground truth the oct-packed fast path must reproduce."""
    from ngp_tpu.ops.hash_encoding import _oct_offsets

    N = pos.shape[0]
    out = np.zeros((N, spec.n_output_dims), np.float32)
    tbl = np.asarray(table)
    corners = [(cx, cy, cz) for cz in (0, 1) for cy in (0, 1) for cx in (0, 1)]
    for l in range(spec.n_levels):
        scale, res, size = spec.scales[l], spec.resolutions[l], spec.sizes[l]
        sy, sz, _ = _oct_offsets(spec, l)
        scaled = np.asarray(pos) * scale + 0.5
        base = np.floor(scaled).astype(np.int64)
        frac = scaled - base
        acc = np.zeros((N, spec.n_features), np.float32)
        for cx, cy, cz in corners:
            c = base + np.array([cx, cy, cz])
            w = np.prod(np.where(np.array([cx, cy, cz]) == 1, frac, 1 - frac), axis=-1)
            if spec.dense[l]:
                cc = np.clip(c, 0, res - 1)
                idx = cc[:, 0] + cc[:, 1] * sy + cc[:, 2] * sz
            else:
                idx = (c[:, 0] + c[:, 1] * sy + c[:, 2] * sz) % size
            acc += w[:, None] * tbl[l, idx]
        out[:, l * spec.n_features : (l + 1) * spec.n_features] = acc
    return out


def test_oadd_oct_matches_8corner_reference():
    """Oct-packed fast path == plain 8-corner additive trilerp, including the
    dense per-dim boundary clamps and the hash mod-T oct wraparound."""
    spec = _tiny_spec(variant="oadd")
    rng = np.random.default_rng(7)
    table = jnp.asarray(rng.normal(size=(spec.n_levels, spec.padded_size, 2)), jnp.float32)
    pos = rng.uniform(0, 1, (512, 3)).astype(np.float32)
    pos[:8] = [[0.999, 0.5, 0.5], [0.9999, 0.9999, 0.9999], [0.0, 0.0, 0.0],
               [1.0, 1.0, 1.0], [0.0001, 0.5, 0.9999], [0.999, 0.001, 0.5],
               [0.5, 0.5, 0.5], [0.25, 0.75, 0.999]]
    out = np.asarray(hash_encode(table, jnp.asarray(pos), spec))
    ref = _oadd_8corner_reference(table, pos, spec)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_oadd_custom_bwd_matches_autodiff():
    """The oct-scatter + roll-fold backward == XLA autodiff of the forward."""
    from ngp_tpu.ops.hash_encoding import _encode_oadd

    spec = _tiny_spec(variant="oadd")
    rng = np.random.default_rng(8)
    table = jnp.asarray(rng.normal(size=(spec.n_levels, spec.padded_size, 2)), jnp.float32)
    pos = jnp.asarray(rng.uniform(0, 1, (256, 3)), jnp.float32)
    cot = jnp.asarray(rng.normal(size=(256, spec.n_output_dims)), jnp.float32)

    def f_custom(tbl, p):
        return jnp.sum(hash_encode(tbl, p, spec) * cot)

    def f_auto(tbl, p):
        return jnp.sum(_encode_oadd(tbl, p, spec) * cot)

    gt_c, gp_c = jax.grad(f_custom, argnums=(0, 1))(table, pos)
    gt_a, gp_a = jax.grad(f_auto, argnums=(0, 1))(table, pos)
    np.testing.assert_allclose(np.asarray(gt_c), np.asarray(gt_a), rtol=0.02, atol=0.02)
    np.testing.assert_allclose(np.asarray(gp_c), np.asarray(gp_a), rtol=1e-3, atol=1e-3)


def test_oadd_dense_levels_match_tcnn_variant():
    """Dense-level addressing is hash-free, so oadd == tcnn there exactly."""
    cfg_kw = dict(n_levels=2, n_features_per_level=2, log2_hashmap_size=12, base_resolution=4, desired_resolution=8.0)
    s_o = HashGridSpec.create(HashEncodingConfig(hash_variant="oadd", **cfg_kw))
    s_t = HashGridSpec.create(HashEncodingConfig(hash_variant="tcnn", **cfg_kw))
    assert all(s_o.dense) and all(s_t.dense)
    rng = np.random.default_rng(11)
    table = jnp.asarray(rng.normal(size=(2, s_o.padded_size, 2)), jnp.float32)
    pos = jnp.asarray(rng.uniform(0, 1, (128, 3)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(hash_encode(table, pos, s_o)), np.asarray(hash_encode(table, pos, s_t)), rtol=1e-5, atol=1e-5
    )


# ----------------------------------------------------------------------- MLP
def test_mlp_shapes_and_structure():
    w = mlp_init(jax.random.PRNGKey(0), n_input=32, n_neurons=64, n_output=16, n_hidden_layers=1)
    assert [x.shape for x in w] == [(32, 64), (64, 16)]
    w2 = mlp_init(jax.random.PRNGKey(0), n_input=32, n_neurons=64, n_output=3, n_hidden_layers=2)
    assert [x.shape for x in w2] == [(32, 64), (64, 64), (64, 3)]

    x = jnp.ones((8, 32))
    y = mlp_apply(w, x)
    assert y.shape == (8, 16) and y.dtype == jnp.float32


def test_mlp_bf16_close_to_fp32():
    w = mlp_init(jax.random.PRNGKey(1), 32, 64, 16, 2)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(64, 32)), jnp.float32)
    y16 = mlp_apply(w, x, compute_dtype=jnp.bfloat16)
    y32 = mlp_apply(w, x, compute_dtype=jnp.float32)
    err = np.abs(np.asarray(y16 - y32)).max() / (np.abs(np.asarray(y32)).max() + 1e-9)
    assert err < 0.05
