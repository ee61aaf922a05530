"""flat <-> padded bijection: round trips and gather-only gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from ngp_tpu.ops.layout import build_layout, flat_layout, pad_layout


def _layout():
    # rays: valid(3), dropped-zero(0), valid(5), dropped-overflowish(4 marked invalid), valid(2)
    base = jnp.asarray([0, 3, 3, 8, 12], jnp.int32)
    counts = jnp.asarray([3, 0, 5, 4, 2], jnp.int32)
    ray_valid = jnp.asarray([True, False, True, False, True])
    return build_layout(base, counts, ray_valid, capacity=16, s_pad=8), base, counts, ray_valid


def test_build_layout_indices():
    layout, base, counts, ray_valid = _layout()
    fv = np.asarray(layout.flat_valid)
    rid = np.asarray(layout.ray_ids)
    pir = np.asarray(layout.pos_in_ray)
    # valid slots: [0,3) ray0, [3,8) ray2, [12,14) ray4; holes: [8,12) and [14,16)
    expect_valid = np.zeros(16, bool)
    expect_valid[0:3] = expect_valid[3:8] = expect_valid[12:14] = True
    np.testing.assert_array_equal(fv, expect_valid)
    np.testing.assert_array_equal(rid[0:3], 0)
    np.testing.assert_array_equal(rid[3:8], 2)
    np.testing.assert_array_equal(rid[12:14], 4)
    np.testing.assert_array_equal(pir[3:8], np.arange(5))
    # padded mask rows match effective counts (dropped rays -> all False)
    np.testing.assert_array_equal(np.asarray(layout.pad_valid).sum(1), [3, 0, 5, 0, 2])


def test_roundtrip_and_gradients_are_gathers():
    layout, *_ = _layout()
    rng = np.random.default_rng(0)
    flat = jnp.asarray(rng.normal(size=(16, 4)), jnp.float32)

    padded = pad_layout(layout, flat)
    back = flat_layout(layout, padded)
    fv = np.asarray(layout.flat_valid)[:, None]
    np.testing.assert_allclose(np.asarray(back), np.asarray(flat) * fv, atol=1e-6)

    # grad of sum(pad(flat) * cot) == flat-gather of cot on valid slots
    cot = jnp.asarray(rng.normal(size=padded.shape), jnp.float32)
    g = jax.grad(lambda f: jnp.sum(pad_layout(layout, f) * cot))(flat)
    expect = np.where(fv, np.asarray(flat_layout(layout, cot)), 0.0)
    np.testing.assert_allclose(np.asarray(g), expect, atol=1e-6)

    # grad through the padded->flat direction
    g2 = jax.grad(lambda p: jnp.sum(flat_layout(layout, p) * flat))(padded)
    expect2 = np.asarray(pad_layout(layout, flat))
    np.testing.assert_allclose(np.asarray(g2), expect2, atol=1e-6)

    # 1-D convenience wrappers
    v = jnp.arange(16, dtype=jnp.float32)
    pv = pad_layout(layout, v)
    assert pv.shape == layout.pad_valid.shape
    np.testing.assert_allclose(np.asarray(flat_layout(layout, pv)), np.asarray(v) * fv[:, 0], atol=1e-6)
