"""Stochastic-corner hash backward (opt-in): unbiasedness vs the exact deposit.

The one-corner estimator must satisfy E[d_table] == exact d_table, where the
expectation is over the per-(sample, level) corner draw. With many samples
contributing to each table row, the row sums concentrate; we check relative
agreement on rows carrying non-trivial mass.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ngp_tpu.ops.hash_encoding import (
    HashGridSpec,
    _bwd_oadd,
    _bwd_oadd_stochastic,
    hash_encode_const_pos,
    hash_table_init,
)
from ngp_tpu.utils.config import HashEncodingConfig


def _small_spec(**kw):
    cfg = HashEncodingConfig(
        n_levels=3, n_features_per_level=2, log2_hashmap_size=10,
        base_resolution=4, desired_resolution=32.0, hash_variant="oadd", **kw
    )
    return HashGridSpec.create(cfg)


def test_stochastic_bwd_unbiased():
    spec = _small_spec(stochastic_corner_backward=True)
    n = 200_000
    key = jax.random.PRNGKey(3)
    pos = jax.random.uniform(key, (n, 3))
    table = hash_table_init(jax.random.PRNGKey(4), spec)
    g = jnp.ones((n, spec.n_output_dims), jnp.float32)

    # fp32 accumulators isolate the estimator's bias from bf16 accumulation
    # rounding (the production path accepts bf16, like tcnn's __half atomics)
    exact, _ = _bwd_oadd(table, pos, spec, g, need_pos_grad=False, acc_dtype=jnp.float32)
    stoch = _bwd_oadd_stochastic(table, pos, spec, g, acc_dtype=jnp.float32)

    e = np.asarray(exact, np.float64)
    s = np.asarray(stoch, np.float64)
    # per-level totals are exactly preserved in expectation AND per draw:
    # each sample deposits g into exactly one corner
    np.testing.assert_allclose(
        s.sum(axis=(1, 2)), e.sum(axis=(1, 2)), rtol=2e-3
    )
    # heavy rows (many contributions) concentrate to the exact value
    for lvl in range(spec.n_levels):
        mass = np.abs(e[lvl]).sum(axis=-1)
        heavy = mass > np.percentile(mass, 99)
        if not heavy.any():
            continue
        rel = np.abs(s[lvl][heavy] - e[lvl][heavy]) / np.maximum(np.abs(e[lvl][heavy]), 1e-9)
        assert np.median(rel) < 0.15, f"level {lvl}: median rel err {np.median(rel)}"


def test_stochastic_level_rate_unbiased():
    """Level subsampling (deposit into every k-th level, scaled by k) keeps
    E[d_table] == exact d_table: the sample subset feeding a level is an
    i.i.d.-uniform position subset, so per-level totals match exactly for
    g == 1 and heavy rows concentrate to the exact deposit."""
    spec = dataclasses.replace(
        _small_spec(stochastic_corner_backward=True), stochastic_level_rate=4
    )
    n = 400_000
    pos = jax.random.uniform(jax.random.PRNGKey(7), (n, 3))
    table = hash_table_init(jax.random.PRNGKey(8), spec)
    g = jnp.ones((n, spec.n_output_dims), jnp.float32)

    exact, _ = _bwd_oadd(table, pos, spec, g, need_pos_grad=False, acc_dtype=jnp.float32)
    stoch = _bwd_oadd_stochastic(table, pos, spec, g, acc_dtype=jnp.float32)

    e = np.asarray(exact, np.float64)
    s = np.asarray(stoch, np.float64)
    # each selected sample deposits k * g into one corner; exactly n/k
    # samples are selected per level -> totals preserved exactly
    np.testing.assert_allclose(s.sum(axis=(1, 2)), e.sum(axis=(1, 2)), rtol=2e-3)
    for lvl in range(spec.n_levels):
        mass = np.abs(e[lvl]).sum(axis=-1)
        heavy = mass > np.percentile(mass, 99)
        if not heavy.any():
            continue
        rel = np.abs(s[lvl][heavy] - e[lvl][heavy]) / np.maximum(np.abs(e[lvl][heavy]), 1e-9)
        assert np.median(rel) < 0.3, f"level {lvl}: median rel err {np.median(rel)}"


def test_stochastic_level_rate_routes_and_falls_back():
    """rate > 1 changes the vjp deposit; a sample count not divisible by the
    rate falls back to every-level deposits (kr=1) rather than mis-slicing."""
    spec1 = _small_spec(stochastic_corner_backward=True)
    spec4 = dataclasses.replace(spec1, stochastic_level_rate=4)
    table = hash_table_init(jax.random.PRNGKey(1), spec1)

    pos = jax.random.uniform(jax.random.PRNGKey(0), (4096, 3))
    g1 = jax.grad(lambda t: hash_encode_const_pos(t, pos, spec1).sum())(table)
    g4 = jax.grad(lambda t: hash_encode_const_pos(t, pos, spec4).sum())(table)
    assert not np.allclose(np.asarray(g1), np.asarray(g4))
    np.testing.assert_allclose(np.asarray(g1).sum(), np.asarray(g4).sum(), rtol=1e-2)

    pos_odd = jax.random.uniform(jax.random.PRNGKey(0), (4095, 3))
    g_odd = jax.grad(lambda t: hash_encode_const_pos(t, pos_odd, spec4).sum())(table)
    g_ref = jax.grad(lambda t: hash_encode_const_pos(t, pos_odd, spec1).sum())(table)
    np.testing.assert_allclose(np.asarray(g_odd), np.asarray(g_ref))


def test_stochastic_flag_routes_custom_vjp():
    """The const-pos vjp uses the stochastic deposit iff the spec opts in."""
    spec_on = _small_spec(stochastic_corner_backward=True)
    spec_off = dataclasses.replace(spec_on, stochastic_bwd=False)
    n = 4096
    pos = jax.random.uniform(jax.random.PRNGKey(0), (n, 3))
    table = hash_table_init(jax.random.PRNGKey(1), spec_on)

    def loss(spec):
        return lambda t: hash_encode_const_pos(t, pos, spec).sum()

    g_on = jax.grad(loss(spec_on))(table)
    g_off = jax.grad(loss(spec_off))(table)
    assert not np.allclose(np.asarray(g_on), np.asarray(g_off))
    # totals agree (deposit conservation; 1% slack for the exact path's bf16
    # accumulation rounding — the stochastic path's unit deposits are exact)
    np.testing.assert_allclose(
        np.asarray(g_on).sum(), np.asarray(g_off).sum(), rtol=1e-2
    )
