"""Lazy (zero-gradient-skipping) Adam for hash params.

tcnn's Adam kernel skips a parameter entirely when its gradient is exactly
zero (`optimize_params_when_gradient_is_zero` defaults to false), so hash
rows the batch never sampled stay frozen — no moment decay, no update. The
repo reproduces that for the hash_table leaf while keeping dense Adam (and
l2) on the MLP matrices. (tiny-cuda-nn is an empty submodule in the
reference checkout, so the semantics are implemented from tcnn's documented
adam.h behavior rather than cited lines.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ngp_tpu.train.optimizer import create_optimizer, scale_by_adam_lazy
from ngp_tpu.utils.config import OptimizerConfig, AdamConfig


def _params(key):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "hash_table": jax.random.normal(k1, (2, 8, 2), jnp.float32),
        "density_mlp": [jax.random.normal(k2, (4, 4))],
        "rgb_mlp": [jax.random.normal(k3, (4, 3))],
    }


def _grads(key, params, zero_rows):
    g = jax.tree_util.tree_map(
        lambda p: jax.random.normal(jax.random.fold_in(key, p.size), p.shape), params
    )
    ht = np.array(g["hash_table"])
    for lvl, row in zero_rows:
        ht[lvl, row, :] = 0.0
    g["hash_table"] = jnp.asarray(ht)
    return g


def test_lazy_adam_freezes_unvisited_hash_rows():
    cfg = OptimizerConfig(adam=AdamConfig())
    tx = create_optimizer(cfg, lazy_hash=True)
    params = _params(jax.random.PRNGKey(0))
    state = tx.init(params)
    zero_rows = [(0, 3), (1, 5)]

    # Step 1 with dense grads everywhere builds nonzero moments.
    g1 = _grads(jax.random.PRNGKey(1), params, [])
    u1, state = tx.update(g1, state, params)
    params = optax.apply_updates(params, u1)

    # Step 2 zeroes two hash rows: they must receive EXACTLY zero update
    # even though their Adam moments are nonzero (dense Adam would keep
    # pushing them with stale momentum).
    g2 = _grads(jax.random.PRNGKey(2), params, zero_rows)
    u2, state2 = tx.update(g2, state, params)
    for lvl, row in zero_rows:
        np.testing.assert_array_equal(np.asarray(u2["hash_table"])[lvl, row], 0.0)

    # ...and their moments must be untouched.
    mu_before = np.asarray(state[1].mu["hash_table"])
    mu_after = np.asarray(state2[1].mu["hash_table"])
    nu_before = np.asarray(state[1].nu["hash_table"])
    nu_after = np.asarray(state2[1].nu["hash_table"])
    for lvl, row in zero_rows:
        np.testing.assert_array_equal(mu_before[lvl, row], mu_after[lvl, row])
        np.testing.assert_array_equal(nu_before[lvl, row], nu_after[lvl, row])
    # Visited rows did move.
    assert not np.allclose(mu_before[0, 0], mu_after[0, 0])


def test_lazy_adam_matches_dense_adam_on_visited_params():
    """With no zero gradients anywhere, lazy == optax.scale_by_adam."""
    cfg = OptimizerConfig(adam=AdamConfig())
    tx_lazy = create_optimizer(cfg, lazy_hash=True)
    tx_dense = create_optimizer(cfg, lazy_hash=False)
    params = _params(jax.random.PRNGKey(3))
    s_lazy, s_dense = tx_lazy.init(params), tx_dense.init(params)
    for i in range(3):
        g = _grads(jax.random.PRNGKey(10 + i), params, [])
        u_lazy, s_lazy = tx_lazy.update(g, s_lazy, params)
        u_dense, s_dense = tx_dense.update(g, s_dense, params)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-6, atol=1e-8),
            u_lazy,
            u_dense,
        )


def test_lazy_adam_mlp_leaves_stay_dense():
    """A zero MLP gradient still decays moments and applies the stale-momentum
    update (dense Adam semantics) — only hash leaves get the skip."""
    adam = AdamConfig()
    tx = scale_by_adam_lazy(
        adam.beta1,
        adam.beta2,
        adam.epsilon,
        lambda t: {"hash_table": True, "density_mlp": [False]},
    )
    params = {
        "hash_table": jnp.ones((1, 4, 2)),
        "density_mlp": [jnp.ones((3, 3))],
    }
    state = tx.init(params)
    g_dense = {"hash_table": jnp.ones((1, 4, 2)), "density_mlp": [jnp.ones((3, 3))]}
    _, state = tx.update(g_dense, state, params)
    g_zero = jax.tree_util.tree_map(jnp.zeros_like, g_dense)
    u, state2 = tx.update(g_zero, state, params)
    # Hash rows frozen...
    np.testing.assert_array_equal(np.asarray(u["hash_table"]), 0.0)
    np.testing.assert_array_equal(
        np.asarray(state.mu["hash_table"]), np.asarray(state2.mu["hash_table"])
    )
    # ...but the MLP moment decayed and the update is the stale-momentum push.
    assert np.all(np.asarray(u["density_mlp"][0]) != 0.0)
    np.testing.assert_allclose(
        np.asarray(state2.mu["density_mlp"][0]),
        adam.beta1 * np.asarray(state.mu["density_mlp"][0]),
        rtol=1e-6,
    )


def test_lazy_adam_state_shape_matches_dense():
    """Snapshot compatibility: the chain state flattens to the same leaves."""
    cfg = OptimizerConfig(adam=AdamConfig())
    params = _params(jax.random.PRNGKey(4))
    s_lazy = create_optimizer(cfg, lazy_hash=True).init(params)
    s_dense = create_optimizer(cfg, lazy_hash=False).init(params)
    l_lazy = jax.tree_util.tree_leaves(s_lazy)
    l_dense = jax.tree_util.tree_leaves(s_dense)
    assert len(l_lazy) == len(l_dense)
    for a, b in zip(l_lazy, l_dense):
        assert a.shape == b.shape and a.dtype == b.dtype
