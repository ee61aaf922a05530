"""Decompose net fwd+bwd into hash-fwd / mlp / hash-bwd / pack costs.

Answers: where do the ~86 ms (sync-corrected) of net fwd+bwd go, vs the
~50 ms row floor (16L x 262k x 4.3 ns gather + 8L x 262k x 14.4 ns scatter)?
Run on the real chip: python tools/mb21_netdecomp.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timeit(name, fn, reps=8):
    fn()
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    dtms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:36s} {dtms:8.1f} ms", flush=True)
    return dtms


def main():
    cap = 1 << 18
    from ngp_tpu.models.ngp import NGPModel
    from ngp_tpu.ops.hash_encoding import (
        _oct_tables,
        as_level_major,
        hash_encode_const_pos,
        pack_inference_tables,
    )
    from ngp_tpu.utils.config import NGPConfig

    config = NGPConfig.from_json({})
    model = NGPModel.create(config.network)
    spec = model.grid_spec
    params = model.init(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(7)
    pos = jax.random.uniform(rng, (cap, 3))
    dirs = jax.random.uniform(rng, (cap, 3))
    g_feat = jax.random.normal(rng, (cap, spec.n_output_dims))
    g_rgb = jax.random.normal(rng, (cap, 3))
    g_sig = jax.random.normal(rng, (cap,))
    table = params["hash_table"]
    print(f"# cap={cap} L={spec.n_levels} F={spec.n_features} T_pad={spec.padded_size} variant={spec.variant} "
          f"stoch={spec.stochastic_bwd} rate={spec.stochastic_level_rate}")

    # 1. oct view build alone
    @jax.jit
    def pack_only(table):
        return _oct_tables(as_level_major(table, spec), spec)

    timeit("oct view build", lambda: sync(pack_only(table)))

    # 2. hash fwd alone (includes pack)
    @jax.jit
    def hash_fwd(table, pos):
        return hash_encode_const_pos(table, pos, spec).sum()

    timeit("hash fwd (incl pack)", lambda: sync(hash_fwd(table, pos)))

    # 3. hash fwd from a PREPACKED view (gather only)
    packed = jax.jit(lambda t: pack_inference_tables(t, spec))(table)
    from ngp_tpu.ops.hash_encoding import hash_encode_packed

    @jax.jit
    def hash_fwd_packed(packed, pos):
        return hash_encode_packed(packed, pos, spec).sum()

    timeit("hash fwd (prepacked gather)", lambda: sync(hash_fwd_packed(packed, pos)))

    # 4. hash fwd+bwd (d_table only)
    @jax.jit
    def hash_grad(table, pos, g):
        def f(t):
            return (hash_encode_const_pos(t, pos, spec) * g).sum()

        return jax.grad(f)(table)

    timeit("hash fwd+bwd (grad d_table)", lambda: sync(hash_grad(table, pos, g_feat)))

    # 5. MLPs alone: encode once, then grad wrt mlp params through both MLPs
    feats = jax.block_until_ready(jax.jit(lambda t, p: hash_encode_const_pos(t, p, spec))(table, pos))

    from ngp_tpu.ops.sh_encoding import sh_encode

    sh = jax.block_until_ready(jax.jit(lambda d: sh_encode(d, config.network.sh_degree))(dirs))

    from ngp_tpu.ops.mlp import mlp_apply

    @jax.jit
    def mlp_grad(params, feats, sh, g_rgb, g_sig):
        def f(p):
            h = mlp_apply(p["density_mlp"], feats)
            sigma_raw = h[:, 0]
            rgb_in = jnp.concatenate([h, sh], axis=-1)
            rgb_raw = mlp_apply(p["rgb_mlp"], rgb_in)[:, :3]
            return (rgb_raw * g_rgb).sum() + (sigma_raw * g_sig).sum()

        return jax.grad(f)(params)

    timeit("mlp fwd+bwd (feats given)", lambda: sync(mlp_grad(params, feats, sh, g_rgb, g_sig)["density_mlp"][0]))

    # 6. full net fwd+bwd (reference number)
    @jax.jit
    def net_grad(params, pos, dirs, g_rgb, g_sig):
        def f(p):
            rgb_raw, sigma_raw = model.rgbsigma_raw(p, pos, dirs)
            return (rgb_raw * g_rgb).sum() + (sigma_raw * g_sig).sum()

        return jax.grad(f)(params)

    timeit("net fwd+bwd (full)", lambda: sync(net_grad(params, pos, dirs, g_rgb, g_sig)["hash_table"]))

    # 7. sh encode alone
    timeit("sh encode", lambda: sync(jax.jit(lambda d: sh_encode(d, config.network.sh_degree).sum())(dirs)))

    # 8. raw gather floor at this cap: 16 levels x (cap,) rows from (T,16)
    oct_flat = jnp.reshape(packed, (spec.n_levels * spec.padded_size, 8 * spec.n_features))
    idx = jax.random.randint(rng, (spec.n_levels, cap), 0, spec.padded_size)
    off = jnp.arange(spec.n_levels, dtype=jnp.int32)[:, None] * spec.padded_size

    @jax.jit
    def raw_gather(oct_flat, idx):
        def body(_, i):
            return None, oct_flat[i].sum()

        _, s = jax.lax.scan(body, None, idx + off)
        return s.sum()

    timeit("raw oct gather floor (16L scan)", lambda: sync(raw_gather(oct_flat, idx)))

    # 9. raw scatter floor: 8 levels x (cap,) rows of width F bf16
    gval = jnp.asarray(jax.random.normal(rng, (8, cap, spec.n_features)), jnp.bfloat16)
    idx8 = jax.random.randint(rng, (8, cap), 0, spec.padded_size)

    @jax.jit
    def raw_scatter(gval, idx8):
        def body(_, xs):
            g, i = xs
            return None, jnp.zeros((spec.padded_size, spec.n_features), jnp.bfloat16).at[i].add(g)

        _, outs = jax.lax.scan(body, None, (gval, idx8))
        return outs.sum()

    timeit("raw bwd scatter floor (8L scan)", lambda: sync(raw_scatter(gval, idx8)))


if __name__ == "__main__":
    main()
