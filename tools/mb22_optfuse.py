"""Fused Adam+EMA update for the hash table: optax chain vs one-pass jnp vs
a Pallas kernel.

The optax lazy-Adam chain measures ~26 ms (sync-corrected) on the real chip
for what is ~800 MB of HBM traffic (~1 ms at bandwidth). This bench isolates
the (L, F, T) hash-table leaf (the traffic is all there) under donation and
compares three implementations for both speed and bitwise agreement.

Run: python tools/mb22_optfuse.py
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B1, B2, EPS, DECAY = 0.9, 0.99, 1e-15, 0.95
SHAPE = (16, 2, 524288)  # (L, F, T) default table
LANES = 1024
BLOCK_ROWS = 128


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timeit(name, fn, reps=16):
    fn()
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    dtms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:34s} {dtms:8.2f} ms", flush=True)
    return dtms


def optax_style(g, m, v, p, e, lr, bc1, bc2):
    visited = g != 0.0
    nm = jnp.where(visited, B1 * m + (1 - B1) * g, m)
    nv = jnp.where(visited, B2 * v + (1 - B2) * g * g, v)
    upd = jnp.where(visited, (nm / bc1) / (jnp.sqrt(nv / bc2) + EPS), 0.0)
    np_ = p - lr * upd
    ne = DECAY * e + (1 - DECAY) * np_
    return nm, nv, np_, ne


def _kernel(s_ref, g_ref, m_ref, v_ref, p_ref, e_ref, m_o, v_o, p_o, e_o):
    lr = s_ref[0, 0]
    bc1 = s_ref[0, 1]
    bc2 = s_ref[0, 2]
    g = g_ref[:]
    m = m_ref[:]
    v = v_ref[:]
    visited = g != 0.0
    nm = jnp.where(visited, B1 * m + (1 - B1) * g, m)
    nv = jnp.where(visited, B2 * v + (1 - B2) * g * g, v)
    upd = jnp.where(visited, (nm / bc1) / (jnp.sqrt(nv / bc2) + EPS), 0.0)
    pnew = p_ref[:] - lr * upd
    m_o[:] = nm
    v_o[:] = nv
    p_o[:] = pnew
    e_o[:] = DECAY * e_ref[:] + (1 - DECAY) * pnew


@functools.partial(jax.jit, donate_argnums=(1, 2, 3, 4))
def pallas_update(g, m, v, p, e, lr, bc1, bc2):
    n = int(np.prod(SHAPE))
    rows = n // LANES
    scal = jnp.stack([lr, bc1, bc2]).reshape(1, 3).astype(jnp.float32)
    r2 = lambda x: x.reshape(rows, LANES)
    blk = pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _kernel,
        grid=(rows // BLOCK_ROWS,),
        in_specs=[pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM)] + [blk] * 5,
        out_specs=[blk] * 4,
        out_shape=[jax.ShapeDtypeStruct((rows, LANES), jnp.float32)] * 4,
        input_output_aliases={2: 0, 3: 1, 4: 2, 5: 3},
    )(scal, r2(g), r2(m), r2(v), r2(p), r2(e))
    return tuple(o.reshape(SHAPE) for o in outs)


@functools.partial(jax.jit, donate_argnums=(1, 2, 3, 4))
def jnp_fused(g, m, v, p, e, lr, bc1, bc2):
    return optax_style(g, m, v, p, e, lr, bc1, bc2)


def main():
    import optax

    from ngp_tpu.train.optimizer import create_optimizer, ema_update
    from ngp_tpu.utils.config import NGPConfig

    config = NGPConfig.from_json({})
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    mk = lambda k: jax.random.normal(k, SHAPE, jnp.float32) * 0.01
    g0 = mk(ks[0])
    # ~96% of rows untouched per step at steady state: zero most of g
    mask = jax.random.uniform(ks[4], SHAPE) < 0.04
    g0 = jnp.where(mask, g0, 0.0)
    m0, v0, p0, e0 = mk(ks[1]) * 0.1, jnp.abs(mk(ks[2])) * 0.01, mk(ks[3]), mk(ks[3])

    lr = jnp.float32(1e-2)
    bc1 = jnp.float32(1.0 - B1**10)
    bc2 = jnp.float32(1.0 - B2**10)

    # correctness: pallas vs jnp reference
    ref = jax.jit(optax_style)(g0, m0, v0, p0, e0, lr, bc1, bc2)
    got = pallas_update(g0.copy(), m0.copy(), v0.copy(), p0.copy(), e0.copy(), lr, bc1, bc2)
    for r, gt, name in zip(ref, got, ("m", "v", "p", "ema"), strict=True):
        r, gt = np.asarray(r), np.asarray(gt)
        md = np.max(np.abs(r - gt))
        print(f"# pallas vs jnp {name}: max|diff|={md:.3e}")
        np.testing.assert_allclose(r, gt, rtol=1e-6, atol=1e-8, err_msg=name)

    # optax full-tree path (hash leaf only tree for apples-to-apples)
    tx = create_optimizer(config.optimizer)
    params = {"hash_table": p0.copy(), "density_mlp": [], "rgb_mlp": []}
    opt_state = tx.init(params)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 3))
    def optax_step(params, opt_state, grads, ema):
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema = ema_update(ema, params, DECAY)
        return params, opt_state, ema

    grads = {"hash_table": g0, "density_mlp": [], "rgb_mlp": []}
    ema_t = {"hash_table": e0.copy(), "density_mlp": [], "rgb_mlp": []}

    def run_optax():
        nonlocal params, opt_state, ema_t
        params, opt_state, ema_t = optax_step(params, opt_state, grads, ema_t)
        sync(params["hash_table"])

    timeit("optax chain (donated)", run_optax)

    st = [m0.copy(), v0.copy(), p0.copy(), e0.copy()]

    def run_jnp():
        st[0], st[1], st[2], st[3] = jnp_fused(g0, *st, lr, bc1, bc2)
        sync(st[2])

    timeit("jnp one-pass (donated)", run_jnp)

    st2 = [m0.copy(), v0.copy(), p0.copy(), e0.copy()]

    def run_pallas():
        st2[0], st2[1], st2[2], st2[3] = pallas_update(g0, *st2, lr, bc1, bc2)
        sync(st2[2])

    timeit("pallas fused (donated)", run_pallas)


if __name__ == "__main__":
    main()
