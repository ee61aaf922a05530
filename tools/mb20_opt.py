"""mb20: is the optax Adam+EMA chain leaving bandwidth on the table?

Standalone opt+ema measured ~13 ms real (profile_step) vs a ~2 ms HBM
bound (67 MB params x ~5 trees x a few passes at 819 GB/s). Compares:
  a) the production chain (create_optimizer + apply_updates + ema_update)
  b) a single hand-fused per-leaf update with identical math
  c) b) with buffer donation
Run: python tools/mb20_opt.py
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


def timeit(name, fn, reps=10):
    fn()
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    dtms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:34s} {dtms:8.2f} ms", flush=True)
    return dtms


def main():
    import optax

    from ngp_tpu.train.optimizer import create_optimizer, ema_update, lr_factor
    from ngp_tpu.train.trainer import Trainer
    from ngp_tpu.utils.config import NGPConfig

    cfg = NGPConfig.from_json({})
    tr = Trainer.create(cfg)
    st = tr.init_state(seed=0)
    tx = create_optimizer(cfg.optimizer)
    opt_state = tx.init(st.params)
    key = jax.random.PRNGKey(1)
    grads = jax.tree_util.tree_map(
        lambda p: jax.random.normal(key, p.shape, p.dtype) * 1e-3, st.params
    )

    @jax.jit
    def chain(params, opt_state, grads, ema):
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema = ema_update(ema, params, cfg.optimizer.ema_decay)
        return params, opt_state, ema

    adam = cfg.optimizer.adam
    b1, b2, eps, l2 = adam.beta1, adam.beta2, adam.epsilon, adam.l2_reg
    d = cfg.optimizer.ema_decay

    def fused_fn(params, opt_state, grads, ema):
        wd_state, adam_state, sched_state = opt_state
        count = adam_state.count + 1
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)
        lr = adam.learning_rate * lr_factor(sched_state.count, cfg.optimizer)

        def leaf(p, g, m, v, is_hash):
            g0 = g if is_hash else g + l2 * p
            nm = b1 * m + (1.0 - b1) * g0
            nv = b2 * v + (1.0 - b2) * g0 * g0
            if is_hash:
                vis = g0 != 0
                nm = jnp.where(vis, nm, m)
                nv = jnp.where(vis, nv, v)
            out = (nm / bc1) / (jnp.sqrt(nv / bc2) + eps)
            if is_hash:
                out = jnp.where(vis, out, 0.0)
            np_ = p - lr * out
            return np_, nm, nv

        new_p, new_m, new_v = {}, {}, {}
        for k in params:
            is_hash = k == "hash_table"
            if isinstance(params[k], list):
                outs = [
                    leaf(p, g, m, v, is_hash)
                    for p, g, m, v in zip(params[k], grads[k], adam_state.mu[k], adam_state.nu[k])
                ]
                new_p[k] = [o[0] for o in outs]
                new_m[k] = [o[1] for o in outs]
                new_v[k] = [o[2] for o in outs]
            else:
                o = leaf(params[k], grads[k], adam_state.mu[k], adam_state.nu[k], is_hash)
                new_p[k], new_m[k], new_v[k] = o
        new_ema = jax.tree_util.tree_map(lambda e, p: d * e + (1.0 - d) * p, ema, new_p)
        new_state = (
            wd_state,
            optax.ScaleByAdamState(count=count, mu=new_m, nu=new_v),
            optax.ScaleByScheduleState(count=sched_state.count + 1),
        )
        return new_p, new_state, new_ema

    fused = jax.jit(fused_fn)

    # numeric agreement (reduce ON DEVICE — pulling the trees through the
    # remote tunnel is ~minutes)
    @jax.jit
    def maxdiff(params, opt_state, grads, ema):
        pa, sa, ea = chain(params, opt_state, grads, ema)
        pb, sb, eb = fused_fn(params, opt_state, grads, ema)
        dp = [jnp.max(jnp.abs(a - b)) for a, b in zip(jax.tree_util.tree_leaves(pa), jax.tree_util.tree_leaves(pb))]
        de = [jnp.max(jnp.abs(a - b)) for a, b in zip(jax.tree_util.tree_leaves(ea), jax.tree_util.tree_leaves(eb))]
        return jnp.max(jnp.stack(dp + de))
    if "--check" in sys.argv:
        md = float(np.asarray(maxdiff(st.params, opt_state, grads, st.ema_params)))
        print(f"# fused vs chain max |diff| = {md:.3e}", flush=True)
        assert md < 1e-6, md

    timeit("optax chain", lambda: sync(chain(st.params, opt_state, grads, st.ema_params)[0]["hash_table"]))
    if "--fused" in sys.argv:
        timeit("fused", lambda: sync(fused(st.params, opt_state, grads, st.ema_params)[0]["hash_table"]))

    # ------------------------------------------------------- flat-layout arms
    # The table is (L, T, F) = (16, 524288, 2): minor dim 2 -> TPU lane
    # padding on every elementwise pass. Time the same chain with the table
    # (and its opt/ema/grad mirrors) stored flat (L, T*F).
    def flatten_tree(t):
        return jax.tree_util.tree_map(
            lambda x: x.reshape(x.shape[0], -1) if x.ndim == 3 and x.shape[-1] == 2 else x, t
        )

    L, T, F = st.params["hash_table"].shape
    params_f = flatten_tree(st.params)
    grads_f = flatten_tree(grads)
    ema_f = flatten_tree(st.ema_params)
    opt_state_f = tx.init(params_f)

    @jax.jit
    def chain_flat(params, opt_state, grads, ema):
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema = ema_update(ema, params, cfg.optimizer.ema_decay)
        return params, opt_state, ema

    timeit("optax chain FLAT", lambda: sync(chain_flat(params_f, opt_state_f, grads_f, ema_f)[0]["hash_table"]))

    # chain on flat storage but with reshape round-trips at the boundary
    # (grads arrive (L,T,F) from the bwd scan; fwd wants (L,T,F) back)
    @jax.jit
    def chain_flat_rt(params, opt_state, grads3, ema):
        grads = flatten_tree(grads3)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema = ema_update(ema, params, cfg.optimizer.ema_decay)
        p3 = params["hash_table"].reshape(L, T, F)
        return params, opt_state, ema, p3

    timeit("optax chain FLAT+roundtrip", lambda: sync(chain_flat_rt(params_f, opt_state_f, grads, ema_f)[3]))

    # pure relayout costs, isolated
    tbl3 = st.params["hash_table"]
    tblf = params_f["hash_table"]
    r3f = jax.jit(lambda x: x.reshape(L, T * F) * 1.000001)
    rf3 = jax.jit(lambda x: x.reshape(L, T, F) * 1.000001)
    timeit("reshape (L,T,F)->(L,T*F)+eps", lambda: sync(r3f(tbl3)))
    timeit("reshape (L,T*F)->(L,T,F)+eps", lambda: sync(rf3(tblf)))

    # oct-table pack from each storage layout (the fwd's real consumer)
    from ngp_tpu.ops.hash_encoding import _oct_tables
    spec = tr.model.grid_spec
    pack3 = jax.jit(lambda t: _oct_tables(t, spec))
    packf = jax.jit(lambda t: _oct_tables(t.reshape(L, T, F), spec))
    timeit("oct pack from (L,T,F)", lambda: sync(pack3(tbl3)))
    timeit("oct pack from (L,T*F)", lambda: sync(packf(tblf)))

    # ----------------------------------------------------- (L, F, T) storage
    # minor dim T -> elementwise-perfect; pack absorbs the transpose
    def to_lft(t):
        return jax.tree_util.tree_map(
            lambda x: x.transpose(0, 2, 1) if x.ndim == 3 and x.shape[-1] == 2 else x, t
        )

    params_t = jax.jit(to_lft)(st.params)
    grads_t = jax.jit(to_lft)(grads)
    ema_t = jax.jit(to_lft)(st.ema_params)
    opt_state_t = tx.init(params_t)

    @jax.jit
    def chain_lft(params, opt_state, grads, ema):
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema = ema_update(ema, params, cfg.optimizer.ema_decay)
        return params, opt_state, ema

    timeit("optax chain (L,F,T)", lambda: sync(chain_lft(params_t, opt_state_t, grads_t, ema_t)[0]["hash_table"]))
    packt = jax.jit(lambda t: _oct_tables(t.transpose(0, 2, 1), spec))
    timeit("oct pack from (L,F,T)", lambda: sync(packt(params_t["hash_table"])))
    # bwd-side cost: d_table produced (L,T,F) by the fold scan -> (L,F,T)
    tr3t = jax.jit(lambda x: x.transpose(0, 2, 1) * 1.000001)
    timeit("transpose (L,T,F)->(L,F,T)+eps", lambda: sync(tr3t(tbl3)))


if __name__ == "__main__":
    main()
