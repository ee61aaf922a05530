"""Converged-state step components with the mb2 in-jit-reps methodology.

Single-dispatch timings through the axon tunnel carry ~27-45 ms of
per-program noise; this loops REPS copies of each component inside ONE jit
(distinct rng per rep so nothing CSEs away) and divides.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

REPS = 4


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def main():
    from ngp_tpu.utils.compile_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    from ngp_tpu.sampling.lattice import n_lattice_points
    from ngp_tpu.sampling.training import generate_training_batch
    from ngp_tpu.testbed import Testbed

    cache = Path("/tmp/ngp_tpu_bench_scene_v1")
    tb = Testbed()
    tb.load_snapshot(str(cache / "warm_snapshot.msgpack"))
    tb.load_training_data(cache / "transforms_train.json")
    ds = tb._dataset
    state = tb._state
    scfg = tb.config.sampler
    aabb = tb._trainer.aabb
    model = tb._trainer.model
    n_lat = n_lattice_points(scfg)

    n_rays, n_window, s_pad, cap = 8192, 1152, 512, 1 << 18
    images, xforms, focal = ds.images, ds.xforms, jnp.asarray(ds.focal_length)
    occ, box = state.grid.occupancy, state.grid.occ_aabb
    keys = jax.random.split(jax.random.PRNGKey(7), REPS)

    def batch_of(rng):
        return generate_training_batch(
            scfg, aabb, images, xforms, focal, (0.5, 0.5), occ, rng,
            n_rays, jnp.uint32(0), cap, n_lat, s_pad,
            occ_aabb=box, n_window=n_window,
        )

    @jax.jit
    def batch_rep(keys, occ, box, images, xforms, focal):
        def body(acc, k):
            b = batch_of(k)
            return acc + b.pos.sum() + b.n_samples.astype(jnp.float32), None
        return jax.lax.scan(body, jnp.zeros(()), keys)[0]

    @jax.jit
    def fwd_rep(keys, params):
        def body(acc, k):
            pos = jax.random.uniform(k, (cap, 3))
            dirs = jax.random.uniform(k, (cap, 3))
            rgb_raw, sigma_raw = model.rgbsigma_raw(params, pos, dirs, remat_heads=False)
            return acc + rgb_raw.sum() + sigma_raw.sum(), None
        return jax.lax.scan(body, jnp.zeros(()), keys)[0]

    @jax.jit
    def fwdbwd_rep(keys, params):
        def body(acc, k):
            pos = jax.random.uniform(k, (cap, 3))
            dirs = jax.random.uniform(k, (cap, 3))
            g_rgb = jax.random.normal(k, (cap, 3))
            g_sig = jax.random.normal(k, (cap,))

            def f(p):
                rgb_raw, sigma_raw = model.rgbsigma_raw(p, pos, dirs, remat_heads=False)
                return (rgb_raw * g_rgb).sum() + (sigma_raw * g_sig).sum()

            g = jax.grad(f)(params)
            return acc + g["hash_table"].sum(), None
        return jax.lax.scan(body, jnp.zeros(()), keys)[0]

    from ngp_tpu.train.optimizer import create_optimizer, ema_update
    tx = create_optimizer(tb.config.optimizer)
    opt_state0 = tx.init(state.params)

    @jax.jit
    def opt_rep(keys, params, opt_state, ema):
        import optax

        def body(carry, k):
            params, opt_state, ema = carry
            grads = jax.tree_util.tree_map(
                lambda p: (jax.random.uniform(k, (1,)) * 0).reshape(()) + jnp.zeros_like(p), params
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            ema = ema_update(ema, params, tb.config.optimizer.ema_decay)
            return (params, opt_state, ema), None
        (params, _, _), _ = jax.lax.scan(body, (params, opt_state, ema), keys)
        return params["hash_table"].sum()

    def timeit(name, fn, fargs, reps_out=4, per=REPS):
        fn(*fargs); fn(*fargs)
        t0 = time.perf_counter()
        for _ in range(reps_out):
            fn(*fargs)
        dtms = (time.perf_counter() - t0) / reps_out
        print(f"{name:26s} {(dtms*1e3)/per:8.1f} ms/rep  ({dtms*1e3:.1f} ms/{per})", flush=True)

    timeit("batch_gen", lambda *a: sync(batch_rep(*a)), (keys, occ, box, images, xforms, focal))
    timeit("net fwd", lambda *a: sync(fwd_rep(*a)), (keys, state.params))
    timeit("net fwd+bwd", lambda *a: sync(fwdbwd_rep(*a)), (keys, state.params))
    timeit("optimizer+ema", lambda *a: sync(opt_rep(*a)), (keys, state.params, opt_state0, state.ema_params))


if __name__ == "__main__":
    main()
