"""Component breakdown of the train step at the CONVERGED-grid steady state.

Loads the bench warm snapshot (bench.py leaves it at
/tmp/ngp_tpu_bench_scene_v1/warm_snapshot.msgpack, mirrored under
.evidence/) so the controller shapes and occupancy sparsity match the
regime the headline samples/s is measured in — tools/profile_step.py
profiles the early noisy-grid regime instead.

Run: python tools/profile_converged.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])  # force readback


def main():
    from ngp_tpu.utils.compile_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    from ngp_tpu.data.synthetic import write_synthetic_dataset
    from ngp_tpu.sampling.lattice import n_lattice_points
    from ngp_tpu.sampling.training import generate_training_batch
    from ngp_tpu.testbed import Testbed

    cache = Path("/tmp/ngp_tpu_bench_scene_v1")
    if not (cache / "transforms_train.json").exists():
        cache.mkdir(parents=True, exist_ok=True)
        write_synthetic_dataset(cache, n_train=12, n_test=1, width=96, height=96)

    tb = Testbed()
    snap = None
    for cand in (cache / "warm_snapshot.msgpack",
                 Path(__file__).resolve().parent.parent / ".evidence" / "bench_warm.msgpack"):
        if cand.exists():
            snap = cand
            break
    if snap is None:
        print("no warm snapshot; run bench.py first", file=sys.stderr)
        return 1
    tb.load_snapshot(str(snap))
    tb.load_training_data(cache / "transforms_train.json")
    print(f"# resumed at step {tb.training_buffer.i_step}")

    loop, trainer, state = tb._loop, tb._trainer, tb._state
    ds = tb._dataset
    images, xforms, focal = ds.images, ds.xforms, jnp.asarray(ds.focal_length)

    # settle controllers (also compiles the steady-state step)
    for _ in range(6):
        state = loop.train(state, 16)
    shape = loop.peek_shape(16)
    n_rays, cap, s_pad, n_window, s_short, n_long, n_seg_cap, _ = shape
    print(f"# shapes: n_rays={n_rays} cap={cap} s_pad={s_pad} win={n_window} "
          f"s_short={s_short} n_long={n_long} seg_cap={n_seg_cap}")

    def timeit(name, fn, reps=8):
        fn(); fn()
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        dtms = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name:34s} {dtms:8.1f} ms", flush=True)
        return dtms

    scfg = trainer.config.sampler
    aabb = trainer.aabb
    n_lat = n_lattice_points(scfg)

    @jax.jit
    def batch_only(rng, occupancy, occ_box, images, xforms, focal):
        b = generate_training_batch(
            scfg, aabb, images, xforms, focal, (0.5, 0.5), occupancy,
            rng, n_rays, jnp.uint32(0), cap, n_lat, s_pad,
            occ_aabb=occ_box, n_window=n_window, s_short=s_short,
            n_long=n_long, n_seg_cap=n_seg_cap,
        )
        return b.pos.sum() + b.n_samples

    @jax.jit
    def fwd_only(params, pos, dirs):
        rgb_raw, sigma_raw = trainer.model.rgbsigma_raw(params, pos, dirs, remat_heads=False)
        return rgb_raw.sum() + sigma_raw.sum()

    @jax.jit
    def fwd_grad(params, pos, dirs, g_rgb, g_sig):
        def f(p):
            rgb_raw, sigma_raw = trainer.model.rgbsigma_raw(p, pos, dirs, remat_heads=False)
            return (rgb_raw * g_rgb).sum() + (sigma_raw * g_sig).sum()
        return jax.grad(f)(params)

    rng = jax.random.PRNGKey(7)
    pos = jax.random.uniform(rng, (cap, 3))
    dirs = jax.random.uniform(rng, (cap, 3))
    g_rgb = jax.random.normal(rng, (cap, 3))
    g_sig = jax.random.normal(rng, (cap,))

    from ngp_tpu.train.optimizer import create_optimizer, ema_update
    tx = create_optimizer(trainer.config.optimizer)
    opt_state0 = tx.init(state.params)

    @jax.jit
    def opt_only(params, opt_state, grads, ema):
        import optax
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema = ema_update(ema, params, trainer.config.optimizer.ema_decay)
        return params, opt_state, ema

    t_batch = timeit("batch_gen", lambda: sync(batch_only(
        rng, state.grid.occupancy, state.grid.occ_aabb, images, xforms, focal)))
    t_fwd = timeit("net fwd (no grad)", lambda: sync(fwd_only(state.params, pos, dirs)))
    t_fb = timeit("net fwd+bwd (grad to params)", lambda: sync(
        fwd_grad(state.params, pos, dirs, g_rgb, g_sig)["hash_table"]))
    grads0 = jax.tree_util.tree_map(jnp.zeros_like, state.params)
    t_opt = timeit("optimizer+ema", lambda: sync(
        opt_only(state.params, opt_state0, grads0, state.ema_params)[0]["hash_table"]))

    # full step via the trainer's own compiled fn
    step_fn = trainer.train_step(n_rays, cap, s_pad, n_window, s_short, n_long, n_seg_cap)
    st = state

    def full_step():
        nonlocal st
        st, stats = step_fn(st, images, xforms, focal, jnp.uint32(0))
        sync(stats["loss_sum"])

    t_step = timeit("full train step", full_step)

    gu = trainer.grid_update(loop.i_step)

    def grid_update():
        nonlocal st
        st = gu(st)
        sync(st.grid.mean_density)

    t_grid = timeit("grid update (per 16 steps)", grid_update, reps=4)

    rt = 26.6  # measured tunnel roundtrip (ROADMAP.md)
    print(f"\n# roundtrip-corrected (subtract ~{rt} ms/readback):")
    for name, t in [("batch_gen", t_batch), ("fwd", t_fwd), ("fwd+bwd", t_fb),
                    ("optimizer+ema", t_opt), ("full step", t_step)]:
        print(f"#   {name:22s} ~{max(t - rt, 0.0):7.1f} ms")
    print(f"#   grid/16 steps        ~{max(t_grid - rt, 0.0)/16:7.1f} ms/step amortized")
    return 0


if __name__ == "__main__":
    sys.exit(main())
