"""Component breakdown of the train step on the real chip.

Times (via device->host readback sync, the only reliable sync through the
axon tunnel — see ROADMAP round-2 methodology note):
  - full train() call (16 steps + grid update)
  - per-step: full step vs batch-gen-only vs fwd-loss-only (no grad)
  - grid update alone
Run: python tools/profile_step.py [n_rays] [s_pad]
"""

import os
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
    n_rays = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    s_pad = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    from ngp_tpu.data.nerf_synthetic import load_nerf_synthetic
    from ngp_tpu.data.synthetic import write_synthetic_dataset
    from ngp_tpu.models.ngp import apply_density_activation, apply_rgb_activation
    from ngp_tpu.sampling.lattice import n_lattice_points
    from ngp_tpu.sampling.training import generate_training_batch
    from ngp_tpu.train.trainer import Trainer, TrainingLoop
    from ngp_tpu.utils.config import NGPConfig

    cache = Path("/tmp/ngp_tpu_bench_scene_v1")
    if not (cache / "transforms_train.json").exists():
        cache.mkdir(parents=True, exist_ok=True)
        write_synthetic_dataset(cache, n_train=12, n_test=1, width=96, height=96)
    ds = load_nerf_synthetic(cache / "transforms_train.json")

    # warm resume: reuse the bench's converged snapshot when present so the
    # profile reflects the steady-state (sparse-grid) regime and skips the
    # ~10 min converge phase (same cache protocol as bench.py)
    warm = cache / "warm_snapshot.msgpack"
    if warm.exists() and not os.environ.get("NGP_PROFILE_FRESH"):
        from ngp_tpu.testbed import Testbed

        tb = Testbed()
        tb.load_snapshot(str(warm))
        tb.load_training_data(cache / "transforms_train.json")
        trainer, loop = tb._trainer, tb._loop
        config, state = trainer.config, tb._state
        loop.i_step = tb.training_buffer.i_step
        print(f"# resumed warm snapshot at step {loop.i_step}", flush=True)
    else:
        config = NGPConfig.from_json({})
        trainer = Trainer.create(config)
        state = trainer.init_state(seed=43)
        loop = TrainingLoop(trainer, ds)

    # converge grid + controller
    t0 = time.perf_counter()
    for _ in range(8):
        state = loop.train(state, 16)
        print(
            f"# warm i={loop.i_step} n_rays={loop.n_rays_per_batch} s_pad={loop.s_pad} "
            f"measured={loop.measured_batch_size:.0f} bc={loop.measured_batch_size_before_compaction:.0f} "
            f"prep={loop.training_prep_ms:.0f}ms train={loop.training_ms:.0f}ms",
            flush=True,
        )
    print(f"# warm total {time.perf_counter()-t0:.1f}s")

    # pin the loop's REAL shape tuple (incl. two-bucket + seg-cap choices)
    n_rays, cap, s_pad, n_window, s_short, n_long, n_seg_cap, _ = loop.peek_shape()
    print(
        f"# pinned: n_rays={n_rays} s_pad={s_pad} cap={cap} n_window={n_window} "
        f"s_short={s_short} n_long={n_long} n_seg_cap={n_seg_cap}"
    )

    scfg = config.sampler
    n_lat = n_lattice_points(scfg)
    aabb = trainer.aabb

    # component fns
    @jax.jit
    def batch_only(rng, occupancy, occ_box, images, xforms, focal):
        batch = generate_training_batch(
            scfg, aabb, images, xforms, focal, (0.5, 0.5), occupancy,
            rng, n_rays, jnp.uint32(0), cap, n_lat, s_pad,
            occ_aabb=occ_box, n_window=n_window, s_short=s_short,
            n_long=n_long, n_seg_cap=n_seg_cap,
        )
        return batch.pos.sum() + batch.n_samples

    @jax.jit
    def fwd_only(params, pos, dirs):
        rgb_raw, sigma_raw = trainer.model.rgbsigma_raw(params, pos, dirs)
        return rgb_raw.sum() + sigma_raw.sum()

    @jax.jit
    def density_only(params, pos):
        return trainer.model.density_raw(params, pos).sum()

    step_fn = trainer.train_step(n_rays, cap, s_pad, n_window, s_short, n_long, n_seg_cap)
    images, xforms, focal = ds.images, ds.xforms, jnp.asarray(ds.focal_length)

    def timeit(name, fn, reps=8):
        fn()  # compile+warm
        fn()
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        dtms = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name:28s} {dtms:8.1f} ms", flush=True)
        return dtms

    rng = jax.random.PRNGKey(7)
    pos = jax.random.uniform(rng, (cap, 3))
    dirs = jax.random.uniform(rng, (cap, 3))

    # batch-gen decomposition: ray-gen, march, row-sort, assembly
    from ngp_tpu.sampling.lattice import count_samples, occupied_window_start

    def _rays(rng, images, xforms, focal):
        h, w = images.shape[1], images.shape[2]
        k_pixel, k_jitter = jax.random.split(rng)
        i = jnp.arange(n_rays, dtype=jnp.uint32)
        img = ((i * jnp.uint32(images.shape[0])) // jnp.uint32(n_rays)) % jnp.uint32(images.shape[0])
        img = img.astype(jnp.int32)
        xy = jax.random.uniform(k_pixel, (n_rays, 2))
        res = jnp.array([w, h], jnp.float32)
        xy = (jnp.clip(jnp.floor(xy * res), 0, res - 1) + 0.5) / res
        xf = xforms[img]
        fx, fy = focal[0], focal[1]
        d_cam = jnp.stack(
            [(xy[:, 0] - 0.5) * w / fx, (xy[:, 1] - 0.5) * h / fy, jnp.ones((n_rays,), jnp.float32)],
            axis=-1,
        )
        d = jnp.einsum("rij,rj->ri", xf[:, :, :3], d_cam)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        o = xf[:, :, 3]
        tmin, _ = aabb.ray_intersect(o, d)
        startt = jnp.maximum(tmin, scfg.near_distance) + scfg.min_cone_stepsize * jax.random.uniform(k_jitter, (n_rays,))
        return o, d, startt

    @jax.jit
    def raygen_only(rng, images, xforms, focal):
        o, d, startt = _rays(rng, images, xforms, focal)
        return o.sum() + d.sum() + startt.sum()

    @jax.jit
    def march_only(rng, occupancy, occ_box, images, xforms, focal):
        o, d, startt = _rays(rng, images, xforms, focal)
        k0 = occupied_window_start(occ_box, o, d, startt, scfg.min_cone_stepsize, n_lat)
        c = count_samples(scfg, aabb, occupancy, o, d, startt, n_window, k0=k0)
        return c.sum()

    @jax.jit
    def march_sort(rng, occupancy, occ_box, images, xforms, focal):
        o, d, startt = _rays(rng, images, xforms, focal)
        k0 = occupied_window_start(occ_box, o, d, startt, scfg.min_cone_stepsize, n_lat)
        c, m = count_samples(scfg, aabb, occupancy, o, d, startt, n_window, return_masks=True, k0=k0)
        iota = jnp.arange(n_window, dtype=jnp.int32)[None, :]
        lat_pad = jax.lax.sort(jnp.where(m, iota, jnp.int32(n_window)), dimension=1)[:, :s_pad]
        return c.sum() + lat_pad[:, 0].sum()

    timeit("ray_gen", lambda: sync(raygen_only(rng, images, xforms, focal)))
    timeit("ray_gen+march", lambda: sync(march_only(rng, state.grid.occupancy, state.grid.occ_aabb, images, xforms, focal)))
    timeit("ray_gen+march+sort", lambda: sync(march_sort(rng, state.grid.occupancy, state.grid.occ_aabb, images, xforms, focal)))
    timeit("batch_gen", lambda: sync(batch_only(rng, state.grid.occupancy, state.grid.occ_aabb, images, xforms, focal)))
    timeit("fwd (hash+mlps, no grad)", lambda: sync(fwd_only(state.params, pos, dirs)))

    # grad-path decomposition at the pinned batch size
    @jax.jit
    def fwd_grad(params, pos, dirs, g_rgb, g_sig):
        def f(p):
            rgb_raw, sigma_raw = trainer.model.rgbsigma_raw(p, pos, dirs)
            return (rgb_raw * g_rgb).sum() + (sigma_raw * g_sig).sum()
        return jax.grad(f)(params)

    g_rgb = jax.random.normal(rng, (cap, 3))
    g_sig = jax.random.normal(rng, (cap,))
    timeit("net fwd+bwd (grad to params)", lambda: sync(fwd_grad(state.params, pos, dirs, g_rgb, g_sig)["hash_table"]))

    # REAL loss fwd+bwd on a materialized batch: net + two-bucket composite +
    # loss, grad to params. (loss_grad − fwd_grad) ≈ composite/loss overhead;
    # (full_step − batch_gen − loss_grad − optimizer) ≈ RNG/target/stats rest.
    from ngp_tpu.render.composite import train_loss
    from ngp_tpu.train.trainer import compute_rgb_target
    from ngp_tpu.utils.color import srgb_to_linear

    @jax.jit
    def make_batch(rng, occupancy, occ_box, images, xforms, focal):
        return generate_training_batch(
            scfg, aabb, images, xforms, focal, (0.5, 0.5), occupancy,
            rng, n_rays, jnp.uint32(0), cap, n_lat, s_pad,
            occ_aabb=occ_box, n_window=n_window, s_short=s_short,
            n_long=n_long, n_seg_cap=n_seg_cap,
        )

    real_batch = jax.block_until_ready(
        make_batch(rng, state.grid.occupancy, state.grid.occ_aabb, images, xforms, focal)
    )
    bg_linear = srgb_to_linear(jnp.asarray(trainer.background_color, jnp.float32))
    rgb_target0, bg_composite0 = compute_rgb_target(
        real_batch.rgba, bg_linear, trainer.color_space, config.render.train_in_linear_color
    )

    @jax.jit
    def loss_grad(params, batch, rgb_target, bg_composite, mean_density):
        def f(p):
            rgb_raw, sigma_raw = trainer.model.rgbsigma_raw(p, batch.pos, batch.dirs)
            extra = ()
            if batch.layout_long is not None:
                bg_long = bg_composite[batch.sel_long] if bg_composite.ndim == 2 else bg_composite
                extra = ((batch.layout_long,
                          batch.dt_pad_long if batch.dt_pad_long is not None else scfg.min_cone_stepsize,
                          batch.valid_long, rgb_target[batch.sel_long], bg_long),)
            loss, aux = train_loss(
                rgb_raw, sigma_raw, batch.layout,
                batch.dt_pad if batch.dt_pad is not None else scfg.min_cone_stepsize,
                batch.valid_short, rgb_target, bg_composite,
                extra_buckets=extra, n_rays_denom=n_rays,
                loss_type=config.loss,
                transmittance_threshold=config.render.transmittance_threshold,
                rgb_activation=trainer.rgb_activation,
                density_activation=trainer.density_activation,
                mean_density=mean_density,
                min_optical_thickness=scfg.min_optical_thickness,
                apply_rgb_activation=apply_rgb_activation,
                apply_density_activation=apply_density_activation,
            )
            return loss
        return jax.grad(f)(params)

    timeit("loss fwd+bwd (real batch)", lambda: sync(
        loss_grad(state.params, real_batch, rgb_target0, bg_composite0, state.grid.mean_density)["hash_table"]))

    from ngp_tpu.train.optimizer import create_optimizer, ema_update
    tx = create_optimizer(config.optimizer)
    opt_state0 = tx.init(state.params)

    @jax.jit
    def opt_only(params, opt_state, grads, ema):
        import optax
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema = ema_update(ema, params, config.optimizer.ema_decay)
        return params, opt_state, ema

    grads0 = jax.tree_util.tree_map(jnp.zeros_like, state.params)
    timeit("optimizer+ema", lambda: sync(opt_only(state.params, opt_state0, grads0, state.ema_params)[0]["hash_table"]))
    timeit("density_only (grid upd fwd)", lambda: sync(density_only(state.params, pos)))

    # full step: state donation means we must thread it
    st = state
    def full_step():
        nonlocal st
        st, stats = step_fn(st, images, xforms, focal, jnp.uint32(0))
        sync(stats["loss_sum"])
    timeit("full train step", full_step, reps=8)

    gu = trainer.grid_update(loop.i_step)
    def grid_update():
        nonlocal st
        st = gu(st)
        sync(st.grid.mean_density)
    timeit("grid_update (per call)", grid_update, reps=4)


if __name__ == "__main__":
    main()
