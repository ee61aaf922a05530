"""Microbench: REPS-calibrated step components (no tunnel-roundtrip bias).

batch_gen / fwd / fwd+bwd / composite+grad / optax — each looped REPS times
inside one jit with varied inputs, roundtrip subtracted.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax

REPS = 8


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def bench(name, fn, *args):
    f = jax.jit(fn)
    sync(f(*args)); sync(f(*args))
    t0 = time.perf_counter()
    sync(f(*args))
    print(f"{name:40s} {(time.perf_counter()-t0-0.0266)/REPS*1e3:8.1f} ms", flush=True)


def main():
    from ngp_tpu.data.nerf_synthetic import load_nerf_synthetic
    from ngp_tpu.models.ngp import apply_density_activation, apply_rgb_activation
    from ngp_tpu.render.composite import train_loss
    from ngp_tpu.sampling.lattice import n_lattice_points
    from ngp_tpu.sampling.training import generate_training_batch
    from ngp_tpu.train.optimizer import create_optimizer, ema_update
    from ngp_tpu.train.trainer import Trainer
    from ngp_tpu.utils.config import NGPConfig

    ds = load_nerf_synthetic("/tmp/ngp_tpu_bench_scene_v1/transforms_train.json")
    config = NGPConfig.from_json({})
    scfg = config.sampler
    trainer = Trainer.create(config)
    state = trainer.init_state(seed=43)
    # realistic grid: ~25% occupied, nonzero density (an EMPTY grid makes
    # batches degenerate and lets XLA collapse the network/scatter work)
    g = config.sampler.grid_size
    occ = jax.random.uniform(jax.random.PRNGKey(9), (config.sampler.n_cascades, g, g, g)) < 0.25
    state = state._replace(grid=state.grid._replace(occupancy=occ))
    model, aabb = trainer.model, trainer.aabb
    n_rays, cap, s_pad, n_window = 8192, 1 << 18, 512, 1152
    n_lat = n_lattice_points(scfg)
    imgs, xf, fl = ds.images, ds.xforms, jnp.asarray(ds.focal_length)

    def gen(key):
        return generate_training_batch(
            scfg, aabb, imgs, xf, fl, (0.5, 0.5), state.grid.occupancy,
            key, n_rays, jnp.uint32(0), cap, n_lat, s_pad,
            occ_aabb=state.grid.occ_aabb, n_window=n_window,
        )

    def batch_reps(key):
        acc = jnp.zeros(())
        for r in range(REPS):
            b = gen(jax.random.fold_in(key, r))
            acc = acc + b.pos.sum() + b.n_samples
        return acc

    bench("batch_gen", batch_reps, jax.random.PRNGKey(0))

    key = jax.random.PRNGKey(1)
    pos = jax.random.uniform(key, (cap, 3))
    dirs = jax.random.uniform(key, (cap, 3))

    def fwd_reps(params, pos, dirs):
        acc = jnp.zeros(())
        for r in range(REPS):
            # vary params so the oct-table build cannot be hoisted out
            p_r = jax.tree_util.tree_map(lambda x: x + r * 1e-7, params)
            rgb_raw, sigma_raw = model.rgbsigma_raw(p_r, pos + r * 1e-6, dirs)
            acc = acc + rgb_raw.sum() + sigma_raw.sum()
        return acc

    bench("fwd (hash+mlps)", fwd_reps, state.params, pos, dirs)

    batch = jax.jit(gen)(jax.random.PRNGKey(2))
    tgt = jax.random.uniform(key, (n_rays, 3))

    def loss_of(params, pos):
        rgb_raw, sigma_raw = model.rgbsigma_raw(params, pos, batch.dirs)
        loss, _ = train_loss(
            rgb_raw, sigma_raw, batch.layout, scfg.min_cone_stepsize,
            batch.ray_valid, tgt, jnp.zeros(3),
            n_rays_denom=n_rays, loss_type="SmoothL1",
            transmittance_threshold=config.render.transmittance_threshold,
            rgb_activation="Logistic", density_activation="Exponential",
            mean_density=state.grid.mean_density,
            min_optical_thickness=scfg.min_optical_thickness,
            apply_rgb_activation=apply_rgb_activation,
            apply_density_activation=apply_density_activation,
        )
        return loss

    def fwdbwd_reps(params):
        acc = jnp.zeros(())
        g0 = None
        for r in range(REPS):
            p_r = jax.tree_util.tree_map(lambda x: x + r * 1e-7, params)
            loss, grads = jax.value_and_grad(loss_of)(p_r, batch.pos + r * 1e-6)
            acc = acc + loss + sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(grads))
        return acc

    bench("fwd+bwd (loss grad)", fwdbwd_reps, state.params)

    # composite alone (padded-view ops, no network)
    rgb_raw = jax.random.normal(key, (cap, 3))
    sigma_raw = jax.random.normal(key, (cap,))

    def comp_reps(rgb_raw, sigma_raw):
        acc = jnp.zeros(())
        for r in range(REPS):
            loss, _ = train_loss(
                rgb_raw + r * 1e-6, sigma_raw, batch.layout, scfg.min_cone_stepsize,
                batch.ray_valid, tgt, jnp.zeros(3),
                n_rays_denom=n_rays, loss_type="SmoothL1",
                transmittance_threshold=config.render.transmittance_threshold,
                rgb_activation="Logistic", density_activation="Exponential",
                mean_density=state.grid.mean_density,
                min_optical_thickness=scfg.min_optical_thickness,
                apply_rgb_activation=apply_rgb_activation,
                apply_density_activation=apply_density_activation,
            )
            acc = acc + loss * (r + 1)
        return acc

    bench("composite fwd only", comp_reps, rgb_raw, sigma_raw)

    tx = create_optimizer(config.optimizer)
    opt_state = tx.init(state.params)
    grads = jax.tree_util.tree_map(jnp.ones_like, state.params)

    def opt_reps(params, opt_state, grads):
        acc = jnp.zeros(())
        for r in range(REPS):
            upd, opt_state = tx.update(jax.tree_util.tree_map(lambda g: g + r * 1e-8, grads), opt_state, params)
            params = optax.apply_updates(params, upd)
            params2 = ema_update(params, params, 0.95)
            acc = acc + jax.tree_util.tree_leaves(params2)[0].ravel()[0]
        return acc

    bench("optax update + EMA", opt_reps, state.params, opt_state, grads)


if __name__ == "__main__":
    main()
