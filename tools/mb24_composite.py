"""Composite+loss cost at real two-bucket shapes, minus the network.

profile_step shows loss fwd+bwd - net fwd+bwd ~= 30 ms; this isolates
train_loss (fwd and fwd+bwd wrt raw net outputs) on a REAL materialized
batch to see where that goes.
Run: python tools/mb24_composite.py
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
    print(f"{name:40s} {(time.perf_counter() - t0) / reps * 1e3:8.1f} ms", flush=True)


def main():
    import os

    from ngp_tpu.data.nerf_synthetic import load_nerf_synthetic
    from ngp_tpu.models.ngp import apply_density_activation, apply_rgb_activation
    from ngp_tpu.render.composite import train_loss
    from ngp_tpu.sampling.lattice import n_lattice_points
    from ngp_tpu.sampling.training import generate_training_batch
    from ngp_tpu.testbed import Testbed
    from ngp_tpu.train.trainer import compute_rgb_target
    from ngp_tpu.utils.color import srgb_to_linear

    cache = Path("/tmp/ngp_tpu_bench_scene_v1")
    tb = Testbed()
    tb.load_snapshot(str(cache / "warm_snapshot.msgpack"))
    tb.load_training_data(str(cache / "transforms_train.json"))
    trainer, loop, config = tb._trainer, tb._loop, tb.config
    state = tb._state
    ds = loop.dataset if hasattr(loop, "dataset") else None
    from ngp_tpu.data.nerf_synthetic import load_nerf_synthetic as _l

    ds = _l(cache / "transforms_train.json")
    for _ in range(2):
        state = loop.train(state, 16)
    n_rays, cap, s_pad, n_window, s_short, n_long, n_seg_cap, _ = loop.peek_shape()
    print(f"# n_rays={n_rays} cap={cap} s_pad={s_pad} s_short={s_short} n_long={n_long}")
    scfg = config.sampler
    rng = jax.random.PRNGKey(7)

    @jax.jit
    def make_batch(rng, occupancy, occ_box, images, xforms, focal):
        return generate_training_batch(
            scfg, trainer.aabb, images, xforms, focal, (0.5, 0.5), occupancy,
            rng, n_rays, jnp.uint32(0), cap, n_lattice_points(scfg), s_pad,
            occ_aabb=occ_box, n_window=n_window, s_short=s_short,
            n_long=n_long, n_seg_cap=n_seg_cap,
        )

    images, xforms, focal = ds.images, ds.xforms, jnp.asarray(ds.focal_length)
    batch = jax.block_until_ready(make_batch(rng, state.grid.occupancy, state.grid.occ_aabb, images, xforms, focal))
    bg_linear = srgb_to_linear(jnp.asarray(trainer.background_color, jnp.float32))
    rgb_target0, bg_composite0 = compute_rgb_target(
        batch.rgba, bg_linear, trainer.color_space, config.render.train_in_linear_color
    )
    rgb_raw = jax.random.normal(rng, (cap, 3))
    sigma_raw = jax.random.normal(rng, (cap,))

    def loss_of(rgb_raw, sigma_raw):
        extra = ()
        if batch.layout_long is not None:
            bg_long = bg_composite0[batch.sel_long] if bg_composite0.ndim == 2 else bg_composite0
            extra = ((batch.layout_long,
                      batch.dt_pad_long if batch.dt_pad_long is not None else scfg.min_cone_stepsize,
                      batch.valid_long, rgb_target0[batch.sel_long], bg_long),)
        loss, aux = train_loss(
            rgb_raw, sigma_raw, batch.layout,
            batch.dt_pad if batch.dt_pad is not None else scfg.min_cone_stepsize,
            batch.valid_short, rgb_target0, bg_composite0,
            extra_buckets=extra, n_rays_denom=n_rays,
            loss_type=config.loss,
            transmittance_threshold=config.render.transmittance_threshold,
            rgb_activation=trainer.rgb_activation,
            density_activation=trainer.density_activation,
            mean_density=state.grid.mean_density,
            min_optical_thickness=scfg.min_optical_thickness,
            apply_rgb_activation=apply_rgb_activation,
            apply_density_activation=apply_density_activation,
        )
        return loss

    fwd = jax.jit(lambda r, s: loss_of(r, s))
    gradf = jax.jit(lambda r, s: jax.grad(lambda rr, ss: loss_of(rr, ss), argnums=(0, 1))(r, s))

    timeit("composite+loss fwd", lambda: sync(fwd(rgb_raw, sigma_raw)))
    timeit("composite+loss fwd+bwd", lambda: sync(gradf(rgb_raw, sigma_raw)[0]))


def trace_main():
    """python tools/mb24_composite.py trace -> xplane trace of the pieces."""
    import jax.profiler

    jax.profiler.start_trace("/tmp/ngp_trace_composite")
    try:
        main()
    finally:
        jax.profiler.stop_trace()
        print("# trace at /tmp/ngp_trace_composite")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "trace":
        trace_main()
    else:
        main()
