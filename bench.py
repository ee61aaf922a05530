"""Benchmark: steady-state training throughput of the full-size NGP on TPU.

Protocol (mirrors the reference training protocol, BASELINE.md): full
base.json model (hash T=2^19 L=16 F=2, 64-wide MLPs, SH4), target batch
2^18 samples/step, 16 steps per train() call, occupancy grid maintained
every call. The scene is the procedural nerf_synthetic-format dataset
(ngp_tpu/data/synthetic.py) since no real nerf_synthetic data ships here.

Headline metric: training samples/second (network-visited samples per
wall-clock second, the reference's measured_batch_size × steps / time).
vs_baseline anchors against 1e8 samples/s — the tiny-cuda-nn-class
single-GPU training throughput implied by the Instant-NGP paper's
seconds-class lego training on an RTX 3090 (BASELINE.md's external anchor;
the reference repo itself publishes no numbers).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import tempfile
import time

BASELINE_SAMPLES_PER_SEC = 1.0e8


def main():
    import hashlib
    from pathlib import Path

    import jax
    import numpy as np

    try:  # persist compiled executables across bench runs (big warmup saver)
        jax.config.update("jax_compilation_cache_dir", "/tmp/ngp_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception as e:  # cache is an optimization only
        print(f"# compilation cache unavailable: {e}", file=sys.stderr)

    from ngp_tpu.data.synthetic import write_synthetic_dataset
    from ngp_tpu.testbed import Testbed

    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {getattr(dev, 'device_kind', '?')}", file=sys.stderr)

    # dataset cached across bench runs (generation is numpy-only, ~seconds)
    cache = Path(tempfile.gettempdir()) / "ngp_tpu_bench_scene_v1"
    train_json = cache / "transforms_train.json"
    if not train_json.exists():
        t0 = time.perf_counter()
        cache.mkdir(parents=True, exist_ok=True)
        write_synthetic_dataset(cache, n_train=12, n_test=1, width=96, height=96)
        print(f"# dataset gen: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    tb = Testbed()
    tb.load_model_config_dict({})  # full defaults == base.json
    tb.load_training_data(train_json)

    # warmup: let the grid bootstrap + jit compile all shapes. Keep going
    # until the controller's shapes held steady for two consecutive calls —
    # that guarantees the fused 16-step scan (used once shapes repeat) has
    # compiled BEFORE the timed region.
    t0 = time.perf_counter()
    stable = 0
    prev_shape = None
    while tb.training_buffer.i_step < 64 or (stable < 2 and tb.training_buffer.i_step < 256):
        tb.train(16, 1 << 18)
        # stability = the full controller shape tuple (rays/widths/window/
        # seg-cap, trainer.py `shape`) held steady across consecutive calls,
        # so every jit the timed region will use has already compiled
        lp = tb._loop
        stable = stable + 1 if lp._last_shape == prev_shape else 0
        prev_shape = lp._last_shape
        print(
            f"#   warm step={tb.training_buffer.i_step} n_rays={lp.n_rays_per_batch} "
            f"cap={lp.capacity} win={lp.n_window} stable={stable} "
            f"measured={tb.training_buffer.measured_batch_size} t={time.perf_counter()-t0:.1f}s",
            file=sys.stderr,
        )

    # timed region
    n_steps = 128
    start_step = tb.training_buffer.i_step
    samples = 0
    t0 = time.perf_counter()
    while tb.training_buffer.i_step < start_step + n_steps:
        tb.train(16, 1 << 18)
        samples += tb.training_buffer.measured_batch_size * 16
    elapsed = time.perf_counter() - t0
    sps = samples / elapsed
    print(
        f"# {n_steps} steps in {elapsed:.2f}s -> {sps:.3e} samples/s "
        f"({n_steps/elapsed:.1f} steps/s), loss={tb.training_buffer.loss:.5f}",
        file=sys.stderr,
    )

    # ---- converged-grid render benchmark (sparse-scene FPS, tracked) ----
    # The short bench training above leaves a noisy, nearly-dense occupancy
    # grid (worst case for any empty-space skip). A CONVERGED run's grid is
    # the analytic one: cells whose ground-truth optical thickness crosses
    # the update threshold (grid/occupancy.update_occupancy semantics, fed
    # the GT field instead of network densities). Rendering the trained
    # model over that grid tracks the renderer's sparse-scene throughput —
    # the regime the reference's FPS-class eval lives in (run.py:169).
    render_stats = {}
    try:
        import jax.numpy as jnp

        from ngp_tpu.data.synthetic import field_sigma_rgb
        from ngp_tpu.grid.occupancy import update_occupancy

        cfgs = tb.config.sampler
        g = cfgs.grid_size
        ax = (np.arange(g, dtype=np.float32) + 0.5) / g - 0.5
        zz, yy, xx = np.meshgrid(ax, ax, ax, indexing="ij")  # linear: x fastest
        dens = []
        for c in range(cfgs.n_cascades):
            centers = np.stack([xx, yy, zz], axis=-1).reshape(-1, 3) * float(1 << c) + 0.5
            sigma, _ = field_sigma_rgb(centers)
            dens.append(sigma * cfgs.min_cone_stepsize)
        grid = tb._state.grid._replace(density=jnp.asarray(np.concatenate(dens)))
        grid = update_occupancy(cfgs, grid)
        occ_frac = float(np.asarray(grid.occupancy[0]).mean())
        print(f"# converged grid: cascade-0 occ frac {occ_frac:.4f}", file=sys.stderr)

        ds = tb._dataset
        camera = np.asarray(ds.xforms[0], np.float32)
        res = 800
        fl = float(ds.focal_length[0]) * res / ds.images.shape[2]

        def frame(spp_i):
            return tb._renderer.render_frame(
                tb._state.ema_params, grid.occupancy, camera, (res, res),
                (fl, fl), (0.5, 0.5), spp_i, occ_aabb=grid.occ_aabb,
            )

        np.asarray(frame(0))  # compile + warm
        t0 = time.perf_counter()
        for s in range(8):
            np.asarray(frame(s))
        t_frame = time.perf_counter() - t0
        render_stats = {
            "render_800_spp8_s": t_frame,
            "render_fps": 1.0 / t_frame,
        }
        print(f"# converged-grid render: 800^2 spp-8 frame {t_frame:.2f}s", file=sys.stderr)
    except Exception as e:  # the headline metric must survive a render failure
        print(f"# converged-grid render benchmark failed: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "train_samples_per_sec",
                "value": sps,
                "unit": "samples/s",
                "vs_baseline": sps / BASELINE_SAMPLES_PER_SEC,
                **render_stats,
            }
        )
    )


if __name__ == "__main__":
    main()
