"""A/B: shared-eval vs exact-eval multi-spp rendering (VERDICT r3 #3).

Loads the bench warm snapshot (or a given checkpoint), builds the analytic
converged occupancy grid (same recipe as bench.py), and renders the 800^2
spp-8 frame both ways on the flagship procedural scene:

  exact  — every pass re-evaluates the network at its jittered positions
           (the round-3 path; ~14.2M samples/pass x 8 passes at the gather
           floor == the whole frame budget)
  shared — one eval per occupied lattice cell, per-pass in-cell lerp
           (renderer.share_spp_evals, the new default)

Reports warm frame time per mode and PSNR of each against the ray-traced
ground truth (data/synthetic.render_ground_truth), so the speedup and the
quality delta land in one table.

Usage: python tools/ab_spp_share.py [res] [ckpt]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    ckpt = Path(sys.argv[2]) if len(sys.argv) > 2 else (
        Path(__file__).resolve().parent.parent / ".evidence" / "bench_warm.msgpack"
    )

    import jax
    import jax.numpy as jnp

    from ngp_tpu import metrics
    from ngp_tpu.data.synthetic import field_sigma_rgb, render_ground_truth, write_synthetic_dataset
    from ngp_tpu.grid.occupancy import update_occupancy
    from ngp_tpu.testbed import Testbed
    from ngp_tpu.utils.color import linear_to_srgb
    from ngp_tpu.utils.compile_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    scene = Path("/tmp/ngp_tpu_bench_scene_v1")
    if not (scene / "transforms_train.json").exists():
        scene.mkdir(parents=True, exist_ok=True)
        write_synthetic_dataset(scene, n_train=12, n_test=1, width=96, height=96)

    tb = Testbed()
    tb.load_snapshot(str(ckpt))
    tb.load_training_data(scene / "transforms_train.json")
    print(f"# snapshot at step {tb.training_buffer.i_step}", flush=True)

    # analytic converged grid (bench.py recipe): GT optical thickness
    cfgs = tb.config.sampler
    g = cfgs.grid_size
    ax = (np.arange(g, dtype=np.float32) + 0.5) / g - 0.5
    zz, yy, xx = np.meshgrid(ax, ax, ax, indexing="ij")
    dens = []
    for c in range(cfgs.n_cascades):
        centers = np.stack([xx, yy, zz], axis=-1).reshape(-1, 3) * float(1 << c) + 0.5
        sigma, _ = field_sigma_rgb(centers)
        dens.append(sigma * cfgs.min_cone_stepsize)
    grid = tb._state.grid._replace(density=jnp.asarray(np.concatenate(dens)))
    grid = update_occupancy(cfgs, grid)
    print(f"# converged grid occ frac {float(np.asarray(grid.occupancy[0]).mean()):.4f}", flush=True)

    import json

    test_doc = json.loads((scene / "transforms_test.json").read_text())
    pose = np.asarray(test_doc["frames"][0]["transform_matrix"], np.float32)[:3, :4]
    gt = np.asarray(render_ground_truth(pose, res, res, test_doc["camera_angle_x"]))
    gt_srgb = np.clip(np.asarray(linear_to_srgb(gt[..., :3])), 0, 1)

    # drive the PROTOCOL eval path (run.py:98-134): black bg, test fov,
    # set_nerf_camera_matrix does the OpenGL->scene pose conversion
    tb.background_color = [0.0, 0.0, 0.0, 1.0]
    tb.rendering_buffer.fov_axis = 0
    tb.fov = test_doc["camera_angle_x"]
    tb.set_nerf_camera_matrix(pose)
    # render over the ANALYTIC converged grid (the steady-state regime)
    tb._state = tb._state._replace(grid=grid)

    rows = []
    for label, share in (("shared", True), ("exact", False)):
        tb._renderer.share_spp_evals = share

        def frame():
            return np.asarray(tb.render(res, res, spp=8, to_srgb=True))

        img = frame()  # compile + warm
        t0 = time.perf_counter()
        img = frame()
        t = time.perf_counter() - t0
        img_srgb = np.clip(img[..., :3], 0, 1)
        p = float(metrics.psnr(img_srgb, gt_srgb))
        rows.append((label, t, p))
        print(f"# {label}: {res}^2 spp-8 warm frame {t:.2f}s  PSNR vs GT {p:.3f} dB", flush=True)

    (l0, t0_, p0), (l1, t1_, p1) = rows
    print(
        f"# speedup {t1_/t0_:.2f}x  PSNR delta {p0 - p1:+.4f} dB (shared - exact)",
        flush=True,
    )


if __name__ == "__main__":
    main()
