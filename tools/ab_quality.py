"""A/B quality + speed harness: same-seed short trainings under config
overrides, PSNR on held-out views + steady-state step timing.

Used round 2 to validate oadd/xadd/tcnn equal quality; round 3 for the
stochastic-corner backward. Usage:

  python tools/ab_quality.py [n_steps=640] [res=200] [arm ...]

Compares {} (baseline) against each override in OVERRIDES; optional
trailing arm names restrict the run to that subset (deltas are reported
against the first arm run when "baseline" is excluded).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

# "baseline" pins every A/B'd flag to its OFF state explicitly —
# stochastic_corner_backward now DEFAULTS to True, so `{}` would silently
# run the identical config in both arms.
OVERRIDES = {
    "baseline": {"network": {"encoding": {"stochastic_corner_backward": False}}},
    "stoch_corner": {"network": {"encoding": {"stochastic_corner_backward": True}}},
    "level_rate2": {"network": {"encoding": {"stochastic_corner_backward": True, "stochastic_level_rate": 2}}},
    "level_rate4": {"network": {"encoding": {"stochastic_corner_backward": True, "stochastic_level_rate": 4}}},
    # a partial "optimizer" doc REPLACES the whole stack, so spell out the
    # base.json values with only the zero-grad knob flipped (dense Adam)
    "lazy_adam_off": {
        "optimizer": {
            "otype": "Ema",
            "decay": 0.95,
            "nested": {
                "otype": "ExponentialDecay",
                "decay_start": 20000,
                "decay_interval": 10000,
                "decay_base": 0.33,
                "nested": {
                    "otype": "Adam",
                    "learning_rate": 1e-2,
                    "beta1": 0.9,
                    "beta2": 0.99,
                    "epsilon": 1e-15,
                    "l2_reg": 1e-6,
                    "optimize_params_when_gradient_is_zero": True,
                },
            },
        }
    },
}


def run_one(name, doc, n_steps, res):
    import jax

    import ngp_tpu as ngp
    from ngp_tpu.data.synthetic import render_ground_truth, write_synthetic_dataset

    cache = Path("/tmp/ngp_tpu_bench_scene_v1")
    if not (cache / "transforms_train.json").exists():
        cache.mkdir(parents=True, exist_ok=True)
        write_synthetic_dataset(cache, n_train=12, n_test=1, width=96, height=96)

    tb = ngp.Testbed()
    tb.load_model_config_dict(doc)
    tb.load_training_data(str(cache / "transforms_train.json"))
    t0 = time.perf_counter()
    t_half = None
    while tb.training_buffer.i_step < n_steps:
        if t_half is None and tb.training_buffer.i_step >= n_steps // 2:
            t_half = time.perf_counter()
        tb.train(16, 1 << 18)
    t_train = time.perf_counter() - t0
    steady = (time.perf_counter() - t_half) / (n_steps - n_steps // 2) if t_half else float("nan")

    # held-out view PSNR vs the analytic ground truth (same recipe as
    # tools/evidence_run.py: sRGB-clipped comparison, black background)
    from ngp_tpu.utils.color import linear_to_srgb

    meta = json.loads((cache / "transforms_test.json").read_text())
    frame = meta["frames"][0]
    pose = np.asarray(frame["transform_matrix"], np.float32)[:3, :4]
    gt = np.asarray(render_ground_truth(pose, res, res, meta["camera_angle_x"]))
    tb.background_color = [0.0, 0.0, 0.0, 1.0]
    tb.rendering_buffer.fov_axis = 0
    tb.fov = meta["camera_angle_x"]
    tb.set_nerf_camera_matrix(pose)
    img = np.asarray(tb.render(res, res, spp=4, to_srgb=True))
    a = np.clip(img[..., :3], 0, 1)
    b = np.clip(np.asarray(linear_to_srgb(gt[..., :3])), 0, 1)
    mse = float(np.mean((a - b) ** 2))
    psnr = -10.0 * np.log10(max(mse, 1e-12))
    print(
        f"{name:14s} steps {n_steps}  train {t_train:6.1f}s  steady {steady*1e3:6.0f} ms/step  "
        f"PSNR {psnr:6.2f} dB",
        flush=True,
    )
    return psnr, steady


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 640
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    import jax

    try:
        from ngp_tpu.utils.compile_cache import enable_persistent_compile_cache

        enable_persistent_compile_cache()
    except Exception:
        pass
    arms = [a for a in sys.argv[3:] if a in OVERRIDES] or list(OVERRIDES)
    results = {}
    for name in arms:
        results[name] = run_one(name, OVERRIDES[name], n_steps, res)
    base_name = "baseline" if "baseline" in results else arms[0]
    base = results[base_name]
    for name, (psnr, steady) in results.items():
        if name == base_name:
            continue
        print(
            f"# {name}: dPSNR {psnr - base[0]:+.2f} dB, step time {steady/base[1]:.2f}x {base_name}"
        )


if __name__ == "__main__":
    main()
