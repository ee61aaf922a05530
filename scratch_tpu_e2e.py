"""TPU end-to-end validation: train full config on the synthetic scene,
render a held-out view, report PSNR + render timing."""

import json
import time
from pathlib import Path

import numpy as np

from ngp_tpu import metrics
from ngp_tpu.data.synthetic import render_ground_truth, write_synthetic_dataset
from ngp_tpu.testbed import Testbed
from ngp_tpu.utils.color import linear_to_srgb

cache = Path("/tmp/ngp_tpu_bench_scene_v1")
train_json = cache / "transforms_train.json"
test_json = cache / "transforms_test.json"
if not train_json.exists():
    write_synthetic_dataset(cache, n_train=12, n_test=1, width=96, height=96)

tb = Testbed()
tb.load_model_config_dict({})
tb.load_training_data(train_json)

t0 = time.perf_counter()
while tb.training_buffer.i_step < 64:
    tb.train(16, 1 << 18)
    print(
        f"step={tb.training_buffer.i_step} loss={tb.training_buffer.loss:.5f} "
        f"n_rays={tb._loop.n_rays_per_batch} cap={tb._loop.capacity} "
        f"measured={tb.training_buffer.measured_batch_size} t={time.perf_counter()-t0:.0f}s",
        flush=True,
    )

doc = json.loads(open(test_json).read())
tb.background_color = [0.0, 0.0, 0.0, 1.0]
tb.rendering_buffer.fov_axis = 0
tb.fov = doc["camera_angle_x"]
frame = doc["frames"][0]
pose = np.asarray(frame["transform_matrix"], np.float32)[:3, :4]
ref = render_ground_truth(pose, 96, 96, doc["camera_angle_x"])
tb.set_nerf_camera_matrix(pose)

t0 = time.perf_counter()
img = tb.render(96, 96, spp=8, to_srgb=False)
t_render = time.perf_counter() - t0
A = np.clip(np.asarray(linear_to_srgb(img[..., :3])), 0, 1)
R = np.clip(np.asarray(linear_to_srgb(ref[..., :3])), 0, 1)
print(f"render 96x96 spp8 (cold): {t_render:.2f}s", flush=True)

t0 = time.perf_counter()
img = tb.render(96, 96, spp=8, to_srgb=False)
print(f"render 96x96 spp8 (warm): {time.perf_counter()-t0:.2f}s", flush=True)

print(f"PSNR={metrics.psnr(A, R):.2f} SSIM={metrics.ssim(A, R):.3f} FLIP={metrics.compute_error('FLIP', A, R):.4f}", flush=True)
