"""Long TPU evidence run: full-config training on the procedural scene,
periodic loss logging, final render eval -> /tmp/evidence.json."""

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

N_STEPS = 1600
t0 = time.perf_counter()
history = []
while tb.training_buffer.i_step < N_STEPS:
    tb.train(16, 1 << 18)
    el = time.perf_counter() - t0
    history.append({"step": tb.training_buffer.i_step, "loss": tb.training_buffer.loss, "t": el})
    if tb.training_buffer.i_step % 160 == 0:
        print(f"step={tb.training_buffer.i_step} loss={tb.training_buffer.loss:.5f} t={el:.0f}s", flush=True)
    if el > 7800:
        print("time budget reached", flush=True)
        break

train_time = time.perf_counter() - t0
snap = "/tmp/evidence_ckpt.msgpack"
tb.save_snapshot(snap, False)

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

result = {
    "steps": int(tb.training_buffer.i_step),
    "train_seconds": train_time,
    "steps_per_sec": tb.training_buffer.i_step / train_time,
    "final_loss": float(tb.training_buffer.loss),
    "psnr": metrics.psnr(A, R),
    "ssim": metrics.ssim(A, R),
    "flip": metrics.compute_error("FLIP", A, R),
    "render_seconds_96x96_spp8": t_render,
    "history": history[-20:],
}
Path("/tmp/evidence.json").write_text(json.dumps(result, indent=1))
print(json.dumps({k: v for k, v in result.items() if k != "history"}, indent=1), flush=True)
