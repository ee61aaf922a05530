"""Envmap-enabled training: the trainable background learns a nonzero map."""

import jax.numpy as jnp
import numpy as np

from ngp_tpu.data.synthetic import write_synthetic_dataset
from ngp_tpu.testbed import Testbed

CFG = {
    "samlper": {"aabb_scale": 1, "grid_size": 16, "maximum_marching_steps": 128},
    "network": {
        "encoding": {"n_levels": 4, "log2_hashmap_size": 12, "base_resolution": 8, "desired_resolution": 64},
        "network": {"n_neurons": 64, "n_hidden_layers": 1},
        "dir_encoding": {"degree": 4},
        "rgb_network": {"n_neurons": 64, "n_hidden_layers": 2},
    },
    "render": {"train_with_random_bg_color": False},
    "envmap": {"train": True, "height": 16, "width": 32, "loss": "RelativeL2"},
}


def test_envmap_trains_and_renders(tmp_path):
    train_json, test_json = write_synthetic_dataset(tmp_path, n_train=4, n_test=1, width=32, height=32)
    tb = Testbed()
    tb.load_model_config_dict(CFG)
    tb._trainer.sample_capacity = 1 << 13
    tb.load_training_data(train_json)

    assert tb._state.envmap is not None
    env0 = np.asarray(tb._state.envmap.params)
    assert (env0 == 0).all()

    tb.train(16, 1 << 12)
    tb.train(16, 1 << 12)
    env1 = np.asarray(tb._state.envmap.params)
    # exhausted rays see through to the background -> envmap receives grads
    assert np.abs(env1).max() > 0, "envmap received no gradient"
    assert np.isfinite(tb.training_buffer.loss)

    # rendering composites the envmap behind non-hit rays
    import json

    doc = json.loads(open(test_json).read())
    tb.rendering_buffer.fov_axis = 0
    tb.fov = doc["camera_angle_x"]
    tb.set_nerf_camera_matrix(np.asarray(doc["frames"][0]["transform_matrix"], np.float32)[:3, :4])
    img = tb.render(16, 16, spp=1, to_srgb=False)
    assert np.isfinite(img).all()
