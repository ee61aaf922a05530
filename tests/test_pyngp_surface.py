"""pyngp API-surface parity: module enums, runtime-tweakable activations,
and the buffer-view fields bound in reference internal/python_api.cu:51-138.
"""

import numpy as np
import pytest

import ngp_tpu
from ngp_tpu.data.synthetic import write_synthetic_dataset
from ngp_tpu.testbed import (
    Activation,
    ColorSpace,
    LossType,
    RenderingBufferView,
    RenderMode,
    Testbed,
    TonemapCurve,
    TrainingBufferView,
)

TINY = {
    "samlper": {"aabb_scale": 1, "grid_size": 32, "maximum_marching_steps": 128},
    "network": {
        "encoding": {"n_levels": 4, "log2_hashmap_size": 12, "base_resolution": 16, "desired_resolution": 64},
        "network": {"n_neurons": 16, "n_hidden_layers": 1},
        "dir_encoding": {"degree": 2},
        "rgb_network": {"n_neurons": 16, "n_hidden_layers": 1},
    },
}


def test_enums_match_python_api_cu():
    # python_api.cu:51-88 member lists, exactly
    assert set(Activation.values()) == {"None", "ReLU", "Logistic", "Exponential"}
    assert getattr(Activation, "None") == "None"
    assert set(RenderMode.values()) == {"AO", "Shade", "Normals", "Depth", "Distance", "Stepsize", "Cost"}
    assert set(ColorSpace.values()) == {"Linear", "SRGB"}
    assert set(TonemapCurve.values()) == {"Identity", "ACES", "Hable", "Reinhard"}
    assert set(LossType.values()) == {"L2", "L1", "Mape", "Smape", "SmoothL1", "LogL1", "RelativeL2"}
    # importable from the package root like `pyngp.RenderMode`
    for name in ("Activation", "RenderMode", "ColorSpace", "TonemapCurve", "LossType"):
        assert getattr(ngp_tpu, name) is not None


def test_buffer_view_fields():
    tb_view = TrainingBufferView()
    for f in (
        "i_step",
        "loss",
        "n_rays_per_batch",
        "measured_batch_size",
        "measured_batch_size_before_compaction",
        "training_prep_ms",
        "training_ms",
    ):
        assert hasattr(tb_view, f)
    rb = RenderingBufferView()
    assert rb.MIN_STEPS_INBETWEEN_COMPACTION == 1  # testbed.h:202
    assert rb.MAX_STEPS_INBETWEEN_COMPACTION == 8  # testbed.h:203
    rb.MAX_STEPS_INBETWEEN_COMPACTION = 4  # read-write, like the binding


def test_testbed_activation_defaults():
    tb = Testbed()
    assert tb.density_activation == "Exponential"  # testbed.h:114
    assert tb.rgb_activation == "Logistic"  # testbed.h:115


@pytest.fixture(scope="module")
def tiny_testbed(tmp_path_factory):
    td = tmp_path_factory.mktemp("scene_api")
    train_json, _ = write_synthetic_dataset(td, n_train=4, n_test=1, width=32, height=32)
    tb = Testbed()
    tb.load_model_config_dict(TINY)
    tb._trainer.sample_capacity = 1 << 13
    tb.load_training_data(train_json)
    tb.train(16, 1 << 12)
    return tb


def test_n_rays_per_batch_reported(tiny_testbed):
    assert tiny_testbed.training_buffer.n_rays_per_batch > 0


def test_runtime_activation_swap_renders(tiny_testbed):
    tb = tiny_testbed
    tb.rendering_buffer.fov_axis = 0
    tb.fov = 0.8
    pose = np.eye(4, dtype=np.float32)[:3, :4]
    pose[2, 3] = -1.5
    tb.set_nerf_camera_matrix(pose)
    img_exp = tb.render(16, 16, spp=1, to_srgb=False)
    tb.density_activation = Activation.ReLU
    img_relu = tb.render(16, 16, spp=1, to_srgb=False)
    assert img_exp.shape == img_relu.shape == (16, 16, 4)
    assert np.all(np.isfinite(img_relu))
    tb.density_activation = Activation.Exponential
