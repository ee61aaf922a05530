"""End-to-end: train the tiny NGP on the procedural scene to a PSNR floor,
render, snapshot-roundtrip, and run the data-parallel step on the fake mesh.
"""

import json
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ngp_tpu import metrics
from ngp_tpu.data.synthetic import render_ground_truth, write_synthetic_dataset
from ngp_tpu.testbed import Testbed
from ngp_tpu.utils.color import linear_to_srgb

TINY = {
    "samlper": {"aabb_scale": 1, "grid_size": 32, "maximum_marching_steps": 256},
    "network": {
        "encoding": {"n_levels": 8, "log2_hashmap_size": 14, "base_resolution": 16, "desired_resolution": 256},
        "network": {"n_neurons": 64, "n_hidden_layers": 1},
        "dir_encoding": {"degree": 4},
        "rgb_network": {"n_neurons": 64, "n_hidden_layers": 2},
    },
}


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    td = tmp_path_factory.mktemp("scene")
    train_json, test_json = write_synthetic_dataset(td, n_train=10, n_test=2, width=64, height=64)
    return train_json, test_json


@pytest.fixture(scope="module")
def trained_testbed(scene):
    train_json, _ = scene
    tb = Testbed()
    tb.load_model_config_dict(TINY)
    tb._trainer.sample_capacity = 1 << 15
    tb.load_training_data(train_json)
    while tb.training_buffer.i_step < 192:
        tb.train(16, 1 << 14)
    return tb


def test_training_reaches_psnr_floor(trained_testbed, scene):
    tb = trained_testbed
    _, test_json = scene
    assert tb.training_buffer.loss < 0.01
    doc = json.loads(open(test_json).read())
    tb.rendering_buffer.fov_axis = 0
    tb.fov = doc["camera_angle_x"]
    frame = doc["frames"][0]
    pose = np.asarray(frame["transform_matrix"], np.float32)[:3, :4]
    ref = render_ground_truth(pose, 64, 64, doc["camera_angle_x"])
    tb.set_nerf_camera_matrix(pose)
    img = tb.render(64, 64, spp=2, to_srgb=False)
    assert img.shape == (64, 64, 4)
    A = np.clip(np.asarray(linear_to_srgb(img[..., :3])), 0, 1)
    R = np.clip(np.asarray(linear_to_srgb(ref[..., :3])), 0, 1)
    p = metrics.psnr(A, R)
    assert p > 24.0, f"PSNR {p} below floor"
    assert metrics.ssim(A, R) > 0.75


def test_render_modes(trained_testbed, scene):
    tb = trained_testbed
    _, test_json = scene
    doc = json.loads(open(test_json).read())
    pose = np.asarray(doc["frames"][0]["transform_matrix"], np.float32)[:3, :4]
    tb.set_nerf_camera_matrix(pose)
    for mode in ("Depth", "Distance", "AO", "Stepsize", "Cost", "Normals"):
        tb.rendering_buffer.render_mode = mode
        img = tb.render(32, 32, spp=1, to_srgb=False)
        assert np.isfinite(img).all(), mode
    # VisPosNeg accumulation end-to-end (render_buffer.cu:65-76): channels 0/1
    # fold to the signed value's positive/negative parts. Depth writes equal
    # channels, so the folded value is exactly 0 (as in the reference); this
    # exercises the full render->accumulate->tonemap path in that space
    # (the fold arithmetic itself is unit-tested in test_envmap_buffer).
    tb.rendering_buffer.render_mode = "Depth"
    prev_cs = tb.color_space
    tb.color_space = "VisPosNeg"
    img = np.asarray(tb.render(32, 32, spp=2, to_srgb=False))
    assert np.isfinite(img).all()
    assert np.allclose(img[..., 0], 0.0) and np.allclose(img[..., 1], 0.0)
    assert img[..., 3].max() > 0  # rays still hit; alpha accumulates normally
    tb.color_space = prev_cs
    tb.rendering_buffer.render_mode = "Shade"


def test_spp_jitter_never_reuses_tile_uploads(trained_testbed, scene):
    """With snap_to_pixel_centers_in_rendering=False each spp pass jitters the
    subpixel offset, changing the ray directions AND the hit set — so per-tile
    device uploads must never be shared across passes (regression: the cache
    once reused the first pass's directions for all later passes, silently
    losing the multi-spp antialiasing). The tile cache is bypassed entirely
    when snapping is off; only the snapped path populates it."""
    import dataclasses

    tb = trained_testbed
    _, test_json = scene
    doc = json.loads(open(test_json).read())
    pose = np.asarray(doc["frames"][0]["transform_matrix"], np.float32)[:3, :4]
    tb.set_nerf_camera_matrix(pose)
    r = tb._renderer
    old_cfg = r.config
    r.config = dataclasses.replace(
        old_cfg,
        sampler=dataclasses.replace(old_cfg.sampler, snap_to_pixel_centers_in_rendering=False),
    )
    try:
        r._seg_cache.clear()
        img = tb.render(32, 32, spp=2, to_srgb=False)  # passes spp=0 then spp=1
        assert np.all(np.isfinite(img))
        # jittered passes must not leave reusable tile uploads behind
        assert "tiles" not in r._seg_cache
    finally:
        r.config = old_cfg
        r._seg_cache.clear()
    # the snapped default path DOES cache tile uploads across passes
    tb.render(32, 32, spp=2, to_srgb=False)
    assert r._seg_cache.get("tiles")


def test_snapshot_roundtrip_exact_render(trained_testbed, scene, tmp_path):
    tb = trained_testbed
    _, test_json = scene
    doc = json.loads(open(test_json).read())
    pose = np.asarray(doc["frames"][1]["transform_matrix"], np.float32)[:3, :4]

    snap = tmp_path / "ckpt.msgpack"
    tb.save_snapshot(str(snap), serialize_optimizer=True)

    tb2 = Testbed()
    tb2.load_snapshot(str(snap))
    assert tb2.scene_scale == tb.scene_scale

    for t in (tb, tb2):
        t.rendering_buffer.fov_axis = 0
        t.fov = doc["camera_angle_x"]
        t.set_nerf_camera_matrix(pose)
    img1 = tb.render(48, 48, spp=2, to_srgb=True)
    img2 = tb2.render(48, 48, spp=2, to_srgb=True)
    np.testing.assert_array_equal(img1, img2)


def test_loss_decreases_from_start(scene):
    train_json, _ = scene
    tb = Testbed()
    tb.load_model_config_dict(TINY)
    tb._trainer.sample_capacity = 1 << 15
    tb.load_training_data(train_json)
    tb.train(16, 1 << 14)
    first = tb.training_buffer.loss
    for _ in range(5):
        tb.train(16, 1 << 14)
    assert tb.training_buffer.loss < first


def test_dp_train_step_runs_on_fake_mesh(scene):
    from ngp_tpu.parallel.mesh import make_dp_grid_update, make_dp_train_step, make_mesh
    from ngp_tpu.train.trainer import Trainer
    from ngp_tpu.utils.config import NGPConfig
    from ngp_tpu.data.nerf_synthetic import load_nerf_synthetic
    from ngp_tpu.grid.occupancy import mark_untrained_grid

    assert len(jax.devices()) == 8, "conftest must provide 8 fake devices"
    train_json, _ = scene
    ds = load_nerf_synthetic(train_json)

    cfg = NGPConfig.from_json(
        {
            "samlper": {"grid_size": 16, "maximum_marching_steps": 128},
            "network": {
                "encoding": {"n_levels": 4, "log2_hashmap_size": 12, "base_resolution": 8, "desired_resolution": 64},
                "network": {"n_neurons": 64, "n_hidden_layers": 1},
                "dir_encoding": {"degree": 4},
                "rgb_network": {"n_neurons": 64, "n_hidden_layers": 2},
            },
        }
    )
    trainer = Trainer.create(cfg)
    trainer.sample_capacity = 8192
    state = trainer.init_state(0)
    density = mark_untrained_grid(cfg.sampler, ds.resolution, ds.focal_length, ds.xforms)
    state = state._replace(grid=state.grid._replace(density=density))

    mesh = make_mesh()
    grid_up = make_dp_grid_update(trainer, mesh, cfg.sampler.n_total_elements, 0)
    state = grid_up(state)
    step = make_dp_train_step(trainer, mesh, n_rays_global=1024)
    losses = []
    for i in range(4):
        state, stats = step(state, ds.images, ds.xforms, jnp.asarray(ds.focal_length), jnp.uint32(i * 1024))
        losses.append(float(stats["loss_sum"]) / 1024)
    assert np.isfinite(losses).all()
    assert int(stats["measured_batch_size"]) > 0


def test_dp_render_matches_single_chip(scene):
    """Mesh-sharded rendering (rays over "data") == single-chip rendering.

    NEW capability over the reference (single-GPU only, SURVEY §2.4); round
    partitioning differs between shard sizes, so compare to composite
    tolerance rather than bitwise."""
    train_json, _ = scene
    tb1 = Testbed()
    tb1.load_model_config_dict(TINY)
    tb1._trainer.sample_capacity = 1 << 14
    tb1.load_training_data(train_json)
    for _ in range(3):
        tb1.train(16, 1 << 13)

    tb8 = Testbed(use_mesh=True)
    tb8.load_model_config_dict(TINY)
    assert tb8._renderer.mesh is not None
    # identical state: copy the trained params/grid into the mesh testbed
    tb8._state = tb8._state._replace(
        params=tb1._state.params, ema_params=tb1._state.ema_params, grid=tb1._state.grid
    )
    tb8.scene_scale = tb1.scene_scale
    tb8.scene_offset = tb1.scene_offset

    doc = json.loads(open(scene[1]).read())
    pose = np.asarray(doc["frames"][0]["transform_matrix"], np.float32)[:3, :4]
    tb1.set_nerf_camera_matrix(pose)
    tb8.set_nerf_camera_matrix(pose)
    img1 = np.asarray(tb1.render(32, 32, spp=2, to_srgb=False))
    img8 = np.asarray(tb8.render(32, 32, spp=2, to_srgb=False))
    assert np.isfinite(img8).all()
    np.testing.assert_allclose(img8, img1, atol=2e-3)


def test_dp_envmap_training_runs(scene):
    """Envmap-background training under the DP mesh (psum'ed envmap grads)."""
    train_json, _ = scene
    cfg = {**TINY, "envmap": {"train": True, "height": 16, "width": 32}}
    tb = Testbed(use_mesh=True)
    tb.load_model_config_dict(cfg)
    assert tb._trainer.mesh is not None
    tb._trainer.sample_capacity = 1 << 13
    tb.load_training_data(train_json)
    env0 = np.asarray(tb._state.envmap.params).copy()
    tb.train(16, 1 << 12)
    tb.train(16, 1 << 12)
    env1 = np.asarray(tb._state.envmap.params)
    assert np.isfinite(env1).all()
    assert not np.allclose(env0, env1)  # the envmap actually trained


def test_dp_2d_mesh_dcn_data(scene):
    """2-D ("dcn", "data") mesh for multi-slice pods: grads psum over both
    axes (ICI within a slice + DCN across), global ray indexing slice-major."""
    from ngp_tpu.data.nerf_synthetic import load_nerf_synthetic
    from ngp_tpu.parallel.mesh import make_dp_grid_update, make_dp_train_step, make_mesh
    from ngp_tpu.train.trainer import Trainer
    from ngp_tpu.utils.config import NGPConfig

    train_json, _ = scene
    ds = load_nerf_synthetic(train_json)
    cfg = NGPConfig.from_json(
        {
            "samlper": {"grid_size": 16, "maximum_marching_steps": 128},
            "network": {
                "encoding": {"n_levels": 4, "log2_hashmap_size": 12, "base_resolution": 8, "desired_resolution": 64},
                "network": {"n_neurons": 64, "n_hidden_layers": 1},
                "dir_encoding": {"degree": 4},
                "rgb_network": {"n_neurons": 64, "n_hidden_layers": 2},
            },
        }
    )
    trainer = Trainer.create(cfg)
    trainer.sample_capacity = 4096
    state = trainer.init_state(0)
    mesh = make_mesh(n_slices=2)
    assert mesh.axis_names == ("dcn", "data") and mesh.devices.shape == (2, 4)
    state = make_dp_grid_update(trainer, mesh, cfg.sampler.n_total_elements, 0)(state)
    step = make_dp_train_step(trainer, mesh, n_rays_global=1024)
    state, stats = step(state, ds.images, ds.xforms, jnp.asarray(ds.focal_length), jnp.uint32(0))
    assert np.isfinite(float(stats["loss_sum"]))
    assert int(stats["measured_batch_size"]) > 0
