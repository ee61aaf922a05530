"""Checkpoint/resume continuity: optimizer-state serialization keeps training
smooth across a save/load boundary (testbed.cu:127-163 semantics)."""

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
}


def test_resume_with_optimizer_state(tmp_path):
    train_json, _ = write_synthetic_dataset(tmp_path, n_train=4, n_test=1, width=32, height=32)

    tb = Testbed()
    tb.load_model_config_dict(CFG)
    tb._trainer.sample_capacity = 1 << 13
    tb.load_training_data(train_json)
    for _ in range(6):
        tb.train(16, 1 << 12)
    loss_before = tb.training_buffer.loss
    snap = tmp_path / "resume.msgpack"
    tb.save_snapshot(str(snap), serialize_optimizer=True)

    tb2 = Testbed()
    tb2.load_snapshot(str(snap))
    # our snapshot schema carries the step counter; the resume loop and the
    # step-cadenced grid-update behavior continue exactly where they left off
    assert tb2.training_buffer.i_step == tb.training_buffer.i_step
    tb2._trainer.sample_capacity = 1 << 13  # match the original run's batches
    # snapshot does not carry the dataset (the reference's snapshot doesn't
    # either, SURVEY §3.4) — reload data to continue training. Re-marking the
    # grid must MERGE with (not clobber) the restored densities: trained cells
    # keep their values, camera-invisible cells stay -1.
    trained_density = np.asarray(tb2._state.grid.density)
    tb2.load_training_data(train_json)
    after = np.asarray(tb2._state.grid.density)
    vis = trained_density >= 0
    assert np.array_equal(after[vis], trained_density[vis])
    assert np.all(after[~vis] == -1.0)

    tb2.train(16, 1 << 12)
    # resumed training stays in the converged regime (no re-warmup spike);
    # random-background training is noisy step to step, so allow slack
    assert tb2.training_buffer.loss < max(5.0 * loss_before, 0.02), (
        tb2.training_buffer.loss,
        loss_before,
    )


def test_controller_state_persists_across_resume(tmp_path):
    """The host controller (n_rays/s_pad/s_short/per-ray estimate) rides the
    snapshot: a resumed loop starts at the saved steady-state shapes instead
    of re-paying the 2^12-ray warm-up transient."""
    train_json, _ = write_synthetic_dataset(tmp_path, n_train=4, n_test=1, width=32, height=32)

    tb = Testbed()
    tb.load_model_config_dict(CFG)
    tb._trainer.sample_capacity = 1 << 13
    tb.load_training_data(train_json)
    for _ in range(4):
        tb.train(16, 1 << 12)
    saved = tb._loop.controller_state()
    assert saved["per_ray_est"] > 0
    snap = tmp_path / "ctrl.msgpack"
    tb.save_snapshot(str(snap))

    tb2 = Testbed()
    tb2.load_snapshot(str(snap))
    tb2._trainer.sample_capacity = 1 << 13
    tb2.load_training_data(train_json)
    got = tb2._loop.controller_state()
    assert got["n_rays_per_batch"] == saved["n_rays_per_batch"]
    assert got["s_pad"] == saved["s_pad"]
    assert got["s_short"] == saved["s_short"]
    # and the restored estimate suppresses the fresh-grid probe: the first
    # resumed call enters at the saved shapes (asserted above) and trains
    # normally; afterwards the controller is free to track the grid again
    assert tb2._loop._per_ray_est is not None
    tb2.train(16, 1 << 12)
    assert tb2.training_buffer.measured_batch_size > 0


def test_reference_snapshot_roundtrip(tmp_path):
    """tcnn-layout interchange (ngp_network.h:496-541 order): export ->
    sniffing loader -> identical params, density grid, and render."""
    import jax
    import jax.numpy as jnp

    train_json, _ = write_synthetic_dataset(tmp_path, n_train=4, n_test=1, width=32, height=32)
    cfg = {**CFG, "network": {**CFG["network"], "encoding": {**CFG["network"]["encoding"], "hash_variant": "tcnn"}}}
    tb = Testbed()
    tb.load_model_config_dict(cfg)
    tb._trainer.sample_capacity = 1 << 13
    tb.load_training_data(train_json)
    tb.train(16, 1 << 12)
    snap = tmp_path / "ref_style.msgpack"
    tb.save_snapshot(str(snap), reference_format=True)

    tb2 = Testbed()
    tb2.load_snapshot(str(snap))
    assert tb2.config.network.encoding.hash_variant == "tcnn"
    # MLP weights exact; hash levels exact over their LIVE rows (padding
    # rows past a level's size are unused and not part of the format)
    for k in ("density_mlp", "rgb_mlp"):
        for a, b in zip(tb._state.params[k], tb2._state.params[k], strict=True):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0, rtol=0)
    from ngp_tpu.ops.hash_encoding import as_level_major

    sp = tb._trainer.model.grid_spec
    t_a = np.asarray(as_level_major(tb._state.params["hash_table"], sp))
    t_b = np.asarray(as_level_major(tb2._state.params["hash_table"], sp))
    for l in range(sp.n_levels):
        np.testing.assert_allclose(t_a[l, : sp.sizes[l]], t_b[l, : sp.sizes[l]], atol=0, rtol=0)
    np.testing.assert_allclose(
        np.asarray(tb._state.grid.density), np.asarray(tb2._state.grid.density), rtol=1e-6, atol=1e-7
    )
    assert tb2.scene_scale == tb.scene_scale

    img1 = tb2.render(32, 32, spp=1, to_srgb=True)
    tb.load_training_data(train_json)  # no-op for params; renders use state
    # render from the ORIGINAL testbed with ema == params? the exporter wrote
    # raw params; compare against a fresh render through the imported state
    tb._state = tb._state._replace(ema_params=tb._state.params)
    img0 = tb.render(32, 32, spp=1, to_srgb=True)
    np.testing.assert_allclose(np.asarray(img0), np.asarray(img1), atol=1e-4)


def test_reference_snapshot_half_precision_import(tmp_path):
    """A __half params_binary (what a real tcnn snapshot carries) imports."""
    import msgpack

    from ngp_tpu.models.ngp import NGPModel
    from ngp_tpu.train.snapshot import pack_reference_params
    from ngp_tpu.utils.config import NGPConfig

    cfg_doc = {**CFG, "network": {**CFG["network"], "encoding": {**CFG["network"]["encoding"], "hash_variant": "tcnn"}}}
    config = NGPConfig.from_json(cfg_doc)
    model = NGPModel.create(config.network)
    import jax

    params = model.init(jax.random.PRNGKey(0))
    flat = pack_reference_params(params, model.grid_spec, config.network).astype(np.float16)
    n_cells = config.sampler.n_total_elements
    doc = dict(cfg_doc)
    doc["snapshot"] = {
        "n_params": int(flat.size),
        "params_type": "__half",
        "params_binary": flat.tobytes(),
        "density_grid": [0.02] * n_cells,
        "scene_scale": 0.33,
        "scene_offset": [0.5, 0.5, 0.5],
    }
    p = tmp_path / "half.msgpack"
    with open(p, "wb") as f:
        f.write(msgpack.packb(doc, use_bin_type=True))

    from ngp_tpu.ops.hash_encoding import as_level_major

    tb = Testbed()
    tb.load_snapshot(str(p))
    sp = model.grid_spec
    got = np.asarray(as_level_major(tb._state.params["hash_table"], sp))
    want = np.asarray(as_level_major(params["hash_table"], sp)).astype(np.float16).astype(np.float32)
    for l in range(sp.n_levels):
        np.testing.assert_allclose(got[l, : sp.sizes[l]], want[l, : sp.sizes[l]], atol=0, rtol=0)
