"""Two-level training march (coarse pooled-grid premask): exactness vs the
full-window march, truncation semantics, and the controller stat."""

import jax
import jax.numpy as jnp
import numpy as np

from ngp_tpu.grid.occupancy import occupied_aabb
from ngp_tpu.sampling.training import generate_training_batch
from ngp_tpu.utils.aabb import AABB
from ngp_tpu.utils.config import SamplerConfig


def _scene(grid=32, seed=7):
    """Blobby occupancy + a tiny camera set looking into the box."""
    cfg = SamplerConfig(grid_size=grid, maximum_marching_steps=128, near_distance=0.05)
    ax = (np.arange(grid) + 0.5) / grid
    zz, yy, xx = np.meshgrid(ax, ax, ax, indexing="ij")
    occ0 = ((xx - 0.5) ** 2 + (yy - 0.45) ** 2 + (zz - 0.55) ** 2) < 0.12**2
    occ0 |= ((xx - 0.3) ** 2 + (yy - 0.7) ** 2 + (zz - 0.4) ** 2) < 0.08**2
    occ = np.zeros((cfg.n_cascades, grid, grid, grid), bool)
    occ[0] = occ0
    rng = np.random.default_rng(seed)
    n_img, h, w = 2, 16, 16
    images = jnp.asarray(rng.uniform(0, 1, (n_img, h, w, 4)), jnp.float16)
    xf = np.zeros((n_img, 3, 4), np.float32)
    for i in range(n_img):
        xf[i, :, :3] = np.eye(3)
        xf[i, :, 3] = [0.5, 0.45, -1.2]
    return cfg, jnp.asarray(occ), images, jnp.asarray(xf)


def _batch(cfg, occ, images, xf, **kw):
    aabb = AABB.scene(1)
    return generate_training_batch(
        cfg, aabb, images, xf, jnp.asarray([20.0, 20.0]), (0.5, 0.5), occ,
        jax.random.PRNGKey(5), 64, 0, 4096, 512, 64,
        occ_aabb=occupied_aabb(cfg, occ), n_window=256, **kw,
    )


def test_seg_premask_exact_vs_full_window():
    """With the cap covering every coarse-occupied segment, the two-level
    march produces the full-window march's exact sample set."""
    cfg, occ, images, xf = _scene()
    ref = _batch(cfg, occ, images, xf, want_seg_stat=True)
    # at R=64 the p99.5 stat index is the last sorted element == the max,
    # so the cap covers every coarse-occupied segment (exactness premise)
    msc = int(ref.seg_count_hi)
    assert msc > 0
    seg = _batch(cfg, occ, images, xf, n_seg_cap=max(msc, 8))

    np.testing.assert_array_equal(np.asarray(ref.n_samples), np.asarray(seg.n_samples))
    np.testing.assert_array_equal(np.asarray(ref.ray_valid), np.asarray(seg.ray_valid))
    np.testing.assert_array_equal(
        np.asarray(ref.layout.flat_valid), np.asarray(seg.layout.flat_valid)
    )
    fv = np.asarray(ref.layout.flat_valid)
    np.testing.assert_allclose(
        np.asarray(ref.pos)[fv], np.asarray(seg.pos)[fv], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(ref.dirs)[fv], np.asarray(seg.dirs)[fv], atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(ref.rgba), np.asarray(seg.rgba), atol=1e-6)


def test_seg_premask_truncation_keeps_prefix():
    """An undersized cap truncates rays to their first cap*8-sample window
    slice (march-order prefix) — never crashes, never emits stray samples."""
    cfg, occ, images, xf = _scene()
    ref = _batch(cfg, occ, images, xf)
    tiny = _batch(cfg, occ, images, xf, n_seg_cap=2)
    # every truncated ray's samples are a prefix of the reference ray's
    rid_t = np.asarray(tiny.layout.ray_ids)
    fv_t = np.asarray(tiny.layout.flat_valid)
    pos_t = np.asarray(tiny.pos)
    rid_r = np.asarray(ref.layout.ray_ids)
    fv_r = np.asarray(ref.layout.flat_valid)
    pos_r = np.asarray(ref.pos)
    pir_t = np.asarray(tiny.layout.pos_in_ray)
    by_ray = {}
    for f in np.nonzero(fv_r)[0]:
        by_ray.setdefault(int(rid_r[f]), []).append(pos_r[f])
    checked = 0
    for f in np.nonzero(fv_t)[0]:
        r, j = int(rid_t[f]), int(pir_t[f])
        if r in by_ray and j < len(by_ray[r]):
            np.testing.assert_allclose(pos_t[f], by_ray[r][j], atol=1e-6)
            checked += 1
    assert checked > 0
    assert int(np.asarray(tiny.n_samples)) <= int(np.asarray(ref.n_samples))


def test_trainer_seg_controller_engages():
    """TrainingLoop sizes n_seg_cap from the probe/stat and takes the seg
    path when it undercuts the window; loss stays finite either way."""
    from ngp_tpu.testbed import Testbed

    import json
    from pathlib import Path

    from ngp_tpu.data.synthetic import write_synthetic_dataset

    scene = Path("/tmp/ngp_tpu_seg_scene")
    if not (scene / "transforms_train.json").exists():
        scene.mkdir(parents=True, exist_ok=True)
        write_synthetic_dataset(scene, n_train=3, n_test=1, width=24, height=24)
    tb = Testbed()
    tb.load_model_config_dict(
        {
            "samlper": {"aabb_scale": 1, "grid_size": 16, "maximum_marching_steps": 64},
            "network": {
                "encoding": {"n_levels": 2, "log2_hashmap_size": 10, "base_resolution": 8, "desired_resolution": 16},
                "network": {"n_neurons": 16, "n_hidden_layers": 1},
                "dir_encoding": {"degree": 2},
                "rgb_network": {"n_neurons": 16, "n_hidden_layers": 1},
            },
        }
    )
    tb.load_training_data(str(scene / "transforms_train.json"))
    for _ in range(4):
        tb.train(4, 1 << 12)
    assert np.isfinite(tb.training_buffer.loss)
    loop = tb._loop
    assert loop._seg_est is not None and loop._seg_est > 0
    # force a sparse estimate and verify the controller picks a real cap
    loop._seg_est = 3.0
    loop.n_seg_cap = 0
    tb.train(4, 1 << 12)
    assert loop.n_seg_cap > 0
    assert np.isfinite(tb.training_buffer.loss)
