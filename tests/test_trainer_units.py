"""Trainer-layer units: LR schedule, param EMA, rgb-target composition."""

import jax.numpy as jnp
import numpy as np

from ngp_tpu.train.optimizer import ema_update, lr_factor
from ngp_tpu.train.trainer import TrainingLoop, compute_rgb_target
from ngp_tpu.utils.color import linear_to_srgb
from ngp_tpu.utils.config import OptimizerConfig


def test_lr_factor_stepped_decay():
    cfg = OptimizerConfig(decay_start=20000, decay_interval=10000, decay_base=0.33)
    # parity with tcnn ExponentialDecay: base^(1 + (step-start)//interval)
    assert float(lr_factor(0, cfg)) == 1.0
    assert float(lr_factor(19999, cfg)) == 1.0
    np.testing.assert_allclose(float(lr_factor(20000, cfg)), 0.33, rtol=1e-6)
    np.testing.assert_allclose(float(lr_factor(29999, cfg)), 0.33, rtol=1e-6)
    np.testing.assert_allclose(float(lr_factor(30000, cfg)), 0.33**2, rtol=1e-6)


def test_ema_update():
    ema = {"w": jnp.asarray([1.0, 2.0])}
    p = {"w": jnp.asarray([3.0, 4.0])}
    out = ema_update(ema, p, 0.95)
    np.testing.assert_allclose(np.asarray(out["w"]), [1.0 * 0.95 + 3.0 * 0.05, 2.0 * 0.95 + 4.0 * 0.05], rtol=1e-6)


def test_rgb_target_linear_colorspace_trains_in_srgb():
    """Default path (color_space=Linear, train_in_linear=False): blend in
    linear, then target AND background converted to sRGB
    (ray_marcher.cu:107-113)."""
    rgba = jnp.asarray([[0.2, 0.3, 0.4, 0.5]])  # premultiplied linear
    bg = jnp.asarray([0.6, 0.6, 0.6])  # linear
    target, bg_out = compute_rgb_target(rgba, bg, "Linear", False)
    expect = np.asarray(linear_to_srgb(jnp.asarray([0.2 + 0.5 * 0.6, 0.3 + 0.5 * 0.6, 0.4 + 0.5 * 0.6])))
    np.testing.assert_allclose(np.asarray(target)[0], expect, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(bg_out), np.asarray(linear_to_srgb(bg)), rtol=1e-5)


def test_rgb_target_true_linear_training():
    rgba = jnp.asarray([[0.2, 0.3, 0.4, 0.5]])
    bg = jnp.asarray([0.6, 0.6, 0.6])
    target, bg_out = compute_rgb_target(rgba, bg, "Linear", True)
    np.testing.assert_allclose(np.asarray(target)[0], [0.5, 0.6, 0.7], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(bg_out), np.asarray(bg), rtol=1e-6)


def test_rgb_target_srgb_blend():
    """nerf_compatibility: blend in sRGB space (ray_marcher.cu:114-121)."""
    rgba = jnp.asarray([[0.2, 0.3, 0.4, 0.5]])
    bg = jnp.asarray([0.6, 0.6, 0.6])
    target, bg_out = compute_rgb_target(rgba, bg, "SRGB", False)
    bg_srgb = np.asarray(linear_to_srgb(bg))
    straight = np.asarray(linear_to_srgb(jnp.asarray([0.4, 0.6, 0.8])))  # rgb/alpha
    expect = straight * 0.5 + 0.5 * bg_srgb
    np.testing.assert_allclose(np.asarray(target)[0], expect, rtol=1e-5)
    # zero-alpha pixels fall back to the background entirely
    rgba0 = jnp.asarray([[0.0, 0.0, 0.0, 0.0]])
    target0, _ = compute_rgb_target(rgba0, bg, "SRGB", False)
    np.testing.assert_allclose(np.asarray(target0)[0], bg_srgb, rtol=1e-5)


def test_pick_n_rays_fills_capacity_on_converged_grids():
    """Asymmetric rung cost: undershoot (idle capacity in the static-shape
    network/composite stages) outweighs overshoot (extra march work only).
    At per_ray=24.7 / target 2^18 the right rung is 10240 (~253k expected,
    96.5% fill), not 8192 (202k, 77% fill — where the old symmetric-2x
    penalty parked) and not 12288 (304k expected, 14% of march wasted at
    the capacity cap)."""
    loop = TrainingLoop.__new__(TrainingLoop)
    loop.capacity = 1 << 18
    pick = loop._pick_n_rays
    assert pick(24.7, 1 << 18) == 10240
    # exact fit stays put
    assert pick(32.0, 1 << 18) == 8192
    # moderate overshoot beats a deep undershoot
    assert pick(21.4, 1 << 18) == 12288
    # still bounded: wild overshoot is not free
    assert pick(24.7, 1 << 18) != 1 << 18
    # capacity ABOVE target: kept over-target samples inflate the batch
    # (loss_scalar/grad scale with measured, testbed.cu:288-292), so the
    # controller must not exploit the headroom — undershoot wins again
    loop.capacity = 1 << 15
    assert pick(30.0, 1 << 14) == 512  # e=15360 beats e(640)=19200


def test_pick_n_rays_hysteresis():
    """Per-ray noise around a rung boundary must not flip the jit shape
    call to call: the incumbent stays unless decisively beaten."""
    loop = TrainingLoop.__new__(TrainingLoop)
    loop.capacity = 1 << 18
    pick = loop._pick_n_rays
    # 24.0 would freshly pick 12288, but 10240's cost is within the margin
    assert pick(24.0, 1 << 18, current=10240) == 10240
    assert pick(24.0, 1 << 18) == 12288
    # a decisive shift still switches
    assert pick(12.0, 1 << 18, current=10240) == 24576
    # non-ladder current (e.g. restored from an old snapshot) is ignored
    assert pick(24.0, 1 << 18, current=10000) == 12288


def test_stochastic_fused_scan_chunks_and_oom_demotion(tmp_path):
    """Shipped defaults (stochastic bwd) run the fused scan in
    stochastic_fuse_steps chunks; a compile OOM demotes to per-step
    dispatch without corrupting loop counters."""
    import numpy as np

    from ngp_tpu.data.synthetic import write_synthetic_dataset
    from ngp_tpu.testbed import Testbed

    cfg = {
        "samlper": {"aabb_scale": 1, "grid_size": 16, "maximum_marching_steps": 128},
        "network": {
            "encoding": {
                "n_levels": 4,
                "log2_hashmap_size": 12,
                "base_resolution": 8,
                "desired_resolution": 64,
                "stochastic_corner_backward": True,
            },
            "network": {"n_neurons": 64, "n_hidden_layers": 1},
            "dir_encoding": {"degree": 4},
            "rgb_network": {"n_neurons": 64, "n_hidden_layers": 2},
        },
    }
    train_json, _ = write_synthetic_dataset(tmp_path, n_train=3, n_test=1, width=32, height=32)
    tb = Testbed()
    tb.load_model_config_dict(cfg)
    tb._trainer.sample_capacity = 1 << 13
    tb.load_training_data(train_json)
    loop = tb._loop
    loop.stochastic_fuse_steps = 4
    assert tb._trainer.model.grid_spec.stochastic_bwd
    for _ in range(3):  # settle shapes; third call takes the chunked path
        tb.train(8, 1 << 12)
    assert tb.training_buffer.i_step == 24
    assert np.isfinite(tb.training_buffer.loss)

    # OOM demotion: a train_call whose first execution OOMs must fall back
    # to per-step dispatch, leave counters consistent, and stick at 1
    def boom(*a, **k):
        def call(*aa, **kk):
            raise RuntimeError("RESOURCE_EXHAUSTED: Ran out of memory in memory space hbm")

        return call

    orig_steps = tb.training_buffer.i_step
    tb._trainer.train_call = boom
    tb.train(8, 1 << 12)
    assert loop.stochastic_fuse_steps == 1
    assert tb.training_buffer.i_step == orig_steps + 8
    assert np.isfinite(tb.training_buffer.loss)
