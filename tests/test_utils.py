"""Unit tests for color/camera/aabb/morton/qmc/config utils vs analytic values."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ngp_tpu.utils import aabb as aabb_mod
from ngp_tpu.utils.aabb import AABB, warp_direction, warp_dt, unwarp_dt, unwarp_position, warp_position
from ngp_tpu.utils.camera import focal_length_to_fov, fov_to_focal_length, opengl_to_opencv, pixel_to_rays
from ngp_tpu.utils.color import (
    linear_to_srgb,
    linear_to_srgb_derivative,
    srgb_to_linear,
    srgb_to_linear_derivative,
)
from ngp_tpu.utils.config import NGPConfig, SamplerConfig, parse_commented_json
from ngp_tpu.utils.morton import morton3d, morton3d_decode
from ngp_tpu.utils.qmc import ld_random_pixel_offset, ld_random_val, sobol


def test_srgb_roundtrip_and_derivative():
    x = jnp.linspace(0.0, 1.0, 101)
    rt = linear_to_srgb(srgb_to_linear(x))
    np.testing.assert_allclose(rt, x, atol=2e-3)  # 0.41666 is a truncated 1/2.4

    # derivative vs jax.grad
    for fn, dfn in [(srgb_to_linear, srgb_to_linear_derivative), (linear_to_srgb, linear_to_srgb_derivative)]:
        g = jax.vmap(jax.grad(lambda v: fn(v).sum()))(x[1:-1])
        np.testing.assert_allclose(g, dfn(x[1:-1]), rtol=1e-4)


def test_fov_focal_roundtrip():
    fl = fov_to_focal_length(800, np.deg2rad(60.0))
    np.testing.assert_allclose(fl, 0.5 * 800 / np.tan(np.deg2rad(30.0)), rtol=1e-6)
    fov_deg = focal_length_to_fov(800, fl)
    np.testing.assert_allclose(fov_deg, 60.0, rtol=1e-5)


def test_opengl_to_opencv_pose():
    pose = np.eye(3, 4, dtype=np.float32)
    pose[:, 3] = [1.0, 2.0, 3.0]
    out = np.asarray(opengl_to_opencv(pose, scale=0.33, offset=[0.5, 0.5, 0.5]))
    # columns 1,2 negated; translation scaled+offset; rows cycled [1,2,0]
    expect = np.array(
        [
            [0, -1, 0, 2 * 0.33 + 0.5],
            [0, 0, -1, 3 * 0.33 + 0.5],
            [1, 0, 0, 1 * 0.33 + 0.5],
        ],
        dtype=np.float32,
    )
    np.testing.assert_allclose(out, expect, atol=1e-6)


def test_pixel_to_rays_center_points_along_view():
    cam = np.eye(3, 4, dtype=np.float32)  # view dir = +z col(2)
    o, d = pixel_to_rays(
        jnp.array([[0.5, 0.5]]),
        resolution=(100, 100),
        focal_length=(100.0, 100.0),
        principal_point=(0.5, 0.5),
        camera_matrix=jnp.asarray(cam),
    )
    np.testing.assert_allclose(np.asarray(d)[0], [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(o)[0], [0, 0, 0], atol=1e-6)


def test_aabb_scene_and_intersect():
    box = AABB.scene(1)
    assert box.lo == (0.0, 0.0, 0.0) and box.hi == (1.0, 1.0, 1.0)
    o = jnp.array([[0.5, 0.5, -1.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    tmin, tmax = box.ray_intersect(o, d)
    np.testing.assert_allclose(tmin, [1.0], atol=1e-6)
    np.testing.assert_allclose(tmax, [2.0], atol=1e-6)
    # miss
    tmin, tmax = box.ray_intersect(jnp.array([[5.0, 5.0, -1.0]]), d)
    assert float(tmin[0]) > float(tmax[0])
    # contains
    assert bool(box.contains(jnp.array([0.5, 0.5, 0.5])))
    assert not bool(box.contains(jnp.array([1.5, 0.5, 0.5])))


def test_warps():
    box = AABB.scene(2)  # [-0.5, 1.5]^3
    p = jnp.array([0.25, 0.5, 1.0])
    w = warp_position(p, box)
    np.testing.assert_allclose(unwarp_position(w, box), p, atol=1e-6)
    np.testing.assert_allclose(warp_direction(jnp.array([-1.0, 0.0, 1.0])), [0.0, 0.5, 1.0])
    # dt warp: n_cascades=2 => range [min, 2*min]
    assert float(warp_dt(0.001, 0.001, 2)) == 0.0
    np.testing.assert_allclose(float(unwarp_dt(1.0, 0.001, 2)), 0.002, rtol=1e-6)


def test_morton_roundtrip():
    rng = np.random.default_rng(0)
    xyz = rng.integers(0, 128, size=(64, 3)).astype(np.uint32)
    code = morton3d(xyz[:, 0], xyz[:, 1], xyz[:, 2])
    x, y, z = morton3d_decode(code)
    np.testing.assert_array_equal(np.asarray(x), xyz[:, 0])
    np.testing.assert_array_equal(np.asarray(y), xyz[:, 1])
    np.testing.assert_array_equal(np.asarray(z), xyz[:, 2])
    # known value: (1,1,1) -> 0b111
    assert int(morton3d(jnp.uint32(1), jnp.uint32(1), jnp.uint32(1))) == 7


def test_sobol_first_dims():
    # dim 0 is van der Corput: index 1 -> 0.5, 2 -> 0.25, 3 -> 0.75
    vals = np.asarray(sobol(jnp.arange(1, 4, dtype=jnp.uint32), 0)) / 2**32
    np.testing.assert_allclose(vals, [0.5, 0.25, 0.75])
    vals2 = np.asarray(sobol(jnp.arange(1, 4, dtype=jnp.uint32), 1)) / 2**32
    np.testing.assert_allclose(vals2, [0.5, 0.75, 0.25])


def test_ld_pixel_offset_spp0_is_center():
    off = np.asarray(ld_random_pixel_offset(0))
    np.testing.assert_allclose(off, [0.5, 0.5], atol=1e-7)
    # different spp give different, in-range offsets
    off1 = np.asarray(ld_random_pixel_offset(1))
    assert ((0 <= off1) & (off1 < 1)).all() and not np.allclose(off1, off)
    v = np.asarray(ld_random_val(jnp.arange(16, dtype=jnp.uint32), 7))
    assert ((0 <= v) & (v < 1)).all() and len(np.unique(v)) > 8


def test_commented_json():
    doc = parse_commented_json('{ // hi\n "a": 1, /* block */ "b": "x//y" }')
    assert doc == {"a": 1, "b": "x//y"}


def test_config_defaults_and_base_json():
    cfg = NGPConfig.from_json({})
    s = cfg.sampler
    assert s.n_cascades == 2  # minimum is 2 even for aabb_scale=1
    np.testing.assert_allclose(s.min_cone_stepsize, np.sqrt(3) / 1024)
    np.testing.assert_allclose(s.max_cone_stepsize, np.sqrt(3) * 2 / 128)
    assert cfg.loss == "SmoothL1"
    assert cfg.optimizer.adam.learning_rate == 1e-2 and cfg.optimizer.ema_decay == 0.95

    # the reference base.json parses with the typo'd "samlper" key honored
    base = {
        "samlper": {"aabb_scale": 4, "ema_decay": 0.9},
        "network": {"encoding": {"n_levels": 8, "log2_hashmap_size": 15}, "dir_encoding": {"degree": 3}},
        "loss": "L2",
        "optimizer": {"otype": "Ema", "decay": 0.5, "nested": {"otype": "ExponentialDecay", "decay_start": 100, "nested": {"otype": "Adam", "learning_rate": 0.5}}},
    }
    cfg = NGPConfig.from_json(base)
    assert cfg.sampler.aabb_scale == 4 and cfg.sampler.n_cascades == 3
    assert cfg.network.encoding.n_levels == 8 and cfg.network.sh_degree == 3
    assert cfg.optimizer.ema_decay == 0.5 and cfg.optimizer.decay_start == 100
    assert cfg.optimizer.adam.learning_rate == 0.5


def test_envmap_config_roundtrip():
    """The shipped base.json's envmap optimizer subtree parses to EXACTLY the
    built-in EnvmapConfig defaults (reference base.json:70-97); likewise for
    the reference's own base.json when it is available on disk."""
    import os

    repo_base = os.path.join(
        os.path.dirname(__file__), "..", "experiment", "nerf_synthetic", "config", "base.json"
    )
    cfg = NGPConfig.from_file(repo_base)
    assert cfg.envmap == NGPConfig.from_json({}).envmap
    e = cfg.envmap.optimizer
    assert (e.ema_decay, e.decay_start, e.decay_interval) == (0.99, 10000, 5000)
    assert (e.adam.epsilon, e.adam.l2_reg) == (1e-10, 1e-10)

    ref_base = "/root/reference/experiment/nerf_synthetic/config/base.json"
    if os.path.exists(ref_base):
        ref_cfg = NGPConfig.from_file(ref_base)
        assert ref_cfg.envmap == NGPConfig.from_json({}).envmap


def test_hash_grid_param_derivation():
    enc = NGPConfig.from_json({}).network.encoding
    # per_level_scale = exp(ln(2048/16)/15) (ngp_network.h:625-630)
    np.testing.assert_allclose(enc.scale, np.exp(np.log(2048.0 / 16.0) / 15), rtol=1e-6)
    assert enc.n_output_dims == 32
