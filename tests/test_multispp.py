"""Multi-spp batched rendering (shared jitter-cover march).

render_frame(n_spp=k) must reproduce the sequential protocol — k
render_frame passes fed through render/buffer.accumulate — exactly on a
grid where the cover mask adds nothing (dense occupancy), and the cover
mask itself must be a SUPERSET of every pass's exact mask on any grid
(sampling/lattice.count_samples_segments jitter_cover contract).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ngp_tpu.grid.occupancy import packed_neighborhood, pooled_occupancy
from ngp_tpu.models.ngp import NGPModel
from ngp_tpu.render.buffer import accumulate
from ngp_tpu.render.renderer import Renderer
from ngp_tpu.sampling.lattice import (
    coarse_segment_mask,
    count_samples,
    count_samples_segments,
    jitter_cover_supported,
    n_lattice_points,
)
from ngp_tpu.utils.aabb import AABB
from ngp_tpu.utils.config import NGPConfig
from ngp_tpu.utils.qmc import ld_random_val


@pytest.fixture(scope="module")
def small():
    config = NGPConfig.from_json(
        {
            "samlper": {"aabb_scale": 1, "grid_size": 64, "maximum_marching_steps": 512},
            "network": {
                "encoding": {"n_levels": 4, "log2_hashmap_size": 12, "base_resolution": 8, "desired_resolution": 64},
                "network": {"n_neurons": 16, "n_hidden_layers": 1},
                "dir_encoding": {"degree": 2},
                "rgb_network": {"n_neurons": 16, "n_hidden_layers": 1},
            },
        }
    )
    model = NGPModel.create(config.network)
    params = model.init(jax.random.PRNGKey(0))
    w_last = params["density_mlp"][-1]
    params["density_mlp"][-1] = w_last.at[:, 0].set(jnp.abs(w_last[:, 0]) + 0.3)
    return config, model, params


def _cam():
    cam = np.zeros((3, 4), np.float32)
    cam[:, 0] = [1, 0, 0]
    cam[:, 1] = [0, 1, 0]
    cam[:, 2] = [0, 0, 1]
    cam[:, 3] = [0.5, 0.5, -0.6]
    return cam


def test_cover_mask_superset(small):
    """Shared-march mask covers the exact mask of every jitter in [0, dt)."""
    config, _, _ = small
    scfg = config.sampler
    assert jitter_cover_supported(scfg)
    aabb = AABB.scene(scfg.aabb_scale)
    rng = np.random.default_rng(3)
    g = scfg.grid_size
    occ0 = rng.random((g, g, g)) < 0.03
    occ = jnp.asarray(np.stack([occ0] * scfg.n_cascades))
    packed = packed_neighborhood(scfg, occ)

    R = 128
    o = np.full((R, 3), 0.5, np.float32) + rng.uniform(-0.4, 0.4, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    t0 = jnp.zeros((R,), jnp.float32)
    k0 = jnp.zeros((R,), jnp.int32)
    n_window = 256
    dt = scfg.min_cone_stepsize

    _, cover, _ = count_samples_segments(
        scfg, aabb, occ, o, d, t0, k0,
        jnp.broadcast_to(jnp.arange(n_window // 8, dtype=jnp.int32)[None], (R, n_window // 8)),
        packed=packed, jitter_cover=True,
    )
    cover = np.asarray(cover)
    for frac in (0.0, 0.31, 0.77, 0.999):
        _, exact = count_samples(
            scfg, aabb, occ, o, d, t0 + frac * dt, n_window,
            return_masks=True, k0=k0, packed=packed,
        )
        missed = np.asarray(exact) & ~cover
        assert not missed.any(), f"cover mask lost samples at jitter {frac}"


def test_multispp_equals_sequential_dense_grid(small):
    """All-occupied grid: no superset slack, so n_spp=4 must equal the
    4-pass accumulate protocol to float tolerance, in both accum spaces."""
    config, model, params = small
    scfg = config.sampler
    g = scfg.grid_size
    occ = jnp.ones((scfg.n_cascades, g, g, g), bool)
    # exact per-pass evals: the shared-eval default interpolates between
    # lattice evals (tests/test_spp_share.py covers its tolerance contract)
    renderer = Renderer(model=model, config=config, share_spp_evals=False)
    assert renderer.can_batch_spp()
    cam = _cam()
    res = (32, 32)
    fl = (40.0, 40.0)

    for space in ("linear", "srgb"):
        batched = renderer.render_frame(
            params, occ, cam, res, fl, (0.5, 0.5), 0, n_spp=4, accum_space=space
        )
        seq_renderer = Renderer(model=model, config=config)
        accum = jnp.zeros((res[1], res[0], 4), jnp.float32)
        for s in range(4):
            frame = seq_renderer.render_frame(params, occ, cam, res, fl, (0.5, 0.5), s)
            accum = accumulate(accum, frame, s, space)
        np.testing.assert_allclose(
            np.asarray(batched), np.asarray(accum), rtol=2e-5, atol=2e-6,
            err_msg=f"accum_space={space}",
        )


def test_multispp_close_on_sparse_grid(small):
    """Sparse grid: the cover mask may add boundary samples (a strict
    superset of the reference's skip set), so the batched frame matches the
    sequential one approximately — and hits (opacity) only ever grow."""
    config, model, params = small
    scfg = config.sampler
    rng = np.random.default_rng(11)
    g = scfg.grid_size
    occ0 = rng.random((g, g, g)) < 0.05
    occ0[10:20, 10:20, 10:20] = True
    occ = jnp.asarray(np.stack([occ0] * scfg.n_cascades))
    renderer = Renderer(model=model, config=config)
    cam = _cam()
    res = (32, 32)
    fl = (40.0, 40.0)

    batched = np.asarray(
        renderer.render_frame(params, occ, cam, res, fl, (0.5, 0.5), 0, n_spp=4)
    )
    seq_renderer = Renderer(model=model, config=config)
    accum = jnp.zeros((res[1], res[0], 4), jnp.float32)
    for s in range(4):
        frame = seq_renderer.render_frame(params, occ, cam, res, fl, (0.5, 0.5), s)
        accum = accumulate(accum, frame, s, "linear")
    seq = np.asarray(accum)
    # the extra boundary samples carry the network's real density — tiny
    # contributions the reference's grid skip would have dropped
    assert np.mean(np.abs(batched - seq)) < 0.02
    assert np.max(np.abs(batched - seq)) < 0.25


def test_ld_jitter_streams_match(small):
    """The batched kernel's per-pass jitters are the sequential streams."""
    seeds = (jnp.arange(5, dtype=jnp.uint32) * jnp.uint32(786433))
    for s in range(4):
        a = ld_random_val(jnp.uint32(0) + jnp.uint32(s), seeds)
        b = ld_random_val(jnp.uint32(s), seeds)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
