"""Packed-neighborhood march: exact equivalence with the per-point march.

The packed path (grid/occupancy.packed_neighborhood + one uint32 gather per
8-step lattice chunk, sampling/lattice._packed_group_occ) must reproduce the
plain occupancy_lookup march BIT-EXACTLY — it is a row-count optimization,
not an approximation (coverage bound: every chunk point's cell is within one
cell of the chunk midpoint's per axis when 3.5*dt*G <= 1; reference march
semantics at occupancy_sampler.cu:389-407).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ngp_tpu.grid.occupancy import (
    occupancy_lookup,
    packed_chunk_lookup,
    packed_neighborhood,
)
from ngp_tpu.sampling.lattice import (
    count_samples,
    count_samples_segments,
    occupied_window_start,
    packed_march_supported,
)
from ngp_tpu.utils.aabb import AABB
from ngp_tpu.utils.config import SamplerConfig


def _cfg(g=128, max_steps=1024):
    return SamplerConfig(grid_size=g, maximum_marching_steps=max_steps)


def _random_grid(cfg, key, p=0.15):
    g = cfg.grid_size
    occ = jax.random.uniform(key, (cfg.n_cascades, g, g, g)) < p
    return occ


def _random_rays(key, n):
    k1, k2, k3 = jax.random.split(key, 3)
    # origins around/inside the unit cube, unit directions
    o = jax.random.uniform(k1, (n, 3), minval=-0.6, maxval=1.6)
    d = jax.random.normal(k2, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    startt = jax.random.uniform(k3, (n,), minval=0.0, maxval=0.3)
    return o, d, startt


def test_supported_gate():
    assert packed_march_supported(_cfg(128))  # 3.5*sqrt(3)/1024*128 = 0.76
    assert packed_march_supported(_cfg(16))
    # a grid too fine for the 8-step chunk extent must NOT take the path
    assert not packed_march_supported(_cfg(1024))
    assert not packed_march_supported(SamplerConfig(aabb_scale=2, grid_size=128))


def test_packed_chunk_lookup_matches_pointwise():
    cfg = _cfg(64)
    key = jax.random.PRNGKey(0)
    occ = _random_grid(cfg, key, p=0.3)
    packed = packed_neighborhood(cfg, occ)
    dt = cfg.min_cone_stepsize
    # random chunk midpoints including out-of-box ones; points on a straight
    # line through the midpoint at offsets <= 3.5*dt (the march geometry)
    k1, k2 = jax.random.split(key)
    mid = jax.random.uniform(k1, (4096, 3), minval=-0.2, maxval=1.2)
    d = jax.random.normal(k2, (4096, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    offs = (jnp.arange(8, dtype=jnp.float32) - 3.5) * dt
    pos = mid[:, None, :] + offs[None, :, None] * d[:, None, :]
    got = packed_chunk_lookup(cfg, packed, mid, pos)
    want = occupancy_lookup(cfg, occ, pos, jnp.zeros(pos.shape[:-1], jnp.int32))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("g, max_steps", [(32, 256), (128, 1024)])
def test_count_samples_packed_exact(g, max_steps):
    cfg = _cfg(g, max_steps=max_steps)
    assert packed_march_supported(cfg)
    aabb = AABB.scene(cfg.aabb_scale)
    key = jax.random.PRNGKey(g)
    occ = _random_grid(cfg, key)
    packed = packed_neighborhood(cfg, occ)
    o, d, startt = _random_rays(jax.random.PRNGKey(g + 1), 512)
    n_window = 512
    c0, m0 = count_samples(cfg, aabb, occ, o, d, startt, n_window, return_masks=True)
    c1, m1 = count_samples(
        cfg, aabb, occ, o, d, startt, n_window, return_masks=True, packed=packed
    )
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    np.testing.assert_array_equal(np.asarray(m0), np.asarray(m1))


def test_count_samples_packed_exact_with_k0():
    cfg = _cfg(128, max_steps=1024)
    assert packed_march_supported(cfg)
    aabb = AABB.scene(cfg.aabb_scale)
    key = jax.random.PRNGKey(7)
    occ = _random_grid(cfg, key, p=0.05)
    packed = packed_neighborhood(cfg, occ)
    o, d, startt = _random_rays(jax.random.PRNGKey(8), 512)
    from ngp_tpu.sampling.lattice import n_lattice_points

    n_lat = n_lattice_points(cfg)
    box = jnp.stack([jnp.full((3,), 0.25), jnp.full((3,), 0.8)])
    k0 = occupied_window_start(box, o, d, startt, cfg.min_cone_stepsize, n_lat)
    c0, m0 = count_samples(cfg, aabb, occ, o, d, startt, 1024, return_masks=True, k0=k0)
    c1, m1 = count_samples(
        cfg, aabb, occ, o, d, startt, 1024, return_masks=True, k0=k0, packed=packed
    )
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    np.testing.assert_array_equal(np.asarray(m0), np.asarray(m1))


def test_count_samples_segments_packed_exact():
    cfg = _cfg(64, max_steps=512)
    assert packed_march_supported(cfg)
    aabb = AABB.scene(cfg.aabb_scale)
    key = jax.random.PRNGKey(3)
    occ = _random_grid(cfg, key, p=0.1)
    packed = packed_neighborhood(cfg, occ)
    o, d, startt = _random_rays(jax.random.PRNGKey(4), 256)
    k0 = jnp.zeros((256,), jnp.int32)
    # arbitrary ascending segment lists incl. padding sentinels
    n_seg, C = 64, 24
    ks = jax.random.split(jax.random.PRNGKey(5), 1)[0]
    keep = jax.random.uniform(ks, (256, n_seg)) < 0.4
    j = jnp.arange(n_seg, dtype=jnp.int32)[None, :]
    seg_idx = jax.lax.sort(jnp.where(keep, j, jnp.int32(n_seg)), dimension=1)[:, :C]
    r0 = count_samples_segments(cfg, aabb, occ, o, d, startt, k0, seg_idx)
    r1 = count_samples_segments(cfg, aabb, occ, o, d, startt, k0, seg_idx, packed=packed)
    for a, b in zip(r0, r1, strict=True):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_training_batch_unchanged_by_packed(monkeypatch):
    """generate_training_batch produces the identical batch with the packed
    march disabled (the packed path is enabled by default when supported)."""
    from ngp_tpu.sampling import training as tr

    cfg = _cfg(32, max_steps=256)
    aabb = AABB.scene(cfg.aabb_scale)
    key = jax.random.PRNGKey(11)
    occ = _random_grid(cfg, key, p=0.2)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (3, 16, 16, 4)), jnp.float16)
    xf = np.zeros((3, 3, 4), np.float32)
    xf[:, :, :3] = np.eye(3)
    xf[:, 2, 3] = -1.0
    xforms = jnp.asarray(xf)

    def gen():
        return tr.generate_training_batch(
            cfg, aabb, images, xforms, (16.0, 16.0), (0.5, 0.5), occ,
            jax.random.PRNGKey(2), n_rays=128, n_rays_shift=jnp.uint32(0),
            capacity=4096, n_lattice=2048, s_pad=128,
        )

    assert packed_march_supported(cfg)
    b1 = gen()
    monkeypatch.setattr(tr, "packed_march_supported", lambda _cfg: False)
    b0 = gen()
    for a, b in zip(
        jax.tree_util.tree_leaves(b0), jax.tree_util.tree_leaves(b1), strict=True
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
