"""Segment-march (coarse super-occupancy premask) correctness.

The two-level march must produce EXACTLY the full-window march's sample set
(grid/occupancy.pooled_occupancy docstring): the dilated pooled grid is a
conservative superset, and the fine phase re-tests survivors with the same
occupancy/AABB/cap rules as sampling/lattice.count_samples.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ngp_tpu.grid.occupancy import pooled_occupancy
from ngp_tpu.sampling.lattice import (
    coarse_segment_mask,
    count_samples,
    count_samples_segments,
    n_lattice_points,
    segments_supported,
)
from ngp_tpu.utils.aabb import AABB
from ngp_tpu.utils.config import NGPConfig


@pytest.fixture(scope="module")
def setup():
    config = NGPConfig.from_json({})
    scfg = config.sampler
    assert segments_supported(scfg)
    rng = np.random.default_rng(7)
    g = scfg.grid_size
    # sparse random occupancy with a few dense blobs; cascades built with
    # update_occupancy's invariant (coarser contains the pooled finer in its
    # central octant) which coarse_segment_mask relies on
    occ0 = rng.random((g, g, g)) < 0.01
    for _ in range(4):
        c = rng.integers(8, g - 8, 3)
        occ0[c[0] - 4 : c[0] + 4, c[1] - 4 : c[1] + 4, c[2] - 4 : c[2] + 4] = True
    levels = [occ0]
    for _ in range(1, scfg.n_cascades):
        fine = levels[-1]
        pooled2 = fine.reshape(g // 2, 2, g // 2, 2, g // 2, 2).any(axis=(1, 3, 5))
        nxt = rng.random((g, g, g)) < 0.002
        q = g // 4
        nxt[q : 3 * q, q : 3 * q, q : 3 * q] |= pooled2
        levels.append(nxt)
    occ = jnp.asarray(np.stack(levels))
    R = 256
    o = np.full((R, 3), 0.5, np.float32) + rng.uniform(-0.45, 0.45, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    # some rays start outside the box
    o[: R // 4] = o[: R // 4] - d[: R // 4] * 1.5
    startt = rng.uniform(0.0, scfg.min_cone_stepsize, R).astype(np.float32)
    return config, occ, jnp.asarray(o), jnp.asarray(d), jnp.asarray(startt)


def test_segment_march_equals_full_march(setup):
    config, occ, o, d, startt = setup
    scfg = config.sampler
    aabb = AABB.scene(scfg.aabb_scale)
    n_lat = n_lattice_points(scfg)
    n_window = n_lat
    R = o.shape[0]
    k0 = jnp.zeros((R,), jnp.int32)

    counts_ref, masks_ref = count_samples(
        scfg, aabb, occ, o, d, startt, n_window, return_masks=True, k0=k0
    )

    pooled = pooled_occupancy(scfg, occ)
    n_seg = n_window // 8
    cmask = coarse_segment_mask(scfg, pooled, o, d, startt, n_seg, k0)

    # conservativeness: every occupied fine sample's segment is coarse-kept
    fine_by_seg = np.asarray(masks_ref).reshape(R, n_seg, 8).any(axis=2)
    assert not np.any(fine_by_seg & ~np.asarray(cmask)), "coarse mask lost an occupied segment"

    # compacted segment list (same construction as the renderer's _coarse_pass)
    j = jnp.arange(n_seg, dtype=jnp.int32)[None, :]
    keys = jnp.where(cmask, j, jnp.int32(n_seg))
    seg_sorted = jax.lax.sort(keys, dimension=1)
    C = int(np.asarray(jnp.sum(cmask, axis=1)).max())
    counts_seg, masks_seg, lat = count_samples_segments(
        scfg, aabb, occ, o, d, startt, k0, seg_sorted[:, :C]
    )

    np.testing.assert_array_equal(np.asarray(counts_seg), np.asarray(counts_ref))

    # the sample SETS match: compare the sorted occupied lattice ordinals
    iota = np.arange(n_window, dtype=np.int32)[None, :]
    ref_sets = np.where(np.asarray(masks_ref), iota, n_window)
    ref_sets.sort(axis=1)
    seg_sets = np.where(np.asarray(masks_seg), np.asarray(lat), n_window)
    seg_sets.sort(axis=1)
    w = min(ref_sets.shape[1], seg_sets.shape[1])
    np.testing.assert_array_equal(seg_sets[:, :w], ref_sets[:, :w])
    assert np.all(ref_sets[:, w:] == n_window)


def test_render_tile_segment_mode_matches_legacy(setup):
    from ngp_tpu.models.ngp import NGPModel
    from ngp_tpu.render.renderer import _render_tile_impl

    config, occ, o, d, startt = setup
    scfg = config.sampler
    n_window = n_lattice_points(scfg)
    R = o.shape[0]
    k0 = jnp.zeros((R,), jnp.int32)

    model = NGPModel.create(config.network)
    params = model.init(jax.random.PRNGKey(0))
    # push densities up so rays actually composite: make the density output
    # channel a positive combination of the (ReLU, hence >=0) hidden acts
    w_last = params["density_mlp"][-1]
    params["density_mlp"][-1] = w_last.at[:, 0].set(jnp.abs(w_last[:, 0]) + 0.3)

    pooled = pooled_occupancy(scfg, occ)
    n_seg = n_window // 8
    # align the coarse pass to the tile's own march origin (max(entry, 0.05),
    # renderer.py _render_tile_impl) exactly as _frame_geometry does; the
    # remaining per-spp jitter (< dt) is absorbed by the pooled halo
    aabb = AABB.scene(scfg.aabb_scale)
    tmin, _ = aabb.ray_intersect(o, d)
    t00 = jnp.maximum(tmin, 0.05) + 1e-6
    cmask = coarse_segment_mask(scfg, pooled, o, d, t00, n_seg, k0)
    j = jnp.arange(n_seg, dtype=jnp.int32)[None, :]
    seg_sorted = jax.lax.sort(jnp.where(cmask, j, jnp.int32(n_seg)), dimension=1)
    C = int(np.asarray(jnp.sum(cmask, axis=1)).max())

    common = dict(
        render_mode="Shade",
        n_window=n_window,
        n_rounds_max=int(np.ceil(R * n_window / (1 << 17))) + n_window // 16 + 4,
    )
    args = (
        model, config, params, occ, o, d, k0,
        jnp.arange(R, dtype=jnp.int32), jnp.ones((R,), bool), jnp.uint32(0),
        jnp.asarray([0.0, 0.0, 1.0], jnp.float32), jnp.asarray([0.5, 0.5, -1.0], jnp.float32),
        jnp.float32(1.0),
    )
    legacy = jax.jit(
        lambda: _render_tile_impl(*args, **common)
    )()
    seg = jax.jit(
        lambda: _render_tile_impl(*args, **common, seg_idx=seg_sorted[:, :C])
    )()
    np.testing.assert_allclose(np.asarray(seg), np.asarray(legacy), rtol=2e-5, atol=2e-6)
