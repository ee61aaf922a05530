"""Shared-eval multi-spp rendering (render_frame n_spp>1, share_spp_evals).

The default n_spp>1 Shade path evaluates the network ONCE per occupied
lattice cell and derives every pass's samples by in-cell linear
interpolation at that pass's march-start jitter (renderer.py
make_round_shared) — n_spp x fewer network samples than the exact
virtual-ray path. These tests pin its contract:

 * it matches the exact per-pass-eval path closely (the hash encoding is
   piecewise-trilinear, so the in-cell lerp is near-exact by construction);
 * the passes genuinely differ (it is NOT an spp-1 shortcut);
 * non-Shade modes and n_spp=1 are untouched by the flag.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ngp_tpu.models.ngp import NGPModel
from ngp_tpu.render.renderer import Renderer
from ngp_tpu.utils.config import NGPConfig


@pytest.fixture(scope="module")
def rough():
    """Small model with deliberately ROUGH sigma/rgb fields (scaled-up hash
    features) so the interpolation is actually stressed."""
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
    params["hash_table"] = params["hash_table"] * 600.0
    w_last = params["density_mlp"][-1]
    params["density_mlp"][-1] = w_last.at[:, 0].set(jnp.abs(w_last[:, 0]) + 0.3)
    g = config.sampler.grid_size
    rng = np.random.default_rng(11)
    occ0 = rng.random((g, g, g)) < 0.05
    occ0[10:20, 10:20, 10:20] = True
    occ = jnp.asarray(np.stack([occ0] * config.sampler.n_cascades))
    return config, model, params, occ


def _cam():
    cam = np.zeros((3, 4), np.float32)
    cam[:, 0] = [1, 0, 0]
    cam[:, 1] = [0, 1, 0]
    cam[:, 2] = [0, 0, 1]
    cam[:, 3] = [0.5, 0.5, -0.6]
    return cam


RES, FL = (32, 32), (40.0, 40.0)


def test_shared_matches_exact_multispp(rough):
    config, model, params, occ = rough
    shared = np.asarray(
        Renderer(model=model, config=config, share_spp_evals=True).render_frame(
            params, occ, _cam(), RES, FL, (0.5, 0.5), 0, n_spp=4
        )
    )
    exact = np.asarray(
        Renderer(model=model, config=config, share_spp_evals=False).render_frame(
            params, occ, _cam(), RES, FL, (0.5, 0.5), 0, n_spp=4
        )
    )
    assert np.isfinite(shared).all()
    # measured on this rough field: mean ~4e-6, max ~6e-5 (the lerp rides the
    # encoding's own piecewise linearity); leave an order of headroom
    assert np.abs(shared - exact).mean() < 5e-4
    assert np.abs(shared - exact).max() < 5e-3


def test_shared_passes_differ(rough):
    """The shared frame is a real multi-jitter composite, not pass 0 alone."""
    config, model, params, occ = rough
    r = Renderer(model=model, config=config, share_spp_evals=True)
    shared = np.asarray(r.render_frame(params, occ, _cam(), RES, FL, (0.5, 0.5), 0, n_spp=4))
    pass0 = np.asarray(r.render_frame(params, occ, _cam(), RES, FL, (0.5, 0.5), 0))
    assert np.abs(shared - pass0).max() > 1e-4


def test_shared_flag_leaves_spp1_and_depth_untouched(rough):
    config, model, params, occ = rough
    r1 = Renderer(model=model, config=config, share_spp_evals=True)
    r0 = Renderer(model=model, config=config, share_spp_evals=False)
    for kwargs in (dict(), dict(render_mode="Depth", n_spp=4)):
        a = np.asarray(r1.render_frame(params, occ, _cam(), RES, FL, (0.5, 0.5), 0, **kwargs))
        b = np.asarray(r0.render_frame(params, occ, _cam(), RES, FL, (0.5, 0.5), 0, **kwargs))
        np.testing.assert_array_equal(a, b)


def test_shared_srgb_accum_space(rough):
    """accum_space='srgb' (the eval protocol's to_srgb path) stays close to
    the exact path there too."""
    config, model, params, occ = rough
    a = np.asarray(
        Renderer(model=model, config=config, share_spp_evals=True).render_frame(
            params, occ, _cam(), RES, FL, (0.5, 0.5), 0, n_spp=4, accum_space="srgb"
        )
    )
    b = np.asarray(
        Renderer(model=model, config=config, share_spp_evals=False).render_frame(
            params, occ, _cam(), RES, FL, (0.5, 0.5), 0, n_spp=4, accum_space="srgb"
        )
    )
    assert np.abs(a - b).max() < 5e-3
