"""Single-chip vs DP-mesh equivalence (SURVEY §7 build order 7: "verify
bitwise-identical loss vs. 1-chip at same global batch").

Exactness story: training-ray draws (pixel xy, march-start jitter) and the
grid sampler's candidate cells are PARTITION-INVARIANT by construction —
counter-based pcg4d hashes over the GLOBAL ray/sample index with
chip-independent salts (sampling/training.py, grid/occupancy.py), and both
the single-chip step (trainer.py) and the DP step (parallel/mesh.py) derive
their keys with the same `split(rng, 3)`. So an N-chip mesh generates the
EXACT global ray set of the 1-chip step; the remaining differences are
floating-point reduction order (psum of per-chip partial sums vs one global
sum; segment-summed hash grads accumulate in different orders), which is why
the trajectory assertions use tolerances rather than bitwise equality.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ngp_tpu.data.nerf_synthetic import load_nerf_synthetic
from ngp_tpu.data.synthetic import write_synthetic_dataset
from ngp_tpu.grid.occupancy import mark_untrained_grid, sample_grid_positions
from ngp_tpu.sampling.lattice import n_lattice_points
from ngp_tpu.sampling.training import generate_training_batch
from ngp_tpu.train.trainer import Trainer
from ngp_tpu.utils.config import NGPConfig

TINY = {
    "samlper": {"grid_size": 16, "maximum_marching_steps": 128},
    "network": {
        "encoding": {"n_levels": 4, "log2_hashmap_size": 12, "base_resolution": 8, "desired_resolution": 64},
        "network": {"n_neurons": 64, "n_hidden_layers": 1},
        "dir_encoding": {"degree": 4},
        "rgb_network": {"n_neurons": 64, "n_hidden_layers": 2},
    },
}


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    d = tmp_path_factory.mktemp("scene")
    write_synthetic_dataset(d, n_train=3, n_test=1, width=48, height=48)
    return d / "transforms_train.json"


@pytest.fixture(scope="module")
def setup(scene):
    ds = load_nerf_synthetic(scene)
    cfg = NGPConfig.from_json(TINY)
    trainer = Trainer.create(cfg)
    trainer.sample_capacity = 1 << 17
    state = trainer.init_state(0)
    density = mark_untrained_grid(cfg.sampler, ds.resolution, ds.focal_length, ds.xforms)
    state = state._replace(grid=state.grid._replace(density=density))
    return ds, cfg, trainer, state


def test_training_batch_partition_invariant(setup):
    """8 shard calls with global offsets reproduce the 1-chip batch exactly."""
    ds, cfg, trainer, state = setup
    key = jax.random.PRNGKey(7)
    R, n_dev = 1024, 8
    n_lat = n_lattice_points(cfg.sampler)
    common = dict(
        cfg=cfg.sampler, aabb=trainer.aabb, images=ds.images, xforms=ds.xforms,
        focal_length=jnp.asarray(ds.focal_length), principal_point=(0.5, 0.5),
        occupancy=state.grid.occupancy, key=key, n_rays_shift=jnp.uint32(0),
        n_lattice=n_lat, s_pad=128, occ_aabb=state.grid.occ_aabb,
    )
    full = generate_training_batch(n_rays=R, capacity=R * 128, stride_denom=R, **common)
    for a in range(n_dev):
        part = generate_training_batch(
            n_rays=R // n_dev, capacity=(R // n_dev) * 128,
            stride_denom=R, index_offset=a * (R // n_dev), **common,
        )
        sl = slice(a * (R // n_dev), (a + 1) * (R // n_dev))
        np.testing.assert_array_equal(np.asarray(part.rays_o), np.asarray(full.rays_o[sl]))
        np.testing.assert_array_equal(np.asarray(part.rays_d), np.asarray(full.rays_d[sl]))
        np.testing.assert_array_equal(np.asarray(part.rgba), np.asarray(full.rgba[sl]))
        np.testing.assert_array_equal(np.asarray(part.ray_valid), np.asarray(full.ray_valid[sl]))
        # per-ray compacted sample counts identical (no budget drops at this
        # ample capacity)
        np.testing.assert_array_equal(
            np.asarray(part.layout.counts), np.asarray(full.layout.counts[sl])
        )


def test_grid_sampler_partition_invariant(setup):
    """Offset slices of the grid-sampler candidate set == the global set."""
    ds, cfg, trainer, state = setup
    key = jax.random.PRNGKey(3)
    NU = NN = 2048
    n_dev = 8
    pos, idx = sample_grid_positions(cfg.sampler, state.grid.density, key, NU, NN, 5)
    parts_pos, parts_idx = [], []
    for a in range(n_dev):
        p, ix = sample_grid_positions(
            cfg.sampler, state.grid.density, key, NU // n_dev, NN // n_dev, 5,
            uniform_offset=a * (NU // n_dev),
            nonuniform_offset=NU + a * (NN // n_dev),
            n_total_global=NU + NN,
        )
        parts_pos.append(np.asarray(p))
        parts_idx.append(np.asarray(ix))
    # global layout is [all uniform; all nonuniform]; chips hold [u_a; n_a]
    got_pos = np.concatenate(
        [p[: NU // n_dev] for p in parts_pos] + [p[NU // n_dev:] for p in parts_pos]
    )
    got_idx = np.concatenate(
        [ix[: NU // n_dev] for ix in parts_idx] + [ix[NU // n_dev:] for ix in parts_idx]
    )
    np.testing.assert_array_equal(got_idx, np.asarray(idx))
    np.testing.assert_array_equal(got_pos, np.asarray(pos))


def test_dp_loss_trajectory_matches_single_chip(setup):
    """K steps, same seed: 8-chip global batch reproduces the 1-chip loss
    trajectory and parameter state within reduction-order tolerance."""
    from ngp_tpu.parallel.mesh import make_dp_train_step, make_mesh

    assert len(jax.devices()) == 8, "conftest must provide 8 fake devices"
    ds, cfg, trainer, state0 = setup
    R, CAP, S_PAD, K = 1024, 1 << 17, 128, 5
    fl = jnp.asarray(ds.focal_length)

    step1 = jax.jit(trainer._train_step_fn(R, CAP, S_PAD, remat_heads=False))
    step8 = make_dp_train_step(trainer, make_mesh(), n_rays_global=R, capacity=CAP, s_pad=S_PAD)

    losses1, losses8 = [], []
    s1 = s8 = jax.device_put(state0)
    for i in range(K):
        shift = jnp.uint32(i * R)
        s1, st1 = step1(s1, ds.images, ds.xforms, fl, shift)
        s8, st8 = step8(s8, ds.images, ds.xforms, fl, shift)
        losses1.append(float(st1["loss_sum"]))
        losses8.append(float(st8["loss_sum"]))
        # the global sample sets are identical -> identical measured sizes
        assert int(st1["measured_batch_size"]) == int(st8["measured_batch_size"])
        assert int(st1["max_ray_count"]) == int(st8["max_ray_count"])
    np.testing.assert_allclose(losses8, losses1, rtol=2e-4)
    # parameter state stays within float accumulation-order drift after K steps
    p1 = jax.tree.leaves(s1.params)
    p8 = jax.tree.leaves(s8.params)
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-4, rtol=5e-4)


def test_dp_grid_update_rejects_indivisible_counts(setup):
    """A floored per-chip split would shrink the union of candidate sets and
    silently break partition invariance — it must raise instead."""
    from ngp_tpu.parallel.mesh import make_dp_grid_update, make_mesh

    _, _, trainer, _ = setup
    mesh = make_mesh()  # 8 virtual CPU devices (conftest)
    with pytest.raises(ValueError, match="divisible"):
        make_dp_grid_update(trainer, mesh, n_uniform=1001, n_nonuniform=0)
    with pytest.raises(ValueError, match="divisible"):
        make_dp_grid_update(trainer, mesh, n_uniform=1024, n_nonuniform=12)
