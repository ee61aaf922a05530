"""t-lattice marching + training batch generation vs brute-force numpy."""

import jax
import jax.numpy as jnp
import numpy as np

from ngp_tpu.ops.layout import build_layout
from ngp_tpu.sampling.lattice import count_samples, n_lattice_points
from ngp_tpu.sampling.training import generate_training_batch
from ngp_tpu.utils.aabb import AABB
from ngp_tpu.utils.config import SamplerConfig


def _np_march(cfg, occ, o, d, startt, n_lattice):
    """Brute-force lattice march for one ray: returns occupied (pos, t) list."""
    dt = cfg.min_cone_stepsize
    g = cfg.grid_size
    out = []
    for i in range(n_lattice):
        t = startt + i * dt
        pos = o + t * d
        # reference semantics: the march loop ends at the first point outside
        # the box (startt is inside, so in-box points form a prefix)
        if not np.all((pos >= 0) & (pos <= 1)):
            break
        # mip
        maxval = np.max(np.abs(pos - 0.5))
        _, e = np.frexp(maxval) if maxval > 0 else (0.5, 0)
        mip = int(np.clip(e + 1, 0, cfg.n_cascades - 1))
        dscaled = dt * 2 * g
        if dscaled >= 1.0:
            _, e2 = np.frexp(dscaled)
            mip = max(mip, int(np.clip(e2, 0, cfg.n_cascades - 1)))
        # occupancy
        p = (pos - 0.5) * (2.0**-mip) + 0.5
        cell = np.clip(np.floor(p * g).astype(int), 0, g - 1)
        if occ[mip, cell[0], cell[1], cell[2]]:
            out.append((pos, t))
            if len(out) >= cfg.maximum_marching_steps:
                break
    return out


def test_lattice_march_matches_bruteforce():
    """count pass + sort compaction + layout bijection vs a per-ray loop."""
    cfg = SamplerConfig(grid_size=16, maximum_marching_steps=64)
    aabb = AABB.scene(1)
    rng = np.random.default_rng(11)
    occ = rng.uniform(size=(cfg.n_cascades, 16, 16, 16)) < 0.4
    n_lat = n_lattice_points(cfg)
    dt = cfg.min_cone_stepsize

    R, s_pad = 32, 64
    o = rng.uniform(-0.5, 0.0, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = np.abs(d)  # point toward the box
    startt = rng.uniform(0.3, 0.6, (R,)).astype(np.float32)

    counts, masks = count_samples(
        cfg, aabb, jnp.asarray(occ), jnp.asarray(o), jnp.asarray(d), jnp.asarray(startt), n_lat, return_masks=True
    )
    expected = [_np_march(cfg, occ, o[r], d[r], startt[r], n_lat) for r in range(R)]
    np.testing.assert_array_equal(np.asarray(counts), [len(e) for e in expected])

    # the compaction pipeline sampling/training.py runs inside the step
    cap = int(np.asarray(counts).sum() + 8)
    ray_valid = (counts > 0) & (counts <= s_pad)
    counts_res = jnp.where(ray_valid, counts, 0)
    base = jnp.cumsum(counts_res) - counts_res
    ray_valid = ray_valid & (base + counts_res <= cap)
    layout = build_layout(base, counts, ray_valid, cap, s_pad)
    keys = jnp.where(masks & ray_valid[:, None], jnp.arange(n_lat, dtype=jnp.int32)[None], jnp.int32(n_lat))
    lat_pad = jax.lax.sort(keys, dimension=1)[:, :s_pad]

    rid = np.asarray(layout.ray_ids)
    pir = np.asarray(layout.pos_in_ray)
    fvalid = np.asarray(layout.flat_valid)
    lat_np = np.asarray(lat_pad)
    base_np = np.asarray(base)
    for r in range(R):
        for j, (p, t) in enumerate(expected[r]):
            f = base_np[r] + j
            assert fvalid[f] and rid[f] == r and pir[f] == j
            li = lat_np[r, j]
            pos = o[r] + (startt[r] + li * dt) * d[r]
            np.testing.assert_allclose(pos, p, atol=1e-5)
    assert fvalid.sum() == np.asarray(counts).sum()


def test_generate_training_batch_shapes_and_consistency():
    cfg = SamplerConfig(grid_size=16, maximum_marching_steps=64, near_distance=0.05)
    aabb = AABB.scene(1)
    rng = np.random.default_rng(3)
    occ = jnp.ones((cfg.n_cascades, 16, 16, 16), bool)

    n_img, h, w = 3, 16, 16
    images = jnp.asarray(rng.uniform(0, 1, (n_img, h, w, 4)), jnp.float16)
    xf = np.zeros((n_img, 3, 4), np.float32)
    for i in range(n_img):
        xf[i, :, :3] = np.eye(3)
        xf[i, :, 3] = [0.5, 0.5, -1.5]  # looking +z into the box
    n_rays, cap, s_pad = 64, 4096, 64
    batch = generate_training_batch(
        cfg,
        aabb,
        images,
        jnp.asarray(xf),
        jnp.asarray([20.0, 20.0]),
        (0.5, 0.5),
        occ,
        jax.random.PRNGKey(0),
        n_rays,
        jnp.uint32(0),
        cap,
        n_lattice_points(cfg),
        s_pad,
    )
    layout = batch.layout
    counts = np.asarray(layout.counts)
    valid = np.asarray(layout.flat_valid)
    ray_ids = np.asarray(layout.ray_ids)
    base = np.asarray(layout.base)
    assert (counts > 0).any()
    assert valid.sum() == counts.sum() == int(batch.n_samples)
    assert int(batch.max_ray_count) == counts.max()
    # flat layout: ray r's samples at [base_r, base_r + count_r), contiguous
    for r in np.flatnonzero(np.asarray(batch.ray_valid))[:8]:
        seg = slice(base[r], base[r] + counts[r])
        assert valid[seg].all() and (ray_ids[seg] == r).all()
    # padded mask consistency
    pad_valid = np.asarray(layout.pad_valid)
    np.testing.assert_array_equal(pad_valid.sum(axis=1), counts)
    # network inputs are warped into [0,1] on valid slots
    pos = np.asarray(batch.pos)[valid]
    assert pos.min() >= -1e-5 and pos.max() <= 1.0 + 1e-5
    # rgba targets are finite premultiplied values in [0,1]
    rgba = np.asarray(batch.rgba)
    assert np.isfinite(rgba).all() and rgba.min() >= 0 and rgba.max() <= 1.0 + 1e-3


def test_overflow_rays_dropped():
    cfg = SamplerConfig(grid_size=16, maximum_marching_steps=64)
    aabb = AABB.scene(1)
    occ = jnp.ones((cfg.n_cascades, 16, 16, 16), bool)
    o = jnp.asarray(np.tile([[0.5, 0.5, -0.5]], (8, 1)), jnp.float32)
    d = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (8, 1)), jnp.float32)
    startt = jnp.full((8,), 0.5, jnp.float32)
    n_lat = n_lattice_points(cfg)
    counts = count_samples(cfg, aabb, occ, o, d, startt, n_lat)
    c = int(counts[0])
    assert c > 0
    cap = int(2.5 * c)  # room for 2 rays only
    base = jnp.cumsum(counts) - counts
    ray_valid = (counts > 0) & (base + counts <= cap)
    assert int(ray_valid.sum()) == 2
    layout = build_layout(base, counts, ray_valid, cap, 64)
    assert int(layout.flat_valid.sum()) == 2 * c
    # slots of dropped rays are holes, not reassigned
    assert int(layout.counts.sum()) == 2 * c


def test_occ_window_clip_is_exact():
    """Batch generation with the occupied-AABB window == full-lattice march
    (identical counts, sample positions, layout) on a sparse grid."""
    from ngp_tpu.data.synthetic import write_synthetic_dataset
    from ngp_tpu.grid.occupancy import occupied_aabb
    import tempfile
    from pathlib import Path

    cfg = SamplerConfig(grid_size=32, maximum_marching_steps=256)
    aabb = AABB.scene(1)
    rng = np.random.default_rng(5)
    # sparse occupancy confined to a sub-box
    occ = np.zeros((cfg.n_cascades, 32, 32, 32), bool)
    occ[0, 10:20, 8:18, 12:22] = rng.uniform(size=(10, 10, 10)) < 0.5
    occ[1, 12:18, 12:18, 12:18] = rng.uniform(size=(6, 6, 6)) < 0.3
    occ_j = jnp.asarray(occ)
    box = occupied_aabb(cfg, occ_j)

    n_lat = n_lattice_points(cfg)
    dt = cfg.min_cone_stepsize
    diag = float(np.linalg.norm(np.asarray(box)[1] - np.asarray(box)[0]))
    need = int(np.ceil(diag / dt)) + 2
    n_window = min(n_lat, max(128, 128 << int(np.ceil(np.log2(max(need / 128, 1))))))
    assert n_window < n_lat  # the clip actually shortens the scan

    with tempfile.TemporaryDirectory() as td:
        write_synthetic_dataset(Path(td), n_train=4, n_test=1, width=24, height=24)
        from ngp_tpu.data.nerf_synthetic import load_nerf_synthetic

        ds = load_nerf_synthetic(Path(td) / "transforms_train.json")
        kw = dict(
            images=ds.images, xforms=ds.xforms, focal_length=jnp.asarray(ds.focal_length),
            principal_point=(0.5, 0.5), occupancy=occ_j, key=jax.random.PRNGKey(3),
            n_rays=256, n_rays_shift=jnp.uint32(0), capacity=4096, n_lattice=n_lat, s_pad=256,
        )
        full = generate_training_batch(cfg, aabb, **kw)
        clip = generate_training_batch(cfg, aabb, **kw, occ_aabb=box, n_window=n_window)

    np.testing.assert_array_equal(np.asarray(full.layout.counts), np.asarray(clip.layout.counts))
    np.testing.assert_array_equal(np.asarray(full.ray_valid), np.asarray(clip.ray_valid))
    np.testing.assert_allclose(np.asarray(full.pos), np.asarray(clip.pos), atol=1e-6)
    assert int(full.n_samples) == int(clip.n_samples) and int(full.n_samples) > 0


def test_cone_lattice_matches_iterative_recurrence():
    """Closed-form lattice_t == the reference's per-step recurrence
    t' = t + clamp(c*t, m, M) (calc_dt, occupancy_sampler.cu:207-214),
    for c = 1/256 over a range of starts."""
    from ngp_tpu.sampling.lattice import lattice_dt, lattice_t

    cfg = SamplerConfig(cone_angle_constant=1.0 / 256.0, maximum_marching_steps=1024)
    m, M = cfg.min_cone_stepsize, cfg.max_cone_stepsize
    c = cfg.cone_angle_constant
    starts = np.array([0.01, 0.2, 0.433, 1.0, 3.0], np.float32)
    K = 400

    # iterative reference (float64 to isolate closed-form error)
    ref = np.zeros((len(starts), K))
    for r, t0 in enumerate(starts):
        t = float(t0)
        for i in range(K):
            ref[r, i] = t
            t = t + np.clip(c * t, m, M)

    got = np.asarray(lattice_t(cfg, jnp.asarray(starts)[:, None], jnp.arange(K, dtype=jnp.float32)[None, :]))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=1e-5)

    dts = np.asarray(lattice_dt(cfg, jnp.asarray(ref, jnp.float32)))
    np.testing.assert_allclose(dts, np.clip(c * ref, m, M), rtol=1e-6)


def test_cone_training_batch_runs():
    """c > 0 end-to-end batch generation: finite outputs, dt_pad populated."""
    from pathlib import Path
    import tempfile

    from ngp_tpu.data.nerf_synthetic import load_nerf_synthetic
    from ngp_tpu.data.synthetic import write_synthetic_dataset

    cfg = SamplerConfig(cone_angle_constant=1.0 / 256.0, grid_size=16, maximum_marching_steps=512)
    aabb = AABB.scene(1)
    occ = jnp.ones((cfg.n_cascades, 16, 16, 16), bool)
    n_lat = n_lattice_points(cfg)
    with tempfile.TemporaryDirectory() as td:
        write_synthetic_dataset(Path(td), n_train=2, n_test=1, width=16, height=16)
        ds = load_nerf_synthetic(Path(td) / "transforms_train.json")
        batch = generate_training_batch(
            cfg, aabb, ds.images, ds.xforms, jnp.asarray(ds.focal_length), (0.5, 0.5),
            occ, jax.random.PRNGKey(0), 64, jnp.uint32(0), 2048, n_lat, 128,
        )
    assert batch.dt_pad is not None and batch.dt_pad.shape == (64, 128)
    assert int(batch.n_samples) > 0
    assert np.isfinite(np.asarray(batch.pos)).all()
    d = np.asarray(batch.dt_pad)
    assert (d >= cfg.min_cone_stepsize - 1e-9).all() and (d <= cfg.max_cone_stepsize + 1e-9).all()


def test_count_at_split_honest_when_unbucketed():
    """With bucketing OFF but n_long > 0, count_at_split must report the
    (n_long+1)-th largest count (what the s_short controller would need),
    NOT max_ray_count — otherwise s_short pins to s_pad and the two-bucket
    composite can never re-engage (trainer.py s_short controller)."""
    cfg = SamplerConfig(grid_size=16, maximum_marching_steps=64, near_distance=0.05)
    aabb = AABB.scene(1)
    rng = np.random.default_rng(7)
    occ = jnp.ones((cfg.n_cascades, 16, 16, 16), bool)
    n_img, h, w = 3, 16, 16
    images = jnp.asarray(rng.uniform(0, 1, (n_img, h, w, 4)), jnp.float16)
    xf = np.zeros((n_img, 3, 4), np.float32)
    for i in range(n_img):
        xf[i, :, :3] = np.eye(3)
        xf[i, :, 3] = [0.5, 0.5, -1.5]
    kw = dict(
        images=images,
        xforms=jnp.asarray(xf),
        focal_length=jnp.asarray([20.0, 20.0]),
        principal_point=(0.5, 0.5),
        occupancy=occ,
        key=jax.random.PRNGKey(0),
        n_rays=64,
        n_rays_shift=jnp.uint32(0),
        capacity=4096,
        n_lattice=n_lattice_points(cfg),
        s_pad=64,
    )
    n_long = 16
    off = generate_training_batch(cfg, aabb, **kw, s_short=0, n_long=n_long)
    on = generate_training_batch(cfg, aabb, **kw, s_short=32, n_long=n_long)
    counts = np.sort(np.asarray(off.layout.counts))[::-1]
    # both modes report the same split order statistic
    assert int(off.count_at_split) == counts[n_long] == int(on.count_at_split)
    # and it is strictly below the max on this scene (rays have varied spans)
    assert int(off.count_at_split) < int(off.max_ray_count)
