"""Component breakdown of the renderer on the real chip.

Decomposes one 800^2 frame into: host ray-gen/slab, per-tile march
(count_samples + sort), and the budgeted composite while_loop, plus a
calibration of the network fwd at the per-round budget. Methodology per
ROADMAP (readback sync only; block_until_ready lies through the tunnel).

Run: python tools/profile_render.py [res] [train_calls]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    train_calls = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    try:
        from ngp_tpu.utils.compile_cache import enable_persistent_compile_cache

        enable_persistent_compile_cache()
    except Exception:
        pass

    from ngp_tpu.data.nerf_synthetic import load_nerf_synthetic
    from ngp_tpu.data.synthetic import write_synthetic_dataset
    from ngp_tpu.render.renderer import _BUDGET, _D, Renderer, render_tile
    from ngp_tpu.sampling.lattice import count_samples, n_lattice_points
    from ngp_tpu.train.trainer import Trainer, TrainingLoop
    from ngp_tpu.utils.config import NGPConfig

    cache = Path("/tmp/ngp_tpu_bench_scene_v1")
    if not (cache / "transforms_train.json").exists():
        cache.mkdir(parents=True, exist_ok=True)
        write_synthetic_dataset(cache, n_train=12, n_test=1, width=96, height=96)
    ds = load_nerf_synthetic(cache / "transforms_train.json")

    config = NGPConfig.from_json({})
    trainer = Trainer.create(config)
    state = trainer.init_state(seed=43)
    loop = TrainingLoop(trainer, ds)
    t0 = time.perf_counter()
    for _ in range(train_calls):
        state = loop.train(state, 16)
    print(f"# trained {train_calls * 16} steps in {time.perf_counter()-t0:.1f}s")
    occ = state.grid.occupancy
    frac = float(jnp.mean(occ[0].astype(jnp.float32)))
    box = np.asarray(state.grid.occ_aabb)
    print(f"# occupancy frac(c0)={frac:.3f} box={box.tolist()}")

    scfg = config.sampler
    n_lat = n_lattice_points(scfg)
    renderer = Renderer(model=trainer.model, config=config)

    # ------------------------------- full-frame timings (headline)
    cam = np.asarray(ds.xforms[0], np.float32)
    fl = float(ds.focal_length[0]) * res / ds.images.shape[2]

    def frame(spp_i):
        return renderer.render_frame(
            state.ema_params, occ, cam, (res, res), (fl, fl), (0.5, 0.5), spp_i,
            occ_aabb=state.grid.occ_aabb,
        )

    sync(frame(0))  # compile
    t0 = time.perf_counter()
    sync(frame(1))
    t_frame = time.perf_counter() - t0
    print(f"full frame {res}^2 spp-pass         {t_frame*1e3:10.1f} ms")

    # ------------------------------- tile decomposition
    # reproduce the renderer's host path for one middle tile
    w = h = res
    xs = (np.arange(w, dtype=np.float32) + 0.5) / w
    ys = (np.arange(h, dtype=np.float32) + 0.5) / h
    xy = np.stack(np.meshgrid(xs, ys, indexing="xy"), axis=-1).reshape(-1, 2)
    d = np.stack(
        [(xy[:, 0] - 0.5) * w / fl, (xy[:, 1] - 0.5) * h / fl, np.ones((xy.shape[0],), np.float32)],
        axis=-1,
    ) @ cam[:, :3].T
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(cam[:, 3], d.shape).copy()
    dt = scfg.min_cone_stepsize
    dd = np.where(np.abs(d) < 1e-12, 1e-12, d)
    t1 = (box[0] - o) / dd
    t2 = (box[1] - o) / dd
    occ_lo = np.max(np.minimum(t1, t2), axis=-1)
    occ_hi = np.min(np.maximum(t1, t2), axis=-1)
    from ngp_tpu.utils.aabb import AABB

    sb = AABB.scene(scfg.aabb_scale)
    s_lo = np.maximum(np.max(np.minimum((sb.lo - o) / dd, (sb.hi - o) / dd), axis=-1), 0.05)
    with np.errstate(invalid="ignore"):
        k0 = np.clip(np.floor((occ_lo - s_lo) / dt) - 1, 0, n_lat).astype(np.int32)
        span = np.clip(np.ceil((occ_hi - np.maximum(occ_lo, s_lo)) / dt) + 3, 0, n_lat - k0)
    hit = (occ_hi >= np.maximum(occ_lo, s_lo)) & (span > 0)
    ids = np.nonzero(hit)[0]
    order = ids[np.argsort(span[ids], kind="stable")]
    print(f"# rays: {o.shape[0]}  hit: {ids.size}  spans p50/p90/max: "
          f"{np.percentile(span[ids], 50):.0f}/{np.percentile(span[ids], 90):.0f}/{span[ids].max():.0f}")

    tile = 1 << 16
    sel = order[len(order) // 2 : len(order) // 2 + tile]
    w_tile = int(span[sel].max())
    n_window = min(-(-max(w_tile, 128) // 128) * 128, n_lat)
    print(f"# middle tile: {sel.size} rays, window {n_window}")

    o_t = jnp.asarray(o[sel])
    d_t = jnp.asarray(d[sel])
    k_t = jnp.asarray(k0[sel])
    startt = jnp.maximum(jnp.asarray(s_lo[sel]), 0.05) + 1e-6
    aabb = AABB.scene(scfg.aabb_scale)

    @jax.jit
    def march_only(occupancy, o, d, st, k0):
        c = count_samples(scfg, aabb, occupancy, o, d, st, n_window, k0=k0)
        return c.sum()

    @jax.jit
    def march_sort(occupancy, o, d, st, k0):
        c, m = count_samples(scfg, aabb, occupancy, o, d, st, n_window, return_masks=True, k0=k0)
        iota = jnp.arange(n_window, dtype=jnp.int32)[None, :]
        keys = jnp.where(m, iota, jnp.int32(n_window))
        t_idx = jax.lax.sort(keys, dimension=1)
        return c.sum() + t_idx[:, 0].sum()

    @jax.jit
    def net_budget(params, pos, dirs):
        rgb_raw, sigma_raw = trainer.model.rgbsigma_raw(params, pos, dirs)
        return rgb_raw.sum() + sigma_raw.sum()

    @jax.jit
    def enc_budget(params, pos):
        from ngp_tpu.ops.hash_encoding import hash_encode_packed

        return hash_encode_packed(params["hash_packed"], pos, trainer.model.grid_spec).sum()

    def timeit(name, fn, reps=4):
        fn()
        fn()
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        dtms = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name:34s} {dtms:8.1f} ms", flush=True)
        return dtms

    m_ms = timeit("tile march (counts only)", lambda: sync(march_only(occ, o_t, d_t, startt, k_t)))
    ms_ms = timeit("tile march + sort", lambda: sync(march_sort(occ, o_t, d_t, startt, k_t)))

    pos = jax.random.uniform(jax.random.PRNGKey(0), (_BUDGET, 3))
    dirs = jax.random.uniform(jax.random.PRNGKey(1), (_BUDGET, 3))
    prep = renderer._prepared(state.ema_params)
    n_ms = timeit("network fwd raw params", lambda: sync(net_budget(state.ema_params, pos, dirs)))
    np_ms = timeit("network fwd packed params", lambda: sync(net_budget(prep, pos, dirs)))
    e_ms = timeit("hash encode packed only", lambda: sync(enc_budget(prep, pos)))

    rounds_max = int(np.ceil(tile * n_window / _BUDGET)) + int(np.ceil(n_window / _D)) + 4
    tile_fn = lambda: sync(
        render_tile(
            trainer.model, config, prep, occ, o_t, d_t, k_t,
            jnp.asarray(sel.astype(np.int32)), jnp.ones((tile,), bool), jnp.uint32(1),
            jnp.asarray(cam[:, 2]), jnp.asarray(cam[:, 3]), jnp.float32(1.0),
            render_mode="Shade", n_window=n_window, n_rounds_max=rounds_max,
        )
    )
    t_ms = timeit("full tile (march+sort+composite)", tile_fn)
    print(f"# => composite ≈ {t_ms - ms_ms:.1f} ms; march {m_ms:.1f} + sort {ms_ms - m_ms:.1f}")
    print(f"# frame estimate: {o.shape[0]/tile:.1f} tiles x {t_ms:.0f} ms = {o.shape[0]/tile*t_ms/1e3:.1f} s/spp")

    # ------------------------------- round-count + per-ray count stats
    @jax.jit
    def counts_only(occupancy, o, d, st, k0):
        return count_samples(scfg, aabb, occupancy, o, d, st, n_window, k0=k0)

    cts = np.asarray(counts_only(occ, o_t, d_t, startt, k_t))
    print(f"# tile counts p50/p90/max/sum: {np.percentile(cts,50):.0f}/"
          f"{np.percentile(cts,90):.0f}/{cts.max()}/{cts.sum()}  "
          f"ideal full-budget rounds: {cts.sum()/_BUDGET:.1f}")

    # stub network on the SAME tile isolates composite glue from network eval
    class _Stub:
        def rgbsigma_raw(self, params, pos, dirs):
            s = pos.sum(-1)
            return jnp.stack([s, s, s], -1), s * 0.01 - 3.0

    from ngp_tpu.render.renderer import _render_tile_impl

    stub_fn = jax.jit(
        lambda *a: _render_tile_impl(
            _Stub(), config, {}, *a,
            render_mode="Shade", n_window=n_window, n_rounds_max=rounds_max,
        )
    )
    stub_args = (
        occ, o_t, d_t, k_t, jnp.asarray(sel.astype(np.int32)),
        jnp.ones((tile,), bool), jnp.uint32(1),
        jnp.asarray(cam[:, 2]), jnp.asarray(cam[:, 3]), jnp.float32(1.0),
    )
    st_ms = timeit("full tile STUB net", lambda: sync(stub_fn(*stub_args)))
    print(f"# => net in-loop ≈ {t_ms - st_ms:.1f} ms; stub composite {st_ms - ms_ms:.1f}")

    # processed-samples probe: Cost mode returns per-ray included counts
    # (params must be an ARGUMENT — closed over, the 537 MB packed table
    # becomes an HLO constant and the remote compile rejects it)
    cost_fn = jax.jit(
        lambda p, *a: _render_tile_impl(
            trainer.model, config, p, *a,
            render_mode="Cost", n_window=n_window, n_rounds_max=rounds_max,
        )
    )
    proc = np.asarray(cost_fn(prep, *stub_args))[:, 0] * 128.0
    print(f"# processed (early-stop-trimmed) sum: {proc.sum():.0f} "
          f"=> {proc.sum()/_BUDGET:.1f} full-budget rounds of included work")


if __name__ == "__main__":
    main()
