"""Decompose the warm spp-8 frame cost (shared-eval path).

The network leg of the 800^2 spp-8 frame is ~1.85 s (14.2M included samples
x 130 ns, evaluated once thanks to shared evals); the measured frame is
~5.1 s. This tool attributes the residual: per-tile march+sort (the
count_samples_segments pass and the (R, W) lattice sort), the composite
loop, frame geometry/coarse pass, and host/dispatch overhead.

Method: render the frame normally (total), then re-render with the network
stubbed to a constant (loop minus network), then run ONLY the march+sort
per tile (via render_tile on a 0-round budget). Differences attribute the
legs. All timings warm (second call).

Usage: python tools/profile_frame.py [res] [ckpt]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    ckpt = Path(sys.argv[2]) if len(sys.argv) > 2 else (
        Path(__file__).resolve().parent.parent / ".evidence" / "bench_warm.msgpack"
    )

    import jax
    import jax.numpy as jnp

    from ngp_tpu.data.synthetic import field_sigma_rgb, write_synthetic_dataset
    from ngp_tpu.grid.occupancy import update_occupancy
    from ngp_tpu.testbed import Testbed
    from ngp_tpu.utils.compile_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    scene = Path("/tmp/ngp_tpu_bench_scene_v1")
    if not (scene / "transforms_train.json").exists():
        scene.mkdir(parents=True, exist_ok=True)
        write_synthetic_dataset(scene, n_train=12, n_test=1, width=96, height=96)

    tb = Testbed()
    tb.load_snapshot(str(ckpt))
    tb.load_training_data(scene / "transforms_train.json")

    cfgs = tb.config.sampler
    g = cfgs.grid_size
    ax = (np.arange(g, dtype=np.float32) + 0.5) / g - 0.5
    zz, yy, xx = np.meshgrid(ax, ax, ax, indexing="ij")
    dens = []
    for c in range(cfgs.n_cascades):
        centers = np.stack([xx, yy, zz], axis=-1).reshape(-1, 3) * float(1 << c) + 0.5
        sigma, _ = field_sigma_rgb(centers)
        dens.append(sigma * cfgs.min_cone_stepsize)
    grid = tb._state.grid._replace(density=jnp.asarray(np.concatenate(dens)))
    grid = update_occupancy(cfgs, grid)
    ds = tb._dataset
    cam = np.asarray(ds.xforms[0], np.float32)
    fl = float(ds.focal_length[0]) * res / ds.images.shape[2]
    r = tb._renderer

    def timed(label, fn, reps=1):
        fn()  # compile + warm
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        t = (time.perf_counter() - t0) / reps
        print(f"# {label:34s} {t:7.3f}s", flush=True)
        return t, out

    def full_frame():
        return np.asarray(
            r.render_frame(
                tb._state.ema_params, grid.occupancy, cam, (res, res),
                (fl, fl), (0.5, 0.5), 0, occ_aabb=grid.occ_aabb, n_spp=8,
            )
        )

    t_total, _ = timed("frame spp-8 shared (total)", full_frame)

    # frame geometry + coarse pass alone (fresh camera-equivalent cost):
    # clear the per-frame cache so _frame_geometry recomputes
    box = r._occ_box(grid.occupancy, grid.occ_aabb)

    def geometry():
        r._seg_cache = {}
        return r._frame_geometry(box, grid.occupancy, cam, res, res, (fl, fl), (0.5, 0.5), np.array([0.5, 0.5]))

    t_geo, _ = timed("frame geometry + coarse pass", geometry)

    # march+sort per tile: render with a 0-round budget — the tile program
    # still marches, sorts, builds the queue, but runs no composite rounds.
    # Approximate by monkeypatching n_rounds_max to 0 through the public
    # path: render_frame computes rounds_max itself, so instead time ONE
    # render_tile call at rounds_max=0 on the biggest tile's shapes.
    from ngp_tpu.render import renderer as R

    geo = r._frame_geometry(box, grid.occupancy, cam, res, res, (fl, fl), (0.5, 0.5), np.array([0.5, 0.5]))
    hit = geo["hit"]; span = geo["span"]; ccounts = geo["ccounts"]
    ids_hit = np.nonzero(hit)[0]
    print(f"# rays hit {ids_hit.size} / {res*res}; ccounts p50/p90/max "
          f"{np.percentile(ccounts[ids_hit], 50):.0f}/{np.percentile(ccounts[ids_hit], 90):.0f}/{ccounts[ids_hit].max()}",
          flush=True)

    params = r._prepared(tb._state.ema_params)
    packed = r._packed(grid.occupancy)
    order = ids_hit[np.argsort(ccounts[ids_hit], kind="stable")]
    tile = min(r.tile_size, R._pow2(order.size, 256, r.tile_size), order.size)
    sel = order[-tile:]  # worst tile
    c_t = R._c_bucket(int(ccounts[sel].max()), geo["n_seg"])
    rows = geo["inv"][sel]
    seg_t = jnp.take(geo["seg_sorted"], jnp.asarray(rows), axis=0)[:, :c_t]
    # real rays for the worst tile
    o_np, d_np = r._rays_cached(cam, res, res, (fl, fl), (0.5, 0.5), np.array([0.5, 0.5]))
    arr = lambda x: jnp.asarray(x)

    def tile_call(rounds):
        out = R.render_tile(
            r.model, tb.config, params, grid.occupancy,
            arr(o_np[sel]), arr(d_np[sel]), arr(geo["k0"][sel]),
            arr(sel.astype(np.int32)), arr(np.ones(tile, bool)), jnp.uint32(0),
            arr(cam[:, 2]), arr(cam[:, 3]), jnp.float32(1.0),
            jnp.int32(rounds),
            render_mode="Shade", n_window=0,
            train_in_linear_color=r.train_in_linear_color,
            rgb_activation=r.rgb_activation, density_activation=r.density_activation,
            n_spp=8, accum_space="linear", share_evals=True,
            seg_idx=seg_t, packed=packed,
        )
        return np.asarray(out)

    t_march, _ = timed(f"worst tile march+sort only (0 rounds, C={c_t})", lambda: tile_call(0))
    t_tile, _ = timed("worst tile full (march + loop)", lambda: tile_call(10**6))
    print(f"# -> worst-tile composite loop       {t_tile - t_march:7.3f}s", flush=True)
    n_tiles = int(np.ceil(order.size / tile))
    print(f"# tiles {n_tiles} x {tile}; total {t_total:.3f}s = geometry {t_geo:.3f}s "
          f"+ ~{n_tiles}x(march {t_march:.3f}s + loop {t_tile - t_march:.3f}s) + host/dispatch rest",
          flush=True)


if __name__ == "__main__":
    main()
