"""Per-tile render decomposition on a TRAINED checkpoint (real chip).

Loads a snapshot + its scene, renders chosen test views, and reports per
tile: the marching-window / segment-path decision, ray-count stats, and
wall time (device-synced per tile, so numbers are additive). Separates the
march+sort leg from the composite leg by re-running the tile twice.

Run: python tools/profile_render_ckpt.py <ckpt.msgpack> <scene_dir> [view ...]
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
    ckpt = sys.argv[1] if len(sys.argv) > 1 else ".evidence/ckpt_r3.msgpack"
    scene = Path(sys.argv[2] if len(sys.argv) > 2 else ".evidence/scene_800")
    views = [int(v) for v in sys.argv[3:]] or [0, 3]

    try:
        from ngp_tpu.utils.compile_cache import enable_persistent_compile_cache

        enable_persistent_compile_cache()
    except Exception:
        pass

    from ngp_tpu.testbed import Testbed

    tb = Testbed()
    tb.load_snapshot(ckpt)
    tb.load_training_data(str(scene / "transforms_test.json"))
    ds = tb._dataset
    w = h = int(ds.resolution[0])
    occ = tb._state.grid.occupancy
    print(f"# grid occ frac c0: {float(jnp.mean(occ[0].astype(jnp.float32))):.4f}")

    renderer = tb._renderer
    rb = tb.rendering_buffer
    rb.fov_axis = 0
    focal = float(ds.focal_length[0])

    for vi in views:
        cam = np.asarray(ds.xforms[vi], np.float32)
        # --- pipelined pass times (true cost, no mid-frame syncs)
        def frame(spp_i):
            return renderer.render_frame(
                tb._state.ema_params, occ, cam, (w, h), (focal, focal),
                (0.5, 0.5), spp_i, occ_aabb=tb._state.grid.occ_aabb,
            )

        sync(frame(0))  # compile + geometry cache
        t0 = time.perf_counter()
        sync(frame(1))
        t_pass = time.perf_counter() - t0
        geo = renderer._seg_cache
        cc = geo.get("ccounts")
        hit = geo["hit"]
        msg = f"# view {vi}: spp-pass {t_pass:.2f}s  hit={int(hit.sum())}"
        if cc is not None:
            c = cc[hit]
            msg += (f"  ccounts mean/p50/p90/p99/max: {c.mean():.0f}/"
                    f"{np.percentile(c,50):.0f}/{np.percentile(c,90):.0f}/"
                    f"{np.percentile(c,99):.0f}/{c.max()}  n_seg={geo['n_seg']}")
        print(msg, flush=True)

        # --- per-tile decomposition (synced)
        tiles = geo.get("tiles", {})
        tot = 0.0
        for s, t in sorted(tiles.items()):
            seg = t["seg_t"] is not None
            # time this tile alone: re-dispatch via the public path is messy;
            # approximate by timing a scatter-synced single-tile render
            from ngp_tpu.render.renderer import _BUDGET, _D, render_tile

            rounds_max = (
                int(np.ceil(t["sel"].size * t["w_eff"] / _BUDGET))
                + int(np.ceil(t["w_eff"] / _D)) + 4
            )
            o_dev, k_dev, id_dev, v_dev = t["rays_const"]
            args = (
                renderer._prepared(tb._state.ema_params), occ, o_dev, t["d_t"],
                k_dev, id_dev, v_dev, jnp.uint32(1),
                jnp.asarray(cam[:, 2]), jnp.asarray(cam[:, 3]), jnp.float32(1.0),
            )
            statics = dict(
                render_mode="Shade", n_window=t["n_window"],
                n_rounds_max=rounds_max,
                train_in_linear_color=renderer.train_in_linear_color,
                rgb_activation=renderer.rgb_activation,
                density_activation=renderer.density_activation,
            )
            packed = renderer._packed(occ)
            fn = lambda: sync(render_tile(
                renderer.model, renderer.config, *args,
                seg_idx=t["seg_t"], packed=packed, **statics))
            fn()
            t0 = time.perf_counter()
            fn()
            dt_tile = time.perf_counter() - t0
            tot += dt_tile
            print(f"#   tile@{s}: rays={t['sel'].size} seg={seg} "
                  f"n_window={t['n_window']} w_eff={t['w_eff']} {dt_tile*1e3:8.1f} ms",
                  flush=True)
        print(f"# view {vi}: sum of synced tiles {tot:.2f}s vs pipelined {t_pass:.2f}s")


if __name__ == "__main__":
    main()
