"""Render-perf iteration lab: train ONCE, snapshot, then analyze/measure.

First run trains `train_steps` on the procedural bench scene and writes
/tmp/rt_lab_<steps>.msgpack; later runs load it (seconds) so renderer
changes can be measured without retraining.

Reports: occupancy/pooled-grid statistics, per-ray coarse-segment counts for
a test view, the per-tile seg-vs-legacy decision the renderer would take,
and the timed full-frame spp pass.

Run: python tools/rt_lab.py [res=800] [train_steps=2048]
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
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 2048

    import ngp_tpu as ngp
    from ngp_tpu.data.synthetic import write_synthetic_dataset

    cache = Path("/tmp/ngp_tpu_bench_scene_v1")
    if not (cache / "transforms_train.json").exists():
        cache.mkdir(parents=True, exist_ok=True)
        write_synthetic_dataset(cache, n_train=12, n_test=1, width=96, height=96)

    ckpt = Path(f"/tmp/rt_lab_{steps}.msgpack")
    tb = ngp.Testbed()
    if ckpt.exists():
        tb.load_snapshot(str(ckpt))
        tb.load_training_data(str(cache / "transforms_train.json"))
        print(f"# loaded {ckpt}")
    else:
        tb.load_model_config_dict({})
        tb.load_training_data(str(cache / "transforms_train.json"))
        t0 = time.perf_counter()
        while tb.training_buffer.i_step < steps:
            tb.train(16, 1 << 18)
        print(f"# trained {tb.training_buffer.i_step} steps in {time.perf_counter()-t0:.1f}s")
        tb.save_snapshot(str(ckpt))

    state = tb._state
    config = tb.config
    scfg = config.sampler
    occ = state.grid.occupancy
    box = np.asarray(state.grid.occ_aabb)

    from ngp_tpu.grid.occupancy import pooled_occupancy
    from ngp_tpu.render.renderer import _BUDGET, _C_BUCKETS, _c_bucket
    from ngp_tpu.sampling.lattice import n_lattice_points

    occ_np = np.asarray(occ)
    pooled = np.asarray(jax.jit(lambda o: pooled_occupancy(scfg, o))(occ))
    for c in range(scfg.n_cascades):
        print(
            f"# cascade {c}: occ frac {occ_np[c].mean():.4f}  pooled(dilated) frac {pooled[c].mean():.4f}"
        )
    print(f"# occ box {box.tolist()}")

    # --------------------------- frame geometry for one test view
    renderer = tb._renderer
    ds = tb._dataset
    cam = np.asarray(ds.xforms[0], np.float32)
    fl = float(ds.focal_length[0]) * res / ds.images.shape[2]
    bx = renderer._occ_box(occ, state.grid.occ_aabb)
    geo = renderer._frame_geometry(bx, occ, cam, res, res, (fl, fl), (0.5, 0.5))
    hit, span, cc, n_seg = geo["hit"], geo["span"], geo["ccounts"], geo["n_seg"]
    n_lat = n_lattice_points(scfg)
    ids = np.nonzero(hit)[0]
    print(
        f"# rays {res*res}  hit {ids.size}  span p50/p90/max "
        f"{np.percentile(span[ids],50):.0f}/{np.percentile(span[ids],90):.0f}/{span[ids].max():.0f}"
    )
    if cc is not None:
        c = cc[ids]
        print(
            f"# coarse segs p50/p90/max {np.percentile(c,50):.0f}/"
            f"{np.percentile(c,90):.0f}/{c.max()}  n_seg {n_seg} "
            f"(fine width p90 {np.percentile(c,90)*8:.0f} vs span p90 {np.percentile(span[ids],90):.0f})"
        )
        # per-tile decision replay (renderer.render_frame logic)
        order = ids[np.argsort(cc[ids], kind="stable")]
        tile = min(renderer.tile_size, 1 << 16)
        n_used_seg = 0
        tiles = 0
        work_seg = work_leg = 0
        for s in range(0, order.size, tile):
            sel = order[s : s + tile]
            w_tile = int(span[sel].max())
            n_legacy = min(-(-max(w_tile, 128) // 128) * 128, n_lat)
            c_t = _c_bucket(int(cc[sel].max()), n_seg)
            use = c_t * 8 <= (3 * n_legacy) // 4
            tiles += 1
            n_used_seg += int(use)
            work_seg += sel.size * (c_t * 8 if use else n_legacy)
            work_leg += sel.size * n_legacy
            print(
                f"#   tile {tiles}: rays {sel.size} span_max {w_tile} n_legacy {n_legacy} "
                f"c_max {int(cc[sel].max())} c_bucket {c_t} -> {'SEG' if use else 'legacy'}"
            )
        print(
            f"# tiles using seg: {n_used_seg}/{tiles}  fine-march work ratio "
            f"{work_seg/max(work_leg,1):.2f}"
        )

    # --------------------------- timed frame
    def frame(spp_i):
        return renderer.render_frame(
            state.ema_params, occ, cam, (res, res), (fl, fl), (0.5, 0.5), spp_i,
            occ_aabb=state.grid.occ_aabb,
        )

    sync(frame(0))  # compile
    t0 = time.perf_counter()
    sync(frame(1))
    print(f"full frame {res}^2 spp-pass  {time.perf_counter()-t0:8.2f} s")
    t0 = time.perf_counter()
    sync(frame(2))
    print(f"full frame {res}^2 spp-pass  {time.perf_counter()-t0:8.2f} s (repeat)")


if __name__ == "__main__":
    main()
