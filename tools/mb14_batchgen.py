"""Decompose converged-state batch_gen: march vs compaction sort vs assembly.

Question: at the steady-state shapes (n_rays=8192, window=1152), where do
batch_gen's ~46 ms go, and would a fine-chunk two-level compaction (sort
chunk ordinals at width W/8, then fine-sort only the kept C*8 columns) pay?

Run after bench.py (needs the warm snapshot + scene).
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
    from ngp_tpu.utils.compile_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    from ngp_tpu.data.nerf_synthetic import load_nerf_synthetic
    from ngp_tpu.sampling.lattice import count_samples, n_lattice_points, occupied_window_start
    from ngp_tpu.testbed import Testbed

    cache = Path("/tmp/ngp_tpu_bench_scene_v1")
    tb = Testbed()
    tb.load_snapshot(str(cache / "warm_snapshot.msgpack"))
    tb.load_training_data(cache / "transforms_train.json")
    ds = tb._dataset
    state = tb._state
    scfg = tb.config.sampler
    aabb = tb._trainer.aabb
    n_lat = n_lattice_points(scfg)

    n_rays, n_window, s_pad, cap = 8192, 1152, 512, 1 << 18
    images, xforms, focal = ds.images, ds.xforms, jnp.asarray(ds.focal_length)
    rng = jax.random.PRNGKey(7)

    from ngp_tpu.grid.occupancy import packed_neighborhood

    def _rays(rng):
        h, w = images.shape[1], images.shape[2]
        k_pixel, k_jitter = jax.random.split(rng)
        i = jnp.arange(n_rays, dtype=jnp.uint32)
        img = ((i * jnp.uint32(images.shape[0])) // jnp.uint32(n_rays)) % jnp.uint32(images.shape[0])
        xy = jax.random.uniform(k_pixel, (n_rays, 2))
        res = jnp.array([w, h], jnp.float32)
        xy = (jnp.clip(jnp.floor(xy * res), 0, res - 1) + 0.5) / res
        xf = xforms[img.astype(jnp.int32)]
        d_cam = jnp.stack(
            [(xy[:, 0] - 0.5) * w / focal[0], (xy[:, 1] - 0.5) * h / focal[1],
             jnp.ones((n_rays,), jnp.float32)], axis=-1)
        d = jnp.einsum("rij,rj->ri", xf[:, :, :3], d_cam)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        o = xf[:, :, 3]
        tmin, _ = aabb.ray_intersect(o, d)
        startt = jnp.maximum(tmin, scfg.near_distance) + scfg.min_cone_stepsize * jax.random.uniform(k_jitter, (n_rays,))
        return o, d, startt

    @jax.jit
    def march_only(rng, occupancy, occ_box):
        o, d, startt = _rays(rng)
        packed = packed_neighborhood(scfg, occupancy)
        k0 = occupied_window_start(occ_box, o, d, startt, scfg.min_cone_stepsize, n_lat)
        c, m = count_samples(scfg, aabb, occupancy, o, d, startt, n_window,
                             return_masks=True, k0=k0, packed=packed)
        return c.sum() + m.sum()

    @jax.jit
    def march_sort(rng, occupancy, occ_box):
        o, d, startt = _rays(rng)
        packed = packed_neighborhood(scfg, occupancy)
        k0 = occupied_window_start(occ_box, o, d, startt, scfg.min_cone_stepsize, n_lat)
        c, m = count_samples(scfg, aabb, occupancy, o, d, startt, n_window,
                             return_masks=True, k0=k0, packed=packed)
        iota = jnp.arange(n_window, dtype=jnp.int32)[None, :]
        lat_pad = jax.lax.sort(jnp.where(m, iota, jnp.int32(n_window)), dimension=1)[:, :s_pad]
        return c.sum() + lat_pad[:, 0].sum()

    @jax.jit
    def march_chunk_sort(rng, occupancy, occ_box):
        """Two-level: chunk-ordinal sort (W/8 wide) + fine sort at C*8."""
        o, d, startt = _rays(rng)
        packed = packed_neighborhood(scfg, occupancy)
        k0 = occupied_window_start(occ_box, o, d, startt, scfg.min_cone_stepsize, n_lat)
        c, m = count_samples(scfg, aabb, occupancy, o, d, startt, n_window,
                             return_masks=True, k0=k0, packed=packed)
        n_chunk = n_window // 8
        cm = m.reshape(n_rays, n_chunk, 8).any(axis=2)  # (R, W/8)
        j = jnp.arange(n_chunk, dtype=jnp.int32)[None, :]
        C = 64
        kept = jax.lax.sort(jnp.where(cm, j, jnp.int32(n_chunk)), dimension=1)[:, :C]  # (R, C)
        # gather kept chunks' fine bits + ordinals
        fine = jnp.take_along_axis(
            m.reshape(n_rays, n_chunk, 8), jnp.minimum(kept, n_chunk - 1)[..., None], axis=1
        )  # hmm take_along_axis with (R, C, 1) -> broadcast over last
        fine = fine & (kept[..., None] < n_chunk)
        lat = kept[..., None] * 8 + jnp.arange(8, dtype=jnp.int32)
        keys = jnp.where(fine, lat, jnp.int32(n_window)).reshape(n_rays, C * 8)
        lat_pad = jax.lax.sort(keys, dimension=1)[:, :s_pad]
        return c.sum() + lat_pad[:, 0].sum()

    def timeit(name, fn, reps=8):
        fn(); fn()
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        print(f"{name:28s} {(time.perf_counter()-t0)/reps*1e3:8.1f} ms", flush=True)

    occ, box = state.grid.occupancy, state.grid.occ_aabb
    timeit("march_only", lambda: sync(march_only(rng, occ, box)))
    timeit("march+fullsort(1152)", lambda: sync(march_sort(rng, occ, box)))
    timeit("march+chunksort(144)+fine", lambda: sync(march_chunk_sort(rng, occ, box)))

    # true chunk-count stats at the converged grid
    @jax.jit
    def chunk_stats(rng, occupancy, occ_box):
        o, d, startt = _rays(rng)
        packed = packed_neighborhood(scfg, occupancy)
        k0 = occupied_window_start(occ_box, o, d, startt, scfg.min_cone_stepsize, n_lat)
        _, m = count_samples(scfg, aabb, occupancy, o, d, startt, n_window,
                             return_masks=True, k0=k0, packed=packed)
        cm = m.reshape(n_rays, n_window // 8, 8).any(axis=2)
        cc = jnp.sum(cm, axis=1)
        s = jnp.sort(cc)
        return s[-1], s[int(0.995 * n_rays)], s[int(0.9 * n_rays)], jnp.mean(cc.astype(jnp.float32))

    mx, p995, p90, mean = jax.device_get(chunk_stats(rng, occ, box))
    print(f"# fine chunk counts: max={mx} p99.5={p995} p90={p90} mean={mean:.1f}")


if __name__ == "__main__":
    main()
