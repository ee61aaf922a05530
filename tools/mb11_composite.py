"""mb11: composite while_loop overhead with a stub network.

Times _render_tile_impl with the real model vs a free stub model on the same
tile shapes as tools/profile_render.py, isolating the per-round queue cost
(compaction scatter, t_idx gathers, state updates) from network eval.
Run: python tools/mb11_composite.py
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


class StubModel:
    """Shape-compatible free network: rgb/sigma from a couple of VPU ops."""

    def rgbsigma_raw(self, params, pos, dirs):
        s = pos.sum(-1)
        return jnp.stack([s, s, s], -1), s * 0.01 - 3.0


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/ngp_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from ngp_tpu.render.renderer import _BUDGET, _D, _render_tile_impl, render_tile
    from ngp_tpu.utils.config import NGPConfig

    config = NGPConfig.from_json({})
    R = 1 << 16
    n_window = 640
    rng = np.random.default_rng(0)
    # synthetic tile: rays through the unit cube center
    o = np.full((R, 3), -0.2, np.float32) + rng.uniform(-0.05, 0.05, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32) + 2.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    k0 = np.zeros((R,), np.int32)
    occ = jnp.ones((config.sampler.n_cascades, 128, 128, 128), bool)  # fully occupied

    rounds_max = int(np.ceil(R * n_window / _BUDGET)) + int(np.ceil(n_window / _D)) + 4
    args = (
        occ,
        jnp.asarray(o),
        jnp.asarray(d),
        jnp.asarray(k0),
        jnp.arange(R, dtype=jnp.int32),
        jnp.ones((R,), bool),
        jnp.uint32(1),
        jnp.asarray([0.0, 0.0, 1.0], jnp.float32),
        jnp.asarray(o[0]),
        jnp.float32(1.0),
    )
    statics = dict(render_mode="Shade", n_window=n_window, n_rounds_max=rounds_max)

    stub = StubModel()
    fn = jax.jit(
        lambda *a: _render_tile_impl(stub, config, {}, *a, **statics),
    )

    def timeit(name, f, reps=4):
        f()
        f()
        t0 = time.perf_counter()
        for _ in range(reps):
            f()
        dtms = (time.perf_counter() - t0) / reps * 1e3 - 26.6  # axon roundtrip
        print(f"{name:40s} {dtms:8.1f} ms", flush=True)
        return dtms

    t = timeit("stub composite (march+sort+loop)", lambda: sync(fn(*args)))
    # march+sort alone with the same shapes
    from ngp_tpu.sampling.lattice import count_samples
    from ngp_tpu.utils.aabb import AABB

    aabb = AABB.scene(config.sampler.aabb_scale)
    scfg = config.sampler

    @jax.jit
    def march_sort(occupancy, o, d, k0):
        tmin, _ = aabb.ray_intersect(o, d)
        st = jnp.maximum(tmin, 0.05) + 1e-6
        c, m = count_samples(scfg, aabb, occupancy, o, d, st, n_window, return_masks=True, k0=k0)
        iota = jnp.arange(n_window, dtype=jnp.int32)[None, :]
        return c.sum() + jax.lax.sort(jnp.where(m, iota, jnp.int32(n_window)), dimension=1)[:, 0].sum()

    ms = timeit("march+sort alone", lambda: sync(march_sort(occ, args[1], args[2], args[3])))
    # fully occupied: every ray takes min(n_window, max_steps) samples
    n_samp = R * min(n_window, scfg.maximum_marching_steps)
    rounds = n_samp / _BUDGET
    print(f"# stub loop cost = {t - ms:.0f} ms over ~{rounds:.0f} full-budget rounds "
          f"=> {(t - ms) / rounds:.2f} ms/round of queue overhead")


if __name__ == "__main__":
    main()
