"""mb19: grid-update sub-part timing on the real chip.

The full grid_update measured ~330 ms/call (profile_step.py, warm snapshot)
— amortized ~20 ms/step of the 16-step call. Density evals alone predict
~105 ms; this bench attributes the rest across: candidate sampling,
density-eval scan, splat+EMA, occupancy threshold/pool, occupied AABB.
Run: python tools/mb19_grid_update.py  (expects the bench warm snapshot)
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


def timeit(name, fn, reps=8):
    fn()
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    dtms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:36s} {dtms:8.1f} ms", flush=True)
    return dtms


def main():
    from ngp_tpu.grid.occupancy import (
        occupied_aabb,
        sample_grid_positions,
        splat_density_ema,
        update_occupancy,
    )
    from ngp_tpu.models.ngp import apply_density_activation
    from ngp_tpu.testbed import Testbed

    cache = Path("/tmp/ngp_tpu_bench_scene_v1")
    tb = Testbed()
    tb.load_snapshot(str(cache / "warm_snapshot.msgpack"))
    trainer, state = tb._trainer, tb._state
    scfg = trainer.config.sampler
    aabb = trainer.aabb

    n_total = scfg.n_total_elements
    n_u = n_n = n_total // 4
    print(f"# n_uniform={n_u} n_nonuniform={n_n}")

    @jax.jit
    def sample_only(density, key, step):
        pos, idx = sample_grid_positions(scfg, density, key, n_u, n_n, step)
        return pos.sum() + idx.sum()

    @jax.jit
    def density_scan(params, pos):
        n = n_u + n_n
        chunk = min(1 << 18, n)
        n_chunks = -(-n // chunk)

        def body(_, p):
            raw = trainer.model.density_raw(params, p)[:, 0]
            return None, apply_density_activation(raw, trainer.density_activation)

        _, dens = jax.lax.scan(body, None, pos.reshape(n_chunks, chunk, 3))
        return dens.reshape(-1).sum()

    @jax.jit
    def density_flat(params, pos):
        raw = trainer.model.density_raw(params, pos)[:, 0]
        return apply_density_activation(raw, trainer.density_activation).sum()

    @jax.jit
    def splat_only(grid, idx, dens):
        return splat_density_ema(scfg, grid, idx, dens).density.sum()

    @jax.jit
    def occ_only(grid):
        g2 = update_occupancy(scfg, grid)
        return g2.occupancy.sum() + g2.occ_aabb.sum()

    @jax.jit
    def aabb_only(occupancy):
        return occupied_aabb(scfg, occupancy).sum()

    key = jax.random.PRNGKey(3)
    pos, idx = jax.jit(lambda d, k: sample_grid_positions(scfg, d, k, n_u, n_n, state.grid.step))(
        state.grid.density, key
    )
    warped = jax.jit(aabb.relative_pos)(pos)
    dens = jnp.abs(jax.random.normal(key, (n_u + n_n,)))

    timeit("sample_grid_positions", lambda: sync(sample_only(state.grid.density, key, state.grid.step)))
    timeit("density scan (4 x 2^18)", lambda: sync(density_scan(state.params, warped)))
    timeit("density flat (2^20 one shot)", lambda: sync(density_flat(state.params, warped)))
    timeit("splat+ema", lambda: sync(splat_only(state.grid, idx, dens)))
    timeit("update_occupancy (+aabb)", lambda: sync(occ_only(state.grid)))
    timeit("occupied_aabb alone", lambda: sync(aabb_only(state.grid.occupancy)))

    gu = trainer.grid_update(512)
    st = state

    def full():
        nonlocal st
        st = gu(st)
        sync(st.grid.mean_density)

    timeit("full grid_update", full)


if __name__ == "__main__":
    main()
