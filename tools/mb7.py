"""Microbench: grid-update internals + oct-table build cost.

Components: sample_grid_positions, chunked vs unchunked density eval,
splat+update_occupancy, oct table build alone.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from ngp_tpu.grid.occupancy import (
    create_grid_state, sample_grid_positions, splat_density_ema, update_occupancy,
)
from ngp_tpu.models.ngp import NGPModel, apply_density_activation
from ngp_tpu.ops.hash_encoding import _oct_tables
from ngp_tpu.utils.aabb import AABB
from ngp_tpu.utils.config import NGPConfig


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timeit(name, fn, reps=4):
    fn(); fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    print(f"{name:36s} {(time.perf_counter()-t0)/reps*1e3:8.1f} ms", flush=True)


def main():
    config = NGPConfig.from_json({})
    scfg = config.sampler
    model = NGPModel.create(config.network)
    params = model.init(jax.random.PRNGKey(0))
    aabb = AABB.scene(scfg.aabb_scale)
    grid = create_grid_state(scfg)
    key = jax.random.PRNGKey(1)
    n = scfg.n_total_elements // 4  # 1.05M per half

    @jax.jit
    def sample_only(density, key):
        pos, idx = sample_grid_positions(scfg, density, key, n, n, jnp.int32(5))
        return pos.sum() + idx.sum()

    @jax.jit
    def oct_build(table):
        return _oct_tables(table, model.grid_spec).sum()

    @jax.jit
    def eval_unchunked(params, pos):
        raw = model.density_raw(params, pos)[:, 0]
        return apply_density_activation(raw, "Exponential").sum()

    @jax.jit
    def eval_chunked(params, pos):
        def body(_, p):
            raw = model.density_raw(params, p)[:, 0]
            return None, apply_density_activation(raw, "Exponential")
        _, d = jax.lax.scan(body, None, pos.reshape(8, -1, 3))
        return d.sum()

    @jax.jit
    def splat_occ(density, idx, dens):
        st = grid._replace(density=density)
        st = splat_density_ema(scfg, st, idx, dens)
        st = update_occupancy(scfg, st)
        return st.density.sum() + st.occupancy.sum() + st.occ_aabb.sum()

    density = jnp.abs(jax.random.normal(key, (scfg.n_total_elements,))) * 0.02
    pos2 = jax.random.uniform(key, (2 * n, 3))
    idx = jax.random.randint(key, (2 * n,), 0, scfg.n_total_elements)
    dens = jnp.abs(jax.random.normal(key, (2 * n,)))

    timeit("sample_grid_positions (2x1.05M)", lambda: sync(sample_only(density, key)))
    timeit("oct table build alone", lambda: sync(oct_build(params["hash_table"])))
    timeit("density eval 2.1M unchunked", lambda: sync(eval_unchunked(params, pos2)))
    timeit("density eval 2.1M chunked x8", lambda: sync(eval_chunked(params, pos2)))
    timeit("splat + update_occupancy", lambda: sync(splat_occ(density, idx, dens)))


if __name__ == "__main__":
    main()
