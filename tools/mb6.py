"""Microbench: scatter/gather cost vs row WIDTH (decides bwd packing).

If bf16 scatter stays ~14.4 ns/row at w=8/w=16, packing 2 (or 4) corner
pairs per row halves (quarters) the backward scatter rows.
Method per ROADMAP round-2 note: REPS copies inside one jit, readback sync.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

T = 1 << 19
N = 1 << 20
REPS = 8


def sync(x):
    np.asarray(x.ravel()[0])


def bench(name, fn, *args):
    f = jax.jit(fn)
    sync(f(*args))
    sync(f(*args))
    t0 = time.perf_counter()
    sync(f(*args))
    dt = time.perf_counter() - t0
    per_row = (dt - 0.0266) / REPS / N * 1e9
    print(f"{name:42s} {dt*1e3:8.1f} ms total  {per_row:7.2f} ns/row", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (N,), 0, T, jnp.int32)

    for w in (2, 4, 8, 16, 32):
        vals = jnp.ones((N, w), jnp.bfloat16)

        def scat(idx, vals, w=w):
            out = jnp.zeros((T, w), jnp.bfloat16)
            for r in range(REPS):
                out = out.at[idx].add(vals + r)
            return out

        bench(f"scatter-add bf16 w={w}", scat, idx, vals)

    for w in (4, 8, 16):
        tbl = jnp.ones((T, w), jnp.float32)

        def gath(idx, tbl, w=w):
            acc = jnp.zeros((N, w), jnp.float32)
            for r in range(REPS):
                acc = acc + tbl[(idx + r) % T]
            return acc

        bench(f"gather f32 w={w}", gath, idx, tbl)

    # scatter with a 2-D index (level, row) — batched levels in one scatter?
    lvl = jax.random.randint(key, (N,), 0, 16, jnp.int32)
    idx2 = jnp.stack([lvl, idx], axis=-1)
    vals = jnp.ones((N, 4), jnp.bfloat16)

    def scat2(idx2, vals):
        out = jnp.zeros((16, T, 4), jnp.bfloat16)
        dnums = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1,), inserted_window_dims=(0, 1),
            scatter_dims_to_operand_dims=(0, 1))
        for r in range(REPS):
            out = jax.lax.scatter_add(out, idx2, vals + r, dnums)
        return out

    bench("scatter-add bf16 w=4 2-D idx (16,T)", scat2, idx2, vals)


if __name__ == "__main__":
    main()
