"""Microbench: (R, W) mask-sort dtype + oct-table build formulations."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

R, W = 8192, 1152
T, L, F = 1 << 19, 16, 2
REPS = 8


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def bench(name, fn, *args):
    f = jax.jit(fn)
    sync(f(*args)); sync(f(*args))
    t0 = time.perf_counter()
    sync(f(*args))
    print(f"{name:44s} {(time.perf_counter()-t0-0.0266)/REPS*1e3:8.1f} ms", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    mask = jax.random.uniform(key, (R, W)) < 0.25

    def sort_dtype(dtype):
        def f(mask):
            acc = jnp.zeros((R, W), dtype)
            iota = jnp.arange(W, dtype=dtype)[None, :]
            for r in range(REPS):
                keys = jnp.where(mask ^ (r % 2 == 1), iota, jnp.asarray(W, dtype))
                acc = acc + jax.lax.sort(keys, dimension=1)
            return acc.sum()  # consume the FULL sorted output (no DCE)
        return f

    bench("mask sort int32 (8192x1152)", sort_dtype(jnp.int32), mask)
    bench("mask sort int16 (8192x1152)", sort_dtype(jnp.int16), mask)

    table = jax.random.normal(key, (L, T, F), jnp.float32)
    offs = [((k & 1) + ((k >> 1) & 1) * 258583 + ((k >> 2) & 1) * 253757) % T for k in range(8)]

    def build_roll(table):
        acc = jnp.zeros((), jnp.float32)
        for r in range(REPS):
            per = []
            for l in range(L):
                t = table[l] + r
                per.append(jnp.concatenate([jnp.roll(t, -o, axis=0) for o in offs], axis=-1))
            acc = acc + jnp.stack(per).sum()  # consume everything
        return acc

    def build_double_slice(table):
        acc = jnp.zeros((), jnp.float32)
        for r in range(REPS):
            t2 = jnp.concatenate([table, table], axis=1) + r  # (L, 2T, F)
            per = [jax.lax.slice_in_dim(t2, o, o + T, axis=1) for o in offs]
            acc = acc + jnp.concatenate(per, axis=-1).sum()
        return acc

    bench("oct build: 8 rolls + concat", build_roll, table)
    bench("oct build: doubled table + 8 slices", build_double_slice, table)


if __name__ == "__main__":
    main()
