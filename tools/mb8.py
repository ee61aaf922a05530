"""Microbench: occupancy-lookup formulations (decides batch-gen layout).

4-D fancy index vs flat 1-D index; bool vs uint8 vs bit-packed uint32.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

G = 128
C = 2
N = 1 << 23  # 8.4M lookups
REPS = 4


def sync(x):
    np.asarray(x.ravel()[0])


def bench(name, fn, *args):
    f = jax.jit(fn)
    sync(f(*args)); sync(f(*args))
    t0 = time.perf_counter()
    sync(f(*args))
    dt = time.perf_counter() - t0
    print(f"{name:44s} {dt*1e3:8.1f} ms  {(dt-0.0266)/REPS/N*1e9:6.2f} ns/lookup", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    occ4 = jax.random.uniform(key, (C, G, G, G)) < 0.3
    occ_flat = occ4.reshape(-1)
    occ_u8 = occ_flat.astype(jnp.uint8)
    # bit-packed along x-fastest linear order: word i holds cells 32i..32i+31
    packed = jnp.sum(
        occ_flat.reshape(-1, 32).astype(jnp.uint32) << jnp.arange(32, dtype=jnp.uint32)[None, :],
        axis=1, dtype=jnp.uint32,
    )

    mip = jax.random.randint(key, (N,), 0, C)
    cell = jax.random.randint(key, (N, 3), 0, G)

    def fancy(occ4, mip, cell):
        acc = jnp.zeros((N,), jnp.int32)
        for r in range(REPS):
            acc = acc + occ4[(mip + r) % C, cell[:, 0], cell[:, 1], cell[:, 2]]
        return acc

    def flat1d(occ_flat, mip, cell):
        acc = jnp.zeros((N,), jnp.int32)
        for r in range(REPS):
            idx = (((mip + r) % C) * G + cell[:, 0]) * G * G + cell[:, 1] * G + cell[:, 2]
            acc = acc + occ_flat[idx]
        return acc

    def flat_u8(occ_u8, mip, cell):
        acc = jnp.zeros((N,), jnp.uint32)
        for r in range(REPS):
            idx = (((mip + r) % C) * G + cell[:, 0]) * G * G + cell[:, 1] * G + cell[:, 2]
            acc = acc + occ_u8[idx]
        return acc

    def bits(packed, mip, cell):
        acc = jnp.zeros((N,), jnp.uint32)
        for r in range(REPS):
            idx = (((mip + r) % C) * G + cell[:, 0]) * G * G + cell[:, 1] * G + cell[:, 2]
            word = packed[idx >> 5]
            acc = acc + ((word >> (idx.astype(jnp.uint32) & 31)) & 1)
        return acc

    bench("occupancy 4-D fancy index (bool)", fancy, occ4, mip, cell)
    bench("flat 1-D index (bool)", flat1d, occ_flat, mip, cell)
    bench("flat 1-D index (uint8)", flat_u8, occ_u8, mip, cell)
    bench("bit-packed uint32 (128KB table)", bits, packed, mip, cell)


if __name__ == "__main__":
    main()
