"""Isolate the flat-assembly gathers of generate_training_batch.

mb15: the flat-pos chain costs ~32 ms beyond march+sort+layout. Candidates:
the (R,S) 2-D fancy gather, the five per-ray w<=3 gathers, or something
XLA-structural. Times each alternative formulation on synthetic inputs of
the exact converged shapes (C=2^18, R=8192, S=512).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    np.asarray(x.ravel()[0])


def main():
    C, R, S = 1 << 18, 8192, 512
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    lat_pad = jax.random.randint(ks[0], (R, S), 0, 1152, jnp.int32)
    rid = jax.random.randint(ks[1], (C,), 0, R, jnp.int32)
    pir = jax.random.randint(ks[2], (C,), 0, S, jnp.int32)
    fv = jax.random.uniform(ks[3], (C,)) < 0.9
    k0 = jax.random.randint(ks[4], (R,), 0, 64, jnp.int32)
    startt = jax.random.uniform(ks[5], (R,))
    o = jax.random.uniform(ks[6], (R, 3))
    d = jax.random.uniform(ks[7], (R, 3))
    dt = 0.0016915
    rc = jnp.concatenate([startt[:, None], o, d], axis=1)  # (R, 7)
    lat_flat = lat_pad.reshape(-1)

    @jax.jit
    def current(lat_pad, rid, pir, fv, k0, startt, o, d):
        flat_lat = jnp.where(fv, k0[rid] + lat_pad[rid, pir], 0)
        flat_t = startt[rid] + flat_lat.astype(jnp.float32) * dt
        flat_pos = o[rid] + flat_t[:, None] * d[rid]
        flat_dirs = (d[rid] + 1.0) * 0.5
        return flat_pos.sum() + flat_dirs.sum()

    @jax.jit
    def flat1d(lat_flat, rid, pir, fv, k0, startt, o, d):
        flat_lat = jnp.where(fv, k0[rid] + lat_flat[rid * S + pir], 0)
        flat_t = startt[rid] + flat_lat.astype(jnp.float32) * dt
        flat_pos = o[rid] + flat_t[:, None] * d[rid]
        flat_dirs = (d[rid] + 1.0) * 0.5
        return flat_pos.sum() + flat_dirs.sum()

    @jax.jit
    def packed_rc(lat_flat, rid, pir, fv, k0, rc):
        flat_lat = jnp.where(fv, k0[rid] + lat_flat[rid * S + pir], 0)
        r = rc[rid]  # (C, 7): [startt, o3, d3]
        flat_t = r[:, 0] + flat_lat.astype(jnp.float32) * dt
        flat_pos = r[:, 1:4] + flat_t[:, None] * r[:, 4:7]
        flat_dirs = (r[:, 4:7] + 1.0) * 0.5
        return flat_pos.sum() + flat_dirs.sum()

    @jax.jit
    def gathers_only_2d(lat_pad, rid, pir):
        return lat_pad[rid, pir].sum()

    @jax.jit
    def gathers_only_1d(lat_flat, rid, pir):
        return lat_flat[rid * S + pir].sum()

    @jax.jit
    def gather_w1(startt, rid):
        return startt[rid].sum()

    @jax.jit
    def gather_w3(o, rid):
        return o[rid].sum()

    @jax.jit
    def gather_w7(rc, rid):
        return rc[rid].sum()

    def timeit(name, fn, reps=16):
        fn(); fn()
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        print(f"{name:22s} {(time.perf_counter()-t0)/reps*1e3:8.2f} ms", flush=True)

    timeit("roundtrip", lambda: sync(jax.jit(lambda: jnp.zeros(()))()))
    timeit("current(2d+5g)", lambda: sync(current(lat_pad, rid, pir, fv, k0, startt, o, d)))
    timeit("flat1d(1d+5g)", lambda: sync(flat1d(lat_flat, rid, pir, fv, k0, startt, o, d)))
    timeit("packed(1d+2g)", lambda: sync(packed_rc(lat_flat, rid, pir, fv, k0, rc)))
    timeit("g2d only", lambda: sync(gathers_only_2d(lat_pad, rid, pir)))
    timeit("g1d only", lambda: sync(gathers_only_1d(lat_flat, rid, pir)))
    timeit("g w1", lambda: sync(gather_w1(startt, rid)))
    timeit("g w3", lambda: sync(gather_w3(o, rid)))
    timeit("g w7", lambda: sync(gather_w7(rc, rid)))


if __name__ == "__main__":
    main()
