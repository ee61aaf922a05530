"""Cumulative decomposition of generate_training_batch at converged shapes.

Locates where the ~46 ms of batch_gen go (march, sort, layout, flat
assembly, rgba) with an honest pre-compiled roundtrip baseline and ONE
batch() call per timed graph.
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
    from ngp_tpu.sampling.lattice import n_lattice_points
    from ngp_tpu.sampling.training import generate_training_batch
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
    occ, box = state.grid.occupancy, state.grid.occ_aabb

    def probe(fields):
        def f(rng, occ, box, images, xforms, focal):
            b = generate_training_batch(
                scfg, aabb, images, xforms, focal, (0.5, 0.5), occ, rng,
                n_rays, jnp.uint32(0), cap, n_lat, s_pad,
                occ_aabb=box, n_window=n_window,
            )
            acc = b.n_samples.astype(jnp.float32)
            for name in fields:
                acc = acc + getattr(b, name).sum()
            return acc
        return jax.jit(f)

    args = (rng, occ, box, images, xforms, focal)
    trivial = jax.jit(lambda x: x + 1.0)
    outs = [
        ("roundtrip", trivial, (jnp.zeros(()),)),
        ("counts_only", probe(()), args),
        ("+layout", probe(("ray_valid",)), args),
        ("+flat pos", probe(("pos",)), args),
        ("+pos+dirs+rgba", probe(("pos", "dirs", "rgba")), args),
    ]

    def timeit(name, fn, fargs, reps=16):
        fn(*fargs); fn(*fargs)
        t0 = time.perf_counter()
        for _ in range(reps):
            fn(*fargs)
        print(f"{name:20s} {(time.perf_counter()-t0)/reps*1e3:8.2f} ms", flush=True)

    for name, fn, fargs in outs:
        timeit(name, lambda fn=fn, fargs=fargs: sync(fn(*fargs)), fargs=())


if __name__ == "__main__":
    main()
