"""Does the two-bucket composite matter at the converged steady state?

Times the REAL per-step-dispatch train path (trainer.train_step, 16 steps
per timed region with one trailing device_get — exactly the TrainingLoop's
non-fused branch) at the single-bucket shape the controller is stuck in
(s_short=0) vs the two-bucket shape the count distribution wants.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from ngp_tpu.utils.compile_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    from ngp_tpu.testbed import Testbed

    cache = Path("/tmp/ngp_tpu_bench_scene_v1")
    tb = Testbed()
    tb.load_snapshot(str(cache / "warm_snapshot.msgpack"))
    tb.load_training_data(cache / "transforms_train.json")
    ds = tb._dataset
    trainer, state0 = tb._trainer, tb._state
    images, xforms, focal = ds.images, ds.xforms, jnp.asarray(ds.focal_length)

    N_STEPS = 16
    n_rays, cap, s_pad, n_window = 8192, 1 << 18, 512, 1152

    def timeit(name, shape_kwargs, reps=2):
        step = trainer.train_step(n_rays, cap, s_pad, n_window, **shape_kwargs)

        def run():
            st = jax.tree_util.tree_map(jnp.copy, state0)
            allstats = []
            for i in range(N_STEPS):
                st, stats = step(st, images, xforms, focal, jnp.uint32(i * n_rays))
                allstats.append(stats)
            out = jax.device_get(allstats)
            return out

        run()  # compile
        run()  # settle
        t0 = time.perf_counter()
        for _ in range(reps):
            out = run()
        dtms = (time.perf_counter() - t0) / reps / N_STEPS * 1e3
        meas = float(np.mean([np.asarray(s["measured_batch_size"]) for s in out]))
        print(f"{name:36s} {dtms:8.1f} ms/step  measured={meas:.0f}", flush=True)

    timeit("single bucket (s_short=0)", dict(s_short=0, n_long=0))
    timeit("two-bucket (s_short=64, long=2048)", dict(s_short=64, n_long=2048))
    timeit("two-bucket (s_short=128, long=2048)", dict(s_short=128, n_long=2048))


if __name__ == "__main__":
    main()
