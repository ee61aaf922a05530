"""AOT compile-memory check for the fused train scan under the stochastic
backward (VERDICT r4 #8): does an n-step scan fit the chip's 15.75 GB HBM?

Compiles (no execution) the train_call at bench-like shapes for several scan
lengths and prints XLA's memory analysis. Run on the real chip:
  python tools/mb25_scan_hbm.py [n_rays] [capacity] [s_pad]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    n_rays = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
    capacity = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 18
    s_pad = int(sys.argv[3]) if len(sys.argv) > 3 else 512

    from ngp_tpu.data.synthetic import write_synthetic_dataset
    from ngp_tpu.data.nerf_synthetic import load_nerf_synthetic
    from ngp_tpu.train.trainer import Trainer
    from ngp_tpu.utils.config import NGPConfig

    cache = Path("/tmp/ngp_tpu_bench_scene_v1")
    if not (cache / "transforms_train.json").exists():
        cache.mkdir(parents=True, exist_ok=True)
        write_synthetic_dataset(cache, n_train=12, n_test=1, width=96, height=96)
    ds = load_nerf_synthetic(cache / "transforms_train.json")

    config = NGPConfig.from_json({})
    assert config.network.encoding.stochastic_corner_backward
    trainer = Trainer.create(config)
    trainer.sample_capacity = capacity
    state = trainer.init_state(seed=0)

    # bench-like shape tuple (steady state r4: window 1152, s_short 32,
    # n_long n_rays/4, seg cap off)
    kw = dict(n_window=1152, s_short=32, n_long=max(n_rays // 4, 1), n_seg_cap=0)

    for n_steps in (16, 8, 4, 2):
        call = trainer.train_call(n_rays, capacity, s_pad, n_steps, **kw)
        try:
            lowered = call.lower(
                state, ds.images, ds.xforms, jnp.asarray(ds.focal_length), jnp.uint32(0)
            )
            compiled = lowered.compile()
            ma = compiled.memory_analysis()
            tot = getattr(ma, "temp_size_in_bytes", None)
            arg = getattr(ma, "argument_size_in_bytes", None)
            out = getattr(ma, "output_size_in_bytes", None)
            print(
                f"n_steps={n_steps:3d}: temp={tot/1e9 if tot else None} GB "
                f"args={arg/1e9 if arg else None} GB out={out/1e9 if out else None} GB",
                flush=True,
            )
        except Exception as e:
            print(f"n_steps={n_steps:3d}: COMPILE FAILED: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
