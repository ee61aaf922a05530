"""ngp_tpu — a TPU-native Instant-NGP NeRF framework (JAX / XLA / pjit).

A ground-up rebuild of the capabilities of Minglin-Chen/instant-ngp-nerf-minimal
(reference mounted read-only at /root/reference), designed TPU-first:

 * fixed-shape, masked sampling + prefix-sum compaction instead of CUDA atomics
 * closed-form t-lattice ray marching instead of divergent per-thread DDA loops
 * bf16 MXU MLPs + an oct-packed additive hash encoding (ONE XLA gather/
   scatter row per sample per level) instead of tiny-cuda-nn — measured on
   v5e, row-minimized XLA beats every Mosaic-expressible kernel for this
   access pattern (ROADMAP.md microbenchmarks; Mosaic has no general
   dynamic gather)
 * optax (Adam + exponential decay + parameter EMA) instead of the tcnn Trainer
 * data-parallel training over a `jax.sharding.Mesh` (new; the reference is
   single-GPU, SURVEY.md §2.4)

Layer map (mirrors reference layers, SURVEY.md §1):
  testbed.py     <- internal/testbed.{h,cu} + internal/python_api.cu
  data/          <- internal/dataset/
  grid/          <- internal/sampler/occupancy_sampler.{h,cu} (grid state half)
  sampling/      <- internal/sampler/occupancy_sampler.cu (ray/sample half)
  models/, ops/  <- internal/network/ngp_network.h + tiny-cuda-nn
  render/        <- internal/render/ray_marcher.{h,cu} + internal/utils/render_buffer.*
  train/         <- tcnn Trainer/optimizers + snapshot I/O (testbed.cu:127-163)
  parallel/      <- (new) DP mesh + collectives
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy import so `import ngp_tpu.utils.color` doesn't pull in jax-heavy deps
    if name in ("Testbed", "Activation", "RenderMode", "ColorSpace", "TonemapCurve", "LossType"):
        import ngp_tpu.testbed as _tb

        return getattr(_tb, name)
    raise AttributeError(name)
