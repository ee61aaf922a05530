"""mb12: decompose the packed inference network forward on the real chip.

Times, at the compositing budget (2^17) and 2x it: the packed hash encode
alone (pure gathers), SH encode alone, the two MLP heads alone, and the full
rgbsigma_raw — answering how far the composite's per-sample cost sits above
the measured ~4.3 ns/row gather floor (16 rows/sample = ~69 ns/sample).

Methodology (ROADMAP.md): block_until_ready does not synchronize through the
axon tunnel, and a device->host readback costs a fixed ~26.6 ms — so each op
is chained K times inside ONE jit (data-dependent, defeating CSE) and the
per-op cost is (t_K - t_1) / (K - 1) with a single readback each.

Run: python tools/mb12_net.py
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


def chained(op, k):
    """jit(op applied k times, each dependent on the last result's sum)."""

    def run(*args):
        acc = jnp.float32(0.0)
        for _ in range(k):
            acc = acc * 1e-30 + op(*args, acc)
        return acc

    return jax.jit(run)


def main():
    try:
        from ngp_tpu.utils.compile_cache import enable_persistent_compile_cache

        enable_persistent_compile_cache()
    except Exception:
        pass

    from ngp_tpu.models.ngp import NGPModel
    from ngp_tpu.ops.hash_encoding import hash_encode_packed
    from ngp_tpu.ops.mlp import mlp_apply
    from ngp_tpu.ops.sh_encoding import sh_encode
    from ngp_tpu.utils.config import NGPConfig

    config = NGPConfig.from_json({})
    model = NGPModel.create(config.network)
    params = model.init(jax.random.PRNGKey(0))
    prep = jax.jit(model.prepare_inference)(params)
    spec = model.grid_spec
    dcfg = config.network.density_mlp
    rcfg = config.network.rgb_mlp
    K = 8

    def measure(name, op, args, n):
        f1, fk = chained(op, 1), chained(op, K)
        sync(f1(*args))
        sync(fk(*args))
        t0 = time.perf_counter()
        sync(f1(*args))
        t1 = time.perf_counter()
        sync(fk(*args))
        t2 = time.perf_counter()
        ms = ((t2 - t1) - (t1 - t0)) / (K - 1) * 1e3
        print(f"{name:26s} {ms:8.2f} ms  {ms/n*1e6:7.1f} ns/sample", flush=True)

    for logn in (17, 18):
        n = 1 << logn
        pos = jax.random.uniform(jax.random.PRNGKey(1), (n, 3))
        dirs = jax.random.uniform(jax.random.PRNGKey(2), (n, 3))
        enc = jax.jit(lambda p, x: hash_encode_packed(p["hash_packed"], x, spec))(prep, pos)
        dout = jax.jit(
            lambda p, e: mlp_apply(p["density_mlp"], e, dcfg.activation, dcfg.output_activation)
        )(prep, enc)
        sh = jax.jit(lambda d: sh_encode(d, config.network.sh_degree))(dirs)

        print(f"--- N = 2^{logn} = {n}")
        measure(
            "hash_encode_packed",
            lambda p, x, a: hash_encode_packed(p["hash_packed"], x + a * 0, spec).sum(),
            (prep, pos),
            n,
        )
        measure(
            "sh_encode",
            lambda d, a: sh_encode(d + a * 0, config.network.sh_degree).sum(),
            (dirs,),
            n,
        )
        measure(
            "density_mlp",
            lambda p, e, a: mlp_apply(
                p["density_mlp"], e + a * 0, dcfg.activation, dcfg.output_activation
            ).sum(),
            (prep, enc),
            n,
        )
        measure(
            "rgb_mlp",
            lambda p, e, s, a: mlp_apply(
                p["rgb_mlp"],
                jnp.concatenate([e + a * 0, s], axis=-1),
                rcfg.activation,
                rcfg.output_activation,
            ).sum(),
            (prep, dout, sh),
            n,
        )
        measure(
            "full rgbsigma packed",
            lambda p, x, d, a: sum(z.sum() for z in model.rgbsigma_raw(p, x + a * 0, d)),
            (prep, pos, dirs),
            n,
        )


if __name__ == "__main__":
    main()
