"""Mosaic (Pallas TPU) dynamic-gather lowering probes — the ROADMAP ~10x ideas.

Questions this answers with evidence (VERDICT r4 next-step #1):
 1. Does `jnp.take_along_axis` lower inside a TPU Pallas kernel, and for
    which source sizes along the gather axis (single vreg = 8 sublanes f32,
    or multi-vreg)?
 2. If it lowers, what is the per-element cost vs XLA's ~4.3-7.9 ns/row
    gather floor?
 3. What does an MXU one-hot gather cost per row for small tables?

Each probe reports LOWERED/FAILED with the exact error, then a timed rate.
Run: python tools/mb23_mosaic_gather.py
"""

import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = 64  # in-kernel repeat to amortize dispatch + readback


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def report(name, fn, n_elems):
    try:
        out = fn()
        jax.block_until_ready(out)
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"{name:44s} FAILED: {msg}", flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(4):
        out = fn()
    sync(out)
    dt = (time.perf_counter() - t0) / 4
    per = dt / (n_elems * REPS) * 1e9
    print(f"{name:44s} LOWERED  {per:8.3f} ns/elem  ({dt*1e3:.1f} ms/call)", flush=True)
    return per


def probe_take_along_axis(S, N):
    """src (S,128) f32, idx (N,128) i32, take_along_axis axis=0."""
    key = jax.random.PRNGKey(0)
    src = jax.random.normal(key, (S, 128), jnp.float32)
    idx = jax.random.randint(key, (N, 128), 0, S)

    def kernel(s_ref, i_ref, o_ref):
        def body(k, acc):
            return acc + jnp.take_along_axis(s_ref[:], i_ref[:] + k * 0, axis=0)

        o_ref[:] = jax.lax.fori_loop(0, REPS, body, jnp.zeros((N, 128), jnp.float32))

    @jax.jit
    def run(src, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(src, idx)

    return report(f"take_along_axis src=({S},128) idx=({N},128)", lambda: run(src, idx), N * 128)


def probe_vreg_select_tree(S, N):
    """Gather from (S,128) via a fori_loop select tree (S/8 vregs)."""
    key = jax.random.PRNGKey(0)
    src = jax.random.normal(key, (S, 128), jnp.float32)
    idx = jax.random.randint(key, (N, 128), 0, S)

    def kernel(s_ref, i_ref, o_ref):
        idxv = i_ref[:]

        def rep(_, acc0):
            def body(w, acc):
                # vreg w covers rows [8w, 8w+8); per-lane 8-way gather in it
                sub = jnp.take_along_axis(
                    s_ref[pl.ds(w * 8, 8), :], jnp.clip(idxv - w * 8, 0, 7), axis=0
                )
                hit = (idxv >= w * 8) & (idxv < w * 8 + 8)
                # broadcast the vreg-local gather result across N rows
                g = sub[jnp.zeros((1,), jnp.int32)[0] + 0 : 8, :]  # noop slice
                # pick per-row: rows of `sub` map by idx-local value; emulate via where
                return jnp.where(hit, jnp.take_along_axis(s_ref[pl.ds(w * 8, 8), :], jnp.clip(idxv - w * 8, 0, 7), axis=0), acc)

            return jax.lax.fori_loop(0, S // 8, body, acc0)

        o_ref[:] = jax.lax.fori_loop(0, REPS, rep, jnp.zeros((N, 128), jnp.float32))

    @jax.jit
    def run(src, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(src, idx)

    return report(f"select-tree src=({S},128) idx=({N},128)", lambda: run(src, idx), N * 128)


def probe_onehot_mxu(T, N):
    """MXU one-hot gather: out (N,16) = onehot(N,T) @ tbl (T,16), bf16."""
    key = jax.random.PRNGKey(0)
    tbl = jax.random.normal(key, (T, 16), jnp.bfloat16)
    idx = jax.random.randint(key, (N, 1), 0, T)

    def kernel(t_ref, i_ref, o_ref):
        cols = jax.lax.broadcasted_iota(jnp.int32, (N, T), 1)

        def body(k, acc):
            oh = (cols == (i_ref[:] + k * 0)).astype(jnp.bfloat16)
            return acc + jnp.dot(oh, t_ref[:], preferred_element_type=jnp.float32)

        o_ref[:] = jax.lax.fori_loop(0, REPS, body, jnp.zeros((N, 16), jnp.float32))

    @jax.jit
    def run(tbl, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, 16), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tbl, idx)

    return report(f"onehot-MXU tbl=({T},16) N={N}", lambda: run(tbl, idx), N)


def probe_xla_gather_ref(T, N, W):
    """XLA reference: N rows of width W from (T,W) f32 (in-jit REPS loop)."""
    key = jax.random.PRNGKey(0)
    tbl = jax.random.normal(key, (T, W), jnp.float32)
    idx = jax.random.randint(key, (REPS, N), 0, T)

    @jax.jit
    def run(tbl, idx):
        def body(_, i):
            return None, tbl[i].sum()

        _, s = jax.lax.scan(body, None, idx)
        return s.sum()

    return report(f"XLA gather (T={T},{W}) N={N} rows", lambda: run(tbl, idx), N)


def main():
    print(f"# jax {jax.__version__} devices={jax.devices()}")
    # 1. single-vreg (8 sublanes f32)
    probe_take_along_axis(8, 1024)
    # 2. multi-vreg along gather dim
    probe_take_along_axis(64, 1024)
    probe_take_along_axis(512, 1024)
    probe_take_along_axis(4096, 1024)
    # full finest-level column height
    probe_take_along_axis(4096, 2048)
    # 3. select tree over vregs (expected slow; measures the select cost)
    probe_vreg_select_tree(64, 1024)
    # 4. one-hot MXU for small dense levels
    probe_onehot_mxu(4096, 2048)
    probe_onehot_mxu(32768, 1024)
    # 5. XLA reference floors at matching sizes
    probe_xla_gather_ref(524288, 262144, 16)
    probe_xla_gather_ref(4096, 262144, 16)


if __name__ == "__main__":
    main()
