"""TPU primitive microbenchmarks that decide the round-2 Pallas kernel designs.

Run on the real chip:  python tools/microbench.py [names...]

Each experiment prints one line; results get recorded in ROADMAP.md.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, n=5):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else jax.block_until_ready(fn(*args))
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def bench_vmem_probe():
    """How much VMEM can one kernel hold? (v5e spec says 128 MiB)"""
    for mb in (16, 32, 48, 64, 96, 112, 120):
        n = mb * 1024 * 1024 // 4 // 128

        def kern(x_ref, o_ref, scratch):
            scratch[:] = x_ref[:]
            o_ref[0, 0] = jnp.sum(scratch[0:8, :])

        try:
            f = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
                scratch_shapes=[pltpu.VMEM((n, 128), jnp.float32)],
            )
            x = jnp.ones((n, 128), jnp.float32)
            jax.block_until_ready(jax.jit(f)(x))
            print(f"vmem_probe: {mb} MiB scratch+input OK")
        except Exception as e:
            print(f"vmem_probe: {mb} MiB FAILED: {str(e)[:120]}")
            break


def bench_dyn_gather_lowering():
    """Does shapes-match take_along_axis lower in Mosaic, and how fast?

    Gather pattern: out[i,l] = tbl[idx[i,l], l] with tbl/idx/out all (S,128).
    The real fwd kernel does 512 such calls per level (2M corner fetches).
    """
    S = 4096
    REPS = 64  # gathers per kernel invocation

    def kern(tbl_ref, idx_ref, o_ref):
        acc = jnp.zeros((S, 128), jnp.float32)
        for r in range(REPS):
            acc = acc + jnp.take_along_axis(tbl_ref[:], idx_ref[r], axis=0)
        o_ref[:] = acc

    f = jax.jit(
        pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((S, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
    )
    key = jax.random.PRNGKey(0)
    tbl = jax.random.normal(key, (S, 128), jnp.float32)
    idx = jax.random.randint(key, (REPS, S, 128), 0, S, jnp.int32)
    try:
        t = timeit(f, tbl, idx)
        rows = REPS * S
        print(
            f"dyn_gather: OK  {t*1e3:.3f} ms for {rows} gathered rows of 128 lanes "
            f"-> {t/rows*1e9:.2f} ns/row, {rows*128/t/1e9:.1f} Gelem/s"
        )
    except Exception as e:
        print(f"dyn_gather: FAILED: {str(e)[:300]}")


def bench_dyn_gather_bf16():
    S = 4096
    REPS = 64

    def kern(tbl_ref, idx_ref, o_ref):
        acc = jnp.zeros((S, 128), jnp.bfloat16)
        for r in range(REPS):
            acc = acc + jnp.take_along_axis(tbl_ref[:], idx_ref[r], axis=0)
        o_ref[:] = acc

    f = jax.jit(
        pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((S, 128), jnp.bfloat16),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
    )
    key = jax.random.PRNGKey(0)
    tbl = jax.random.normal(key, (S, 128), jnp.bfloat16)
    idx = jax.random.randint(key, (REPS, S, 128), 0, S, jnp.int32)
    try:
        t = timeit(f, tbl, idx)
        rows = REPS * S
        print(f"dyn_gather_bf16: OK  {t*1e3:.3f} ms -> {t/rows*1e9:.2f} ns/row")
    except Exception as e:
        print(f"dyn_gather_bf16: FAILED: {str(e)[:200]}")


def bench_row_fetch_lane_select():
    """Full fwd-gather simulation for ONE level at training scale.

    2^21 corner fetches (2^18 samples x 8 corners) from a (4096,128) table:
    row-fetch via shapes-match take_along_axis (idx broadcast per row) +
    one-hot lane select + weighted accumulate.
    """
    S = 4096
    N_BLOCKS = 512  # 512 * 4096 = 2M fetches

    def kern(tbl_ref, row_ref, lane_ref, o_ref):
        def body(b, acc):
            rows = jnp.take_along_axis(tbl_ref[:], row_ref[b], axis=0)  # (S,128)
            lid = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1)
            sel = jnp.where(lane_ref[b] == lid, rows, 0.0)
            return acc + jnp.sum(sel, axis=1, keepdims=True)

        acc = jax.lax.fori_loop(0, N_BLOCKS, body, jnp.zeros((S, 1), jnp.float32))
        o_ref[:] = acc

    f = jax.jit(
        pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((S, 1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
    )
    key = jax.random.PRNGKey(0)
    tbl = jax.random.normal(key, (S, 128), jnp.float32)
    rows = jax.random.randint(key, (N_BLOCKS, S, 1), 0, S, jnp.int32)
    rows = jnp.broadcast_to(rows, (N_BLOCKS, S, 128))
    lanes = jax.random.randint(key, (N_BLOCKS, S, 128), 0, 128, jnp.int32)  # only col 0 meaningful
    try:
        t = timeit(f, tbl, rows, lanes)
        fetches = N_BLOCKS * S
        print(
            f"row_fetch_lane_select: OK  {t*1e3:.2f} ms for {fetches} fetches "
            f"-> {t/fetches*1e9:.2f} ns/fetch (x16 levels = {16*t*1e3:.1f} ms/step)"
        )
    except Exception as e:
        print(f"row_fetch_lane_select: FAILED: {str(e)[:300]}")


def bench_xla_gather_baseline():
    """Round-1 XLA hash-gather cost, per level: 2M row-gathers from (2^19, 2)."""
    T, N = 1 << 19, 1 << 21
    key = jax.random.PRNGKey(0)
    tbl = jax.random.normal(key, (T, 2), jnp.float32)
    idx = jax.random.randint(key, (N,), 0, T, jnp.int32)

    @jax.jit
    def f(tbl, idx):
        return tbl[idx]

    t = timeit(f, tbl, idx)
    print(f"xla_gather: {t*1e3:.2f} ms per level -> {t/N*1e9:.2f} ns/row (x16 = {16*t*1e3:.0f} ms)")


def bench_xla_scatter_baseline():
    T, N = 1 << 19, 1 << 21
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (N,), 0, T, jnp.int32)
    vals = jax.random.normal(key, (N, 2), jnp.bfloat16)

    @jax.jit
    def f(idx, vals):
        return jnp.zeros((T, 2), jnp.bfloat16).at[idx].add(vals)

    t = timeit(f, idx, vals)
    print(f"xla_scatter_bf16: {t*1e3:.2f} ms per level (x16 = {16*t*1e3:.0f} ms)")


def bench_sort():
    """Batched vs single sort of per-level corner indices (+payload)."""
    N = 1 << 21
    key = jax.random.PRNGKey(0)

    for L in (1, 4, 16):
        keys = jax.random.randint(key, (L, N), 0, 1 << 19, jnp.int32)
        payload = jax.random.randint(key, (L, N), 0, N, jnp.int32)

        @jax.jit
        def f(k, p):
            return jax.lax.sort((k, p), dimension=1, num_keys=1)

        t = timeit(f, keys, payload)
        print(f"sort_kv batched L={L:2d}: {t*1e3:.2f} ms ({t/L*1e3:.2f} ms/level)")


def bench_sort_key_only():
    N = 1 << 21
    key = jax.random.PRNGKey(0)
    for L in (1, 16):
        keys = jax.random.randint(key, (L, N), 0, 1 << 19, jnp.int32)

        @jax.jit
        def f(k):
            return jnp.sort(k, axis=1)

        t = timeit(f, keys)
        print(f"sort_key_only L={L:2d}: {t*1e3:.2f} ms")


def bench_searchsorted():
    """Compaction-by-binary-search: probe XLA searchsorted cost at batch scale."""
    N = 1 << 21
    key = jax.random.PRNGKey(0)
    cum = jnp.sort(jax.random.randint(key, (N,), 0, 1 << 20, jnp.int32))
    q = jax.random.randint(key, (N,), 0, 1 << 20, jnp.int32)

    @jax.jit
    def f(cum, q):
        return jnp.searchsorted(cum, q)

    t = timeit(f, cum, q)
    print(f"searchsorted 2M/2M: {t*1e3:.2f} ms")

    R = 4096
    offs = jnp.sort(jax.random.randint(key, (R,), 0, N, jnp.int32))

    @jax.jit
    def g(offs, q):
        return jnp.searchsorted(offs, q, side="right")

    t = timeit(g, offs, q)
    print(f"searchsorted 2M queries into 4K offsets: {t*1e3:.2f} ms")


def bench_mxu_window_scatter():
    """Sorted-window MXU scatter-accumulate: one level's backward.

    After sorting 2M (idx, contrib) pairs, process chunks of 1024 rows whose
    indices fall in a 2048-wide window: d_window += onehot^T @ contrib.
    Simulated with static windows to measure the MXU+onehot cost only.
    """
    CH, W, NCH = 1024, 2048, 2048  # 2M rows total

    def kern(loc_ref, val_ref, o_ref):
        def body(c, _):
            loc = loc_ref[c]  # (CH, 1) int32 in [0, W)
            v = val_ref[c]  # (CH, 2)
            wid = jax.lax.broadcasted_iota(jnp.int32, (CH, W), 1)
            onehot = (loc == wid).astype(jnp.bfloat16)  # (CH, W)
            upd = jax.lax.dot_general(
                onehot, v.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (W, 2)
            o_ref[:] = o_ref[:] + upd
            return _

        o_ref[:] = jnp.zeros((W, 2), jnp.float32)
        jax.lax.fori_loop(0, NCH, body, 0)

    f = jax.jit(
        pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((W, 2), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
    )
    key = jax.random.PRNGKey(0)
    loc = jax.random.randint(key, (NCH, CH, 1), 0, W, jnp.int32)
    val = jax.random.normal(key, (NCH, CH, 2), jnp.float32)
    try:
        t = timeit(f, loc, val)
        rows = NCH * CH
        print(
            f"mxu_window_scatter: OK {t*1e3:.2f} ms for {rows} rows "
            f"-> {t/rows*1e9:.2f} ns/row (x16 = {16*t*1e3:.0f} ms)"
        )
    except Exception as e:
        print(f"mxu_window_scatter: FAILED: {str(e)[:300]}")


def bench_lane_route_scatter():
    """Sort-free backward candidate: accumulate rows into a VMEM table copy.

    For contribution n -> (row r_n, lane l_n): tblacc[r_n, :] += v_n*onehot(l_n).
    There is no dynamic-scatter primitive, so this measures the one-hot MATMUL
    form at 4096-row table granularity: tblacc += onehot_rows^T @ masked_vals
    with onehot (CH, 4096) — expected to be slow; kept for the record.
    """
    CH, TR, NCH = 512, 4096, 128  # 64K rows only (extrapolate)

    def kern(r_ref, mv_ref, o_ref):
        def body(c, _):
            r = r_ref[c]  # (CH, 1)
            rid = jax.lax.broadcasted_iota(jnp.int32, (CH, TR), 1)
            onehot = (r == rid).astype(jnp.bfloat16)  # (CH, TR)
            upd = jax.lax.dot_general(
                onehot, mv_ref[c], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (TR, 128)
            o_ref[:] = o_ref[:] + upd
            return _

        o_ref[:] = jnp.zeros((TR, 128), jnp.float32)
        jax.lax.fori_loop(0, NCH, body, 0)

    f = jax.jit(
        pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((TR, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
    )
    key = jax.random.PRNGKey(0)
    r = jax.random.randint(key, (NCH, CH, 1), 0, TR, jnp.int32)
    mv = jax.random.normal(key, (NCH, CH, 128), jnp.bfloat16)
    try:
        t = timeit(f, r, mv)
        rows = NCH * CH
        scale = (1 << 21) / rows
        print(
            f"lane_route_scatter: OK {t*1e3:.2f} ms for {rows} rows "
            f"-> full level ~{t*scale*1e3:.0f} ms (x16 = {16*t*scale*1e3:.0f} ms)"
        )
    except Exception as e:
        print(f"lane_route_scatter: FAILED: {str(e)[:300]}")


def bench_gather_width():
    """Does XLA gather cost scale with row width? (pair-packing feasibility)"""
    T, N = 1 << 19, 1 << 21
    key = jax.random.PRNGKey(0)
    for width, rows in ((2, N), (4, N // 2), (8, N // 4), (16, N // 8)):
        tbl = jax.random.normal(key, (T, width), jnp.float32)
        idx = jax.random.randint(key, (rows,), 0, T, jnp.int32)

        @jax.jit
        def f(tbl, idx):
            return tbl[idx]

        t = timeit(f, tbl, idx)
        print(f"gather rows={rows>>10}K width={width:2d} f32: {t*1e3:6.2f} ms -> {t/rows*1e9:.2f} ns/row")


def bench_scatter_width():
    T, N = 1 << 19, 1 << 21
    key = jax.random.PRNGKey(0)
    for width, rows in ((2, N), (4, N // 2), (8, N // 4)):
        idx = jax.random.randint(key, (rows,), 0, T, jnp.int32)
        vals = jax.random.normal(key, (rows, width), jnp.bfloat16)

        @jax.jit
        def f(idx, vals):
            return jnp.zeros((T, width), jnp.bfloat16).at[idx].add(vals)

        t = timeit(f, idx, vals)
        print(f"scatter rows={rows>>10}K width={width:2d} bf16: {t*1e3:6.2f} ms -> {t/rows*1e9:.2f} ns/row")


def bench_sort_kv_scales():
    """k-v sorts at candidate backward shapes (key idx i32, payload packed i32)."""
    key = jax.random.PRNGKey(0)
    for L, N in ((16, 1 << 21), (16, 1 << 20), (8, 1 << 20), (16, 1 << 18)):
        keys = jax.random.randint(key, (L, N), 0, 1 << 19, jnp.int32)
        pay = jax.random.randint(key, (L, N), 0, 1 << 30, jnp.int32)

        @jax.jit
        def f(k, p):
            return jax.lax.sort((k, p), dimension=1, num_keys=1)

        t = timeit(f, keys, pay)
        print(f"sort_kv ({L},{N>>20 if N>=1<<20 else N>>10}{'M' if N>=1<<20 else 'K'}): {t*1e3:.2f} ms")


def bench_sorted_fold_scatter():
    """bwd candidate A (pure XLA): sort -> segment-fold equal neighbors -> scatter unique.

    After a k-v sort, equal indices are adjacent; fold with a segmented
    prefix trick then scatter with ~U<=T unique rows. Measures the whole chain.
    """
    T, N = 1 << 19, 1 << 21
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (N,), 0, T, jnp.int32)
    vals = jax.random.normal(key, (N, 2), jnp.float32)

    @jax.jit
    def f(idx, vals):
        pack = (vals[:, 0].astype(jnp.float32), vals[:, 1].astype(jnp.float32))
        sk, v0, v1 = jax.lax.sort((idx, pack[0], pack[1]), dimension=0, num_keys=1)
        # run-boundary detection
        newseg = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
        # inclusive cumsum then pick last element of each run via next-boundary
        c0, c1 = jnp.cumsum(v0), jnp.cumsum(v1)
        is_last = jnp.concatenate([sk[1:] != sk[:-1], jnp.ones((1,), bool)])
        # value of run = cumsum at last - cumsum at (previous run's last)
        prev = jnp.where(newseg, 0.0, 1.0)  # placeholder to keep ops comparable
        run_sum0 = jnp.where(is_last, c0, 0.0)
        run_sum1 = jnp.where(is_last, c1, 0.0)
        # scatter only last-of-run rows (others dropped via index=T)
        dest = jnp.where(is_last, sk, T)
        out = jnp.zeros((T, 2), jnp.float32).at[dest].add(
            jnp.stack([run_sum0, run_sum1], -1), mode="drop"
        )
        return out

    t = timeit(f, idx, vals)
    print(f"sorted_fold_scatter (1 level, 2M): {t*1e3:.2f} ms  (x16 = {16*t*1e3:.0f} ms)")


def bench_dyn_gather_single_vreg():
    """Confirm single-vreg-source dynamic_gather works + throughput."""
    S = 4096
    REPS = 64

    def kern(tbl_ref, idx_ref, o_ref):
        acc = jnp.zeros((S, 128), jnp.float32)
        tbl = tbl_ref[:]  # (8, 128)
        for r in range(REPS):
            acc = acc + jnp.take_along_axis(tbl, idx_ref[r] % 8, axis=0)
        o_ref[:] = acc

    f = jax.jit(
        pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((S, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
    )
    key = jax.random.PRNGKey(0)
    tbl = jax.random.normal(key, (8, 128), jnp.float32)
    idx = jax.random.randint(key, (REPS, S, 128), 0, 8, jnp.int32)
    try:
        t = timeit(f, tbl, idx)
        n = REPS * S * 128
        print(f"dyn_gather_1vreg: OK {t*1e3:.3f} ms for {n} elems -> {n/t/1e9:.1f} Gelem/s")
    except Exception as e:
        print(f"dyn_gather_1vreg: FAILED {str(e)[-300:]}")


def bench_composite_dense():
    """Projected composite cost in the dense (R,S) layout: two 262K-row
    gathers + cumsum/exp/weighted reductions."""
    R, S, N = 4096, 64, 1 << 18
    key = jax.random.PRNGKey(0)
    flat = jax.random.normal(key, (N, 4), jnp.float32)
    src = jax.random.randint(key, (R, S), 0, N, jnp.int32)
    inv = jax.random.randint(key, (N,), 0, R * S, jnp.int32)

    @jax.jit
    def f(flat, src, inv):
        padded = flat[src]  # (R,S,4)
        sigma_dt = jax.nn.softplus(padded[..., 3]) * 0.01
        acc = jnp.cumsum(sigma_dt, axis=1)
        trans = jnp.exp(-(acc - sigma_dt))
        w = trans * (1 - jnp.exp(-sigma_dt))
        rgb = jnp.sum(w[..., None] * padded[..., :3], axis=1)
        # pull per-sample values back to flat order (bwd analogue)
        back = (w.reshape(-1))[inv]
        return rgb, back

    t = timeit(f, flat, src, inv)
    print(f"composite_dense (4096x64): {t*1e3:.2f} ms")


ALL = {
    "gather_width": bench_gather_width,
    "scatter_width": bench_scatter_width,
    "sort_kv_scales": bench_sort_kv_scales,
    "sorted_fold": bench_sorted_fold_scatter,
    "dyn_gather_1vreg": bench_dyn_gather_single_vreg,
    "composite_dense": bench_composite_dense,
    "vmem": bench_vmem_probe,
    "dyn_gather": bench_dyn_gather_lowering,
    "dyn_gather_bf16": bench_dyn_gather_bf16,
    "row_fetch": bench_row_fetch_lane_select,
    "xla_gather": bench_xla_gather_baseline,
    "xla_scatter": bench_xla_scatter_baseline,
    "sort": bench_sort,
    "sort_key": bench_sort_key_only,
    "searchsorted": bench_searchsorted,
    "mxu_window": bench_mxu_window_scatter,
    "lane_route": bench_lane_route_scatter,
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(ALL)
    print(f"# device: {jax.devices()[0].device_kind}")
    for n in names:
        try:
            ALL[n]()
        except Exception as e:
            print(f"{n}: CRASHED {str(e)[:200]}")
