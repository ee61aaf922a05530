"""Microbench v4: scan-of-levels vs one flat-table gather/scatter; pair-table
materialization placement. (axon methodology per mb2.py)"""
import sys, time
import jax, jax.numpy as jnp, numpy as np

def measure(jitted, args, n=4):
    np.asarray(jitted(*args))
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(jitted(*args))
        best = min(best, time.perf_counter() - t0)
    return best

@jax.jit
def _empty():
    return jnp.zeros(())
ROUNDTRIP = measure(_empty, ())
print(f"# roundtrip baseline: {ROUNDTRIP*1e3:.2f} ms", flush=True)

def report(name, fn, args, reps=8):
    try:
        t = (measure(jax.jit(fn), args) - ROUNDTRIP) / reps
        print(f"{name:56s} {t*1e3:8.2f} ms", flush=True)
        return t
    except Exception as e:
        print(f"{name}: FAILED {str(e)[-160:]}", flush=True)

key = jax.random.PRNGKey(0)
N = 1 << 18
L, T, F = 16, 1 << 19, 2
REPS = 8

table = jax.random.normal(key, (L, T, F), jnp.float32) * 0.1
idx = jax.random.randint(key, (L, N, 4), 0, T, jnp.int32)  # pair rows per level

# A. pair tables precomputed OUTSIDE the scan, scan gathers from slices
def f_pre(table, idx):
    def body(i, acc):
        pair = jnp.concatenate([table, jnp.roll(table, -1, axis=1)], axis=-1)  # (L,T,2F)
        def lv(_, xs):
            p_l, idx_l = xs
            return None, p_l[(idx_l + i) % T].sum(axis=(1, 2))
        _, outs = jax.lax.scan(lv, None, (pair, idx))
        return acc + outs[:, ::4096].sum()
    return jax.lax.fori_loop(0, REPS, body, 0.0)
report("fwd pair gathers, pair built OUTSIDE scan", f_pre, (table, idx))

# B. ONE flat gather, no scan: (L*T, 2F) table, level-offset indices
off = (jnp.arange(L, dtype=jnp.int32) * T)[:, None, None]
flat_idx = (idx + off).reshape(-1)
def f_flat(table, flat_idx):
    pair = jnp.concatenate([table, jnp.roll(table, -1, axis=1)], axis=-1).reshape(L * T, 2 * F)
    def body(i, acc):
        feats = pair[flat_idx ^ (i * 2)]  # (L*N*4, 2F)
        return acc + feats[::4096].sum()
    return jax.lax.fori_loop(0, REPS, body, 0.0)
report("fwd ONE flat gather (L*T,2F), 16.8M rows", f_flat, (table, flat_idx))

# C. ONE flat gather but w=2 from (L*T, F): 33.6M rows (no pairs)
idx8 = jax.random.randint(key, (L, N, 8), 0, T, jnp.int32)
flat_idx8 = (idx8 + off).reshape(-1)
def f_flat8(table, flat_idx8):
    flat = table.reshape(L * T, F)
    def body(i, acc):
        feats = flat[flat_idx8 ^ (i * 2)]
        return acc + feats[::4096].sum()
    return jax.lax.fori_loop(0, REPS, body, 0.0)
report("fwd ONE flat gather (L*T,F) w=2, 33.6M rows", f_flat8, (table, flat_idx8))

# D. scatter: scan per level (the current shape), bf16
vals = jax.random.normal(key, (L, N * 4, 2 * F), jnp.bfloat16)
def s_scan(idx, vals):
    def body(i, acc):
        def lv(_, xs):
            idx_l, v_l = xs
            a = jnp.zeros((T, 2 * F), jnp.bfloat16).at[(idx_l.reshape(-1) + i) % T].add(v_l)
            return None, a[::4096].sum().astype(jnp.float32)
        _, outs = jax.lax.scan(lv, None, (idx, vals))
        return acc + outs.sum()
    return jax.lax.fori_loop(0, REPS, body, 0.0)
report("bwd scatter per-level scan (16x1M rows)", s_scan, (idx, vals))

# E. scatter: ONE flat scatter into (L*T, 2F) bf16 (16.8M rows)
flat_vals = vals.reshape(-1, 2 * F)
def s_flat(flat_idx, flat_vals):
    def body(i, acc):
        a = jnp.zeros((L * T, 2 * F), jnp.bfloat16).at[flat_idx ^ (i * 2)].add(flat_vals)
        return acc + a[::4096].sum().astype(jnp.float32)
    return jax.lax.fori_loop(0, REPS, body, 0.0)
report("bwd ONE flat scatter (L*T,2F), 16.8M rows", s_flat, (flat_idx, flat_vals))

# F. scatter HALF the rows (stochastic-2-of-4 pair sampling cost model)
idx_h = idx[:, :, :2]
vals_h = vals[:, : N * 2, :]
def s_half(idx_h, vals_h):
    def body(i, acc):
        def lv(_, xs):
            idx_l, v_l = xs
            a = jnp.zeros((T, 2 * F), jnp.bfloat16).at[(idx_l.reshape(-1) + i) % T].add(v_l)
            return None, a[::4096].sum().astype(jnp.float32)
        _, outs = jax.lax.scan(lv, None, (idx_h, vals_h))
        return acc + outs.sum()
    return jax.lax.fori_loop(0, REPS, body, 0.0)
report("bwd scatter 2-of-4 rows (16x512K)", s_half, (idx_h, vals_h))

# G. occupancy-style gather: 9.4M bool lookups from (2,128,128,128)
occ = jax.random.uniform(key, (2, 128, 128, 128)) < 0.3
R, NL = 8192, 1152
ci = jax.random.randint(key, (R, NL), 0, 128, jnp.int32)
def g_occ(occ, ci):
    def body(i, acc):
        c = (ci + i) % 128
        v = occ[0, c, (c + 1) % 128, (c + 7) % 128]
        return acc + v[:, ::256].sum()
    return jax.lax.fori_loop(0, REPS, body, 0.0)
report("occupancy 9.4M bool gathers (8192x1152)", g_occ, (occ, ci))

# H. same from a bit-PACKED (2,128,128,4) uint32 grid
occ_packed = jax.random.randint(key, (2, 128, 128, 4), 0, 1 << 30, jnp.uint32)
def g_packed(occ_packed, ci):
    def body(i, acc):
        c = (ci + i) % 128
        w = occ_packed[0, c, (c + 1) % 128, ((c + 7) % 128) // 32]
        bit = (w >> (((c + 7) % 128) % 32).astype(jnp.uint32)) & 1
        return acc + bit[:, ::256].sum()
    return jax.lax.fori_loop(0, REPS, body, 0.0)
report("occupancy bit-packed gathers (8192x1152)", g_packed, (occ_packed, ci))
