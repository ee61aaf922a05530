"""Microbench v2: loop REPS inside one jit, force host readback, subtract roundtrip.

block_until_ready does NOT sync through the axon tunnel (measured); only a
device->host transfer does. Per-op time = (T(reps) - T(roundtrip)) / reps.
"""
import sys, time
import jax, jax.numpy as jnp, numpy as np

def measure(jitted, args, n=4):
    np.asarray(jitted(*args))  # compile+warm
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
print(f"# roundtrip baseline: {ROUNDTRIP*1e3:.2f} ms")

def per_op(fn, args, reps):
    t = measure(fn, args)
    return (t - ROUNDTRIP) / reps

REPS = 16

def report(name, fn, args, reps, unit_count, unit="row"):
    try:
        t = per_op(jax.jit(fn), args, reps)
        print(f"{name}: {t*1e3:8.3f} ms/op -> {t/unit_count*1e9:7.3f} ns/{unit}")
        return t
    except Exception as e:
        print(f"{name}: FAILED {str(e)[-200:]}")
        return None

key = jax.random.PRNGKey(0)
T = 1 << 19

# --- gathers at varying width (pair packing question) ---
for width, rows in ((2, 1<<21), (4, 1<<20), (8, 1<<19)):
    tbl = jax.random.normal(key, (T, width), jnp.float32)
    idx = jax.random.randint(key, (rows,), 0, T, jnp.int32)
    def g(tbl, idx):
        def body(i, acc):
            out = tbl[idx ^ i]
            return acc + out[::1024].sum()
        return jax.lax.fori_loop(0, REPS, body, 0.0)
    report(f"gather w={width} rows={rows>>10}K f32", g, (tbl, idx), REPS, rows)

# bf16 gather comparison
tbl = jax.random.normal(key, (T, 2), jnp.bfloat16)
idx = jax.random.randint(key, (1<<21,), 0, T, jnp.int32)
def gbf(tbl, idx):
    def body(i, acc):
        return acc + tbl[idx ^ i][::1024].sum().astype(jnp.float32)
    return jax.lax.fori_loop(0, REPS, body, 0.0)
report("gather w=2 rows=2M bf16", gbf, (tbl, idx), REPS, 1<<21)

# --- scatters ---
for width, rows, dt in ((2, 1<<21, jnp.bfloat16), (4, 1<<20, jnp.bfloat16), (2, 1<<21, jnp.float32), (4, 1<<20, jnp.float32)):
    idx = jax.random.randint(key, (rows,), 0, T, jnp.int32)
    vals = jax.random.normal(key, (rows, width), dt)
    def s(idx, vals):
        def body(i, acc):
            out = jnp.zeros((T, vals.shape[1]), vals.dtype).at[idx ^ i].add(vals)
            return acc + out[::4096].sum().astype(jnp.float32)
        return jax.lax.fori_loop(0, REPS, body, 0.0)
    report(f"scatter w={width} rows={rows>>10}K {dt.__name__}", s, (idx, vals), REPS, rows)

# --- sorts ---
for L, N in ((16, 1<<21), (16, 1<<20), (1, 1<<21)):
    keys = jax.random.randint(key, (L, N), 0, T, jnp.int32)
    pay = jax.random.randint(key, (L, N), 0, 1<<30, jnp.int32)
    def so(keys, pay):
        def body(i, acc):
            k2, p2 = jax.lax.sort((keys ^ i, pay), dimension=1, num_keys=1)
            return acc + k2[:, ::4096].sum()
        return jax.lax.fori_loop(0, 4, body, 0)
    t = per_op(jax.jit(so), (keys, pay), 4)
    print(f"sort_kv ({L},{N>>20}M+{(N>>10)&1023}K): {t*1e3:8.2f} ms/op")

# --- searchsorted 2M queries into 4K offsets (compaction) ---
R = 4096
offs = jnp.sort(jax.random.randint(key, (R,), 0, 1<<18, jnp.int32))
q = jax.random.randint(key, (1<<18,), 0, 1<<18, jnp.int32)
def ss(offs, q):
    def body(i, acc):
        return acc + jnp.searchsorted(offs, q ^ i, side="right")[::1024].sum()
    return jax.lax.fori_loop(0, REPS, body, 0)
report("searchsorted 256K into 4K", ss, (offs, q), REPS, 1<<18, "query")

# --- dense composite at (4096, 64) ---
Rr, S, N = 4096, 64, 1<<18
flat = jax.random.normal(key, (N, 4), jnp.float32)
src = jax.random.randint(key, (Rr, S), 0, N, jnp.int32)
inv = jax.random.randint(key, (N,), 0, Rr*S, jnp.int32)
def comp(flat, src, inv):
    def body(i, acc):
        padded = flat[src ^ i]
        sdt = jax.nn.softplus(padded[..., 3]) * 0.01
        a = jnp.cumsum(sdt, axis=1)
        trans = jnp.exp(-(a - sdt))
        w = trans * (1 - jnp.exp(-sdt))
        rgb = jnp.sum(w[..., None] * padded[..., :3], axis=1)
        back = (w.reshape(-1))[inv ^ i]
        return acc + rgb[::64].sum() + back[::1024].sum()
    return jax.lax.fori_loop(0, REPS, body, 0.0)
report("composite_dense 4096x64 (incl 2 gathers)", comp, (flat, src, inv), REPS, Rr*S, "sample")
