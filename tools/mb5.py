"""Microbench v5: occupancy-gather dtype/shape variants; small-table scatters
(dense hash levels). Axon methodology per mb2.py."""
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
REPS = 8
M = 1 << 23  # 8M lookups (~ rendering-scale; training is 9.4M)
G3 = 2 * 128 * 128 * 128  # 4.2M cells
flat_idx = jax.random.randint(key, (M,), 0, G3, jnp.int32)

for name, tbl in [
    ("bool", jax.random.uniform(key, (G3,)) < 0.3),
    ("uint8", (jax.random.uniform(key, (G3,)) < 0.3).astype(jnp.uint8)),
    ("int32", (jax.random.uniform(key, (G3,)) < 0.3).astype(jnp.int32)),
    ("float32", (jax.random.uniform(key, (G3,)) < 0.3).astype(jnp.float32)),
]:
    def g(tbl, flat_idx):
        def body(i, acc):
            v = tbl[flat_idx ^ i]
            return acc + v[::1024].sum().astype(jnp.float32)
        return jax.lax.fori_loop(0, REPS, body, 0.0)
    report(f"occ gather 8M w=1 flat idx, {name} table", g, (tbl, flat_idx))

# 2-D idx shape effect
tbl_b = jax.random.uniform(key, (G3,)) < 0.3
idx2d = flat_idx.reshape(8192, 1024)
def g2(tbl, idx2d):
    def body(i, acc):
        v = tbl[idx2d ^ i]
        return acc + v[:, ::256].sum().astype(jnp.float32)
    return jax.lax.fori_loop(0, REPS, body, 0.0)
report("occ gather 8M (8192,1024) idx, bool", g2, (tbl_b, idx2d))

# chunked via scan (the count-pass structure): 8 chunks of (8192,128)
idx3d = flat_idx.reshape(8, 8192, 128)
def g3(tbl, idx3d):
    def body(i, acc):
        def ch(c, idx_c):
            return c + tbl[idx_c ^ i][:, ::64].sum().astype(jnp.float32), None
        c, _ = jax.lax.scan(ch, 0.0, idx3d)
        return acc + c
    return jax.lax.fori_loop(0, REPS, body, 0.0)
report("occ gather 8M scan of 8x(8192,128), bool", g3, (tbl_b, idx3d))

# small-table scatters: dense hash levels (operand rows 4K..512K)
N4 = 1 << 20  # 1M rows, bf16 w=4
vals = jax.random.normal(key, (N4, 4), jnp.bfloat16)
for Tl in (4096, 32768, 262144, 524288):
    idx = jax.random.randint(key, (N4,), 0, Tl, jnp.int32)
    def s(idx, vals):
        def body(i, acc):
            a = jnp.zeros((Tl, 4), jnp.bfloat16).at[idx ^ i].add(vals)
            return acc + a[:: max(Tl // 128, 1)].sum().astype(jnp.float32)
        return jax.lax.fori_loop(0, REPS, body, 0.0)
    report(f"scatter 1M bf16 w=4 rows into T={Tl}", s, (idx, vals))

# gather from small tables (dense levels fwd)
for Tl in (4096, 262144):
    tblf = jax.random.normal(key, (Tl, 4), jnp.float32)
    idxg = jax.random.randint(key, (N4,), 0, Tl, jnp.int32)
    def gg(tblf, idxg):
        def body(i, acc):
            return acc + tblf[idxg ^ i][::1024].sum()
        return jax.lax.fori_loop(0, REPS, body, 0.0)
    report(f"gather 1M f32 w=4 rows from T={Tl}", gg, (tblf, idxg))
