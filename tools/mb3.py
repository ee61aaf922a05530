"""Microbench v3: where do the hash-encode ms go? (axon methodology: in-jit
REPS loop + host readback, subtract roundtrip; see mb2.py)."""
import sys, time
import jax, jax.numpy as jnp, numpy as np

sys.path.insert(0, ".")

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
        print(f"{name:52s} {t*1e3:8.2f} ms", flush=True)
        return t
    except Exception as e:
        print(f"{name}: FAILED {str(e)[-160:]}", flush=True)

key = jax.random.PRNGKey(0)
N = 1 << 18
L, T, F = 16, 1 << 19, 2
REPS = 8

from ngp_tpu.ops.hash_encoding import HashGridSpec, _encode_xadd, _bwd_xadd, hash_encode
from ngp_tpu.utils.config import HashEncodingConfig

spec = HashGridSpec.create(HashEncodingConfig())
table = jax.random.normal(key, (L, spec.padded_size, F), jnp.float32) * 0.1
pos = jax.random.uniform(key, (N, 3))
g = jax.random.normal(key, (N, L * F), jnp.float32)

# 1. the real fwd
def f_real(table, pos):
    def body(i, acc):
        out = _encode_xadd(table, pos + i * 1e-9, spec)
        return acc + out[::4096].sum()
    return jax.lax.fori_loop(0, REPS, body, 0.0)
report("fwd real (_encode_xadd)", f_real, (table, pos))

# 2. raw gathers only: same rows, fixed random idx, scan over levels
idx = jax.random.randint(key, (L, N, 4), 0, T, jnp.int32)
def f_raw(table, idx):
    def body(i, acc):
        def lv(_, xs):
            tbl_l, idx_l = xs
            pair = jnp.concatenate([tbl_l, jnp.roll(tbl_l, -1, axis=0)], axis=-1)
            feats = pair[(idx_l + i) % T]  # (N,4,2F)
            return None, feats.sum(axis=(1, 2))
        _, outs = jax.lax.scan(lv, None, (table, idx))
        return acc + outs[:, ::4096].sum()
    return jax.lax.fori_loop(0, REPS, body, 0.0)
report("fwd raw pair-gathers, scan, (N,4) idx", f_raw, (table, idx))

# 3. same but flat (N*4,) idx
def f_rawflat(table, idx):
    def body(i, acc):
        def lv(_, xs):
            tbl_l, idx_l = xs
            pair = jnp.concatenate([tbl_l, jnp.roll(tbl_l, -1, axis=0)], axis=-1)
            feats = pair[(idx_l.reshape(-1) + i) % T]
            return None, feats[::4096].sum()
        _, outs = jax.lax.scan(lv, None, (table, idx))
        return acc + outs.sum()
    return jax.lax.fori_loop(0, REPS, body, 0.0)
report("fwd raw pair-gathers, scan, flat idx", f_rawflat, (table, idx))

# 4. no pair build: gather straight from (T, F) with 8 rows
idx8 = jax.random.randint(key, (L, N, 8), 0, T, jnp.int32)
def f_raw8(table, idx8):
    def body(i, acc):
        def lv(_, xs):
            tbl_l, idx_l = xs
            feats = tbl_l[(idx_l + i) % T]
            return None, feats.sum(axis=(1, 2))
        _, outs = jax.lax.scan(lv, None, (table, idx8))
        return acc + outs[:, ::4096].sum()
    return jax.lax.fori_loop(0, REPS, body, 0.0)
report("fwd raw 8-corner gathers (tcnn rows)", f_raw8, (table, idx8))

# 5. index+weight math only (no gather)
def f_idx(pos):
    lc = spec.level_constants()
    from ngp_tpu.ops.hash_encoding import _pair_indices_weights
    def body(i, acc):
        def lv(_, xs):
            scale, res, dense, size = xs
            rows, wyz, wx0, _ = _pair_indices_weights(pos + i * 1e-9, scale, res, dense, size)
            return None, rows[::4096, 0].sum() + wyz[::4096].sum() + wx0[::4096].sum()
        _, outs = jax.lax.scan(lv, None, (lc["scale"], lc["res"], lc["dense"], lc["size"]))
        return acc + outs[0].sum()
    return jax.lax.fori_loop(0, REPS, body, 0.0)
report("index+weight math only", f_idx, (pos,))

# 6. real bwd
def f_bwd(table, pos, g):
    def body(i, acc):
        d_t, d_p = _bwd_xadd(table, pos + i * 1e-9, spec, g)
        return acc + d_t[:, ::4096].sum() + d_p[::4096].sum()
    return jax.lax.fori_loop(0, REPS, body, 0.0)
report("bwd real (_bwd_xadd, incl d_pos)", f_bwd, (table, pos, g), reps=8)

# 7. bwd via custom_vjp as used in training (d_pos DCE check)
def f_vjp(table, pos, g):
    def body(i, acc):
        def loss(tbl):
            return jnp.vdot(hash_encode(tbl, pos + i * 1e-9, spec), g)
        gt = jax.grad(loss)(table)
        return acc + gt[:, ::4096].sum()
    return jax.lax.fori_loop(0, REPS, body, 0.0)
report("bwd via jax.grad wrt table only (DCE d_pos?)", f_vjp, (table, pos, g), reps=8)

# 8. raw scatter only: same rows
vals = jax.random.normal(key, (L, N * 4, 2 * F), jnp.bfloat16)
def f_scat(idx, vals):
    def body(i, acc):
        def lv(_, xs):
            idx_l, v_l = xs
            acc_l = jnp.zeros((T, 2 * F), jnp.bfloat16).at[(idx_l.reshape(-1) + i) % T].add(v_l)
            d = acc_l[:, :F].astype(jnp.float32) + jnp.roll(acc_l[:, F:], 1, axis=0).astype(jnp.float32)
            return None, d[::4096].sum()
        _, outs = jax.lax.scan(lv, None, (idx, vals))
        return acc + outs.sum()
    return jax.lax.fori_loop(0, REPS, body, 0.0)
report("bwd raw pair-scatter+fold", f_scat, (idx, vals))
