"""Raw primitive costs for hash-grad strategies (all chained, real wall)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

print("device:", jax.devices()[0], flush=True)
key = jax.random.PRNGKey(0)

N = 1 << 18  # samples
L, C = 16, 8  # levels, corners
T = 1 << 19
M = N * C  # per-level contributions (2M)


def timed(name, step, state, K=4):
    state = step(state)
    jax.device_get(jax.tree_util.tree_leaves(state)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(K):
        state = step(state)
    jax.device_get(jax.tree_util.tree_leaves(state)[0].ravel()[0])
    print(f"{name:46s} {(time.perf_counter()-t0)/K*1e3:9.1f} ms", flush=True)


# 0) MLP-only train-ish step (sanity baseline)
W1 = jax.random.normal(key, (32, 64)) * 0.1
W2 = jax.random.normal(key, (64, 64)) * 0.1
W3 = jax.random.normal(key, (64, 16)) * 0.1
X = jax.random.normal(key, (N, 32))


@jax.jit
def mlp_step(ws):
    w1, w2, w3 = ws

    def loss(w1, w2, w3):
        h = jnp.maximum(X.astype(jnp.bfloat16) @ w1.astype(jnp.bfloat16), 0)
        h = jnp.maximum(h @ w2.astype(jnp.bfloat16), 0)
        return jnp.sum((h @ w3.astype(jnp.bfloat16)).astype(jnp.float32) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(w1, w2, w3)
    return (w1 - 1e-6 * g[0], w2 - 1e-6 * g[1], w3 - 1e-6 * g[2])


timed("0 mlp fwd+bwd 2^18x(32-64-64-16)", mlp_step, (W1, W2, W3))

idx = jax.random.randint(key, (M,), 0, T)
vals = jax.random.normal(key, (M, 2), jnp.float32)
tbl = jax.random.normal(key, (T, 2), jnp.float32)


# 1) per-level gather, x16 levels
@jax.jit
def gather16(carry):
    t, acc = carry
    s = jnp.float32(0)
    for l in range(L):
        out = tbl[(idx + t.astype(jnp.int32) + l) % T]
        s = s + out.ravel()[0]
    return (t + 1 + s * 0, acc)


timed("1 gather 2M rows x16 levels", gather16, (jnp.float32(0), jnp.float32(0)))


# 2) per-level scatter-add x1 level
@jax.jit
def scatter1(carry):
    t, _ = carry
    out = jnp.zeros((T, 2)).at[(idx + t.astype(jnp.int32)) % T].add(vals)
    return (t + 1, out)


timed("2 scatter-add 2M -> (2^19,2), x1 level", scatter1, (jnp.float32(0), tbl), K=2)


# 3) sort 2M uint32 keys with 2-float payload
@jax.jit
def sort1(carry):
    t, _ = carry
    k = (idx + t.astype(jnp.int32)) % T
    sk, v0, v1 = jax.lax.sort((k, vals[:, 0], vals[:, 1]), num_keys=1)
    return (t + 1, sk)


timed("3 sort 2M keys + 2 payloads", sort1, (jnp.float32(0), idx), K=2)


# 4) segment_sum with sorted indices (scatter under the hood?)
sorted_idx = jnp.sort(idx)


@jax.jit
def segsum(carry):
    t, _ = carry
    out = jax.ops.segment_sum(vals + t, sorted_idx, T, indices_are_sorted=True)
    return (t + 1, out)


timed("4 segment_sum sorted 2M -> 2^19", segsum, (jnp.float32(0), tbl), K=2)


# 5) sorted-seg sum via cumsum+diff (scatter-free except final unique write)
@jax.jit
def cumsum_seg(carry):
    t, _ = carry
    v = vals + t
    c = jnp.cumsum(v, axis=0)
    # boundary: last occurrence of each idx -> its cumsum; out[e] = c[last(e)] - c[last(prev e)]
    is_last = jnp.concatenate([sorted_idx[1:] != sorted_idx[:-1], jnp.array([True])])
    # scatter c at boundaries only (<= T unique writes, unique indices!)
    out = jnp.zeros((T, 2)).at[jnp.where(is_last, sorted_idx, T)].set(c, mode="drop", unique_indices=True)
    out = out - jnp.concatenate([jnp.zeros((1, 2)), jnp.maximum.accumulate(out, 0)[:-1]], 0) * 0  # placeholder
    return (t + 1, out)


timed("5 cumsum + unique boundary set", cumsum_seg, (jnp.float32(0), tbl), K=2)


# 6) gather with wide rows: table (T, 128) gather 2M rows
tbl_wide = jax.random.normal(key, (1 << 14, 128), jnp.float32)


@jax.jit
def gather_wide(carry):
    t, _ = carry
    out = tbl_wide[(idx + t.astype(jnp.int32)) % (1 << 14)]
    return (t + 1, out)


timed("6 gather 2M rows of 128 from (2^14,128)", gather_wide, (jnp.float32(0), jnp.float32(0)), K=2)


# 7) one-hot matmul scatter for a SMALL dense level (T=4096):
Ts = 4096
idx_s = jax.random.randint(key, (M,), 0, Ts)


@jax.jit
def onehot_scatter(carry):
    t, _ = carry
    ii = (idx_s + t.astype(jnp.int32)) % Ts
    oh = jax.nn.one_hot(ii, Ts, dtype=jnp.bfloat16)  # (2M, 4096)
    out = jnp.einsum("mc,mf->cf", oh, vals.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    return (t + 1, out)


timed("7 one-hot matmul scatter 2M -> 4096", onehot_scatter, (jnp.float32(0), jnp.float32(0)), K=2)
