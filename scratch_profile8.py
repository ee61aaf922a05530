"""Scatter cost vs output size; per-level split vs one big table."""

import time

import jax
import jax.numpy as jnp
import numpy as np

print("device:", jax.devices()[0], flush=True)
key = jax.random.PRNGKey(0)
M = 1 << 21


def timed(name, step, state, K=4):
    state = step(state)
    jax.device_get(jax.tree_util.tree_leaves(state)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(K):
        state = step(state)
    jax.device_get(jax.tree_util.tree_leaves(state)[0].ravel()[0])
    print(f"{name:52s} {(time.perf_counter()-t0)/K*1e3:9.1f} ms", flush=True)


vals = (jax.random.normal(key, (M, 2)) * 1e-3).astype(jnp.bfloat16)
idx = jax.random.randint(key, (M,), 0, 1 << 19)

for logT in (14, 17, 19, 21, 23, 24):
    T = 1 << logT

    @jax.jit
    def step(carry, T=T):
        t, _ = carry
        out = jnp.zeros((T, 2), jnp.bfloat16).at[(idx + t.astype(jnp.int32)) % T].add(vals)
        return (t + 1, out)

    timed(f"bf16 scatter 2M -> 2^{logT} x2", step, (jnp.float32(0), jnp.zeros((T, 2), jnp.bfloat16)), K=3)


# 16 per-level scatters into separate 2^19 tables vs one 2^23 table
@jax.jit
def step_split(carry):
    t, _ = carry
    outs = []
    for l in range(16):
        out = jnp.zeros((1 << 19, 2), jnp.bfloat16).at[(idx + t.astype(jnp.int32) + l * 977) % (1 << 19)].add(vals)
        outs.append(out)
    return (t + 1, jnp.concatenate(outs))


timed("16x split scatters 2M -> 2^19 each + concat", step_split, (jnp.float32(0), jnp.zeros((16 << 19, 2), jnp.bfloat16)), K=2)


@jax.jit
def step_big(carry):
    t, _ = carry
    out = jnp.zeros((16 << 19, 2), jnp.bfloat16)
    for l in range(16):
        out = out.at[((idx + t.astype(jnp.int32) + l * 977) % (1 << 19)) + (l << 19)].add(vals)
    return (t + 1, out)


timed("16x scatters into one 2^23 table", step_big, (jnp.float32(0), jnp.zeros((16 << 19, 2), jnp.bfloat16)), K=2)
