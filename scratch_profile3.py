"""Isolate train-step costs by chaining state through step variants.

block_until_ready is unreliable on the axon platform; we time K chained
steps (output feeds next input) and fetch a scalar at the end (device_get
forces real completion).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ngp_tpu.models.ngp import NGPModel, apply_density_activation, apply_rgb_activation
from ngp_tpu.render.composite import train_loss
from ngp_tpu.sampling.training import generate_training_batch
from ngp_tpu.sampling.lattice import n_lattice_points
from ngp_tpu.train.optimizer import create_optimizer, ema_update
from ngp_tpu.utils.aabb import AABB
from ngp_tpu.utils.config import NGPConfig

print("device:", jax.devices()[0], flush=True)

cfg = NGPConfig.from_json({})
scfg = cfg.sampler
model = NGPModel.create(cfg.network)
aabb = AABB.scene(scfg.aabb_scale)
key = jax.random.PRNGKey(0)
params = model.init(key)
tx = create_optimizer(cfg.optimizer)
opt_state = tx.init(params)
n_lat = n_lattice_points(scfg)

R = 4096
CAP = 1 << 19
occ = jnp.asarray(np.random.default_rng(0).uniform(size=(scfg.n_cascades, 128, 128, 128)) < 0.1)
images = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (12, 96, 96, 4)), jnp.float16)
xf = np.zeros((12, 3, 4), np.float32)
xf[:, :, :3] = np.eye(3)
xf[:, 2, 3] = -1.0
xf = jnp.asarray(xf)
focal = jnp.asarray([96.0, 96.0])


def timed_chain(name, step, state, K=6):
    state = step(state)  # compile + warm
    s0 = jax.device_get(state[0] if isinstance(state, tuple) else state["t"])
    t0 = time.perf_counter()
    for _ in range(K):
        state = step(state)
    _ = jax.device_get(state[0] if isinstance(state, tuple) else state["t"])
    dt = (time.perf_counter() - t0) / K
    print(f"{name:44s} {dt*1e3:9.1f} ms", flush=True)
    return dt


# ---- A: batch generation only (threads rng) ------------------------------
@jax.jit
def step_gen(carry):
    t, rng = carry
    rng, k = jax.random.split(rng)
    b = generate_training_batch(scfg, aabb, images, xf, focal, (0.5, 0.5), occ, k, R, jnp.uint32(0), CAP, n_lat)
    return (t + jnp.sum(b.pos) * 0 + b.n_samples.astype(jnp.float32), rng)


timed_chain("A batch generation only", step_gen, (jnp.float32(0), key))


# ---- B: fwd+bwd+optimizer on a FIXED batch -------------------------------
bfix = generate_training_batch(scfg, aabb, images, xf, focal, (0.5, 0.5), occ, key, R, jnp.uint32(0), CAP, n_lat)
bfix = jax.device_get(bfix)  # freeze
bfix = jax.tree_util.tree_map(jnp.asarray, bfix)
target = jnp.zeros((R, 3))
bg = jnp.asarray([0.2, 0.3, 0.4])


def make_loss(params):
    rgb_raw, sigma_raw = model.rgbsigma_raw(params, bfix.pos, bfix.dirs)
    loss, aux = train_loss(
        rgb_raw, sigma_raw, bfix.dt, bfix.ray_ids, bfix.valid, bfix.base, bfix.counts,
        bfix.ray_valid, target, bg,
        n_rays_denom=R, loss_type="SmoothL1", transmittance_threshold=1e-4,
        rgb_activation="Logistic", density_activation="Exponential",
        mean_density=jnp.float32(1.0), min_optical_thickness=0.01,
        apply_rgb_activation=apply_rgb_activation, apply_density_activation=apply_density_activation,
    )
    return loss


@jax.jit
def step_fwdbwd(carry):
    p, s = carry
    loss, g = jax.value_and_grad(make_loss)(p)
    u, s = tx.update(g, s, p)
    p = optax.apply_updates(p, u)
    return (p, s)


timed_chain("B fwd+bwd+optax, fixed batch", step_fwdbwd, (params, opt_state))


# ---- C: forward only on fixed batch ---------------------------------------
@jax.jit
def step_fwd(carry):
    p, acc = carry
    loss = make_loss(p)
    # perturb params trivially so inputs vary (prevents any caching)
    p2 = jax.tree_util.tree_map(lambda x: x + loss * 1e-12, p)
    return (p2, acc + loss)


timed_chain("C fwd only, fixed batch", step_fwd, (params, jnp.float32(0)))


# ---- D: hash encode fwd+bwd only (chained) --------------------------------
from ngp_tpu.ops.hash_encoding import hash_encode

posq = bfix.pos


@jax.jit
def step_hash(carry):
    t, _ = carry
    g = jax.grad(lambda tab: jnp.sum(hash_encode(tab, posq + t * 1e-12, model.grid_spec) ** 2))(params["hash_table"])
    return (t + g.ravel()[0], g)


timed_chain("D hash fwd+bwd 2^19 samples", step_hash, (jnp.float32(0), params["hash_table"]))


# ---- E: raw scatter-add chained -------------------------------------------
idx0 = jax.random.randint(key, ((1 << 19) * 16 * 8,), 0, 1 << 19)
vals = jax.random.normal(key, ((1 << 19) * 16 * 8, 2)) * 1e-6


@jax.jit
def step_scatter(carry):
    t, _ = carry
    out = jnp.zeros((1 << 19, 2)).at[(idx0 + t.astype(jnp.int32)) % (1 << 19)].add(vals)
    return (t + out[0, 0] * 0 + 1, out)


timed_chain("E raw scatter-add 67M->2^19x2", step_scatter, (jnp.float32(0), jnp.zeros((1 << 19, 2))), K=3)

# ---- F: raw gather chained -------------------------------------------------
@jax.jit
def step_gather(carry):
    t, _ = carry
    out = params["hash_table"][(idx0 + t.astype(jnp.int32)) % (1 << 19)]
    return (t + out[0, 0] * 0 + 1, out)


timed_chain("F raw gather 67Mx2 from 2^19x2", step_gather, (jnp.float32(0), jnp.zeros((idx0.shape[0], 2))), K=3)
