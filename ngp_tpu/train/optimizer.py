"""Optimizer stack: Adam + stepped exponential LR decay + parameter EMA.

TPU-native (optax) replacement for the tcnn optimizer chain
`Ema(0.95) o ExponentialDecay(start 20k, interval 10k, base 0.33) o
Adam(1e-2, b1 .9, b2 .99, eps 1e-15, l2_reg 1e-6)` configured in
base.json:50-67 and created at reference testbed.cu:78.

Semantics:
 * ExponentialDecay multiplies the LR by `decay_base` every `decay_interval`
   steps once `decay_start` is reached (stepped, not continuous).
 * Ema maintains an exponential moving average of the params; *training*
   uses the raw params, *inference/rendering* uses the EMA copy (the tcnn
   Trainer's params_inference vs params split; see testbed.cu:356 vs :556).
 * l2_reg applies to MLP weight matrices only, not hash-table entries
   (matching tcnn Adam's matrix-params-only weight decay and the Instant-NGP
   paper's stated practice).

Mixed precision: params are fp32 masters (tcnn keeps fp32 masters + fp16
copies; on TPU the bf16 "copies" are just casts inside the matmuls, and
bf16 needs no loss scaling, so LOSS_SCALE folds away — see
render/composite.py for where its one observable side effect is reproduced).
"""

import jax
import jax.numpy as jnp
import optax

from ngp_tpu.utils.config import OptimizerConfig


def lr_factor(step, cfg: OptimizerConfig):
    """Stepped decay factor: base^(1 + (step-start)//interval) after start."""
    step = jnp.asarray(step)
    n = jnp.where(
        step < cfg.decay_start,
        0,
        (step - cfg.decay_start) // cfg.decay_interval + 1,
    )
    return jnp.power(cfg.decay_base, n.astype(jnp.float32))


def scale_by_adam_lazy(b1, b2, eps, lazy_fn):
    """scale_by_adam with tcnn's zero-gradient skip on selected leaves.

    tcnn's Adam kernel leaves a parameter COMPLETELY untouched when its
    gradient is exactly zero (option `optimize_params_when_gradient_is_zero`,
    default false): no first/second-moment decay and no update. For the hash
    table — where each step's scatter only touches the rows the batch actually
    sampled — this freezes unvisited rows instead of letting stale momentum
    keep pushing them (optax's dense Adam decays m by b1 and still applies
    m_hat/(sqrt(v_hat)+eps) forever). MLP gradients are dense and never
    exactly zero, so only hash leaves (lazy_fn -> True) get the masked path.

    State is optax.ScaleByAdamState with the standard (count, mu, nu) leaves,
    so snapshots serialized before this change load unchanged.
    """

    def init(params):
        z = lambda p: jnp.zeros_like(p)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(z, params),
            nu=jax.tree_util.tree_map(z, params),
        )

    def update(updates, state, params=None):
        del params
        count = state.count + 1
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)

        def upd(g, m, v, lazy):
            new_m = b1 * m + (1.0 - b1) * g
            new_v = b2 * v + (1.0 - b2) * g * g
            if lazy:
                visited = g != 0
                new_m = jnp.where(visited, new_m, m)
                new_v = jnp.where(visited, new_v, v)
            out = (new_m / bc1) / (jnp.sqrt(new_v / bc2) + eps)
            if lazy:
                out = jnp.where(visited, out, 0.0)
            return out, new_m, new_v

        lazy_tree = lazy_fn(updates)
        flat_u, treedef = jax.tree_util.tree_flatten(updates)
        flat_m = treedef.flatten_up_to(state.mu)
        flat_v = treedef.flatten_up_to(state.nu)
        flat_l = treedef.flatten_up_to(lazy_tree)
        outs = [upd(g, m, v, l) for g, m, v, l in zip(flat_u, flat_m, flat_v, flat_l)]
        new_updates = jax.tree_util.tree_unflatten(treedef, [o[0] for o in outs])
        new_mu = jax.tree_util.tree_unflatten(treedef, [o[1] for o in outs])
        new_nu = jax.tree_util.tree_unflatten(treedef, [o[2] for o in outs])
        return new_updates, optax.ScaleByAdamState(count=count, mu=new_mu, nu=new_nu)

    return optax.GradientTransformation(init, update)


def create_optimizer(cfg: OptimizerConfig, lazy_hash=None):
    """Returns an optax GradientTransformation over the NGP param pytree.

    lazy_hash defaults to tcnn's `optimize_params_when_gradient_is_zero`
    semantics from the config (false -> skip zero-grad hash rows)."""
    adam = cfg.adam
    if lazy_hash is None:
        lazy_hash = not adam.optimize_params_when_gradient_is_zero

    def schedule(step):
        return adam.learning_rate * lr_factor(step, cfg)

    def mlp_mask(params):
        return {
            "hash_table": jax.tree_util.tree_map(lambda _: False, params["hash_table"]),
            "density_mlp": [True] * len(params["density_mlp"]),
            "rgb_mlp": [True] * len(params["rgb_mlp"]),
        }

    def hash_mask(params):
        return {
            "hash_table": jax.tree_util.tree_map(lambda _: True, params["hash_table"]),
            "density_mlp": [False] * len(params["density_mlp"]),
            "rgb_mlp": [False] * len(params["rgb_mlp"]),
        }

    if lazy_hash:
        adam_tx = scale_by_adam_lazy(adam.beta1, adam.beta2, adam.epsilon, hash_mask)
    else:
        adam_tx = optax.scale_by_adam(
            b1=adam.beta1, b2=adam.beta2, eps=adam.epsilon, eps_root=0.0
        )

    return optax.chain(
        optax.add_decayed_weights(adam.l2_reg, mask=mlp_mask),
        adam_tx,
        optax.scale_by_learning_rate(schedule),
    )


def create_optimizer_flat(cfg: OptimizerConfig, l2_all: bool = True):
    """Optimizer over a single-array param tree (used by the envmap trainer,
    testbed.cu:83-90)."""
    adam = cfg.adam

    def schedule(step):
        return adam.learning_rate * lr_factor(step, cfg)

    return optax.chain(
        optax.add_decayed_weights(adam.l2_reg if l2_all else 0.0),
        optax.scale_by_adam(b1=adam.beta1, b2=adam.beta2, eps=adam.epsilon, eps_root=0.0),
        optax.scale_by_learning_rate(schedule),
    )


def ema_update(ema_params, params, decay: float):
    """tcnn EmaOptimizer: ema <- decay * ema + (1-decay) * params."""
    return jax.tree_util.tree_map(lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params)
