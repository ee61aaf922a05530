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


def create_optimizer(cfg: OptimizerConfig):
    """Returns an optax GradientTransformation over the NGP param pytree."""
    adam = cfg.adam

    def schedule(step):
        return adam.learning_rate * lr_factor(step, cfg)

    def mlp_mask(params):
        return {
            "hash_table": jax.tree_util.tree_map(lambda _: False, params["hash_table"]),
            "density_mlp": [True] * len(params["density_mlp"]),
            "rgb_mlp": [True] * len(params["rgb_mlp"]),
        }

    return optax.chain(
        optax.add_decayed_weights(adam.l2_reg, mask=mlp_mask),
        optax.scale_by_adam(b1=adam.beta1, b2=adam.beta2, eps=adam.epsilon, eps_root=0.0),
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
