"""Bias-free MLPs for the NGP heads — bf16 matmuls on the MXU, fp32 params.

TPU-native replacement for tiny-cuda-nn's `FullyFusedMLP` (base.json:23-39;
created at reference ngp_network.h:172,179). Structure parity: a network with
`n_hidden_layers=H`, width N, input I and output O performs the matmul chain
I->N, (H-1)x(N->N), N->O with `activation` after every layer except the last
(`output_activation`), and NO biases (tcnn fused MLPs are bias-free).

TPU mapping: each layer is one jnp.dot in bf16 with fp32 accumulation
(`preferred_element_type`), sized 64-wide to tile the 128x128 MXU when
batched; XLA fuses the ReLU into the matmul epilogue. (At these widths the
MLPs are <10% of step time — the hash encoding's gathers dominate — so a
hand-fused kernel has nothing left to win; tools/profile_step.py.)
"""

import math

import jax
import jax.numpy as jnp


def mlp_init(key, n_input: int, n_neurons: int, n_output: int, n_hidden_layers: int):
    """Xavier-uniform init (tcnn's default for fused MLPs); fp32 params.

    Returns a list of weight matrices [ (in,N), (N,N)*..., (N,out) ].
    """
    dims = [n_input] + [n_neurons] * n_hidden_layers + [n_output]
    weights = []
    for i in range(len(dims) - 1):
        key, sub = jax.random.split(key)
        fan_in, fan_out = dims[i], dims[i + 1]
        bound = math.sqrt(6.0 / (fan_in + fan_out))
        weights.append(jax.random.uniform(sub, (fan_in, fan_out), jnp.float32, -bound, bound))
    return weights


def _activate(x, name: str):
    name = name.lower()
    if name == "none":
        return x
    if name == "relu":
        return jax.nn.relu(x)
    if name == "logistic":
        return jax.nn.sigmoid(x)
    if name == "exponential":
        return jnp.exp(x)
    raise ValueError(f"Unknown activation: {name}")


def mlp_apply(weights, x, activation: str = "ReLU", output_activation: str = "None", compute_dtype=jnp.bfloat16):
    """x: (..., n_input) fp32 -> (..., n_output) fp32.

    Matmuls run in `compute_dtype` (bf16 by default) with fp32 accumulation;
    activations are applied in fp32.
    """
    h = x.astype(compute_dtype)
    for i, w in enumerate(weights):
        h = jnp.dot(h, w.astype(compute_dtype), preferred_element_type=jnp.float32)
        last = i == len(weights) - 1
        h = _activate(h, output_activation if last else activation)
        if not last:
            h = h.astype(compute_dtype)
    return h.astype(jnp.float32)
