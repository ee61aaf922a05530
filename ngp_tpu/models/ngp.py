"""The NGP NeRF model: hash encode -> density MLP -> [+SH] -> RGB MLP.

TPU-native rebuild of reference internal/network/ngp_network.h (class
NGPNetwork). Architecture parity (ngp_network.h:149-199):

  density head: pos(3) -[HashGrid]-> 32 -[MLP 64w, 1 hidden]-> 16
                (first channel of the 16 is raw log-density)
  color head:   concat(density_out 16, SH(dir) 16) = 32
                -[MLP 64w, 2 hidden]-> 3 raw rgb

Raw outputs are mapped through transfer functions *outside* the network
(reference applies them in the ray marcher; defaults testbed.h:114-115:
density=Exponential, rgb=Logistic; transfer fns common_device.h:292-342).

Params live in a flat dict pytree {hash_table, density_mlp, rgb_mlp}; fp32
master copies, bf16 compute inside the MLPs.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ngp_tpu.ops.hash_encoding import (
    HashGridSpec,
    hash_encode,
    hash_encode_const_pos,
    hash_encode_packed,
    hash_table_init,
    pack_inference_tables,
)
from ngp_tpu.ops.mlp import mlp_apply, mlp_init
from ngp_tpu.ops.sh_encoding import sh_encode
from ngp_tpu.utils.config import NetworkConfig


@dataclass(frozen=True)
class NGPModel:
    """Static model definition; parameters are a separate pytree."""

    config: NetworkConfig
    grid_spec: HashGridSpec

    @staticmethod
    def create(config: NetworkConfig) -> "NGPModel":
        return NGPModel(config=config, grid_spec=HashGridSpec.create(config.encoding))

    # ---------------------------------------------------------------- params
    def init(self, key):
        k_table, k_density, k_rgb = jax.random.split(key, 3)
        cfg = self.config
        sh_dims = cfg.sh_degree**2
        density_out = cfg.density_n_output_dims
        return {
            "hash_table": hash_table_init(k_table, self.grid_spec),
            "density_mlp": mlp_init(
                k_density,
                n_input=self.grid_spec.n_output_dims,
                n_neurons=cfg.density_mlp.n_neurons,
                n_output=density_out,
                n_hidden_layers=cfg.density_mlp.n_hidden_layers,
            ),
            "rgb_mlp": mlp_init(
                k_rgb,
                n_input=density_out + sh_dims,
                n_neurons=cfg.rgb_mlp.n_neurons,
                n_output=3,
                n_hidden_layers=cfg.rgb_mlp.n_hidden_layers,
            ),
        }

    def n_params(self, params) -> int:
        return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))

    # ------------------------------------------------------------- inference
    def prepare_inference(self, params):
        """Params -> inference pytree with the hash table pre-packed.

        The returned dict is accepted by `rgbsigma_raw` / `density_raw` in
        place of raw params; they then gather the packed view directly
        instead of rebuilding it per call. Rendering packs once per frame
        (renderer caches on table identity); the reference's analogue is the
        inference params staying resident between render kernels
        (ngp_network.h:224 inference_mixed_precision reuses m_params).
        """
        return {
            "hash_packed": pack_inference_tables(params["hash_table"], self.grid_spec),
            "density_mlp": params["density_mlp"],
            "rgb_mlp": params["rgb_mlp"],
        }

    def _encode_pos(self, params, pos, pos_grad: bool = False):
        if "hash_packed" in params:
            return hash_encode_packed(params["hash_packed"], pos, self.grid_spec)
        encode = hash_encode if pos_grad else hash_encode_const_pos
        return encode(params["hash_table"], pos, self.grid_spec)

    # --------------------------------------------------------------- forward
    def density_raw(self, params, pos, pos_grad: bool = False):
        """pos: (N, 3) warped in [0,1] -> raw density-head output (N, 16).

        Channel 0 is raw log-density. Reference: NGPNetwork::density
        (ngp_network.h:286) = pos encode -> density MLP. `pos_grad=True`
        keeps the analytic d/dpos path in the encoding backward (needed by
        input_gradient); training/grid paths leave it off.
        """
        enc = self._encode_pos(params, pos, pos_grad)
        cfg = self.config.density_mlp
        return mlp_apply(params["density_mlp"], enc, cfg.activation, cfg.output_activation)

    def rgbsigma_raw(self, params, pos, warped_dir, remat_heads: bool = True):
        """(N,3),(N,3) -> raw (rgb (N,3), sigma (N,)) pre-activation.

        Reference: NGPNetwork::inference_mixed_precision (ngp_network.h:224)
        -> assemble_rgbd (h:68): output = [rgb_net(concat(density_out, SH)),
        density_out[0]].

        A fused Pallas MLP kernel (ops/fused_mlp.py — the FullyFusedMLP
        analogue: activations stay in VMEM, backward recomputes in-kernel)
        exists and is numerically validated, but it is OPT-IN
        (NGP_FUSED_MLP=1): on the axon-tunneled v5e every pallas_call pays a
        measured ~7 ms fixed dispatch tax (+30-85 us/grid-step), which
        negates the ~10-15 ms the fusion saves at our shapes (ROADMAP r5
        notes). On a direct-attached TPU the kernel is the right default.
        The shipped path is XLA matmuls, with `remat_heads` running them
        under jax.checkpoint to keep the fused multi-step train scan's
        memory bounded (one step's (N, 64) activations are ~130 MB).
        """
        import os

        from ngp_tpu.ops.fused_mlp import fused_rgbsigma, supports

        enc = self._encode_pos(params, pos)
        sh = sh_encode(warped_dir, self.config.sh_degree)
        dcfg = self.config.density_mlp
        rcfg = self.config.rgb_mlp

        if supports(dcfg, rcfg) and os.environ.get("NGP_FUSED_MLP"):
            rgb_raw, density_out = fused_rgbsigma(params["density_mlp"], params["rgb_mlp"], enc, sh)
            return rgb_raw, density_out[..., 0]

        def heads(mlp_params, enc, sh):
            density_out = mlp_apply(mlp_params["density_mlp"], enc, dcfg.activation, dcfg.output_activation)
            rgb_in = jnp.concatenate([density_out, sh], axis=-1)
            rgb_raw = mlp_apply(mlp_params["rgb_mlp"], rgb_in, rcfg.activation, rcfg.output_activation)
            return rgb_raw, density_out[..., 0]

        if "hash_packed" not in params and remat_heads:
            # fused-scan training path: rematerialize the (N, 64) hidden
            # activations in the backward (dominates multi-step memory;
            # recompute is ~free MXU)
            heads = jax.checkpoint(heads)
        return heads({"density_mlp": params["density_mlp"], "rgb_mlp": params["rgb_mlp"]}, enc, sh)


    def input_gradient(self, params, pos, density_activation: str = "Exponential"):
        """d(density)/d(warped pos), (N, 3) — parity with reference
        NGPNetwork::input_gradient for output dim 3 (ngp_network.h; used by
        the Normals render mode, testbed.cu:558-559). Flows through the hash
        encoding's analytic trilinear derivative."""

        def sigma_sum(p):
            raw = self.density_raw(params, p, pos_grad=True)[..., 0]
            return jnp.sum(apply_density_activation(raw, density_activation))

        return jax.grad(sigma_sum)(pos)


# ------------------------------------------------------------ transfer fns
# Reference: common_device.h:292-342. Defaults: density Exponential with
# clamped inputs; rgb Logistic.

def apply_rgb_activation(raw, activation: str = "Logistic"):
    a = activation.lower()
    if a == "none":
        return raw
    if a == "relu":
        return jax.nn.relu(raw)
    if a == "logistic":
        return jax.nn.sigmoid(raw)
    if a == "exponential":
        return jnp.exp(jnp.clip(raw, -10.0, 10.0))
    raise ValueError(f"Unknown rgb activation {activation}")


def apply_density_activation(raw, activation: str = "Exponential"):
    a = activation.lower()
    if a == "none":
        return raw
    if a == "relu":
        return jax.nn.relu(raw)
    if a == "logistic":
        return jax.nn.sigmoid(raw)
    if a == "exponential":
        # network_to_density clamps only the derivative path (common_device.h:
        # 314-334); clamp the forward exp for bf16/fp32 safety — identical in
        # the regime where densities are finite.
        return jnp.exp(jnp.clip(raw, -15.0, 15.0))
    raise ValueError(f"Unknown density activation {activation}")
