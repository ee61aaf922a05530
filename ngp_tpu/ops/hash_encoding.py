"""Multiresolution hash-grid encoding — the heart of Instant-NGP — in jnp.

TPU-native replacement for tiny-cuda-nn's `HashGrid` encoding (config
base.json:16-21; created at reference ngp_network.h:162; parameters derived
at ngp_network.h:602-642). Semantics follow the Instant-NGP paper (Mueller et
al. 2022) and tcnn's grid:

 * level l in [0, L): scale_l = Nmin * b^l - 1, resolution res_l = ceil(scale_l)+1
 * position x in [0,1]^3 scaled to x*scale_l + 0.5; trilinear interpolation
   over the 8 surrounding integer corners
 * corner -> table index: DENSE (x + y*res + z*res^2) while res_l^3 fits in
   the table, otherwise spatial hash (x*1 ^ y*2654435761 ^ z*805459861) mod T
 * F features per level, outputs concatenated level-major -> L*F dims

TPU design decisions (measured on v5e):
 * The table is ONE stacked (L, T_pad, F) array and the level loop is a
   `lax.scan`: 16 separate per-level gathers/scatters made XLA schedule all
   levels' ~100 MB temporaries concurrently (14.5 GB live set); the scan
   reuses one level's buffers. Dense low levels waste a little padding
   (~2 MB total) for a uniform scan body.
 * Forward gathers the fp32 table directly (measured: f32 row-gathers are
   2x FASTER than bf16 ones on v5e — the opposite of scatters).
 * custom_vjp backward scatter-adds bf16 contributions per level — the
   analogue of tcnn's __half2 atomicAdd backward (fp16-class mantissa, fp32
   exponent range, no loss scaling needed). Per-level (4 MB) scatter operands
   are ~2.6x faster than one 50 MB operand.
 * d/dpos (Normals mode, input-gradient API) uses the analytic trilinear
   derivative; XLA dead-code-eliminates it when unused.
"""

import functools
import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ngp_tpu.utils.config import HashEncodingConfig

_PRIMES = np.array([1, 2654435761, 805459861], dtype=np.uint32)

# 8 corner offsets of a unit cube, shape (8, 3)
_CORNERS = np.array([[(c >> 0) & 1, (c >> 1) & 1, (c >> 2) & 1] for c in range(8)], dtype=np.float32)


@dataclass(frozen=True)
class HashGridSpec:
    """Static per-level layout, precomputed on host from the config."""

    n_levels: int
    n_features: int
    scales: tuple  # float per level
    resolutions: tuple  # int per level
    dense: tuple  # bool per level
    sizes: tuple  # logical table entries per level
    offsets: tuple  # exclusive prefix of sizes (for flat export)

    @property
    def n_entries(self) -> int:
        return self.offsets[-1] + self.sizes[-1]

    @property
    def padded_size(self) -> int:
        return max(self.sizes)

    @property
    def n_output_dims(self) -> int:
        return self.n_levels * self.n_features

    @staticmethod
    def create(cfg: HashEncodingConfig) -> "HashGridSpec":
        scales, resolutions, dense, sizes, offsets = [], [], [], [], []
        off = 0
        for l in range(cfg.n_levels):
            scale = cfg.base_resolution * (cfg.scale**l) - 1.0
            res = int(math.ceil(scale)) + 1
            is_dense = res**3 <= cfg.hashmap_size
            # align each level's stride to 8 (tcnn does the same for
            # vectorized loads; keeps param counts comparable)
            size = -(-(res**3) // 8) * 8 if is_dense else cfg.hashmap_size
            scales.append(scale)
            resolutions.append(res)
            dense.append(is_dense)
            sizes.append(size)
            offsets.append(off)
            off += size
        return HashGridSpec(
            n_levels=cfg.n_levels,
            n_features=cfg.n_features_per_level,
            scales=tuple(scales),
            resolutions=tuple(resolutions),
            dense=tuple(dense),
            sizes=tuple(sizes),
            offsets=tuple(offsets),
        )

    def level_constants(self):
        """Per-level traced constants for the scan body, each (L,)."""
        return {
            "scale": jnp.asarray(self.scales, jnp.float32),
            "res": jnp.asarray(self.resolutions, jnp.int32),
            "dense": jnp.asarray(self.dense, bool),
            "size": jnp.asarray(self.sizes, jnp.int32),
        }


def hash_table_init(key, spec: HashGridSpec, scale: float = 1e-4):
    """Uniform(-1e-4, 1e-4) init, tcnn's default for grid params.

    Stacked (L, T_pad, F) fp32; rows past a level's logical size are unused
    padding (kept at 0 by init and never touched by gradients).
    """
    return jax.random.uniform(
        key, (spec.n_levels, spec.padded_size, spec.n_features), jnp.float32, -scale, scale
    )


def _corner_indices_weights(pos, scale, res, dense, size):
    """Corner indices+weights for ONE level with traced per-level constants.

    pos (N,3); scale/res/size scalars; dense bool scalar. -> ((N,8) i32, (N,8) f32)
    """
    scaled = pos * scale + 0.5
    base = jnp.floor(scaled)
    frac = scaled - base
    base = base.astype(jnp.int32)

    corners = jnp.asarray(_CORNERS, jnp.int32)  # (8, 3)
    cpos = base[:, None, :] + corners[None, :, :]  # (N, 8, 3)

    w = jnp.where(corners[None].astype(bool), frac[:, None, :], 1.0 - frac[:, None, :])
    weights = w[..., 0] * w[..., 1] * w[..., 2]  # (N, 8)

    cd = jnp.clip(cpos, 0, res - 1)
    idx_dense = cd[..., 0] + cd[..., 1] * res + cd[..., 2] * (res * res)

    u = cpos.astype(jnp.uint32)
    primes = jnp.asarray(_PRIMES)
    idx_hash = ((u[..., 0] * primes[0]) ^ (u[..., 1] * primes[1]) ^ (u[..., 2] * primes[2])) % size.astype(jnp.uint32)

    idx = jnp.where(dense, idx_dense, idx_hash.astype(jnp.int32))
    return idx, weights


def _level_indices(pos, level: int, spec: HashGridSpec):
    """Static-level variant (tests, export)."""
    lc = spec.level_constants()
    return _corner_indices_weights(
        pos, lc["scale"][level], lc["res"][level], lc["dense"][level], lc["size"][level]
    )


def _hash_encode_impl(table, pos, spec: HashGridSpec, gather_dtype=jnp.float32):
    # NOTE: gathers run on the fp32 table directly — measured on v5e, an f32
    # row-gather is 2x FASTER than bf16 (the opposite of scatters).
    lc = spec.level_constants()

    def body(_, xs):
        tbl_l, scale, res, dense, size = xs
        idx, weights = _corner_indices_weights(pos, scale, res, dense, size)
        feats = tbl_l[idx].astype(jnp.float32)  # (N, 8, F)
        return None, jnp.sum(feats * weights[..., None], axis=1)  # (N, F)

    _, outs = jax.lax.scan(body, None, (table, lc["scale"], lc["res"], lc["dense"], lc["size"]))
    # (L, N, F) -> (N, L*F) level-major features
    return jnp.transpose(outs, (1, 0, 2)).reshape(pos.shape[0], spec.n_output_dims)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def hash_encode(table, pos, spec: HashGridSpec):
    """table: (L, T_pad, F); pos: (N, 3) in [0,1] -> (N, L*F) fp32."""
    return _hash_encode_impl(table, pos, spec)


def _hash_encode_fwd(table, pos, spec: HashGridSpec):
    return hash_encode(table, pos, spec), (table, pos)


def _hash_encode_bwd(spec: HashGridSpec, res_, g):
    table, pos = res_
    f = spec.n_features
    n = pos.shape[0]
    lc = spec.level_constants()
    g_levels = g.reshape(n, spec.n_levels, f).transpose(1, 0, 2)  # (L, N, F)

    def body(_, xs):
        tbl_l, g_l, scale, res, dense, size = xs
        idx, weights = _corner_indices_weights(pos, scale, res, dense, size)
        contrib = (weights[..., None] * g_l[:, None, :]).astype(jnp.bfloat16)  # (N,8,F)
        d_l = (
            jnp.zeros((spec.padded_size, f), jnp.bfloat16)
            .at[idx.reshape(-1)]
            .add(contrib.reshape(-1, f))
        )
        # d(out)/d(pos): DCE'd by XLA when the pos cotangent is unused
        feats = tbl_l[idx]
        per_corner = jnp.sum(feats * g_l[:, None, :], axis=-1)  # (N,8)
        dw = _weight_grads(pos, scale)  # (N,8,3)
        return None, (d_l.astype(table.dtype), jnp.sum(per_corner[..., None] * dw, axis=1))

    _, (d_table, d_pos_levels) = jax.lax.scan(
        body, None, (table, g_levels, lc["scale"], lc["res"], lc["dense"], lc["size"])
    )
    return d_table, jnp.sum(d_pos_levels, axis=0)


def _weight_grads(pos, scale):
    """d(trilinear corner weight)/d(pos), (N, 8, 3); scale is a traced scalar."""
    scaled = pos * scale + 0.5
    frac = scaled - jnp.floor(scaled)
    corners = jnp.asarray(_CORNERS, bool)  # (8,3)
    w = jnp.where(corners[None], frac[:, None, :], 1.0 - frac[:, None, :])  # (N,8,3)
    sign = jnp.where(corners, 1.0, -1.0)  # (8,3)
    grads = []
    for d in range(3):
        others = [i for i in range(3) if i != d]
        grads.append(sign[None, :, d] * w[..., others[0]] * w[..., others[1]] * scale)
    return jnp.stack(grads, axis=-1)


hash_encode.defvjp(_hash_encode_fwd, _hash_encode_bwd)
