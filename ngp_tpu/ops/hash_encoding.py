"""Multiresolution hash-grid encoding — the heart of Instant-NGP — in jnp.

TPU-native replacement for tiny-cuda-nn's `HashGrid` encoding (config
base.json:16-21; created at reference ngp_network.h:162; parameters derived
at ngp_network.h:602-642). Semantics follow the Instant-NGP paper (Mueller et
al. 2022) and tcnn's grid:

 * level l in [0, L): scale_l = Nmin * b^l - 1, resolution res_l = ceil(scale_l)+1
 * position x in [0,1]^3 scaled to x*scale_l + 0.5; trilinear interpolation
   over the 8 surrounding integer corners
 * corner -> table index: DENSE (x + y*res + z*res^2) while res_l^3 fits in
   the table, otherwise a spatial hash mod T
 * F features per level, outputs concatenated level-major -> L*F dims

Three hash variants (spec.variant):

 * "oadd" (default, fastest): fully-additive linear hash
   idx = (x + y*258583 + z*253757) mod T. ALL EIGHT corners of a sample's
   cell live at fixed offsets {0, 1, sy, sy+1, sz, sz+1, sy+sz, sy+sz+1}
   from the base index, so the whole cell is fetched through ONE row of a
   precomputed OCT TABLE O[i] = [t[i+o] for o in offsets] of width 8F:
   1 gather row and 1 scatter row per sample per level (v5e XLA gathers
   are ~flat in width to 16 f32 and scatters flat to 32 bf16 —
   tools/mb6.py — so row count is everything). The backward scatters
   (N, 8F) contributions into an oct accumulator and folds it with 8
   static rolls. Dense levels use strides (1, res, res^2) and clamp each
   dim's corner pair at the boundary by shifting its weight. The strides
   were chosen by a collision-lattice search (tools note below): the
   nearest pair of grid cells that ever collides is ~87 cells apart at
   the finest resolution — farther than tcnn's own primes would give as
   linear strides (39) and beyond any feature correlation length.
   Training quality validated equal: 320-step tiny-config runs reach
   29.58 / 29.55 / 29.44 dB PSNR for oadd / xadd / tcnn respectively
   (same seed, same scene).
 * "xadd": idx = (x + (y*2654435761 ^ z*805459861)) mod T.
   x enters ADDITIVELY, so the two corners differing only in x occupy
   ADJACENT table rows (for dense levels the x-stride is already 1). The
   level is then fetched through an overlapping PAIR TABLE P[i] = [tbl[i],
   tbl[i+1 mod T]] of width 2F: each row gather returns both x-corners, so a
   sample costs 4 gather rows per level instead of 8 — and v5e XLA gathers
   are per-ROW instruction-bound and FLAT in width up to 4 f32 (measured
   4.3 ns/row for w=2 and w=4; tools/mb2.py). The backward scatters 4 rows
   of width 2F into a pair ACCUMULATOR and folds it with one roll:
   d_tbl[i] = A[i][:F] + A[i-1 mod T][F:]. Same 2x row saving.
 * "tcnn": idx = (x*1 ^ y*2654435761 ^ z*805459861) mod T — tiny-cuda-nn's
   exact hash (8 corner rows per sample), kept for reference-checkpoint
   interchange and golden parity tests.

TPU design decisions (measured on v5e, tools/mb2.py + round-1 microbench):
 * The table is ONE stacked (L, T_pad, F) array and the level loop is a
   `lax.scan`: 16 separate per-level gathers/scatters made XLA schedule all
   levels' ~100 MB temporaries concurrently (14.5 GB live set); the scan
   reuses one level's buffers.
 * Forward gathers the fp32 table directly (measured: f32 row-gathers are
   2x FASTER than bf16 ones on v5e — the opposite of scatters).
 * custom_vjp backward scatter-adds bf16 contributions per level — the
   analogue of tcnn's __half2 atomicAdd backward (fp16-class mantissa, fp32
   exponent range, no loss scaling needed). bf16 scatters are ~2.8x faster
   than fp32 (14.4 vs 40 ns/row), flat in width up to 4 values.
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

# "oadd" linear-hash strides: searched (random search over odd pairs, window
# |dy|,|dz| <= 128) to maximize the minimum euclidean distance of any two
# colliding cells in the collision lattice {d : dx + SY*dy + SZ*dz = 0 mod
# 2^19}; the winner reaches 86.7 cells (theoretical scale T^(1/3) = 80.6).
_OCT_SY = 258583
_OCT_SZ = 253757

# 8 corner offsets of a unit cube, shape (8, 3)
_CORNERS = np.array([[(c >> 0) & 1, (c >> 1) & 1, (c >> 2) & 1] for c in range(8)], dtype=np.float32)

# the 4 (y, z) corner combinations of an x-adjacent pair, shape (4, 2)
_YZ = np.array([[0, 0], [1, 0], [0, 1], [1, 1]], dtype=np.int32)


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
    variant: str = "xadd"  # "xadd" (pair-packed) | "tcnn" (interchange)
    # one-corner stochastic gradient deposit (oadd only; see config)
    stochastic_bwd: bool = False
    # deposit into every k-th level per sample, scaled by k (see config)
    stochastic_level_rate: int = 1

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
            # align each level's stride to 8 (tcnn does the same for
            # vectorized loads; keeps param counts comparable). A level is
            # dense only if the ALIGNED size fits — this guarantees every
            # hash level's size equals padded_size, which the pair-table
            # roll relies on for exact mod-T wraparound.
            aligned = -(-(res**3) // 8) * 8
            is_dense = aligned <= cfg.hashmap_size
            size = aligned if is_dense else cfg.hashmap_size
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
            variant=cfg.hash_variant,
            stochastic_bwd=getattr(cfg, "stochastic_corner_backward", False),
            stochastic_level_rate=getattr(cfg, "stochastic_level_rate", 1),
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

    Stored in the OPTIMIZER layout (L, F, T_pad) fp32: the minor dim is the
    large table axis, so the elementwise Adam/EMA passes over the table run
    at full HBM bandwidth (a (L, T, F=2) minor dim lane-pads on TPU and was
    measured ~11-14 ms/step slower in the update chain; the gather packs
    absorb the transpose for free — tools/mb20_opt.py). All encode/backward
    entry points accept either layout via `as_level_major`. Rows past a
    level's logical size are unused padding (kept at 0 by init and never
    touched by gradients).
    """
    return jax.random.uniform(
        key, (spec.n_levels, spec.n_features, spec.padded_size), jnp.float32, -scale, scale
    )


def is_opt_layout(table, spec: HashGridSpec) -> bool:
    """True when `table` is stored (L, F, T_pad) rather than (L, T_pad, F)."""
    return (
        table.ndim == 3
        and table.shape[1] == spec.n_features
        and table.shape[2] == spec.padded_size
        and spec.padded_size != spec.n_features
    )


def as_level_major(table, spec: HashGridSpec):
    """Normalize a hash table to the internal (L, T_pad, F) orientation.

    The transpose is free in practice: every consumer immediately copies the
    table into a packed gather view (pair/oct tables), and XLA folds the
    transpose into that copy (measured, tools/mb20_opt.py)."""
    return table.transpose(0, 2, 1) if is_opt_layout(table, spec) else table


# --------------------------------------------------------------------------
# tcnn variant: 8 independent corner rows per sample per level
# --------------------------------------------------------------------------

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
    """Static-level variant (tests, export); tcnn corner layout."""
    lc = spec.level_constants()
    return _corner_indices_weights(
        pos, lc["scale"][level], lc["res"][level], lc["dense"][level], lc["size"][level]
    )


def _encode_tcnn(table, pos, spec: HashGridSpec):
    lc = spec.level_constants()

    def body(_, xs):
        tbl_l, scale, res, dense, size = xs
        idx, weights = _corner_indices_weights(pos, scale, res, dense, size)
        feats = tbl_l[idx].astype(jnp.float32)  # (N, 8, F)
        return None, jnp.sum(feats * weights[..., None], axis=1)  # (N, F)

    _, outs = jax.lax.scan(body, None, (table, lc["scale"], lc["res"], lc["dense"], lc["size"]))
    # (L, N, F) -> (N, L*F) level-major features
    return jnp.transpose(outs, (1, 0, 2)).reshape(pos.shape[0], spec.n_output_dims)


def _bwd_tcnn(table, pos, spec: HashGridSpec, g):
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


# --------------------------------------------------------------------------
# xadd variant: 4 pair rows per sample per level (both directions)
# --------------------------------------------------------------------------

def _pair_indices_weights(pos, scale, res, dense, size):
    """Pair rows + weights for ONE level (xadd hash / dense x-stride-1).

    Returns (rows (N,4) i32, wyz (N,4) f32, wx0 (N,) f32, dx_live (N,) f32):
    row k fetches the x-corner pair [(x, yz_k), (x+1, yz_k)]; the sample's
    contribution from row k is wyz_k * (wx0 * pair[:F] + (1-wx0) * pair[F:]).
    `dx_live` zeroes the analytic x-derivative where the dense boundary clamp
    collapses the pair onto one physical entry (d/dx is exactly 0 there).
    """
    scaled = pos * scale + 0.5
    base = jnp.floor(scaled)
    frac = scaled - base
    base = base.astype(jnp.int32)
    bx, by, bz = base[:, 0], base[:, 1], base[:, 2]
    fx, fy, fz = frac[:, 0], frac[:, 1], frac[:, 2]

    yz = jnp.asarray(_YZ)  # (4, 2)
    cy = by[:, None] + yz[None, :, 0]  # (N, 4)
    cz = bz[:, None] + yz[None, :, 1]

    # dense: x-pair clamped into [0, res-2] with the weight shifted onto the
    # surviving entry — exactly reproduces clip-to-[0,res-1] semantics
    # (reference dense addressing clamps corner coords; at base_x = res-1
    # both x-corners clip to the same entry with total weight 1).
    xb = jnp.clip(bx, 0, jnp.maximum(res - 2, 0))
    hi = bx > res - 2
    lo = bx < 0
    wx0_dense = jnp.where(hi, 0.0, jnp.where(lo, 1.0, 1.0 - fx))
    cyd = jnp.clip(cy, 0, res - 1)
    czd = jnp.clip(cz, 0, res - 1)
    rows_dense = xb[:, None] + cyd * res + czd * (res * res)

    # hash: idx = (x + (y*p1 ^ z*p2)) mod T; the +1 row wraps mod T, which
    # the rolled pair table reproduces exactly (hash level size == padded).
    p1, p2 = jnp.uint32(_PRIMES[1]), jnp.uint32(_PRIMES[2])
    h = (cy.astype(jnp.uint32) * p1) ^ (cz.astype(jnp.uint32) * p2)  # (N, 4)
    rows_hash = ((bx.astype(jnp.uint32)[:, None] + h) % size.astype(jnp.uint32)).astype(jnp.int32)

    rows = jnp.where(dense, rows_dense, rows_hash)
    wx0 = jnp.where(dense, wx0_dense, 1.0 - fx)
    dx_live = jnp.where(dense & (hi | lo), 0.0, 1.0)

    wy = jnp.where(yz[None, :, 0] == 1, fy[:, None], 1.0 - fy[:, None])
    wz = jnp.where(yz[None, :, 1] == 1, fz[:, None], 1.0 - fz[:, None])
    return rows, wy * wz, wx0, dx_live


def _pair_tables(table):
    """(L, T_pad, F) -> overlapping pair view (L, T_pad, 2F):
    P[l, i] = [t[l, i], t[l, i+1 mod T]]. Built OUTSIDE the level scan —
    measured 20% faster forward than building per level inside it (the
    gather emitter prefers a materialized parameter-like operand)."""
    return jnp.concatenate([table, jnp.roll(table, -1, axis=1)], axis=-1)


def _encode_xadd_packed(pair_tables, pos, spec: HashGridSpec):
    f = spec.n_features
    lc = spec.level_constants()

    def body(_, xs):
        pair_l, scale, res, dense, size = xs
        rows, wyz, wx0, _ = _pair_indices_weights(pos, scale, res, dense, size)
        feats = pair_l[rows].astype(jnp.float32)  # (N, 4, 2F)
        pair = feats.reshape(feats.shape[0], 4, 2, f)
        wx = jnp.stack([wx0, 1.0 - wx0], axis=-1)  # (N, 2)
        w = wyz[..., None] * wx[:, None, :]  # (N, 4, 2)
        return None, jnp.sum(pair * w[..., None], axis=(1, 2))  # (N, F)

    _, outs = jax.lax.scan(body, None, (pair_tables, lc["scale"], lc["res"], lc["dense"], lc["size"]))
    return jnp.transpose(outs, (1, 0, 2)).reshape(pos.shape[0], spec.n_output_dims)


def _encode_xadd(table, pos, spec: HashGridSpec):
    return _encode_xadd_packed(_pair_tables(table), pos, spec)


def _bwd_xadd(table, pos, spec: HashGridSpec, g, need_pos_grad: bool = True):
    f = spec.n_features
    n = pos.shape[0]
    lc = spec.level_constants()
    g_levels = g.reshape(n, spec.n_levels, f).transpose(1, 0, 2)  # (L, N, F)
    pair_tables = _pair_tables(table) if need_pos_grad else jnp.zeros((spec.n_levels, 1, 2 * f))

    def body(_, xs):
        pair_l, g_l, scale, res, dense, size = xs
        rows, wyz, wx0, dx_live = _pair_indices_weights(pos, scale, res, dense, size)
        wx = jnp.stack([wx0, 1.0 - wx0], axis=-1)  # (N, 2)
        w = wyz[..., None] * wx[:, None, :]  # (N, 4, 2)
        contrib = (w[..., None] * g_l[:, None, None, :]).astype(jnp.bfloat16)  # (N,4,2,F)
        acc = (
            jnp.zeros((spec.padded_size, 2 * f), jnp.bfloat16)
            .at[rows.reshape(-1)]
            .add(contrib.reshape(-1, 2 * f))
        )
        # fold the pair accumulator: entry i received first-half contributions
        # at row i and second-half contributions at row i-1 (mod T)
        d_l = acc[:, :f].astype(jnp.float32) + jnp.roll(acc[:, f:], 1, axis=0).astype(jnp.float32)

        if not need_pos_grad:
            return None, (d_l.astype(table.dtype), jnp.zeros((n, 3)))

        # d(out)/d(pos): analytic trilinear derivative
        feats = pair_l[rows].reshape(n, 4, 2, f)
        s = jnp.einsum("nkcf,nf->nkc", feats, g_l)  # (N, 4, 2)
        interp_x = s[..., 0] * wx0[:, None] + s[..., 1] * (1.0 - wx0[:, None])  # (N,4)
        dx = dx_live * jnp.sum(wyz * (s[..., 1] - s[..., 0]), axis=1) * scale
        yz = jnp.asarray(_YZ, jnp.float32)
        scaled = pos * scale + 0.5
        frac = scaled - jnp.floor(scaled)
        fy, fz = frac[:, 1], frac[:, 2]
        wy = jnp.where(yz[None, :, 0] == 1, fy[:, None], 1.0 - fy[:, None])
        wz = jnp.where(yz[None, :, 1] == 1, fz[:, None], 1.0 - fz[:, None])
        sy = jnp.where(yz[None, :, 0] == 1, 1.0, -1.0)
        sz = jnp.where(yz[None, :, 1] == 1, 1.0, -1.0)
        dy = jnp.sum(sy * wz * interp_x, axis=1) * scale
        dz = jnp.sum(sz * wy * interp_x, axis=1) * scale
        return None, (d_l.astype(table.dtype), jnp.stack([dx, dy, dz], axis=-1))

    _, (d_table, d_pos_levels) = jax.lax.scan(
        body, None, (pair_tables, g_levels, lc["scale"], lc["res"], lc["dense"], lc["size"])
    )
    return d_table, jnp.sum(d_pos_levels, axis=0)


# --------------------------------------------------------------------------
# oadd variant: ONE oct row per sample per level (both directions)
# --------------------------------------------------------------------------

def _oct_offsets(spec: HashGridSpec, l: int):
    """Static (sy, sz, offsets[8]) for level l. offsets[k] is the table
    offset of corner k (bit0=x, bit1=y, bit2=z) from the cell's base index;
    hash-level offsets wrap mod size, which the oct-table roll reproduces
    exactly because every hash level's size equals padded_size."""
    size = spec.sizes[l]
    if spec.dense[l]:
        sy, sz = spec.resolutions[l], spec.resolutions[l] ** 2
    else:
        sy, sz = _OCT_SY % size, _OCT_SZ % size
    offs = [((k & 1) + ((k >> 1) & 1) * sy + ((k >> 2) & 1) * sz) % size for k in range(8)]
    return sy, sz, offs


def _oct_strides(spec: HashGridSpec):
    per = [_oct_offsets(spec, l) for l in range(spec.n_levels)]
    sy = jnp.asarray([p[0] for p in per], jnp.int32)
    sz = jnp.asarray([p[1] for p in per], jnp.int32)
    off = jnp.asarray([p[2] for p in per], jnp.int32)  # (L, 8)
    return sy, sz, off


def _oct_tables(table, spec: HashGridSpec):
    """(L, T_pad, F) -> oct view (L, T_pad, 8F): O[l, i] = [t[l, i+o] for o
    in offsets(l)]. Built with STATIC per-level rolls outside the scan
    (contiguous copies, no gathers)."""
    per_level = []
    for l in range(spec.n_levels):
        _, _, offs = _oct_offsets(spec, l)
        t = table[l]
        per_level.append(jnp.concatenate([jnp.roll(t, -o, axis=0) for o in offs], axis=-1))
    return jnp.stack(per_level)


def _oct_base_w0(pos, scale, res, dense, size, sy, sz):
    """Base row + corner-0 per-dim weights for ONE level (traced constants).

    Returns (idx0 (N,) i32, w0 (N, 3) f32, dlive (N, 3) f32). w0[:, d] is
    the weight factor of corner bit_d == 0 in dim d (bit_d == 1 gets
    1 - w0); the full trilinear weight of corner k is the product over d.
    Dense levels clamp each dim's corner pair into [0, res-2] with the
    weight shifted onto the surviving entry (exactly clip-to-[0, res-1]
    semantics); `dlive` zeroes the analytic derivative of a clamped dim."""
    scaled = pos * scale + 0.5
    base = jnp.floor(scaled)
    frac = scaled - base
    base = base.astype(jnp.int32)

    bc = jnp.clip(base, 0, jnp.maximum(res - 2, 0))
    hi = base > res - 2
    lo = base < 0
    w0_dense = jnp.where(hi, 0.0, jnp.where(lo, 1.0, 1.0 - frac))
    b = jnp.where(dense, bc, base)
    w0 = jnp.where(dense, w0_dense, 1.0 - frac)  # (N, 3) weight of corner 0
    dlive = jnp.where(dense & (hi | lo), 0.0, 1.0)  # (N, 3)

    u = b.astype(jnp.uint32)
    idx0 = (
        (u[:, 0] + u[:, 1] * sy.astype(jnp.uint32) + u[:, 2] * sz.astype(jnp.uint32))
        % size.astype(jnp.uint32)
    ).astype(jnp.int32)
    return idx0, w0, dlive


def _oct_base_weights(pos, scale, res, dense, size, sy, sz):
    """_oct_base_w0 with the per-corner weight matrix expanded:
    (idx0 (N,) i32, W (N, 8, 3) f32, dlive (N, 3) f32)."""
    idx0, w0, dlive = _oct_base_w0(pos, scale, res, dense, size, sy, sz)
    corners = jnp.asarray(_CORNERS, bool)  # (8, 3)
    W = jnp.where(corners[None], 1.0 - w0[:, None, :], w0[:, None, :])  # (N, 8, 3)
    return idx0, W, dlive


def _encode_oadd_packed(oct_tables, pos, spec: HashGridSpec):
    f = spec.n_features
    lc = spec.level_constants()
    sy_a, sz_a, _ = _oct_strides(spec)

    def body(_, xs):
        oct_l, scale, res, dense, size, sy, sz = xs
        idx0, W, _ = _oct_base_weights(pos, scale, res, dense, size, sy, sz)
        w8 = W[..., 0] * W[..., 1] * W[..., 2]  # (N, 8)
        feats = oct_l[idx0].astype(jnp.float32).reshape(-1, 8, f)
        return None, jnp.einsum("nk,nkf->nf", w8, feats)

    _, outs = jax.lax.scan(
        body, None, (oct_tables, lc["scale"], lc["res"], lc["dense"], lc["size"], sy_a, sz_a)
    )
    return jnp.transpose(outs, (1, 0, 2)).reshape(pos.shape[0], spec.n_output_dims)


def _encode_oadd(table, pos, spec: HashGridSpec):
    return _encode_oadd_packed(_oct_tables(table, spec), pos, spec)


def _bwd_oadd_stochastic(table, pos, spec: HashGridSpec, g, acc_dtype=jnp.bfloat16):
    """One-corner unbiased gradient deposit (opt-in, spec.stochastic_bwd).

    Per (sample, level): draw corner k with probability equal to its
    trilinear weight w8[k] (the weights sum to 1 by construction, including
    dense-level clamping which shifts weight onto the surviving corner) and
    scatter the UNWEIGHTED upstream gradient g into that corner's row —
    E[deposit at corner k] = w8[k] * g, exactly the dense deposit's value.
    The scatter narrows from the oct row (w=16 bf16, ~35 ns/row measured) to
    the plain (w=F) row (~14 ns/row), and the 8-way roll-fold disappears.
    The reference's tcnn backward deposits into all 8 corners
    (atomicAdd per corner); this trades deterministic-per-sample noise that
    Adam/EMA average out for ~2.4x backward-scatter throughput (A/B PSNR
    parity recorded in ROADMAP).

    Randomness: a per-(sample, level) hash of the position mantissa bits —
    positions are freshly jittered every training step, so draws decorrelate
    across steps without threading an RNG key through custom_vjp.

    The draw FACTORIZES: the trilinear weight of corner k = (kx, ky, kz) is
    the product of independent per-dim factors (W[:, k, d] depends only on
    k's bit d), so three independent per-dim Bernoulli draws
    kd ~ Bern(1 - w0[:, d]) yield P(k) = w8[k] exactly — no (N, 8) weight
    matrix, product, or cumsum is ever materialized (measured ~10 ms/step
    cheaper than the explicit-CDF draw at 2^18 samples x 16 levels).
    """
    table = as_level_major(table, spec)
    f = spec.n_features
    n = pos.shape[0]
    lc = spec.level_constants()
    g_levels = g.reshape(n, spec.n_levels, f).transpose(1, 0, 2)  # (L, N, F)
    sy_a, sz_a, off_a = _oct_strides(spec)
    # level-subsampling rate: each sample deposits into levels l with
    # l % kr == (sample index) % kr, scaled by kr (see HashEncodingConfig.
    # stochastic_level_rate); rows drop kr-fold via strided slices
    kr = spec.stochastic_level_rate
    if kr <= 1 or n % kr != 0:
        kr = 1
    # position-bit hash, salted per level inside the scan
    pbits = jax.lax.bitcast_convert_type(pos, jnp.uint32)  # (N, 3)
    hbase = (
        pbits[:, 0] * jnp.uint32(0x9E3779B1)
        ^ pbits[:, 1] * jnp.uint32(0x85EBCA77)
        ^ pbits[:, 2] * jnp.uint32(0xC2B2AE3D)
    )
    lsalt = (jnp.arange(spec.n_levels, dtype=jnp.uint32) + 1) * jnp.uint32(0x27D4EB2F)
    lidx = jnp.arange(spec.n_levels, dtype=jnp.int32)
    if kr > 1:
        pos_r = pos.reshape(n // kr, kr, 3)
        hbase_r = hbase.reshape(n // kr, kr)
        g_levels = g_levels.reshape(spec.n_levels, n // kr, kr, f)

    def body(_, xs):
        g_l, scale, res, dense, size, sy, sz, off, salt, li = xs
        if kr > 1:
            r = li % kr
            p = jax.lax.dynamic_index_in_dim(pos_r, r, axis=1, keepdims=False)
            hb = jax.lax.dynamic_index_in_dim(hbase_r, r, axis=1, keepdims=False)
            g_l = jax.lax.dynamic_index_in_dim(g_l, r, axis=1, keepdims=False) * float(kr)
        else:
            p, hb = pos, hbase
        m = p.shape[0]
        idx0, w0, _ = _oct_base_w0(p, scale, res, dense, size, sy, sz)
        h = hb ^ salt
        k = jnp.zeros((m,), jnp.int32)
        for d in range(3):  # one independent 24-bit uniform per dim
            h = (h ^ (h >> 15)) * jnp.uint32(0x2C1B3C6D)
            u = (h >> 8).astype(jnp.float32) * jnp.float32(2.0**-24)
            k = k | ((u >= w0[:, d]).astype(jnp.int32) << d)
        row = idx0 + off[k]
        row = jnp.where(row >= size, row - size, row)
        d_l = (
            jnp.zeros((spec.padded_size, f), acc_dtype)
            .at[row]
            .add(g_l.astype(acc_dtype))
        )
        return None, d_l.astype(table.dtype)

    _, d_table = jax.lax.scan(
        body,
        None,
        (g_levels, lc["scale"], lc["res"], lc["dense"], lc["size"], sy_a, sz_a, off_a, lsalt, lidx),
    )
    return d_table


def _bwd_oadd(table, pos, spec: HashGridSpec, g, need_pos_grad: bool = True, acc_dtype=jnp.bfloat16):
    table = as_level_major(table, spec)
    f = spec.n_features
    n = pos.shape[0]
    lc = spec.level_constants()
    g_levels = g.reshape(n, spec.n_levels, f).transpose(1, 0, 2)  # (L, N, F)
    sy_a, sz_a, off_a = _oct_strides(spec)
    oct_tables = _oct_tables(table, spec) if need_pos_grad else jnp.zeros((spec.n_levels, 1, 8 * f))

    def body(_, xs):
        oct_l, g_l, scale, res, dense, size, sy, sz, off = xs
        idx0, W, dlive = _oct_base_weights(pos, scale, res, dense, size, sy, sz)
        w8 = W[..., 0] * W[..., 1] * W[..., 2]  # (N, 8)
        contrib = (w8[..., None] * g_l[:, None, :]).astype(acc_dtype)  # (N, 8, F)
        acc = (
            jnp.zeros((spec.padded_size, 8 * f), acc_dtype)
            .at[idx0]
            .add(contrib.reshape(n, 8 * f))
        )
        # fold the oct accumulator: table entry i received corner-k
        # contributions at base row i - off[k] (mod T)
        d_l = jnp.zeros((spec.padded_size, f), jnp.float32)
        for k in range(8):
            d_l = d_l + jnp.roll(acc[:, k * f : (k + 1) * f].astype(jnp.float32), off[k], axis=0)

        if not need_pos_grad:
            return None, (d_l.astype(table.dtype), jnp.zeros((n, 3)))

        # d(out)/d(pos): analytic trilinear derivative
        feats = oct_l[idx0].astype(jnp.float32).reshape(n, 8, f)
        s = jnp.einsum("nkf,nf->nk", feats, g_l)  # (N, 8)
        sign = jnp.asarray(_CORNERS, jnp.float32) * 2.0 - 1.0  # (8, 3)
        dims = []
        for d in range(3):
            o1, o2 = (d + 1) % 3, (d + 2) % 3
            prod_other = W[..., o1] * W[..., o2]  # (N, 8)
            dims.append(dlive[:, d] * jnp.sum(sign[None, :, d] * prod_other * s, axis=1) * scale)
        return None, (d_l.astype(table.dtype), jnp.stack(dims, axis=-1))

    _, (d_table, d_pos_levels) = jax.lax.scan(
        body,
        None,
        (oct_tables, g_levels, lc["scale"], lc["res"], lc["dense"], lc["size"], sy_a, sz_a, off_a),
    )
    return d_table, jnp.sum(d_pos_levels, axis=0)


# --------------------------------------------------------------------------
# public op
# --------------------------------------------------------------------------

def pack_inference_tables(table, spec: HashGridSpec):
    """Precompute the variant's packed gather view ONCE for inference.

    The packed view (oct for "oadd": 8F wide; pair for "xadd": 2F wide) is
    what the encode actually gathers from. Training rebuilds it under jit
    every step (it changes with the table), but at render time the table is
    frozen for a whole frame — rebuilding a ~0.5 GB oct view inside every
    render_tile call (and keeping it live across the compositing while_loop)
    was measured at +17 ms per round on v5e (tools/mb11_composite.py). Pack
    once per frame, feed `hash_encode_packed`.
    """
    table = as_level_major(table, spec)
    if spec.variant == "oadd":
        return _oct_tables(table, spec)
    if spec.variant == "xadd":
        return _pair_tables(table)
    return table


def hash_encode_packed(packed, pos, spec: HashGridSpec):
    """Inference-only encode over a precomputed packed view (no custom_vjp;
    autodiff flows through the gather body natively if ever needed)."""
    if spec.variant == "oadd":
        return _encode_oadd_packed(packed, pos, spec)
    if spec.variant == "xadd":
        return _encode_xadd_packed(packed, pos, spec)
    return _encode_tcnn(packed, pos, spec)


def _hash_encode_impl(table, pos, spec: HashGridSpec):
    table = as_level_major(table, spec)
    if spec.variant == "oadd":
        return _encode_oadd(table, pos, spec)
    if spec.variant == "xadd":
        return _encode_xadd(table, pos, spec)
    return _encode_tcnn(table, pos, spec)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def hash_encode(table, pos, spec: HashGridSpec):
    """table: (L, T_pad, F); pos: (N, 3) in [0,1] -> (N, L*F) fp32."""
    return _hash_encode_impl(table, pos, spec)


def _hash_encode_fwd(table, pos, spec: HashGridSpec):
    return hash_encode(table, pos, spec), (table, pos)


def _hash_encode_bwd(spec: HashGridSpec, res_, g):
    table, pos = res_
    opt_layout = is_opt_layout(table, spec)
    tbl = as_level_major(table, spec)
    if spec.variant == "oadd":
        d_table, d_pos = _bwd_oadd(tbl, pos, spec, g)
    elif spec.variant == "xadd":
        d_table, d_pos = _bwd_xadd(tbl, pos, spec, g)
    else:
        d_table, d_pos = _bwd_tcnn(tbl, pos, spec, g)
    if opt_layout:
        d_table = d_table.transpose(0, 2, 1)
    return d_table, d_pos


hash_encode.defvjp(_hash_encode_fwd, _hash_encode_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def hash_encode_const_pos(table, pos, spec: HashGridSpec):
    """hash_encode with the d/dpos path structurally absent from the
    backward (d_pos == 0). Training and grid maintenance never differentiate
    through sample positions, but XLA's scan-output DCE only partially
    eliminates the analytic pos-derivative (measured ~65 ms/step residue on
    v5e); this variant removes it at trace time. Use plain `hash_encode`
    where d/dpos matters (input_gradient / Normals)."""
    return _hash_encode_impl(table, pos, spec)


def _hash_encode_cp_fwd(table, pos, spec: HashGridSpec):
    return hash_encode_const_pos(table, pos, spec), (table, pos)


def _hash_encode_cp_bwd(spec: HashGridSpec, res_, g):
    table, pos = res_
    opt_layout = is_opt_layout(table, spec)
    tbl = as_level_major(table, spec)
    if spec.variant == "oadd" and spec.stochastic_bwd:
        d_table = _bwd_oadd_stochastic(tbl, pos, spec, g)
    elif spec.variant == "oadd":
        d_table, _ = _bwd_oadd(tbl, pos, spec, g, need_pos_grad=False)
    elif spec.variant == "xadd":
        d_table, _ = _bwd_xadd(tbl, pos, spec, g, need_pos_grad=False)
    else:
        d_table, _ = _bwd_tcnn(tbl, pos, spec, g)
    if opt_layout:
        d_table = d_table.transpose(0, 2, 1)
    return d_table, jnp.zeros_like(pos)


hash_encode_const_pos.defvjp(_hash_encode_cp_fwd, _hash_encode_cp_bwd)
