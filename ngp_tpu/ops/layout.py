"""Flat <-> padded sample-layout bijection as gather-only differentiable ops.

Training samples live in two layouts:

 * FLAT (C, ...): ray-contiguous compacted buffer — the dense batch the
   network consumes (reference: the compacted <=2^18 coordinate buffer,
   occupancy_sampler.cu:413-426).
 * PADDED (R, S, ...): one row per ray, samples left-justified — the layout
   the composite wants, where per-ray prefix transmittance is a plain
   `cumsum(axis=1)` over vector lanes instead of segment ops.

The two are connected by a BIJECTION on valid slots: flat slot i maps to
padded slot (ray_ids[i], i - base[ray_ids[i]]). Both directions are pure
gathers, so the backward pass of each is the opposite gather — never a
scatter. On v5e an XLA row gather costs ~4.3 ns/row while a scatter costs
14-40 ns/row AND autodiff of a plain `x[idx]` emits scatter-add; the
custom_vjp here keeps both directions on the gather price (tools/mb2.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
from typing import NamedTuple


class SampleLayout(NamedTuple):
    """Static-shape index structure tying the flat and padded layouts.

    All fields are integer/bool arrays (no gradients flow through them).
    """

    base: jnp.ndarray  # (R,) i32 — flat start offset per ray
    counts: jnp.ndarray  # (R,) i32 — valid samples per ray (0 for dropped rays)
    ray_ids: jnp.ndarray  # (C,) i32 — owning ray per flat slot (clamped >= 0)
    pos_in_ray: jnp.ndarray  # (C,) i32 — j such that flat i == padded (rid, j)
    flat_valid: jnp.ndarray  # (C,) bool
    pad_valid: jnp.ndarray  # (R, S) bool — j < counts[r]

    @property
    def capacity(self) -> int:
        return self.ray_ids.shape[0]

    @property
    def shape_rs(self):
        return self.pad_valid.shape


def build_layout(base, counts, ray_valid, capacity: int, s_pad: int) -> SampleLayout:
    """Derive the bijection indices from per-ray (base, counts).

    `base` must be the exclusive cumsum of counts over ALL rays (dropped rays
    keep their reservation as holes, mirroring the reference's atomicAdd
    bookkeeping, occupancy_sampler.cu:413-416); `ray_valid` masks rays that
    were dropped (overflow / zero samples) — their slots become invalid.

    PRECONDITION: `base` must be ASCENDING over valid rays. The rank->row
    inversion below ranks rows two ways — by flat offset (cumsum of marks)
    and by array order (cumsum of ray_valid) — and equates them. A bucket
    built from an unsorted row selection violates this and silently zeroes
    the backward (forward is unaffected: it reads only base/pad_valid).
    Callers selecting a row subset must sort the selection first
    (training.py sel_long).
    """
    R = base.shape[0]
    counts_eff = jnp.where(ray_valid, counts, 0)
    # ray id per flat slot: +1 markers at each valid ray's base, cumsum
    marks = (
        jnp.zeros((capacity,), jnp.int32)
        .at[jnp.where(ray_valid, base, capacity)]
        .add(1, mode="drop")
    )
    rid = jnp.cumsum(marks) - 1  # -1 before the first valid ray
    # rid counts valid rays only -> map back to the ray index
    valid_ray_idx = jnp.cumsum(ray_valid.astype(jnp.int32)) - 1  # per ray: its rank
    # invert: rank -> ray index, via scatter of ray indices at their rank
    rank_to_ray = (
        jnp.zeros((R,), jnp.int32)
        .at[jnp.where(ray_valid, valid_ray_idx, R)]
        .add(jnp.arange(R, dtype=jnp.int32), mode="drop")
    )
    rid_c = rank_to_ray[jnp.clip(rid, 0, R - 1)]
    pos_in_ray = jnp.arange(capacity, dtype=jnp.int32) - base[rid_c]
    flat_valid = (rid >= 0) & (pos_in_ray >= 0) & (pos_in_ray < counts_eff[rid_c])
    pad_valid = jnp.arange(s_pad, dtype=jnp.int32)[None, :] < counts_eff[:, None]
    return SampleLayout(
        base=base,
        counts=counts_eff,
        ray_ids=rid_c,
        pos_in_ray=jnp.clip(pos_in_ray, 0, s_pad - 1),
        flat_valid=flat_valid,
        pad_valid=pad_valid,
    )


def _int_zeros(*xs):
    return tuple(np.zeros(x.shape, jax.dtypes.float0) for x in xs)


@jax.custom_vjp
def pad_from_flat(flat, base, ray_ids, pos_in_ray, flat_valid, pad_valid):
    """(C, K) -> (R, S, K): padded[r, j] = flat[base[r] + j] on valid slots."""
    S = pad_valid.shape[1]
    idx = jnp.clip(base[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :], 0, flat.shape[0] - 1)
    return jnp.where(pad_valid[..., None], flat[idx], 0.0)


def _pad_from_flat_fwd(flat, base, ray_ids, pos_in_ray, flat_valid, pad_valid):
    out = pad_from_flat(flat, base, ray_ids, pos_in_ray, flat_valid, pad_valid)
    return out, (base, ray_ids, pos_in_ray, flat_valid, pad_valid)

def _pad_from_flat_bwd(res, g):
    base, ray_ids, pos_in_ray, flat_valid, pad_valid = res
    d_flat = jnp.where(flat_valid[:, None], g[ray_ids, pos_in_ray], 0.0)
    return (d_flat, *_int_zeros(base, ray_ids, pos_in_ray, flat_valid, pad_valid))

pad_from_flat.defvjp(_pad_from_flat_fwd, _pad_from_flat_bwd)


@jax.custom_vjp
def flat_from_pad(padded, base, ray_ids, pos_in_ray, flat_valid, pad_valid):
    """(R, S, K) -> (C, K): flat[i] = padded[ray_ids[i], pos_in_ray[i]] on valid slots."""
    return jnp.where(flat_valid[:, None], padded[ray_ids, pos_in_ray], 0.0)


def _flat_from_pad_fwd(padded, base, ray_ids, pos_in_ray, flat_valid, pad_valid):
    out = flat_from_pad(padded, base, ray_ids, pos_in_ray, flat_valid, pad_valid)
    return out, (base, ray_ids, pos_in_ray, flat_valid, pad_valid, padded.shape)

def _flat_from_pad_bwd(res, g):
    base, ray_ids, pos_in_ray, flat_valid, pad_valid, pshape = res
    S = pad_valid.shape[1]
    idx = jnp.clip(base[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :], 0, g.shape[0] - 1)
    d_pad = jnp.where(pad_valid[..., None], g[idx], 0.0)
    return (d_pad, *_int_zeros(base, ray_ids, pos_in_ray, flat_valid, pad_valid))

flat_from_pad.defvjp(_flat_from_pad_fwd, _flat_from_pad_bwd)


def pad_layout(layout: SampleLayout, flat):
    """Convenience wrapper: flat (C, K) or (C,) -> padded (R, S, K) / (R, S)."""
    squeeze = flat.ndim == 1
    out = pad_from_flat(
        flat[:, None] if squeeze else flat,
        layout.base, layout.ray_ids, layout.pos_in_ray, layout.flat_valid, layout.pad_valid,
    )
    return out[..., 0] if squeeze else out


def flat_layout(layout: SampleLayout, padded):
    """Convenience wrapper: padded (R, S, K) or (R, S) -> flat (C, K) / (C,)."""
    squeeze = padded.ndim == 2
    out = flat_from_pad(
        padded[..., None] if squeeze else padded,
        layout.base, layout.ray_ids, layout.pos_in_ray, layout.flat_valid, layout.pad_valid,
    )
    return out[..., 0] if squeeze else out
