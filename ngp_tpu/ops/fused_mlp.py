"""Fused NGP MLP heads — the TPU analogue of tiny-cuda-nn's FullyFusedMLP.

The reference's ML runtime evaluates both MLP heads in one fused CUDA kernel
whose activations live entirely in registers/shared memory (tcnn
FullyFusedMLP, created at reference ngp_network.h:172,179). The XLA path
(ops/mlp.py) lowers each layer to a separate HLO matmul whose (N, 64)
activations round-trip HBM — measured ~1 ms per matmul at N=2^18 on v5e
(~13-19 ms for the 5-matmul fwd + backward chain), ~15x the fused traffic
floor.

This module is the Pallas equivalent: ONE kernel runs
    h0 = relu(enc @ W0); dens = h0 @ W1
    r0 = relu(dens @ V0a + sh @ V0b); r1 = relu(r0 @ V1); rgb = r1 @ V2
per N-block with every activation resident in VMEM (the rgb input concat is
algebraized away by splitting V0), and a second kernel recomputes the
forward and backpropagates in-block, accumulating weight gradients in VMEM
f32 scratch across the sequential grid. HBM traffic drops to the inputs +
outputs (~45 MB per 2^18-sample step vs ~1.5 GB), matching how the
reference's fused kernel touches memory.

Supported shape family (checked by `supports`): both heads bias-free ReLU
MLPs with hidden width <= 128, density output <= 128, built from
sh+density concat input — i.e. every config expressible in the reference's
base.json schema (network/rgb_network n_neurons, n_hidden_layers). Other
activations fall back to ops/mlp.py at the model layer.

Numerics match ops/mlp.py: bf16 operands, fp32 accumulation
(preferred_element_type), activations in fp32, re-cast to bf16 between
layers.

STATUS (r5, measured on the axon-tunneled v5e): correct and validated
(tests/test_fused_mlp.py, on-chip parity checked), but OPT-IN via
NGP_FUSED_MLP=1 — this runtime charges a fixed ~7 ms per pallas_call
(+~30-85 us per grid step; measured with an N=32k vs N=262k sweep of this
very kernel), which cancels the ~10-15 ms the fusion saves per train step.
On a direct-attached TPU the fixed tax is ~us-class and the kernel should
win by ~10x traffic; flip the default there.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_N = 2048


def _interpret() -> bool:
    # CPU meshes (tests, dryrun) run the kernels through the Pallas
    # interpreter; TPU compiles them via Mosaic
    return jax.default_backend() != "tpu"


def supports(dcfg, rcfg) -> bool:
    """Fused path covers ReLU/None bias-free heads up to width 128."""
    return (
        dcfg.activation.lower() == "relu"
        and dcfg.output_activation.lower() == "none"
        and rcfg.activation.lower() == "relu"
        and rcfg.output_activation.lower() == "none"
        and dcfg.n_neurons <= 128
        and rcfg.n_neurons <= 128
        and dcfg.n_hidden_layers >= 1
        and rcfg.n_hidden_layers >= 1
    )


def _mm(a, b):
    return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16), preferred_element_type=jnp.float32)


def _chain_fwd(x, weights, keep=False):
    """ReLU MLP chain matching ops/mlp.py numerics; x fp32.

    Returns output (pre-output-activation == none) and, if keep, the list of
    post-ReLU hidden activations (fp32)."""
    h = x
    hid = []
    for i, w in enumerate(weights):
        h = _mm(h, w)
        if i < len(weights) - 1:
            h = jnp.maximum(h, 0.0)
            if keep:
                hid.append(h)
    return h, hid


def _fwd_kernel(x_ref, sh_ref, *w_refs, nd, nr):
    # (out_rgb, out_dens) are the trailing refs
    out_rgb, out_dens = w_refs[-2], w_refs[-1]
    dw = w_refs[:nd]
    rw = w_refs[nd : nd + nr]
    dens, _ = _chain_fwd(x_ref[:], [r[:] for r in dw])
    # rgb input = concat(dens, sh): algebraized with the split first matrix
    v0a, v0b = rw[0], rw[1]
    r = jnp.maximum(_mm(dens, v0a[:]) + _mm(sh_ref[:], v0b[:]), 0.0)
    for v in rw[2:-1]:
        r = jnp.maximum(_mm(r, v[:]), 0.0)
    rgb = _mm(r, rw[-1][:])
    out_rgb[:] = rgb
    out_dens[:] = dens


def _bwd_kernel(x_ref, sh_ref, grgb_ref, gdens_ref, *refs, nd, nr):
    """Recompute fwd, backprop, accumulate weight grads across the grid."""
    dw = refs[:nd]
    rw = refs[nd : nd + nr]
    dx_ref = refs[nd + nr]
    gw_refs = refs[nd + nr + 1 :]  # nd + nr accumulators (f32)

    @pl.when(pl.program_id(0) == 0)
    def _():
        for g in gw_refs:
            g[:] = jnp.zeros_like(g)

    x = x_ref[:]
    dens, dhid = _chain_fwd(x, [r[:] for r in dw], keep=True)
    v0a, v0b = rw[0], rw[1]
    sh = sh_ref[:]
    pre0 = _mm(dens, v0a[:]) + _mm(sh, v0b[:])
    r = jnp.maximum(pre0, 0.0)
    rhid = [r]
    for v in rw[2:-1]:
        r = jnp.maximum(_mm(r, v[:]), 0.0)
        rhid.append(r)

    def mmT_nt(a, b):  # a @ b.T : (N, o), (i, o) -> (N, i)
        return jax.lax.dot_general(
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def mmT_tn(a, b):  # a.T @ b : (N, i), (N, o) -> (i, o)
        return jax.lax.dot_general(
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # rgb head backward
    g = grgb_ref[:]  # (N, 3) upstream
    gw = list(gw_refs)
    # output layer
    gw_i = nd + nr - 1
    gw[gw_i][:] += mmT_tn(rhid[-1], g)
    g = mmT_nt(g, rw[-1][:]) * (rhid[-1] > 0.0)
    for k in range(nr - 4, -1, -1):  # middle layers rw[2+k], inputs rhid[k]
        inp = rhid[k]
        gw[nd + 2 + k][:] += mmT_tn(inp, g)
        g = mmT_nt(g, rw[2 + k][:]) * (inp > 0.0)
    # split first rgb layer: d/dV0a, d/dV0b; d_dens via V0a only (d_sh unused)
    gw[nd][:] += mmT_tn(dens, g)
    gw[nd + 1][:] += mmT_tn(sh, g)
    g_dens = mmT_nt(g, v0a[:]) + gdens_ref[:]  # upstream grad to the density out
    # density head backward
    g = g_dens
    acts = [x] + dhid  # inputs to each density layer
    gw[nd - 1][:] += mmT_tn(acts[-1], g)
    g = mmT_nt(g, dw[-1][:])
    for k in range(nd - 2, -1, -1):
        g = g * (acts[k + 1] > 0.0)
        gw[k][:] += mmT_tn(acts[k], g)
        g = mmT_nt(g, dw[k][:])
    dx_ref[:] = g


def _pad_n(a, n_pad):
    return a if a.shape[0] == n_pad else jnp.pad(a, ((0, n_pad - a.shape[0]),) + ((0, 0),) * (a.ndim - 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_heads(shapes, dweights, rweights, enc, sh):
    """Fused two-head forward.

    shapes: (tuple(d_shapes), tuple(r_shapes)) static weight shapes where
    rweights[0] is pre-split into (V0a dens-rows, V0b sh-rows).
    Returns (rgb_raw (N, 3), density_out (N, Dd))."""
    return _fused_fwd_impl(shapes, dweights, rweights, enc, sh)


def _fused_fwd_impl(shapes, dweights, rweights, enc, sh):
    n = enc.shape[0]
    n_pad = -(-n // BLOCK_N) * BLOCK_N
    nd, nr = len(dweights), len(rweights)
    dd = dweights[-1].shape[1]
    x_p, sh_p = _pad_n(enc, n_pad), _pad_n(sh, n_pad)
    grid = (n_pad // BLOCK_N,)
    bspec = lambda c: pl.BlockSpec((BLOCK_N, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    wspec = lambda w: pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    rgb, dens = pl.pallas_call(
        functools.partial(_fwd_kernel, nd=nd, nr=nr),
        grid=grid,
        in_specs=[bspec(enc.shape[1]), bspec(sh.shape[1])]
        + [wspec(w) for w in dweights]
        + [wspec(w) for w in rweights],
        out_specs=[bspec(3), bspec(dd)],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 3), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, dd), jnp.float32),
        ],
        interpret=_interpret(),
    )(x_p, sh_p, *dweights, *rweights)
    return rgb[:n], dens[:n]


def _fused_heads_fwd(shapes, dweights, rweights, enc, sh):
    out = _fused_fwd_impl(shapes, dweights, rweights, enc, sh)
    return out, (dweights, rweights, enc, sh)


def _fused_heads_bwd(shapes, res, g):
    dweights, rweights, enc, sh = res
    g_rgb, g_dens = g
    n = enc.shape[0]
    n_pad = -(-n // BLOCK_N) * BLOCK_N
    nd, nr = len(dweights), len(rweights)
    x_p, sh_p = _pad_n(enc, n_pad), _pad_n(sh, n_pad)
    # padding rows carry zero upstream grad -> no weight-grad contribution
    grgb_p, gdens_p = _pad_n(g_rgb, n_pad), _pad_n(g_dens, n_pad)
    grid = (n_pad // BLOCK_N,)
    bspec = lambda c: pl.BlockSpec((BLOCK_N, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    wspec = lambda w: pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, nd=nd, nr=nr),
        grid=grid,
        in_specs=[bspec(enc.shape[1]), bspec(sh.shape[1]), bspec(3), bspec(dweights[-1].shape[1])]
        + [wspec(w) for w in dweights]
        + [wspec(w) for w in rweights],
        out_specs=[bspec(enc.shape[1])] + [wspec(w) for w in (*dweights, *rweights)],
        out_shape=[jax.ShapeDtypeStruct((n_pad, enc.shape[1]), jnp.float32)]
        + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in (*dweights, *rweights)],
        interpret=_interpret(),
    )(x_p, sh_p, grgb_p, gdens_p, *dweights, *rweights)
    dx = outs[0][:n]
    gws = outs[1:]
    d_dw = tuple(gws[:nd])
    d_rw = tuple(gws[nd:])
    # d_sh is never needed (SH has no params; dirs are not differentiated)
    return d_dw, d_rw, dx, jnp.zeros_like(sh)


fused_heads.defvjp(_fused_heads_fwd, _fused_heads_bwd)


def split_first_rgb(rgb_weights, dd: int):
    """[(dd+ds, W), ...] -> [(dd, W), (ds, W), ...]: algebraize the concat."""
    v0 = rgb_weights[0]
    return [v0[:dd], v0[dd:], *rgb_weights[1:]]


def fused_rgbsigma(dweights, rgb_weights, enc, sh):
    """Drop-in for the model heads: returns (rgb_raw (N,3), density_out)."""
    dd = dweights[-1].shape[1]
    rw = split_first_rgb(rgb_weights, dd)
    shapes = (tuple(w.shape for w in dweights), tuple(w.shape for w in rw))
    return fused_heads(shapes, tuple(dweights), tuple(rw), enc, sh)
