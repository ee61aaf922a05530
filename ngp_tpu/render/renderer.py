"""Novel-view renderer: span-tiled marching + budgeted slab compositing.

Rebuild of the reference render path (testbed.cu:479-606 render_frame +
occupancy_sampler.cu:451-600 ray init/advance + ray_marcher.cu:215-295
volume_rendering_kernel), reshaped for XLA:

reference (GPU):  alive-ray compaction with atomicAdd + a host readback of
                  n_alive EVERY iteration (testbed.cu:540-541), adaptive
                  n_steps between compactions.
here (TPU):       per frame — (1) rays are clipped to the occupied-cell AABB
                  on the host (zero device work: the slab spans come from
                  the box alone) and sorted by span length into a few big
                  homogeneous tiles; (2) per tile, ONE vectorized marching
                  pass collects each ray's occupied lattice ordinals into a
                  padded (R, S) buffer; (3) a single `lax.while_loop` then
                  composites rays in fixed (A, D) sample budgets — each
                  round device-compacts the alive rays to the front, takes
                  the next D samples of the first A, and evaluates the
                  network ONLY on that budget. Dead rays cost nothing after
                  the round they die in, and the whole frame runs with zero
                  mid-frame host syncs.

Render modes (ERenderMode, common.h:73-81): Shade, Depth, Distance,
Stepsize, AO, Cost, and Normals (via the analytic hash-encoding input
gradient, models/ngp.py input_gradient; exercised by tests/test_end_to_end.py).
"""

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ngp_tpu.models.ngp import NGPModel, apply_density_activation, apply_rgb_activation
from ngp_tpu.sampling.lattice import (
    coarse_segment_mask,
    count_samples,
    count_samples_segments,
    lattice_dt,
    lattice_t,
    n_lattice_points,
    segments_supported,
)
from ngp_tpu.utils.aabb import AABB, warp_dt
from ngp_tpu.utils.color import srgb_to_linear
from ngp_tpu.utils.config import NGPConfig
from ngp_tpu.utils.qmc import ld_random_pixel_offset, ld_random_val

RENDER_MODES = ("AO", "Shade", "Normals", "Depth", "Distance", "Stepsize", "Cost")

_BUDGET = 1 << 18  # network samples per compositing round (A * D)
_D = 16  # samples per ray per round (reference marches 1..8, testbed.cu:546)
# sentinel for "no sample" lattice ordinals on the segment path: any value
# above every real k0-relative ordinal works, and a FIXED one keeps the
# frame's segment count out of the executable cache key (one compile serves
# every frame geometry; real ordinals are < n_lattice_points << 2^20)
_SENTINEL = 1 << 20
# depth cascade: once few rays remain alive, advance each by more samples per
# round so the fixed (A*D = _BUDGET) network batch stays full of VALID work —
# the TPU analogue of the reference's adaptive n_steps = clamp(n_pixels /
# n_alive, 1..8) between compactions (testbed.cu:546-549). Stage k runs while
# n_alive exceeds the next stage's ray capacity _BUDGET//D.
_D_CASCADE = (16, 64, 256)


def _render_tile_impl(
    model: NGPModel,
    config: NGPConfig,
    params,
    occupancy,
    o,  # (R, 3)
    d,  # (R, 3)
    k0,  # (R,) int32 first lattice index of the ray's occupied window
    ray_id,  # (R,) int32 global pixel index (jitter stream)
    tile_valid,  # (R,) bool — padding rows are False
    spp,  # () uint32 — current sample index (march jitter seed)
    camera_fwd,  # (3,)
    camera_origin,  # (3,)
    depth_scale,  # () f32
    n_rounds_max=None,  # () int32 TRACED round bound (not a cache-key shape)
    render_mode: str = "Shade",
    n_window: int = 128,
    train_in_linear_color: bool = False,
    rgb_activation: str = "Logistic",
    density_activation: str = "Exponential",
    envmap=None,
    seg_idx=None,  # (R, C) kept coarse segments (single-cascade fast path)
    packed=None,  # (G^3,) uint32 packed 3^3 neighborhoods (packed_march_supported)
    n_spp: int = 1,  # passes composited in THIS call (shared march)
    accum_space: str = "linear",  # pass-mean space for n_spp > 1
    share_evals: bool = True,  # n_spp > 1: one network eval serves all passes
):
    """Render one span-tile of rays -> (R, 4) framebuffer contribution
    (premultiplied linear).

    n_spp > 1 composites that many spp passes in ONE call: the march runs
    once in jitter-cover mode (a conservative superset of every pass's exact
    occupied set — lattice.count_samples_segments), each pass becomes R
    virtual rays at its own ld-jittered march start, all n_spp*R virtual
    rays share one budgeted while_loop, and the result is the passes' mean
    in `accum_space` (exactly render/buffer.accumulate over equal frames).
    Requires jitter_cover_supported when marching (callers gate); spp is the
    FIRST pass index. The reference re-marches per pass (testbed.cu:479),
    paying its march 8x per frame — here one march serves all passes.

    share_evals (Shade mode, arithmetic lattice): the passes additionally
    share the NETWORK evaluations — sigma/rgb are evaluated once per
    occupied lattice cell (at the unjittered lattice points) and each pass's
    samples at t + u_s*dt come from the in-cell linear interpolation of the
    two adjacent evals (nearest across occupancy gaps / round boundaries).
    The ring queue then holds R physical rays, each compositing all n_spp
    per-pass transmittance chains from one (A, D) eval block — n_spp x fewer
    network samples per frame, the single dominant cost at the XLA gather
    floor (ROADMAP.md: 14.2M samples/pass x 130 ns x 8 passes == the whole
    r3 frame budget). The remaining per-pass work is elementwise (VPU) and
    rides the same HBM traffic. Quality trade: sub-dt jitter integrates a
    piecewise-LINEAR reconstruction of the field instead of re-querying the
    network — A/B'd in tools/ab_spp_share.py + tests/test_spp_share.py.
    """
    scfg = config.sampler
    aabb = AABB.scene(scfg.aabb_scale)
    dt = scfg.min_cone_stepsize
    thresh = config.render.transmittance_threshold
    R = o.shape[0]
    V = n_spp * R  # virtual rays: vr = s * R + r
    n_rounds_max = jnp.asarray(64 if n_rounds_max is None else n_rounds_max, jnp.int32)

    # ray init (init_rays_with_payload_kernel_nerf, cu:451-503): rendering
    # near plane 0.05, per-spp ld jitter on the march start (cu:529)
    tmin, tmax = aabb.ray_intersect(o, d)
    t0 = jnp.maximum(tmin, 0.05) + 1e-6
    alive0 = aabb.contains(o + d * t0[:, None]) & tile_valid
    seed = ray_id.astype(jnp.uint32) * jnp.uint32(786433)
    share = share_evals and n_spp > 1 and render_mode == "Shade"
    if n_spp == 1:
        startt_v = t0 + ld_random_val(spp, seed) * dt  # (R,) == (V,)
        startt_march = startt_v
        cover = False
    else:
        jit_s = jnp.stack([ld_random_val(spp + jnp.uint32(s), seed) for s in range(n_spp)])
        startt_v = (t0[None, :] + jit_s * dt).reshape(-1)  # (V,)
        startt_march = t0  # unjittered; the cover mask absorbs [0, dt)
        cover = True

    # ONE marching pass: occupied window ordinals, padded per ray. With
    # seg_idx the march touches only the pre-masked coarse segments
    # (width C*8 instead of the full window).
    if seg_idx is not None:
        counts, masks, lat_all = count_samples_segments(
            scfg, aabb, occupancy, o, d, startt_march, k0, seg_idx,
            packed=packed, jitter_cover=cover,
        )
        W = seg_idx.shape[1] * 8
        sentinel = _SENTINEL  # frame-size-independent (callers pass n_window=0)
        keys = jnp.where(masks & alive0[:, None], lat_all, jnp.int32(sentinel))
    else:
        counts, masks = count_samples(
            scfg, aabb, occupancy, o, d, startt_march, n_window,
            return_masks=True, k0=k0, packed=packed, jitter_cover=cover,
        )
        W = n_window
        sentinel = n_window
        iota = jnp.arange(n_window, dtype=jnp.int32)[None, :]
        keys = jnp.where(masks & alive0[:, None], iota, jnp.int32(sentinel))
    counts = jnp.where(alive0, counts, 0)
    # sorted occupied ordinals, packed FOUR per gather row: the composite
    # reads runs [cur, cur + D) with cur always a multiple of _D (16), so
    # 4-aligned rows quarter the per-round gather rows (XLA gathers cost per
    # ROW, flat to w=4 — ROADMAP mb2/mb6)
    t_idx4 = jax.lax.sort(keys, dimension=1).reshape(-1, 4)  # (R * W/4, 4)

    dirs_w = (d + 1.0) * 0.5

    def make_round(A, D):
        def round_body(state):
            # alive rays live in a RING QUEUE: pop A ids at `head`, composite
            # their next D samples, push survivors back at `tail`. Everything
            # is A-row work — the alternative (recompacting an alive mask) is
            # a V-row scatter EVERY round, ~7 ms at V = 8*2^16 (mb6 scatter
            # rates), which dominated the non-network loop cost. At most
            # tail - head <= V ids are in flight, so mod-V indexing never
            # collides.
            rnd, head, tail, queue, cursor, trans, rgb_acc, opac, processed = state
            n_alive = tail - head
            idx = (head + jnp.arange(A, dtype=jnp.int32)) % V
            sel = queue[idx]  # (A,) virtual-ray ids
            slot = jnp.arange(A, dtype=jnp.int32) < n_alive  # (A,)
            r = sel % R if n_spp > 1 else sel  # physical ray of each slot

            cur = cursor[sel]  # (A,); always a multiple of D (>= 16)
            j = jnp.arange(D, dtype=jnp.int32)[None, :]
            j4 = jnp.arange(D // 4, dtype=jnp.int32)[None, :]
            flat4 = r[:, None] * (W // 4) + jnp.minimum(cur[:, None] // 4 + j4, W // 4 - 1)
            lat = t_idx4[flat4.reshape(-1)].reshape(A, D)  # (A, D) window ordinal
            valid = slot[:, None] & ((cur[:, None] + j) < counts[r][:, None]) & (lat < sentinel)

            ts = lattice_t(scfg, startt_v[sel][:, None], k0[r][:, None] + lat)
            dts = lattice_dt(scfg, ts)  # (A, D); == dt when cone angle is 0
            pos = o[r][:, None, :] + ts[..., None] * d[r][:, None, :]  # (A, D, 3)
            if cover:
                # the cover mask is a superset: re-test the scene box at the
                # EXACT jittered position (pointwise, free — pos is in hand)
                valid = valid & aabb.contains(pos)
            pos_w = aabb.relative_pos(pos).reshape(-1, 3)
            dir_w = jnp.broadcast_to(dirs_w[r][:, None, :], (A, D, 3)).reshape(-1, 3)

            rgb_raw, sigma_raw = model.rgbsigma_raw(params, pos_w, dir_w)
            sigma = apply_density_activation(sigma_raw, density_activation).reshape(A, D)
            rgb = apply_rgb_activation(rgb_raw, rgb_activation).reshape(A, D, 3)

            if render_mode == "Normals":
                # d(sigma)/d(pos): the normal points down the density gradient
                # (volume_rendering_kernel cu:260-265)
                grad_pos = model.input_gradient(params, pos_w, density_activation)
                nrm = -grad_pos / jnp.maximum(jnp.linalg.norm(grad_pos, axis=-1, keepdims=True), 1e-12)
                rgb = nrm.reshape(A, D, 3)
            elif render_mode == "Depth":
                z = jnp.einsum("rsc,c->rs", pos - camera_origin, camera_fwd) * depth_scale
                rgb = jnp.repeat(z[..., None], 3, axis=-1)
            elif render_mode == "Distance":
                z = jnp.linalg.norm(pos - camera_origin, axis=-1) * depth_scale
                rgb = jnp.repeat(z[..., None], 3, axis=-1)
            elif render_mode == "Stepsize":
                rgb = jnp.broadcast_to(
                    warp_dt(dts, dt, scfg.n_cascades)[..., None], rgb.shape
                ) * jnp.ones_like(rgb)

            sdt = jnp.where(valid, sigma * dts, 0.0)
            alpha = 1.0 - jnp.exp(-sdt)
            if render_mode == "AO":
                rgb = jnp.repeat(alpha[..., None], 3, axis=-1)

            # composite the round's D samples (early-stop semantics: a sample is
            # included iff transmittance BEFORE it >= threshold, cu:72)
            acc_before = jnp.cumsum(sdt, axis=1) - sdt
            t_before = trans[sel][:, None] * jnp.exp(-acc_before)
            include = valid & (t_before >= thresh)
            w = jnp.where(include, alpha * t_before, 0.0)

            add_rgb = jnp.sum(w[..., None] * rgb, axis=1)
            add_opac = jnp.sum(w, axis=1)
            new_trans_sel = trans[sel] * jnp.exp(-jnp.sum(jnp.where(include, sdt, 0.0), axis=1))
            add_proc = jnp.sum(include, axis=1)

            guard = jnp.where(slot, sel, V)  # padding slots dropped
            rgb_acc = rgb_acc.at[guard].add(jnp.where(slot[:, None], add_rgb, 0.0), mode="drop")
            opac = opac.at[guard].add(jnp.where(slot, add_opac, 0.0), mode="drop")
            processed = processed.at[guard].add(jnp.where(slot, add_proc, 0), mode="drop")
            trans = trans.at[guard].set(jnp.where(slot, new_trans_sel, 1.0), mode="drop")
            cursor = cursor.at[guard].add(jnp.where(slot, D, 0), mode="drop")

            survive = slot & (new_trans_sel >= thresh) & (cur + D < counts[r])
            rank = jnp.cumsum(survive.astype(jnp.int32)) - 1  # (A,)
            push_at = jnp.where(survive, (tail + rank) % V, V)
            queue = queue.at[push_at].set(sel, mode="drop")
            n_pop = jnp.minimum(n_alive, A)
            n_push = jnp.sum(survive, dtype=jnp.int32)
            return (
                rnd + 1, head + n_pop, tail + n_push,
                queue, cursor, trans, rgb_acc, opac, processed,
            )

        return round_body

    def make_round_shared(A, D):
        P_ = n_spp
        ju_all = jit_s.T  # (R, P) per-ray, per-pass march-start jitter

        def round_body(state):
            # ring queue over R PHYSICAL rays; each slot composites all P_
            # per-pass transmittance chains from ONE (A, D) eval block
            rnd, head, tail, queue, cursor, trans, rgb_acc, opac, processed = state
            n_alive = tail - head
            idx = (head + jnp.arange(A, dtype=jnp.int32)) % R
            sel = queue[idx]  # (A,) physical-ray ids
            slot = jnp.arange(A, dtype=jnp.int32) < n_alive

            cur = cursor[sel]
            j = jnp.arange(D, dtype=jnp.int32)[None, :]
            j4 = jnp.arange(D // 4, dtype=jnp.int32)[None, :]
            flat4 = sel[:, None] * (W // 4) + jnp.minimum(cur[:, None] // 4 + j4, W // 4 - 1)
            lat = t_idx4[flat4.reshape(-1)].reshape(A, D)
            valid = slot[:, None] & ((cur[:, None] + j) < counts[sel][:, None]) & (lat < sentinel)

            # ONE network eval per cell, at the UNJITTERED lattice points
            ts = lattice_t(scfg, t0[sel][:, None], k0[sel][:, None] + lat)
            dts = lattice_dt(scfg, ts)  # == dt (arithmetic lattice; callers gate)
            pos = o[sel][:, None, :] + ts[..., None] * d[sel][:, None, :]
            pos_w = aabb.relative_pos(pos).reshape(-1, 3)
            dir_w = jnp.broadcast_to(dirs_w[sel][:, None, :], (A, D, 3)).reshape(-1, 3)
            rgb_raw, sigma_raw = model.rgbsigma_raw(params, pos_w, dir_w)
            sigma = apply_density_activation(sigma_raw, density_activation).reshape(A, D)
            rgb = apply_rgb_activation(rgb_raw, rgb_activation).reshape(A, D, 3)

            # in-cell lerp partner: the next eval IF it is the adjacent
            # lattice cell (march order makes it column j+1); nearest across
            # occupancy gaps and at the round's last column. NOTE: the
            # last-column fallback makes the image depend (weakly) on the
            # round depth D, an internal tile-budget detail — its true
            # neighbor's sigma belongs to the NEXT round's eval block, and
            # carrying it would cost a (D+1)-th network column per round.
            # Measured: the whole lerp approximation (incl. this boundary)
            # is +0.0004 dB vs exact per-pass evals (tools/ab_spp_share.py).
            nxt = jnp.concatenate([lat[:, 1:], jnp.full((A, 1), -2, jnp.int32)], axis=1)
            adj = nxt == lat + 1
            sig_next = jnp.where(adj, jnp.concatenate([sigma[:, 1:], sigma[:, -1:]], axis=1), sigma)
            rgb_next = jnp.where(
                adj[..., None], jnp.concatenate([rgb[:, 1:], rgb[:, -1:]], axis=1), rgb
            )

            u = ju_all[sel][:, :, None]  # (A, P, 1) in [0, 1)
            sig_p = sigma[:, None, :] * (1.0 - u) + sig_next[:, None, :] * u  # (A, P, D)
            # per-pass scene-box test at the jittered position (t monotone
            # along the ray, so the box exit test is a t comparison)
            valid_p = valid[:, None, :] & (ts[:, None, :] + u * dts[:, None, :] <= tmax[sel][:, None, None])

            sdt = jnp.where(valid_p, sig_p * dts[:, None, :], 0.0)
            alpha = 1.0 - jnp.exp(-sdt)
            acc_before = jnp.cumsum(sdt, axis=2) - sdt
            t_before = trans[sel][:, :, None] * jnp.exp(-acc_before)
            include = valid_p & (t_before >= thresh)
            wgt = jnp.where(include, alpha * t_before, 0.0)  # (A, P, D)

            rgb_p = rgb[:, None] * (1.0 - u[..., None]) + rgb_next[:, None] * u[..., None]
            add_rgb = jnp.sum(wgt[..., None] * rgb_p, axis=2)  # (A, P, 3)
            add_opac = jnp.sum(wgt, axis=2)  # (A, P)
            new_trans_sel = trans[sel] * jnp.exp(-jnp.sum(jnp.where(include, sdt, 0.0), axis=2))

            guard = jnp.where(slot, sel, R)
            rgb_acc = rgb_acc.at[guard].add(jnp.where(slot[:, None, None], add_rgb, 0.0), mode="drop")
            opac = opac.at[guard].add(jnp.where(slot[:, None], add_opac, 0.0), mode="drop")
            trans = trans.at[guard].set(jnp.where(slot[:, None], new_trans_sel, 1.0), mode="drop")
            cursor = cursor.at[guard].add(jnp.where(slot, D, 0), mode="drop")

            # a ray stays while ANY pass is above threshold (dead passes
            # contribute nothing via `include`)
            survive = slot & jnp.any(new_trans_sel >= thresh, axis=1) & (cur + D < counts[sel])
            rank = jnp.cumsum(survive.astype(jnp.int32)) - 1
            push_at = jnp.where(survive, (tail + rank) % R, R)
            queue = queue.at[push_at].set(sel, mode="drop")
            n_pop = jnp.minimum(n_alive, A)
            n_push = jnp.sum(survive, dtype=jnp.int32)
            return (
                rnd + 1, head + n_pop, tail + n_push,
                queue, cursor, trans, rgb_acc, opac, processed,
            )

        return round_body

    Q = R if share else V  # queue domain: physical vs virtual rays
    alive_init = counts > 0
    if n_spp > 1 and not share:
        alive_init = jnp.tile(alive_init, n_spp)
    # one-time queue build (the only Q-row scatter of the whole tile)
    order0 = jnp.cumsum(alive_init.astype(jnp.int32)) - 1
    queue0 = jnp.zeros((Q,), jnp.int32).at[jnp.where(alive_init, order0, Q)].set(
        jnp.arange(Q, dtype=jnp.int32), mode="drop"
    )
    state = (
        jnp.int32(0),
        jnp.int32(0),  # queue head (total popped)
        jnp.sum(alive_init, dtype=jnp.int32),  # queue tail (total pushed)
        queue0,
        jnp.zeros((Q,), jnp.int32),  # cursor
        jnp.ones((R, n_spp) if share else (V,), jnp.float32),  # transmittance
        jnp.zeros((R, n_spp, 3) if share else (V, 3), jnp.float32),
        jnp.zeros((R, n_spp) if share else (V,), jnp.float32),  # opacity
        jnp.zeros((Q,), jnp.int32),  # processed (Cost mode)
    )
    # stage list: deduplicated cascade depths capped at the number of lattice
    # ordinals a ray can actually hold (W = C*8 on the segment path)
    depths = []
    for D_k in _D_CASCADE:
        D_k = min(D_k, W)
        if not depths or D_k > depths[-1]:
            depths.append(D_k)
    for si, D_k in enumerate(depths):
        A_k = max(min(_BUDGET // D_k, Q), 1)
        # hand off to the next (deeper) stage once its ray slots can hold
        # every alive ray; the final stage drains the tile
        next_cap = (
            None if si == len(depths) - 1 else max(min(_BUDGET // depths[si + 1], Q), 1)
        )

        def stage_cond(state, next_cap=next_cap):
            rnd, head, tail = state[0], state[1], state[2]
            n_alive = tail - head
            more = (n_alive > 0) if next_cap is None else (n_alive > next_cap)
            return (rnd < n_rounds_max) & more

        body = make_round_shared(A_k, D_k) if share else make_round(A_k, D_k)
        state = jax.lax.while_loop(stage_cond, body, state)
    _, _, _, _, _, trans, rgb_acc, opac, processed = state
    if share:
        # rejoin the virtual-ray layout (vr = s * R + r) for the shared tail
        rgb_acc = rgb_acc.transpose(1, 0, 2).reshape(V, 3)
        opac = opac.transpose(1, 0).reshape(V)
        processed = jnp.tile(processed, n_spp)

    # shade_kernel (testbed.cu:448-477)
    hit = opac > 0.001
    if render_mode == "Cost":
        col = processed.astype(jnp.float32) / 128.0
        out = jnp.stack([col, col, col, jnp.ones_like(col)], axis=-1)
    elif render_mode == "Normals":
        # shade_kernel (testbed.cu:463-465): remap the mean normal to [0,1]
        n = rgb_acc / jnp.maximum(jnp.linalg.norm(rgb_acc, axis=-1, keepdims=True), 1e-12)
        out = jnp.concatenate([(0.5 * n + 0.5) * opac[:, None], opac[:, None]], axis=-1)
    else:
        rgb_out = rgb_acc
        if render_mode == "Shade" and not train_in_linear_color:
            rgb_out = srgb_to_linear(rgb_acc)  # accumulate in linear
        out = jnp.concatenate([rgb_out, opac[:, None]], axis=-1)
    out = jnp.where(hit[:, None], out, 0.0)
    if envmap is not None:
        # framebuffer pre-filled with the envmap, hit rays blended over it
        # (init_rays_with_payload_kernel_nerf cu:500-502 + shade_kernel:476)
        from ngp_tpu.render.envmap import read_envmap

        env = read_envmap(envmap, d)
        if n_spp > 1:
            env = jnp.tile(env, (n_spp, 1))
        out = out + env * (1.0 - out[..., 3:4])
    if n_spp > 1:
        # the passes' running average (render/buffer.accumulate semantics:
        # rgb converted to the accumulation space per frame, alpha linear)
        if accum_space == "srgb":
            from ngp_tpu.utils.color import linear_to_srgb

            out = jnp.concatenate([linear_to_srgb(out[..., :3]), out[..., 3:4]], axis=-1)
        out = jnp.mean(out.reshape(n_spp, R, 4), axis=0)
    return out


render_tile = functools.partial(
    jax.jit,
    static_argnames=(
        "model",
        "config",
        "render_mode",
        "n_window",
        "train_in_linear_color",
        "rgb_activation",
        "density_activation",
        "n_spp",
        "accum_space",
        "share_evals",
    ),
)(_render_tile_impl)


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_rows(out, sel, res):
    """Device framebuffer assembly (padding rows carry index len(out) and
    drop). Jitted: eager ops dispatch one-at-a-time through a remote-device
    tunnel at ~100 ms each (ROADMAP.md)."""
    return out.at[sel].set(res, mode="drop")


@functools.partial(jax.jit, static_argnames=("n_rays",))
def _scatter_init(n_rays, sel, res):
    """First tile also allocates the framebuffer, inside the same jit."""
    return jnp.zeros((n_rays, 4), jnp.float32).at[sel].set(res, mode="drop")


@functools.partial(jax.jit, static_argnames=("config", "n_seg"))
def _coarse_pass(config, pooled, o, d, t0, k0, n_seg):
    """Per-pass coarse march: (R,) kept-segment counts + (R, n_seg) sorted
    kept-segment ordinals (padding sentinel n_seg). Runs on the pass's exact
    rays at zero march jitter; the pooled grid's halo absorbs the per-spp
    march-start jitter (< dt; lattice.py). With pixel snapping (default) the
    rays — and so this result — are identical across passes and cached."""
    cmask = coarse_segment_mask(config.sampler, pooled, o, d, t0, n_seg, k0)
    j = jnp.arange(n_seg, dtype=jnp.int32)[None, :]
    keys = jnp.where(cmask, j, jnp.int32(n_seg))
    return jnp.sum(cmask, axis=1, dtype=jnp.int32), jax.lax.sort(keys, dimension=1)


@functools.partial(jax.jit, static_argnames=("w", "h", "aabb_scale", "dt", "n_lat", "grid_size"))
def _rays_slab_pass(cam, focal, pp, off, box, *, w, h, aabb_scale, dt, n_lat, grid_size):
    """Fused per-camera geometry: pixel-grid rays + slab classification in
    ONE device dispatch (the r4 host path redid this as ~H*W numpy meshgrid/
    matmul/normalize + two slab tests per camera — 0.94 s/camera dominated
    the moving-camera preview; ROADMAP frame decomposition).

    Same math as `Renderer._camera_rays` + `_slab_range` + the k0/span/hit
    derivation, element for element (the conservative-cover slack arguments
    rely on the projection matching the compositing pass's rays).

    Returns device (o (N,3), d (N,3), k0 i32 (N,), t00 (N,)) plus a single
    packed (3, N) f32 [hit, k0, span] for ONE host readback."""
    n = w * h
    xs = (jnp.arange(w, dtype=jnp.float32) + off[0]) / w
    ys = (jnp.arange(h, dtype=jnp.float32) + off[1]) / h
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    xy = jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)
    dcam = jnp.stack(
        [
            (xy[:, 0] - pp[0]) * w / focal[0],
            (xy[:, 1] - pp[1]) * h / focal[1],
            jnp.ones((n,), jnp.float32),
        ],
        axis=-1,
    )
    d = dcam @ cam[:, :3].T
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
    o = jnp.broadcast_to(cam[:, 3], d.shape)

    dd = jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)

    def slab(lo, hi):
        t1 = (lo - o) / dd
        t2 = (hi - o) / dd
        return jnp.max(jnp.minimum(t1, t2), axis=-1), jnp.min(jnp.maximum(t1, t2), axis=-1)

    margin = dt + 1.0 / grid_size
    occ_lo, occ_hi = slab(box[0] - margin, box[1] + margin)
    sb = AABB.scene(aabb_scale)
    s_lo = jnp.maximum(slab(jnp.asarray(sb.lo), jnp.asarray(sb.hi))[0], 0.05)
    k0f = jnp.clip(jnp.floor((occ_lo - s_lo) / dt) - 2.0, 0.0, float(n_lat))
    span = jnp.clip(jnp.ceil((occ_hi - jnp.maximum(occ_lo, s_lo)) / dt) + 4.0, 0.0, n_lat - k0f)
    hit = (occ_hi >= jnp.maximum(occ_lo, s_lo)) & (span > 0)
    t00 = jnp.maximum(s_lo, 0.05) + 1e-6
    pack = jnp.stack([hit.astype(jnp.float32), k0f, span])
    return o, d, k0f.astype(jnp.int32), t00, pack


@functools.partial(jax.jit, static_argnames=("config", "n_seg"))
def _coarse_pass_from_device(config, pooled, o_all, d_all, t00_all, k0_all, pad_ids, n_seg):
    """_coarse_pass gathering its padded hit-ray inputs from the resident
    device arrays of _rays_slab_pass — replaces four ~P_h-row host->device
    uploads per camera with one small (P_h,) index upload."""
    o = o_all[pad_ids]
    d = d_all[pad_ids]
    t0 = t00_all[pad_ids]
    k0 = k0_all[pad_ids]
    cmask = coarse_segment_mask(config.sampler, pooled, o, d, t0, n_seg, k0)
    j = jnp.arange(n_seg, dtype=jnp.int32)[None, :]
    keys = jnp.where(cmask, j, jnp.int32(n_seg))
    return jnp.sum(cmask, axis=1, dtype=jnp.int32), jax.lax.sort(keys, dimension=1)


@jax.jit
def _tile_gather(o_all, d_all, k0_all, sel_pad, valid):
    """Device-side tile assembly: gather a tile's (o, d, k0) rows from the
    frame's resident ray arrays (pad rows get march-neutral defaults)."""
    idx = jnp.minimum(sel_pad, o_all.shape[0] - 1)
    o_t = jnp.where(valid[:, None], o_all[idx], 0.0)
    d_t = jnp.where(valid[:, None], d_all[idx], 1.0)
    k_t = jnp.where(valid, k0_all[idx], 0)
    return o_t, d_t, k_t


def _pow2(n: int, lo: int, hi: int) -> int:
    return int(min(hi, max(lo, 1 << int(np.ceil(np.log2(max(n, 1)))))))


# segment-capacity buckets: C is a static shape, so quantize it to keep the
# jit cache small across frames/tiles. COARSE on purpose: every distinct C
# is a separate ~30 s executable compile the first time any view needs it,
# and protocol evals walk many cameras (EVIDENCE_r3: view 0 cost 2-3x the
# warm frame on exactly this churn). The padding slots a coarser rung adds
# cost only march gathers (1 packed word per 8-step segment), never network
# samples — the budgeted composite loop processes occupied samples only.
_C_BUCKETS = (8, 24, 64, 128, 256)

# frame-level coarse-segment-count buckets (same churn logic: n_seg is a
# static shape of _coarse_pass and the seg_sorted width)
_NSEG_BUCKETS = (16, 32, 64, 96, 144, 256)


def _c_bucket(n: int, n_seg: int) -> int:
    for b in _C_BUCKETS:
        if n <= b:
            return min(b, n_seg)
    return n_seg


@dataclass
class Renderer:
    """Host-side frame assembly driving render_tile.

    Per frame: build rays (numpy), slab-test them against the occupied-cell
    AABB (host — the box is cached per occupancy array), drop rays that miss
    it outright, sort the rest by span length and render them in big
    homogeneous tiles whose marching window covers the tile's longest span.
    The only per-frame device->host transfer is the framebuffer itself.

    With a `mesh`, each tile's rays are sharded over the "data" axis
    (shard_map; params/grid replicated, zero collectives — rendering is
    embarrassingly ray-parallel). NEW capability: the reference renders on
    one GPU only (SURVEY.md §2.4).
    """

    model: NGPModel
    config: NGPConfig
    tile_size: int = 1 << 16
    train_in_linear_color: bool = False
    rgb_activation: str = "Logistic"
    density_activation: str = "Exponential"
    mesh: object = None  # jax.sharding.Mesh -> data-parallel tiles
    # n_spp > 1 Shade frames share network evals across passes (in-cell lerp
    # per pass) — n_spp x fewer network samples; False re-evaluates the
    # network at every pass's exact jittered positions (the A/B reference)
    share_spp_evals: bool = True
    _box_cache: dict = field(default_factory=dict)
    _dp_cache: dict = field(default_factory=dict)
    _prep_cache: dict = field(default_factory=dict)
    _pool_cache: dict = field(default_factory=dict)
    _packed_cache: dict = field(default_factory=dict)
    _seg_cache: dict = field(default_factory=dict)
    _ray_cache: dict = field(default_factory=dict)

    def can_batch_spp(self) -> bool:
        """True when render_frame(n_spp > 1) is available: pixel snapping
        (all passes trace the same rays) and the jitter-cover packed march
        (one conservative march absorbs every pass's start jitter)."""
        from ngp_tpu.sampling.lattice import jitter_cover_supported

        scfg = self.config.sampler
        return (
            scfg.snap_to_pixel_centers_in_rendering
            and jitter_cover_supported(scfg)
        )

    @staticmethod
    def _id_cache(cache: dict, key_arr, make_fn, arg=None):
        """Single-entry identity-keyed cache shared by _prepared/_pooled/
        _packed/_occ_box: recompute when `key_arr` is a new array OBJECT.
        The dict keeps a strong reference to `key_arr`, so a freed array's
        address can never alias a stale entry (unlike a bare id() key).
        `make_fn()` builds the (possibly jitted) compute fn once and it is
        reused across recomputes; the fn is applied to `arg` when given,
        else to `key_arr` itself."""
        if cache.get("arr") is not key_arr:
            fn = cache.get("fn") or make_fn()
            cache["arr"] = key_arr
            cache["fn"] = fn
            cache["val"] = fn(key_arr if arg is None else arg)
        return cache["val"]

    def _prepared(self, params):
        """Pack the hash table for inference ONCE per table (identity-keyed
        on the hash_table leaf): every tile and every spp pass of a frame
        then gathers the resident packed view instead of rebuilding it
        in-graph (measured +17 ms/compositing round when left inside
        render_tile, mb11)."""
        if "hash_packed" in params:
            return params
        return self._id_cache(
            self._prep_cache,
            params["hash_table"],
            lambda: jax.jit(self.model.prepare_inference),
            arg=params,
        )

    def _dp_render_tile(self, has_envmap: bool, has_seg: bool, has_packed: bool, **statics):
        """shard_map'ed render_tile: rays sharded, everything else replicated.

        Optional array extras follow the fixed positional order (envmap,
        seg_idx, packed); each is present iff its flag is set."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        key = (has_envmap, has_seg, has_packed, tuple(sorted(statics.items())))
        if key not in self._dp_cache:
            fn = functools.partial(_render_tile_impl, self.model, self.config, **statics)
            sh, rep = P(tuple(self.mesh.axis_names)), P()  # rays over ALL mesh axes

            def body(params, occupancy, o, d, k0, rid, tv, spp, fwd, org, dsc, rmax, *rest):
                it = iter(rest)
                env = next(it) if has_envmap else None
                seg = next(it) if has_seg else None
                pck = next(it) if has_packed else None
                return fn(params, occupancy, o, d, k0, rid, tv, spp, fwd, org, dsc,
                          n_rounds_max=rmax, envmap=env, seg_idx=seg, packed=pck)

            specs = (rep, rep, sh, sh, sh, sh, sh, rep, rep, rep, rep, rep)
            specs += ((rep,) if has_envmap else ()) + ((sh,) if has_seg else ()) + ((rep,) if has_packed else ())
            self._dp_cache[key] = jax.jit(
                shard_map(body, mesh=self.mesh, in_specs=specs, out_specs=sh, check_vma=False)
            )
        return self._dp_cache[key]

    def _pooled(self, occupancy):
        """Dilated super-occupancy, cached per grid array (identity-keyed)."""
        from ngp_tpu.grid.occupancy import pooled_occupancy

        return self._id_cache(
            self._pool_cache,
            occupancy,
            lambda: jax.jit(functools.partial(pooled_occupancy, self.config.sampler)),
        )

    def _packed(self, occupancy):
        """Packed 3^3-neighborhood words for the fine march, cached per grid
        array (identity-keyed); None when the packed march doesn't apply."""
        from ngp_tpu.sampling.lattice import packed_march_supported

        if not packed_march_supported(self.config.sampler):
            return None
        from ngp_tpu.grid.occupancy import packed_neighborhood

        return self._id_cache(
            self._packed_cache,
            occupancy,
            lambda: jax.jit(functools.partial(packed_neighborhood, self.config.sampler)),
        )

    @staticmethod
    def _camera_rays(cam, w, h, focal_length, principal_point, off):
        """Pixel-grid camera rays (numpy, host-side): origins + unit
        directions for subpixel offset `off`. The single source of the
        pixel->direction projection — render_frame (jittered passes) and
        _frame_geometry (pixel-center classification) must agree on it for
        the conservative-cover argument in _frame_geometry to hold."""
        xs = (np.arange(w, dtype=np.float32) + off[0]) / w
        ys = (np.arange(h, dtype=np.float32) + off[1]) / h
        xy = np.stack(np.meshgrid(xs, ys, indexing="xy"), axis=-1).reshape(-1, 2)
        d = np.stack(
            [
                (xy[:, 0] - principal_point[0]) * w / focal_length[0],
                (xy[:, 1] - principal_point[1]) * h / focal_length[1],
                np.ones((xy.shape[0],), np.float32),
            ],
            axis=-1,
        ) @ cam[:, :3].T
        # degenerate camera rows (e.g. an unset camera matrix) produce
        # zero-length directions; keep them finite — the slab tests classify
        # them as misses instead of NaN-ing the framebuffer
        d /= np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
        o = np.broadcast_to(cam[:, 3], d.shape).copy()
        return o, d

    def _rays_cached(self, cam, w, h, focal_length, principal_point, off):
        """Single-entry cache over _camera_rays: with pixel snapping (the
        default) every spp pass and repeated frame at the same camera/
        resolution shares one host-side projection instead of redoing the
        ~H*W meshgrid+matmul+normalize per pass. Results are read-only."""
        key = (
            cam.tobytes(),
            w,
            h,
            tuple(focal_length),
            tuple(principal_point),
            (float(off[0]), float(off[1])),
        )
        if self._ray_cache.get("key") != key:
            o, d = self._camera_rays(cam, w, h, focal_length, principal_point, off)
            self._ray_cache = {"key": key, "o": o, "d": d}
        return self._ray_cache["o"], self._ray_cache["d"]

    @staticmethod
    def _slab_range(lo, hi, o, d):
        """AABB slab test (numpy): (t_enter, t_exit) per ray; hit iff
        t_exit >= max(t_enter, near)."""
        dd = np.where(np.abs(d) < 1e-12, 1e-12, d)
        t1 = (lo - o) / dd
        t2 = (hi - o) / dd
        return np.max(np.minimum(t1, t2), axis=-1), np.min(np.maximum(t1, t2), axis=-1)

    def _frame_geometry(self, box, occupancy, cam, w, h, focal_length, principal_point, off):
        """Per-frame ray classification (hit/k0/span + coarse segment lists).

        Computed from the EXACT rays of subpixel offset `off` — the same rays
        the compositing pass marches — so classification is exact up to the
        per-spp march-start jitter (< dt along the ray), which the k0 slack
        (2 steps), the span slack (+4), the box inflation below, and
        pooled_occupancy's _HALO all absorb. With
        snap_to_pixel_centers_in_rendering (the default) `off` is the pixel
        center for every pass and the whole computation is shared frame-wide;
        with snapping off each spp pass recomputes it for its own jittered
        rays (the reference re-initializes rays per pass too, cu:451-503) —
        correctness is not traded for the cache. Rays with zero kept segments
        provably sample nothing and are culled from `hit` outright.
        """
        scfg = self.config.sampler
        dt = scfg.min_cone_stepsize
        n_lat = n_lattice_points(scfg)
        ckey = (
            box.tobytes(),
            cam.tobytes(),
            w,
            h,
            tuple(focal_length),
            tuple(principal_point),
            (float(off[0]), float(off[1])),
        )
        cache = self._seg_cache
        if cache.get("key") == ckey and cache.get("occ") is occupancy:
            return cache
        n_rays = w * h

        # dispatch 1: fused rays + slab classification on device (the r4
        # host-numpy path cost ~0.94 s/camera); ONE packed readback carries
        # hit/k0/span to the host for tiling decisions, while o/d/k0/t00
        # stay resident for the coarse pass and the per-tile gathers.
        o_dev, d_dev, k0_dev, t00_dev, pack = _rays_slab_pass(
            jnp.asarray(cam),
            jnp.asarray(np.asarray(focal_length, np.float32)),
            jnp.asarray(np.asarray(principal_point, np.float32)),
            jnp.asarray(np.asarray(off, np.float32)),
            jnp.asarray(box.astype(np.float32)),
            w=w,
            h=h,
            aabb_scale=scfg.aabb_scale,
            dt=dt,
            n_lat=n_lat,
            grid_size=scfg.grid_size,
        )
        pack = np.asarray(pack)
        hit = pack[0] > 0.5
        k0 = pack[1].astype(np.int32)
        span = pack[2]
        ids_hit = np.nonzero(hit)[0]

        ccounts = seg_sorted = inv = None
        n_seg = 0
        if segments_supported(scfg) and ids_hit.size > 0:
            n_seg = max(-(-int(span[ids_hit].max()) // 8), 1)
            for b in _NSEG_BUCKETS:  # jit-cache bucket
                if n_seg <= b:
                    n_seg = b
                    break
            else:  # larger aabb_scale configs: multiple-of-64 rungs
                n_seg = -(-n_seg // 64) * 64
            # PAD the hit set to a power-of-two bucket: the raw hit count is
            # camera-dependent, so an exact-shape _coarse_pass would compile
            # a fresh executable for EVERY camera (~5-7 s — the entire cost
            # of a moving-camera preview frame, and a per-view tax on
            # protocol evals). Padding rows repeat the first hit ray and
            # their results are simply never read back.
            nh = ids_hit.size
            # bucket cap 1<<22 keeps compile churn bounded; frames with more
            # box-hit rays (4K/8K renders) fall back to the exact next-pow2
            # size rather than overflowing the pad
            P_h = max(_pow2(nh, 256, 1 << 22), nh)
            pad_ids = np.full((P_h,), ids_hit[0], np.int32)
            pad_ids[:nh] = ids_hit
            # dispatch 2: coarse premask over the padded hit set, inputs
            # gathered from the resident ray arrays (no bulk re-uploads)
            cc, seg_sorted = _coarse_pass_from_device(
                self.config,
                self._pooled(occupancy),
                o_dev,
                d_dev,
                t00_dev,
                k0_dev,
                jnp.asarray(pad_ids),
                n_seg,
            )
            ccounts = np.zeros((n_rays,), np.int32)
            ccounts[ids_hit] = np.asarray(cc)[:nh]
            inv = np.zeros((n_rays,), np.int32)
            inv[ids_hit] = np.arange(nh, dtype=np.int32)
            hit = hit & (ccounts > 0)
        self._seg_cache = {
            "key": ckey,
            "occ": occupancy,
            "hit": hit,
            "k0": k0,
            "span": span,
            "ccounts": ccounts,
            "seg_sorted": seg_sorted,
            "inv": inv,
            "n_seg": n_seg,
            "o_dev": o_dev,
            "d_dev": d_dev,
            "k0_dev": k0_dev,
        }
        return self._seg_cache

    def _occ_box(self, occupancy, occ_aabb):
        if occ_aabb is not None:
            return np.asarray(occ_aabb)
        from ngp_tpu.grid.occupancy import occupied_aabb

        return self._id_cache(
            self._box_cache,
            occupancy,
            lambda: (lambda occ: np.asarray(occupied_aabb(self.config.sampler, occ))),
        )

    def render_frame(
        self,
        params,
        occupancy,
        camera_matrix,
        resolution,
        focal_length,
        principal_point,
        spp,
        render_mode="Shade",
        scene_scale=1.0,
        envmap=None,
        occ_aabb=None,
        n_spp: int = 1,
        accum_space: str = "linear",
    ):
        """One frame at one spp index -> (H, W, 4) premultiplied linear.

        n_spp > 1 (requires can_batch_spp) composites passes
        [spp, spp + n_spp) in one device program per tile — one shared
        jitter-cover march instead of n_spp exact ones — and returns the
        ACCUMULATED frame (the mean in `accum_space`, exactly what feeding
        each pass to render/buffer.accumulate yields)."""
        params = self._prepared(params)
        w, h = resolution
        scfg = self.config.sampler
        dt = scfg.min_cone_stepsize
        n_lat = n_lattice_points(scfg)
        snap = scfg.snap_to_pixel_centers_in_rendering
        if n_spp > 1 and not self.can_batch_spp():
            raise ValueError("n_spp > 1 requires can_batch_spp() (pixel snapping + jitter-cover march)")
        off = np.asarray(ld_random_pixel_offset(0 if snap else int(spp)))
        cam = np.asarray(camera_matrix, np.float32)
        n_rays = w * h
        o = d = o_dev = d_dev = k0_dev = None

        if scfg.cone_angle_constant != 0.0:
            # the window-start inversion assumes the arithmetic lattice; the
            # cone lattice is geometric (and much shorter), so march all of
            # it — culling only rays that miss the occupied box entirely
            o, d = self._rays_cached(cam, w, h, focal_length, principal_point, off)
            box = self._occ_box(occupancy, occ_aabb)
            t_enter, t_exit = self._slab_range(box[0], box[1], o, d)
            hit = t_exit >= np.maximum(t_enter, 0.05)
            k0 = np.zeros((n_rays,), np.int32)
            span = np.full((n_rays,), n_lat, np.float32)
            ccounts = seg_sorted = inv = None
            n_seg_frame = 0
        else:
            # frame geometry (hit/k0/span + coarse segment lists) is computed
            # from THIS pass's exact rays; with pixel snapping (default) the
            # offset is constant so every spp pass shares one computation
            box = self._occ_box(occupancy, occ_aabb)
            geo = self._frame_geometry(
                box, occupancy, cam, w, h, focal_length, principal_point, off
            )
            hit, k0, span = geo["hit"], geo["k0"], geo["span"]
            ccounts, seg_sorted = geo["ccounts"], geo["seg_sorted"]
            inv, n_seg_frame = geo["inv"], geo["n_seg"]
            o_dev, d_dev, k0_dev = geo["o_dev"], geo["d_dev"], geo["k0_dev"]
        use_seg = seg_sorted is not None

        # the frame assembles ON DEVICE: each tile's result scatters into the
        # framebuffer without a host readback, so XLA pipelines every tile's
        # compute/transfer and the whole spp pass costs ZERO mid-frame syncs
        # (a host `np.asarray` per tile costs a full tunnel roundtrip each —
        # ~26.6 ms x tiles x spp of pure latency on the remote chip)
        out = None  # allocated by _scatter_init / _env_fill on first use
        env_only = envmap is not None
        ids_hit = np.nonzero(hit)[0]

        if env_only:
            # misses still show the environment: one jitted fill per frame.
            # A multi-spp frame is returned pre-accumulated, so miss rows get
            # the accumulation-space conversion here (pass-constant -> the
            # mean is the converted value itself).
            from ngp_tpu.render.envmap import read_envmap

            to_srgb_fill = n_spp > 1 and accum_space == "srgb"

            def _env_fill(envmap, d_all, hit_mask, _conv=to_srgb_fill):
                env = read_envmap(envmap, d_all)
                if _conv:
                    from ngp_tpu.utils.color import linear_to_srgb

                    env = jnp.concatenate(
                        [linear_to_srgb(env[..., :3]), env[..., 3:4]], axis=-1
                    )
                return jnp.where(hit_mask[:, None], 0.0, env)

            fn = self._dp_cache.setdefault(("_env_fill", to_srgb_fill), jax.jit(_env_fill))
            d_all = d_dev if d_dev is not None else jnp.asarray(d)
            out = fn(envmap, d_all, jnp.asarray(hit))

        if ids_hit.size:
            sort_key = ccounts if use_seg else span
            order = ids_hit[np.argsort(sort_key[ids_hit], kind="stable")]
            tile = min(self.tile_size, _pow2(order.size, 256, self.tile_size))
            # per-tile ray arrays are identical for EVERY spp pass of this
            # (camera, resolution, grid) when pixel snapping holds `off`
            # constant; cache the device uploads alongside the frame geometry
            # (same invalidation) so later passes skip tiles x ~7
            # host->device transfers each. With snapping OFF the per-pass
            # jitter changes d (and the hit set), so tiles are never reused.
            tcache = self._seg_cache.setdefault("tiles", {}) if (
                snap and self._seg_cache.get("occ") is occupancy
            ) else {}
            for s in range(0, order.size, tile):
                cached = tcache.get(s)
                if cached is None:
                    sel = order[s : s + tile]
                    w_tile = int(span[sel].max())
                    n_legacy = min(_pow2(-(-max(w_tile, 1) // 128) * 128, 128, n_lat), n_lat)
                    n_legacy = -(-n_legacy // 128) * 128
                    c_t = _c_bucket(int(ccounts[sel].max()), n_seg_frame) if use_seg else 0
                    # the segment path pays an extra indirection per fine
                    # lookup; take it only when the premask meaningfully
                    # shrinks the tile's march width (dense/untrained grids
                    # keep everything and the legacy span window is then
                    # strictly cheaper)
                    if use_seg and c_t * 8 <= (3 * n_legacy) // 4:
                        n_window = 0  # unused on the seg path (fixed _SENTINEL)
                        rows = np.zeros((tile,), np.int32)
                        rows[: sel.size] = inv[sel]
                        seg_t = jnp.take(seg_sorted, jnp.asarray(rows), axis=0)[:, :c_t]
                        w_eff = c_t * 8  # t_idx width the composite walks
                    else:
                        n_window = n_legacy
                        seg_t = None
                        w_eff = n_window
                    id_t = np.zeros((tile,), np.int32)
                    v_t = np.zeros((tile,), bool)
                    id_t[: sel.size] = sel
                    v_t[: sel.size] = True
                    sel_pad = np.full((tile,), n_rays, np.int32)  # pads drop
                    sel_pad[: sel.size] = sel
                    sel_pad_dev = jnp.asarray(sel_pad)
                    v_dev = jnp.asarray(v_t)
                    if o_dev is not None:
                        # gather the tile's rays from the frame's resident
                        # device arrays (no per-tile host assembly/upload)
                        o_t_dev, d_t_dev, k_t_dev = _tile_gather(
                            o_dev, d_dev, k0_dev, sel_pad_dev, v_dev
                        )
                    else:  # cone-lattice path: host rays
                        o_t = np.zeros((tile, 3), np.float32)
                        d_t = np.ones((tile, 3), np.float32)
                        k_t = np.zeros((tile,), np.int32)
                        o_t[: sel.size] = o[sel]
                        d_t[: sel.size] = d[sel]
                        k_t[: sel.size] = k0[sel]
                        o_t_dev, d_t_dev, k_t_dev = jnp.asarray(o_t), jnp.asarray(d_t), jnp.asarray(k_t)
                    cached = {
                        "n_window": n_window,
                        "w_eff": w_eff,
                        "seg_t": seg_t,
                        "d_t": d_t_dev,
                        "rays_const": (
                            o_t_dev,
                            k_t_dev,
                            jnp.asarray(id_t),
                            v_dev,
                        ),
                        "sel_pad": sel_pad_dev,
                    }
                    tcache[s] = cached
                n_window, w_eff, seg_t = cached["n_window"], cached["w_eff"], cached["seg_t"]
                # worst case: every round advances min(tile, _BUDGET//_D) rays
                # by _D samples, so a tile smaller than the per-round ray
                # budget still needs ~w_eff/_D rounds for non-terminating
                # rays (the loop exits early once nothing is alive).
                # shared-eval passes ride ONE queue entry per physical ray.
                share = self.share_spp_evals and n_spp > 1 and render_mode == "Shade"
                spp_mult = 1 if share else n_spp
                rounds_max = (
                    int(np.ceil(spp_mult * tile * w_eff / _BUDGET))
                    + int(np.ceil(w_eff / _D)) + 4
                )
                n_dev = self.mesh.devices.size if self.mesh is not None else 1
                statics = dict(
                    render_mode=render_mode,
                    n_window=n_window,
                    train_in_linear_color=self.train_in_linear_color,
                    rgb_activation=self.rgb_activation,
                    density_activation=self.density_activation,
                    n_spp=n_spp,
                    accum_space=accum_space,
                    share_evals=self.share_spp_evals,
                )
                o_dev, k_dev, id_dev, v_dev = cached["rays_const"]
                array_args = (
                    params,
                    occupancy,
                    o_dev,
                    cached["d_t"],
                    k_dev,
                    id_dev,
                    v_dev,
                    jnp.uint32(spp),
                    jnp.asarray(cam[:, 2]),
                    jnp.asarray(cam[:, 3]),
                    jnp.float32(1.0 / scene_scale),
                    jnp.int32(rounds_max),
                )
                packed = self._packed(occupancy)
                if n_dev > 1 and tile % n_dev == 0:
                    fn = self._dp_render_tile(
                        envmap is not None, seg_t is not None, packed is not None, **statics
                    )
                    extra = (envmap,) if envmap is not None else ()
                    extra = extra + ((seg_t,) if seg_t is not None else ())
                    extra = extra + ((packed,) if packed is not None else ())
                    res = fn(*array_args, *extra)
                else:
                    res = render_tile(
                        self.model, self.config, *array_args,
                        envmap=envmap, seg_idx=seg_t, packed=packed, **statics
                    )
                if out is None:
                    out = _scatter_init(n_rays, cached["sel_pad"], res)
                else:
                    out = _scatter_rows(out, cached["sel_pad"], res)
        if out is None:  # no hits, no envmap
            out = jnp.zeros((n_rays, 4), jnp.float32)
        return out.reshape(h, w, 4)
