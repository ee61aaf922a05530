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
from ngp_tpu.sampling.lattice import count_samples, lattice_dt, lattice_t, n_lattice_points
from ngp_tpu.utils.aabb import AABB, warp_dt
from ngp_tpu.utils.color import srgb_to_linear
from ngp_tpu.utils.config import NGPConfig
from ngp_tpu.utils.qmc import ld_random_pixel_offset, ld_random_val

RENDER_MODES = ("AO", "Shade", "Normals", "Depth", "Distance", "Stepsize", "Cost")

_BUDGET = 1 << 17  # network samples per compositing round (A * D)
_D = 16  # samples per ray per round (reference marches 1..8, testbed.cu:546)


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
    render_mode: str = "Shade",
    n_window: int = 128,
    n_rounds_max: int = 64,
    train_in_linear_color: bool = False,
    rgb_activation: str = "Logistic",
    density_activation: str = "Exponential",
    envmap=None,
):
    """Render one span-tile of rays -> (R, 4) framebuffer contribution
    (premultiplied linear)."""
    scfg = config.sampler
    aabb = AABB.scene(scfg.aabb_scale)
    dt = scfg.min_cone_stepsize
    thresh = config.render.transmittance_threshold
    R = o.shape[0]
    A = max(min(_BUDGET // _D, R), 1)

    # ray init (init_rays_with_payload_kernel_nerf, cu:451-503): rendering
    # near plane 0.05, per-spp ld jitter on the march start (cu:529)
    tmin, tmax = aabb.ray_intersect(o, d)
    t0 = jnp.maximum(tmin, 0.05) + 1e-6
    alive0 = aabb.contains(o + d * t0[:, None]) & tile_valid
    startt = t0 + ld_random_val(spp, ray_id.astype(jnp.uint32) * jnp.uint32(786433)) * dt

    # ONE marching pass: occupied window ordinals, padded per ray
    counts, masks = count_samples(
        scfg, aabb, occupancy, o, d, startt, n_window, return_masks=True, k0=k0
    )
    counts = jnp.where(alive0, counts, 0)
    iota = jnp.arange(n_window, dtype=jnp.int32)[None, :]
    keys = jnp.where(masks & alive0[:, None], iota, jnp.int32(n_window))
    t_idx = jax.lax.sort(keys, dimension=1).reshape(-1)  # (R * S,) k0-relative

    dirs_w = (d + 1.0) * 0.5

    def round_body(state):
        rnd, cursor, trans, rgb_acc, opac, processed, alive = state
        # device compaction: alive ray slots packed to the front
        order = jnp.cumsum(alive.astype(jnp.int32)) - 1
        sel = jnp.zeros((R,), jnp.int32).at[jnp.where(alive, order, R)].set(
            jnp.arange(R, dtype=jnp.int32), mode="drop"
        )[:A]
        n_alive = jnp.sum(alive, dtype=jnp.int32)
        slot = jnp.arange(A, dtype=jnp.int32) < n_alive  # (A,)

        cur = cursor[sel]  # (A,)
        j = jnp.arange(_D, dtype=jnp.int32)[None, :]
        flat = sel[:, None] * n_window + jnp.minimum(cur[:, None] + j, n_window - 1)
        lat = t_idx[flat.reshape(-1)].reshape(A, _D)  # (A, D) window ordinal
        valid = slot[:, None] & ((cur[:, None] + j) < counts[sel][:, None]) & (lat < n_window)

        ts = lattice_t(scfg, startt[sel][:, None], k0[sel][:, None] + lat)
        dts = lattice_dt(scfg, ts)  # (A, D); == dt when cone angle is 0
        pos = o[sel][:, None, :] + ts[..., None] * d[sel][:, None, :]  # (A, D, 3)
        pos_w = aabb.relative_pos(pos).reshape(-1, 3)
        dir_w = jnp.broadcast_to(dirs_w[sel][:, None, :], (A, _D, 3)).reshape(-1, 3)

        rgb_raw, sigma_raw = model.rgbsigma_raw(params, pos_w, dir_w)
        sigma = apply_density_activation(sigma_raw, density_activation).reshape(A, _D)
        rgb = apply_rgb_activation(rgb_raw, rgb_activation).reshape(A, _D, 3)

        if render_mode == "Normals":
            # d(sigma)/d(pos): the normal points down the density gradient
            # (volume_rendering_kernel cu:260-265)
            grad_pos = model.input_gradient(params, pos_w, density_activation)
            nrm = -grad_pos / jnp.maximum(jnp.linalg.norm(grad_pos, axis=-1, keepdims=True), 1e-12)
            rgb = nrm.reshape(A, _D, 3)
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

        guard = jnp.where(slot, sel, R)  # padding slots dropped
        rgb_acc = rgb_acc.at[guard].add(jnp.where(slot[:, None], add_rgb, 0.0), mode="drop")
        opac = opac.at[guard].add(jnp.where(slot, add_opac, 0.0), mode="drop")
        processed = processed.at[guard].add(jnp.where(slot, add_proc, 0), mode="drop")
        trans = trans.at[guard].set(jnp.where(slot, new_trans_sel, 1.0), mode="drop")
        cursor = cursor.at[guard].add(jnp.where(slot, _D, 0), mode="drop")

        done = slot & ((new_trans_sel < thresh) | (cur + _D >= counts[sel]))
        alive = alive.at[jnp.where(done, sel, R)].set(False, mode="drop")
        return rnd + 1, cursor, trans, rgb_acc, opac, processed, alive

    def round_cond(state):
        rnd, *_, alive = state
        return (rnd < n_rounds_max) & jnp.any(alive)

    init = (
        jnp.int32(0),
        jnp.zeros((R,), jnp.int32),  # cursor
        jnp.ones((R,), jnp.float32),  # transmittance
        jnp.zeros((R, 3), jnp.float32),
        jnp.zeros((R,), jnp.float32),  # opacity
        jnp.zeros((R,), jnp.int32),  # processed (Cost mode)
        counts > 0,
    )
    _, _, trans, rgb_acc, opac, processed, _ = jax.lax.while_loop(round_cond, round_body, init)

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
        out = out + env * (1.0 - out[..., 3:4])
    return out


render_tile = functools.partial(
    jax.jit,
    static_argnames=(
        "model",
        "config",
        "render_mode",
        "n_window",
        "n_rounds_max",
        "train_in_linear_color",
        "rgb_activation",
        "density_activation",
    ),
)(_render_tile_impl)


def _pow2(n: int, lo: int, hi: int) -> int:
    return int(min(hi, max(lo, 1 << int(np.ceil(np.log2(max(n, 1)))))))


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
    _box_cache: dict = field(default_factory=dict)
    _dp_cache: dict = field(default_factory=dict)

    def _dp_render_tile(self, has_envmap: bool, **statics):
        """shard_map'ed render_tile: rays sharded, everything else replicated."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        key = (has_envmap, tuple(sorted(statics.items())))
        if key not in self._dp_cache:
            fn = functools.partial(_render_tile_impl, self.model, self.config, **statics)
            sh, rep = P(tuple(self.mesh.axis_names)), P()  # rays over ALL mesh axes
            if has_envmap:
                def body(params, occupancy, o, d, k0, rid, tv, spp, fwd, org, dsc, env):
                    return fn(params, occupancy, o, d, k0, rid, tv, spp, fwd, org, dsc, envmap=env)
                specs = (rep, rep, sh, sh, sh, sh, sh, rep, rep, rep, rep, rep)
            else:
                def body(params, occupancy, o, d, k0, rid, tv, spp, fwd, org, dsc):
                    return fn(params, occupancy, o, d, k0, rid, tv, spp, fwd, org, dsc)
                specs = (rep, rep, sh, sh, sh, sh, sh, rep, rep, rep, rep)
            self._dp_cache[key] = jax.jit(
                shard_map(body, mesh=self.mesh, in_specs=specs, out_specs=sh, check_vma=False)
            )
        return self._dp_cache[key]

    def _occ_box(self, occupancy, occ_aabb):
        if occ_aabb is not None:
            return np.asarray(occ_aabb)
        # cache holds a strong reference to the occupancy array and compares
        # identity against it — unlike a bare id() key, the live reference
        # means a newly allocated grid can never alias a stale cache entry
        if self._box_cache.get("arr") is not occupancy:
            from ngp_tpu.grid.occupancy import occupied_aabb

            self._box_cache = {
                "arr": occupancy,
                "box": np.asarray(occupied_aabb(self.config.sampler, occupancy)),
            }
        return self._box_cache["box"]

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
    ):
        """One frame at one spp index -> (H, W, 4) premultiplied linear."""
        w, h = resolution
        scfg = self.config.sampler
        dt = scfg.min_cone_stepsize
        n_lat = n_lattice_points(scfg)
        snap = scfg.snap_to_pixel_centers_in_rendering
        off = np.asarray(ld_random_pixel_offset(0 if snap else int(spp)))
        xs = (np.arange(w, dtype=np.float32) + off[0]) / w
        ys = (np.arange(h, dtype=np.float32) + off[1]) / h
        xy = np.stack(np.meshgrid(xs, ys, indexing="xy"), axis=-1).reshape(-1, 2)

        cam = np.asarray(camera_matrix, np.float32)
        d_cam = np.stack(
            [
                (xy[:, 0] - principal_point[0]) * w / focal_length[0],
                (xy[:, 1] - principal_point[1]) * h / focal_length[1],
                np.ones((xy.shape[0],), np.float32),
            ],
            axis=-1,
        )
        d = d_cam @ cam[:, :3].T
        # degenerate camera rows (e.g. an unset camera matrix) produce
        # zero-length directions; keep them finite — the slab test below
        # classifies them as misses instead of NaN-ing the framebuffer
        d /= np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
        o = np.broadcast_to(cam[:, 3], d.shape).copy()
        n_rays = o.shape[0]

        dd = np.where(np.abs(d) < 1e-12, 1e-12, d)
        if scfg.cone_angle_constant != 0.0:
            # the window-start inversion assumes the arithmetic lattice; the
            # cone lattice is geometric (and much shorter), so march all of
            # it — culling only rays that miss the occupied box entirely
            box = self._occ_box(occupancy, occ_aabb)
            t1 = (box[0] - o) / dd
            t2 = (box[1] - o) / dd
            hit = np.min(np.maximum(t1, t2), axis=-1) >= np.maximum(
                np.max(np.minimum(t1, t2), axis=-1), 0.05
            )
            k0 = np.zeros((n_rays,), np.int32)
            span = np.full((n_rays,), n_lat, np.float32)
        else:
            # host slab test against the occupied box: span + window start
            box = self._occ_box(occupancy, occ_aabb)
            t1 = (box[0] - o) / dd
            t2 = (box[1] - o) / dd
            occ_lo = np.max(np.minimum(t1, t2), axis=-1)
            occ_hi = np.min(np.maximum(t1, t2), axis=-1)
            # the scene-box entry t is recomputed on device with the jitter;
            # the host k0 keeps one lattice step of slack
            sb = AABB.scene(scfg.aabb_scale)
            s_lo = np.maximum(np.max(np.minimum((sb.lo - o) / dd, (sb.hi - o) / dd), axis=-1), 0.05)
            # near-axis-parallel rays produce huge nudged slab ts; clip the
            # floats into [0, n_lat] BEFORE the int cast so degenerate rays
            # (filtered by `hit` below) can't overflow int32
            with np.errstate(invalid="ignore"):
                k0 = np.clip(np.floor((occ_lo - s_lo) / dt) - 1, 0, n_lat).astype(np.int32)
                span = np.clip(
                    np.ceil((occ_hi - np.maximum(occ_lo, s_lo)) / dt) + 3, 0, n_lat - k0
                )
            hit = (occ_hi >= np.maximum(occ_lo, s_lo)) & (span > 0)

        out = np.zeros((n_rays, 4), np.float32)
        env_only = envmap is not None
        ids_hit = np.nonzero(hit)[0]
        if env_only and ids_hit.size < n_rays:
            # misses still show the environment: blend on host via one call
            miss = np.nonzero(~hit)[0]
            from ngp_tpu.render.envmap import read_envmap

            out[miss] = np.asarray(read_envmap(envmap, jnp.asarray(d[miss])))

        if ids_hit.size:
            order = ids_hit[np.argsort(span[ids_hit], kind="stable")]
            tile = min(self.tile_size, _pow2(order.size, 256, self.tile_size))
            for s in range(0, order.size, tile):
                sel = order[s : s + tile]
                w_tile = int(span[sel].max())
                n_window = min(_pow2(-(-w_tile // 128) * 128, 128, n_lat), n_lat)
                n_window = -(-n_window // 128) * 128
                o_t = np.zeros((tile, 3), np.float32)
                d_t = np.ones((tile, 3), np.float32)
                k_t = np.zeros((tile,), np.int32)
                id_t = np.zeros((tile,), np.int32)
                v_t = np.zeros((tile,), bool)
                o_t[: sel.size] = o[sel]
                d_t[: sel.size] = d[sel]
                k_t[: sel.size] = k0[sel]
                id_t[: sel.size] = sel
                v_t[: sel.size] = True
                # worst case: every round advances min(tile, _BUDGET//_D) rays
                # by _D samples, so a tile smaller than the per-round ray
                # budget still needs ~n_window/_D rounds for non-terminating
                # rays (the loop exits early once nothing is alive)
                rounds_max = (
                    int(np.ceil(tile * n_window / _BUDGET)) + int(np.ceil(n_window / _D)) + 4
                )
                n_dev = self.mesh.devices.size if self.mesh is not None else 1
                statics = dict(
                    render_mode=render_mode,
                    n_window=n_window,
                    n_rounds_max=rounds_max,
                    train_in_linear_color=self.train_in_linear_color,
                    rgb_activation=self.rgb_activation,
                    density_activation=self.density_activation,
                )
                array_args = (
                    params,
                    occupancy,
                    jnp.asarray(o_t),
                    jnp.asarray(d_t),
                    jnp.asarray(k_t),
                    jnp.asarray(id_t),
                    jnp.asarray(v_t),
                    jnp.uint32(spp),
                    jnp.asarray(cam[:, 2]),
                    jnp.asarray(cam[:, 3]),
                    jnp.float32(1.0 / scene_scale),
                )
                if n_dev > 1 and tile % n_dev == 0:
                    fn = self._dp_render_tile(envmap is not None, **statics)
                    res = fn(*array_args, envmap) if envmap is not None else fn(*array_args)
                else:
                    res = render_tile(self.model, self.config, *array_args, envmap=envmap, **statics)
                out[sel] = np.asarray(res)[: sel.size]
        return jnp.asarray(out.reshape(h, w, 4))
