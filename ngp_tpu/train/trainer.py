"""Training orchestration: jitted train step, grid maintenance, controllers.

Rebuild of reference Testbed::train / train_prep_nerf / train_nerf /
train_nerf_step (testbed.cu:168-418) with TPU-shaped control flow:

 * One jitted `train_step` = sample rays -> march lattice -> network forward
   -> differentiable composite loss -> grads -> optax update -> param EMA.
   The reference's separate inference + compacted fwd/bwd passes collapse
   into one autodiff pass over the fixed-capacity flat sample buffer; its
   loss-scale plumbing folds away in bf16 (see render/composite.py).
 * `grid_update` (the train_prep, once per 16-step train() call,
   testbed.cu:193-229): sample grid cells -> density inference -> scatter-max
   splat -> EMA-max decay -> occupancy threshold + cascade max-pool.
 * Host-side adaptive ray-count controller (testbed.cu:292-293), with ray
   counts quantized to powers of two so XLA compiles a handful of shapes
   instead of one per batch size.

All dynamic quantities (sample counts, loss) live on device; the only
device->host sync per train() call is the stats fetch at the end, mirroring
the reference's single copy_to_host (testbed.cu:270-271).
"""

import functools
from dataclasses import dataclass, field
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ngp_tpu.grid.occupancy import (
    GridState,
    sample_grid_positions,
    splat_density_ema,
    update_occupancy,
)
from ngp_tpu.models.ngp import NGPModel, apply_density_activation, apply_rgb_activation
from ngp_tpu.render.composite import train_loss
from ngp_tpu.sampling.lattice import n_lattice_points
from ngp_tpu.sampling.training import generate_training_batch
from ngp_tpu.train.optimizer import create_optimizer, ema_update
from ngp_tpu.utils.aabb import AABB
from ngp_tpu.utils.color import linear_to_srgb, srgb_to_linear
from ngp_tpu.utils.config import BATCH_SIZE_MULTIPLE, NGPConfig


class TrainState(NamedTuple):
    params: Any
    ema_params: Any
    opt_state: Any
    grid: GridState
    step: jnp.ndarray  # () int32 optimizer step (i_step)
    rng: jnp.ndarray  # jax PRNG key
    envmap: Any = None  # EnvmapState when config.envmap.train


def compute_rgb_target(rgba, bg_linear, color_space: str, train_in_linear_color: bool):
    """Per-ray training target + the background used in the composite.

    Parity with ray_marcher.cu:104-121: with the default Linear color space
    and train_in_linear_color=False the model is trained in sRGB space —
    blend in linear, then convert target and background to sRGB.
    Returns (rgb_target (R,3), bg_composite (R,3) or (3,)).
    """
    tex_rgb, tex_a = rgba[..., :3], rgba[..., 3:4]
    if train_in_linear_color or color_space.lower() == "linear":
        target = tex_rgb + (1.0 - tex_a) * bg_linear
        bg = bg_linear
        if not train_in_linear_color:
            target = linear_to_srgb(target)
            bg = linear_to_srgb(bg_linear)
        return target, bg
    # SRGB color space (nerf_compatibility): blend in sRGB
    bg_srgb = linear_to_srgb(bg_linear)
    safe_a = jnp.maximum(tex_a, 1e-9)
    straight = linear_to_srgb(tex_rgb / safe_a) * tex_a
    target = jnp.where(tex_a > 0, straight + (1.0 - tex_a) * bg_srgb, jnp.broadcast_to(bg_srgb, tex_rgb.shape))
    return target, bg_srgb


@dataclass
class Trainer:
    """Owns the static model/config and the compiled step functions."""

    config: NGPConfig
    model: NGPModel
    aabb: AABB
    rgb_activation: str = "Logistic"  # testbed.h:115
    density_activation: str = "Exponential"  # testbed.h:114
    background_color: tuple = (0.0, 0.0, 0.0)  # testbed.h:116 (srgb)
    color_space: str = "Linear"  # testbed.h:117
    loss_type: str = ""  # defaults to config.loss; runtime-tweakable
    target_batch_size: int = 1 << 18
    # flat sample buffer == the target batch: rays overflowing it are dropped
    # whole, exactly the reference's budget semantics (cu:414-416) — every
    # flat slot is fwd+bwd work, so headroom would cost step time linearly
    sample_capacity: int = 1 << 18
    mesh: Any = None  # jax.sharding.Mesh -> data-parallel steps
    _cache: dict = field(default_factory=dict)

    @staticmethod
    def create(config: NGPConfig, mesh=None) -> "Trainer":
        model = NGPModel.create(config.network)
        return Trainer(config=config, model=model, aabb=AABB.scene(config.sampler.aabb_scale), mesh=mesh)

    # ------------------------------------------------------------------ init
    def init_state(self, seed: int = 43) -> TrainState:
        key = jax.random.PRNGKey(seed)
        k_init, k_rng = jax.random.split(key)
        params = self.model.init(k_init)
        tx = create_optimizer(self.config.optimizer)
        from ngp_tpu.grid.occupancy import create_grid_state

        envmap = None
        if self.config.envmap.train:
            from ngp_tpu.render.envmap import create_envmap_state

            envmap = create_envmap_state(self.config.envmap)
        return TrainState(
            params=params,
            ema_params=jax.tree_util.tree_map(jnp.copy, params),
            opt_state=tx.init(params),
            grid=create_grid_state(self.config.sampler),
            step=jnp.zeros((), jnp.int32),
            rng=k_rng,
            envmap=envmap,
        )

    # ----------------------------------------------------------- train step
    def _train_step_fn(self, n_rays: int, capacity: int, s_pad: int, n_window: int = 0, s_short: int = 0, n_long: int = 0, n_seg_cap: int = 0, remat_heads: bool = True):
        cfg = self.config
        scfg = cfg.sampler
        model = self.model
        aabb = self.aabb
        tx = create_optimizer(cfg.optimizer)
        n_lattice = n_lattice_points(scfg)

        def step_fn(state: TrainState, images, xforms, focal_length, n_rays_shift):
            rng, k_batch, k_bg = jax.random.split(state.rng, 3)
            batch = generate_training_batch(
                scfg,
                aabb,
                images,
                xforms,
                focal_length,
                (0.5, 0.5),
                state.grid.occupancy,
                k_batch,
                n_rays,
                n_rays_shift,
                capacity,
                n_lattice,
                s_pad,
                occ_aabb=state.grid.occ_aabb,
                n_window=n_window,
                s_short=s_short,
                n_long=n_long,
                n_seg_cap=n_seg_cap,
            )

            # background: one random sRGB color per step when enabled
            # (kernel-wide rng copy => same color for all rays; ray_marcher.cu:90-93)
            if cfg.render.train_with_random_bg_color:
                bg_srgb = jax.random.uniform(k_bg, (3,))
            else:
                bg_srgb = jnp.asarray(self.background_color, jnp.float32)
            bg_linear = srgb_to_linear(bg_srgb)
            train_envmap = cfg.envmap.train and state.envmap is not None

            # background/target are params-independent; computed once outside
            # loss_fn. The envmap enters the composite as a CONSTANT here —
            # its gradient is the reference's dedicated deposit path below
            # (ray_marcher.cu:190-212), not autodiff of the training loss.
            if train_envmap:
                # composite the plain background behind the envmap
                # (ray_marcher.cu:96-102)
                from ngp_tpu.render.envmap import read_envmap

                env = read_envmap(state.envmap.params, batch.rays_d)
                bg_per_ray = env[:, :3] + bg_linear * (1.0 - env[:, 3:4])
            else:
                bg_per_ray = bg_linear
            rgb_target, bg_composite = compute_rgb_target(
                batch.rgba, bg_per_ray, self.color_space, cfg.render.train_in_linear_color
            )
            rgb_target = jax.lax.stop_gradient(rgb_target)

            def loss_fn(params):
                rgb_raw, sigma_raw = model.rgbsigma_raw(params, batch.pos, batch.dirs, remat_heads=remat_heads)
                extra = ()
                if batch.layout_long is not None:
                    bg_long = bg_composite[batch.sel_long] if bg_composite.ndim == 2 else bg_composite
                    extra = (
                        (
                            batch.layout_long,
                            batch.dt_pad_long if batch.dt_pad_long is not None else scfg.min_cone_stepsize,
                            batch.valid_long,
                            rgb_target[batch.sel_long],
                            bg_long,
                        ),
                    )
                return train_loss(
                    rgb_raw,
                    sigma_raw,
                    batch.layout,
                    batch.dt_pad if batch.dt_pad is not None else scfg.min_cone_stepsize,
                    batch.valid_short,
                    rgb_target,
                    bg_composite,
                    extra_buckets=extra,
                    n_rays_denom=n_rays,
                    loss_type=self.loss_type or cfg.loss,
                    transmittance_threshold=cfg.render.transmittance_threshold,
                    rgb_activation=self.rgb_activation,
                    density_activation=self.density_activation,
                    mean_density=state.grid.mean_density,
                    min_optical_thickness=scfg.min_optical_thickness,
                    apply_rgb_activation=apply_rgb_activation,
                    apply_density_activation=apply_density_activation,
                )

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            ema_params = ema_update(state.ema_params, params, cfg.optimizer.ema_decay)

            envmap_state = state.envmap
            if train_envmap:
                # exact deposit semantics (ray_marcher.cu:190-212): gradients
                # accumulate across the call's inner steps; the envmap
                # optimizer steps once per train() call via envmap_apply
                # (testbed.cu:295-298, applied by the TrainingLoop)
                from ngp_tpu.render.envmap import envmap_accumulate, envmap_gradient

                rgb_ray, trans_end, exhausted = aux["bucket_rays"][0]
                rv = batch.valid_short
                if batch.layout_long is not None:
                    rgb1, t1, e1 = aux["bucket_rays"][1]
                    rgb_ray = rgb_ray.at[batch.sel_long].set(rgb1)
                    trans_end = trans_end.at[batch.sel_long].set(t1)
                    exhausted = exhausted.at[batch.sel_long].set(e1)
                    rv = rv | jnp.zeros_like(rv).at[batch.sel_long].set(batch.valid_long)
                g_env = envmap_gradient(
                    state.envmap.params,
                    batch.rays_d,
                    rgb_ray,
                    trans_end,
                    exhausted,
                    rv,
                    rgb_target,
                    bg_composite,
                    envmap_loss_type=cfg.envmap.loss or (self.loss_type or cfg.loss),
                    train_in_linear_color=cfg.render.train_in_linear_color,
                    n_rays_denom=n_rays,
                )
                envmap_state = envmap_accumulate(envmap_state, g_env)

            stats = {
                "loss_sum": aux["loss_sum"],
                "measured_batch_size": aux["measured_batch_size"],
                "measured_batch_size_before_compaction": batch.n_samples,
                "max_ray_count": batch.max_ray_count,
                "count_at_split": batch.count_at_split,
                "seg_count_hi": batch.seg_count_hi,
            }
            new_state = TrainState(
                params=params,
                ema_params=ema_params,
                opt_state=opt_state,
                grid=state.grid,
                step=state.step + 1,
                rng=rng,
                envmap=envmap_state,
            )
            return new_state, stats

        return step_fn

    def _semantic_key(self):
        """Runtime-tweakable attributes baked into traced steps; any change
        must compile a fresh step (python_api.cu exposes these read/write)."""
        return (
            self.loss_type,
            self.color_space,
            tuple(self.background_color),
            self.rgb_activation,
            self.density_activation,
        )

    def train_call(self, n_rays: int, capacity: int, s_pad: int, n_steps: int, n_window: int = 0, s_short: int = 0, n_long: int = 0, n_seg_cap: int = 0):
        """One jitted call running `n_steps` inner steps via lax.scan —
        collapses per-step host dispatches (expensive through a remote
        device tunnel) into one. Mirrors the reference's 16-step train()
        granularity (testbed.cu:255-263)."""
        key = ("call", n_rays, capacity, s_pad, n_steps, n_window, s_short, n_long, n_seg_cap, self._semantic_key())
        if key not in self._cache:
            if self.mesh is not None and self.mesh.devices.size > 1:
                from ngp_tpu.parallel.mesh import make_dp_train_call

                self._cache[key] = make_dp_train_call(self, self.mesh, n_rays, capacity, s_pad, n_steps, n_window=n_window, s_short=s_short, n_long=n_long, n_seg_cap=n_seg_cap)
            else:
                # the fused scan keeps every inner step's activations in
                # flight — remat the heads there (per-step dispatch skips it)
                step_fn = self._train_step_fn(n_rays, capacity, s_pad, n_window, s_short, n_long, n_seg_cap, remat_heads=True)

                def call_fn(state, images, xforms, focal_length, shift0):
                    def body(st, i):
                        st, stats = step_fn(st, images, xforms, focal_length, shift0 + jnp.uint32(i) * jnp.uint32(n_rays))
                        return st, stats

                    return jax.lax.scan(body, state, jnp.arange(n_steps))

                self._cache[key] = jax.jit(call_fn, donate_argnums=(0,))
        return self._cache[key]

    def train_step(self, n_rays: int, capacity: int | None = None, s_pad: int = 1024, n_window: int = 0, s_short: int = 0, n_long: int = 0, n_seg_cap: int = 0):
        """Jitted step for a given (static, power-of-two) ray count.

        With a mesh set, returns the shard_map data-parallel step (rays
        sharded over the "data" axis, grads psum'ed; parallel/mesh.py).
        """
        capacity = capacity or self.sample_capacity
        key = ("step", n_rays, capacity, s_pad, n_window, s_short, n_long, n_seg_cap, self._semantic_key())
        if key not in self._cache:
            if self.mesh is not None and self.mesh.devices.size > 1:
                from ngp_tpu.parallel.mesh import make_dp_train_step

                self._cache[key] = make_dp_train_step(self, self.mesh, n_rays, capacity, s_pad, n_window=n_window, s_short=s_short, n_long=n_long, n_seg_cap=n_seg_cap)
            else:
                # single-step dispatch: one step's saved head activations are
                # ~130 MB — skip the remat, saving a heads forward in the bwd
                self._cache[key] = jax.jit(
                    self._train_step_fn(n_rays, capacity, s_pad, n_window, s_short, n_long, n_seg_cap, remat_heads=False), static_argnames=(), donate_argnums=(0,)
                )
        return self._cache[key]

    # ---------------------------------------------------------- envmap apply
    def envmap_apply(self):
        """Jitted once-per-train()-call envmap optimizer step: consumes the
        accumulated per-step gradients (testbed.cu:295-298)."""
        key = ("envmap_apply",)
        if key not in self._cache:
            from ngp_tpu.render.envmap import envmap_apply

            ecfg = self.config.envmap

            def apply_fn(state: TrainState) -> TrainState:
                return state._replace(envmap=envmap_apply(ecfg, state.envmap))

            self._cache[key] = jax.jit(apply_fn, donate_argnums=(0,))
        return self._cache[key]

    # -------------------------------------------------------------- probing
    def probe_batch(self, n_probe: int, n_window: int):
        """Batch-gen-only probe on the FRESH grid: returns (n_samples,
        max_ray_count) for `n_probe` rays. The TrainingLoop uses it to seed
        the ray-count/width controllers from the CURRENT grid instead of
        last call's lagging estimate (the reference sizes from the previous
        measured batch, testbed.cu:292-293 — exact for its static grid
        cadence, one call late during grid evolution)."""
        key = ("probe", n_probe, n_window)
        if key not in self._cache:
            scfg = self.config.sampler
            aabb = self.aabb
            n_lattice = n_lattice_points(scfg)

            def probe_fn(state: TrainState, images, xforms, focal_length, n_rays_shift):
                k_batch, _ = jax.random.split(state.rng)  # peek; rng not consumed
                batch = generate_training_batch(
                    scfg, aabb, images, xforms, focal_length, (0.5, 0.5),
                    state.grid.occupancy, k_batch, n_probe, n_rays_shift,
                    n_probe, n_lattice, 32,
                    occ_aabb=state.grid.occ_aabb, n_window=n_window,
                    want_seg_stat=True,
                )
                # all stats are pre-truncation/pre-drop, so the tiny
                # capacity/s_pad above don't bias them
                return batch.n_samples, batch.max_ray_count, batch.seg_count_hi

            self._cache[key] = jax.jit(probe_fn)
        return self._cache[key]

    # ----------------------------------------------------------- grid update
    def _grid_update_fn(self, n_uniform: int, n_nonuniform: int):
        cfg = self.config
        scfg = cfg.sampler
        model = self.model
        aabb = self.aabb

        def update_fn(state: TrainState):
            rng, k_grid = jax.random.split(state.rng)
            pos, idx = sample_grid_positions(
                scfg, state.grid.density, k_grid, n_uniform, n_nonuniform, state.grid.step
            )
            warped = aabb.relative_pos(pos)

            # density inference with the *training* params (testbed.cu:213-217
            # passes use_inference_matrices=false), chunked with lax.scan so
            # the millions of grid positions don't blow up peak memory
            n_total = n_uniform + n_nonuniform
            chunk = min(1 << 18, n_total)
            n_chunks = -(-n_total // chunk)
            pad = n_chunks * chunk - n_total
            wp = jnp.pad(warped, ((0, pad), (0, 0))) if pad else warped

            def body(_, p):
                raw = model.density_raw(state.params, p)[:, 0]
                return None, apply_density_activation(raw, self.density_activation)

            _, dens = jax.lax.scan(body, None, wp.reshape(n_chunks, chunk, 3))
            dens = dens.reshape(-1)[:n_total]

            grid = splat_density_ema(scfg, state.grid, idx, dens)
            grid = update_occupancy(scfg, grid)
            return state._replace(grid=grid, rng=rng)

        return update_fn

    def grid_update(self, i_step: int):
        """Occupancy maintenance; uniform-only for the first 256 steps
        (testbed.cu:196-198)."""
        n_total = self.config.sampler.n_total_elements
        if i_step >= 256:
            shape = (n_total // 4, n_total // 4)
        else:
            shape = (n_total, 0)
        key = ("grid", shape, self.density_activation)
        if key not in self._cache:
            if self.mesh is not None and self.mesh.devices.size > 1:
                from ngp_tpu.parallel.mesh import make_dp_grid_update

                self._cache[key] = make_dp_grid_update(self, self.mesh, *shape)
            else:
                self._cache[key] = jax.jit(self._grid_update_fn(*shape), donate_argnums=(0,))
        return self._cache[key]


class TrainingLoop:
    """Host-side loop state: adaptive ray count + telemetry (TrainingBuffer)."""

    def __init__(self, trainer: Trainer, dataset):
        self.trainer = trainer
        self.dataset = dataset
        self.n_rays_per_batch = 1 << 12  # testbed.h:141
        self.capacity = trainer.sample_capacity
        # padded samples-per-ray width S: adapts to the longest observed ray
        # (rays longer than S are dropped whole; the max_ray_count stat grows
        # S back the next call). Memory-capped so R*S stays bounded.
        self.s_pad = self._quantize_s_pad(trainer.config.sampler.maximum_marching_steps, self.n_rays_per_batch)
        self.n_rays_total = 0
        self.i_step = 0
        self.loss_scalar = float("nan")
        self.measured_batch_size = trainer.target_batch_size
        self.measured_batch_size_before_compaction = trainer.target_batch_size
        self.training_prep_ms = 0.0
        self.training_ms = 0.0
        # occupied-window length in lattice steps (empty-space clip); sized
        # from the occupied-cell AABB after each grid update
        self.n_window = 0
        self._last_shape = None
        # two-bucket composite controller: the n_rays/8 longest rays go to
        # the wide bucket; s_short covers the rest with 25% headroom over
        # the observed longest short-bucket count (count_at_split stat)
        self.s_short = 0
        self._s_short_shrink_votes = 0
        # two-level-march controller: kept-coarse-segment capacity, sized from
        # the seg_count_hi stat; 0 = full-window march (noisy grids where the
        # premask keeps nearly everything)
        self.n_seg_cap = 0
        self._seg_est = None
        self._seg_shrink_votes = 0
        # per-ray sample estimate driving the controllers; None triggers a
        # fresh-grid probe at the next call (also re-probed on >25% drift)
        self._per_ray_est = None
        self._probe_next = False
        # fused-scan chunk length under the stochastic backward: the full
        # 16-step scan exceeds HBM at compile there (21.2 GB vs 15.75,
        # r4 note), but shorter scans fit — chunking keeps most of the
        # dispatch amortization (16 -> n/chunk dispatches). Demoted to 1
        # (per-step) automatically if a chunk's compile still OOMs.
        self.stochastic_fuse_steps = 8

    # --------------------------------------------------- shape choice
    def _choose_shape(self, n_training_steps: int, commit: bool):
        """The full static-shape tuple the next train call will jit with.

        commit=True applies the kept-segment-cap controller transition
        (grow-fast/shrink-after-two-votes, 25% headroom, pow2 — the same
        hysteresis style as s_short); commit=False (peek_shape) predicts it
        without mutating, so callers like bench.py can detect a pending
        shape switch BEFORE paying its compile inside a timed region.
        """
        n_long = max(self.n_rays_per_batch // 4, 1)
        s_short = self.s_short if 0 < self.s_short < self.s_pad else 0
        # two-level march: engage when the kept-segment cap meaningfully
        # undercuts the full window — the same 3/4 threshold the renderer uses
        n_seg_frame = self.n_window // 8
        n_seg_cap_val = self.n_seg_cap
        shrink_votes = self._seg_shrink_votes
        if self._seg_est is not None and self._seg_est > 0:
            # round UP to the {2^k, 3*2^(k-1)} ladder: pow2-only rounding can
            # inflate the cap ~2x past the estimate and push it back over the
            # 3/4-window engage threshold it just cleared
            need_cap = max(self._seg_est * 1.25, 8)
            want = min(
                next((v for v in self._LADDER if v >= need_cap), n_seg_frame),
                n_seg_frame,
            )
            if n_seg_cap_val == 0 or want > n_seg_cap_val or n_seg_cap_val > n_seg_frame:
                n_seg_cap_val = want
                shrink_votes = 0
            elif want <= n_seg_cap_val // 2:
                shrink_votes += 1
                if shrink_votes >= 2:
                    n_seg_cap_val = n_seg_cap_val // 2
                    shrink_votes = 0
            else:
                shrink_votes = 0
        if commit:
            self.n_seg_cap = n_seg_cap_val
            self._seg_shrink_votes = shrink_votes
        n_seg_cap = n_seg_cap_val if 0 < n_seg_cap_val * 8 <= (3 * self.n_window) // 4 else 0
        return (self.n_rays_per_batch, self.capacity, self.s_pad, self.n_window, s_short, n_long, n_seg_cap, n_training_steps)

    def peek_shape(self, n_training_steps: int = 16):
        """Predict the next call's shape tuple without mutating controllers."""
        return self._choose_shape(n_training_steps, commit=False)

    # ------------------------------------------------- controller persistence
    def controller_state(self) -> dict:
        """Snapshot-able controller state: restoring it skips the warm-up
        transient entirely (a resume reaches steady state immediately)."""
        return {
            "n_rays_per_batch": int(self.n_rays_per_batch),
            "s_pad": int(self.s_pad),
            "s_short": int(self.s_short),
            "per_ray_est": float(self._per_ray_est) if self._per_ray_est else 0.0,
            "seg_est": float(self._seg_est) if self._seg_est else 0.0,
        }

    def restore_controller(self, d: dict):
        if not d:
            return
        self.n_rays_per_batch = self._quantize_n_rays(int(d.get("n_rays_per_batch", self.n_rays_per_batch)))
        self.s_pad = self._quantize_s_pad(int(d.get("s_pad", self.s_pad)), self.n_rays_per_batch)
        self.s_short = min(int(d.get("s_short", 0)), self.s_pad)
        per_ray = float(d.get("per_ray_est", 0.0))
        self._per_ray_est = per_ray if per_ray > 0 else None
        seg = float(d.get("seg_est", 0.0))
        self._seg_est = seg if seg > 0 else None

    # static-shape ladder {2^k, 3*2^(k-1)}: max quantization error 1.155x
    # (pow2 alone is 1.41x — on the 50k evidence scene that parked measured
    # at 69% of the target batch and cost ~10% samples/s). A bounded shape
    # set, and every rung >= 8 divides by 8 for the DP mesh.
    _LADDER = tuple(
        sorted(
            {1 << k for k in range(3, 19)}
            | {3 << (k - 1) for k in range(4, 18)}
            | {5 << (k - 2) for k in range(8, 18)}
        )
    )
    _N_RAYS_LADDER = tuple(v for v in _LADDER if 256 <= v <= (1 << 18))

    @classmethod
    def _quantize_n_rays(cls, n: int) -> int:
        """Round to the nearest ladder rung, in [2^8, 2^18] (cap:
        testbed.cu:293)."""
        n = max(1 << 8, min(n, 1 << 18))
        return min(cls._N_RAYS_LADDER, key=lambda v: abs(v - n))

    def _quantize_s_pad(self, max_count: int, n_rays: int) -> int:
        """Pow2 padded width covering the longest ray, memory-capped so the
        padded (R, S) tensors stay <= 2^23 slots."""
        max_steps = self.trainer.config.sampler.maximum_marching_steps
        cap = max(32, min(1 << int(np.ceil(np.log2(max_steps))), (1 << 23) // n_rays))
        want = 1 << int(np.ceil(np.log2(max(int(max_count), 32))))
        return min(want, cap)

    def _pick_n_rays(self, per_ray: float, target: int, current: int | None = None) -> int:
        """Ladder rung whose expected batch lands closest to the target.

        Asymmetric in the default capacity == target configuration:
        undershoot costs full weight (the network/composite stages run on
        CAPACITY-sized static shapes, so a shortfall of u samples idles
        u's worth of the ~80% of the step they occupy), while expectation
        beyond CAPACITY costs 0.3x (those rays only waste march work,
        ~20% of the step, before the cap drops them). The old symmetric
        2x overshoot penalty had this backwards and parked measured at
        77% of target on converged grids (bench 1.09e6 vs 1.15e6).

        Samples between TARGET and CAPACITY (only possible when capacity
        is configured above the target) are NOT cheap: they are kept, so
        they inflate the effective batch past the protocol's target —
        loss_scalar and the gradient magnitude both scale with measured
        (testbed.cu:288-292, where measured never exceeds target) — and
        they get full weight.

        `current` adds switch hysteresis: per-ray estimate noise around a
        rung boundary otherwise flips the jit shape call to call (each
        flip recompiles and defeats the fused-scan stability gate), so the
        incumbent rung is kept unless the challenger is decisively
        cheaper."""
        cap = float(self.capacity)

        def cost(n):
            e = n * per_ray
            if e <= target:
                return target - e
            return (min(e, cap) - target) + 0.3 * max(e - cap, 0.0)

        best = min(self._N_RAYS_LADDER, key=cost)
        if current in self._N_RAYS_LADDER and cost(current) <= 1.25 * cost(best) + 0.02 * target:
            return current
        return best

    def train(self, state: TrainState, n_training_steps: int = 16):
        """One reference train() call: grid prep + n steps + controller."""
        import time

        t0 = time.perf_counter()
        state = self.trainer.grid_update(self.i_step)(state)
        # size the lattice window from the fresh occupied box (occupancy is
        # constant for the next 16 steps, so this bound is exact); the
        # readback doubles as the prep sync
        box = np.asarray(state.grid.occ_aabb)
        dt = self.trainer.config.sampler.min_cone_stepsize
        from ngp_tpu.sampling.lattice import n_lattice_points as _nlat

        n_lat = _nlat(self.trainer.config.sampler)
        diag = float(np.linalg.norm(box[1] - box[0]))
        need = int(np.ceil(diag / dt)) + 2
        # pow2 chunks so the jit shape set stays tiny as the box shrinks
        self.n_window = min(n_lat, max(128, 128 << int(np.ceil(np.log2(max(need / 128, 1))))))

        # fresh-grid probe: size n_rays/s_pad from the grid THIS call will
        # march (first call, or after >25% per-ray drift — grid evolution
        # otherwise makes the previous-call estimate lag one call behind and
        # the measured batch transiently collapses)
        ds = self.dataset
        # the per-step stats carry seg_count_hi only while the seg path is
        # ON; when it's off, a periodic probe (cheap: 1024 rays) keeps the
        # seg estimate fresh so the premask engages once the grid sparsifies
        if self.n_seg_cap == 0 and self.i_step > 0 and (self.i_step // n_training_steps) % 16 == 0:
            self._probe_next = True
        if self._per_ray_est is None or self._probe_next:
            n_probe = 1 << 10
            pf = self.trainer.probe_batch(n_probe, self.n_window)
            ns, mrc, msc = jax.device_get(
                pf(state, ds.images, ds.xforms, jnp.asarray(ds.focal_length), jnp.uint32(self.n_rays_total))
            )
            if float(msc) > 0:
                self._seg_est = float(msc)
            per_ray = float(ns) / n_probe
            if per_ray > 0:
                target = self.trainer.target_batch_size
                self.n_rays_per_batch = self._pick_n_rays(per_ray, target, self.n_rays_per_batch)
                self._per_ray_est = per_ray
                self.s_pad = self._quantize_s_pad(int(float(mrc) * 1.25) + 1, self.n_rays_per_batch)
                self.s_short = min(self.s_short, self.s_pad) if self.s_short else 0
            self._probe_next = False
        self.training_prep_ms = (time.perf_counter() - t0) * 1e3

        t0 = time.perf_counter()
        if self.i_step == 0:
            self.n_rays_total = 0
        # a quarter of the rays: on occupancy-clipped batches roughly half
        # the rays are empty, so R/4 comfortably covers the long tail and
        # lets s_short drop to the ~32-sample floor
        shape = self._choose_shape(n_training_steps, commit=True)
        (_, _, _, _, s_short, n_long, n_seg_cap, _) = shape
        # the stochastic-corner backward rebalances XLA's schedule such that
        # the 16-step fused scan exceeds HBM at compile (measured 21.2 GB vs
        # the 15.75 GB chip); shorter scans fit, so the shipped default runs
        # the scan in `stochastic_fuse_steps`-long chunks (16 dispatches ->
        # n/chunk) and demotes itself to per-step if a chunk still OOMs.
        fuse = n_training_steps
        if self.trainer.model.grid_spec.stochastic_bwd:
            fuse = min(n_training_steps, max(int(self.stochastic_fuse_steps), 0))
        use_fused = shape == self._last_shape and fuse > 1 and n_training_steps % max(fuse, 1) == 0
        self._last_shape = shape
        if use_fused:
            # stable shapes -> ONE dispatch per `fuse` steps (lax.scan; the
            # reference's 16-step inner loop never touches the host,
            # testbed.cu:255-263). Gated on the same shape twice in a row so
            # transient controller shapes don't pay the scan compile.
            try:
                call = self.trainer.train_call(
                    self.n_rays_per_batch, self.capacity, self.s_pad, fuse, self.n_window, s_short, n_long, n_seg_cap
                )
                chunk_stats = []
                for _ in range(n_training_steps // fuse):
                    shift = self.n_rays_total
                    state, stats = call(state, ds.images, ds.xforms, jnp.asarray(ds.focal_length), jnp.uint32(shift))
                    # advance counters only after the call succeeds (a compile
                    # OOM on the first chunk must leave the loop untouched)
                    self.n_rays_total += self.n_rays_per_batch * fuse
                    chunk_stats.append(stats)
                    self.i_step += fuse
                stats = jax.device_get(chunk_stats)  # single sync per call batch
                stats = jax.tree_util.tree_map(lambda *xs: np.concatenate([np.atleast_1d(x) for x in xs]), *stats)
            except Exception as e:  # noqa: BLE001 — filtered to OOM below
                if "RESOURCE_EXHAUSTED" not in str(e) and "Ran out of memory" not in str(e):
                    raise
                # scan compile exceeded HBM on this config: demote to
                # per-step dispatch for the rest of the run
                self.stochastic_fuse_steps = 1
                use_fused = False
        if not use_fused:
            step_fn = self.trainer.train_step(self.n_rays_per_batch, self.capacity, self.s_pad, self.n_window, s_short, n_long, n_seg_cap)
            all_stats = []
            for _ in range(n_training_steps):
                shift = self.n_rays_total
                self.n_rays_total += self.n_rays_per_batch
                state, stats = step_fn(state, ds.images, ds.xforms, jnp.asarray(ds.focal_length), jnp.uint32(shift))
                all_stats.append(stats)
                self.i_step += 1
            # single D->H sync for telemetry (testbed.cu:266-289)
            stats = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *jax.device_get(all_stats))
        if self.trainer.config.envmap.train and state.envmap is not None:
            # envmap optimizer steps once per train() call on the mean of the
            # accumulated per-step gradients (testbed.cu:295-298)
            state = self.trainer.envmap_apply()(state)
        self.training_ms = (time.perf_counter() - t0) * 1e3

        measured = float(np.mean(stats["measured_batch_size"]))
        measured_bc = float(np.mean(stats["measured_batch_size_before_compaction"]))
        if measured == 0:
            raise RuntimeError("Training generated 0 samples. Aborting training.")
        self.measured_batch_size = measured
        self.measured_batch_size_before_compaction = measured_bc

        target = self.trainer.target_batch_size
        loss_sum = float(np.sum(stats["loss_sum"])) / self.n_rays_per_batch
        self.loss_scalar = loss_sum / n_training_steps * (measured / target)

        # adaptive ray count (testbed.cu:292-293), pow2-quantized for jit
        # caching; pick the pow2 whose EXPECTED measured batch lands closest
        # to the target (plain nearest-pow2 of the rounded-up ray count has a
        # stable fixed point ~1.7x above target). per-ray sizing uses the
        # PRE-drop sample counts so whole-ray drops don't skew the estimate.
        old_n_rays = self.n_rays_per_batch
        per_ray = measured_bc / old_n_rays
        # >25% drift vs the estimate this call was sized with -> the grid is
        # still evolving; re-probe on the fresh grid next call
        if self._per_ray_est and abs(per_ray - self._per_ray_est) > 0.25 * self._per_ray_est:
            self._probe_next = True
        self._per_ray_est = per_ray
        self.n_rays_per_batch = self._pick_n_rays(per_ray, target, old_n_rays)

        # padded width for the next call: cover this call's longest ray with
        # 25% headroom (stat is pre-drop, so an undersized S self-corrects)
        max_count = float(np.max(stats["max_ray_count"]))
        self.s_pad = self._quantize_s_pad(int(max_count * 1.25) + 1, self.n_rays_per_batch)
        # short-bucket width: cover the longest ray NOT in the top bucket with
        # headroom. Grow immediately (undersizing drops rays); shrink only
        # after two consecutive half-size votes — without hysteresis the
        # width flaps between pow2 values and the shape-stability gate never
        # lets the fused scan engage.
        msc = float(np.max(stats.get("seg_count_hi", 0)))
        if msc > 0:
            self._seg_est = msc
        split = float(np.max(stats.get("count_at_split", stats["max_ray_count"])))
        need = min(1 << int(np.ceil(np.log2(max(split * 1.25, 32)))), self.s_pad)
        if self.s_short == 0 or need > self.s_short or self.s_short > self.s_pad:
            self.s_short = need
            self._s_short_shrink_votes = 0
        elif need <= self.s_short // 2:
            self._s_short_shrink_votes += 1
            if self._s_short_shrink_votes >= 2:
                self.s_short = self.s_short // 2
                self._s_short_shrink_votes = 0
        else:
            self._s_short_shrink_votes = 0
        return state
