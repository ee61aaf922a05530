"""Cascaded occupancy / density grid — fixed-shape jnp state + update ops.

TPU-native rebuild of the grid half of reference
internal/sampler/occupancy_sampler.{h,cu}:

  state (occupancy_sampler.h:124-130):
    density_grid   (n_cascades * G^3,) fp32 — EMA-max smoothed density;
                   -1 marks cells no training camera ever sees
    mean_density   scalar — mean of relu(cascade-0 densities)
    occupancy      (n_cascades, G, G, G) bool — ("bitfield") density above
                   min(min_optical_thickness, mean), max-pooled up cascades

  ops (kernels at occupancy_sampler.cu):
    mark_untrained_grid        <- mark_untrained_density_grid (cu:18)
    sample_grid_positions      <- generate_grid_samples_nerf_nonuniform (cu:63)
    splat_density / ema_update <- splat_..._max_nearest_neighbor (cu:107) +
                                  ema_grid_samples_nerf (cu:134)
    update_occupancy           <- grid_to_bitfield (cu:160) +
                                  bitfield_max_pool (cu:182)

TPU design notes: the grid is addressed LINEARLY (x + G*y + G^2*z) — Morton
order exists in the reference for GPU warp locality, which has no TPU
counterpart. CUDA atomicMax splats become `jnp .at[].max` scatters
(deterministic by construction); the bitfield is stored as a bool array
(4 MB, a bit-packing round trip would cost VPU unpacking for no win).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ngp_tpu.utils.config import SamplerConfig


class GridState(NamedTuple):
    density: jnp.ndarray  # (n_cascades * G^3,) fp32
    occupancy: jnp.ndarray  # (n_cascades, G, G, G) bool
    mean_density: jnp.ndarray  # () fp32
    step: jnp.ndarray  # () int32 — grid-update counter (i_step)
    # world AABB of all occupied cells, (2, 3) [lo; hi] — marchers clip rays
    # to it and skip the provably-empty lattice prefix (exact: occupancy
    # outside this box is false by construction)
    occ_aabb: jnp.ndarray = None


def create_grid_state(cfg: SamplerConfig) -> GridState:
    g = cfg.grid_size
    full = jnp.stack(
        [jnp.full((3,), 0.5 - 0.5 * cfg.aabb_scale), jnp.full((3,), 0.5 + 0.5 * cfg.aabb_scale)]
    )
    return GridState(
        density=jnp.zeros((cfg.n_total_elements,), jnp.float32),
        occupancy=jnp.zeros((cfg.n_cascades, g, g, g), bool),
        mean_density=jnp.zeros((), jnp.float32),
        step=jnp.zeros((), jnp.int32),
        occ_aabb=full,
    )


def occupied_aabb(cfg: SamplerConfig, occupancy) -> jnp.ndarray:
    """World-space AABB of every occupied cell, (2, 3) f32 [lo; hi].

    Union over cascades (cascade c's cells span the cube of side 2^c centered
    at 0.5), INTERSECTED with the scene AABB — marching never leaves the
    scene box, so occupied cells beyond it can't contribute and would only
    inflate the window (for aabb_scale=1 the mandatory cascade-1 grid covers
    a 2-cube the marcher never visits). An entirely-empty grid returns a
    degenerate point box at the scene center, which no lattice point ever
    falls inside.
    """
    g = cfg.grid_size
    los, his = [], []
    for c in range(cfg.n_cascades):
        occ = occupancy[c]  # (G, G, G), axes (x, y, z)
        nonempty = jnp.any(occ)
        lo_i, hi_i = [], []
        for ax in range(3):
            v = jnp.any(occ, axis=tuple(i for i in range(3) if i != ax))  # (G,)
            lo_i.append(jnp.argmax(v).astype(jnp.int32))
            hi_i.append(g - 1 - jnp.argmax(v[::-1]).astype(jnp.int32))
        lo_u = jnp.stack(lo_i).astype(jnp.float32) / g
        hi_u = (jnp.stack(hi_i).astype(jnp.float32) + 1.0) / g
        scale = float(1 << c)
        los.append(jnp.where(nonempty, (lo_u - 0.5) * scale + 0.5, jnp.inf))
        his.append(jnp.where(nonempty, (hi_u - 0.5) * scale + 0.5, -jnp.inf))
    r = 0.5 * cfg.aabb_scale
    lo = jnp.maximum(jnp.min(jnp.stack(los), axis=0), 0.5 - r)
    hi = jnp.minimum(jnp.max(jnp.stack(his), axis=0), 0.5 + r)
    empty = lo[0] > hi[0]
    return jnp.stack([jnp.where(empty, 0.5, lo), jnp.where(empty, 0.5, hi)])


def cell_centers(cfg: SamplerConfig, cascade: int):
    """World-space centers of all cells of one cascade, (G^3, 3), linear order.

    Cascade c covers the cube of side 2^c centered at 0.5 (cu:37-38).
    """
    g = cfg.grid_size
    ax = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g - 0.5
    # linear index = x + G*y + G^2*z => z slowest, x fastest
    z, y, x = jnp.meshgrid(ax, ax, ax, indexing="ij")
    pos = jnp.stack([x.reshape(-1), y.reshape(-1), z.reshape(-1)], axis=-1)
    return pos * float(1 << cascade) + 0.5


def mark_untrained_grid(cfg: SamplerConfig, resolution, focal_length, xforms) -> jnp.ndarray:
    """Initial density grid: 0 where any camera sees the cell, else -1.

    Vectorized rebuild of mark_untrained_density_grid (cu:18-61): a cell
    (center p, radius r) is visible from camera j if z = (p - t_j)·fwd_j > 0
    and |x|-r < z * w/(2 fx), |y|-r < z * h/(2 fy).
    """
    res = np.asarray(resolution, np.float32)
    fx, fy = float(focal_length[0]), float(focal_length[1])
    half_resx, half_resy = 0.5 * res[0], 0.5 * res[1]
    xforms = jnp.asarray(xforms, jnp.float32)  # (n_images, 3, 4)

    # chunk over cells so the (cells x images x 3) visibility tensor never
    # materializes whole: 100-image 800^2 datasets would otherwise peak at
    # ~2.5 GB per cascade (the reference runs one thread per cell, cu:18-61)
    chunk = min(1 << 16, cfg.n_grid_elements)  # pow2, divides G^3

    def visible_any(pos, voxel_radius):
        def body(_, p):
            ploc = p[:, None, :] - xforms[None, :, :, 3]  # (chunk, n_images, 3)
            cam_x = jnp.einsum("pnc,nc->pn", ploc, xforms[:, :, 0])
            cam_y = jnp.einsum("pnc,nc->pn", ploc, xforms[:, :, 1])
            cam_z = jnp.einsum("pnc,nc->pn", ploc, xforms[:, :, 2])
            vis = (
                (cam_z > 0)
                & (jnp.abs(cam_x) - voxel_radius < cam_z / fx * half_resx)
                & (jnp.abs(cam_y) - voxel_radius < cam_z / fy * half_resy)
            )
            return None, jnp.any(vis, axis=1)

        n = pos.shape[0]
        _, vis = jax.lax.scan(body, None, pos.reshape(n // chunk, chunk, 3))
        return vis.reshape(n)

    grids = []
    for c in range(cfg.n_cascades):
        pos = cell_centers(cfg, c)  # (G^3, 3)
        voxel_radius = 0.5 * np.sqrt(3.0) * (1 << c) / cfg.grid_size
        grids.append(jnp.where(visible_any(pos, voxel_radius), 0.0, -1.0))
    return jnp.concatenate(grids)


def _pcg4d(v):
    """Counter-based u32x4 hash (Jarzynski & Olano, "Hash Functions for GPU
    Rendering", pcg4d). One fused elementwise pass over (N, 4) uint32 —
    replaces jax.random's threefry for the grid sampler's per-cell draws.
    Measured effect on v5e is small (~2 ms/update, mb19 — the sampler's cost
    is its 10-candidate density gathers, not the RNG); kept because the
    reference's own per-sample RNG is a counter-style LCG/pcg32 mix
    (common_device.h), and a stateless counter hash needs no key plumbing."""
    v = v * jnp.uint32(1664525) + jnp.uint32(1013904223)
    x, y, z, w = v[..., 0], v[..., 1], v[..., 2], v[..., 3]
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    x = x ^ (x >> 16)
    y = y ^ (y >> 16)
    z = z ^ (z >> 16)
    w = w ^ (w >> 16)
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    return x, y, z, w


def sample_grid_positions(cfg: SamplerConfig, density, key, n_uniform: int, n_nonuniform: int, step, uniform_offset=0, nonuniform_offset=None, n_total_global: int | None = None):
    """Pick grid cells + a random position inside each; (N,3) world pos, (N,) idx.

    Rebuild of generate_grid_samples_nerf_nonuniform (cu:63-105): each sample
    draws a random cascade, then takes up to 10 pseudo-random candidate cells
    (LCG-style stride over the level) and keeps the first whose stored density
    exceeds a threshold (-0.01 for the uniform pass — any trained cell — or
    min_optical_thickness for the density-weighted pass).

    `uniform_offset`/`nonuniform_offset`/`n_total_global` let a data-parallel
    chip draw its slice of a global [uniform; nonuniform] candidate set with
    the same counter hashes as one chip drawing all of it (partition-invariant
    grid updates, tests/test_dp_equivalence.py). Defaults reproduce the
    single-chip indexing exactly.
    """
    g = cfg.grid_size
    n_total = n_uniform + n_nonuniform
    tot = n_total_global if n_total_global is not None else n_total
    if nonuniform_offset is None:
        nonuniform_offset = n_uniform

    # two u32 salts from the jax key (one tiny threefry draw), then all
    # per-cell randomness comes from the fused _pcg4d counter hash
    salts = jax.random.bits(key, (2,), jnp.uint32)
    i = jnp.concatenate(
        [
            jnp.arange(n_uniform, dtype=jnp.uint32) + jnp.uint32(uniform_offset),
            jnp.arange(n_nonuniform, dtype=jnp.uint32) + jnp.uint32(nonuniform_offset),
        ]
    )
    ctr = jnp.stack(
        [
            i,
            jnp.broadcast_to(salts[0], i.shape),
            jnp.broadcast_to(salts[1], i.shape),
            jnp.broadcast_to(jnp.uint32(step), i.shape),
        ],
        axis=-1,
    )
    h0, h1, h2, h3 = _pcg4d(ctr)
    inv24 = jnp.float32(1.0 / (1 << 24))
    u = jnp.stack([(h0 >> 8), (h1 >> 8), (h2 >> 8)], axis=-1).astype(jnp.float32) * inv24
    levels = (((h3 >> 8).astype(jnp.float32) * inv24) * cfg.n_cascades).astype(jnp.int32)
    levels = jnp.minimum(levels, cfg.n_cascades - 1)

    # candidate cells: the reference's multiplicative stride sequence (cu:87)
    cand0 = ((i + jnp.uint32(step) * jnp.uint32(tot)) * jnp.uint32(56924617) + jnp.uint32(96925573)) % jnp.uint32(cfg.n_grid_elements)
    cand0 = cand0.astype(jnp.int32) + levels * cfg.n_grid_elements  # (N,)

    # UNIFORM half: the reference retries up to 10 candidates until one
    # passes threshold -0.01, i.e. skips untrained (-1) cells (cu:87-93).
    # Retrying is splat-IMMUNE here — splat_density_ema leaves prev<0 cells
    # at -1 no matter what lands on them — so the first candidate is kept
    # unconditionally: same grid dynamics, zero density gathers, at the cost
    # of occasionally spending a density eval on an untrained cell.
    # NONUNIFORM half: first-of-10 above min_optical_thickness, as cu:87.
    if n_nonuniform > 0:
        j = jnp.arange(1, 10, dtype=jnp.uint32)
        i_n = i[n_uniform:]
        cand_n = ((i_n + jnp.uint32(step) * jnp.uint32(tot))[:, None] * jnp.uint32(56924617) + j[None, :] * jnp.uint32(19349663) + jnp.uint32(96925573)) % jnp.uint32(cfg.n_grid_elements)
        cand_n = jnp.concatenate(
            [cand0[n_uniform:, None], cand_n.astype(jnp.int32) + levels[n_uniform:, None] * cfg.n_grid_elements], axis=1
        )  # (Nn, 10)
        ok = density[cand_n] > cfg.min_optical_thickness
        # first passing candidate, else the last one (reference keeps final j)
        first = jnp.argmax(ok, axis=1)
        pick = jnp.where(jnp.any(ok, axis=1), first, 9)
        idx_n = jnp.take_along_axis(cand_n, pick[:, None], axis=1)[:, 0]
        idx = jnp.concatenate([cand0[:n_uniform], idx_n])
    else:
        idx = cand0

    # random position within the chosen cell (cu:95-101), linear addressing
    local = idx % cfg.n_grid_elements
    x = local % g
    y = (local // g) % g
    z = local // (g * g)
    cell = jnp.stack([x, y, z], axis=-1).astype(jnp.float32)
    # exp2(levels) for small int levels via exponent-bit construction
    mip_scale = jax.lax.bitcast_convert_type((127 + idx // cfg.n_grid_elements) << 23, jnp.float32)[:, None]
    pos = ((cell + u) / g - 0.5) * mip_scale + 0.5
    return pos, idx


def splat_density_ema(cfg: SamplerConfig, state: GridState, indices, densities) -> GridState:
    """Scatter-max the sampled densities, then EMA-max decay the grid.

    splat_grid_samples_nerf_max_nearest_neighbor (cu:107-132): splat value is
    density * min_cone_stepsize (optical thickness of the smallest step).
    ema_grid_samples_nerf (cu:134-158): new = prev<0 ? prev
                                             : max(prev * decay, splat).
    """
    optical = densities * cfg.min_cone_stepsize
    current = jnp.zeros_like(state.density).at[indices].max(optical)
    prev = state.density
    new = jnp.where(prev < 0.0, prev, jnp.maximum(prev * cfg.ema_decay, current))
    return state._replace(density=new, step=state.step + 1)


def update_occupancy(cfg: SamplerConfig, state: GridState) -> GridState:
    """Threshold the grid into occupancy and max-pool up the cascades.

    update_grid_bitfield (cu:737-760): mean = mean(relu(cascade-0)); occupied
    = density > min(min_optical_thickness, mean); each coarser cascade OR-s in
    the 2x-downsampled finer cascade, placed in its central octant.
    """
    g = cfg.grid_size
    mean = jnp.mean(jnp.maximum(state.density[: cfg.n_grid_elements], 0.0))
    thresh = jnp.minimum(cfg.min_optical_thickness, mean)
    occ_flat = state.density > thresh  # (n_cascades * G^3,)
    # linear index x + G*y + G^2*z -> reshape (z, y, x) then transpose to xyz
    occ = occ_flat.reshape(cfg.n_cascades, g, g, g).transpose(0, 3, 2, 1)  # (c, x, y, z)

    levels = [occ[0]]
    for c in range(1, cfg.n_cascades):
        fine = levels[-1]
        # 2x max-pool
        pooled = fine.reshape(g // 2, 2, g // 2, 2, g // 2, 2).any(axis=(1, 3, 5))
        # place in central octant [G/4, 3G/4) of this cascade (cu:200-204)
        q = g // 4
        merged = occ[c].at[q : 3 * q, q : 3 * q, q : 3 * q].set(occ[c][q : 3 * q, q : 3 * q, q : 3 * q] | pooled)
        levels.append(merged)
    occupancy = jnp.stack(levels)
    return state._replace(
        occupancy=occupancy, mean_density=mean, occ_aabb=occupied_aabb(cfg, occupancy)
    )


_POOL = 8  # fine cells per superblock edge (128^3 grid -> 16^3 super-grid)
_HALO = 3  # fine-cell halo each superblock absorbs beyond its own 8^3 block


def pooled_occupancy(cfg: SamplerConfig, occupancy):
    """Halo-pooled super-occupancy, (n_cascades, G/8, G/8, G/8) bool.

    Superblock b is True iff ANY fine cell within b's 8^3 block EXPANDED by a
    _HALO-cell shell is occupied (a (8+2*_HALO)^3 any-pool at stride 8).
    Marchers use it as a conservative pre-mask: a lattice SEGMENT (8
    consecutive fine steps) whose midpoint's superblock reads False provably
    contains no occupied sample. The slack the halo must absorb, measured at
    the midpoint's mip where a fine cell is 2^mip/G wide and worst at mip 0
    with dt = sqrt(3)/1024 ~ 0.22 cells: segment half-extent (4+1)*dt ~ 1.1
    cells (the +1 covers per-spp march-start jitter < dt; the coarse pass
    runs on each pass's exact rays — renderer._frame_geometry — so there is
    no cross-pass ray drift to absorb) — well under 2 cells total, so
    _HALO = 3 is strictly conservative with margin. The fine pass
    re-tests survivors exactly, so false positives only add work, never
    change results. (The reference has no analogue — its per-thread DDA
    skips empty cells serially, occupancy_sampler.cu:287-308; on TPU the
    skip must be a vectorized mask/compact.)
    """
    g = cfg.grid_size
    w = _POOL + 2 * _HALO
    q = jax.lax.reduce_window(
        occupancy.astype(jnp.uint8),
        jnp.uint8(0),
        jax.lax.max,
        window_dimensions=(1, w, w, w),
        window_strides=(1, _POOL, _POOL, _POOL),
        padding=((0, 0), (_HALO, _HALO), (_HALO, _HALO), (_HALO, _HALO)),
    )
    assert q.shape == (cfg.n_cascades, g // _POOL, g // _POOL, g // _POOL)
    return q > 0


def pooled_lookup(cfg: SamplerConfig, pooled, pos, mip):
    """pooled_occupancy at world positions; same addressing as
    occupancy_lookup but on the G/8 super-grid."""
    s = cfg.grid_size // _POOL
    mip_scale = jax.lax.bitcast_convert_type((127 - mip) << 23, jnp.float32)[..., None]
    p = (pos - 0.5) * mip_scale + 0.5
    cell = jnp.clip(jnp.floor(p * s).astype(jnp.int32), 0, s - 1)
    flat = ((mip * s + cell[..., 0]) * s + cell[..., 1]) * s + cell[..., 2]
    return pooled.reshape(-1)[flat]


def packed_neighborhood(cfg: SamplerConfig, occupancy):
    """Bit-packed 3^3 occupancy neighborhoods, (G^3,) uint32.

    Word w[x*G^2 + y*G + z] holds cascade-0 occupancy of the 27 cells
    (x+dx, y+dy, z+dz), dx/dy/dz in {-1, 0, 1}, at bit
    (dx+1)*9 + (dy+1)*3 + (dz+1); out-of-grid neighbor bits are 0 (never
    read — see lattice._packed_chunk_occ's clip argument).

    Why: XLA TPU gathers cost per ROW (~5-7 ns, ROADMAP.md mb6), so the
    marching cost of an 8-step lattice chunk is 8 rows of single-cell
    occupancy. All 8 points of a chunk lie within one cell of the chunk
    midpoint's cell whenever 3.5*dt*G <= 1 (default config: 0.76), so ONE
    gather of the midpoint cell's packed word answers all 8 occupancy tests
    — an 8x row reduction on the march's hot leg. Build cost is 27 shifted
    ORs over G^3 (elementwise, ~sub-ms), paid per grid update or in-step.

    aabb_scale=1 marches only (the reference's own nerf_synthetic configs all
    run it): the per-point march mip is then constantly 0 (lattice._march_mip),
    so only cascade 0 is packed.
    """
    g = cfg.grid_size
    occ0 = jnp.pad(occupancy[0], 1)  # (G+2,)^3, zeros outside
    word = jnp.zeros((g, g, g), jnp.uint32)
    bit = 0
    for dx in (0, 1, 2):
        for dy in (0, 1, 2):
            for dz in (0, 1, 2):
                nb = occ0[dx : dx + g, dy : dy + g, dz : dz + g]
                word = word | (nb.astype(jnp.uint32) << bit)
                bit += 1
    # the occupancy ARRAY's axes are (x, y, z) (update_occupancy transposes
    # the linear density layout), so a direct flatten matches the
    # (x*G + y)*G + z addressing packed_chunk_lookup uses (= occupancy_lookup
    # at mip 0)
    return word.reshape(-1)


def packed_chunk_lookup(cfg: SamplerConfig, packed, pos_mid, pos):
    """Occupancy of chunk points via ONE packed-word gather per chunk.

    pos_mid (..., 3): chunk midpoint positions; pos (..., K, 3): the chunk's
    lattice points. Returns (..., K) bool, EXACTLY occupancy_lookup(pos, 0)
    for every point whose cell is within one cell of the midpoint's per axis
    — guaranteed when |t - t_mid| * G <= 1 (lattice.packed_march_supported);
    clipping both cells to the grid preserves the bound (clip is 1-Lipschitz).
    """
    g = cfg.grid_size
    cm = jnp.clip(jnp.floor(pos_mid * g).astype(jnp.int32), 0, g - 1)  # (..., 3)
    word = packed[(cm[..., 0] * g + cm[..., 1]) * g + cm[..., 2]]  # (...,) uint32
    cp = jnp.clip(jnp.floor(pos * g).astype(jnp.int32), 0, g - 1)  # (..., K, 3)
    off = jnp.clip(cp - cm[..., None, :], -1, 1) + 1
    bit = (off[..., 0] * 9 + off[..., 1] * 3 + off[..., 2]).astype(jnp.uint32)
    return ((word[..., None] >> bit) & jnp.uint32(1)).astype(bool)


def packed_cover_lookup(cfg: SamplerConfig, packed, pos_mid, pos, pos2):
    """ANY-occupied over the cell box spanned by segment [pos, pos2], via ONE
    packed-word gather per chunk (same addressing as packed_chunk_lookup).

    pos_mid (..., 3): chunk midpoints; pos/pos2 (..., K, 3): segment
    endpoints per lattice point. A straight segment's per-axis cell
    coordinate is monotone, so every cell it touches lies in the axis-
    aligned box between cell(pos) and cell(pos2); the box's 3^3-neighborhood
    bits are tested with one tensor-product bit mask (<= 15 int ops, no
    extra gathers). Exact superset of occupancy along the segment whenever
    both endpoint cells are within one cell of the midpoint's per axis —
    lattice.jitter_cover_supported's 4.5*dt*G <= 1 bound.
    """
    g = cfg.grid_size
    cm = jnp.clip(jnp.floor(pos_mid * g).astype(jnp.int32), 0, g - 1)
    word = packed[(cm[..., 0] * g + cm[..., 1]) * g + cm[..., 2]]  # (...,) uint32
    cp = jnp.clip(jnp.floor(pos * g).astype(jnp.int32), 0, g - 1)
    cq = jnp.clip(jnp.floor(pos2 * g).astype(jnp.int32), 0, g - 1)
    off_lo = jnp.clip(jnp.minimum(cp, cq) - cm[..., None, :], -1, 1) + 1
    off_hi = jnp.clip(jnp.maximum(cp, cq) - cm[..., None, :], -1, 1) + 1
    one = jnp.uint32(1)
    # per-axis 3-bit range masks: bits [lo, hi] of {0,1,2}
    def rng(lo, hi):
        return ((one << (hi + 1).astype(jnp.uint32)) - one) & ~((one << lo.astype(jnp.uint32)) - one)

    mx = rng(off_lo[..., 0], off_hi[..., 0])
    my = rng(off_lo[..., 1], off_hi[..., 1])
    mz = rng(off_lo[..., 2], off_hi[..., 2])
    # tensor product into the 27-bit neighborhood layout (bit = ox*9+oy*3+oz)
    myz = (
        jnp.where(my & one != 0, mz, jnp.uint32(0))
        | jnp.where((my >> 1) & one != 0, mz << 3, jnp.uint32(0))
        | jnp.where((my >> 2) & one != 0, mz << 6, jnp.uint32(0))
    )
    box = (
        jnp.where(mx & one != 0, myz, jnp.uint32(0))
        | jnp.where((mx >> 1) & one != 0, myz << 9, jnp.uint32(0))
        | jnp.where((mx >> 2) & one != 0, myz << 18, jnp.uint32(0))
    )
    return (word[..., None] & box) != 0


def occupancy_lookup(cfg: SamplerConfig, occupancy, pos, mip):
    """Occupancy at world positions for given mips; pos (..., 3), mip (...,).

    Rebuild of density_grid_occupied_at / cascaded_grid_idx_at (cu:236-260):
    scale into the mip's cube, floor to cell coords, clamp to [0, G-1].
    """
    g = cfg.grid_size
    # exp2(-mip) for small int mip, as exponent-bit construction (no transcendental)
    mip_scale = jax.lax.bitcast_convert_type((127 - mip) << 23, jnp.float32)[..., None]
    p = (pos - 0.5) * mip_scale + 0.5
    cell = jnp.clip(jnp.floor(p * g).astype(jnp.int32), 0, g - 1)
    # flattened 1-D gather: measured 1.6x faster than the 4-D fancy index on
    # v5e (tools/mb8.py; the multi-dim gather emitter is per-row slower)
    flat = ((mip * g + cell[..., 0]) * g + cell[..., 1]) * g + cell[..., 2]
    return occupancy.reshape(-1)[flat]


def _frexp_exponent(x):
    """frexpf exponent via float32 exponent bits: e with x = f*2^e, f in
    [0.5, 1) — exact for normalized x (subnormals land far below any clamp
    this is used with). ~3 integer ops instead of log2 + two corrections."""
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    return ((bits >> 23) & 0xFF) - 126


def mip_from_pos(pos, n_cascades: int):
    """Smallest cascade whose cube contains pos (cu:216-221).

    frexp semantics: exponent e of maxval = |pos-0.5|_inf, i.e. the unique e
    with maxval in [2^(e-1), 2^e); mip = clamp(e+1, 0, n_cascades-1).
    """
    maxval = jnp.max(jnp.abs(pos - 0.5), axis=-1)
    mip = jnp.clip(_frexp_exponent(maxval) + 1, 0, n_cascades - 1)
    # frexp(0) has exponent 0 -> reference yields mip min(1, n_cascades-1)
    return jnp.where(maxval == 0.0, jnp.minimum(1, n_cascades - 1), mip)


def static_dt_mip(dt: float, grid_size: int, n_cascades: int) -> int:
    """Host-side dt-driven mip floor for a CONSTANT step size (cu:223-230):
    -1 when dt spans less than half a cell (no floor), else the clamp'd
    exponent. The c=0 marcher's dt is config-static, so this never needs to
    be computed per sample."""
    import math

    d = dt * 2.0 * grid_size
    if d < 1.0:
        return -1
    _, e = math.frexp(d)
    return int(np.clip(e, 0, n_cascades - 1))


def mip_from_dt(dt, pos, grid_size: int, n_cascades: int):
    """Cascade from position, bumped up if dt spans more than half a cell (cu:223-230)."""
    mip = mip_from_pos(pos, n_cascades)
    d = dt * 2.0 * grid_size
    dt_mip = jnp.clip(_frexp_exponent(d), 0, n_cascades - 1)
    return jnp.where(d < 1.0, mip, jnp.maximum(mip, dt_mip))
