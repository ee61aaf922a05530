"""Renderer end-to-end check against the analytic field, no training.

Swaps the network for a stub that returns the procedural scene's EXACT
sigma/rgb (data/synthetic.field_sigma_rgb) and renders over the analytic
converged occupancy grid. The PSNR vs the dense ground-truth marcher bounds
the renderer-pipeline error PLUS the protocol's inherent semantic gaps (the
Shade path composites in sRGB space like the reference, the occupancy
threshold drops low-sigma blob skirts, and the t-lattice quadrature differs
from GT's) — the per-lattice exactness itself is pinned separately: the
rendered output matches an independent numpy composite over the same jitter
and lattice to float precision, and the seg premask path matches the
full-window path bit-exactly (diagnosed 2026-08-17; both checks live in
tests/test_render_segments.py + this tool's history). Also reports how much
work transmittance early-stop trims (the converged-regime render lever).

Run (CPU ok): JAX_PLATFORMS=cpu python tools/stub_render_check.py [res=200]
"""

import sys
import time
from dataclasses import dataclass
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class StubModel:
    """NGPModel-shaped analytic field: raw outputs are the activation
    preimages so apply_*_activation reproduces sigma/rgb exactly."""

    def prepare_inference(self, params):
        return params

    def rgbsigma_raw(self, params, pos, warped_dir):
        from ngp_tpu.data.synthetic import _BLOBS, _SIGMA_PEAK
        from ngp_tpu.utils.color import linear_to_srgb

        blobs = jnp.asarray(_BLOBS)
        d2 = jnp.sum((pos[:, None, :] - blobs[None, :, :3]) ** 2, axis=-1)
        w = jnp.exp(-0.5 * d2 / (blobs[None, :, 3] ** 2) * 4.0)
        s = _SIGMA_PEAK * w  # (N, B)
        sigma = jnp.sum(s, axis=1)
        rgb = jnp.einsum("nb,bc->nc", s, blobs[:, 4:7]) / jnp.maximum(sigma[:, None], 1e-8)
        # the Shade pipeline treats network rgb as sRGB (the training-space
        # convention, ray_marcher.cu:104-121) and converts the composite to
        # linear at the end — so the stub must emit sRGB sample colors
        rgb = jnp.clip(linear_to_srgb(rgb), 1e-4, 1.0 - 1e-4)
        sigma_raw = jnp.log(jnp.maximum(sigma, 1e-20))  # Exponential activation
        rgb_raw = jnp.log(rgb / (1.0 - rgb))  # Logistic activation
        return rgb_raw, sigma_raw

    def input_gradient(self, params, pos, density_activation="Exponential"):
        raise NotImplementedError


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 200

    from ngp_tpu.data.synthetic import (
        _look_at_pose,
        _opengl_to_opencv_np,
        field_sigma_rgb,
        render_ground_truth,
    )
    from ngp_tpu.grid.occupancy import create_grid_state, update_occupancy
    from ngp_tpu.render.renderer import Renderer
    from ngp_tpu.utils.color import linear_to_srgb
    from ngp_tpu.utils.config import NGPConfig

    config = NGPConfig.from_json({})
    scfg = config.sampler
    g = scfg.grid_size

    # analytic converged grid (same recipe as bench.py's converged benchmark)
    ax = (np.arange(g, dtype=np.float32) + 0.5) / g - 0.5
    zz, yy, xx = np.meshgrid(ax, ax, ax, indexing="ij")
    dens = []
    for c in range(scfg.n_cascades):
        centers = np.stack([xx, yy, zz], axis=-1).reshape(-1, 3) * float(1 << c) + 0.5
        sigma, _ = field_sigma_rgb(centers)
        dens.append(sigma * scfg.min_cone_stepsize)
    grid = create_grid_state(scfg)._replace(density=jnp.asarray(np.concatenate(dens)))
    grid = update_occupancy(scfg, grid)
    print(f"# occ frac c0 {float(np.asarray(grid.occupancy[0]).mean()):.4f}")

    renderer = Renderer(model=StubModel(), config=config)
    cam_gl = _look_at_pose(np.array([4.0, -1.0, 1.5], np.float32))
    cam = _opengl_to_opencv_np(cam_gl, 0.33, (0.5, 0.5, 0.5))
    angle = 0.6911112070083618
    fl = 0.5 * res / np.tan(0.5 * angle)

    spp = 4
    params = {"hash_packed": True, "hash_table": None}  # satisfies _prepared
    acc = np.zeros((res, res, 4), np.float32)
    t0 = time.perf_counter()
    for s in range(spp):
        acc += np.asarray(
            renderer.render_frame(
                params, grid.occupancy, cam, (res, res), (fl, fl), (0.5, 0.5), s,
                occ_aabb=grid.occ_aabb,
            )
        )
    img = acc / spp
    t_render = time.perf_counter() - t0
    print(f"# {res}^2 spp-{spp} stub render: {t_render:.1f}s")

    gt = np.asarray(render_ground_truth(cam_gl, res, res, angle))
    a = np.clip(np.asarray(linear_to_srgb(jnp.asarray(img[..., :3]))), 0, 1)
    b = np.clip(np.asarray(linear_to_srgb(jnp.asarray(gt[..., :3]))), 0, 1)
    mse = float(np.mean((a - b) ** 2))
    psnr = -10.0 * np.log10(max(mse, 1e-12))
    print(f"# renderer-vs-GT PSNR {psnr:.2f} dB (renderer + protocol-semantics gap)")

    # early-termination accounting: Cost mode counts composited samples
    cost = np.asarray(
        renderer.render_frame(
            params, grid.occupancy, cam, (res, res), (fl, fl), (0.5, 0.5), 0,
            render_mode="Cost", occ_aabb=grid.occ_aabb,
        )
    )[..., 0] * 128.0
    from ngp_tpu.sampling.lattice import count_samples, n_lattice_points
    from ngp_tpu.utils.aabb import AABB

    # pre-termination occupied counts for the same (spp 0) rays
    geo_cache = renderer._seg_cache
    n_proc = float(cost.sum())
    print(f"# processed (early-stopped) samples: {n_proc/1e6:.2f} M")
    # occupied counts via a straight count pass on the same pixel-center rays
    aabb = AABB.scene(scfg.aabb_scale)
    xs = (np.arange(res, dtype=np.float32) + 0.5) / res
    xy = np.stack(np.meshgrid(xs, xs, indexing="xy"), -1).reshape(-1, 2)
    d = np.stack(
        [(xy[:, 0] - 0.5) * res / fl, (xy[:, 1] - 0.5) * res / fl, np.ones(len(xy), np.float32)],
        -1,
    ) @ cam[:, :3].T
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(cam[:, 3], d.shape).astype(np.float32)
    tmin = np.maximum(
        np.max(np.minimum(-o / d, (1 - o) / d), -1), 0.05
    ).astype(np.float32) + 1e-6
    n_lat = n_lattice_points(scfg)
    counts = np.asarray(
        count_samples(scfg, aabb, grid.occupancy, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmin), n_lat)
    )
    n_occ = float(counts.sum())
    print(
        f"# occupied samples: {n_occ/1e6:.2f} M -> termination trims "
        f"{100*(1-n_proc/max(n_occ,1)):.0f}% of network-eligible work"
    )


if __name__ == "__main__":
    main()
