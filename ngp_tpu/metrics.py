"""Evaluation metrics — PSNR / SSIM / MAE / MAPE / SMAPE / MSE / MRSE (+LPIPS).

Rebuild of the reference experiment metrics
(experiment/nerf_synthetic/python/common.py:113-205): numpy implementations
of the error maps, `mse2psnr`, SSIM (11x11 Gaussian, standard constants),
and LPIPS-VGG via torch when available (torch ships CPU-only here; LPIPS
weights may be absent offline, so `lpips` degrades gracefully to None).
"""

import numpy as np


def mse(a, b):
    return float(np.mean((a - b) ** 2))


def mae(a, b):
    return float(np.mean(np.abs(a - b)))


def mape(a, b):
    return float(np.mean(np.abs(a - b) / (np.abs(b) + 1e-2)))


def smape(a, b):
    return float(np.mean(np.abs(a - b) / (0.5 * (np.abs(a) + np.abs(b)) + 1e-2)))


def mrse(a, b):
    return float(np.mean((a - b) ** 2 / (b**2 + 1e-2)))


def mse2psnr(x: float) -> float:
    return -10.0 * np.log10(max(x, 1e-20))


def psnr(a, b) -> float:
    return mse2psnr(mse(a, b))


def _gaussian_kernel(size=11, sigma=1.5):
    ax = np.arange(size) - size // 2
    k = np.exp(-0.5 * (ax / sigma) ** 2)
    k2 = np.outer(k, k)
    return k2 / k2.sum()


def _filter2d(img, kernel):
    """Valid-mode 2D convolution per channel, (H, W, C)."""
    from numpy.lib.stride_tricks import sliding_window_view

    kh, kw = kernel.shape
    win = sliding_window_view(img, (kh, kw), axis=(0, 1))  # (H', W', C, kh, kw)
    return np.einsum("hwcij,ij->hwc", win, kernel)


def ssim(a, b, data_range=1.0) -> float:
    """Structural similarity, 11x11 Gaussian window, K1=0.01 K2=0.03."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.ndim == 2:
        a, b = a[..., None], b[..., None]
    k = _gaussian_kernel()
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu_a = _filter2d(a, k)
    mu_b = _filter2d(b, k)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    s_aa = _filter2d(a * a, k) - mu_aa
    s_bb = _filter2d(b * b, k) - mu_bb
    s_ab = _filter2d(a * b, k) - mu_ab
    num = (2 * mu_ab + c1) * (2 * s_ab + c2)
    den = (mu_aa + mu_bb + c1) * (s_aa + s_bb + c2)
    return float(np.mean(num / den))


_LPIPS_MODEL = None


_LPIPS_WARNED = False


def lpips(a, b):
    """LPIPS-VGG in [0,1] images (H,W,3); None if torch/weights unavailable
    (reported loudly once, never silently)."""
    global _LPIPS_MODEL, _LPIPS_WARNED
    try:
        import torch

        if _LPIPS_MODEL is None:
            import lpips as lpips_pkg  # optional dependency

            _LPIPS_MODEL = lpips_pkg.LPIPS(net="vgg")
        ta = torch.from_numpy(np.ascontiguousarray(np.moveaxis(a * 2 - 1, -1, 0))[None]).float()
        tb = torch.from_numpy(np.ascontiguousarray(np.moveaxis(b * 2 - 1, -1, 0))[None]).float()
        with torch.no_grad():
            return float(_LPIPS_MODEL(ta, tb).item())
    except Exception as e:
        if not _LPIPS_WARNED:
            _LPIPS_WARNED = True
            import logging

            logging.getLogger(__name__).warning(
                "LPIPS unavailable (%s: %s) — reporting None for the LPIPS column", type(e).__name__, e
            )
        return None


def compute_error(metric: str, a, b):
    metric = metric.upper()
    fns = {"MSE": mse, "MAE": mae, "MAPE": mape, "SMAPE": smape, "MRSE": mrse, "SSIM": ssim, "PSNR": psnr}
    if metric == "LPIPS":
        return lpips(a, b)
    if metric == "FLIP":
        from ngp_tpu.flip import flip

        return flip(a, b)
    return fns[metric](np.asarray(a, np.float64), np.asarray(b, np.float64))
