"""Experiment-layer image IO + metrics, port of the reference
experiment/nerf_synthetic/python/common.py (215 LoC) onto ngp_tpu.metrics.
"""

import os

import numpy as np

from ngp_tpu.metrics import compute_error as _compute_error
from ngp_tpu.metrics import mse2psnr  # noqa: F401


def srgb_to_linear(img):
    limit = 0.04045
    return np.where(img > limit, np.power((img + 0.055) / 1.055, 2.4), img / 12.92)


def linear_to_srgb(img):
    limit = 0.0031308
    return np.where(img > limit, 1.055 * np.power(np.maximum(img, limit), 1.0 / 2.4) - 0.055, 12.92 * img)


def read_image(path):
    """Read image -> float [0,1] array; PNG alpha premultiplied in linear
    space (parity with reference common.py:37-76 for the PNG path)."""
    from PIL import Image

    path = str(path)
    if path.endswith(".bin"):
        with open(path, "rb") as f:
            bytes_ = f.read()
        h, w = np.frombuffer(bytes_[:8], np.int32)
        img = np.frombuffer(bytes_[8:], np.float16).reshape(h, w, 4).astype(np.float32)
        return img
    img = np.asarray(Image.open(path).convert("RGBA"), np.float32) / 255.0
    rgb = srgb_to_linear(img[..., :3]) * img[..., 3:4]
    return np.concatenate([rgb, img[..., 3:4]], axis=-1)


def write_image(path, img, quality=95):
    from PIL import Image

    img = np.asarray(img)
    if img.shape[-1] == 4:
        a = img[..., 3:4]
        rgb = np.divide(img[..., :3], a, out=np.zeros_like(img[..., :3]), where=a > 1e-6)
        out = np.concatenate([linear_to_srgb(np.clip(rgb, 0, 1)), a], axis=-1)
        mode = "RGBA"
    else:
        out = linear_to_srgb(np.clip(img[..., :3], 0, 1))
        mode = "RGB"
    u8 = (np.clip(out, 0, 1) * 255.0 + 0.5).astype(np.uint8)
    Image.fromarray(u8, mode).save(path)


def write_depth(path, depth, scale=1.0 / 6.0, cm="jet"):
    """Colorized depth PNG (reference common.py writes a jet-mapped depth)."""
    from PIL import Image

    d = np.clip(np.asarray(depth, np.float32) * scale, 0.0, 1.0)
    rgb = _jet(d)
    Image.fromarray((rgb * 255.0 + 0.5).astype(np.uint8), "RGB").save(path)


def _jet(x):
    r = np.clip(1.5 - np.abs(4 * x - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * x - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * x - 1), 0, 1)
    return np.stack([r, g, b], axis=-1)


def compute_error(metric, A, R):
    v = _compute_error(metric, A, R)
    return np.asarray([v if v is not None else np.nan])
