"""nerf_synthetic dataset loader (transforms_*.json + PNG frames).

TPU-native rebuild of reference internal/dataset/nerf_synthetic.{h,cu}:
  * parse transforms json, load frames            (nerf_synthetic.cu:31-101)
  * poses: OpenGL -> scene convention with scale/offset (cu:97 ->
    spec_opengl_to_opencv, common_device.cu:16-30)
  * focal length from camera_angle_x              (cu:108-110)
  * images -> premultiplied-alpha *linear* fp16   (from_rgba32 kernel,
    common_device.h:160-175: rgb = srgb_to_linear(rgb8/255) * a, a = a8/255)

The whole dataset stays resident on device ((N,H,W,4) fp16, ~0.5 GB for the
train split at 800^2), exactly like the reference's GPUMemory<half> buffer
(nerf_synthetic.h:39). Decoding runs on a host thread pool (the reference
uses its own ThreadPool, thread_pool.h; we use concurrent.futures).
"""

import json
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ngp_tpu.utils.camera import fov_to_focal_length, opengl_to_opencv


@dataclass
class NeRFSyntheticDataset:
    images: jnp.ndarray  # (N, H, W, 4) float16, premultiplied linear
    xforms: jnp.ndarray  # (N, 3, 4) float32, scene convention
    focal_length: tuple  # (fx, fy)
    principal_point: tuple  # (0.5, 0.5)
    resolution: tuple  # (W, H)
    scale: float
    offset: tuple
    n_images: int


def _decode_image(path: Path) -> np.ndarray:
    from PIL import Image

    img = Image.open(path)
    img = img.convert("RGBA")
    return np.asarray(img, dtype=np.uint8)


def srgb_to_linear_np(x):
    return np.where(x <= 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)


def load_nerf_synthetic(json_path, scale: float = 0.33, offset=(0.5, 0.5, 0.5)) -> NeRFSyntheticDataset:
    json_path = Path(json_path)
    base = json_path.parent
    doc = json.loads(json_path.read_text())
    frames = doc["frames"]

    def resolve(fp: str) -> Path:
        p = base / fp
        if p.suffix == "":
            for ext in (".png", ".jpg"):
                if p.with_suffix(ext).exists():
                    return p.with_suffix(ext)
            raise FileNotFoundError(f"Could not find image file: {p}")
        return p

    paths = [resolve(f["file_path"]) for f in frames]

    # fast path: native C++ loader (libpng + thread pool + fp16 convert)
    images = None
    if all(p.suffix == ".png" for p in paths):
        from ngp_tpu.native import load_images_native, png_size_native

        size = png_size_native(paths[0])
        if size is not None:
            w, h = size
            images = load_images_native(paths, w, h)

    if images is None:  # python fallback (PIL on a thread pool)
        with ThreadPoolExecutor(max_workers=16) as pool:
            raw = list(pool.map(_decode_image, paths))
        h, w = raw[0].shape[:2]
        for r in raw:
            if r.shape[:2] != (h, w):
                raise ValueError("training images are not all the same size")
        u8 = np.stack(raw).astype(np.float32) / 255.0  # (N, H, W, 4)
        alpha = u8[..., 3:4]
        lin = srgb_to_linear_np(u8[..., :3]) * alpha  # premultiply in linear space
        images = np.concatenate([lin, alpha], axis=-1).astype(np.float16)
    else:
        h, w = images.shape[1], images.shape[2]

    xforms_gl = np.stack([np.asarray(f["transform_matrix"], np.float32)[:3, :4] for f in frames])
    xforms = np.asarray(opengl_to_opencv(xforms_gl, scale, list(offset)))

    camera_angle_x = float(doc["camera_angle_x"])
    fl = float(np.asarray(fov_to_focal_length(w, camera_angle_x)))

    return NeRFSyntheticDataset(
        images=jnp.asarray(images),
        xforms=jnp.asarray(xforms),
        focal_length=(fl, fl),
        principal_point=(0.5, 0.5),
        resolution=(w, h),
        scale=scale,
        offset=tuple(offset),
        n_images=len(frames),
    )


def read_rgba(images, xy, img_idx):
    """Nearest-pixel fetch of premultiplied-linear rgba at normalized xy.

    Reference: read_rgba / image_pos (common_device.h:180-202) — floor to the
    pixel index, clamp to the image.
    """
    n, h, w, _ = images.shape
    px = jnp.clip((xy[..., 0] * w).astype(jnp.int32), 0, w - 1)
    py = jnp.clip((xy[..., 1] * h).astype(jnp.int32), 0, h - 1)
    return images[img_idx, py, px].astype(jnp.float32)
