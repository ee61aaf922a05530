"""Procedural nerf_synthetic-format scene generator for tests and benches.

No nerf_synthetic data ships in this environment, so tests and `bench.py`
synthesize one: an analytic emissive volume (a few soft blobs with
position-dependent color) is ray-marched by a dense ground-truth renderer and
written to disk as `transforms_train/test.json` + PNG frames in exactly the
format the reference's loader consumes (nerf_synthetic.cu:31-110). Training
our NGP on it to a PSNR floor exercises the full pipeline end to end.

Geometry mimics the real dataset: object of radius ~1 at the origin in
*original* (OpenGL) world coordinates, cameras on a radius-4 sphere looking
at the origin, camera_angle_x ~0.69; after the run.py scale 0.33 / offset 0.5
(run.py:46) the object sits comfortably inside the unit-cube scene AABB.
"""

import json
from pathlib import Path

import numpy as np

# NOTE: this module is deliberately numpy-only. Dispatching tiny un-jitted
# jnp ops from the ground-truth render loop goes through the (possibly
# remote) accelerator one op at a time and is pathologically slow; the
# camera math below mirrors ngp_tpu.utils.camera exactly, in numpy.


def _opengl_to_opencv_np(pose, scale, offset):
    """numpy twin of utils.camera.opengl_to_opencv (same math, tested equal)."""
    pose = np.asarray(pose, np.float32)
    rot = pose[..., :3] * np.array([1.0, -1.0, -1.0], np.float32)
    t = pose[..., 3] * scale + np.asarray(offset, np.float32)
    out = np.concatenate([rot, t[..., None]], axis=-1)
    return out[..., [1, 2, 0], :]


def _pixel_to_rays_np(xy, resolution, focal_length, principal_point, cam):
    xy = np.asarray(xy, np.float32)
    d_cam = np.stack(
        [
            (xy[..., 0] - principal_point[0]) * resolution[0] / focal_length[0],
            (xy[..., 1] - principal_point[1]) * resolution[1] / focal_length[1],
            np.ones_like(xy[..., 0]),
        ],
        axis=-1,
    )
    d = d_cam @ cam[:, :3].T
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(cam[:, 3], d.shape)
    return o, d


# --------------------------------------------------------------------- scene
# Analytic field defined in *scene* coordinates (after scale/offset), i.e.
# inside the unit cube. sigma is measured per unit scene length.

_BLOBS = np.array(
    [  # cx, cy, cz, radius, r, g, b
        [0.50, 0.50, 0.50, 0.12, 0.9, 0.2, 0.1],
        [0.62, 0.44, 0.55, 0.07, 0.1, 0.8, 0.2],
        [0.42, 0.58, 0.45, 0.08, 0.2, 0.3, 0.9],
        [0.50, 0.38, 0.58, 0.05, 0.9, 0.8, 0.1],
    ],
    dtype=np.float32,
)
_SIGMA_PEAK = 300.0  # dense enough to be mostly opaque at blob centers


def scene_blobs(name: str | None):
    """Deterministic per-scene blob sets for the 8-scene batch protocol
    (train.sh/eval.sh run over chair..ship like the reference's
    train_win.bat:11); None/default gives the canonical 4-blob scene every
    test and bench uses. Each variant: 3-6 blobs inside the unit cube's
    central region, radii/colors seeded from the scene name."""
    if not name or name == "default":
        return _BLOBS
    # stable across python hash randomization: seed from the name's bytes
    rng = np.random.default_rng(int.from_bytes(name.encode()[:8].ljust(8, b"\0"), "little"))
    n = int(rng.integers(3, 7))
    blobs = []
    for _ in range(n):
        c = 0.5 + rng.uniform(-0.14, 0.14, 3)
        r = float(rng.uniform(0.05, 0.13))
        col = rng.uniform(0.1, 1.0, 3)
        blobs.append([*c, r, *col])
    return np.asarray(blobs, np.float32)


def field_sigma_rgb(pos, blobs=None):
    """pos: (..., 3) scene coords -> (sigma (...,), rgb (..., 3)) linear."""
    pos = np.asarray(pos, np.float32)
    sigma = np.zeros(pos.shape[:-1], np.float32)
    rgb_acc = np.zeros(pos.shape[:-1] + (3,), np.float32)
    for cx, cy, cz, r, cr, cg, cb in (_BLOBS if blobs is None else blobs):
        d2 = ((pos - np.array([cx, cy, cz])) ** 2).sum(-1)
        w = np.exp(-0.5 * d2 / (r * r) * 4.0).astype(np.float32)
        s = _SIGMA_PEAK * w
        rgb_acc += s[..., None] * np.array([cr, cg, cb], np.float32)
        sigma += s
    rgb = rgb_acc / np.maximum(sigma[..., None], 1e-8)
    return sigma, np.clip(rgb, 0.0, 1.0)


def _look_at_pose(eye):
    """OpenGL camera-to-world (3,4): camera looks from `eye` to the origin,
    -z forward, +y up-ish."""
    eye = np.asarray(eye, np.float32)
    fwd = -eye / np.linalg.norm(eye)  # view direction
    up = np.array([0.0, 0.0, 1.0], np.float32)
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    cam_up = np.cross(right, fwd)
    # OpenGL convention: columns = [x=right, y=up, z=backward]
    return np.stack([right, cam_up, -fwd, eye], axis=1).astype(np.float32)


def _linear_to_srgb_np(x):
    return np.where(x < 0.0031308, 12.92 * x, 1.055 * np.maximum(x, 0.0031308) ** 0.41666 - 0.055)


def render_ground_truth(pose_gl, width, height, camera_angle_x, scale=0.33, offset=(0.5, 0.5, 0.5), n_steps=384, blobs=None):
    """Dense-march the analytic field -> (H, W, 4) premultiplied linear rgba.

    Rays are generated through the SAME camera pipeline the framework uses
    (pose conversion + pixel_to_rays) so the dataset is self-consistent.
    """
    xform = _opengl_to_opencv_np(pose_gl, scale, offset)
    fl = 0.5 * width / np.tan(0.5 * camera_angle_x)
    xs = (np.arange(width) + 0.5) / width
    ys = (np.arange(height) + 0.5) / height
    xy = np.stack(np.meshgrid(xs, ys, indexing="xy"), axis=-1).reshape(-1, 2)
    o, d = _pixel_to_rays_np(xy, (width, height), (fl, fl), (0.5, 0.5), xform)

    # march [t0, t1] through the unit cube
    inv_d = 1.0 / np.where(np.abs(d) < 1e-9, 1e-9, d)
    t0 = np.max(np.minimum(-o * inv_d, (1 - o) * inv_d), axis=-1).clip(min=0)
    t1 = np.min(np.maximum(-o * inv_d, (1 - o) * inv_d), axis=-1)
    hit = t1 > t0

    n_rays = o.shape[0]
    rgb_out = np.zeros((n_rays, 3), np.float32)
    trans = np.ones((n_rays,), np.float32)
    dt = (t1 - t0) / n_steps
    for i in range(n_steps):
        t = t0 + (i + 0.5) * dt
        pos = o + t[:, None] * d
        sigma, rgb = field_sigma_rgb(pos, blobs)
        alpha = np.where(hit, 1.0 - np.exp(-sigma * dt), 0.0)
        w = alpha * trans
        rgb_out += w[:, None] * rgb
        trans *= 1.0 - alpha
    alpha_out = 1.0 - trans
    img = np.concatenate([rgb_out, alpha_out[:, None]], axis=-1)
    return img.reshape(height, width, 4)


def write_synthetic_dataset(
    out_dir,
    n_train: int = 16,
    n_test: int = 4,
    width: int = 128,
    height: int = 128,
    camera_angle_x: float = 0.6911112070083618,
    seed: int = 0,
    scene: str | None = None,
):
    """Write transforms_train.json / transforms_test.json + PNG frames.

    Camera poses: Fibonacci-ish spiral on the upper sphere of radius 4
    (matching the real dataset's hemisphere of views).
    """
    from PIL import Image

    out = Path(out_dir)
    (out / "train").mkdir(parents=True, exist_ok=True)
    (out / "test").mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    blobs = scene_blobs(scene)

    def make_split(split, n):
        frames = []
        for i in range(n):
            # deterministic spread over the upper hemisphere
            u = (i + 0.5) / n
            theta = np.arccos(np.clip(0.15 + 0.8 * u, -1, 1))  # polar
            phi = i * 2.399963229728653 + (0.5 if split == "test" else 0.0)
            eye = 4.0 * np.array([np.sin(theta) * np.cos(phi), np.sin(theta) * np.sin(phi), np.cos(theta)])
            pose = _look_at_pose(eye)
            img = render_ground_truth(pose, width, height, camera_angle_x, blobs=blobs)

            # premultiplied linear -> straight sRGB 8-bit + alpha (PNG)
            a = img[..., 3:4]
            straight = np.divide(img[..., :3], a, out=np.zeros_like(img[..., :3]), where=a > 1e-6)
            srgb = np.clip(_linear_to_srgb_np(np.clip(straight, 0, 1)), 0, 1)
            u8 = np.concatenate([srgb, a], axis=-1)
            u8 = (u8 * 255.0 + 0.5).astype(np.uint8)
            name = f"{split}/r_{i}"
            Image.fromarray(u8, "RGBA").save(out / f"{name}.png")

            mat = np.eye(4, dtype=np.float32)
            mat[:3, :4] = pose
            frames.append({"file_path": f"./{name}", "transform_matrix": mat.tolist()})
        doc = {"camera_angle_x": camera_angle_x, "frames": frames}
        (out / f"transforms_{split}.json").write_text(json.dumps(doc, indent=1))

    make_split("train", n_train)
    make_split("test", n_test)
    return out / "transforms_train.json", out / "transforms_test.json"
