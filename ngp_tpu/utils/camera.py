"""Camera math: fov/focal conversions, pose conventions, pixel->ray.

Behavioral parity targets:
 * fov<->focal:      reference internal/utils/common_device.h:106-120
 * OpenGL->OpenCV:   reference internal/utils/common_device.cu:16-30
                     (negate cols 1,2; translate/scale col 3; cycle rows xyz<-yzx)
 * pixel_to_ray:     reference internal/utils/common_device.h:130-152
"""

import jax.numpy as jnp
import numpy as np


def fov_to_focal_length(resolution, rad):
    """0.5 * resolution / tan(0.5 * rad). Works on scalars or arrays."""
    return 0.5 * jnp.asarray(resolution, jnp.float32) / jnp.tan(0.5 * jnp.asarray(rad, jnp.float32))


def focal_length_to_fov(resolution, focal_length):
    """Returns the field of view in *degrees* (matches reference)."""
    return 2.0 * 180.0 / np.pi * jnp.arctan(jnp.asarray(resolution, jnp.float32) / (jnp.asarray(focal_length, jnp.float32) * 2.0))


def opengl_to_opencv(pose, scale, offset):
    """Convert a (..., 3, 4) OpenGL camera-to-world pose to the scene convention.

    Negates the Y/Z basis columns, applies `t = t*scale + offset`, then cycles
    the world axes xyz <- yzx (row permutation [1, 2, 0]).
    Reference: common_device.cu:16-30 (spec_opengl_to_opencv).
    """
    pose = jnp.asarray(pose, jnp.float32)
    offset = jnp.asarray(offset, jnp.float32)
    flip = jnp.array([1.0, -1.0, -1.0], jnp.float32)
    rot = pose[..., :3] * flip  # negate columns 1 and 2
    t = pose[..., 3] * scale + offset
    out = jnp.concatenate([rot, t[..., None]], axis=-1)
    return out[..., jnp.array([1, 2, 0]), :]


def _so3_log(rot):
    """Rotation matrix (3,3) -> axis-angle vector (numpy)."""
    cos = np.clip((np.trace(rot) - 1.0) / 2.0, -1.0, 1.0)
    theta = np.arccos(cos)
    if theta < 1e-8:
        return np.zeros(3)
    w = (
        np.array([rot[2, 1] - rot[1, 2], rot[0, 2] - rot[2, 0], rot[1, 0] - rot[0, 1]])
        * theta
        / (2.0 * np.sin(theta))
    )
    return w


def _so3_exp(w):
    theta = np.linalg.norm(w)
    k = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    if theta < 1e-8:
        return np.eye(3) + k
    return np.eye(3) + np.sin(theta) / theta * k + (1 - np.cos(theta)) / theta**2 * (k @ k)


def log_space_lerp(begin, end, t: float):
    """Rigid-pose interpolation in SE(3) log space.

    Parity with reference `log_space_lerp` (common_device.cu:32-41), which
    takes the 4x4 matrix log of (end @ begin^-1) — for rigid camera poses
    that equals the closed-form SE(3) log used here. Unused by the NeRF
    pipeline (SURVEY notes it vestigial), provided for API completeness.
    begin/end: (3, 4) camera-to-world; returns (3, 4).
    """
    begin = np.asarray(begin, np.float64)
    end = np.asarray(end, np.float64)
    a = np.eye(4)
    a[:3, :4] = begin
    b = np.eye(4)
    b[:3, :4] = end
    m = b @ np.linalg.inv(a)

    w = _so3_log(m[:3, :3])
    theta = np.linalg.norm(w)
    k = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    if theta < 1e-8:
        v_inv = np.eye(3) - 0.5 * k
    else:
        v_inv = (
            np.eye(3)
            - 0.5 * k
            + (1.0 / theta**2 - (1.0 + np.cos(theta)) / (2.0 * theta * np.sin(theta))) * (k @ k)
        )
    u = v_inv @ m[:3, 3]

    wt, ut = w * t, u * t
    rot = _so3_exp(wt)
    theta_t = np.linalg.norm(wt)
    kt = np.array([[0, -wt[2], wt[1]], [wt[2], 0, -wt[0]], [-wt[1], wt[0], 0]])
    if theta_t < 1e-8:
        v = np.eye(3) + 0.5 * kt
    else:
        v = (
            np.eye(3)
            + (1 - np.cos(theta_t)) / theta_t**2 * kt
            + (theta_t - np.sin(theta_t)) / theta_t**3 * (kt @ kt)
        )
    mt = np.eye(4)
    mt[:3, :3] = rot
    mt[:3, 3] = v @ ut
    out = mt @ a
    return out[:3, :4].astype(np.float32)


def pixel_to_rays(xy, resolution, focal_length, principal_point, camera_matrix):
    """Rays for normalized pixel coords `xy` in [0,1]^2, shape (..., 2).

    Returns (origins, directions): origins broadcast from camera_matrix[:, 3],
    dirs normalized. Reference: common_device.h:130-152 (pixel_to_ray).
    """
    xy = jnp.asarray(xy, jnp.float32)
    resolution = jnp.asarray(resolution, jnp.float32)
    focal_length = jnp.asarray(focal_length, jnp.float32)
    principal_point = jnp.asarray(principal_point, jnp.float32)

    d_cam = jnp.stack(
        [
            (xy[..., 0] - principal_point[0]) * resolution[0] / focal_length[0],
            (xy[..., 1] - principal_point[1]) * resolution[1] / focal_length[1],
            jnp.ones_like(xy[..., 0]),
        ],
        axis=-1,
    )
    rot = camera_matrix[:, :3]
    d = d_cam @ rot.T
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(camera_matrix[:, 3], d.shape)
    return o, d
