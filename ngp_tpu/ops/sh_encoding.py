"""Spherical-harmonics direction encoding (degree <= 4), pure jnp.

TPU-native equivalent of tiny-cuda-nn's `SphericalHarmonics` encoding
(created at reference ngp_network.h:165 from base.json:30-32, degree 4).
Input is the *warped* direction in [0,1]^3 (common_device.h:375-377); like
tcnn, we remap to [-1,1] internally and do NOT renormalize. Output is
degree^2 coefficients (16 for degree 4) of the real SH basis, using the
standard hardcoded polynomial constants.
"""

import jax.numpy as jnp


def sh_encode(warped_dir, degree: int = 4):
    """warped_dir: (..., 3) in [0,1] -> (..., degree**2)."""
    if not 1 <= degree <= 4:
        raise ValueError(f"SH degree must be in [1,4], got {degree}")
    d = warped_dir * 2.0 - 1.0
    x, y, z = d[..., 0], d[..., 1], d[..., 2]

    xy, xz, yz = x * y, x * z, y * z
    x2, y2, z2 = x * x, y * y, z * z

    out = [jnp.full_like(x, 0.28209479177387814)]
    if degree >= 2:
        out += [
            -0.48860251190291987 * y,
            0.48860251190291992 * z,
            -0.48860251190291987 * x,
        ]
    if degree >= 3:
        out += [
            1.0925484305920792 * xy,
            -1.0925484305920792 * yz,
            0.94617469575755997 * z2 - 0.31539156525251999,
            -1.0925484305920792 * xz,
            0.54627421529603959 * (x2 - y2),
        ]
    if degree >= 4:
        out += [
            0.59004358992664352 * y * (-3.0 * x2 + y2),
            2.8906114426405538 * xy * z,
            0.45704579946446572 * y * (1.0 - 5.0 * z2),
            0.3731763325901154 * z * (5.0 * z2 - 3.0),
            0.45704579946446572 * x * (1.0 - 5.0 * z2),
            1.4453057213202769 * z * (x2 - y2),
            0.59004358992664352 * x * (-x2 + 3.0 * y2),
        ]
    return jnp.stack(out, axis=-1)
