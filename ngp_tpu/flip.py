"""LDR-FLIP perceptual image difference (Andersson et al. 2020, JCGT).

Reimplementation from the published algorithm (the reference vendors
NVIDIA's numpy implementation at experiment/nerf_synthetic/python/flip/;
this is an independent rebuild of the same pipeline):

 1. sRGB -> linear -> XYZ -> YCxCz opponent space.
 2. Per-channel CSF spatial filtering (sum-of-Gaussians kernels in the
    spatial domain, parameterized by pixels-per-degree).
 3. Color difference: filtered colors -> clamped linear RGB -> L*a*b* ->
    Hunt adjustment -> HyAB distance -> perceptual redistribution.
 4. Feature difference: edge/point (1st/2nd Gaussian derivative) detector
    magnitudes on achromatic luminance; max of |edge diff|, |point diff|.
 5. Per-pixel FLIP = dE_color ^ (1 - dE_feature); score = mean.

Inputs are sRGB images in [0,1], shape (H, W, 3). `ppd` defaults to the
standard observer (0.7 m at 3840x2160 over 0.7 m wide -> ~67 ppd).
"""

import numpy as np

_QC, _QF = 0.7, 0.5
_PC, _PT = 0.4, 0.95


def _srgb_to_linear(x):
    return np.where(x <= 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)


_RGB2XYZ = np.array(
    [
        [0.41238656, 0.35759149, 0.18045049],
        [0.21263682, 0.71518298, 0.0721802],
        [0.01933062, 0.11919716, 0.95037259],
    ]
)
_D65 = np.array([0.950428545, 1.0, 1.088900371])


def _linear_rgb_to_xyz(rgb):
    return rgb @ _RGB2XYZ.T


def _xyz_to_ycxcz(xyz):
    n = xyz / _D65
    y = 116.0 * n[..., 1] - 16.0
    cx = 500.0 * (n[..., 0] - n[..., 1])
    cz = 200.0 * (n[..., 1] - n[..., 2])
    return np.stack([y, cx, cz], axis=-1)


def _ycxcz_to_xyz(ycxcz):
    yy = (ycxcz[..., 0] + 16.0) / 116.0
    x = ycxcz[..., 1] / 500.0 + yy
    z = yy - ycxcz[..., 2] / 200.0
    return np.stack([x, yy, z], axis=-1) * _D65


def _xyz_to_linear_rgb(xyz):
    return xyz @ np.linalg.inv(_RGB2XYZ).T


def _xyz_to_lab(xyz):
    n = xyz / _D65
    delta = 6.0 / 29.0
    f = np.where(n > delta**3, np.cbrt(np.maximum(n, 1e-12)), n / (3 * delta * delta) + 4.0 / 29.0)
    l = 116.0 * f[..., 1] - 16.0
    a = 500.0 * (f[..., 0] - f[..., 1])
    b = 200.0 * (f[..., 1] - f[..., 2])
    return np.stack([l, a, b], axis=-1)


def _hunt(lab):
    """Hunt adjustment: scale chroma by luminance."""
    l = lab[..., 0]
    return np.stack([l, 0.01 * l * lab[..., 1], 0.01 * l * lab[..., 2]], axis=-1)


def _hyab(a, b):
    d = a - b
    return np.abs(d[..., 0]) + np.sqrt(d[..., 1] ** 2 + d[..., 2] ** 2)


def _conv2_same(img, kernel):
    """FFT 'same' convolution with edge-replicate padding, per channel."""
    kh, kw = kernel.shape
    ph, pw = kh // 2, kw // 2
    x = np.pad(img, ((ph, ph), (pw, pw)), mode="edge")
    out = np.fft.irfft2(np.fft.rfft2(x) * np.fft.rfft2(kernel, x.shape), x.shape)
    # kernel centered: shift back by half kernel
    return out[kh - 1 : kh - 1 + img.shape[0], kw - 1 : kw - 1 + img.shape[1]]


def _csf_kernel(a1, b1, a2, b2, ppd):
    """Spatial-domain sum-of-Gaussians CSF kernel, normalized to sum 1."""
    # width from the widest Gaussian of the pipeline (b=0.04)
    radius = int(np.ceil(3.0 * np.sqrt(0.04 / (2.0 * np.pi**2)) * ppd))
    ax = np.arange(-radius, radius + 1) / ppd
    d2 = ax[:, None] ** 2 + ax[None, :] ** 2
    g = a1 * np.sqrt(np.pi / b1) * np.exp(-(np.pi**2) * d2 / b1)
    if a2 > 0:
        g = g + a2 * np.sqrt(np.pi / b2) * np.exp(-(np.pi**2) * d2 / b2)
    return g / g.sum()


def _feature_kernels(ppd):
    """(edge_x, point_x) 1st/2nd Gaussian-derivative kernels."""
    w = 0.082
    sd = 0.5 * w * ppd
    radius = int(np.ceil(3 * sd))
    ax = np.arange(-radius, radius + 1, dtype=np.float64)
    x, y = np.meshgrid(ax, ax)
    g = np.exp(-(x**2 + y**2) / (2 * sd * sd))
    edge = -x * g
    point = (x * x / (sd * sd) - 1.0) * g
    # normalize positive and negative lobes separately (official practice)
    def norm(k):
        pos = k[k > 0].sum()
        neg = -k[k < 0].sum()
        out = k.copy()
        if pos > 0:
            out[k > 0] /= pos
        if neg > 0:
            out[k < 0] /= neg
        return out

    return norm(edge), norm(point)


def flip_error_map(reference, test, ppd: float = 67.02064):
    """Per-pixel LDR-FLIP in [0,1]; inputs sRGB (H, W, 3) in [0,1]."""
    ref = np.asarray(reference, np.float64)
    tst = np.asarray(test, np.float64)

    ycc_r = _xyz_to_ycxcz(_linear_rgb_to_xyz(_srgb_to_linear(ref)))
    ycc_t = _xyz_to_ycxcz(_linear_rgb_to_xyz(_srgb_to_linear(tst)))

    # ------------------------------------------------ color pipeline
    csf = {
        0: _csf_kernel(1.0, 0.0047, 0.0, 1e-5, ppd),  # achromatic
        1: _csf_kernel(1.0, 0.0053, 0.0, 1e-5, ppd),  # red-green
        2: _csf_kernel(34.1, 0.04, 13.5, 0.025, ppd),  # blue-yellow
    }

    def filter_ycc(ycc):
        out = np.stack([_conv2_same(ycc[..., c], csf[c]) for c in range(3)], axis=-1)
        rgb = np.clip(_xyz_to_linear_rgb(_ycxcz_to_xyz(out)), 0.0, 1.0)
        return _hunt(_xyz_to_lab(_linear_rgb_to_xyz(rgb)))

    hunt_r = filter_ycc(ycc_r)
    hunt_t = filter_ycc(ycc_t)
    de = _hyab(hunt_r, hunt_t) ** _QC

    green = _hunt(_xyz_to_lab(_linear_rgb_to_xyz(np.array([[0.0, 1.0, 0.0]]))))
    blue = _hunt(_xyz_to_lab(_linear_rgb_to_xyz(np.array([[0.0, 0.0, 1.0]]))))
    cmax = float((_hyab(green, blue) ** _QC)[0])
    de_c = np.where(
        de < _PC * cmax,
        (_PT / (_PC * cmax)) * de,
        _PT + ((de - _PC * cmax) / (cmax * (1.0 - _PC))) * (1.0 - _PT),
    )

    # ---------------------------------------------- feature pipeline
    edge_x, point_x = _feature_kernels(ppd)
    ya_r = (ycc_r[..., 0] + 16.0) / 116.0
    ya_t = (ycc_t[..., 0] + 16.0) / 116.0

    def features(ya):
        ex = _conv2_same(ya, edge_x)
        ey = _conv2_same(ya, edge_x.T)
        px = _conv2_same(ya, point_x)
        py = _conv2_same(ya, point_x.T)
        return np.sqrt(ex**2 + ey**2), np.sqrt(px**2 + py**2)

    e_r, p_r = features(ya_r)
    e_t, p_t = features(ya_t)
    de_f = np.clip(
        (np.maximum(np.abs(e_r - e_t), np.abs(p_r - p_t)) / np.sqrt(2.0)) ** _QF, 0.0, 1.0
    )

    return np.clip(de_c, 0.0, 1.0) ** (1.0 - de_f)


def flip(reference, test, ppd: float = 67.02064) -> float:
    """Mean LDR-FLIP score (lower is better; 0 for identical images)."""
    return float(np.mean(flip_error_map(reference, test, ppd)))
