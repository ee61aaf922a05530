"""Native C++ PNG loader vs the python (PIL) reference path."""

import numpy as np
import pytest

from ngp_tpu.native import load_images_native, load_native, png_size_native


@pytest.fixture(scope="module")
def pngs(tmp_path_factory):
    from PIL import Image

    td = tmp_path_factory.mktemp("pngs")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(4):
        img = rng.integers(0, 256, (24, 32, 4), dtype=np.uint8)
        p = td / f"img_{i}.png"
        Image.fromarray(img, "RGBA").save(p)
        paths.append(p)
    return paths


def test_native_matches_python_path(pngs):
    if load_native() is None:
        pytest.skip("native toolchain unavailable")
    assert png_size_native(pngs[0]) == (32, 24)
    out = load_images_native(pngs, 32, 24)
    assert out.shape == (4, 24, 32, 4) and out.dtype == np.float16

    from PIL import Image

    from ngp_tpu.data.nerf_synthetic import srgb_to_linear_np

    for i, p in enumerate(pngs):
        u8 = np.asarray(Image.open(p).convert("RGBA"), np.float32) / 255.0
        a = u8[..., 3:4]
        expect = np.concatenate([srgb_to_linear_np(u8[..., :3]) * a, a], axis=-1)
        np.testing.assert_allclose(out[i].astype(np.float32), expect, atol=1e-3)


def test_native_rejects_wrong_size(pngs):
    if load_native() is None:
        pytest.skip("native toolchain unavailable")
    with pytest.raises(RuntimeError):
        load_images_native(pngs, 16, 16)
