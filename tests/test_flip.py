"""Behavioral tests for the LDR-FLIP reimplementation."""

import numpy as np

from ngp_tpu.flip import flip, flip_error_map


def _img(seed, h=64, w=64):
    return np.random.default_rng(seed).uniform(0, 1, (h, w, 3))


def test_identical_images_zero():
    a = _img(0)
    assert flip(a, a) < 1e-6


def test_range_and_monotonicity():
    a = _img(1)
    small = np.clip(a + 0.02, 0, 1)
    big = np.clip(a + 0.3, 0, 1)
    m_small = flip(a, small)
    m_big = flip(a, big)
    assert 0.0 <= m_small <= m_big <= 1.0
    em = flip_error_map(a, big)
    assert em.shape == a.shape[:2]
    assert ((em >= 0) & (em <= 1)).all()


def test_black_vs_white_large():
    black = np.zeros((32, 32, 3))
    white = np.ones((32, 32, 3))
    assert flip(black, white) > 0.5


def test_feature_sensitivity():
    """An edge shift scores worse than a uniform tiny offset of equal MSE."""
    base = np.zeros((64, 64, 3))
    base[:, 32:] = 1.0
    shifted = np.zeros((64, 64, 3))
    shifted[:, 34:] = 1.0
    mse_shift = float(np.mean((base - shifted) ** 2))
    flat = np.clip(base + np.sqrt(mse_shift), 0, 1)
    assert flip(base, shifted) > 0
    # both nonzero; per-pixel max error localized at the edge
    em = flip_error_map(base, shifted)
    assert em[:, 30:36].mean() > em[:, :16].mean()
