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
    """Qualitative sanity vs structural expectations (win 7)."""
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


def test_ssim_golden_analytic_values():
    """GOLDEN fixtures: exact SSIM values derived in closed form from
    the published skimage structural_similarity algorithm (win_size=7
    uniform filter, sample-covariance norm N/(N-1) with N=49,
    C1=(0.01*L)^2, C2=(0.03*L)^2, SSIM map cropped by win//2 before
    averaging). Interior windows are boundary-mode independent, so
    these numbers pin the implementation to 1e-9 — any drift in
    cov_norm, the C constants, or the crop fails this test.

    Derivations (L=255, C1=6.5025, C2=58.5225):
    * constant 100 vs constant 110: every window has zero variance, so
      S = (2*100*110 + C1) / (100^2 + 110^2 + C1).
    * 16x16 constant 100 with one center pixel at 180 (d=80) vs
      constant 100: the 49 windows containing the pixel share
      ux = 100 + d/49, vx = (49/48)(uxx - ux^2), cov = 0; the other
      10*10-49 = 51 cropped-map windows are identical -> S=1.
    * 16x16 checkerboard {0,200} vs its inversion: every window has
      (24, 25) or (25, 24) pixels at 200 and E[xy] = 0; S is symmetric
      under the swap so the map is constant.
    """
    # constant offset
    x = np.full((16, 16), 100, np.uint8)
    y = np.full((16, 16), 110, np.uint8)
    assert abs(ssim(x, y) - 0.9954764440915066) < 1e-9

    # single-pixel delta (exercises the crop: 49 of 100 map entries)
    x2 = np.full((16, 16), 100, np.uint8)
    x2[8, 8] = 180
    y2 = np.full((16, 16), 100, np.uint8)
    assert abs(ssim(x2, y2) - 0.6615970332627156) < 1e-9

    # checkerboard vs inverted (nonzero variance, negative covariance)
    ii, jj = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    cb = (((ii + jj) % 2) * 200).astype(np.uint8)
    assert abs(ssim(cb, 200 - cb) - (-0.9934535854621732)) < 1e-9

    # float path with explicit data_range=1.0
    xf = np.full((16, 16), 100 / 255.0)
    yf = np.full((16, 16), 110 / 255.0)
    c1 = (0.01) ** 2
    expect = (2 * (100 / 255.0) * (110 / 255.0) + c1) / (
        (100 / 255.0) ** 2 + (110 / 255.0) ** 2 + c1)
    assert abs(ssim(xf, yf, data_range=1.0) - expect) < 1e-9

    # channel_axis path: per-channel means averaged
    x3 = np.stack([x, x2, cb], axis=2)
    y3 = np.stack([y, y2, 200 - cb], axis=2)
    expect3 = np.mean([0.9954764440915066, 0.6615970332627156,
                       -0.9934535854621732])
    assert abs(ssim(x3, y3, channel_axis=2) - expect3) < 1e-9
