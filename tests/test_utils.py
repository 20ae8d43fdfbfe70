"""Tests for metrics/ensemble/window/visualisation utilities."""

import numpy as np

import jax.numpy as jnp

from gpemsr_tpu.data.windows import index_generation
from gpemsr_tpu.infer.sr import window_indices
from gpemsr_tpu.seg.visual import affinity_gallery, draw_fragments_3d, draw_raw_image
from gpemsr_tpu.utils.ensemble import flipx4_forward
from gpemsr_tpu.utils.image import read_img, save_img, tensor2img
from gpemsr_tpu.utils.metrics import calculate_psnr, calculate_ssim


def test_psnr_known_value():
    a = np.zeros((8, 8), np.uint8)
    b = np.full((8, 8), 10, np.uint8)
    # mse=100 -> 20*log10(255/10)
    assert abs(calculate_psnr(a, b) - 20 * np.log10(25.5)) < 1e-9
    assert calculate_psnr(a, a) == float("inf")


def test_ssim_identity_and_range(rng):
    img = rng.integers(0, 255, (32, 32)).astype(np.uint8)
    assert abs(calculate_ssim(img, img) - 1.0) < 1e-9
    noisy = np.clip(img.astype(int) + rng.integers(-60, 60, img.shape), 0,
                    255).astype(np.uint8)
    s = calculate_ssim(img, noisy)
    assert 0 <= s < 1.0


def test_ssim_matches_cv2_reference(rng):
    """Cross-check our scipy-based SSIM against the cv2 formulation."""
    import cv2
    img1 = rng.integers(0, 255, (24, 24)).astype(np.uint8)
    img2 = rng.integers(0, 255, (24, 24)).astype(np.uint8)

    C1, C2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    a, b = img1.astype(np.float64), img2.astype(np.float64)
    k = cv2.getGaussianKernel(11, 1.5)
    win = np.outer(k, k)
    f = lambda x: cv2.filter2D(x, -1, win)[5:-5, 5:-5]
    mu1, mu2 = f(a), f(b)
    ref = (((2 * mu1 * mu2 + C1) * (2 * (f(a * b) - mu1 * mu2) + C2)) /
           ((mu1 ** 2 + mu2 ** 2 + C1) *
            (f(a ** 2) - mu1 ** 2 + f(b ** 2) - mu2 ** 2 + C2))).mean()
    assert abs(calculate_ssim(img1, img2) - ref) < 1e-6


def test_tensor2img_roundtrip(tmp_path, rng):
    x = rng.uniform(0, 1, (1, 8, 8, 1)).astype(np.float32)
    img = tensor2img(x)
    assert img.shape == (8, 8) and img.dtype == np.uint8
    p = str(tmp_path / "t.png")
    save_img(img, p)
    back = read_img(p)
    np.testing.assert_allclose(back[..., 0], img / 255.0, atol=1e-6)


def test_window_indices_clamping():
    assert window_indices(0, 10) == [0, 0, 0, 1, 2]
    assert window_indices(1, 10) == [0, 0, 1, 2, 3]
    assert window_indices(5, 10) == [3, 4, 5, 6, 7]
    assert window_indices(9, 10) == [7, 8, 9, 9, 9]


def test_index_generation_modes():
    assert index_generation(0, 10, 5, "replicate") == [0, 0, 0, 1, 2]
    assert index_generation(0, 10, 5, "reflection") == [2, 1, 0, 1, 2]
    assert index_generation(9, 10, 5, "reflection") == [7, 8, 9, 8, 7]
    assert index_generation(5, 10, 5, "circle") == [3, 4, 5, 6, 7]


def test_flipx4_forward_flip_equivariant_model(rng):
    # for a pixelwise model the ensemble equals the plain output
    x = jnp.asarray(rng.uniform(0, 1, (1, 6, 6, 1)).astype(np.float32))
    out = flipx4_forward(lambda t: t * 2.0, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2.0, atol=1e-7)


def test_visualisation_shapes(rng):
    seg = rng.integers(0, 5, (2, 8, 8)).astype(np.uint32)
    rgb = draw_fragments_3d(seg)
    assert rgb.shape == (2, 8, 8, 3) and rgb.dtype == np.uint8
    assert (rgb[seg == 0] == 0).all()
    raw = draw_raw_image(rng.uniform(0, 255, (2, 8, 8)))
    assert raw.shape == (2, 8, 8, 3)
    affs = rng.uniform(0, 1, (3, 2, 8, 8)).astype(np.float32)
    panels = list(affinity_gallery(affs, affs))
    assert len(panels) == 2 and panels[0][1].shape == (16, 24)


def test_color_conversions(rng):
    from gpemsr_tpu.data.color import bgr2ycbcr, modcrop, rgb2ycbcr, ycbcr2rgb
    img = rng.uniform(0, 1, (8, 8, 3)).astype(np.float32)
    y = rgb2ycbcr(img, only_y=True)
    assert y.shape == (8, 8)
    full = rgb2ycbcr(img, only_y=False)
    back = ycbcr2rgb(full)
    np.testing.assert_allclose(back, img, atol=1e-4)
    np.testing.assert_allclose(bgr2ycbcr(img[..., ::-1]), y, atol=1e-6)
    assert modcrop(np.zeros((10, 13)), 4).shape == (8, 12)


def test_duf_downsample(rng):
    import jax.numpy as jnp
    from gpemsr_tpu.utils.misc import duf_downsample
    x = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 2)).astype(np.float32))
    y = duf_downsample(x, scale=4)
    assert y.shape == (1, 4, 4, 2)
    const = jnp.full((1, 16, 16, 1), 0.5)
    np.testing.assert_allclose(np.asarray(duf_downsample(const, 4)), 0.5,
                               atol=1e-5)


def test_adaptive_lr_plateau():
    from gpemsr_tpu.utils.misc import AdaptiveLR
    a = AdaptiveLR(patience=2, factor=0.5)
    assert a.step(1.0) == 1.0
    assert a.step(0.9) == 1.0    # bad 1
    assert a.step(0.8) == 0.5    # bad 2 -> decay
    assert a.step(2.0) == 0.5    # new best keeps scale
