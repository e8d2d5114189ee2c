import numpy as np
import jax.numpy as jnp
import pytest

from vrgdg_tpu.ops.paste_back import (ellipse_composite, gaussian_blur,
                                      mean_shift_color_match, paste_back,
                                      radial_face_composite, soft_blend_mask,
                                      soft_ellipse_mask)


def test_soft_blend_mask_rect_matches_oracle():
    """Distance-field rect mask (VRGDG_ImagePasteBack.py:11-30)."""
    h, w, inset, feather = 20, 30, 3, 5
    mask = np.asarray(soft_blend_mask(h, w, inset, feather, "rectangle"))
    yy = np.arange(h).reshape(h, 1).astype(np.float64)
    xx = np.arange(w).reshape(1, w).astype(np.float64)
    dist = np.minimum(np.minimum(xx - inset, (w - 1 - inset) - xx),
                      np.minimum(yy - inset, (h - 1 - inset) - yy))
    want = np.clip(dist / feather, 0, 1)
    np.testing.assert_allclose(mask, want, atol=1e-6)


def test_soft_blend_mask_ellipse_properties():
    mask = np.asarray(soft_blend_mask(40, 40, 4, 6, "ellipse"))
    assert mask[20, 20] == 1.0          # center fully opaque
    assert mask[0, 0] == 0.0            # corner fully transparent
    assert 0.0 <= mask.min() and mask.max() <= 1.0
    hard = np.asarray(soft_blend_mask(40, 40, 4, 0, "ellipse"))
    assert set(np.unique(hard)).issubset({0.0, 1.0})  # binary when feather=0


def test_mean_shift_color_match():
    src = jnp.full((10, 10, 3), 0.2)
    dst = jnp.full((10, 10, 3), 0.6)
    alpha = jnp.ones((10, 10, 1))
    out = np.asarray(mean_shift_color_match(src, dst, alpha, 1.0))
    np.testing.assert_allclose(out, 0.6, atol=1e-6)
    half = np.asarray(mean_shift_color_match(src, dst, alpha, 0.5))
    np.testing.assert_allclose(half, 0.4, atol=1e-6)
    # too few selected pixels -> no-op
    tiny_alpha = jnp.zeros((10, 10, 1)).at[0, 0, 0].set(1.0)
    out = np.asarray(mean_shift_color_match(src, dst, tiny_alpha, 1.0))
    np.testing.assert_allclose(out, 0.2, atol=1e-6)
    # strength 0 -> no-op
    out = np.asarray(mean_shift_color_match(src, dst, alpha, 0.0))
    np.testing.assert_allclose(out, 0.2, atol=1e-6)


def test_paste_back_composites_centre():
    rng = np.random.default_rng(0)
    original = jnp.asarray(rng.uniform(0, 1, (1, 40, 40, 3)).astype(np.float32))
    crop = jnp.zeros((1, 16, 16, 3), jnp.float32)  # black crop
    crop_data = ((16, 16), (12, 12, 28, 28))
    out, mask = paste_back(original, crop, crop_data, inset_padding=2,
                           feather_strength=4, blend_shape="ellipse",
                           color_match=0.0)
    out, mask = np.asarray(out), np.asarray(mask)
    assert out.shape == original.shape and mask.shape == (1, 40, 40)
    # center of the paste region is fully the (black) crop
    np.testing.assert_allclose(out[0, 20, 20], 0.0, atol=1e-6)
    assert mask[0, 20, 20] == 1.0
    # outside the crop rect untouched
    np.testing.assert_allclose(out[0, :12], np.asarray(original)[0, :12],
                               atol=1e-6)
    assert mask[0, 5, 5] == 0.0


def test_paste_back_with_user_mask():
    original = jnp.full((1, 20, 20, 3), 0.5, jnp.float32)
    crop = jnp.ones((1, 10, 10, 3), jnp.float32)
    crop_data = ((10, 10), (5, 5, 15, 15))
    user_mask = jnp.zeros((1, 10, 10), jnp.float32)  # suppress everything
    out, mask = paste_back(original, crop, crop_data, 0, 0, "rectangle",
                           0.0, mask=user_mask)
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mask), 0.0, atol=1e-6)


def test_paste_back_rejects_bad_crop_data():
    img = jnp.zeros((1, 8, 8, 3))
    with pytest.raises(ValueError):
        paste_back(img, img, None)
    with pytest.raises(ValueError):
        paste_back(img, img, ((4, 4), (5, 5, 5, 5)))  # zero-size box


def test_radial_face_composite():
    rng = np.random.default_rng(1)
    originals = jnp.asarray(rng.uniform(0, 1, (4, 32, 32, 3)).astype(np.float32))
    faces = jnp.ones((3, 16, 16, 3), jnp.float32)  # LTX dropped 1 frame
    entries = [
        {"box": (8, 8, 24, 24), "strength": 1.0},
        {"box": None, "strength": 1.0},            # no-face frame untouched
        {"box": (0, 0, 16, 16), "strength": 0.0},  # zero strength untouched
        {"box": (8, 8, 24, 24), "strength": 1.0},  # beyond LTX frames
    ]
    out, masks, repaired = radial_face_composite(faces, originals, entries,
                                                 feather_pixels=4,
                                                 color_match=0.0)
    out = np.asarray(out)
    assert repaired == 1
    # even-sized grids have no exact radial center; alpha at (16,16) is
    # ~0.9, so the blend must be strongly toward the white face
    assert np.all(out[0, 16, 16] > 0.9)
    np.testing.assert_allclose(out[1], np.asarray(originals)[1], atol=1e-7)
    np.testing.assert_allclose(out[2], np.asarray(originals)[2], atol=1e-7)
    np.testing.assert_allclose(out[3], np.asarray(originals)[3], atol=1e-7)
    assert np.asarray(masks)[0].max() > 0.85


def test_radial_composite_tolerance():
    originals = jnp.zeros((10, 8, 8, 3))
    faces = jnp.zeros((2, 4, 4, 3))
    entries = [{"box": None, "strength": 0.0}] * 10
    with pytest.raises(ValueError):
        radial_face_composite(faces, originals, entries)


def test_gaussian_blur_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 1, (31, 37)).astype(np.float32)
    ours = np.asarray(gaussian_blur(jnp.asarray(img), 9, 2.0))
    want = cv2.GaussianBlur(img, (9, 9), 2.0)
    assert np.max(np.abs(ours - want)) < 1e-5


def test_soft_ellipse_mask_close_to_cv2():
    cv2 = pytest.importorskip("cv2")
    w, h, feather = 48, 40, 6
    ours = np.asarray(soft_ellipse_mask(w, h, feather))
    mask = np.zeros((h, w), np.float32)
    inset = max(2, int(round(min(w, h) * 0.035)))
    axes = (max(1, w // 2 - inset), max(1, h // 2 - inset))
    cv2.ellipse(mask, (w // 2, h // 2), axes, 0, 0, 360, 1.0, -1)
    kernel = max(3, feather * 4 + 1)
    want = cv2.GaussianBlur(mask, (kernel, kernel), feather).clip(0, 1)
    # analytic ellipse vs cv2 rasterization: tiny boundary differences
    assert np.mean(np.abs(ours - want)) < 0.02
    assert np.max(np.abs(ours - want)) < 0.35


def test_ellipse_composite_blends():
    original = jnp.full((1, 32, 32, 3), 0.2, jnp.float32)[0]
    enhanced = jnp.ones((16, 16, 3), jnp.float32)
    out = np.asarray(ellipse_composite(original, enhanced, (8, 8, 24, 24),
                                       feather=2, color_match=0.0,
                                       composite_strength=1.0))
    assert out[16, 16, 0] > 0.9   # center repainted
    np.testing.assert_allclose(out[0, 0], 0.2, atol=1e-6)  # corner untouched
    faded = np.asarray(ellipse_composite(original, enhanced, (8, 8, 24, 24),
                                         feather=2, color_match=0.0,
                                         composite_strength=0.5))
    assert abs(faded[16, 16, 0] - (0.2 * 0.5 + 1.0 * 0.5)) < 0.05
