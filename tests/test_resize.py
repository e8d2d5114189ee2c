import numpy as np
import jax.numpy as jnp
import pytest

from vrgdg_tpu.ops import resize as rz
from oracles import torch_interpolate_oracle


def _imgs(seed=0, shape=(2, 24, 32, 3)):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, 1, shape).astype(np.float32)


@pytest.mark.parametrize("mode", ["nearest", "bilinear", "bicubic", "area"])
@pytest.mark.parametrize("out_hw", [(12, 16), (48, 64), (17, 23), (24, 32)])
def test_torch_interpolate_parity(mode, out_hw):
    imgs = _imgs()
    ours = np.asarray(rz.resample(jnp.asarray(imgs), out_hw[0], out_hw[1], mode))
    want = torch_interpolate_oracle(imgs, out_hw[0], out_hw[1], mode)
    assert np.max(np.abs(ours - want)) < 2e-5, (mode, out_hw)


@pytest.mark.parametrize("out_hw", [(12, 16), (48, 64), (30, 40)])
def test_lanczos4_cv2_parity(out_hw):
    cv2 = pytest.importorskip("cv2")
    imgs = _imgs(seed=1, shape=(1, 24, 32, 3))
    ours = np.asarray(rz.resample(jnp.asarray(imgs), out_hw[0], out_hw[1],
                                  "lanczos4"))
    want = cv2.resize(imgs[0], (out_hw[1], out_hw[0]),
                      interpolation=cv2.INTER_LANCZOS4)
    assert np.max(np.abs(ours[0] - want)) < 1e-3, out_hw


def test_fit_modes_shapes():
    imgs = jnp.asarray(_imgs(seed=2, shape=(1, 20, 40, 3)))
    for fit in ("stretch", "crop", "letterbox"):
        out = rz.resize_batch(imgs, 30, 30, fit, "bilinear")
        assert out.shape == (1, 30, 30, 3), fit


def test_letterbox_pads_with_zeros_centered():
    imgs = jnp.ones((1, 10, 40, 3), jnp.float32)
    out = np.asarray(rz.resize_batch(imgs, 40, 40, "letterbox", "bilinear"))
    # content is 40x10 centered vertically: rows 15..24
    assert np.allclose(out[0, :15], 0.0)
    assert np.allclose(out[0, 25:], 0.0)
    assert np.allclose(out[0, 15:25], 1.0, atol=1e-5)


def test_crop_to_fill_centers():
    imgs = jnp.asarray(_imgs(seed=3, shape=(1, 20, 40, 3)))
    out = rz.resize_batch(imgs, 20, 20, "crop", "bilinear")
    # scale = max(20/40, 20/20) = 1 -> center-crop width 40 -> 20
    want = np.asarray(imgs)[:, :, 10:30, :]
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)


def test_restore_letterbox_inverse():
    imgs = jnp.asarray(_imgs(seed=4, shape=(1, 36, 64, 3)))
    boxed = rz.resize_batch(imgs, 96, 96, "letterbox", "bilinear")
    restored = rz.restore_batch(boxed, 64, 36, "letterbox", "bilinear")
    assert restored.shape == (1, 36, 64, 3)
    # smooth content survives the round trip approximately
    smooth = jnp.asarray(np.tile(np.linspace(0, 1, 64, dtype=np.float32)
                                 .reshape(1, 1, 64, 1), (1, 36, 1, 3)))
    boxed = rz.resize_batch(smooth, 96, 96, "letterbox", "bilinear")
    restored = rz.restore_batch(boxed, 64, 36, "letterbox", "bilinear")
    assert np.max(np.abs(np.asarray(restored) - np.asarray(smooth))) < 0.02


def test_restore_stretch():
    imgs = jnp.asarray(_imgs(seed=5, shape=(1, 16, 16, 3)))
    up = rz.resize_batch(imgs, 33, 21, "stretch", "bicubic")
    back = rz.restore_batch(up, 16, 16, "stretch", "bicubic")
    assert back.shape == (1, 16, 16, 3)


def test_reference_ui_strings_accepted():
    imgs = jnp.asarray(_imgs(seed=6, shape=(1, 8, 8, 3)))
    out = rz.resize_batch(imgs, 12, 12, "Fit with letterbox (preserve all)",
                          "Bicubic (recommended)")
    assert out.shape == (1, 12, 12, 3)
    with pytest.raises(ValueError):
        rz.resize_batch(imgs, 12, 12, "bogus", "bicubic")
    with pytest.raises(ValueError):
        rz.resample(imgs, 12, 12, "bogus")


def test_rgba_drops_to_rgb():
    imgs = jnp.asarray(_imgs(seed=7, shape=(1, 8, 8, 4)))
    out = rz.resize_batch(imgs, 12, 12, "stretch", "bilinear")
    assert out.shape == (1, 12, 12, 3)
