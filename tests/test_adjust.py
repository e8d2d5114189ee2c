import numpy as np
import jax.numpy as jnp
import pytest

from vrgdg_tpu.core.params import AdjustSettings
from vrgdg_tpu.ops.adjust import apply_adjust
from oracles import adjust_oracle


def _imgs(seed=0, shape=(2, 24, 32, 3)):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, 1, shape).astype(np.float32)


FULL = {
    "temperature": 35.0, "tint": -20.0, "saturation": 25.0, "exposure": 15.0,
    "contrast": 10.0, "highlights": -30.0, "shadows": 40.0, "whites": 12.0,
    "blacks": -18.0, "sharpen": 45.0, "clarity": 60.0, "vignette": 55.0,
    "fade": 25.0,
}


def test_identity_settings_passthrough():
    imgs = _imgs()
    out = np.asarray(apply_adjust(jnp.asarray(imgs), AdjustSettings.normalize({})))
    np.testing.assert_allclose(out, imgs, atol=1e-7)


def test_disabled_passthrough():
    imgs = _imgs(seed=1)
    s = AdjustSettings.normalize(dict(FULL, enabled=False))
    out = np.asarray(apply_adjust(jnp.asarray(imgs), s))
    np.testing.assert_allclose(out, imgs, atol=1e-7)


def test_full_stack_parity():
    imgs = _imgs(seed=2)
    ours = np.asarray(apply_adjust(jnp.asarray(imgs),
                                   AdjustSettings.normalize(FULL)))
    ref = adjust_oracle(imgs, FULL)
    assert np.max(np.abs(ours - ref)) < 1e-5


@pytest.mark.parametrize("key,value", [
    ("temperature", 80.0), ("tint", -60.0), ("exposure", -40.0),
    ("contrast", 70.0), ("saturation", -50.0), ("highlights", 90.0),
    ("shadows", -90.0), ("whites", 100.0), ("blacks", 100.0),
    ("sharpen", 100.0), ("clarity", -80.0), ("vignette", 100.0),
    ("fade", 100.0),
])
def test_single_slider_parity(key, value):
    imgs = _imgs(seed=3)
    settings = {key: value}
    ours = np.asarray(apply_adjust(jnp.asarray(imgs),
                                   AdjustSettings.normalize(settings)))
    ref = adjust_oracle(imgs, settings)
    assert np.max(np.abs(ours - ref)) < 1e-5, key


def test_tiny_image_clarity_kernel_shrink():
    """Clarity blur kernel shrinks to odd(min(H,W)) and is skipped below 3
    (VRGDG_LUTVideoTools.py:352-355)."""
    imgs = _imgs(seed=4, shape=(1, 4, 5, 3))
    settings = {"clarity": 75.0, "sharpen": 30.0}
    ours = np.asarray(apply_adjust(jnp.asarray(imgs),
                                   AdjustSettings.normalize(settings)))
    ref = adjust_oracle(imgs, settings)
    assert np.max(np.abs(ours - ref)) < 1e-5

    tiny = _imgs(seed=5, shape=(1, 2, 2, 3))
    ours = np.asarray(apply_adjust(jnp.asarray(tiny),
                                   AdjustSettings.normalize(settings)))
    ref = adjust_oracle(tiny, settings)
    assert np.max(np.abs(ours - ref)) < 1e-5


def test_normalize_clamps():
    s = AdjustSettings.normalize({"temperature": 500, "vignette": -5,
                                  "sharpen": "bad", "fade": 1e9})
    assert s.temperature == 100.0
    assert s.vignette == 0.0
    assert s.sharpen == 0.0
    assert s.fade == 100.0
    assert s.enabled
