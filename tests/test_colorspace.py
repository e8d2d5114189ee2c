import numpy as np
import jax.numpy as jnp

from vrgdg_tpu.core import colorspace as cs
from oracles import lab_to_rgb_oracle, rgb_to_lab_oracle


def test_lab_known_values():
    rgb = jnp.asarray([[1.0, 1.0, 1.0], [0.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    lab = np.asarray(cs.rgb_to_lab(rgb))
    np.testing.assert_allclose(lab[0], [100.0, 0.0, 0.0], atol=0.05)
    np.testing.assert_allclose(lab[1], [0.0, 0.0, 0.0], atol=0.05)
    # CIE Lab of sRGB red (D65): ~(53.24, 80.09, 67.20)
    np.testing.assert_allclose(lab[2], [53.24, 80.09, 67.20], atol=0.35)


def test_lab_matches_float64_oracle():
    rng = np.random.default_rng(0)
    rgb = rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32)
    ours = np.asarray(cs.rgb_to_lab(jnp.asarray(rgb)))
    ref = rgb_to_lab_oracle(rgb)
    assert np.max(np.abs(ours - ref)) < 2e-3  # LAB units (L up to 100)


def test_lab_rgb_roundtrip():
    rng = np.random.default_rng(1)
    rgb = rng.uniform(0.02, 0.98, (2, 8, 8, 3)).astype(np.float32)
    back = np.asarray(cs.lab_to_rgb(cs.rgb_to_lab(jnp.asarray(rgb))))
    assert np.max(np.abs(back - rgb)) < 1e-4


def test_lab_to_rgb_matches_oracle_out_of_gamut():
    rng = np.random.default_rng(2)
    lab = np.stack([rng.uniform(-10, 110, (64,)),
                    rng.uniform(-140, 140, (64,)),
                    rng.uniform(-140, 140, (64,))], axis=-1).astype(np.float32)
    ours = np.asarray(cs.lab_to_rgb(jnp.asarray(lab)))
    ref = lab_to_rgb_oracle(lab)
    assert np.max(np.abs(ours - ref)) < 1e-4


def test_luma():
    rgb = jnp.asarray([[0.25, 0.5, 0.75]])
    expected = 0.25 * 0.2126 + 0.5 * 0.7152 + 0.75 * 0.0722
    np.testing.assert_allclose(float(cs.rec709_luma(rgb)[0, 0]), expected,
                               rtol=1e-6)
    assert cs.rec709_luma(rgb, keepdims=False).shape == (1,)


def test_srgb_linear_roundtrip():
    x = jnp.linspace(0.0, 1.0, 101)
    y = cs.linear_to_srgb(cs.srgb_to_linear(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=5e-6)
