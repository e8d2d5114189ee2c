import numpy as np
import jax.numpy as jnp

from vrgdg_tpu.core.cube import LutData, build_palette_lut, identity_lut
from vrgdg_tpu.ops.lut import apply_lut, lut_identity_error
from oracles import lut_apply_oracle


def _rand_imgs(shape=(2, 9, 11, 3), seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, 1, shape).astype(np.float32)


def test_identity_lut_is_identity():
    assert lut_identity_error(identity_lut(33)) < 1e-6


def test_parity_random_lut():
    rng = np.random.default_rng(1)
    table = rng.uniform(0, 1, (17, 17, 17, 3)).astype(np.float32)
    imgs = _rand_imgs()
    ours = np.asarray(apply_lut(jnp.asarray(imgs), table))
    ref = lut_apply_oracle(imgs, table)
    assert np.max(np.abs(ours - ref)) < 1e-5


def test_parity_palette_lut_with_strength():
    lut = build_palette_lut("#0b1d51, #1f6aa5, #f3d27a", 33)
    imgs = _rand_imgs(seed=2)
    for strength in (0.0, 3.7, 10.0):
        ours = np.asarray(apply_lut(jnp.asarray(imgs), lut, strength=strength))
        ref = lut_apply_oracle(imgs, lut.table, strength=strength)
        assert np.max(np.abs(ours - ref)) < 1e-5, strength


def test_strength_zero_is_passthrough():
    lut = build_palette_lut("red, blue", 16)
    imgs = _rand_imgs(seed=3)
    out = np.asarray(apply_lut(jnp.asarray(imgs), lut, strength=0.0))
    np.testing.assert_allclose(out, imgs, atol=1e-7)


def test_domain_min_max():
    rng = np.random.default_rng(4)
    table = rng.uniform(0, 1, (9, 9, 9, 3)).astype(np.float32)
    lut = LutData(size=9, table=table,
                  domain_min=np.full(3, 0.2, np.float32),
                  domain_max=np.full(3, 0.8, np.float32))
    imgs = _rand_imgs(seed=5)
    ours = np.asarray(apply_lut(jnp.asarray(imgs), lut))
    ref = lut_apply_oracle(imgs, table, domain_min=(0.2,) * 3,
                           domain_max=(0.8,) * 3)
    assert np.max(np.abs(ours - ref)) < 1e-5


def test_alpha_passthrough():
    lut = build_palette_lut("teal", 8)
    rgba = _rand_imgs((2, 6, 6, 4), seed=6)
    out = np.asarray(apply_lut(jnp.asarray(rgba), lut))
    np.testing.assert_allclose(out[..., 3], rgba[..., 3], atol=1e-7)
    ref = lut_apply_oracle(rgba, lut.table)
    assert np.max(np.abs(out - ref)) < 1e-5


def test_exact_lattice_points():
    """Pixels exactly on lattice points return the table entry."""
    lut = build_palette_lut("#336699, #ffcc00", 5)
    vals = np.linspace(0, 1, 5, dtype=np.float32)
    img = np.zeros((1, 5, 1, 3), np.float32)
    img[0, :, 0, 0] = vals  # red axis
    out = np.asarray(apply_lut(jnp.asarray(img), lut))
    np.testing.assert_allclose(out[0, :, 0], lut.table[0, 0, :], atol=1e-6)
