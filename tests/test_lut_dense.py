import numpy as np
import jax.numpy as jnp

from vrgdg_tpu.core.cube import (LutData, build_palette_lut, dense_table,
                                 identity_lut)
from vrgdg_tpu.ops.grade import GradeConfig, grade
from vrgdg_tpu.core.params import LUTParams
from vrgdg_tpu.ops.lut import apply_lut, apply_lut_dense


def _u8_frames(seed=0, shape=(2, 12, 16, 3)):
    rng = np.random.default_rng(seed)
    return (rng.integers(0, 256, shape).astype(np.float32) / 255.0)


def test_dense_matches_trilinear_on_u8_inputs():
    lut = build_palette_lut("#0b1d51, #1f6aa5, #f3d27a", 33)
    frames = jnp.asarray(_u8_frames())
    dense = jnp.asarray(dense_table(lut))
    exact = apply_lut(frames, lut, strength=10.0)
    fast = apply_lut_dense(frames, dense, strength=10.0)
    assert float(jnp.max(jnp.abs(exact - fast))) < 1e-6


def test_dense_strength_blend():
    lut = build_palette_lut("red, blue", 17)
    frames = jnp.asarray(_u8_frames(1))
    dense = jnp.asarray(dense_table(lut))
    passthrough = apply_lut_dense(frames, dense, strength=0.0)
    np.testing.assert_allclose(np.asarray(passthrough), np.asarray(frames),
                               atol=1e-7)
    half = apply_lut_dense(frames, dense, strength=5.0)
    full = apply_lut_dense(frames, dense, strength=10.0)
    mid = (np.asarray(passthrough) + np.asarray(full)) / 2
    np.testing.assert_allclose(np.asarray(half), mid, atol=1e-6)


def test_dense_identity_lut():
    dense = dense_table(identity_lut(33))
    frames = jnp.asarray(_u8_frames(2))
    out = apply_lut_dense(frames, jnp.asarray(dense))
    np.testing.assert_allclose(np.asarray(out), np.asarray(frames), atol=1e-6)


def test_dense_respects_domain():
    rng = np.random.default_rng(3)
    table = rng.uniform(0, 1, (9, 9, 9, 3)).astype(np.float32)
    lut = LutData(size=9, table=table,
                  domain_min=np.full(3, 0.25, np.float32),
                  domain_max=np.full(3, 0.75, np.float32))
    frames = jnp.asarray(_u8_frames(4))
    exact = apply_lut(frames, lut)
    fast = apply_lut_dense(frames, jnp.asarray(dense_table(lut)))
    assert float(jnp.max(jnp.abs(exact - fast))) < 1e-6


def test_grade_dense_mode_matches_trilinear():
    lut = build_palette_lut("#336699, #ffcc00", 33)
    frames = jnp.asarray(_u8_frames(5))
    cfg_tri = GradeConfig(lut=LUTParams.normalize(7.0))
    cfg_dense = GradeConfig(lut=LUTParams.normalize(7.0), lut_mode="dense")
    a = grade(frames, cfg_tri, lut=lut)
    b = grade(frames, cfg_dense, lut=lut)
    assert float(jnp.max(jnp.abs(a - b))) < 1e-6
