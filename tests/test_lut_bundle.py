"""Corner-bundle LUT path: must be bit-identical to the reference
eight-gather path (ops.lut.apply_lut) for arbitrary float inputs."""

import numpy as np
import jax.numpy as jnp

from vrgdg_tpu.core.cube import (LutData, build_palette_lut, corner_bundle,
                                 identity_lut)
from vrgdg_tpu.ops.grade import GradeConfig, grade
from vrgdg_tpu.core.params import LUTParams
from vrgdg_tpu.ops.lut import apply_lut, apply_lut_bundle


def _frames(seed=0, shape=(2, 12, 16, 3)):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, 1, shape).astype(np.float32)


def test_bundle_matches_reference_exactly():
    lut = build_palette_lut("#0b1d51, #1f6aa5, #f3d27a", 33)
    frames = jnp.asarray(_frames())
    bundle = jnp.asarray(corner_bundle(lut))
    exact = apply_lut(frames, lut, strength=10.0)
    fast = apply_lut_bundle(frames, bundle, strength=10.0)
    assert float(jnp.max(jnp.abs(exact - fast))) == 0.0


def test_bundle_edge_values():
    lut = build_palette_lut("red, blue, white", 17)
    bundle = jnp.asarray(corner_bundle(lut))
    edge = jnp.asarray(np.array(
        [[[[0, 0, 0], [1, 1, 1], [0.5, 1, 0], [1, 0, 1]]]], np.float32))
    exact = apply_lut(edge, lut, strength=10.0)
    fast = apply_lut_bundle(edge, bundle, strength=10.0)
    assert float(jnp.max(jnp.abs(exact - fast))) == 0.0


def test_bundle_strength_blend():
    lut = build_palette_lut("red, blue", 17)
    frames = jnp.asarray(_frames(1))
    bundle = jnp.asarray(corner_bundle(lut))
    passthrough = apply_lut_bundle(frames, bundle, strength=0.0)
    np.testing.assert_allclose(np.asarray(passthrough), np.asarray(frames),
                               atol=1e-7)
    half = apply_lut_bundle(frames, bundle, strength=5.0)
    full = apply_lut_bundle(frames, bundle, strength=10.0)
    mid = (np.asarray(passthrough) + np.asarray(full)) / 2
    np.testing.assert_allclose(np.asarray(half), mid, atol=1e-6)


def test_bundle_identity_lut():
    bundle = jnp.asarray(corner_bundle(identity_lut(33)))
    frames = jnp.asarray(_frames(2))
    out = apply_lut_bundle(frames, bundle)
    np.testing.assert_allclose(np.asarray(out), np.asarray(frames), atol=1e-6)


def test_bundle_respects_domain():
    rng = np.random.default_rng(3)
    table = rng.uniform(0, 1, (9, 9, 9, 3)).astype(np.float32)
    lut = LutData(size=9, table=table,
                  domain_min=np.full(3, 0.25, np.float32),
                  domain_max=np.full(3, 0.75, np.float32))
    frames = jnp.asarray(_frames(4))
    exact = apply_lut(frames, lut)
    fast = apply_lut_bundle(frames, jnp.asarray(corner_bundle(lut)),
                            domain_min=lut.domain_min,
                            domain_max=lut.domain_max)
    assert float(jnp.max(jnp.abs(exact - fast))) == 0.0


def test_bundle_alpha_passthrough():
    lut = build_palette_lut("teal, orange", 17)
    bundle = jnp.asarray(corner_bundle(lut))
    rgba = jnp.asarray(_frames(5, (1, 6, 8, 4)))
    out = apply_lut_bundle(rgba, bundle)
    np.testing.assert_allclose(np.asarray(out[..., 3]),
                               np.asarray(rgba[..., 3]), atol=1e-7)


def test_bundle_single_image_shape():
    lut = build_palette_lut("#336699, #ffcc00", 33)
    bundle = jnp.asarray(corner_bundle(lut))
    image = jnp.asarray(_frames(6, (10, 14, 3)))
    exact = apply_lut(image, lut, strength=8.0)
    fast = apply_lut_bundle(image, bundle, strength=8.0)
    assert float(jnp.max(jnp.abs(exact - fast))) == 0.0


def test_grade_bundle_mode_matches_reference_mode():
    lut = build_palette_lut("#336699, #ffcc00", 33)
    frames = jnp.asarray(_frames(5))
    cfg_ref = GradeConfig(lut=LUTParams.normalize(7.0), lut_mode="reference")
    cfg_bun = GradeConfig(lut=LUTParams.normalize(7.0))
    a = grade(frames, cfg_ref, lut=lut)
    b = grade(frames, cfg_bun, lut=lut)
    # identical math, but XLA may contract mul+add to FMA differently in
    # the two program shapes -> allow 1-ulp-scale drift
    assert float(jnp.max(jnp.abs(a - b))) < 1e-6
