"""Pallas grain kernel tests.

The Pallas TPU interpreter stubs ``prng_random_bits`` to zeros, so on the
CPU test mesh only the plumbing (shapes, blending, alpha passthrough,
padding) is checked here.  The noise-stream properties (distribution,
determinism, batch-boundary invariance) are the ``@skipif`` tests below;
the pytest conftest forces the CPU platform, so on a TPU host run them via
``python tests/tpu_checks.py``, which executes the same checks on the real
chip.
"""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from vrgdg_tpu.kernels.grain_pallas import film_grain_pallas

ON_TPU = jax.default_backend() == "tpu"


def test_shapes_and_padding():
    frames = jnp.full((2, 30, 50, 3), 0.5, jnp.float32)  # odd sizes -> pad
    out = film_grain_pallas(frames, 0.1, 0.5, seed=11)
    assert out.shape == frames.shape
    assert out.dtype == frames.dtype


def test_intensity_zero_passthrough():
    frames = jnp.full((1, 16, 128, 3), 0.4, jnp.float32)
    out = film_grain_pallas(frames, 0.0, 0.5, seed=1)
    np.testing.assert_allclose(np.asarray(out), 0.4, atol=1e-7)


def test_alpha_passthrough():
    rgba = jnp.concatenate([jnp.full((1, 16, 128, 3), 0.4),
                            jnp.full((1, 16, 128, 1), 0.9)], axis=-1)
    out = film_grain_pallas(rgba, 0.2, 0.5, seed=1)
    np.testing.assert_allclose(np.asarray(out)[..., 3], 0.9, atol=1e-7)


def test_output_clamped():
    frames = jnp.full((1, 16, 128, 3), 0.99, jnp.float32)
    out = np.asarray(film_grain_pallas(frames, 1.0, 1.0, seed=2))
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_grade_grain_mode_pallas_plumbing():
    """grain_mode="pallas" is selectable from GradeConfig; on the CPU
    interpreter the PRNG is stubbed to zero bits (-> zero noise), so the
    output must equal the grain-free grade — this checks the wiring and
    blend math, not the noise."""
    from vrgdg_tpu.core.params import GrainParams, SharpenParams
    from vrgdg_tpu.ops.grade import GradeConfig, grade

    frames = jnp.asarray(np.random.default_rng(0)
                         .uniform(0, 1, (2, 16, 128, 3)).astype(np.float32))
    with_grain = GradeConfig(sharpen=SharpenParams.normalize(1.0),
                             grain=GrainParams.normalize(0.1, 0.5, seed=3),
                             grain_mode="pallas")
    without = GradeConfig(sharpen=SharpenParams.normalize(1.0))
    a = grade(frames, with_grain)
    b = grade(frames, without)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


@pytest.mark.skipif(not ON_TPU, reason="hardware PRNG requires real TPU")
def test_tpu_batch_boundary_invariance():
    frames = jnp.full((6, 32, 128, 3), 0.5, jnp.float32)
    whole = film_grain_pallas(frames, 0.08, 0.5, seed=123, frame_start=0)
    parts = jnp.concatenate([
        film_grain_pallas(frames[:2], 0.08, 0.5, seed=123, frame_start=0),
        film_grain_pallas(frames[2:], 0.08, 0.5, seed=123, frame_start=2),
    ])
    np.testing.assert_array_equal(np.asarray(whole), np.asarray(parts))


@pytest.mark.skipif(not ON_TPU, reason="hardware PRNG requires real TPU")
def test_tpu_distribution():
    frames = jnp.full((4, 128, 128, 3), 0.5, jnp.float32)
    out = film_grain_pallas(frames, 0.01, 1.0, seed=3)
    noise = (np.asarray(out) - 0.5) / 0.01
    stds = noise.reshape(-1, 3).std(axis=0)
    np.testing.assert_allclose(stds[0] / stds[1], 2.0, rtol=0.05)
    np.testing.assert_allclose(stds[2] / stds[1], 3.0, rtol=0.05)
    np.testing.assert_allclose(stds[1], 1.0, rtol=0.05)
    np.testing.assert_allclose(noise.mean(), 0.0, atol=0.02)
