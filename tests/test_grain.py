import numpy as np
import jax.numpy as jnp

from vrgdg_tpu.ops.grain import film_grain, grain_field


def test_grain_batch_boundary_invariance():
    """The property the reference's enhancer test locks down
    (tests/test_standalone_video_enhancer.py:39-59): output is identical
    whether frames are processed whole or in chunks."""
    frames = jnp.full((8, 12, 16, 3), 0.5, jnp.float32)
    whole = film_grain(frames, 0.08, 0.5, seed=123, frame_start=0)
    parts = [film_grain(frames[i:i + 3], 0.08, 0.5, seed=123, frame_start=i)
             for i in range(0, 8, 3)]
    chunked = jnp.concatenate(parts, axis=0)
    np.testing.assert_array_equal(np.asarray(whole), np.asarray(chunked))


def test_grain_deterministic_and_seed_sensitive():
    frames = jnp.full((2, 8, 8, 3), 0.5, jnp.float32)
    a = film_grain(frames, 0.1, 0.5, seed=7)
    b = film_grain(frames, 0.1, 0.5, seed=7)
    c = film_grain(frames, 0.1, 0.5, seed=8)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.any(np.asarray(a) != np.asarray(c))


def test_grain_seed_shift_equals_frame_shift():
    """Per-frame noise depends only on seed + absolute index."""
    frames = jnp.full((4, 8, 8, 3), 0.5, jnp.float32)
    a = film_grain(frames, 0.1, 0.5, seed=10, frame_start=5)
    b = film_grain(frames, 0.1, 0.5, seed=15, frame_start=0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_grain_channel_scaling_distribution():
    """R noise has 2x std, B 3x std of G before desaturation
    (nodes.py:53-54); with saturation_mix=1 the ratios survive."""
    field = np.asarray(grain_field(jnp.arange(8), 64, 64, 1.0, 0))
    stds = field.reshape(-1, 3).std(axis=0)
    np.testing.assert_allclose(stds[0] / stds[1], 2.0, rtol=0.05)
    np.testing.assert_allclose(stds[2] / stds[1], 3.0, rtol=0.05)
    np.testing.assert_allclose(field.mean(), 0.0, atol=0.01)
    np.testing.assert_allclose(stds[1], 1.0, rtol=0.05)


def test_grain_desaturation():
    """saturation_mix=0 leaves pure monochrome grain (all channels equal)."""
    field = np.asarray(grain_field(jnp.arange(2), 16, 16, 0.0, 0))
    np.testing.assert_allclose(field[..., 0], field[..., 1], atol=1e-6)
    np.testing.assert_allclose(field[..., 2], field[..., 1], atol=1e-6)


def test_grain_intensity_zero_and_bounds():
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.uniform(0, 1, (3, 8, 8, 3)).astype(np.float32))
    out0 = film_grain(frames, 0.0, 0.5, seed=1)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(frames), atol=1e-7)
    out = np.asarray(film_grain(frames, 1.0, 0.5, seed=1))
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_grain_alpha_passthrough():
    frames = jnp.concatenate([jnp.full((2, 8, 8, 3), 0.5),
                              jnp.full((2, 8, 8, 1), 0.7)], axis=-1)
    out = np.asarray(film_grain(frames, 0.2, 0.5, seed=3))
    np.testing.assert_allclose(out[..., 3], 0.7, atol=1e-7)
