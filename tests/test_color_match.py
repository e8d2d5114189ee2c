import numpy as np
import jax.numpy as jnp

from vrgdg_tpu.ops.color_match import color_match, lab_statistics
from oracles import color_match_oracle


def _imgs(seed, shape=(3, 16, 20, 3)):
    rng = np.random.default_rng(seed)
    return rng.uniform(0.05, 0.95, shape).astype(np.float32)


def test_parity_with_oracle():
    imgs = _imgs(0)
    ref = _imgs(1, (1, 12, 12, 3))
    for strength in (1.0, 0.5, 0.0):
        ours = np.asarray(color_match(jnp.asarray(imgs), jnp.asarray(ref),
                                      strength))
        want = color_match_oracle(imgs, ref, strength)
        assert np.max(np.abs(ours - want)) < 1e-3, strength


def test_strength_zero_roundtrips():
    imgs = _imgs(2)
    out = np.asarray(color_match(jnp.asarray(imgs), jnp.asarray(_imgs(3)),
                                 0.0))
    assert np.max(np.abs(out - imgs)) < 1e-4  # LAB roundtrip only


def test_self_match_is_identity():
    imgs = _imgs(4, (1, 16, 16, 3))
    out = np.asarray(color_match(jnp.asarray(imgs), jnp.asarray(imgs), 1.0))
    assert np.max(np.abs(out - imgs)) < 1e-3


def test_matched_statistics_move_toward_reference():
    imgs = _imgs(5)
    ref = np.clip(_imgs(6, (1, 16, 16, 3)) * 0.5 + 0.3, 0, 1).astype(np.float32)
    out = color_match(jnp.asarray(imgs), jnp.asarray(ref), 1.0)
    ref_mean, ref_std = lab_statistics(jnp.asarray(ref))
    out_mean, out_std = lab_statistics(out)
    # after matching, each image's LAB mean should be near the reference's
    assert np.max(np.abs(np.asarray(out_mean) - np.asarray(ref_mean))) < 2.5


def test_stats_shapes_and_std_floor():
    imgs = jnp.full((2, 8, 8, 3), 0.5)
    mean, std = lab_statistics(imgs)
    assert mean.shape == (2, 1, 1, 3)
    assert std.shape == (2, 1, 1, 3)
    assert float(jnp.min(std)) >= 0.99e-5  # constant image: floor holds (f32)
