import numpy as np
import jax.numpy as jnp
import pytest

from vrgdg_tpu.ops import sharpen as sh
from oracles import laplacian_oracle, sobel_oracle, unsharp_oracle


def _imgs(seed=0, shape=(2, 10, 14, 3)):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, 1, shape).astype(np.float32)


CASES = [
    (sh.unsharp, unsharp_oracle, 2.5),
    (sh.laplacian_sharpen, laplacian_oracle, 0.8),
    (sh.sobel_sharpen, sobel_oracle, 0.8),
]


@pytest.mark.parametrize("ours,oracle,strength", CASES)
@pytest.mark.parametrize("border", ["edge", "zero"])
def test_parity(ours, oracle, strength, border):
    imgs = _imgs()
    got = np.asarray(ours(jnp.asarray(imgs), strength, border))
    want = oracle(imgs, strength, border)
    assert np.max(np.abs(got - want)) < 1e-5


@pytest.mark.parametrize("ours,oracle,strength", CASES)
def test_strength_zero(ours, oracle, strength):
    imgs = _imgs(seed=1)
    got = np.asarray(ours(jnp.asarray(imgs), 0.0, "edge"))
    # sobel adds strength*edges which is 0 at strength 0; all identity
    np.testing.assert_allclose(got, imgs, atol=1e-6)


def test_unsharp_flat_image_unchanged():
    imgs = jnp.full((1, 8, 8, 3), 0.4, jnp.float32)
    out = np.asarray(sh.unsharp(imgs, 5.0, "edge"))
    np.testing.assert_allclose(out, 0.4, atol=1e-6)


def test_box_blur_matches_mean():
    imgs = _imgs(seed=2, shape=(1, 6, 6, 1))
    out = np.asarray(sh.box_blur_3x3(jnp.asarray(imgs), "edge"))
    # interior pixel = mean of 3x3 neighborhood
    want = imgs[0, 1:4, 1:4, 0].mean()
    np.testing.assert_allclose(out[0, 2, 2, 0], want, rtol=1e-5)


def test_output_clamped():
    imgs = _imgs(seed=3)
    for fn in (sh.unsharp, sh.laplacian_sharpen, sh.sobel_sharpen):
        out = np.asarray(fn(jnp.asarray(imgs), 10.0, "edge"))
        assert out.min() >= 0.0 and out.max() <= 1.0
