import numpy as np
import jax.numpy as jnp
import pytest

from vrgdg_tpu.jobs.prepare_restore import (anchor_indices, prepare, restore,
                                            run_guided_enhance,
                                            safe_conditioning_indices)


def _clip(seed=0, shape=(40, 36, 64, 3)):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(0, 1, shape).astype(np.float32))


def test_anchor_indices_include_last():
    assert anchor_indices(40, 16) == [0, 16, 32, 39]
    assert anchor_indices(33, 16) == [0, 16, 32]
    assert anchor_indices(1, 16) == [0]
    assert anchor_indices(17, 8) == [0, 8, 16]


def test_safe_indices_rule():
    """index % 8 == 1 is illegal; replaced by nearest free legal index
    (VRGDG_VideoEnhanceNodes.py:336-349)."""
    assert safe_conditioning_indices([0, 16, 32], 40) == [0, 16, 32]
    # 17 % 8 == 1 -> nearest legal is 16 (distance 1, minus first)
    assert safe_conditioning_indices([17], 40) == [16]
    # when 16 is taken, 17 must move to 18
    assert safe_conditioning_indices([16, 17], 40) == [16, 18]
    # 1 % 8 == 1 -> candidates 0, 2
    assert safe_conditioning_indices([1], 40) == [0]
    assert safe_conditioning_indices([0, 1], 40) == [0, 2]


def test_prepare_shapes_and_rounding():
    clip = _clip()
    working, anchors, ctx = prepare(
        clip, anchor_interval=16, anchor_width=100, anchor_height=50,
        working_width=130, working_height=70, dimension_multiple=32)
    # rounded to multiples of 32
    assert ctx.anchor_width == 96 and ctx.anchor_height == 64
    assert ctx.working_width == 128 and ctx.working_height == 64
    assert working.shape == (40, 64, 128, 3)
    assert anchors.shape == (len(ctx.anchor_indices), 64, 96, 3)
    assert ctx.anchor_indices == [0, 16, 32, 39]


def test_restore_exact_dims_and_tail():
    clip = _clip(1, (20, 30, 40, 3))
    working, _, ctx = prepare(clip, anchor_interval=8, working_width=64,
                              working_height=64, dimension_multiple=8,
                              fit_mode="letterbox")
    # model drops 3 frames (within ±7 tolerance)
    out = restore(working[:17], ctx, enhancement_strength=1.0)
    assert out.shape == clip.shape
    # tail frames (17..19) preserved from source exactly
    np.testing.assert_allclose(np.asarray(out[17:]),
                               np.clip(np.asarray(clip[17:]), 0, 1),
                               atol=1e-7)


def test_restore_tolerance_violation():
    clip = _clip(2, (20, 16, 16, 3))
    working, _, ctx = prepare(clip, working_width=32, working_height=32,
                              dimension_multiple=8)
    with pytest.raises(ValueError, match="frames"):
        restore(working[:10], ctx)


def test_restore_strength_blend():
    clip = _clip(3, (4, 16, 16, 3))
    working, _, ctx = prepare(clip, working_width=16, working_height=16,
                              dimension_multiple=8, fit_mode="stretch")
    enhanced = jnp.clip(working + 0.2, 0, 1)
    zero = restore(enhanced, ctx, enhancement_strength=0.0)
    np.testing.assert_allclose(np.asarray(zero), np.asarray(clip), atol=1e-6)
    half = restore(enhanced, ctx, enhancement_strength=0.5)
    full = restore(enhanced, ctx, enhancement_strength=1.0)
    mid = (np.asarray(zero) + np.asarray(full)) / 2
    np.testing.assert_allclose(np.asarray(half), mid, atol=1e-5)


def test_run_guided_enhance_identity_model():
    clip = _clip(4, (12, 24, 32, 3))
    seen = {}

    def model(working, anchors, safe):
        seen["working"] = working.shape
        seen["anchors"] = anchors.shape
        seen["safe"] = safe
        return working

    out = run_guided_enhance(clip, model, anchor_interval=8,
                             working_width=64, working_height=48,
                             dimension_multiple=16, fit_mode="letterbox",
                             resize_method="bilinear")
    assert out.shape == clip.shape
    assert seen["working"] == (12, 48, 64, 3)
    assert all(i % 8 != 1 for i in seen["safe"])
