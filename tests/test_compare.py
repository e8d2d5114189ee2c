"""Compare renders: golden tests for the five modes
(VRGDG_ImageCompareNode.py:11-14 mode set)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from vrgdg_tpu.ops import compare as oc


def _pair(seed=0, shape=(3, 16, 24, 3)):
    rng = np.random.default_rng(seed)
    a = rng.uniform(0, 1, shape).astype(np.float32)
    b = rng.uniform(0, 1, shape).astype(np.float32)
    return jnp.asarray(a), jnp.asarray(b)


def test_difference_golden():
    a, b = _pair()
    out = np.asarray(oc.difference(a, b, gain=2.0))
    expect = np.clip(np.abs(np.asarray(a) - np.asarray(b)) * 2.0, 0, 1)
    np.testing.assert_allclose(out, expect, atol=1e-7)
    # identical inputs -> black
    same = np.asarray(oc.difference(a, a))
    assert same.max() == 0.0


def test_blink_golden():
    a, b = _pair(shape=(10, 8, 8, 3))
    # 5 fps, 1 toggle/sec -> period 5: frames 0-4 show A, 5-9 show B
    out = np.asarray(oc.blink(a, b, fps=5.0, blink_speed=1.0))
    np.testing.assert_array_equal(out[:5], np.asarray(a)[:5])
    np.testing.assert_array_equal(out[5:], np.asarray(b)[5:])
    # batch-boundary invariance: chunked == whole
    parts = np.concatenate([
        np.asarray(oc.blink(a[:3], b[:3], 5.0, 1.0, frame_start=0)),
        np.asarray(oc.blink(a[3:], b[3:], 5.0, 1.0, frame_start=3)),
    ])
    np.testing.assert_array_equal(out, parts)


def test_slider_split():
    a = jnp.zeros((1, 4, 10, 3))
    b = jnp.ones((1, 4, 10, 3))
    out = np.asarray(oc.slider(a, b, position=0.5, seam=0))
    assert out[0, 0, 0, 0] == 0.0 and out[0, 0, 9, 0] == 1.0
    assert (out[0, :, :5] == 0.0).all() and (out[0, :, 5:] == 1.0).all()


def test_overlay_blend():
    a, b = _pair()
    out = np.asarray(oc.overlay(a, b, opacity=0.25))
    expect = np.asarray(a) * 0.75 + np.asarray(b) * 0.25
    np.testing.assert_allclose(out, expect, atol=1e-7)


def test_side_by_side_geometry():
    a, b = _pair()
    out = oc.side_by_side(a, b, separator=2)
    assert out.shape == (3, 16, 24 * 2 + 2, 3)
    np.testing.assert_array_equal(np.asarray(out)[:, :, 24:26], 1.0)


def test_align_pair_resizes_b():
    a = jnp.zeros((2, 16, 24, 3))
    b = jnp.ones((2, 8, 12, 3))
    a2, b2 = oc.align_pair(a, b)
    assert b2.shape == a2.shape


def test_render_compare_rejects_unknown_mode():
    a, b = _pair()
    with pytest.raises(ValueError, match="Unknown compare mode"):
        oc.render_compare(a, b, "wipe")


def test_compare_appliers(tmp_path):
    cv2 = pytest.importorskip("cv2")
    pytest.importorskip("PIL")
    from PIL import Image

    from vrgdg_tpu import api

    rng = np.random.default_rng(0)
    img_a = str(tmp_path / "a.png")
    img_b = str(tmp_path / "b.png")
    Image.fromarray(rng.integers(0, 255, (16, 24, 3), np.uint8)).save(img_a)
    Image.fromarray(rng.integers(0, 255, (16, 24, 3), np.uint8)).save(img_b)
    result = api.compare_images(img_a, img_b, "difference",
                                str(tmp_path / "diff.png"))
    assert os.path.isfile(result["output"])
    assert result["mode"] == "difference"

    def clip(path, value):
        writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"),
                                 10.0, (32, 24))
        for _ in range(8):
            writer.write(np.full((24, 32, 3), value, np.uint8))
        writer.release()

    vid_a, vid_b = str(tmp_path / "a.mp4"), str(tmp_path / "b.mp4")
    clip(vid_a, 30)
    clip(vid_b, 220)
    result = api.compare_videos(vid_a, vid_b, "side_by_side",
                                str(tmp_path / "sbs.mp4"))
    assert result["processed_frames"] == 8
    assert result["width"] == 32 * 2 + 2
    capture = cv2.VideoCapture(result["output"])
    ok, frame = capture.read()
    capture.release()
    assert ok
    # left half dark, right half bright
    assert frame[:, :30].mean() < 80 and frame[:, -30:].mean() > 170


def test_overlay_and_slider_extremes():
    a, b = _pair()
    np.testing.assert_allclose(np.asarray(oc.overlay(a, b, 0.0)),
                               np.asarray(a), atol=1e-7)
    np.testing.assert_allclose(np.asarray(oc.overlay(a, b, 1.0)),
                               np.asarray(b), atol=1e-7)
    # slider at 0 shows only B, at 1 only A (seam disabled)
    np.testing.assert_allclose(np.asarray(oc.slider(a, b, 0.0, seam=0)),
                               np.asarray(b), atol=1e-7)
    np.testing.assert_allclose(np.asarray(oc.slider(a, b, 1.0, seam=0)),
                               np.asarray(a), atol=1e-7)
