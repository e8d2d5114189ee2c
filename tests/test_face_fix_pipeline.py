"""Standalone Face Fix pipeline (in-memory node-graph variant,
VRGDG_StandaloneFaceFixNodes.py:240-729)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from vrgdg_tpu.jobs import face_fix_pipeline as ffp

FRAMES, H, W = 14, 240, 320
FACE = 16


def _clip(gap_frames=()):
    rng = np.random.default_rng(0)
    frames = np.full((FRAMES, H, W, 3), 0.15, np.float32)
    frames += rng.uniform(0, 0.02, frames.shape).astype(np.float32)
    for i in range(FRAMES):
        if i in gap_frames:
            continue
        x, y = 40 + 2 * i, 60 + i
        frames[i, y:y + FACE, x:x + FACE] = 0.8
    return frames


def detector(frame, region):
    left, top, right, bottom = region
    patch = frame[top:bottom, left:right]
    mask = patch[..., 0] > 150
    if not mask.any():
        return []
    ys, xs = np.nonzero(mask)
    return [(left + float(xs.min()), top + float(ys.min()),
             float(xs.max() - xs.min() + 1), float(ys.max() - ys.min() + 1),
             0.9)]


def test_prepare_tracks_and_crops():
    frames = _clip()
    crops, anchors, context = ffp.prepare_face_pipeline(
        frames, detector, rotation_assist="off", minimum_face_pixels=8,
        anchor_interval=4)
    assert crops.shape == (FRAMES, 512, 512, 3)
    assert anchors.shape[0] == len(context.anchor_indices)
    assert all(e["fresh"] and e["strength"] == 1.0 for e in context.entries)
    assert 0 in context.anchor_indices
    # the bright face fills most of the padded crop
    assert float(jnp.mean(crops[0])) > 0.4


def test_prepare_short_gap_carry():
    frames = _clip(gap_frames={5, 6})
    _, _, context = ffp.prepare_face_pipeline(
        frames, detector, rotation_assist="off", minimum_face_pixels=8,
        anchor_interval=4, short_gap_tracking=2)
    e5, e6 = context.entries[5], context.entries[6]
    assert not e5["fresh"] and e5["tracking_strength"] == 0.65
    assert not e6["fresh"] and e6["tracking_strength"] == 0.30
    assert context.entries[7]["fresh"]
    # anchors only snap to fresh frames
    assert 5 not in context.anchor_indices
    assert 6 not in context.anchor_indices


def test_prepare_gap_zero_disables_carry():
    frames = _clip(gap_frames={5})
    _, _, context = ffp.prepare_face_pipeline(
        frames, detector, rotation_assist="off", minimum_face_pixels=8,
        short_gap_tracking=0)
    assert context.entries[5]["strength"] == 0.0
    assert context.entries[5]["box"] is None


def test_full_pipeline_with_artifacts(tmp_path):
    pytest.importorskip("cv2")
    frames = _clip()
    job = str(tmp_path / "job")

    def model(crop_batch, anchor_batch, safe_indices):
        assert all(i % 8 != 1 for i in safe_indices)
        # "repair": brighten the face crops
        return jnp.clip(crop_batch + 0.1, 0.0, 1.0)

    # color_match off so the uniform +0.1 "repair" stays measurable (it
    # is exactly the kind of mean shift color match would cancel)
    out, masks, repaired = ffp.run_face_fix_pipeline(
        frames, model, detector=detector, job_folder=job, fps=10.0,
        color_match=0.0, rotation_assist="off", minimum_face_pixels=8,
        anchor_interval=4)
    assert repaired == FRAMES
    assert out.shape == frames.shape
    assert os.path.isfile(os.path.join(job, "face_video_512.mp4"))
    assert os.path.isdir(os.path.join(job, "enhanced_anchors_512"))
    out = np.asarray(out)
    # face centers brightened, background untouched
    assert out[0, 68, 48, 0] > frames[0, 68, 48, 0] + 0.02
    np.testing.assert_allclose(out[0, :20, -40:], frames[0, :20, -40:],
                               atol=1e-6)
    assert float(np.asarray(masks).max()) > 0.5


def test_collect_rejects_mismatched_jobs(tmp_path):
    frames = _clip()
    _, anchors, ctx_a = ffp.prepare_face_pipeline(
        frames, detector, rotation_assist="off", minimum_face_pixels=8)
    _, _, ctx_b = ffp.prepare_face_pipeline(
        frames, detector, rotation_assist="off", minimum_face_pixels=8)
    with pytest.raises(ValueError, match="different Face Fix jobs"):
        ffp.collect_ltx_inputs(ctx_a, ctx_b)


def test_composite_tolerates_short_ltx_batch():
    frames = _clip()
    crops, _, context = ffp.prepare_face_pipeline(
        frames, detector, rotation_assist="off", minimum_face_pixels=8)
    out, _, repaired = ffp.composite_repaired(crops[:FRAMES - 3], context)
    assert repaired == FRAMES - 3
    np.testing.assert_allclose(np.asarray(out[-1]), frames[-1], atol=1e-6)
    with pytest.raises(ValueError):
        ffp.composite_repaired(crops[:FRAMES - 8], context)
