"""Anchor persistence parity (VERDICT #7): deterministic-order PNG
store/load with count validation and incremental (meta-batch style)
loading — VRGDG_VideoEnhanceNodes.py:109-167, 255-319."""

import os

import numpy as np
import pytest

pytest.importorskip("PIL")

import jax.numpy as jnp

from vrgdg_tpu.jobs import prepare_restore as pr


def _frames(count=10, h=24, w=32, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, 1, (count, h, w, 3)).astype(np.float32)


def test_save_image_batch_roundtrip(tmp_path):
    frames = _frames(5)
    folder = str(tmp_path / "anchors")
    paths = pr.save_image_batch(frames, folder, "anchor")
    assert [os.path.basename(p) for p in paths] == [
        f"anchor_{i:06d}.png" for i in range(5)]
    w, h, count, stream = pr.iter_anchor_images(folder)
    assert (w, h, count) == (32, 24, 5)
    loaded = np.stack(list(stream))
    # 8-bit quantization round trip: exact to 1/255 half-step
    np.testing.assert_allclose(loaded, frames, atol=0.5 / 255 + 1e-6)


def test_save_clears_stale_files(tmp_path):
    folder = str(tmp_path / "anchors")
    pr.save_image_batch(_frames(6), folder, "anchor")
    pr.save_image_batch(_frames(3, seed=1), folder, "anchor")
    _, _, count, _ = pr.iter_anchor_images(folder)
    assert count == 3  # stale anchor_000003..5 removed


def test_incremental_batches_preserve_order(tmp_path):
    frames = _frames(10)
    folder = str(tmp_path / "anchors")
    pr.save_image_batch(frames, folder, "anchor")
    batches = list(pr.load_anchor_batches(folder, 4))
    assert [b.shape[0] for b in batches] == [4, 4, 2]
    joined = np.concatenate(batches)
    np.testing.assert_allclose(joined, frames, atol=0.5 / 255 + 1e-6)


def test_iter_empty_folder_raises(tmp_path):
    folder = str(tmp_path / "empty")
    os.makedirs(folder)
    with pytest.raises(FileNotFoundError):
        pr.iter_anchor_images(folder)


def test_store_enhanced_anchors_count_validation(tmp_path):
    video = jnp.asarray(_frames(9, 32, 32))
    _, anchors, context = pr.prepare(video, anchor_interval=4,
                                     anchor_width=128, anchor_height=128,
                                     working_width=128, working_height=128,
                                     dimension_multiple=8)
    job = str(tmp_path / "job")
    folder = pr.store_enhanced_anchors(anchors, context, job)
    assert context.extras["enhanced_anchor_folder"] == folder
    _, _, count, _ = pr.iter_anchor_images(folder)
    assert count == len(context.anchor_indices)
    with pytest.raises(ValueError, match="expected"):
        pr.store_enhanced_anchors(anchors[:-1], context, job)


def test_persist_prepare_writes_working_video(tmp_path):
    pytest.importorskip("cv2")
    video = jnp.asarray(_frames(8, 48, 64))
    working, anchors, context = pr.prepare(
        video, anchor_interval=4, anchor_width=64, anchor_height=48,
        working_width=64, working_height=48, dimension_multiple=8, fps=10.0)
    job = str(tmp_path / "job")
    result = pr.persist_prepare(working, anchors, context, job)
    assert os.path.isfile(result["ltx_video_path"])
    assert os.path.isdir(result["anchor_sources_folder"])
    _, _, count, _ = pr.iter_anchor_images(result["anchor_sources_folder"])
    assert count == len(context.anchor_indices)
    from vrgdg_tpu.runtime import video_io
    meta = video_io.probe_video(result["ltx_video_path"])
    assert meta["frame_count"] == 8
    assert (meta["width"], meta["height"]) == (64, 48)
