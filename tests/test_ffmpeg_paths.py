"""Exercise the ffmpeg code paths with a test double.

This image ships no ffmpeg binary, so without these tests the concat
demuxer join (``video_io._concat_ffmpeg``), the browser re-encode
(``api.appliers.ffmpeg_browser_encode``), the stream-copy trim, the
0.25 s cancel polling, and the stderr-tail error capture would only ever
run in production. ``tests/fake_ffmpeg.py`` emulates the exact argument
subset those call sites use (reference commands:
``VRGDG_StandaloneVideoEnhancerNodes.py:444-510``,
``VRGDG_LUTVideoTools.py:859-916``, ``GeneralVideoNodes.py:1879-1889``).
"""

import os
import threading
import time

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from vrgdg_tpu.api import appliers
from vrgdg_tpu.runtime import video_io


# The fake_ffmpeg fixture lives in conftest.py so other test modules
# can exercise ffmpeg-only code paths too.


def _write_clip(path, n_frames, fps=12.0, size=(64, 48), seed=0):
    rng = np.random.default_rng(seed)
    writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, size)
    for _ in range(n_frames):
        writer.write(rng.integers(0, 255, (size[1], size[0], 3), np.uint8))
    writer.release()


def test_concat_ffmpeg_path(fake_ffmpeg, tmp_path):
    segments = []
    for k, n in enumerate([5, 7]):
        p = tmp_path / f"seg{k}.mp4"
        _write_clip(p, n, seed=k)
        segments.append(str(p))
    out = str(tmp_path / "joined.mp4")
    result = video_io.concat_videos(segments, out, 12.0, 64, 48,
                                    preserve_audio=False,
                                    log_path=str(tmp_path / "ffmpeg.log"))
    assert result == {"backend": "ffmpeg:libx264", "audio": False}
    assert video_io.probe_video(out)["frame_count"] == 12
    # the concat list file was written with the quoting contract
    listing = (tmp_path / "segments.txt").read_text()
    assert listing.count("file '") == 2


def test_concat_ffmpeg_failure_surfaces_stderr(fake_ffmpeg, tmp_path,
                                               monkeypatch):
    monkeypatch.setenv("FAKE_FFMPEG_FAIL", "1")
    seg = tmp_path / "seg.mp4"
    _write_clip(seg, 4)
    with pytest.raises(RuntimeError, match="Conversion failed"):
        video_io.concat_videos([str(seg)], str(tmp_path / "o.mp4"),
                               12.0, 64, 48, preserve_audio=False,
                               log_path=str(tmp_path / "ffmpeg.log"))


def test_concat_ffmpeg_cancel_terminates(fake_ffmpeg, tmp_path,
                                         monkeypatch):
    monkeypatch.setenv("FAKE_FFMPEG_SLEEP", "30")
    seg = tmp_path / "seg.mp4"
    _write_clip(seg, 4)
    cancel = threading.Event()
    timer = threading.Timer(0.6, cancel.set)
    timer.start()
    started = time.perf_counter()
    try:
        with pytest.raises(InterruptedError):
            video_io.concat_videos([str(seg)], str(tmp_path / "o.mp4"),
                                   12.0, 64, 48, preserve_audio=False,
                                   cancel_event=cancel,
                                   log_path=str(tmp_path / "ffmpeg.log"))
    finally:
        timer.cancel()
    # the 0.25 s poll must terminate the subprocess long before its
    # 30 s sleep finishes
    assert time.perf_counter() - started < 10


def test_browser_encode_roundtrip_and_failure(fake_ffmpeg, tmp_path,
                                              monkeypatch):
    clip = tmp_path / "clip.mp4"
    _write_clip(clip, 6)
    result = appliers.ffmpeg_browser_encode(str(clip))
    assert result["ok"] is True
    assert result["encoder"] == "ffmpeg:libx264"
    assert video_io.probe_video(str(clip))["frame_count"] == 6

    monkeypatch.setenv("FAKE_FFMPEG_FAIL", "1")
    result = appliers.ffmpeg_browser_encode(str(clip))
    assert result["ok"] is False
    assert "Conversion failed" in result["error"]
    # the source must be left intact on failure
    assert video_io.probe_video(str(clip))["frame_count"] == 6


def test_trim_final_clip_ffmpeg_path(fake_ffmpeg, tmp_path):
    clip = tmp_path / "video_0001.mp4"
    _write_clip(clip, 24, fps=12.0)  # 2.0 s
    final = video_io.trim_final_clip(
        str(tmp_path), "video", frames_per_scene=24,
        audio_total_duration=1.0, index=0, total_sets=1, fps=12.0)
    assert final.endswith("video_0001.mp4")
    # kept only the first second: 12 frames
    assert video_io.probe_video(final)["frame_count"] == 12


def test_persist_prepare_ffmpeg_working_video(fake_ffmpeg, tmp_path):
    import jax.numpy as jnp

    from vrgdg_tpu.jobs import prepare_restore as pr

    frames = jnp.asarray(
        np.random.default_rng(2).uniform(0, 1, (6, 48, 64, 3))
        .astype(np.float32))
    working, anchors, context = pr.prepare(
        frames, anchor_interval=3, anchor_width=64, anchor_height=32,
        working_width=64, working_height=32, dimension_multiple=32,
        fps=12.0)
    result = pr.persist_prepare(working, anchors, context,
                                str(tmp_path / "job"))
    meta = video_io.probe_video(result["ltx_video_path"])
    assert meta["frame_count"] == context.frame_count
    assert (meta["width"], meta["height"]) == (64, 32)


def test_face_fix_crop_video_ffmpeg(fake_ffmpeg, tmp_path):
    from vrgdg_tpu.jobs.face_fix import _encode_crop_video

    crops = tmp_path / "crops"
    crops.mkdir()
    rng = np.random.default_rng(3)
    for i in range(5):
        cv2.imwrite(str(crops / f"frame_{i:06d}.png"),
                    rng.integers(0, 255, (64, 64, 3), np.uint8))
    out = str(tmp_path / "crops.mp4")
    _encode_crop_video(str(crops), out, 12.0, 5)
    meta = video_io.probe_video(out)
    assert meta["frame_count"] == 5
    assert (meta["width"], meta["height"]) == (64, 64)


def test_face_fix_crop_video_ffmpeg_failure(fake_ffmpeg, tmp_path,
                                            monkeypatch):
    from vrgdg_tpu.jobs.face_fix import _encode_crop_video

    monkeypatch.setenv("FAKE_FFMPEG_FAIL", "1")
    crops = tmp_path / "crops"
    crops.mkdir()
    cv2.imwrite(str(crops / "frame_000000.png"),
                np.zeros((64, 64, 3), np.uint8))
    with pytest.raises(RuntimeError, match="Conversion failed"):
        _encode_crop_video(str(crops), str(tmp_path / "o.mp4"), 12.0, 1)
