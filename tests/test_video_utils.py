"""Small video utilities + profiling telemetry."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from vrgdg_tpu.runtime import profiling, video_io


def test_pad_frames_array():
    frames = np.arange(4 * 2 * 2 * 3, dtype=np.float32).reshape(4, 2, 2, 3)
    tail = video_io.pad_frames_array(frames, 2)
    assert tail.shape[0] == 6
    np.testing.assert_array_equal(tail[4], frames[3])
    np.testing.assert_array_equal(tail[5], frames[3])
    front = video_io.pad_frames_array(frames, 3, pad_front=True)
    assert front.shape[0] == 7
    np.testing.assert_array_equal(front[0], frames[0])
    np.testing.assert_array_equal(front[2], frames[0])
    np.testing.assert_array_equal(front[3], frames[0])
    same = video_io.pad_frames_array(frames, 0)
    assert same.shape[0] == 4


def test_add_preroll_frames():
    assert video_io.add_preroll_frames(48, 0) == (48, 0)
    assert video_io.add_preroll_frames(48, 1) == (54, 6)
    assert video_io.add_preroll_frames(48, 3, preroll_frames=4) == (52, 4)


def _write_clip(path, frames, fps=10.0, size=(64, 48)):
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                             size)
    rng = np.random.default_rng(0)
    for _ in range(frames):
        writer.write(rng.integers(0, 255, (size[1], size[0], 3), np.uint8))
    writer.release()


def test_trim_final_clip(tmp_path):
    folder = str(tmp_path)
    _write_clip(os.path.join(folder, "video_0000.mp4"), 20)
    _write_clip(os.path.join(folder, "video_0001.mp4"), 20)  # 2s at 10fps

    # not the last chunk -> no-op
    assert video_io.trim_final_clip(folder, "video", 20, 3.0, 0, 2, 10) == ""

    # last chunk: audio 3.0s total, chunk 1 starts at 2.0s -> keep 1.0s
    final = video_io.trim_final_clip(folder, "video", 20, 3.0, 1, 2, 10)
    assert final.endswith("video_0001.mp4")
    meta = video_io.probe_video(final)
    assert meta["frame_count"] <= 12  # ~1s of 10fps, container slack

    # remaining <= 0 -> untouched path returned
    _write_clip(os.path.join(folder, "clipb_0000.mp4"), 20)
    out = video_io.trim_final_clip(folder, "clipb", 20, 0.0, 0, 1, 10)
    assert out.endswith("clipb_0000.mp4")
    assert video_io.probe_video(out)["frame_count"] == 20


def test_stage_timer():
    timer = profiling.StageTimer()
    with timer.stage("a"):
        pass
    with timer.stage("a"):
        pass
    timer.add("b", 0.5)
    seconds = timer.seconds()
    assert set(seconds) == {"a", "b"}
    assert seconds["b"] == 0.5
    assert timer.counts() == {"a": 2, "b": 1}


def test_maybe_trace_noop(monkeypatch):
    monkeypatch.delenv(profiling.TRACE_ENV, raising=False)
    with profiling.maybe_trace("x") as target:
        assert target is None


def test_applier_reports_stage_seconds(tmp_path):
    from vrgdg_tpu import api

    clip = str(tmp_path / "in.mp4")
    _write_clip(clip, 8)
    result = api.apply_film_grain_to_video(
        clip, str(tmp_path / "out.mp4"), 0.05, 0.5, 7, batch_size=4,
        preserve_audio=False)
    stages = result["stage_seconds"]
    assert {"decode", "device", "encode"} <= set(stages)
    assert all(v >= 0 for v in stages.values())


def test_trim_image_batch():
    frames = np.arange(20)[:, None, None, None] * np.ones((1, 2, 2, 3))
    # first chunk: no preroll/tail trimming, clamp to frames_per_scene
    out = video_io.trim_image_batch(frames, 12, 6, 0)
    assert out.shape[0] == 12 and out[0, 0, 0, 0] == 0
    # later chunk: drop 6 preroll front + reserve 6 tail-loss at back
    out = video_io.trim_image_batch(frames, 12, 6, 1)
    assert out[0, 0, 0, 0] == 6
    assert out.shape[0] == min(6 + 12, 20 - 6) - 6  # 8 frames survive
    # degenerate: preroll beyond length
    out = video_io.trim_image_batch(frames[:4], 12, 6, 2)
    assert out.shape[0] == 0


def test_build_chunk_output_path(tmp_path):
    folder = str(tmp_path)
    path = video_io.build_chunk_output_path(folder, 3, "video")
    assert path.endswith("video_0003")
    srt = video_io.build_chunk_output_path(folder, 3, "video_0002_0001",
                                           srt_naming=True)
    assert srt.endswith("video_0004_0003")  # trailing digits stripped

    # backup mode moves existing chunk files aside
    existing = os.path.join(folder, "video_0003.mp4")
    open(existing, "wb").write(b"x")
    video_io.build_chunk_output_path(folder, 3, "video",
                                     overwrite_mode="backup")
    assert not os.path.exists(existing)
    backups = os.listdir(os.path.join(folder, "backup"))
    assert len(backups) == 1 and backups[0].endswith(".bak")


def test_build_chunk_backup_exact_stem(tmp_path):
    """Backup mode must only sweep the exact chunk file: 'video_0001'
    must not move SRT-named 'video_0001_0000.mp4' or 'video_00010.mp4'."""
    folder = str(tmp_path)
    target = os.path.join(folder, "video_0001.mp4")
    srt_sibling = os.path.join(folder, "video_0001_0000.mp4")
    digit_sibling = os.path.join(folder, "video_00010.mp4")
    for p in (target, srt_sibling, digit_sibling):
        open(p, "wb").write(b"x")
    video_io.build_chunk_output_path(folder, 1, "video",
                                     overwrite_mode="backup")
    assert not os.path.exists(target)
    assert os.path.exists(srt_sibling) and os.path.exists(digit_sibling)


def test_split_frames():
    import numpy as np

    from vrgdg_tpu.runtime.video_io import split_frames

    frames = np.arange(10 * 2 * 3 * 3, dtype=np.float32).reshape(10, 2, 3, 3)
    chunks = split_frames(frames, chunk_count=4, frames_per_chunk=4)
    assert [c.shape[0] for c in chunks] == [4, 4, 2, 0]
    np.testing.assert_array_equal(chunks[0], frames[:4])
    np.testing.assert_array_equal(chunks[2], frames[8:])
    assert chunks[3].shape == (0, 2, 3, 3)


def test_trim_image_batch_srt_variant():
    import numpy as np

    from vrgdg_tpu.runtime.video_io import trim_image_batch_srt

    frames = np.arange(20, dtype=np.float32).reshape(20, 1, 1, 1)
    # first chunk without preroll: head of the batch
    out = trim_image_batch_srt(frames, 8, 0, 0)
    np.testing.assert_array_equal(out[:, 0, 0, 0], np.arange(8))
    # later chunk: [pre : pre+scene], NO tail trim (unlike the general
    # trim_image_batch)
    out = trim_image_batch_srt(frames, 8, 6, 2)
    np.testing.assert_array_equal(out[:, 0, 0, 0], np.arange(6, 14))
    # preroll beyond the batch: empty slice falls back to the head
    out = trim_image_batch_srt(frames, 8, 25, 1)
    np.testing.assert_array_equal(out[:, 0, 0, 0], np.arange(8))


def test_split_frames_rank_consistent_and_empty_input():
    import numpy as np

    from vrgdg_tpu.runtime.video_io import split_frames

    # rank-3 input: empty chunks must match the populated chunks' rank
    chunks = split_frames(np.zeros((10, 64, 48), np.float32), 4, 4)
    assert [c.shape for c in chunks] == [
        (4, 64, 48), (4, 64, 48), (2, 64, 48), (0, 64, 48)]
    # no data at all: reference's 512x512x3 placeholder
    chunks = split_frames(np.zeros((0, 8, 8, 3), np.float32), 2, 4)
    assert all(c.shape == (0, 512, 512, 3) for c in chunks)


def test_combine_scene_videos_trims_to_durations():
    from vrgdg_tpu.runtime.video_io import combine_scene_videos

    clip = lambda n, v: np.full((n, 4, 4, 3), v, np.float32)  # noqa: E731
    out = combine_scene_videos(
        [clip(10, 1), clip(10, 2)],
        {"durations": [0.2, 0.3]}, fps=10.0)
    # 0.2 s @10 fps = 2 frames; 0.3 s = 3 frames
    assert out.shape[0] == 5
    assert out[0, 0, 0, 0] == 1 and out[2, 0, 0, 0] == 2

    # durations_frames used verbatim; a zero duration trims to the
    # 1-frame placeholder in V3 mode and keeps the clip length in V2
    out = combine_scene_videos(
        [clip(6, 1), clip(4, 2)],
        {"durations_frames": [3, 0]}, fps=10.0)
    assert out.shape[0] == 3 + 1
    out = combine_scene_videos(
        [clip(6, 1), clip(4, 2)],
        {"durations_frames": [3, 0]}, fps=10.0, pad_short=True)
    assert out.shape[0] == 3 + 4

    # short clips stay short by default (V3), pad_short repeats (V2)
    out = combine_scene_videos([clip(2, 5)],
                               {"durations_frames": [4]})
    assert out.shape[0] == 2
    out = combine_scene_videos([clip(2, 5)],
                               {"durations_frames": [4]},
                               pad_short=True)
    assert out.shape[0] == 4
    assert out[3, 0, 0, 0] == 5

    # last set honors groups_in_last_set
    out = combine_scene_videos(
        [clip(2, 1), clip(2, 2), clip(2, 3)],
        {"durations_frames": [2, 2, 2]},
        index=1, total_sets=2, groups_in_last_set=2)
    assert out.shape[0] == 4

    with pytest.raises(ValueError, match="audio_meta"):
        combine_scene_videos([clip(2, 1)], None)
    with pytest.raises(ValueError, match="No video inputs"):
        combine_scene_videos([None], {"durations_frames": [2]})


def test_add_label_bar_matches_reference(tmp_path):
    """Pixel-exact parity with the V5 combiner's label bar and the
    labeled sidecar save (HumoAutomationExtra2.py:360-412,479-493)."""
    import cv2
    import torch

    from tests.reference_oracle import load_reference
    from vrgdg_tpu.runtime.video_io import (add_label_bar,
                                            save_labeled_set_video)

    ref_ns = load_reference(
        "HumoAutomationExtra2.py", ["VRGDG_CombinevideosV5"],
        extra_globals={"cv2": cv2, "torch": torch,
                       "np": np,
                       "get_output_directory": lambda: str(tmp_path)})
    ref = ref_ns["VRGDG_CombinevideosV5"]()

    rng = np.random.default_rng(5)
    frames = rng.random((3, 24, 40, 3)).astype(np.float32)
    ours = add_label_bar(frames, "set 2 - group 7")
    theirs = ref._add_label_bar(torch.from_numpy(frames),
                                "set 2 - group 7").numpy()
    assert ours.shape == theirs.shape == (3, 84, 40, 3)
    np.testing.assert_array_equal(ours, theirs)

    # labeled sidecar: same bytes as the reference's save path
    clips = {f"video_{i}": torch.from_numpy(
        rng.random((4, 16, 16, 3)).astype(np.float32))
        for i in (1, 2)}
    meta = {"durations_frames": [2, 3]}
    ref.blend_videos(10.0, 4.0, audio_meta=meta, index=0,
                     total_sets=1, groups_in_last_set=16,
                     folder_path=str(tmp_path / "ref_out"),
                     with_labels=True, **clips)
    ref_video = tmp_path / "ref_out" / "WithLabels" / \
        "set1_combined.mp4"
    out_path = save_labeled_set_video(
        [clips["video_1"].numpy(), clips["video_2"].numpy()],
        meta, str(tmp_path / "our_out"), fps=10.0, index=0)
    assert out_path.endswith(os.path.join("WithLabels",
                                          "set1_combined.mp4"))
    ours_bytes = open(out_path, "rb").read()
    theirs_bytes = open(ref_video, "rb").read()
    assert ours_bytes == theirs_bytes


def test_render_video_grid_matches_reference(tmp_path):
    """Pixel parity with VRGDG_VideoFolderGridPlot
    (LTXLoraTrain.py:7926-8316): tensor-input grids match exactly;
    path-input grids match frame counts and bytes; hold-last-frame
    semantics for uneven lengths."""
    import cv2
    import math as m
    import torch

    from tests.reference_oracle import load_reference
    from vrgdg_tpu.runtime.video_io import (find_grid_videos,
                                            render_video_grid)

    ref_ns = load_reference(
        "LTXLoraTrain.py",
        ["VRGDG_LTXPreviewXYZPlot", "VRGDG_VideoFolderGridPlot"],
        extra_globals={"cv2": cv2, "torch": torch, "np": np,
                       "folder_paths": None})
    ref = ref_ns["VRGDG_VideoFolderGridPlot"]()

    rng = np.random.default_rng(7)
    batches = [rng.random((n, 20, 30, 3)).astype(np.float32)
               for n in (3, 5, 2)]
    labels = ["alpha", "", "gamma"]
    columns = ref._choose_columns(len(batches))
    cell_w, cell_h = ref._resolve_cell_size_from_images(
        [torch.from_numpy(b) for b in batches], 0, 0, True)
    expected = ref._build_grid_frames_from_images(
        [torch.from_numpy(b) for b in batches], cell_w, cell_h,
        columns, True, ["alpha", "video2", "gamma"]).numpy()
    ours = render_video_grid(batches, labels=labels)
    assert ours.shape == expected.shape == (5, 2 * cell_h,
                                            2 * cell_w, 3)
    np.testing.assert_array_equal(ours, expected)

    # path sources: hold-last-frame keeps shorter videos frozen
    paths = []
    for index, count in enumerate((4, 2)):
        path = str(tmp_path / f"clip{index}.mp4")
        writer = cv2.VideoWriter(path,
                                 cv2.VideoWriter_fourcc(*"mp4v"),
                                 10.0, (32, 24))
        for frame in range(count):
            writer.write(np.full((24, 32, 3), 40 * (frame + 1),
                                 np.uint8))
        writer.release()
        paths.append(path)
    grid = render_video_grid(paths, label_tiles=False)
    assert grid.shape == (4, 24, 64, 3)
    # the short clip's last frame repeats in frames 2..3
    np.testing.assert_array_equal(grid[2, :, 32:], grid[3, :, 32:])

    # folder listing excludes prior grid outputs
    (tmp_path / "x_VIDEOGRID_old.mp4").write_bytes(b"")
    listed = find_grid_videos(str(tmp_path))
    assert [os.path.basename(p) for p in listed] == ["clip0.mp4",
                                                     "clip1.mp4"]
