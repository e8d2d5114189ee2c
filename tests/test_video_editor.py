"""Video editor session store + remake queue (vrgdg_tpu.api.video_editor).

Parity targets: /root/reference/VRGDG_VideoEditorNodes.py — clip
listing with staged-remake visibility, session save that stages
selected clips into remake/, the session loader, and the remake queue's
staging + frame-locked audio slice.
"""

import json
import os
import wave

import numpy as np
import pytest

from vrgdg_tpu.api import video_editor as ve
from tests.test_builder_store import data_url_png, make_clip


def make_wav(path, seconds=10.0, rate=8000):
    t = np.arange(int(seconds * rate)) / rate
    samples = (np.sin(2 * np.pi * 220 * t) * 16000).astype(np.int16)
    with wave.open(str(path), "wb") as handle:
        handle.setnchannels(1)
        handle.setsampwidth(2)
        handle.setframerate(rate)
        handle.writeframes(samples.tobytes())
    return str(path)


@pytest.fixture()
def project(tmp_path):
    folder = tmp_path / "edit_proj"
    folder.mkdir()
    for number in (1, 2, 3):
        make_clip(folder / f"video_{number:04d}.mp4")
    make_clip(folder / "final_video.mp4")  # hidden from listings
    srt = folder / "cut.srt"
    srt.write_text(
        "1\n00:00:00,000 --> 00:00:02,000\nA\n\n"
        "2\n00:00:02,000 --> 00:00:05,000\nB\n\n"
        "3\n00:00:05,000 --> 00:00:08,000\nC\n")
    return folder


def test_resolve_and_helpers(tmp_path):
    sub = tmp_path / "clips"
    sub.mkdir()
    assert ve.resolve_editor_folder(str(sub)) == str(sub)
    assert ve.resolve_editor_folder("clips", roots=(str(tmp_path),)) \
        == str(sub)
    with pytest.raises(FileNotFoundError):
        ve.resolve_editor_folder("missing", roots=(str(tmp_path),))
    assert ve.parse_extensions("mp4, .mov") == (".mp4", ".mov")
    assert ve.parse_extensions("") == ve.VIDEO_EXTENSIONS
    assert ve.guess_clip_number("video_0007-audio.mp4", 99) == 7
    assert ve.guess_clip_number("take3.mp4", 99) == 3
    assert ve.guess_clip_number("clip.mp4", 4) == 4
    assert ve.format_seconds(65.5) == "1:05.500"


def test_list_clips_hides_finals_and_numbers(project):
    listing = ve.list_clips(str(project))
    names = [clip["name"] for clip in listing["clips"]]
    assert names == ["video_0001.mp4", "video_0002.mp4",
                     "video_0003.mp4"]
    assert [clip["clip_number"] for clip in listing["clips"]] == \
        [1, 2, 3]
    assert all(clip["url"].startswith("/vrgdg/video_editor/video?")
               for clip in listing["clips"])


def test_save_session_stages_remakes_and_lists_them(project):
    session = {"clips": {
        "video_0002.mp4": {
            "name": "video_0002.mp4", "clip_number": 2,
            "path": str(project / "video_0002.mp4"),
            "selected_for_remake": True, "t2i_prompt": "new look"},
        "video_0001.mp4": {
            "name": "video_0001.mp4", "clip_number": 1,
            "path": str(project / "video_0001.mp4")},
    }}
    result = ve.save_session(str(project), session)
    staged = result["staged_remakes"]
    assert len(staged) == 1 and not staged[0]["already_staged"]
    assert not os.path.isfile(project / "video_0002.mp4")
    assert os.path.isfile(project / "remake" / "video_0002.mp4")
    # the staged clip stays visible in listings via the session
    listing = ve.list_clips(str(project))
    staged_entries = [clip for clip in listing["clips"]
                      if "remake" in clip["path"]]
    assert len(staged_entries) == 1
    assert staged_entries[0]["clip_number"] == 2
    # idempotent second save: already_staged
    result = ve.save_session(str(project), result["session"])
    assert result["staged_remakes"][0]["already_staged"]

    loaded = ve.load_session(str(project))
    assert loaded["clips"]["video_0002.mp4"]["t2i_prompt"] == "new look"
    assert loaded["project_folder"] == str(project)


def test_save_frame_and_load_clip(project):
    result = ve.save_frame({
        "folder_path": str(project), "clip_name": "video_0002.mp4",
        "frame_time": 1.25, "image_data": data_url_png()})
    assert result["filename"] == "video_0002_frame_00001_250.png"
    assert os.path.isfile(result["frame_path"])

    ve.save_session(str(project), {"clips": {
        "k": {"name": "video_0003.mp4", "clip_number": 3,
              "path": str(project / "video_0003.mp4"),
              "t2i_prompt": "wide shot", "i2v_prompt": "dolly in",
              "captured_frame_path": result["frame_path"],
              "selected_for_remake": False}}})
    session_path = ve.session_path_for(str(project))
    clip = ve.load_clip(session_path, clip_number=3)
    assert clip["found"] and clip["t2i_prompt"] == "wide shot"
    assert clip["captured_frame_path"] == result["frame_path"]
    by_path = ve.load_clip(session_path,
                           clip_path=str(project / "video_0003.mp4"))
    assert by_path["i2v_prompt"] == "dolly in"
    assert not ve.load_clip(session_path, clip_number=42)["found"]


def test_remake_queue_drains_in_order(project, tmp_path):
    wav = make_wav(tmp_path / "song.wav", seconds=10.0)
    session = {"project_folder": str(project), "clips": {
        f"video_{n:04d}.mp4": {
            "name": f"video_{n:04d}.mp4", "clip_number": n,
            "path": str(project / f"video_{n:04d}.mp4"),
            "selected_for_remake": n in (1, 3),
            "t2i_prompt": f"prompt {n}"}
        for n in (1, 2, 3)}}
    ve.save_session(str(project), session)
    session_path = ve.session_path_for(str(project))
    srt = str(project / "cut.srt")

    first = ve.next_remake(session_path, srt, wav, fps=24,
                           tail_loss_frames=5, pre_frames=8)
    assert first["is_valid"] and first["clip_number"] == 1
    assert first["pre_frames"] == 0  # no preroll on clip 1
    # clip 1: 0..2 s @24 = 48 frames; +5 tail = 53 -> 8N+1 = 57
    assert first["frames_per_scene"] == 48
    assert first["frames_for_ltx"] == 57
    audio = first["audio"]
    assert audio["sample_rate"] == 44100
    assert audio["waveform"].shape[-1] == round(57 / 24 * 44100)
    assert first["remaining_remakes"] == 1
    assert os.path.isfile(first["backup_path"])
    assert "backup" in first["backup_path"]

    second = ve.next_remake(session_path, srt, wav, fps=24,
                            tail_loss_frames=5, pre_frames=8)
    assert second["clip_number"] == 3
    assert second["pre_frames"] == 8
    # clip 3: 5..8 s extended to audio end 10 s -> 5..10 = 120 frames;
    # +8 pre +5 tail = 133 -> 8N+1 = 137
    assert second["frames_per_scene"] == 120
    assert second["frames_for_ltx"] == 137
    assert second["remaining_remakes"] == 0

    done = ve.next_remake(session_path, srt, wav)
    assert not done["is_valid"]
    assert "remake folder" in done["instructions"]

    # untouched clip 2 never moved
    assert os.path.isfile(project / "video_0002.mp4")


def test_remake_queue_explicit_index_and_no_selection(project, tmp_path):
    wav = make_wav(tmp_path / "song.wav", seconds=10.0)
    ve.save_session(str(project), {"clips": {}})
    result = ve.next_remake(ve.session_path_for(str(project)),
                            str(project / "cut.srt"), wav)
    assert not result["is_valid"]
    assert "No selected remake clips" in result["instructions"]

    session = {"clips": {
        "video_0002.mp4": {"name": "video_0002.mp4", "clip_number": 2,
                           "path": str(project / "video_0002.mp4"),
                           "selected_for_remake": True}}}
    ve.save_session(str(project), session)
    result = ve.next_remake(ve.session_path_for(str(project)),
                            str(project / "cut.srt"), wav,
                            queue_index=1, fps=24)
    assert result["is_valid"] and result["clip_number"] == 2
    assert result["queue_position"] == 1
    # clip 2: 2..5 s = 72 frames; +5 tail (pre applies: clip 2) = 77
    # with pre_frames default 0 -> 8N+1 = 81
    assert result["frames_for_ltx"] == 81


def test_concurrent_remake_next_no_double_serve(project, tmp_path):
    """Two pollers hitting the queue concurrently must not both pop the
    same staged clip (the reference serializes on its event loop)."""
    import threading

    wav = make_wav(tmp_path / "song.wav", seconds=10.0)
    session = {"project_folder": str(project), "clips": {
        f"video_{n:04d}.mp4": {
            "name": f"video_{n:04d}.mp4", "clip_number": n,
            "path": str(project / f"video_{n:04d}.mp4"),
            "selected_for_remake": True}
        for n in (1, 2, 3)}}
    ve.save_session(str(project), session)
    session_path = ve.session_path_for(str(project))
    srt = str(project / "cut.srt")
    served, errors = [], []

    def poll():
        try:
            while True:
                item = ve.next_remake(session_path, srt, wav, fps=24)
                if not item["is_valid"]:
                    return
                served.append(item["clip_number"])
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=poll) for _ in range(3)]
    for thread in threads:
        thread.start()
    for thread in threads:
        thread.join()
    assert not errors
    assert sorted(served) == [1, 2, 3]  # each clip served exactly once
