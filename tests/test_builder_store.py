"""Music Video Builder project store (vrgdg_tpu.api.builder).

Behavior parity targets: the non-LLM backend of
/root/reference/VRGDG_MusicVideoBuilderNodes.py — project lifecycle,
session persistence + rehydration, portable ZIP round trips, scene
media/audio management, timeline audio mix, beat estimation, CapCut
import, and the scene-video scan/restore flows.
"""

import base64
import json
import os
import shutil
import wave
import zipfile

import cv2
import numpy as np
import pytest

from vrgdg_tpu.api import builder


# ---------------------------------------------------------------- helpers

def make_wav(path, seconds=1.0, rate=8000, value=9000, channels=2):
    frames = int(seconds * rate)
    samples = np.full(frames * channels, value, np.int16)
    with wave.open(str(path), "wb") as handle:
        handle.setnchannels(channels)
        handle.setsampwidth(2)
        handle.setframerate(rate)
        handle.writeframes(samples.tobytes())
    return str(path)


def make_click_wav(path, bpm=120.0, seconds=8.0, rate=8000):
    t = np.zeros(int(seconds * rate), np.float32)
    step = 60.0 / bpm
    beat = 0.0
    while beat < seconds - 0.05:
        index = int(beat * rate)
        length = int(0.02 * rate)
        t[index:index + length] = np.sin(
            2 * np.pi * 880 * np.arange(length) / rate) * 0.9
        beat += step
    samples = (t * 32000).astype(np.int16)
    with wave.open(str(path), "wb") as handle:
        handle.setnchannels(1)
        handle.setsampwidth(2)
        handle.setframerate(rate)
        handle.writeframes(samples.tobytes())
    return str(path)


def make_image(path, color=(0, 128, 255), size=(32, 24)):
    frame = np.zeros((size[1], size[0], 3), np.uint8)
    frame[:] = color
    assert cv2.imwrite(str(path), frame)
    return str(path)


def make_clip(path, frames=8, size=(48, 32), last_color=(0, 255, 0)):
    writer = cv2.VideoWriter(str(path),
                             cv2.VideoWriter_fourcc(*"mp4v"), 8.0, size)
    assert writer.isOpened()
    for index in range(frames):
        frame = np.zeros((size[1], size[0], 3), np.uint8)
        frame[:] = last_color if index == frames - 1 else (40, 40, 40)
        writer.write(frame)
    writer.release()
    return str(path)


def data_url_png(color=(10, 200, 30)):
    frame = np.zeros((8, 8, 3), np.uint8)
    frame[:] = color
    ok, buf = cv2.imencode(".png", frame)
    assert ok
    return ("data:image/png;base64,"
            + base64.b64encode(buf.tobytes()).decode())


# ---------------------------------------------------------------- lifecycle

def test_new_project_skeleton_and_unique_suffix(tmp_path):
    root = str(tmp_path / "out")
    first = builder.new_project({"project_name": "My Clip!"}, root)
    assert os.path.isdir(first["images_folder"])
    assert os.path.isdir(first["context_folder"])
    assert os.path.basename(first["project_folder"]) == "My Clip"
    for key in ("concept_prompts_path", "theme_style_path"):
        assert os.path.isfile(first[key])
    second = builder.new_project({"project_name": "My Clip!"}, root)
    assert second["project_folder"].endswith("_002")


def test_save_and_load_session_snapshot(tmp_path):
    root = str(tmp_path / "out")
    external = make_image(tmp_path / "ext.png")
    audio = make_wav(tmp_path / "song.wav")
    theme = tmp_path / "theme.txt"
    theme.write_text("moody")
    session = {
        "segments": [
            {"id": "a", "start": 0.0, "end": 4.0, "label": "Intro",
             "approved_image_path": external, "t2i_prompt": "a shot",
             "timeline_note": "wide"},
            {"id": "b", "start": 4.0, "end": 8.0, "label": "Verse",
             "i2v_prompt": "pan left"},
        ],
        "theme_style_path": str(theme),
    }
    result = builder.save_session(
        {"project_name": "proj", "audio_path": audio,
         "session": session}, root)
    folder = result["project_folder"]
    layout = builder.ProjectLayout(folder)
    # the audio + context text files are snapshotted; scene media stays
    # where it is (the ingest belongs to save-as/export — a plain save
    # must not duplicate media, reference :8380-8498)
    saved = result["session"]
    assert saved["segments"][0]["approved_image_path"] == external
    assert saved["theme_style_path"].startswith(layout.context_folder)
    assert saved["audio_path"].startswith(layout.project_audio_folder)
    # SRT + scene notes + prompt exports written
    srt_text = open(layout.srt_path).read()
    assert "Intro" in srt_text and "00:00:04,000" in srt_text
    notes = json.load(open(layout.scene_notes_path))
    assert notes["SceneNote1"] == "wide"
    assert "a shot" in open(os.path.join(layout.prompts_folder,
                                         "t2i_prompts.txt")).read()
    assert "pan left" in open(os.path.join(layout.prompts_folder,
                                           "i2v_prompts.txt")).read()

    loaded = builder.load_session(folder)
    assert loaded["session"]["segments"][0]["label"] == "Intro"
    # second save backs up the first session file
    builder.save_session({"project_folder": folder,
                          "session": saved}, root)
    assert os.listdir(layout.session_backups_folder)


def test_bulk_lyric_clear_guard(tmp_path):
    root = str(tmp_path / "out")
    segments = [{"id": f"s{i}", "start": i * 4.0, "end": i * 4.0 + 4,
                 "lyric_text": f"line {i}"} for i in range(3)]
    result = builder.save_session(
        {"project_name": "guard",
         "session": {"segments": segments}}, root)
    folder = result["project_folder"]
    wiped = [dict(seg, lyric_text="") for seg in segments]
    result = builder.save_session(
        {"project_folder": folder, "session": {"segments": wiped}}, root)
    restored = result["session"]["segments"]
    assert [seg["lyric_text"] for seg in restored] == \
        ["line 0", "line 1", "line 2"]
    assert result["restored_lyric_lines"] == 3
    # explicit opt-out clears for real
    wiped = [dict(seg, lyric_text="") for seg in segments]
    result = builder.save_session(
        {"project_folder": folder,
         "session": {"segments": wiped,
                     "allow_bulk_lyric_clear": True}}, root)
    assert all(not seg["lyric_text"]
               for seg in result["session"]["segments"])


def test_rehydrate_after_project_move(tmp_path):
    root = str(tmp_path / "out")
    result = builder.save_session(
        {"project_name": "move_me",
         "session": {"segments": [{"id": "a", "start": 0.0,
                                   "end": 4.0}]}}, root)
    old_folder = result["project_folder"]
    # store the approved image the real way (the UI's save_scene_image)
    builder.save_scene_image({"project_folder": old_folder,
                              "scene_number": 1,
                              "image_data": data_url_png()})
    new_folder = os.path.join(root, "moved_here")
    shutil.move(old_folder, new_folder)
    loaded = builder.load_session(new_folder)
    seg = loaded["session"]["segments"][0]
    assert seg["approved_image_path"] == \
        builder.ProjectLayout(new_folder).scene_image_path(1, ".png")
    assert os.path.isfile(seg["approved_image_path"])


def test_rehydrate_keeps_live_old_root_paths(tmp_path):
    """A path inside the recorded old project folder that still exists
    there (and was never copied into the new folder) must survive the
    load — reference :1779-1784 only rebases when the rebased file
    exists."""
    root = str(tmp_path / "out")
    old_folder = os.path.join(root, "old_proj")
    side_image = make_image(
        (lambda p: (os.makedirs(os.path.dirname(p)), p)[1])(
            os.path.join(old_folder, "side_notes", "ref.png")))
    new_folder = os.path.join(root, "new_proj")
    layout = builder.ProjectLayout(new_folder)
    layout.ensure_base_folders()
    builder._write_json(layout.session_path, {
        "project_folder": old_folder,
        "segments": [{"id": "a", "start": 0, "end": 4,
                      "ref_image_path": side_image}]})
    seg = builder.load_session(new_folder)["session"]["segments"][0]
    assert seg["ref_image_path"] == side_image


def test_repeated_saves_do_not_duplicate_history(tmp_path):
    root = str(tmp_path / "out")
    history_image = make_image(tmp_path / "take1.png")
    session = {"segments": [{"id": "a", "start": 0, "end": 4,
                             "image_history": [history_image],
                             "image_history_index": 0}]}
    result = builder.save_session(
        {"project_name": "stable", "session": session}, root)
    folder = result["project_folder"]
    for _round in range(3):
        result = builder.save_session(
            {"project_folder": folder,
             "session": result["session"]}, root)
    previews = builder.ProjectLayout(folder).previews_root
    assert not os.path.isdir(previews) or not any(
        files for _dir, _sub, files in os.walk(previews))
    assert result["session"]["segments"][0]["image_history"] == \
        [history_image]


def test_rehydrate_recovers_scenes_from_loose_media(tmp_path):
    folder = tmp_path / "proj"
    layout = builder.ProjectLayout(str(folder))
    layout.ensure_base_folders()
    make_image(layout.scene_image_path(1))
    make_image(layout.scene_image_path(3))
    builder._write_json(layout.session_path, {"segments": []})
    loaded = builder.load_session(str(folder))
    segments = loaded["session"]["segments"]
    assert len(segments) == 3
    assert segments[0]["source"] == "recovered"
    assert segments[0]["approved_image_path"].endswith("image_0001.png")
    assert segments[2]["start"] == 8.0


def test_rehydrate_marks_rendered_videos_done(tmp_path):
    folder = tmp_path / "proj"
    layout = builder.ProjectLayout(str(folder))
    layout.ensure_base_folders()
    os.makedirs(layout.videos_folder)
    make_clip(layout.scene_video_path(1))
    builder._write_json(layout.session_path, {"segments": [
        {"id": "a", "start": 0, "end": 4, "label": "new scene"}]})
    seg = builder.load_session(str(folder))["session"]["segments"][0]
    assert seg["video_status"] == "done"
    assert seg["video_path"] == os.path.abspath(
        layout.scene_video_path(1))
    assert seg["label"] == "Scene 1"


def test_save_project_as_rejects_nested_target(tmp_path):
    root = str(tmp_path / "out")
    result = builder.save_session(
        {"project_name": "base", "session": {"segments": []}}, root)
    with pytest.raises(ValueError):
        builder.save_project_as(
            {"source_project_folder": result["project_folder"],
             "target_project_folder": os.path.join(
                 result["project_folder"], "inner"),
             "session": {"segments": []}}, root)


def test_save_project_as_copies_into_new_folder(tmp_path):
    root = str(tmp_path / "out")
    image = make_image(tmp_path / "img.png")
    first = builder.save_session(
        {"project_name": "orig",
         "session": {"segments": [
             {"id": "a", "start": 0, "end": 4,
              "approved_image_path": image}]}}, root)
    saved = builder.save_project_as(
        {"source_project_folder": first["project_folder"],
         "target_project_folder": "copy",
         "session": first["session"]}, root)
    new_layout = builder.ProjectLayout(saved["project_folder"])
    assert saved["project_folder"] != first["project_folder"]
    seg = saved["session"]["segments"][0]
    assert seg["approved_image_path"] == \
        new_layout.scene_image_path(1, ".png")
    assert os.path.isfile(seg["approved_image_path"])


def test_list_and_delete_projects(tmp_path):
    root = str(tmp_path / "out")
    keep = builder.save_session(
        {"project_name": "keep", "session": {"segments": [{}]}}, root)
    outside_root = str(tmp_path / "elsewhere")
    builder.save_session(
        {"project_folder": os.path.join(outside_root, "ext"),
         "session": {"segments": []}}, root)
    listing = builder.list_projects(root, outside_root)
    names = {item["name"]: item for item in listing["projects"]}
    assert names["keep"]["scene_count"] == 1
    assert names["keep"]["can_delete"]
    assert not names["ext"]["can_delete"]
    with pytest.raises(ValueError):
        builder.delete_project(
            {"project_folder": os.path.join(outside_root, "ext")}, root)
    result = builder.delete_project(
        {"project_folder": keep["project_folder"]}, root)
    assert result["deleted"]
    assert not os.path.exists(keep["project_folder"])
    # refuses folders that are not builder projects
    plain = tmp_path / "out" / "plain"
    plain.mkdir(parents=True)
    with pytest.raises(ValueError):
        builder.delete_project({"project_folder": str(plain)}, root)


# ---------------------------------------------------------------- zip

def test_export_import_roundtrip(tmp_path):
    root = str(tmp_path / "out")
    external = make_image(tmp_path / "loose_asset.png")
    result = builder.save_session(
        {"project_name": "pack",
         "session": {"segments": [
             {"id": "a", "start": 0, "end": 4, "label": "One",
              "lyric_text": "hello"}],
             "mood_board_image": external}}, root)
    zip_path, download_name = builder.export_project(
        result["project_folder"])
    try:
        assert download_name == "pack.vrgdg.zip"
        with zipfile.ZipFile(zip_path) as archive:
            names = archive.namelist()
        assert builder.SESSION_FILENAME in names
        assert builder.PACKAGE_MANIFEST in names
        # the loose external file was localized into portable_assets
        assert any(name.startswith("portable_assets/")
                   and name.endswith("loose_asset.png")
                   for name in names)
        imported = builder.import_project(zip_path, "unpacked", root)
    finally:
        os.remove(zip_path)
    assert imported["imported_project_name"] == "unpacked"
    session = imported["session"]
    assert session["segments"][0]["lyric_text"] == "hello"
    assert session["project_folder"] == imported["project_folder"]
    # the localized asset path now points inside the imported project
    assert session["mood_board_image"].startswith(
        imported["project_folder"])
    assert os.path.isfile(session["mood_board_image"])


def test_import_rejects_unsafe_zip_members(tmp_path):
    bad = tmp_path / "bad.zip"
    with zipfile.ZipFile(bad, "w") as archive:
        archive.writestr(builder.SESSION_FILENAME, "{}")
        archive.writestr("../escape.txt", "nope")
    with pytest.raises(ValueError, match="Unsafe path"):
        builder.import_project(str(bad), "x", str(tmp_path / "out"))

    empty = tmp_path / "nosession.zip"
    with zipfile.ZipFile(empty, "w") as archive:
        archive.writestr("readme.txt", "hi")
    with pytest.raises(ValueError, match="portable Video Builder"):
        builder.import_project(str(empty), "x", str(tmp_path / "out"))

    link = tmp_path / "link.zip"
    with zipfile.ZipFile(link, "w") as archive:
        archive.writestr(builder.SESSION_FILENAME, "{}")
        info = zipfile.ZipInfo("evil_link")
        info.external_attr = (0o120777 << 16)
        archive.writestr(info, "/etc/passwd")
    with pytest.raises(ValueError, match="Symbolic links"):
        builder.import_project(str(link), "x", str(tmp_path / "out"))


# ---------------------------------------------------------------- media

def test_scene_image_save_and_archive(tmp_path):
    folder = str(tmp_path / "proj")
    saved = builder.save_scene_image(
        {"project_folder": folder, "scene_number": 2,
         "image_data": data_url_png()})
    assert saved["saved_path"].endswith("image_0002.png")
    image = cv2.imread(saved["saved_path"])
    assert tuple(int(v) for v in image[0, 0]) == (10, 200, 30)

    source = make_image(tmp_path / "src.jpg")
    archived = builder.archive_scene_image(
        {"project_folder": folder, "scene_number": 2,
         "source_path": source})
    assert "scene_image_previews" in archived["saved_path"]
    assert archived["saved_path"].endswith(".jpg")


def test_delete_media_containment(tmp_path):
    folder = tmp_path / "proj"
    folder.mkdir()
    inside = make_image(folder / "img.png")
    outside = make_image(tmp_path / "other.png")
    with pytest.raises(ValueError, match="outside"):
        builder.delete_media({"project_folder": str(folder),
                              "path": outside})
    result = builder.delete_media({"project_folder": str(folder),
                                   "path": inside})
    assert result["deleted"] and not os.path.exists(inside)
    again = builder.delete_media({"project_folder": str(folder),
                                  "path": inside})
    assert not again["deleted"]


def test_extract_final_frame(tmp_path):
    folder = tmp_path / "proj"
    folder.mkdir()
    clip = make_clip(folder / "scene.mp4", last_color=(0, 255, 0))
    result = builder.extract_final_frame(
        {"project_folder": str(folder), "source_path": clip,
         "scene_number": 1})
    frame = cv2.imread(result["saved_path"])
    assert frame is not None
    blue, green, red = (int(v) for v in frame[5, 5])
    assert green > 180 and blue < 90 and red < 90
    outside_clip = make_clip(tmp_path / "outside.mp4")
    with pytest.raises(ValueError, match="inside"):
        builder.extract_final_frame(
            {"project_folder": str(folder),
             "source_path": outside_clip})


def test_reference_image_and_card_import(tmp_path):
    folder = tmp_path / "proj"
    result = builder.save_reference_image(
        {"project_folder": str(folder), "reference_type": "subject",
         "name": "Hero", "image_data": data_url_png((1, 2, 3))})
    assert "flux_references" in result["saved_path"]
    assert result["saved_path"].endswith("Hero.png")

    card_dir = folder / "subject_location" / "subject"
    card_dir.mkdir(parents=True)
    make_image(card_dir / "alice.png")
    (card_dir / "alice.txt").write_text("tall, green coat")
    make_image(card_dir / "bob.png")
    cards = builder.import_reference_cards(
        {"project_folder": str(folder)}, "subject")
    assert [card["name"] for card in cards["subjects"]] == \
        ["alice", "bob"]
    assert cards["subjects"][0]["description"] == "tall, green coat"
    assert cards["subjects"][0]["image"]["data"].startswith(
        "data:image/jpeg")
    assert cards["missing_descriptions"] == ["bob.txt"]
    with pytest.raises(FileNotFoundError):
        builder.import_reference_cards(
            {"project_folder": str(folder)}, "location")


# ---------------------------------------------------------------- audio

def test_save_scene_and_project_audio(tmp_path):
    folder = str(tmp_path / "proj")
    source = make_wav(tmp_path / "clip.wav", seconds=0.5)
    result = builder.save_scene_audio(
        {"project_folder": folder, "scene_number": 3,
         "source_path": source})
    assert result["saved_path"].endswith("audio_0003.wav")
    assert result["duration"] == pytest.approx(0.5, abs=0.01)
    assert max(result["peaks"]) > 0

    master = make_wav(tmp_path / "master.wav", seconds=1.0)
    result = builder.save_project_audio(
        {"project_folder": folder, "audio_name": "master.wav",
         "source_path": master})
    assert result["saved_path"].endswith("project_audio.wav")
    assert "beats" in result and "tempo_bpm" in result

    raw = open(master, "rb").read()
    result = builder.save_project_audio(
        {"project_folder": folder, "audio_name": "upload.wav",
         "audio_data": base64.b64encode(raw).decode()})
    assert result["duration"] == pytest.approx(1.0, abs=0.01)


def test_trim_scene_audio_clamps_and_errors(tmp_path):
    folder = str(tmp_path / "proj")
    source = make_wav(tmp_path / "clip.wav", seconds=2.0)
    result = builder.trim_scene_audio(
        {"project_folder": folder, "source_path": source,
         "scene_number": 1, "start": 1.5, "duration": 5.0})
    assert result["duration"] == pytest.approx(0.5, abs=0.01)
    assert result["requested_duration"] == 5.0
    with wave.open(result["audio_path"], "rb") as handle:
        assert handle.getframerate() == 44100
        assert handle.getnchannels() == 2
    with pytest.raises(ValueError, match="starts after"):
        builder.trim_scene_audio(
            {"project_folder": folder, "source_path": source,
             "scene_number": 1, "start": 3.0, "duration": 1.0})


def test_mix_scene_audio_timeline(tmp_path):
    folder = str(tmp_path / "proj")
    loud = make_wav(tmp_path / "loud.wav", seconds=1.0, value=16000)
    quiet = make_wav(tmp_path / "quiet.wav", seconds=1.0, value=4000)
    segments = [
        {"start": 0.0, "end": 1.0, "custom_audio_path": loud,
         "label": "A"},
        # gap 1.0..2.0 -> silence part
        {"start": 2.0, "end": 3.0, "custom_audio_path": quiet,
         "label": "B"},
    ]
    result = builder.mix_scene_audio(
        {"project_folder": folder, "segments": segments})
    assert result["scene_count"] == 2
    assert result["duration"] == pytest.approx(3.0, abs=0.02)
    with wave.open(result["audio_path"], "rb") as handle:
        rate = handle.getframerate()
        data = np.frombuffer(handle.readframes(handle.getnframes()),
                             "<i2").reshape(-1, 2)
    amp = np.abs(data[:, 0]).astype(float) / 32767.0
    assert amp[int(0.5 * rate)] == pytest.approx(16000 / 32768, abs=0.02)
    assert amp[int(1.5 * rate)] == 0.0
    assert amp[int(2.5 * rate)] == pytest.approx(4000 / 32768, abs=0.02)
    assert os.path.isfile(result["srt_path"])

    with pytest.raises(ValueError, match="custom audio is missing"):
        builder.mix_scene_audio(
            {"project_folder": folder,
             "segments": [{"start": 0.0, "end": 1.0}]})
    # global audio fallback slices the master track at the scene window
    result = builder.mix_scene_audio(
        {"project_folder": folder,
         "segments": [{"start": 0.0, "end": 0.5}],
         "global_audio_path": loud})
    assert result["duration"] == pytest.approx(0.5, abs=0.02)
    # allow_missing fills with silence
    result = builder.mix_scene_audio(
        {"project_folder": folder,
         "segments": [{"start": 0.0, "end": 0.5}],
         "allow_missing_scene_audio": True})
    assert result["peaks"] and max(result["peaks"]) == 0.0


def test_beats_from_peaks_and_tempo():
    # clicks every 10th bucket over 20 s -> beat spacing 2 s
    peaks = [1.0 if index % 10 == 0 else 0.05 for index in range(100)]
    beats = builder.beats_from_peaks(peaks, 20.0)
    assert len(beats) >= 8
    spacing = np.diff(beats)
    assert np.allclose(spacing, 2.0, atol=0.21)
    assert builder.tempo_from_beats(beats) == pytest.approx(30.0,
                                                            abs=0.5)
    assert builder.beats_from_peaks([], 10.0) == []
    assert builder.tempo_from_beats([]) == 0.0


def test_analyze_audio_click_track(tmp_path):
    click = make_click_wav(tmp_path / "click.wav", bpm=120.0,
                           seconds=8.0)
    result = builder.analyze_audio({"audio_path": click,
                                    "target_peaks": 400})
    assert result["duration"] == pytest.approx(8.0, abs=0.05)
    assert len(result["peaks"]) == 400
    assert result["tempo_bpm"] == pytest.approx(120.0, rel=0.1)
    assert len(result["beats"]) >= 10
    spacing = np.diff(result["beats"])
    assert np.median(spacing) == pytest.approx(0.5, abs=0.06)


def test_save_project_srt_and_scene_srt(tmp_path):
    folder = str(tmp_path / "proj")
    srt_text = ("1\n00:00:00,000 --> 00:00:02,500\nHello\n\n"
                "2\n00:00:02,500 --> 00:00:05,000\nWorld\n")
    result = builder.save_project_srt(
        {"project_folder": folder, "srt_text": srt_text})
    assert [seg["label"] for seg in result["segments"]] == \
        ["Hello", "World"]
    assert result["segments"][1]["start"] == 2.5
    with pytest.raises(ValueError):
        builder.save_project_srt({"project_folder": folder,
                                  "srt_text": "  "})
    single = builder.save_scene_srt(
        {"project_folder": folder, "scene_number": 7,
         "start_time": 1.0, "duration": 2.0, "label": "Bridge"})
    text = open(single["srt_path"]).read()
    assert "00:00:01,000 --> 00:00:03,000" in text
    assert "Bridge" in text


# ---------------------------------------------------------------- videos

def test_scan_and_restore_scene_videos(tmp_path):
    folder = tmp_path / "proj"
    layout = builder.ProjectLayout(str(folder))
    layout.ensure_base_folders()
    os.makedirs(layout.videos_folder)
    make_clip(layout.scene_video_path(1))
    # a stray render in a scratch folder named after scene 2
    scratch = folder / "image_to_video_clips_run1" / "scene_2"
    scratch.mkdir(parents=True)
    make_clip(scratch / "video_0001-audio.mp4")
    result = builder.scan_scene_videos(str(folder))
    assert set(result["videos"]) == {"1", "2"}
    assert result["recovered_from_scratch"] == {
        "2": str(scratch / "video_0001-audio.mp4")}
    assert os.path.isfile(result["video_thumbnails"]["1"])

    replacement = make_clip(tmp_path / "new_take.mp4", frames=12)
    restored = builder.restore_scene_video(
        {"project_folder": str(folder), "scene_number": 1,
         "source_path": replacement})
    assert restored["video_path"] == os.path.abspath(
        layout.scene_video_path(1))
    assert restored["backup_path"]
    assert os.path.isfile(restored["backup_path"])
    rescanned = builder.scan_scene_videos(str(folder))
    assert rescanned["video_backups"]["1"] == [restored["backup_path"]]


def test_restore_scene_video_duration_confirmation(tmp_path):
    folder = tmp_path / "proj"
    folder.mkdir()
    clip = make_clip(tmp_path / "take.mp4", frames=8)  # 1 s @ 8 fps
    result = builder.restore_scene_video(
        {"project_folder": str(folder), "scene_number": 1,
         "source_path": clip, "expected_duration": 10.0})
    assert result["needs_confirmation"]
    confirmed = builder.restore_scene_video(
        {"project_folder": str(folder), "scene_number": 1,
         "source_path": clip, "expected_duration": 10.0,
         "confirm_duration_mismatch": True})
    assert confirmed["video_path"]


# ---------------------------------------------------------------- logs etc.

def test_render_log_report_and_session_fold_in(tmp_path):
    folder = str(tmp_path / "proj")
    builder._write_json(
        builder.ProjectLayout(folder).session_path, {"segments": []})
    log = {
        "id": "run one!", "status": "complete",
        "summary": {"total_ms": 95000, "render_ms": 60000,
                    "completed_scenes": 2, "target_scenes": 2,
                    "average_render_ms": 30000},
        "scenes": [{"scene_number": 1, "status": "done",
                    "total_ms": 45000, "render_ms": 30000,
                    "video_path": "/tmp/v1.mp4"}],
        "final_video_path": "/tmp/final.mp4",
    }
    result = builder.save_render_log({"project_folder": folder,
                                      "log": log})
    report = open(result["report_text_path"]).read()
    assert "Total wall time: 1m 35s" in report
    assert "Scenes completed: 2/2" in report
    assert "Scene 1 [DONE]" in report
    assert "Final video: /tmp/final.mp4" in report
    session = json.load(open(
        builder.ProjectLayout(folder).session_path))
    assert session["render_logs"][0]["id"] == "run_one"
    assert session["active_render_log_id"] == ""
    # 25 logs keep only the last 20
    for index in range(25):
        builder.save_render_log(
            {"project_folder": folder,
             "log": {"id": f"r{index}", "status": "running"}})
    session = json.load(open(
        builder.ProjectLayout(folder).session_path))
    assert len(session["render_logs"]) == 20
    assert session["active_render_log_id"] == "r24"

    assert builder.duration_label_ms(3_720_000) == "1h 02m 00s"
    assert builder.duration_label_ms(1600) == "2s"
    assert builder.duration_label_ms("bad") == "0s"


def test_wizard_draft_roundtrip(tmp_path):
    folder = str(tmp_path / "proj")
    saved = builder.save_wizard_draft(
        {"project_folder": folder,
         "lyrics": "line one\r\nline two",
         "draft": {"step": 3},
         "raw_outputs": {"plan": {"a": 1}, "notes../x": "text"}})
    assert saved["draft"]["lyrics"] == "line one\nline two"
    assert os.path.isfile(saved["wizard_lyrics_path"])
    names = set(os.listdir(saved["wizard_folder"]))
    assert "plan.txt" in names or "plan.json" in names
    # the path separator is neutralized so the name cannot traverse
    assert any(name.startswith("notes") and os.sep not in name
               for name in names)
    loaded = builder.load_wizard_draft({"project_folder": folder})
    assert loaded["exists"]
    assert loaded["draft"]["step"] == 3
    assert loaded["draft"]["lyrics"] == "line one\nline two"


def test_model_defaults_scrub_roundtrip(tmp_path):
    root = str(tmp_path / "out")
    session = {
        "image_model_mode": "zimage",
        "zimage_settings": {"steps": 20, "use_image_to_image": True,
                            "image_to_image_path": "/secret.png"},
        "unrelated": "ignored",
    }
    path = builder.save_model_defaults(session, root)
    assert os.path.isfile(path)
    loaded = builder.load_model_defaults(root)
    defaults = loaded["defaults"]
    assert defaults["image_model_mode"] == "zimage"
    assert defaults["zimage_settings"]["steps"] == 20
    assert defaults["zimage_settings"]["use_image_to_image"] is False
    assert defaults["zimage_settings"]["image_to_image_path"] == ""
    assert "unrelated" not in defaults
    assert builder.save_model_defaults({}, root) == ""


# ---------------------------------------------------------------- loaders

def test_load_srt_and_prompt_json(tmp_path):
    srt = tmp_path / "cut.srt"
    srt.write_text("1\n00:00:00,000 --> 00:00:03,000\nOpening shot\n")
    result = builder.load_srt(str(srt))
    assert result["segments"][0]["label"] == "Opening shot"
    assert result["segments"][0]["source"] == "srt"

    prompts = tmp_path / "p.json"
    prompts.write_text(json.dumps({"Prompt2": "second",
                                   "Prompt10": "tenth",
                                   "Prompt1": "first"}))
    result = builder.load_prompt_json(str(prompts))
    assert result["prompts"] == ["first", "second", "tenth"]
    listed = tmp_path / "list.json"
    listed.write_text(json.dumps(["a", {"p1": "b"}]))
    assert builder.load_prompt_json(str(listed))["prompts"] == ["a", "b"]
    bad = tmp_path / "bad.json"
    bad.write_text('"just a string"')
    with pytest.raises(ValueError):
        builder.load_prompt_json(str(bad))


def test_prompt_creator_paths_and_copy(tmp_path):
    root = str(tmp_path / "out")
    # a finished prompt-creator project
    source = builder.ProjectLayout(os.path.join(root, "pc_source"))
    source.ensure_base_folders()
    with open(os.path.join(source.context_folder,
                           "ConceptPrompts.txt"), "w") as handle:
        json.dump({"Prompt1": "hello"}, handle)
    open(source.srt_path, "w").write(
        "1\n00:00:00,000 --> 00:00:02,000\nA\n")
    builder._write_json(
        os.path.join(source.context_folder,
                     "prompt_creator_output.json"),
        {"type": "vrgdg_prompt_creator_output"})
    audio_dir = os.path.join(source.root, "audio")
    os.makedirs(audio_dir)
    make_wav(os.path.join(audio_dir, "song.wav"))

    target = builder.ProjectLayout(os.path.join(root, "video_proj"))
    target.ensure_base_folders()
    result = builder.copy_prompt_creator_outputs(target.root, "", root)
    assert result["source_project_folder"] == source.root
    assert result["ready"]
    assert os.path.isfile(result["concept_prompts_path"])
    assert os.path.isfile(result["srt_path"])
    assert result["copied"]["audio"].endswith("song.wav")

    paths = builder.prompt_creator_paths(target.root)
    assert paths["exists"]["concept_prompts_path"]
    assert paths["audio_path"].endswith("song.wav")


def test_default_paths(tmp_path):
    root = str(tmp_path / "out")
    defaults = builder.default_context_paths(root)
    assert defaults["theme_style_path"].endswith(
        os.path.join("themestyle", "themestyle.txt"))
    audio_dir = os.path.join(root, "VRGDG_AudioFiles")
    os.makedirs(audio_dir)
    make_wav(os.path.join(audio_dir, "latest.wav"))
    result = builder.default_audio_srt_paths(root)
    assert result["audio_path"].endswith("latest.wav")
    assert result["srt_path"] == ""


# ---------------------------------------------------------------- capcut

def _capcut_fixture(tmp_path, marker_count=4, cache_count=4):
    draft_dir = tmp_path / "capcut" / "proj1"
    draft_dir.mkdir(parents=True)
    cache_path = draft_dir / "beats_cache.json"
    cache = {"time": [(i + 1) * 500 for i in range(cache_count)],
             "value": [0.9] * cache_count}
    cache_path.write_text(json.dumps(cache))
    draft = {
        "name": "My Edit",
        "duration": 8_000_000,
        "fps": 30.0,
        "materials": {
            "audios": [{"id": "aud1", "name": "song.mp3",
                        "path": "C:/song.mp3"}],
            "time_marks": [{
                "id": "marks1",
                "mark_items": [
                    {"time_range": {"start": (i + 1) * 500_000}}
                    for i in range(marker_count)],
            }],
            "beats": [{"id": "beats1",
                       "ai_beats": {"beats_path": str(cache_path)}}],
        },
        "tracks": [{"type": "audio", "segments": [{
            "material_id": "aud1",
            "extra_material_refs": ["marks1", "beats1"],
        }]}],
    }
    draft_path = draft_dir / "draft_content.json"
    draft_path.write_text(json.dumps(draft))
    index_path = tmp_path / "root_meta_info.json"
    index_path.write_text(json.dumps({"all_draft_store": [{
        "draft_name": "My Edit",
        "draft_json_file": str(draft_path),
        "tm_draft_modified": 1000,
    }]}))
    return str(index_path), draft


def test_capcut_beats_prefers_markers(tmp_path):
    index_path, draft = _capcut_fixture(tmp_path)
    result = builder.find_latest_capcut_beats(8.0, index_path)
    assert result["beat_source"] == "timeline_markers"
    assert result["beats"] == [0.5, 1.0, 1.5, 2.0]
    assert result["project_duration"] == pytest.approx(8.0)
    assert result["audio_name"] == "song.mp3"


def test_capcut_beats_falls_back_to_cache(tmp_path):
    index_path, _draft = _capcut_fixture(tmp_path, marker_count=10,
                                         cache_count=4)
    result = builder.find_latest_capcut_beats(0, index_path)
    # marker count differs from the AI cache by >1 -> use cache times
    assert result["beat_source"] == "ai_beat_cache"
    assert result["beats"] == [0.5, 1.0, 1.5, 2.0]


def test_capcut_duration_mismatch_raises(tmp_path):
    index_path, _draft = _capcut_fixture(tmp_path)
    with pytest.raises(ValueError, match="duration"):
        builder.find_latest_capcut_beats(100.0, index_path)
    with pytest.raises(FileNotFoundError):
        builder.find_latest_capcut_beats(
            0, str(tmp_path / "missing.json"))


def test_export_import_export_idempotent(tmp_path):
    """A second export of an imported project packages the same content
    (modulo timestamps/roots) — guards against path-rewrite drift that
    would grow or mutate sessions on every round trip."""
    root = str(tmp_path / "out")
    external = make_image(tmp_path / "asset.png")
    result = builder.save_session(
        {"project_name": "stable_pack",
         "session": {"segments": [
             {"id": "a", "start": 0, "end": 4, "label": "One",
              "lyric_text": "hello"}],
             "mood_board_image": external}}, root)

    def normalized_session(folder):
        session = builder._read_json(
            builder.ProjectLayout(folder).session_path)
        session.pop("updated", None)
        session.pop("project_folder", None)

        def scrub(value):
            if isinstance(value, dict):
                return {k: scrub(v) for k, v in value.items()}
            if isinstance(value, list):
                return [scrub(v) for v in value]
            if isinstance(value, str):
                return os.path.basename(value)
            return value

        return scrub(session)

    zip1, _ = builder.export_project(result["project_folder"])
    try:
        first = builder.import_project(zip1, "copy1", root)
    finally:
        os.remove(zip1)
    zip2, _ = builder.export_project(first["project_folder"])
    try:
        second = builder.import_project(zip2, "copy2", root)
    finally:
        os.remove(zip2)
    assert normalized_session(first["project_folder"]) == \
        normalized_session(second["project_folder"])
    # the localized asset is stable, not re-localized each round
    layout = builder.ProjectLayout(second["project_folder"])
    portable = []
    if os.path.isdir(layout.portable_folder):
        portable = os.listdir(layout.portable_folder)
    assert len(portable) <= 1


def test_concurrent_saves_serialize(tmp_path):
    """Concurrent save_session / save_render_log on one project must
    serialize: the reference's handlers run on a single event loop, so
    its read-modify-write session updates never interleave — the
    per-project lock keeps that contract under our thread-pool routes."""
    import threading

    root = str(tmp_path / "out")
    result = builder.save_session(
        {"project_name": "locky", "session": {"segments": []}}, root)
    folder = result["project_folder"]
    errors = []

    def spam_logs(start):
        try:
            for index in range(start, start + 10):
                builder.save_render_log(
                    {"project_folder": folder,
                     "log": {"id": f"r{index}", "status": "complete"}})
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=spam_logs, args=(base,))
               for base in (0, 100, 200)]
    for thread in threads:
        thread.start()
    for thread in threads:
        thread.join()
    assert not errors
    session = builder._read_json(
        builder.ProjectLayout(folder).session_path)
    # all 30 logs survived the fold-in (capped list holds the last 20);
    # without the lock, interleaved read-modify-writes drop entries
    assert len(session["render_logs"]) == 20
    ids = {entry["id"] for entry in session["render_logs"]}
    assert len(ids) == 20
