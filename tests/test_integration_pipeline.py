"""Cross-subsystem integration: the full music-video production flow.

One scenario walked end to end across the host-side stores, the way a
reference user strings them together: Prompt Creator run -> Video
Builder project (import, session, audio mix) -> storyboard + start-image
board -> rendered scene videos -> video-editor remake queue -> portable
ZIP round trip.
"""

import os

from vrgdg_tpu.api import (builder, prompt_creator, start_storyboard,
                           storyboard, video_editor)
from tests.test_builder_store import make_clip, make_wav


def test_full_production_flow(tmp_path):
    root = str(tmp_path / "out")

    # 1. a Prompt Creator run saves its outputs + the global pointer
    pc_result = prompt_creator.save_outputs({
        "project_name": "pc_run",
        "full_lyrics": "first line\nsecond line",
        "subject": "Ann",
        "segments": {"segment1": "first line",
                     "segment2": "second line"},
        "prompts": {"Prompt1": "a red door", "Prompt2": "a blue door"},
        "srt_text": ("1\n00:00:00,000 --> 00:00:02,000\nfirst line\n\n"
                     "2\n00:00:02,000 --> 00:00:04,000\nsecond line\n"),
    }, root)

    # 2. a new Builder project imports that run via the pointer
    project = builder.new_project({"project_name": "video"}, root)
    folder = project["project_folder"]
    imported = builder.copy_prompt_creator_outputs(folder, "", root)
    assert imported["source_project_folder"] == \
        pc_result["project_folder"]
    assert imported["ready"]

    # 3. timeline scenes come from the imported SRT; session is saved
    #    with per-scene custom audio
    scenes = builder.load_srt(imported["srt_path"])["segments"]
    assert [scene["label"] for scene in scenes] == ["first line",
                                                   "second line"]
    clip_audio = make_wav(tmp_path / "clip_audio.wav", seconds=2.0)
    for scene in scenes:
        scene["custom_audio_path"] = clip_audio
        scene["lyric_text"] = scene["label"]
    saved = builder.save_session({"project_folder": folder,
                                  "session": {"segments": scenes}},
                                 root)
    assert len(saved["session"]["segments"]) == 2

    # 4. the scene audio mix assembles the project track + beats
    mix = builder.mix_scene_audio({"project_folder": folder,
                                   "segments": scenes})
    assert mix["scene_count"] == 2
    assert mix["duration"] > 3.9

    # 5. a storyboard is authored and exported inside the project
    exported = storyboard.export_prompts({
        "project_folder": folder,
        "storyboard": {"scenes": [
            {"label": scene["label"],
             "image_prompt": f"shot of {scene['label']}",
             "lyrics": scene["label"]} for scene in scenes]}})
    prompts_text = open(exported["t2i_prompts_path"]).read()
    assert "Prompt1=shot of first line" in prompts_text

    # 6. the start-image board imports the builder's lyric scenes
    board = start_storyboard.load_board(folder)
    assert [scene["lyric"] for scene in board["scenes"]] == \
        ["first line", "second line"]

    # 7. scene videos are rendered and inventoried
    layout = builder.ProjectLayout(folder)
    os.makedirs(layout.videos_folder, exist_ok=True)
    for number in (1, 2):
        make_clip(layout.scene_video_path(number), frames=8)
    scanned = builder.scan_scene_videos(folder)
    assert set(scanned["videos"]) == {"1", "2"}

    # 8. the editor stages scene 2 for remake and the queue serves it
    #    with a frame-locked audio slice
    listing = video_editor.list_clips(layout.videos_folder)
    clips = {clip["name"]: {
        "name": clip["name"], "path": clip["path"],
        "clip_number": clip["clip_number"],
        "selected_for_remake": clip["clip_number"] == 2}
        for clip in listing["clips"]}
    editor_saved = video_editor.save_session(
        layout.videos_folder,
        {"project_folder": layout.videos_folder, "clips": clips})
    assert len(editor_saved["staged_remakes"]) == 1
    item = video_editor.next_remake(
        editor_saved["session_path"], imported["srt_path"],
        mix["audio_path"], fps=24)
    assert item["is_valid"] and item["clip_number"] == 2
    assert item["frames_for_ltx"] % 8 == 1
    assert item["audio"]["sample_rate"] == 44100

    # 9. the whole project survives a portable ZIP round trip
    zip_path, _name = builder.export_project(folder)
    try:
        round_trip = builder.import_project(zip_path, "video_copy",
                                            root)
    finally:
        os.remove(zip_path)
    copied = round_trip["session"]["segments"]
    assert [scene["lyric_text"] for scene in copied] == \
        ["first line", "second line"]
    copy_layout = builder.ProjectLayout(round_trip["project_folder"])
    assert os.path.isfile(copy_layout.scene_video_path(1))
    # the mixed project audio travelled inside the package
    assert os.path.isfile(os.path.join(copy_layout.project_audio_folder,
                                       "scene_audio_mix.wav"))
