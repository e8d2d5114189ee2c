"""Storyboard builder state store (vrgdg_tpu.api.storyboard).

Parity targets: /root/reference/VRGDG_StoryboardBuilderNodes.py —
schema normalization (alias chains, limits, enum fallbacks), load/save,
prompt export files, reference-image import, and the deterministic
facial-requirement pass on saved LTX video prompts.
"""

import json
import os

import pytest

from vrgdg_tpu.api import storyboard as sb
from tests.test_builder_store import data_url_png


def test_scene_normalization_aliases_and_enums():
    scene = sb.normalize_scene({
        "number": "3",
        "t2i_prompt": "  a neon alley  ",
        "lyricNote": "first line",
        "performanceMode": "Short-Film",
        "video_type": "t2v",
        "videoStyle": "x" * 500,
        "minimaxH3Mode": "Reference To Video",
        "start": "1.5", "end": 4.0,
        "subjects": "alice, bob;carol",
    })
    assert scene["scene_number"] == 3
    assert scene["label"] == "Scene 3"
    assert scene["image_prompt"] == "a neon alley"
    assert scene["lyrics"] == "first line"
    assert scene["performance_mode"] == "speaking"
    assert scene["video_prompt_type"] == "t2v"
    assert len(scene["video_style"]) == 160  # limit clamp
    assert scene["minimax_h3_mode"] == "reference_to_video"
    assert scene["timeline_start"] == 1.5
    assert scene["timeline_end"] == 4.0
    assert scene["subjects"] == ["alice", "bob", "carol"]
    assert scene["status"] == "draft"
    assert scene["project_video_engine"] == "ltx"
    # unknown enums fall back
    junk = sb.normalize_scene({"mode": "weird", "minimax_h3_mode": "?"})
    assert junk["video_prompt_type"] == "i2v"
    assert junk["minimax_h3_mode"] == "text_to_video"
    assert junk["performance_mode"] == "singing"


def test_facial_requirement_enforcement():
    scene = {"subjects": ["alice"], "performance_mode": "singing",
             "lyrics": "la la"}
    out = sb.enforce_video_facial_requirements(
        "She sings with quiet intensity. Her face is calm.", scene)
    assert "controlled intensity" in out
    assert "subtle natural eye movement" in out
    assert "occasional natural blinking" in out
    # the additions land inside the face sentence
    assert "Her face is calm, subtle natural eye movement" in out

    # no visible character and no face words -> untouched
    plain = sb.enforce_video_facial_requirements(
        "A wide landscape with drifting fog.", {})
    assert plain == "A wide landscape with drifting fog."

    # no_character_present opts out entirely
    skip = sb.enforce_video_facial_requirements(
        "The singer sings with quiet intensity.",
        {"no_character_present": True})
    assert "quiet intensity" in skip

    # already-covered prompts gain nothing
    covered = sb.enforce_video_facial_requirements(
        "Her eyes dart around while blinking slowly, face tense.",
        scene)
    assert covered.count("blink") == 1


def test_normalize_scene_applies_enforcement_only_for_ltx():
    base = {"subjects": ["a"], "video_prompt":
            "The singer performs, face lit warmly."}
    ltx = sb.normalize_scene({**base})
    assert "blinking" in ltx["video_prompt"]
    minimax = sb.normalize_scene({**base,
                                  "project_video_engine": "minimax_h3"})
    assert "blinking" not in minimax["video_prompt"]


def test_script_import_normalization():
    result = sb.normalize_script_import({
        "maximum_scene_seconds": 99,
        "cues": [
            {"speaker": "Ann", "line": "Hello there"},
            {"speaker_alias": "", "text": "dropped"},  # no speaker
            "junk",
        ],
        "speaker_matches": [{"speaker": "Ann",
                             "speaker_id": "subject_1"}],
        "scene_plan": {"scenes": [
            {"speaker_assignments": [{"dialogue": "Hello there",
                                      "speaker_alias": "Ann"}],
             "duration_seconds": 4.5},
            {"speaker_assignments": []},  # dropped: no assignments
        ]},
    })
    assert result["enabled"]
    assert result["maximum_scene_seconds"] == 15.0  # clamp to [3, 15]
    assert len(result["cues"]) == 1
    assert result["cues"][0]["word_count"] == 2
    assert result["cues"][0]["speaker_name"] == "Ann"
    assert result["speaker_matches"][0]["reference_subject_id"] == \
        "subject_1"
    assert result["scene_plan"]["scene_count"] == 1
    assert result["scene_plan"]["scenes"][0]["label"] == \
        "Script Segment 1"
    # no cues -> disabled regardless of the flag
    assert not sb.normalize_script_import({"enabled": True})["enabled"]


def test_reference_catalog_and_story_layer():
    catalog = sb.normalize_reference_catalog({
        "subjects": [{"name": "Ann",
                      "trigger_placement": "END"}],
        "locations": "not-a-list",
        "location_trigger_position": "end",
    })
    assert catalog["subjects"][0]["trigger_position"] == "end"
    assert catalog["subjects"][0]["minimax_voice"]["preset_id"] == \
        "none"
    assert catalog["locations"] == []
    assert catalog["location_trigger_position"] == "end"

    layer = sb.normalize_story_layer({"lyricStoryStrength": "42",
                                      "storyIdea": "a heist"})
    assert layer["lyric_story_strength"] == 10
    assert layer["overall_story_idea"] == "a heist"
    assert sb.normalize_story_layer(None)["lyric_story_strength"] == 7


def test_save_load_roundtrip_and_default(tmp_path):
    folder = str(tmp_path / "proj")
    # load before save -> normalized default document
    fresh = sb.load_storyboard({"project_folder": folder,
                                "cameraMotionSpeed": 9})
    assert fresh["camera_motion_speed"] == 9
    assert fresh["mode"] == "storyboard_prompts"
    assert not os.path.isfile(fresh["path"])

    saved = sb.save_storyboard({
        "project_folder": folder,
        "storyboard": {
            "projectVideoEngine": "minimax_h3",
            "temporalBackgroundIntensity": 77,
            "scenes": [{"label": "Open", "image_prompt": "dawn sky"},
                       {"image_path": "/x/img.png"}],
        }})
    assert saved["project_video_engine"] == "minimax_h3"
    assert saved["temporal_background_intensity"] == 10
    assert os.path.isfile(saved["path"])

    loaded = sb.load_storyboard({"project_folder": folder})
    assert loaded["scenes"][0]["label"] == "Open"
    assert loaded["scenes"][1]["status"] == "image_ready"
    assert loaded["scenes"][1]["scene_number"] == 2


def test_export_prompts_files(tmp_path):
    folder = str(tmp_path / "proj")
    result = sb.export_prompts({
        "project_folder": folder,
        "storyboard": {"scenes": [
            {"label": "One", "image_prompt": "a red door",
             "video_prompt": "door opens slowly", "lyrics": "hey"},
            {"label": "Two", "image_prompt": "a blue door"},
        ]}})
    assert result["scene_count"] == 2
    t2i = open(result["t2i_prompts_path"]).read()
    assert t2i.splitlines() == ["Prompt1=a red door",
                                "Prompt2=a blue door"]
    i2v = open(result["i2v_prompts_path"]).read()
    assert i2v.startswith("I2V1=door opens slowly")
    manifest = json.load(open(result["video_prompts_json_path"]))
    assert manifest["type"] == "storyboard_video_prompts"
    assert manifest["scenes"][0]["lyric_line"] == "hey"
    summary = json.load(open(result["export_path"]))
    assert summary["scenes"][1]["label"] == "Two"


def test_import_reference_image(tmp_path):
    folder = str(tmp_path / "proj")
    result = sb.import_reference_image({
        "project_folder": folder, "kind": "location",
        "name": "Old Pier!", "description": "weathered wood",
        "image_data": data_url_png((5, 5, 5))})
    assert os.path.isfile(result["path"])
    assert os.sep + os.path.join("references", "locations") + os.sep \
        in result["path"]
    assert result["reference"]["name"] == "Old Pier!"
    assert result["reference"]["description"] == "weathered wood"
    # second import with the same name gets a suffixed file
    again = sb.import_reference_image({
        "project_folder": folder, "kind": "location",
        "name": "Old Pier!", "image_data": data_url_png()})
    assert again["path"] != result["path"]
    with pytest.raises(ValueError):
        sb.import_reference_image({"project_folder": folder,
                                   "kind": "subject",
                                   "image_data": ""})
