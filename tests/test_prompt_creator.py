"""Prompt Creator store + deterministic text math
(vrgdg_tpu.api.prompt_creator).

Parity targets: the non-LLM half of
/root/reference/VRGDG_MusicVideoPromptCreatorNodes.py.
"""

import json
import os

import pytest

from vrgdg_tpu.api import prompt_creator as pc


# ------------------------------------------------------------- rescue

def test_extract_json_object_paths():
    assert pc.extract_json_object('{"segment1": "hi"}') == \
        {"segment1": "hi"}
    # fenced + trailing comma + smart quotes + bare keys
    messy = '```json\n{segment1: “hello”,\n segment2: "world",}\n```'
    assert pc.extract_json_object(messy) == \
        {"segment1": "hello", "segment2": "world"}
    # prose around a JSON body
    wrapped = 'Sure! Here you go:\n{"Prompt1": "a door"}\nHope it helps'
    assert pc.extract_json_object(wrapped) == {"Prompt1": "a door"}
    # key-value line fallback with continuation
    lines = "segment1: first part\ncontinued here\nsegment2: second"
    parsed = pc.extract_json_object(lines)
    assert parsed["segment1"] == "first part\ncontinued here"
    assert parsed["segment2"] == "second"
    with pytest.raises(Exception):
        pc.extract_json_object("no structure at all")


def test_whisper_and_lyric_parsing():
    mapping = pc.parse_whisper_segments(
        "lyricSegment2: second words\n1 - first words\n\nnoise line")
    assert list(mapping) == ["lyricSegment1", "lyricSegment2"]
    assert mapping["lyricSegment1"] == "first words"
    with pytest.raises(ValueError):
        pc.parse_whisper_segments("nothing numbered")

    lines = pc.split_lyric_lines(
        "Verse 1\nfirst line\n\nChorus\nsecond   line\n")
    assert lines == ["first line", "second line"]
    window = pc.lyric_window(["a", "b", "c", "d", "e", "f"], 1, 2, 4,
                             overlap=1)
    assert window[0] == "line1=a"
    assert len(window) <= 5


def test_canonical_mappings_and_validation():
    segments = pc.canonical_segments(
        {"LyricSegment2": "two", "segment1": "one", "junk": "x"})
    assert list(segments) == ["segment1", "segment2"]
    prompts = pc.canonical_prompts({"prompt2": "b", "Prompt1": "a"})
    assert list(prompts) == ["Prompt1", "Prompt2"]
    assert pc.is_scene_label_only({"Prompt1": "Scene 1",
                                   "Prompt2": " scene 2 "})
    assert not pc.is_scene_label_only({"Prompt1": "a red door"})
    assert not pc.is_scene_label_only({})

    fixed = pc.validate_segments({"segment1": "a", "segment2": "b"}, 2)
    assert fixed == {"segment1": "a", "segment2": "b"}
    with pytest.raises(ValueError, match="missing segment2"):
        pc.validate_segments({"segment1": "a"}, 2)

    fallback = pc.segment_subset_with_fallback(
        {"segment1": "fixed"}, ["segment1", "segment2", "segment3"],
        {"segment2": "Thank you.", "segment3": "real words"})
    assert fallback == {"segment1": "fixed",
                        "segment2": "[instrumental]",
                        "segment3": "real words"}


def test_subject_prepend_strip():
    prompts = {"Prompt1": "a neon street", "Prompt2": "Ann, close up"}
    out = pc.prepend_subject(prompts, "Ann",
                             previous_subjects=["Old Ann"])
    assert out["Prompt1"] == "Ann, a neon street"
    assert out["Prompt2"] == "Ann, close up"  # no double prepend
    # prompt that IS the subject collapses to just the subject
    assert pc.prepend_subject({"Prompt1": "Ann"}, "Ann")["Prompt1"] \
        == "Ann"
    assert pc.prepend_subject(prompts, "") is prompts


def test_fixed_duration_srt():
    srt = pc.fixed_duration_srt(
        {"segment1": "one", "segment2": "two", "segment3": ""},
        fixed_scene_duration=2.0, total_duration_hint=7.5)
    blocks = srt.strip().split("\n\n")
    assert len(blocks) == 3
    assert "00:00:00,000 --> 00:00:02,000" in blocks[0]
    # last scene stretches to the hint
    assert "00:00:04,000 --> 00:00:07,500" in blocks[2]
    assert "Instrumental section." in blocks[2]
    assert pc.srt_total_duration_hint(srt) == 7.5
    assert pc.fixed_duration_srt({}) == ""


# --------------------------------------------------------- persistence

def test_save_outputs_and_pointer(tmp_path):
    root = str(tmp_path / "out")
    result = pc.save_outputs({
        "project_name": "pcrun",
        "full_lyrics": "la la",
        "subject": "Ann",
        "segments": '{"lyricSegment1": "la la"}',
        "prompts": '{"Prompt1": "a red door"}',
        "i2v_motion_notes": {"Motion1": "slow pan"},
        "srt_text": "1\n00:00:00,000 --> 00:00:04,000\nla la\n",
    }, root)
    folder = result["project_folder"]
    files = result["files"]
    concepts = json.load(open(files["ConceptPrompts.txt"]))
    assert concepts["Prompt1"] == "Ann, a red door"
    segments = json.load(open(files["lyric_segments.json"]))
    assert segments == {"segment1": "la la"}
    assert os.path.isfile(files["builder_segments.srt"])
    marker = json.load(open(files["prompt_creator_output.json"]))
    assert marker["type"] == "vrgdg_prompt_creator_output"
    pointer = json.load(open(os.path.join(
        root, "VRGDG_LastPromptCreatorProject.json")))
    assert pointer["project_folder"] == folder

    # the builder's import path finds this run via the pointer
    from vrgdg_tpu.api import builder

    source, context = builder.latest_prompt_creator_source(root)
    assert source == folder

    with pytest.raises(ValueError, match="scene labels"):
        pc.save_outputs({"project_name": "bad",
                         "prompts": {"Prompt1": "Scene 1"}}, root)


def test_save_outputs_fixed_duration_srt(tmp_path):
    root = str(tmp_path / "out")
    result = pc.save_outputs({
        "project_name": "fixed",
        "segments": {"segment1": "one", "segment2": "two"},
        "use_srt_durations": False,
        "fixed_scene_duration": 3,
    }, root)
    srt = open(result["files"]["builder_segments.srt"]).read()
    assert "00:00:03,000 --> 00:00:06,000" in srt


def test_draft_roundtrip_and_synthetic(tmp_path):
    root = str(tmp_path / "out")
    saved = pc.save_draft({
        "project_name": "drafted",
        "full_lyrics": "hello world",
        "corrected_segments_text": '{"segment1": "hello world"}',
        "use_srt_durations": "false",
        "fixed_scene_duration": 2,
    }, root)
    assert saved["draft"]["use_srt_durations"] is False
    # fixed-duration SRT regenerated and persisted back into the draft
    assert "00:00:00,000" in saved["draft"]["srt_text"]
    assert os.path.isfile(saved["files"]["builder_segments.srt"])

    loaded = pc.load_draft({"project_folder":
                            saved["project_folder"]}, root)
    assert loaded["found"] and not loaded.get("synthetic")
    assert loaded["draft"]["full_lyrics"] == "hello world"

    # remove the draft file -> synthetic reconstruction from outputs
    os.remove(saved["draft_path"])
    synthetic = pc.load_draft({"project_folder":
                               saved["project_folder"]}, root)
    assert synthetic["found"] and synthetic["synthetic"]
    assert synthetic["draft"]["full_lyrics"] == "hello world"
    assert "hello world" in synthetic["draft"][
        "corrected_segments_text"]

    empty = pc.load_draft({"project_folder":
                           str(tmp_path / "nothing")}, root)
    assert not empty["found"]


def test_list_drafts(tmp_path):
    root = str(tmp_path / "out")
    pc.save_draft({"project_name": "alpha",
                   "srt_text": "1\n00:00:00,000 --> 00:00:02,000\nA\n"
                               "\n2\n00:00:02,000 --> 00:00:04,000\nB\n"},
                  root)
    os.makedirs(os.path.join(root, "unrelated"))
    listing = pc.list_drafts(root)
    names = [item["name"] for item in listing["projects"]]
    assert names == ["alpha"]
    assert listing["projects"][0]["scene_count"] == 2
    assert listing["projects"][0]["has_draft"]


def test_import_audio(tmp_path):
    root = str(tmp_path / "out")
    result = pc.import_audio(os.path.join(root, "proj"),
                             "My Song!.wav", b"RIFFdata", root)
    assert os.path.isfile(result["audio_path"])
    assert result["audio_name"] == "My Song.wav"
    with pytest.raises(ValueError):
        pc.import_audio(os.path.join(root, "proj"), "x.wav", b"", root)
