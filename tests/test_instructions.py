"""Builder instruction store — oracle fuzz + behavior.

Key set, labels, preset groups, and the three sanitizers are fuzzed
against the reference's own symbols (AST-extracted); the store behavior
(precedence, scoped save/reset, preset dedup + legacy fallback) is
locked directly since the reference's handlers need a ComfyUI host.
"""

import os
import time

import numpy as np
import pytest

from vrgdg_tpu.api import instructions as ins

from tests.reference_oracle import load_reference

_SF_MODES = ("text_to_video", "image_to_video", "reference_to_video",
             "video_to_video")


@pytest.fixture(scope="module")
def oracle():
    # the defaults dict literal references the instruction-text
    # constants; stub each with a marker string (we compare keys and
    # routing, never the reference's prompt copy)
    stubs = {name: f"<{name}>" for name in (
        "_FLUX_KLEIN_T2I_INSTRUCTIONS", "_FLOW_GPT_T2I_INSTRUCTIONS",
        "_STANDARD_IMAGE_T2I_INSTRUCTIONS", "_ID_LORA_INSTRUCTIONS",
        "_T2V_INSTRUCTIONS", "_I2V_INSTRUCTIONS",
        "_NANO_B_T2I_INSTRUCTIONS",
        "MINIMAX_H3_IMAGE_TO_VIDEO_INSTRUCTIONS",
        "MINIMAX_H3_REFERENCE_TO_VIDEO_INSTRUCTIONS",
        "MINIMAX_H3_TEXT_TO_VIDEO_INSTRUCTIONS",
        "MINIMAX_H3_VIDEO_TO_VIDEO_INSTRUCTIONS")}
    stubs["MINIMAX_H3_SHORT_FILM_GUIDED_INSTRUCTIONS_BY_MODE"] = {
        mode: f"<guided:{mode}>" for mode in _SF_MODES}
    stubs["MINIMAX_H3_SHORT_FILM_CUSTOM_INSTRUCTIONS_BY_MODE"] = {
        mode: f"<custom:{mode}>" for mode in _SF_MODES}
    ns = load_reference(
        "VRGDG_MusicVideoBuilderNodes.py",
        ["_BUILDER_INSTRUCTION_DEFAULTS", "_BUILDER_INSTRUCTION_LABELS",
         "_BUILDER_INSTRUCTION_PRESET_GROUPS",
         "_BUILDER_INSTRUCTION_PRESET_GROUP_LABELS",
         "_safe_builder_instruction_key", "_safe_builder_scene_id",
         "_safe_preset_name"],
        extra_globals=stubs)
    # the reference extends defaults/labels with module-level for loops
    # the AST extractor skips; reproduce that composition here
    for mode in _SF_MODES:
        label = mode.replace("_", " ").title()
        for flavor in ("guided", "custom"):
            key = f"minimax_h3_short_film_{flavor}_{mode}"
            ns["_BUILDER_INSTRUCTION_DEFAULTS"][key] = \
                f"<{flavor}:{mode}>"
        ns["_BUILDER_INSTRUCTION_LABELS"][
            f"minimax_h3_short_film_guided_{mode}"] = \
            f"MiniMax H3 Guided Short Film - {label}"
        ns["_BUILDER_INSTRUCTION_LABELS"][
            f"minimax_h3_short_film_custom_{mode}"] = \
            f"MiniMax H3 Fully Custom Short Film - {label}"
    return ns


def test_registry_parity(oracle):
    assert set(ins.REGISTRY) == set(oracle["_BUILDER_INSTRUCTION_DEFAULTS"])
    for key, spec in ins.REGISTRY.items():
        assert spec["label"] == oracle["_BUILDER_INSTRUCTION_LABELS"][key]
        assert spec["default"].strip(), key
    assert ins.PRESET_GROUPS == oracle["_BUILDER_INSTRUCTION_PRESET_GROUPS"]
    assert ins.PRESET_GROUP_LABELS == \
        oracle["_BUILDER_INSTRUCTION_PRESET_GROUP_LABELS"]


def test_sanitizer_parity(oracle):
    ref_key = oracle["_safe_builder_instruction_key"]
    cases = ["t2v", " T2V ", "I2V", "minimax-h3-text-to-video",
             "Krea2 T2I", "__rtv__", "ingredients"]
    rng = np.random.default_rng(2)
    keys = list(ins.REGISTRY)
    for _ in range(40):
        key = keys[int(rng.integers(len(keys)))]
        mangled = "".join(
            c.upper() if rng.random() < 0.3 else c for c in key)
        if rng.random() < 0.3:
            mangled = f"  {mangled}  "
        if rng.random() < 0.3:
            mangled = mangled.replace("_", "-")
        cases.append(mangled)
    for raw in cases:
        assert ins.safe_key(raw) == ref_key(raw), raw
    for bad in ("", "nope", "t2v; rm", None, "llm"):
        with pytest.raises(ValueError):
            ref_key(bad)
        with pytest.raises(ValueError):
            ins.safe_key(bad)

    for raw in ("Scene 01", "a/b\\c", " ..s1.. ", "x" * 300, "", None,
                "Τest", "s.1-2_3"):
        assert ins.safe_scene_id(raw) == \
            oracle["_safe_builder_scene_id"](raw), raw
    for raw in ("My Preset", " name.txt ", "a*b?c", "x" * 200,
                "dots...", "under_score - ok.1"):
        assert ins.safe_preset_name(raw) == \
            oracle["_safe_preset_name"](raw), raw
    for bad in ("", "   ", "...", None):
        with pytest.raises(ValueError):
            oracle["_safe_preset_name"](bad)
        with pytest.raises(ValueError):
            ins.safe_preset_name(bad)


def test_group_routing():
    assert ins.preset_group("krea2_t2i") == "standard_image_t2i"
    assert ins.preset_group("nano_b_t2i") == "reference_image_t2i"
    assert ins.preset_group("t2v") == "t2v"
    assert ins.preset_group_label("zimage_t2i") == "Standard Image T2I"
    assert ins.preset_group_label("flux_klein_t2i") == \
        "Reference/Image Edit T2I"
    assert ins.preset_group_label("t2v") == "Text to Video"


def test_override_precedence_and_scopes(tmp_path):
    project = str(tmp_path / "proj")
    os.makedirs(project)
    base = {"project_folder": project, "key": "t2v", "scene_id": "s1"}

    state = ins.get_instruction(base)
    assert state["source"] == "default"
    assert state["text"] == ins.REGISTRY["t2v"]["default"]
    assert not state["has_scene_custom"]

    allstate = ins.save_instruction(
        {**base, "scope": "all_scenes", "text": "every scene"})
    assert allstate["source"] == "all_scenes"
    assert allstate["text"] == "every scene"
    assert allstate["path"] == allstate["all_scenes_path"]

    scene = ins.save_instruction({**base, "text": "only s1"})
    assert scene["source"] == "scene"
    assert scene["text"] == "only s1"
    assert scene["all_scenes_text"] == "every scene"
    # another scene still sees the all-scenes override
    other = ins.get_instruction({**base, "scene_id": "s2"})
    assert other["source"] == "all_scenes"

    back = ins.reset_instruction({**base, "scope": "scene"})
    assert back["source"] == "all_scenes"
    cleared = ins.reset_instruction({**base, "scope": "global"})
    assert cleared["source"] == "default"

    with pytest.raises(ValueError):
        ins.save_instruction({**base, "text": "   "})
    with pytest.raises(ValueError):
        ins.get_instruction({"key": "t2v"})
    # effective_instruction never raises
    assert ins.effective_instruction("", "t2v") == \
        ins.REGISTRY["t2v"]["default"]
    assert ins.effective_instruction(project, "nope", "s1") == ""


def test_preset_store(tmp_path):
    root = str(tmp_path / "out")

    saved = ins.save_preset(
        {"key": "krea2_t2i", "name": "My Look", "text": "preset body"},
        root)
    assert saved["preset_group"] == "standard_image_t2i"
    assert os.path.isfile(saved["path"])

    # grouped keys share the preset folder
    listing = ins.list_presets({"key": "zimage_t2i"}, root)
    assert [p["name"] for p in listing["presets"]] == ["My Look"]

    loaded = ins.load_preset({"key": "ernie_t2i", "name": "My Look"},
                             root)
    assert loaded["text"] == "preset body"

    # a grouped key's legacy per-key folder is read as fallback and
    # deduped (ungrouped keys have primary == legacy, like the
    # reference, so nothing extra to scan there)
    legacy_dir = os.path.join(ins.preset_root(root), "nano_b_t2i")
    os.makedirs(legacy_dir)
    with open(os.path.join(legacy_dir, "Old.txt"), "w") as handle:
        handle.write("legacy body\n")
    time.sleep(0.01)
    ins.save_preset({"key": "nano_b_t2i", "name": "New",
                     "text": "new body"}, root)
    listing = ins.list_presets({"key": "nano_b_t2i"}, root)
    names = [p["name"] for p in listing["presets"]]
    assert names == ["New", "Old"]          # mtime-sorted, newest first
    assert [p["legacy"] for p in listing["presets"]] == [False, True]
    assert ins.load_preset({"key": "nano_b_t2i", "name": "Old"},
                           root)["text"] == "legacy body"
    # the grouped-folder copy wins over a same-name legacy file
    with open(os.path.join(legacy_dir, "New.txt"), "w") as handle:
        handle.write("shadowed\n")
    assert ins.load_preset({"key": "nano_b_t2i", "name": "New"},
                           root)["text"] == "new body"

    with pytest.raises(FileNotFoundError):
        ins.load_preset({"key": "t2v", "name": "Missing"}, root)
    with pytest.raises(ValueError):
        ins.save_preset({"key": "t2v", "name": "x", "text": ""}, root)
