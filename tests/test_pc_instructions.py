"""Prompt-Creator instruction store + hidden-Whisper builder parity.

Oracle-fuzz against the AST-extracted reference functions
(/root/reference/VRGDG_MusicVideoPromptCreatorNodes.py): the store ops
run the same random op sequence on both sides and must produce equal
result payloads (modulo roots) and identical on-disk file trees; the
workflow builder must emit byte-equal prompt JSON over fuzzed payloads
(both sides share the same tmp roots and a frozen timestamp).
"""

import json
import os

import numpy as np
import pytest

from tests.reference_oracle import REFERENCE_ROOT, load_reference
from vrgdg_tpu.api import pc_instructions as pci
from vrgdg_tpu.api import prompt_creator as pcr

REF_FILE = "VRGDG_MusicVideoPromptCreatorNodes.py"

_STATE = {"output_dir": "", "input_dir": ""}


class _FakeFolderPaths:
    @staticmethod
    def get_output_directory():
        return _STATE["output_dir"]

    @staticmethod
    def get_input_directory():
        return _STATE["input_dir"]


def _builder_helpers():
    return load_reference(
        "VRGDG_MusicVideoBuilderNodes.py",
        ["_context_folder", "_prompts_folder", "_srt_path",
         "_safe_project_name"])


def _store_oracle():
    # the defaults dict references authored prompt constants; inject OUR
    # first-party texts for them so default-text plumbing is comparable
    # without transcribing the reference copy (see pc_instructions
    # docstring)
    fakes = {
        "_VRGDG_GEMMA4_LYRICS_INSTRUCTIONS": pci._DEFAULTS["full_lyrics"],
        "_VRGDG_GEMMA4_STYLE_INSTRUCTIONS": pci._DEFAULTS["style_theme"],
        "_VRGDG_GEMMA4_STORY_INSTRUCTIONS": pci._DEFAULTS["story_idea"],
        "_VRGDG_GEMMA4_SUBJECTS_INSTRUCTIONS":
            pci._DEFAULTS["subject_locations"],
        "_CONCEPT_PROMPT_INSTRUCTIONS": pci._DEFAULTS["concept_prompts"],
        "_SUBJECT_EXTRACT_INSTRUCTIONS":
            pci._DEFAULTS["subject_extract"],
        "_I2V_MOTION_NOTES_INSTRUCTIONS":
            pci._DEFAULTS["i2v_motion_notes"],
    }
    return load_reference(REF_FILE, [
        "_PROMPT_CREATOR_INSTRUCTION_DEFAULTS",
        "_PROMPT_CREATOR_INSTRUCTION_LABELS",
        "_safe_instruction_key", "_safe_preset_name",
        "_instruction_folder", "_instruction_path",
        "_instruction_preset_root", "_instruction_preset_path",
        "_prompt_creator_instruction", "_read_text_file_if_exists",
        "_project_folder_from_payload",
        "_get_prompt_creator_instruction",
        "_save_prompt_creator_instruction",
        "_reset_prompt_creator_instruction",
        "_list_prompt_creator_instruction_presets",
        "_save_prompt_creator_instruction_preset",
        "_load_prompt_creator_instruction_preset",
    ], extra_globals={
        "folder_paths": _FakeFolderPaths,
        **fakes,
        **_builder_helpers(),
    })


def _rng(seed):
    return np.random.default_rng(seed)


def _scrub(value, root, marker="<root>"):
    if isinstance(value, str):
        return value.replace(root, marker)
    if isinstance(value, dict):
        return {k: _scrub(v, root, marker) for k, v in value.items()}
    if isinstance(value, list):
        return [_scrub(v, root, marker) for v in value]
    if isinstance(value, float):  # mtimes differ across the two roots
        return "<float>"
    return value


def _tree(root):
    out = {}
    for folder, _dirs, files in os.walk(root):
        for name in files:
            path = os.path.join(folder, name)
            rel = os.path.relpath(path, root)
            with open(path, "r", encoding="utf-8",
                      errors="replace") as fh:
                out[rel] = fh.read()
    return out


def test_instruction_store_parity(tmp_path):
    """Random op sequence: every result payload and the full on-disk
    tree must match the reference store's, key by key."""
    ref_root = str(tmp_path / "ref_out")
    my_root = str(tmp_path / "my_out")
    os.makedirs(ref_root)
    os.makedirs(my_root)
    _STATE["output_dir"] = ref_root
    ref = _store_oracle()

    # label surface is part of the API contract
    assert pci.LABELS == ref["_PROMPT_CREATOR_INSTRUCTION_LABELS"]
    assert pci._DEFAULTS == ref["_PROMPT_CREATOR_INSTRUCTION_DEFAULTS"]

    ops = {
        "get": (pci.get_instruction,
                ref["_get_prompt_creator_instruction"]),
        "save": (pci.save_instruction,
                 ref["_save_prompt_creator_instruction"]),
        "reset": (pci.reset_instruction,
                  ref["_reset_prompt_creator_instruction"]),
        "list": (pci.list_presets,
                 ref["_list_prompt_creator_instruction_presets"]),
        "save_preset": (pci.save_preset,
                        ref["_save_prompt_creator_instruction_preset"]),
        "load_preset": (pci.load_preset,
                        ref["_load_prompt_creator_instruction_preset"]),
    }
    rng = _rng(23)
    keys = list(pci.KEYS) + ["bogus key", "", "Style / Theme",
                             "FULL_LYRICS", "style-theme"]
    names = ["My Preset", "  weird/name*?  ", "", "x" * 120, "a.b-c_d"]
    texts = ["hello world", "", "  ", "multi\nline\ntext",
             "“smart” quotes"]
    for step in range(220):
        op = str(rng.choice(list(ops)))
        payload = {"key": str(rng.choice(keys))}
        if rng.random() < 0.9:
            payload["project_folder"] = os.path.join(
                "<root>", f"proj_{int(rng.integers(3))}")
        if op in ("save", "save_preset"):
            payload["text"] = str(rng.choice(texts))
        if op in ("save_preset", "load_preset"):
            payload["name"] = str(rng.choice(names))
        mine_fn, theirs_fn = ops[op]

        def _with_root(pl, root):
            pl = dict(pl)
            if "project_folder" in pl:
                pl["project_folder"] = pl["project_folder"].replace(
                    "<root>", root)
            return pl

        mine = theirs = my_exc = their_exc = None
        try:
            mine = mine_fn(_with_root(payload, my_root), my_root)
        except Exception as exc:  # noqa: BLE001 — parity harness
            my_exc = exc
        try:
            theirs = theirs_fn(_with_root(payload, ref_root))
        except Exception as exc:  # noqa: BLE001
            their_exc = exc
        assert (my_exc is None) == (their_exc is None), \
            (step, op, payload, my_exc, their_exc)
        if mine is not None:
            assert _scrub(mine, my_root) == _scrub(theirs, ref_root), \
                (step, op, payload)
        assert _tree(my_root) == _tree(ref_root), (step, op, payload)


def test_effective_instruction_override_precedence(tmp_path):
    root = str(tmp_path)
    project = os.path.join(root, "proj")
    key = "concept_prompts"
    assert pci.effective_instruction(project, key) == \
        pci._DEFAULTS[key]
    pci.save_instruction({"project_folder": project, "key": key,
                          "text": "custom"}, root)
    assert pci.effective_instruction(project, key) == "custom"
    pci.reset_instruction({"project_folder": project, "key": key}, root)
    assert pci.effective_instruction(project, key) == \
        pci._DEFAULTS[key]


# ---------------------------------------------------------------------------
# hidden Whisper workflow builder
# ---------------------------------------------------------------------------

def _whisper_oracle():
    import copy as copy_mod
    import shutil as shutil_mod

    return load_reference(REF_FILE, [
        "_build_whisper_workflow_prompt",
        "_load_prompt_creator_workflow_template",
        "_workflow_template_path", "_stage_audio_for_upload_node",
        "_safe_file_name", "_project_folder_from_payload",
        "_ensure_project_folders", "_payload_bool",
    ], extra_globals={
        "__file__": os.path.join(REFERENCE_ROOT, REF_FILE),
        "copy": copy_mod,
        "shutil": shutil_mod,
        "folder_paths": _FakeFolderPaths,
        **_builder_helpers(),
    })


@pytest.fixture()
def env(tmp_path, monkeypatch):
    input_dir = tmp_path / "input"
    output_dir = tmp_path / "output"
    input_dir.mkdir()
    output_dir.mkdir()
    _STATE["input_dir"] = str(input_dir)
    _STATE["output_dir"] = str(output_dir)
    monkeypatch.setenv("VRGDG_TPU_INPUT", str(input_dir))
    # freeze the SRT-name timestamp on both sides (stdlib time is the
    # oracle namespace's time module too)
    import time as time_mod
    monkeypatch.setattr(time_mod, "strftime",
                        lambda fmt, *a: "20260101_000000")
    (tmp_path / "song.wav").write_bytes(b"RIFF" + b"\0" * 64)
    (input_dir / "staged.mp3").write_bytes(b"ID3" + b"\0" * 32)
    return {"tmp": tmp_path, "input": str(input_dir),
            "output": str(output_dir)}


def test_build_whisper_prompt_parity(env):
    ref = _whisper_oracle()
    rng = _rng(31)
    audio_choices = [str(env["tmp"] / "song.wav"), "staged.mp3",
                     "missing.wav", ""]
    for step in range(120):
        payload = {
            "project_folder": os.path.join(env["output"], "projA"),
            "audio_path": str(rng.choice(audio_choices)),
        }
        if rng.random() < 0.3:
            payload["audio_file"] = payload.pop("audio_path")
        for field, choices in (
                ("min_duration", [2, 4.5, "", None]),
                ("max_duration", [8, 12.0, ""]),
                ("bias", [0.3, 0.9, ""]),
                ("duration_preset", ["varied_no_repeat", "steady", ""]),
                ("use_srt_durations", [True, False, "false", "1", ""]),
                ("fixed_scene_duration", [3, 6.0, ""]),
                ("empty_segment_text", ["Instrumental section.", "",
                                        "  quiet  "]),
                ("whisper_language", ["english", "spanish", "  ", ""]),
                ("full_lyrics", ["la la la\nsecond line", ""])):
            if rng.random() < 0.8:
                payload[field] = choices[int(rng.integers(len(choices)))]

        mine = theirs = my_exc = their_exc = None
        try:
            mine = pcr.build_whisper_prompt(dict(payload),
                                            env["output"])
        except Exception as exc:  # noqa: BLE001 — parity harness
            my_exc = exc
        try:
            theirs = ref["_build_whisper_workflow_prompt"](dict(payload))
        except Exception as exc:  # noqa: BLE001
            their_exc = exc
        assert (my_exc is None) == (their_exc is None), \
            (step, payload, my_exc, their_exc)
        if mine is None:
            continue
        assert mine["prompt"] == theirs["prompt"], (step, payload)
        for key in ("project_folder", "expected_srt_path",
                    "source_srt_filename"):
            assert mine[key] == theirs[key], (step, key, payload)
        # both templates are byte-identical; only their repo paths differ
        assert json.load(open(mine["workflow_template_path"])) == \
            json.load(open(theirs["workflow_template_path"]))


def test_config_reports_template(env):
    result = pcr.config(env["output"])
    assert result["workflow_template_exists"] is True
    assert result["workflow_template_path"].endswith(
        "LTX2.3_Music_Video_Creator_Prompt_Creator_API.json")
    assert result["llm_settings"]["n_ctx"] == 14848
