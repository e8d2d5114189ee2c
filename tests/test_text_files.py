"""Text/audio file libraries (vrgdg_tpu.api.text_files).

Parity targets: VRGDG_GeneralNodes.py:1606-1830 (text-file browser),
VRGDG_MusicVideoBuilderNodes.py:2666-2694 (editable files),
VRGDG_AudioNodes.py:497-560 (audio library),
VRGDG_GeneralNodes2.py:1220-1250 (ConceptPrompts handoff).
"""

import os
import time

import json

import pytest

from vrgdg_tpu.api import text_files as tfl


def test_category_listing_and_normalization(tmp_path):
    root = str(tmp_path)
    folder = os.path.join(tfl.text_files_root(root), "scene1")
    os.makedirs(folder)
    open(os.path.join(folder, "b.txt"), "w").write("x")
    open(os.path.join(folder, "A.txt"), "w").write("x")
    open(os.path.join(folder, "skip.json"), "w").write("x")
    result = tfl.list_category("scene1", root)
    assert result["files"] == ["A.txt", "b.txt"]
    # unknown categories fall back to the first option
    assert tfl.list_category("hack", root)["category"] == "subject1"
    assert tfl.normalize_category("SCENE2") == "scene2"


def test_folder_listing_newest_first(tmp_path):
    root = str(tmp_path)
    folder = os.path.join(tfl.text_files_root(root), "lyrics run")
    os.makedirs(folder)
    old = os.path.join(folder, "old.txt")
    new = os.path.join(folder, "new.txt")
    open(old, "w").write("x")
    open(new, "w").write("x")
    os.utime(old, (time.time() - 100, time.time() - 100))
    result = tfl.list_folder_files("lyrics run", output_root=root)
    assert result["files"] == ["new.txt", "old.txt"]
    assert result["folder"] == "lyrics run"
    recent = tfl.list_folder_files("lyrics run", use_most_recent=True,
                                   output_root=root)
    assert recent["files"] == ["new.txt"]
    # folder names sanitize traversal characters
    weird = tfl.list_folder_files("../escape", output_root=root)
    assert ".." not in weird["folder"]

    folders = tfl.list_folders(root)
    assert folders["folders"] == ["lyrics run"]


def test_custom_root_normalization(tmp_path):
    base = str(tmp_path / "elsewhere")
    expected = os.path.join(base, "VRGDG_TEMP", "TextFiles")
    assert tfl.normalize_custom_root(base) == os.path.normpath(expected)
    assert tfl.normalize_custom_root(expected) == \
        os.path.normpath(expected)
    assert tfl.normalize_custom_root(
        os.path.join(base, "VRGDG_TEMP")) == os.path.normpath(expected)
    assert tfl.normalize_custom_root(
        os.path.join(expected, "somefolder")) == os.path.normpath(
        expected)
    assert tfl.normalize_custom_root("") == ""
    # a custom root redirects the folder listing
    os.makedirs(os.path.join(expected, "run"))
    open(os.path.join(expected, "run", "a.txt"), "w").write("x")
    result = tfl.list_folder_files("run", custom_base_path=base)
    assert result["files"] == ["a.txt"]


def test_editable_text_files(tmp_path):
    target = str(tmp_path / "notes.txt")
    saved = tfl.save_text_file({"path": target, "content": "hello"})
    assert saved["path"] == target
    loaded = tfl.load_text_file({"path": target})
    assert loaded["content"] == "hello"
    with pytest.raises(ValueError, match=".txt or .json"):
        tfl.save_text_file({"path": str(tmp_path / "evil.sh"),
                            "content": "x"})
    with pytest.raises(FileNotFoundError):
        tfl.load_text_file({"path": str(tmp_path / "missing.txt")})


def test_audio_library(tmp_path):
    root = str(tmp_path)
    result = tfl.save_audio_upload("My Song!.wav", b"RIFF1234",
                                   output_root=root)
    assert result["name"] == "My Song.wav"
    # same name without overwrite gets the (N) suffix
    again = tfl.save_audio_upload("My Song!.wav", b"RIFF5678",
                                  output_root=root)
    assert again["name"] == "My Song (1).wav"
    # reference response contract: the refreshed library rides along
    assert "My Song.wav" in again["files"]
    replaced = tfl.save_audio_upload("My Song!.wav", b"RIFFnew",
                                     overwrite=True, output_root=root)
    assert replaced["name"] == "My Song.wav"
    assert open(replaced["path"], "rb").read() == b"RIFFnew"
    listing = tfl.list_audio(root)
    assert listing["files"] == ["My Song (1).wav", "My Song.wav"]
    with pytest.raises(ValueError, match="Unsupported"):
        tfl.save_audio_upload("x.exe", b"MZ", output_root=root)


def test_shared_concept_prompts(tmp_path):
    root = str(tmp_path)
    with pytest.raises(FileNotFoundError, match="Run Step 1"):
        tfl.load_shared_concept_prompts(root)
    folder = os.path.join(tfl.text_files_root(root), "ConceptPrompts")
    os.makedirs(folder)
    open(os.path.join(folder, "ConceptPrompts.txt"),
         "w").write('{"Prompt1": "hi"}')
    result = tfl.load_shared_concept_prompts(root)
    assert "Prompt1" in result["text"]


def test_save_text_advanced_incremental_and_overwrite(tmp_path):
    from vrgdg_tpu.api import text_files as tfl

    root = str(tmp_path)
    first = tfl.save_text_advanced(
        {"folder_name": "story", "file_name": "scene", "text": "one"},
        output_root=root)
    second = tfl.save_text_advanced(
        {"folder_name": "story", "file_name": "scene", "text": "two"},
        output_root=root)
    assert first["file_path"].endswith("scene_001.txt")
    assert second["file_path"].endswith("scene_002.txt")
    over = tfl.save_text_advanced(
        {"folder_name": "story", "file_name": "scene", "text": "o",
         "overwrite": True}, output_root=root)
    assert over["file_path"].endswith(os.sep + "scene.txt")
    # dict payloads render as pretty JSON
    data = tfl.save_text_advanced(
        {"folder_name": "story", "file_name": "j", "text": {"a": 1},
         "overwrite": True}, output_root=root)
    assert json.loads(data["text"]) == {"a": 1}


def test_save_text_concat_appends_and_numbers_sidecar(tmp_path):
    from vrgdg_tpu.api import text_files as tfl

    root = str(tmp_path)
    base = {"folder_name": "story", "file_name": "tale", "concat": True}
    one = tfl.save_text_concat({**base, "text": "chapter one\n"},
                               output_root=root)
    assert one["text"] == "chapter one\n"
    assert one["json"] == {"Prompt1": "chapter one"}
    two = tfl.save_text_concat({**base, "text": "\nchapter two"},
                               output_root=root)
    assert two["text"] == "chapter one\n\nchapter two"
    assert two["json"] == {"Prompt1": "chapter one",
                           "Prompt2": "chapter two"}
    with open(two["file_path"], encoding="utf-8") as handle:
        assert handle.read() == two["text"]
    # empty addition keeps the existing text and sidecar
    three = tfl.save_text_concat({**base, "text": ""}, output_root=root)
    assert three["text"] == two["text"]
    assert three["json"] == two["json"]
    # sidecar renumbering skips blank entries and odd keys
    with open(two["json_path"], "w", encoding="utf-8") as handle:
        json.dump({"Prompt3": "c", "Prompt1": "a", "weird": "w",
                   "Prompt2": "  "}, handle)
    four = tfl.save_text_concat({**base, "text": "d"}, output_root=root)
    assert four["json"] == {"Prompt1": "a", "Prompt2": "c",
                            "Prompt3": "w", "Prompt4": "d"}


def test_popup_targets_parity_and_flows(tmp_path):
    """Quick-input popup (VRGDG_GeneralNodes2.py:49-56, :519-520,
    :561-563, :1205-1307): the target table and path math must match
    the reference; save writes every field (missing -> empty) and the
    audio drop is single-slot."""
    from tests.reference_oracle import load_reference
    from vrgdg_tpu.api import text_files as tfl

    root = str(tmp_path)

    class _FakeFolderPaths:
        @staticmethod
        def get_output_directory():
            return root

    ref = load_reference(
        "VRGDG_GeneralNodes2.py",
        ["_VRGDG_TEST_TEXT_TARGETS", "_get_test_popup_text_path",
         "_get_test_popup_audio_dir"],
        extra_globals={"folder_paths": _FakeFolderPaths})
    assert tfl.POPUP_TEXT_TARGETS == ref["_VRGDG_TEST_TEXT_TARGETS"]
    for field in tfl.POPUP_TEXT_TARGETS:
        assert tfl.popup_text_path(field, root) == \
            ref["_get_test_popup_text_path"](field)
    config = tfl.popup_config(root)
    assert config["audio_dir"] == ref["_get_test_popup_audio_dir"]()
    assert set(config["text_targets"]) == set(tfl.POPUP_TEXT_TARGETS)
    assert config["concept_prompts_path"].endswith(
        os.path.join("ConceptPrompts", "ConceptPrompts.txt"))

    saved = tfl.popup_save_text(
        {"full_lyrics": "la la", "story_idea": None}, root)
    assert set(saved["saved_paths"]) == set(tfl.POPUP_TEXT_TARGETS)
    with open(saved["saved_paths"]["full_lyrics"],
              encoding="utf-8") as handle:
        assert handle.read() == "la la"
    # missing and None fields write empty files
    for field in ("story_idea", "style_theme"):
        with open(saved["saved_paths"][field], encoding="utf-8") as fh:
            assert fh.read() == ""

    first = tfl.popup_upload_audio("mix one.wav", b"AAA", root)
    assert open(first["path"], "rb").read() == b"AAA"
    second = tfl.popup_upload_audio("other.mp3", b"BB", root)
    assert not os.path.exists(first["path"])  # single slot
    assert os.path.basename(second["path"]) == "other.mp3"
    import pytest
    with pytest.raises(ValueError):
        tfl.popup_upload_audio("", b"x", root)
