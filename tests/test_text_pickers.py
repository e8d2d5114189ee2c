"""Cycling text pickers + LoRA dataset pair store."""

import json
import os

import cv2
import numpy as np
import pytest

from vrgdg_tpu.api import lora_dataset as lds
from vrgdg_tpu.runtime import text_pickers as tp


# --------------------------------------------------------------------------
# parsing
# --------------------------------------------------------------------------

def test_parse_items_modes():
    assert tp.parse_items("a\nb\nc") == ["a", "b", "c"]
    assert tp.parse_items("a, b, c") == ["a", "b", "c"]
    assert tp.parse_items("a | b | c") == ["a", "b", "c"]
    assert tp.parse_items("one\ntwo\n\nthree\nfour") == ["one\ntwo",
                                                        "three\nfour"]
    assert tp.parse_items('["x", "y"]') == ["x", "y"]
    assert tp.parse_items("{'items': ['p', 'q']}") == ["p", "q"]
    assert tp.parse_items('{"motions": ["m1"]}') == ["m1"]
    # bullet/number cleanup
    assert tp.parse_items("- a\n* b\n1. c\n2) d") == ["a", "b", "c", "d"]
    # keep_empty keeps blanks selectable
    assert tp.parse_items("a\n\nb", split_mode="line") == ["a", "b"]
    assert tp.parse_items("a\n\nb", split_mode="line",
                          keep_empty=True) == ["a", "", "b"]
    # json/python mode rejects unstructured text
    assert tp.parse_items("a, b", split_mode="json/python") == []


def test_select_index_modes():
    # index mode wraps
    assert [tp.select_index(i, 5) for i in range(7)] == [0, 1, 2, 3, 4,
                                                        0, 1]
    # random is seeded-stable and in range
    picks = [tp.select_index(i, 5, "random", seed=9) for i in range(20)]
    assert picks == [tp.select_index(i, 5, "random", seed=9)
                     for i in range(20)]
    assert all(0 <= p < 5 for p in picks)
    assert picks != list(range(5)) * 4  # actually random


def test_random_no_repeat_covers_each_cycle():
    count = 7
    for seed in (0, 1, 99):
        picks = [tp.select_index(i, count, "random no repeat", seed)
                 for i in range(count * 4)]
        for cycle in range(4):
            block = picks[cycle * count:(cycle + 1) * count]
            assert sorted(block) == list(range(count)), (seed, cycle)
        # no repeat across cycle boundaries
        for i in range(1, len(picks)):
            if i % count == 0:
                assert picks[i] != picks[i - 1], (seed, i)


def test_pick_text_formatting():
    items = "push in\norbit\nfollow"
    one = tp.pick_text(1, items, label="Camera")
    assert one["formatted_text"] == "Camera = orbit"
    assert one["selected_item"] == "orbit"
    assert one["wrapped_index"] == 1 and one["item_count"] == 3

    two = tp.pick_text(0, items, pick_count=2)
    assert two["formatted_text"] == \
        "start with push in then follow with orbit"
    lines = tp.pick_text(0, items, pick_count=3, multi_format="lines")
    assert lines["formatted_text"] == "push in\norbit\nfollow"
    empty = tp.pick_text(0, "")
    assert empty["item_count"] == 0 and empty["formatted_text"] == ""


def test_directives_and_presets():
    directives, body = tp.extract_item_directives(
        "# LABEL: Mood\n# PICK_COUNT: 2\nitem a\nitem b\n# not a directive")
    assert directives == {"label": "Mood", "pick_count": "2"}
    assert body == "item a\nitem b\n# not a directive"

    # preset fills empty items; preset name becomes the label
    result = tp.run_picker(tp.PickerSpec(preset="Weather", index=0))
    assert result["formatted_text"].startswith("Weather = Clear sky")
    # directive label beats everything
    result = tp.run_picker(tp.PickerSpec(
        items="# LABEL: Sky\ncloudy\nclear", index=1))
    assert result["formatted_text"] == "Sky = clear"


def test_multi_picker_join_modes():
    pickers = [{"items": "a\nb", "label": "P1", "index": 0},
               {"items": "c\nd", "label": "P2", "index": 1},
               {"items": "", "label": "empty"}]
    out = tp.run_multi_picker(pickers, "comma")
    assert out["combined_formatted_text"] == "P1 = a, P2 = d"
    assert out["results"][2]["formatted_text"] == ""
    out = tp.run_multi_picker(pickers, "pipe")
    assert out["combined_formatted_text"] == "P1 = a | P2 = d"


# --------------------------------------------------------------------------
# LoRA dataset pair store
# --------------------------------------------------------------------------

def _png(tmp_path, name, value):
    path = str(tmp_path / name)
    cv2.imwrite(path, np.full((8, 8, 3), value, np.uint8))
    return path


def test_save_pair_roundtrip(tmp_path):
    root = str(tmp_path / "proj")
    img = _png(tmp_path, "src.png", 40)
    first = lds.save_pair({"dataset_folder": root, "index": 2,
                           "image": img, "caption": " a cat ",
                           "trigger_word": "zq", "seed": 7})
    assert os.path.isfile(first["image_path"])
    assert first["image_path"].endswith("image_002.png")
    with open(first["caption_path"], encoding="utf-8") as handle:
        assert handle.read() == "a cat\n"

    lds.save_pair({"dataset_folder": root, "index": 1, "image": img,
                   "caption": "b"})
    # re-save index 2: replaced, not duplicated; items stay sorted
    lds.save_pair({"dataset_folder": root, "index": 2, "image": img,
                   "caption": "c2"})
    with open(first["manifest_path"], encoding="utf-8") as handle:
        manifest = json.load(handle)
    assert [item["index"] for item in manifest["items"]] == [1, 2]
    assert manifest["items"][1]["caption"] == "c2"
    assert manifest["items"][1]["image"] == "../dataset/image_002.png"


def test_save_ic_pair_roundtrip(tmp_path):
    root = str(tmp_path / "ic")
    ref_img = _png(tmp_path, "r.png", 10)
    tgt_img = _png(tmp_path, "t.png", 200)
    out = lds.save_ic_pair({"dataset_folder": root, "index": 1,
                            "reference": ref_img, "target": tgt_img,
                            "instruction": "  make it   night  "})
    with open(out["instruction_path"], encoding="utf-8") as handle:
        assert handle.read() == "make it night\n"
    # replace-by-target-path semantics
    lds.save_ic_pair({"dataset_folder": root, "index": 1,
                      "reference": ref_img, "target": tgt_img,
                      "instruction": "v2"})
    with open(out["metadata_path"], encoding="utf-8") as handle:
        records = json.load(handle)
    assert len(records) == 1 and records[0]["caption"] == "v2"
    assert records[0]["experimental_one_frame_ic_lora"] is True

    listing = lds.list_dataset({"dataset_folder": root})
    assert "references" not in listing["files"]  # files, not subfolders


def test_save_pair_rejects_missing_folder():
    with pytest.raises(ValueError):
        lds.save_pair({"dataset_folder": "", "image": "x.png"})
