"""Combined-batch JSON cluster parity vs the reference.

Oracle-fuzz of ``vrgdg_tpu/runtime/combined_files.py`` against the
AST-extracted helpers of ``/root/reference/VRGDG_GeneralNodes.py``
(:24-437): pure text/JSON math compares value-for-value over random
payloads; the filesystem ops run the same op sequence against two
identical on-disk trees and must agree on every result payload and the
final file contents.  The route-shaped update flow mirrors the
reference handler body (:499-569) composed from its own helpers.
"""

import json
import os

import numpy as np

from tests.reference_oracle import load_reference
from vrgdg_tpu.runtime import combined_files as cbf

REF_FILE = "VRGDG_GeneralNodes.py"

_STATE = {"output_dir": ""}


class _FakeFolderPaths:
    @staticmethod
    def get_output_directory():
        return _STATE["output_dir"]


def _oracle():
    return load_reference(REF_FILE, [
        "IMAGE2VIDEO_BATCH_FOLDER_PREFIX", "TEXT2IMAGE_BATCH_FOLDER_PREFIX",
        "LLM_BATCHES_FOLDER_NAME", "COMBINED_JSON_SUFFIX",
        "EMPTY_COMBINED_JSON_OPTION", "BATCH_TYPE_TEXT2IMAGE",
        "BATCH_TYPE_IMAGE2VIDEO", "MAX_COMBINED_JSON_PROMPT_EDIT_SLOTS",
        "_get_llm_batches_root", "_find_latest_batch_folder",
        "_normalize_batch_type", "_batch_prefix_for_type",
        "_list_latest_combined_json_files",
        "_find_latest_combined_json_file_path",
        "_resolve_latest_combined_json_file_path",
        "_read_text_with_utf8_fallback", "_load_combined_json_object",
        "_write_combined_json_object", "_parse_prompt_number_from_key",
        "_normalize_image_index_list", "_parse_image_index_input",
        "_clean_user_folder_path", "_resolve_remake_folder_path",
        "_extract_prompt_indexes_from_remake_folder",
        "_extract_prompt_rows_for_ui", "_coerce_prompt_updates",
        "_apply_prompt_updates_to_data", "_normalize_bool",
    ], extra_globals={"folder_paths": _FakeFolderPaths})


def _rng(seed):
    return np.random.default_rng(seed)


# ---------------------------------------------------------------------------
# pure text / JSON math
# ---------------------------------------------------------------------------

_KEYS = ["prompt1", "prompt12", "Prompt3", "PROMPT04", "prompt0",
         "prompt-1", "promptx", "prompt", "", None, 7, "prompt2 "]
_INDEX_INPUTS = [None, [], [1, "2", "x", 3.9], "", "  ", "[1,2]",
                 "[1, \"a\", 3]", "1,2, 3", "4", "a,b", "{\"x\":1}",
                 "[]", 5, True]
_FOLDER_TEXTS = ["", None, "  C:/out  ", "file:///tmp/x", "'/tmp/q'",
                 "`path`", "\"/a/b\"", "file:///", "   "]


def test_pure_helpers_parity():
    ref = _oracle()
    assert cbf.MAX_PROMPT_EDIT_SLOTS == \
        ref["MAX_COMBINED_JSON_PROMPT_EDIT_SLOTS"]
    assert cbf.COMBINED_SUFFIX == ref["COMBINED_JSON_SUFFIX"]
    assert cbf.NO_FILES_OPTION == ref["EMPTY_COMBINED_JSON_OPTION"]

    for key in _KEYS:
        assert cbf.prompt_number(key) == \
            ref["_parse_prompt_number_from_key"](key), key
    for raw in _INDEX_INPUTS:
        assert cbf.parse_image_index_input(raw) == \
            tuple.__new__(tuple, ref["_parse_image_index_input"](raw)), raw
        assert cbf.normalize_image_indexes(raw) == \
            ref["_normalize_image_index_list"](raw), raw
    for text in _FOLDER_TEXTS:
        assert cbf.clean_folder_text(text) == \
            ref["_clean_user_folder_path"](text), text
    for value in ("Text2Image", "Image2Video", " Image2Video ", "",
                  None, "text2image", "IMAGE2VIDEO", "bogus"):
        assert cbf.normalize_batch_type(value) == \
            ref["_normalize_batch_type"](value), value
        assert cbf.batch_prefix(value) == \
            ref["_batch_prefix_for_type"](value), value


def _random_value(rng):
    roll = rng.random()
    if roll < 0.15:
        return None
    if roll < 0.3:
        return f"plain text {int(rng.integers(100))}"
    if roll < 0.4:
        return int(rng.integers(100))
    value = {}
    if rng.random() < 0.75:
        value["text"] = None if rng.random() < 0.15 else \
            (int(rng.integers(9)) if rng.random() < 0.2
             else f"t{int(rng.integers(50))}")
    if rng.random() < 0.6:
        value["imageIndex"] = [int(rng.integers(5)), "3", "x"][
            : int(rng.integers(4))]
    if rng.random() < 0.2:
        value["extra"] = {"nested": True}
    return value


def _random_data(rng):
    data = {}
    for _ in range(int(rng.integers(8))):
        key = str(rng.choice(_KEYS[: 9]))
        data[key] = _random_value(rng)
    return data


def test_rows_and_updates_parity():
    ref = _oracle()
    rng = _rng(7)
    for step in range(250):
        data = _random_data(rng)
        assert cbf.prompt_rows(data) == \
            ref["_extract_prompt_rows_for_ui"](data), (step, data)
        max_items = int(rng.integers(-1, 4))
        assert cbf.prompt_rows(data, max_items) == \
            ref["_extract_prompt_rows_for_ui"](data, max_items), step

        raw_updates = []
        for _ in range(int(rng.integers(5))):
            item = {"prompt_number": [1, 2, 3, 0, -2, "4", "x", None][
                    int(rng.integers(8))]}
            if rng.random() < 0.8:
                item["prompt"] = ["new text", "", None, 5][
                    int(rng.integers(4))]
            if rng.random() < 0.7:
                item["image_index"] = _INDEX_INPUTS[
                    int(rng.integers(len(_INDEX_INPUTS)))]
            raw_updates.append(item if rng.random() < 0.9 else "junk")
        mine_updates = cbf.coerce_updates(raw_updates)
        ref_updates = ref["_coerce_prompt_updates"](raw_updates)
        assert mine_updates == ref_updates, (step, raw_updates)

        for batch_type in ("Text2Image", "Image2Video"):
            mine_data = json.loads(json.dumps(_scrub_nonjson(data)))
            ref_data = json.loads(json.dumps(_scrub_nonjson(data)))
            mine = cbf.apply_updates(mine_data, mine_updates,
                                     batch_type=batch_type)
            theirs = ref["_apply_prompt_updates_to_data"](
                ref_data, ref_updates, batch_type=batch_type)
            assert mine == tuple.__new__(tuple, theirs), (step, batch_type)
            assert mine_data == ref_data, (step, batch_type)


def _scrub_nonjson(data):
    # keep only JSON-serializable copies for the mutation comparison
    try:
        json.dumps(data)
        return data
    except TypeError:
        return {k: v for k, v in data.items()
                if _is_json(v)}


def _is_json(value):
    try:
        json.dumps(value)
        return True
    except TypeError:
        return False


# ---------------------------------------------------------------------------
# filesystem ops over twin trees
# ---------------------------------------------------------------------------

def _twin_roots(tmp_path):
    ref_out = tmp_path / "ref_out"
    my_root = tmp_path / "my_out" / "llm_batches"
    (ref_out / "llm_batches").mkdir(parents=True)
    my_root.mkdir(parents=True)
    _STATE["output_dir"] = str(ref_out)
    return str(ref_out / "llm_batches"), str(my_root)


def _populate(root, stamp_base):
    """Batch folders with combined files; explicit distinct mtimes so
    the newest-by-mtime scans are deterministic on both trees."""
    spec = [
        ("Text2Image_Batch_001", ["Scene_COMBINED.json", "notes.txt"]),
        ("Text2Image_Batch_003",
         ["A_COMBINED.json", "b_COMBINED.json", "sub"]),
        ("Image2Video_Batch_002", ["I2V_COMBINED.json"]),
        ("Other_Folder", ["x_COMBINED.json"]),
    ]
    for offset, (folder, children) in enumerate(spec):
        folder_path = os.path.join(root, folder)
        os.makedirs(folder_path, exist_ok=True)
        for child_offset, child in enumerate(children):
            child_path = os.path.join(folder_path, child)
            if child == "sub":
                os.makedirs(child_path, exist_ok=True)
                continue
            payload = {"prompt1": {"text": f"seed {folder}",
                                   "imageIndex": [1]},
                       "prompt2": "plain", "other": 1}
            with open(child_path, "w", encoding="utf-8") as fh:
                json.dump(payload, fh)
            os.utime(child_path, (stamp_base + child_offset,
                                  stamp_base + child_offset))
        os.utime(folder_path, (stamp_base + offset * 10,
                               stamp_base + offset * 10))


def test_listing_and_resolution_parity(tmp_path):
    ref_root, my_root = _twin_roots(tmp_path)
    stamp = 1_600_000_000
    _populate(ref_root, stamp)
    _populate(my_root, stamp)
    ref = _oracle()

    selections = ["", "<no files found>", "A_COMBINED.json",
                  "b_COMBINED.json", "missing_COMBINED.json",
                  "/evil/../A_COMBINED.json", "I2V_COMBINED.json",
                  "Scene_COMBINED.json"]
    for batch_type in ("Text2Image", "Image2Video", "", "junk"):
        mine_files, mine_folder = cbf.list_combined_files(my_root,
                                                          batch_type)
        ref_files, ref_folder = \
            ref["_list_latest_combined_json_files"](batch_type)
        assert mine_files == ref_files, batch_type
        assert (mine_folder or "").replace(my_root, "<r>") == \
            (ref_folder or "").replace(ref_root, "<r>"), batch_type

        mine_latest = cbf.latest_combined_file(my_root, batch_type)
        ref_latest = \
            ref["_find_latest_combined_json_file_path"](batch_type)
        assert (mine_latest or "").replace(my_root, "<r>") == \
            (ref_latest or "").replace(ref_root, "<r>"), batch_type

        for selected in selections:
            for auto in (False, True):
                mine_path, mine_err = cbf.resolve_combined_file(
                    my_root, batch_type, selected,
                    allow_auto_latest=auto)
                ref_path, ref_err = \
                    ref["_resolve_latest_combined_json_file_path"](
                        batch_type, selected, allow_auto_latest=auto)
                assert (mine_path or "").replace(my_root, "<r>") == \
                    (ref_path or "").replace(ref_root, "<r>"), \
                    (batch_type, selected, auto)
                assert mine_err == ref_err, (batch_type, selected, auto)

        state = cbf.combined_files_state(my_root, batch_type,
                                         "A_COMBINED.json")
        assert state["batch_type"] == \
            ref["_normalize_batch_type"](batch_type)
        assert state["files"] == ref_files


def test_empty_root_and_bad_json(tmp_path):
    ref_root, my_root = _twin_roots(tmp_path)
    ref = _oracle()
    assert cbf.list_combined_files(my_root, "Text2Image") == ([], None)
    assert ref["_list_latest_combined_json_files"]("Text2Image") == \
        ([], None)
    assert cbf.latest_batch_folder(str(tmp_path / "nope"),
                                   "Text2Image") is None

    # BOM files: the utf-8 read succeeds (no UnicodeDecodeError, so the
    # utf-8-sig retry never fires) and json.loads rejects the BOM char —
    # on BOTH sides; the parity contract is the shared failure
    folder = os.path.join(my_root, "Text2Image_Batch_001")
    os.makedirs(folder)
    bom_path = os.path.join(folder, "bom_COMBINED.json")
    with open(bom_path, "wb") as fh:
        fh.write(b"\xef\xbb\xbf" + json.dumps({"prompt1": "x"}).encode())
    for loader in (cbf.load_combined,
                   ref["_load_combined_json_object"]):
        try:
            loader(bom_path)
            raise AssertionError("BOM JSON must fail on both sides")
        except json.JSONDecodeError:
            pass
    blank_path = os.path.join(folder, "blank_COMBINED.json")
    open(blank_path, "w").close()
    assert cbf.load_combined(blank_path) == {}
    assert ref["_load_combined_json_object"](blank_path) == {}
    list_path = os.path.join(folder, "list_COMBINED.json")
    with open(list_path, "w", encoding="utf-8") as fh:
        fh.write("[1, 2]")
    for loader in (cbf.load_combined,
                   ref["_load_combined_json_object"]):
        try:
            loader(list_path)
            raise AssertionError("non-object JSON must be rejected")
        except ValueError:
            pass


def _mirror_ref_update(ref, payload):
    """The reference handler body (:499-569) composed from its own
    extracted helpers — raises ValueError on its 4xx branches the way
    the repo's route-shaped function does."""
    remake_mode = ref["_normalize_bool"](payload.get("remake_mode",
                                                     False))
    batch_type = ref["_normalize_batch_type"](
        payload.get("batch_type", "Text2Image"))
    use_plain_text = ref["_normalize_bool"](
        payload.get("use_plain_text", False))
    updates = ref["_coerce_prompt_updates"](payload.get("updates", []))
    if not remake_mode:
        return {"ignored": True, "updated": 0, "updated_keys": [],
                "file_path": "",
                "message": "Remake mode is disabled; update ignored."}
    if not updates:
        raise ValueError("No valid prompt updates were provided.")
    file_path, error = ref["_resolve_latest_combined_json_file_path"](
        batch_type, payload.get("combined_json_file", ""))
    if not file_path:
        raise ValueError(error or "Unable to resolve target file.")
    data = ref["_load_combined_json_object"](file_path)
    apply_type = "Image2Video" if use_plain_text else batch_type
    changed, keys = ref["_apply_prompt_updates_to_data"](
        data, updates, batch_type=apply_type)
    ref["_write_combined_json_object"](file_path, data)
    return {"ignored": False, "updated": changed, "updated_keys": keys,
            "file_path": file_path}


def test_update_flow_parity(tmp_path):
    ref_root, my_root = _twin_roots(tmp_path)
    stamp = 1_600_000_000
    _populate(ref_root, stamp)
    _populate(my_root, stamp)
    ref = _oracle()
    rng = _rng(13)

    for step in range(60):
        payload = {
            "remake_mode": [True, False, "true", "no", 1][
                int(rng.integers(5))],
            "batch_type": str(rng.choice(["Text2Image", "Image2Video",
                                          ""])),
            "use_plain_text": [True, False, "on"][
                int(rng.integers(3))],
            "combined_json_file": str(rng.choice(
                ["A_COMBINED.json", "b_COMBINED.json",
                 "I2V_COMBINED.json", "missing.json", ""])),
            "updates": [
                {"prompt_number": int(rng.integers(4)),
                 "prompt": str(rng.choice(["updated", "", "x"])),
                 **({"image_index": "1,2"}
                    if rng.random() < 0.5 else {})}
                for _ in range(int(rng.integers(3)))],
        }
        payload = json.loads(json.dumps(payload, default=str))

        mine = theirs = my_exc = their_exc = None
        try:
            mine = cbf.update_combined_file_prompts(my_root,
                                                    dict(payload))
        except ValueError as exc:
            my_exc = exc
        try:
            theirs = _mirror_ref_update(ref, dict(payload))
        except ValueError as exc:
            their_exc = exc
        assert (my_exc is None) == (their_exc is None), \
            (step, payload, my_exc, their_exc)
        if my_exc is not None:
            assert str(my_exc) == str(their_exc), (step, payload)
            continue
        mine = dict(mine)
        theirs = dict(theirs)
        assert mine.pop("file_path").replace(my_root, "<r>") == \
            theirs.pop("file_path").replace(ref_root, "<r>"), \
            (step, payload)
        assert mine == theirs, (step, payload)

        # both trees must stay byte-identical
        for folder, _dirs, files in os.walk(my_root):
            for name in files:
                my_file = os.path.join(folder, name)
                ref_file = my_file.replace(my_root, ref_root)
                assert open(my_file, "rb").read() == \
                    open(ref_file, "rb").read(), (step, my_file)


def test_remake_indexes_parity(tmp_path):
    ref_root, my_root = _twin_roots(tmp_path)
    ref = _oracle()
    scenes = tmp_path / "scenes"
    remake = scenes / "remake"
    remake.mkdir(parents=True)
    for name in ("video_3_take.mp4", "video_1_a.mp4", "VIDEO_2_b.mp4",
                 "video_0_zero.mp4", "video_x.mp4", "other.txt",
                 "video_3_dup.mp4"):
        (remake / name).write_bytes(b"x")
    (remake / "video_9_dir").mkdir()

    for target in (str(scenes), str(remake), f"\"{scenes}\"",
                   f"file:///{str(scenes).lstrip('/')}",
                   str(tmp_path / "nope"), ""):
        mine = cbf.remake_prompt_indexes(target)
        theirs = ref["_extract_prompt_indexes_from_remake_folder"](
            target)
        assert mine == tuple.__new__(tuple, theirs), target
        assert cbf.resolve_remake_folder(target) == \
            tuple.__new__(tuple, ref["_resolve_remake_folder_path"](
                target)), target

    state = cbf.remake_prompt_state(str(scenes))
    assert state["prompt_numbers"] == [1, 2, 3]
    assert state["prompt_count"] == 3
    assert state["empty"] is False
