"""Krea2 LoRA Studio parity vs the reference.

The reference defines its studio helpers inside a route-registrar
closure (/root/reference/LTXLoraTrain.py:1235-2430); ``load_reference``
hoists them with ``within=``.  Twin-tree fuzz: the same dataset trees
(identical mtimes via utime) must produce identical project state,
signatures, manifests, YAML configs, and XYZ grids on both sides —
timestamp fields (``datetime.now``) are scrubbed.
"""

import hashlib
import json
import math
import os

import cv2
import numpy as np
import pytest

from tests.reference_oracle import REFERENCE_ROOT, load_reference
from vrgdg_tpu.api import krea2_studio as k2s

REF_FILE = "LTXLoraTrain.py"

_STATE = {"output_dir": ""}


class _FakeFolderPaths:
    @staticmethod
    def get_output_directory():
        return _STATE["output_dir"]


def _oracle():
    return load_reference(REF_FILE, [
        "image_exts", "caption_exts", "_safe_name", "_norm_path",
        "_default_project_root", "_settings_base", "_preset_settings",
        "_presets", "_project_paths", "_read_project", "_write_project",
        "_sync_project_dataset_from_folder", "_copy_file_like",
        "_sync_edit_dataset", "_read_krea2_training_progress",
        "_make_xyz", "_write_ai_toolkit_edit_config",
    ], extra_globals={
        "folder_paths": _FakeFolderPaths,
        "hashlib": hashlib, "cv2": cv2, "np": np, "math": math,
    }, within="_ensure_krea2_lora_studio_route_registered")


_TIME_KEYS = {"updated_at", "created_at"}


def _scrub(value):
    if isinstance(value, dict):
        return {key: ("<t>" if key in _TIME_KEYS else _scrub(item))
                for key, item in value.items()}
    if isinstance(value, list):
        return [_scrub(item) for item in value]
    return value


def test_names_paths_presets_parity(tmp_path):
    _STATE["output_dir"] = str(tmp_path)
    ref = _oracle()
    assert k2s.IMAGE_EXTS == frozenset(ref["image_exts"])
    assert k2s.CAPTION_EXTS == frozenset(ref["caption_exts"])
    for value in ("My Project!", "  x  ", "", None, "a/b\\c", "é",
                  "..name..", "ok_name-1.2"):
        assert k2s.safe_name(value) == ref["_safe_name"](value), value
        assert k2s.norm_path(value) == ref["_norm_path"](value), value
    assert k2s.default_project_root(str(tmp_path)) == \
        ref["_default_project_root"]()
    assert k2s.presets() == ref["_presets"]()
    for name in ("Fast", "medium", " LONG ", "bogus", "", None):
        assert k2s.preset_settings(name) == \
            ref["_preset_settings"](name), name
    target = os.path.join(str(tmp_path), "projX")
    assert k2s.project_paths(target) == ref["_project_paths"](target)


def _write_png(path, size=(12, 10), shade=128):
    image = np.full((size[1], size[0], 3), shade, np.uint8)
    assert cv2.imwrite(str(path), image)


def _build_dataset(images_dir, stamp):
    os.makedirs(images_dir, exist_ok=True)
    spec = [("a.png", "caption for a"), ("B.jpg", None),
            ("c.webp", "  padded caption  "), ("notes.doc", None)]
    for offset, (name, caption) in enumerate(spec):
        path = os.path.join(images_dir, name)
        if name.endswith(".doc"):
            with open(path, "w") as fh:
                fh.write("not an image")
        else:
            _write_png(path, shade=40 + offset * 30)
        os.utime(path, (stamp + offset, stamp + offset))
        if caption is not None:
            caption_path = os.path.join(
                images_dir, os.path.splitext(name)[0] + ".txt")
            with open(caption_path, "w", encoding="utf-8") as fh:
                fh.write(caption)
            os.utime(caption_path, (stamp + 50 + offset,
                                    stamp + 50 + offset))
    # orphan caption with no image
    orphan = os.path.join(images_dir, "zz_orphan.txt")
    with open(orphan, "w") as fh:
        fh.write("orphan")
    os.utime(orphan, (stamp + 99, stamp + 99))


def test_dataset_sync_twin_tree_parity(tmp_path):
    _STATE["output_dir"] = str(tmp_path / "ref")
    ref = _oracle()
    stamp = 1_600_000_000
    mine_dir = str(tmp_path / "mine" / "proj")
    ref_dir = str(tmp_path / "ref" / "proj")
    for root in (mine_dir, ref_dir):
        _build_dataset(os.path.join(root, "dataset", "images"), stamp)

    my_project, my_changed = k2s.sync_dataset(
        {"project_dir": mine_dir})
    ref_project, ref_changed = ref["_sync_project_dataset_from_folder"](
        {"project_dir": ref_dir})
    assert my_changed is True and ref_changed is True
    assert _scrub(json.loads(
        json.dumps(my_project).replace(mine_dir, "<r>"))) == \
        _scrub(json.loads(
            json.dumps(ref_project).replace(ref_dir, "<r>")))
    # identical trees -> identical signatures (mtimes pinned by utime)
    assert my_project["dataset_sync"]["signature"] == \
        ref_project["dataset_sync"]["signature"]
    my_manifest = json.load(open(
        os.path.join(mine_dir, "import_manifest.json")))
    ref_manifest = json.load(open(
        os.path.join(ref_dir, "import_manifest.json")))
    assert _scrub(json.loads(
        json.dumps(my_manifest).replace(mine_dir, "<r>"))) == \
        _scrub(json.loads(
            json.dumps(ref_manifest).replace(ref_dir, "<r>")))

    # unchanged second sync on both sides
    _p, changed2 = k2s.sync_dataset(my_project)
    assert changed2 is False
    _p, ref_changed2 = ref["_sync_project_dataset_from_folder"](
        ref_project)
    assert ref_changed2 is False


def _build_edit_dataset(root, stamp, mismatch=False):
    control = os.path.join(root, "dataset", "control")
    target = os.path.join(root, "dataset", "target")
    os.makedirs(control, exist_ok=True)
    os.makedirs(target, exist_ok=True)
    _write_png(os.path.join(control, "p1.png"))
    _write_png(os.path.join(target, "p1.png"))
    with open(os.path.join(target, "p1.txt"), "w") as fh:
        fh.write("make it sunny")
    _write_png(os.path.join(control, "only_control.png"))
    if mismatch:
        _write_png(os.path.join(control, "p2.png"), size=(12, 10))
        _write_png(os.path.join(target, "p2.png"), size=(20, 10))
    for folder in (control, target):
        for index, name in enumerate(sorted(os.listdir(folder))):
            os.utime(os.path.join(folder, name),
                     (stamp + index, stamp + index))


def test_edit_sync_twin_tree_parity(tmp_path):
    _STATE["output_dir"] = str(tmp_path / "ref")
    ref = _oracle()
    stamp = 1_600_000_000
    mine_dir = str(tmp_path / "mine" / "projE")
    ref_dir = str(tmp_path / "ref" / "projE")
    for root in (mine_dir, ref_dir):
        _build_edit_dataset(root, stamp, mismatch=True)

    my_project, _c = k2s.sync_edit_dataset({"project_dir": mine_dir})
    ref_project, _c = ref["_sync_edit_dataset"]({"project_dir": ref_dir})
    assert my_project["dataset_sync"]["signature"] == \
        ref_project["dataset_sync"]["signature"]
    assert my_project["dataset_sync"]["problems"] == \
        ref_project["dataset_sync"]["problems"]
    assert my_project["dataset_sync"]["pair_count"] == \
        ref_project["dataset_sync"]["pair_count"] == 1
    assert _scrub(json.loads(
        json.dumps(my_project["imported_files"]).replace(
            mine_dir, "<r>"))) == \
        _scrub(json.loads(
            json.dumps(ref_project["imported_files"]).replace(
                ref_dir, "<r>")))


def test_project_store_interop(tmp_path):
    """project.json written by either side loads on the other."""
    _STATE["output_dir"] = str(tmp_path)
    ref = _oracle()
    project_dir = str(tmp_path / "interop")
    created = k2s.create_project(
        {"project_root": str(tmp_path), "project_name": "interop",
         "preset_name": "Medium", "sample_prompt": "hello",
         "settings": {"network_dim": 64}}, str(tmp_path))
    assert created["project"]["settings"]["network_dim"] == 64
    assert created["project"]["settings"]["steps_per_run"] == 500
    ref_read = ref["_read_project"](project_dir)
    assert ref_read["project_name"] == "interop"
    assert ref_read["preset_name"] == "Medium"

    ref_read["sample_prompt"] = "edited by reference"
    ref["_write_project"](ref_read)
    again = k2s.read_project(project_dir)
    assert again["sample_prompt"] == "edited by reference"

    listing = k2s.list_projects({"project_root": str(tmp_path)})
    assert [row["project_name"] for row in listing["projects"]] == \
        ["interop"]

    # re-create keeps identity, applies new preset
    redo = k2s.create_project(
        {"project_root": str(tmp_path), "project_name": "interop",
         "preset_name": "Long"}, str(tmp_path))
    assert redo["project"]["sample_prompt"] == "edited by reference"
    assert redo["project"]["settings"]["total_target_steps"] == 3000

    with pytest.raises(FileNotFoundError):
        k2s.load_project({"project_dir": str(tmp_path / "missing")})
    with pytest.raises(ValueError):
        k2s.load_project({"project_dir": ""})


def test_import_files_numbering_pairing_orphans(tmp_path):
    project_dir = str(tmp_path / "imp")
    result = k2s.import_files(project_dir, [
        ("Photo One.png", b"P1"), ("photo one.txt", b"caption one"),
        ("other.jpg", b"P2"), ("stray.txt", b"no image"),
        ("skip.doc", b"x"),
    ])
    names = [row["name"] for row in result["saved"]]
    assert names == ["image_001.png", "image_001.txt", "image_002.jpg"]
    assert result["manifest"]["orphan_captions"] == [
        {"original_name": "stray.txt",
         "reason": "No image with the same original filename stem was "
                   "included in this import."}]
    # numbering continues across imports; manifest appends
    again = k2s.import_files(project_dir, [("third.png", b"P3")])
    assert again["saved"][0]["name"] == "image_003.png"
    manifest = json.load(open(
        os.path.join(project_dir, "import_manifest.json")))
    assert len(manifest["imports"]) == 2
    with open(os.path.join(project_dir, "dataset", "images",
                           "image_001.txt")) as fh:
        assert fh.read() == "caption one"

    edit = k2s.import_edit_files(project_dir, "target", [
        ("pairA.png", b"T"), ("pairA.txt", b"instruction")])
    assert {row["name"] for row in edit["saved"]} == \
        {"pairA.png", "pairA.txt"}
    assert edit["project"]["training_type"] == "edit"
    with pytest.raises(ValueError):
        k2s.import_edit_files(project_dir, "bogus", [])


def test_training_progress_parity(tmp_path):
    _STATE["output_dir"] = str(tmp_path)
    ref = _oracle()
    mine_dir = str(tmp_path / "mineP")
    ref_dir = str(tmp_path / "refP")

    def _check(expect_active):
        mine = k2s.training_progress(mine_dir)
        theirs = ref["_read_krea2_training_progress"](ref_dir)
        theirs.pop("ok", None)
        mine = json.loads(json.dumps(mine).replace(mine_dir, "<r>"))
        theirs = json.loads(json.dumps(theirs).replace(ref_dir, "<r>"))
        assert mine == theirs
        assert mine["active"] is expect_active
        return mine

    _check(False)  # no log folder
    for root in (mine_dir, ref_dir):
        os.makedirs(os.path.join(root, "workspace", "logs"))
    _check(False)  # no log file
    line = ("steps:  42%|####      | 105/250 [01:10<01:37,  1.49s/it, "
            "avr_loss=0.0231]\n")
    for root in (mine_dir, ref_dir):
        with open(os.path.join(root, "workspace", "logs", "run.log"),
                  "w") as fh:
            fh.write("prelude line\n" + line + "trailer\n")
    state = _check(True)
    assert state["current"] == 105 and state["total"] == 250
    assert state["seconds_per_it"] == 1.49
    for root in (mine_dir, ref_dir):
        with open(os.path.join(root, "workspace", "logs", "run.log"),
                  "w") as fh:
            fh.write("loading model shards...\n")
    state = _check(False)
    assert state["status"] == "loading model shards..."


def test_ai_toolkit_config_byte_parity(tmp_path):
    _STATE["output_dir"] = str(tmp_path)
    ref = _oracle()
    stamp = 1_600_000_000
    mine_dir = str(tmp_path / "mineC")
    ref_dir = str(tmp_path / "refC")
    toolkit = tmp_path / "toolkit"
    toolkit.mkdir()
    (toolkit / "run.py").write_text("# stub")
    settings = {**k2s.preset_settings("Fast"),
                "ai_toolkit_root": str(toolkit),
                "resolution_width": 768, "resolution_height": 1024}
    for root in (mine_dir, ref_dir):
        _build_edit_dataset(root, stamp)
    my_project, _c = k2s.sync_edit_dataset({"project_dir": mine_dir,
                                            "project_name": "CfgProj"})
    ref_project, _c = ref["_sync_edit_dataset"](
        {"project_dir": ref_dir, "project_name": "CfgProj"})
    # the only-control problem rows block config generation identically
    my_project["dataset_sync"]["problems"] = []
    ref_project["dataset_sync"]["problems"] = []

    mine = k2s.ai_toolkit_edit_config(my_project, settings, 250,
                                      require_install=True)
    _root, ref_config_path, _out, _name = \
        ref["_write_ai_toolkit_edit_config"](ref_project, settings, 250)
    my_text = open(mine["config_path"], encoding="utf-8").read()
    ref_text = open(ref_config_path, encoding="utf-8").read()
    assert my_text.replace(mine_dir.replace(os.sep, "/"), "<r>") == \
        ref_text.replace(ref_dir.replace(os.sep, "/"), "<r>")

    my_project["dataset_sync"]["problems"] = ["p1: broken"]
    with pytest.raises(ValueError):
        k2s.ai_toolkit_edit_config(my_project, settings, 250)


def test_xyz_grid_byte_parity(tmp_path):
    _STATE["output_dir"] = str(tmp_path)
    ref = _oracle()
    samples = []
    for index, size in enumerate(((64, 48), (48, 64), (100, 30))):
        path = str(tmp_path / f"s{index}.png")
        _write_png(path, size=size, shade=50 + index * 60)
        samples.append({"step": (index + 1) * 250, "path": path})
    mine = k2s.make_xyz(samples, str(tmp_path / "mine_xyz.png"))
    theirs = ref["_make_xyz"](samples, str(tmp_path / "ref_xyz.png"))
    assert open(mine, "rb").read() == open(theirs, "rb").read()
    with pytest.raises(ValueError):
        k2s.make_xyz([], str(tmp_path / "none.png"))


def test_build_sample_prompt_patches_template(tmp_path):
    project_dir = str(tmp_path / "sample")
    k2s.write_project({"project_dir": project_dir,
                       "project_name": "sample",
                       "sample_prompt": "from project",
                       "aspect_ratio": "16:9 (Widescreen)",
                       "latest_lora_path": "/loras/run.safetensors"})
    built = k2s.build_sample_prompt({
        "project_dir": project_dir,
        "sample_model_settings": {"vae": "my_vae.safetensors"},
        "strength_model": 0.7})
    prompt = built["prompt"]
    assert prompt["49"]["inputs"]["aspect_ratio"] == "16:9 (Widescreen)"
    assert prompt["238"]["inputs"]["aspect_ratio"] == "16:9 (Widescreen)"
    assert prompt["228"]["inputs"]["text"] == "from project"
    assert prompt["234"]["inputs"]["vae_name"] == "my_vae.safetensors"
    assert prompt["250"]["inputs"]["lora_path"] == \
        os.path.normpath("/loras/run.safetensors")
    assert prompt["250"]["inputs"]["strength_model"] == 0.7
    # reference template field untouched elsewhere
    reference_template = json.load(open(os.path.join(
        REFERENCE_ROOT, "Workflows", "UsedForUIDoNotTouch",
        "Krea2_API_2Pass_Lora_Train_Sample.json")))
    assert prompt["236"]["inputs"]["unet_name"] == \
        reference_template["236"]["inputs"]["unet_name"]
    with pytest.raises(ValueError):
        k2s.build_sample_prompt({"project_dir": str(tmp_path / "none")})


def test_save_sample_and_train_plan(tmp_path):
    output_root = str(tmp_path)
    project_dir = os.path.join(output_root, "VRGDG_Krea2_Studio", "run1")
    k2s.create_project({"project_name": "run1"}, output_root)
    _build_dataset(os.path.join(project_dir, "dataset", "images"),
                   1_600_000_000)

    source = os.path.join(output_root, "subdir", "render.png")
    os.makedirs(os.path.dirname(source))
    _write_png(source)
    saved = k2s.save_sample(
        {"project_dir": project_dir, "step": 250,
         "image": {"filename": "render.png", "subfolder": "subdir"}},
        output_root)
    assert saved["sample"]["step"] == 250
    assert os.path.isfile(saved["sample"]["path"])
    assert saved["sample"]["path"].endswith("run1_step_000250.png")

    plan = k2s.train_plan({"project_dir": project_dir})
    assert plan["plan"]["training_type"] == "standard"
    # first sync after import -> dataset changed -> cache escalates
    assert plan["plan"]["cache_strategy_for_run"] == "force"
    assert plan["plan"]["next_target_steps"] == 250
    assert plan["plan"]["total_target_steps"] == 500

    done = k2s.record_training_result({
        "project_dir": project_dir,
        "latest_lora_path": "/out/lora.safetensors",
        "completed_steps": 250, "total_target_steps": 500,
        "output_name": "run1"})
    assert done["project"]["completed_steps"] == 250
    assert done["project"]["dataset_sync"]["pending_cache_rebuild"] \
        is False
    plan2 = k2s.train_plan({"project_dir": project_dir})
    # unchanged dataset now -> configured (auto) strategy survives
    assert plan2["plan"]["cache_strategy_for_run"] == "auto"
    assert plan2["plan"]["next_target_steps"] == 500

    defaults = k2s.defaults(output_root=output_root)
    assert defaults["presets"]["Fast"]["steps_per_run"] == 250
    assert defaults["aspect_ratios"][1] == "3:4 (Portrait Standard)"
    assert defaults["project_root"].endswith("VRGDG_Krea2_Studio")
