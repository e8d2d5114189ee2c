"""Start-image storyboard store (vrgdg_tpu.api.start_storyboard).

Parity targets: /root/reference/VRGDG_StartImageStoryboard.py — board
lifecycle inside a builder project, lyric import, builder start-frame
import with attempt archiving, references, and location mappings.
"""

import json
import os

import pytest

from vrgdg_tpu.api import builder, start_storyboard as ssb
from tests.test_builder_store import data_url_png, make_image


@pytest.fixture()
def project(tmp_path):
    """A builder project with lyric scenes and an approved image."""
    folder = str(tmp_path / "proj")
    layout = builder.ProjectLayout(folder)
    layout.ensure_base_folders()
    approved = make_image(layout.scene_image_path(1), color=(9, 9, 9))
    builder._write_json(layout.session_path, {
        "project_folder": folder,
        "segments": [
            {"id": "sc_a", "lyric_text": "first line",
             "approved_image_path": approved},
            {"id": "sc_b", "lyric_text": "second line"},
            {"id": "sc_c", "type": "marker"},
        ],
        "reference_builder": {
            "locations": [{"id": "loc1", "name": "Pier",
                           "description": "weathered",
                           "image": {"path": approved}}],
            "scene_map": {"sc_b": "loc1"},
        },
    })
    return folder


def test_project_folder_validation(tmp_path):
    with pytest.raises(ValueError, match="existing"):
        ssb.project_folder(str(tmp_path / "missing"))
    plain = tmp_path / "plain"
    plain.mkdir()
    with pytest.raises(ValueError, match="not a Video Builder"):
        ssb.project_folder(str(plain))


def test_first_load_imports_lyrics_and_locations(project):
    board = ssb.load_board(project)
    scenes = board["scenes"]
    # the marker segment is dropped; two lyric scenes remain
    assert [scene["lyric"] for scene in scenes] == ["first line",
                                                   "second line"]
    assert scenes[0]["number"] == 1
    # scene 2 got the mapped location from the builder session
    assert scenes[1]["location_ref"]["name"] == "Pier"
    assert scenes[1]["location_ref"]["source"] == "video_builder"
    assert board["imported_location_count"] == 1
    assert board["project_location_catalog"][0]["id"] == "loc1"
    # board persisted on first import
    assert os.path.isfile(ssb.board_path(project))


def test_save_strips_urls_and_renumbers(project):
    board = ssb.load_board(project)
    board["scenes"][0]["image_url"] = "/should/vanish"
    board["scenes"][0]["note"] = "keep me"
    saved = ssb.save_board(project, board)
    assert "image_url" not in saved["scenes"][0]
    raw = json.load(open(ssb.board_path(project)))
    assert raw["version"] == 2
    assert raw["scenes"][0]["note"] == "keep me"
    # reload regenerates URLs
    again = ssb.load_board(project)
    assert "image_url" in again["scenes"][0]


def test_reimport_preserves_edits(project):
    board = ssb.load_board(project)
    board["scenes"][0]["prompt"] = "sunset wide shot"
    ssb.save_board(project, board)
    # builder session gains a third lyric scene
    layout = builder.ProjectLayout(project)
    session = builder._read_json(layout.session_path)
    session["segments"].append({"id": "sc_d", "lyric_text": "third"})
    builder._write_json(layout.session_path, session)
    board = ssb.reimport_board(project)
    assert len(board["scenes"]) == 3
    assert board["scenes"][0]["prompt"] == "sunset wide shot"
    assert board["scenes"][2]["lyric"] == "third"


def test_import_project_start_frames_and_archive(project):
    result = ssb.import_project_start_frames(project)
    assert result["imported"] == 1  # scene 1 has an approved image
    assert result["missing"] == 1   # scene 2 has none
    board = result["storyboard"]
    first = board["scenes"][0]["image_path"]
    assert os.path.isfile(first)
    assert first.endswith("scene_0001.png")
    # second import skips (already present)
    result = ssb.import_project_start_frames(project)
    assert result["skipped_existing"] >= 1
    # overwrite archives the prior take into attempts/
    result = ssb.import_project_start_frames(project, overwrite=True)
    assert result["imported"] == 1
    attempts = os.path.join(ssb.images_folder(project), "attempts",
                            "scene_0001")
    assert os.listdir(attempts)


def test_scene_upload_and_reference(project):
    ssb.load_board(project)
    upload = ssb.save_scene_upload(project, data_url_png((1, 2, 3)),
                                   2, "end")
    assert upload["saved_path"].endswith("scene_0002_end.png")
    board = ssb.load_board(project)
    assert board["scenes"][1]["end_image_path"] == upload["saved_path"]

    reference = ssb.save_reference(project, data_url_png(), None)
    assert "global_character_reference" in reference["saved_path"]
    board = ssb.load_board(project)
    assert board["use_global_reference"]
    scene_ref = ssb.save_reference(project, data_url_png(), 1)
    assert scene_ref["saved_path"].endswith(
        "scene_0001_reference.png")
    with pytest.raises(ValueError, match="outside"):
        ssb.save_scene_upload(project, data_url_png(), 99)


def test_import_latest_from_watch_folder(project, tmp_path):
    downloads = tmp_path / "dl"
    downloads.mkdir()
    make_image(downloads / "older.png")
    newest = make_image(downloads / "newest.jpg", color=(7, 7, 7))
    os.utime(downloads / "older.png", (1, 1))
    ssb.load_board(project)
    result = ssb.import_latest(project, 1,
                               downloads_folder=str(downloads))
    assert result["source_path"] == newest
    assert result["saved_path"].endswith("scene_0001.jpg")
    with pytest.raises(FileNotFoundError):
        ssb.import_latest(project, 1,
                          downloads_folder=str(tmp_path / "none"))
    # explicit source path wins over the watch folder
    explicit = make_image(tmp_path / "pick.png")
    result = ssb.import_latest(project, 2, source_path=explicit)
    assert result["source_path"] == explicit


def test_locations_cleared_removes_builder_refs(project):
    ssb.load_board(project)
    layout = builder.ProjectLayout(project)
    session = builder._read_json(layout.session_path)
    session["reference_builder"]["locations_cleared"] = True
    builder._write_json(layout.session_path, session)
    board = ssb.load_board(project)
    assert "location_ref" not in board["scenes"][1]
