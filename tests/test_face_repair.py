"""Far-face repair backend (jobs/face_repair) — oracle fuzz + end-to-end.

The pure parsing/geometry functions are fuzzed against the reference
script's own functions (AST-extracted from
``scripts/far_face_repair_backend.py``); the prepare -> composite ->
contact-sheet -> rebuild loop runs end-to-end on a synthetic clip with a
manual face box so no detector asset is needed.
"""

import json
import os
from dataclasses import dataclass
from typing import Iterable

import numpy as np
import pytest

from vrgdg_tpu.jobs import face_repair as fr

from tests.reference_oracle import load_reference


@pytest.fixture(scope="module")
def oracle():
    ns = load_reference(
        "scripts/far_face_repair_backend.py",
        ["FrameRange", "FaceBox", "parse_ranges", "parse_box",
         "selected_frame_set", "choose_face", "expanded_square_crop"],
        extra_globals={"dataclass": dataclass, "Iterable": Iterable})
    return ns


def test_parse_ranges_parity(oracle):
    rng = np.random.default_rng(11)
    cases = ["120-160,300-318", "5", "9-3", "0-0", " 7 , 9-12 ",
             "1-2\n8-4", ",,3,", "10-10,10-10"]
    for _ in range(40):
        n = int(rng.integers(1, 5))
        parts = []
        for _ in range(n):
            a, b = rng.integers(0, 500, 2)
            parts.append(f"{a}-{b}" if rng.random() < 0.7 else str(a))
        cases.append(",".join(parts))
    for text in cases:
        theirs = [(r.start, r.end) for r in oracle["parse_ranges"](text)]
        assert fr.parse_ranges(text) == theirs, text
    for bad in ["", "  ", ",,,", "a-b", "5-"]:
        with pytest.raises(ValueError):
            oracle["parse_ranges"](bad)
        with pytest.raises(ValueError):
            fr.parse_ranges(bad)


def test_parse_box_parity(oracle):
    cases = ["", "10,20,30,40", "10,20,5,8", "100x50x40x30",
             " 1 , 2 , 3 , 4 ", "0,0,1,1", "12.7,3.2,50.9,60.1"]
    for text in cases:
        assert fr.parse_box(text) == oracle["parse_box"](text), text
    for bad in ["1,2,3", "1,2,3,4,5", ","]:
        with pytest.raises(ValueError):
            oracle["parse_box"](bad)
        with pytest.raises(ValueError):
            fr.parse_box(bad)


def test_frames_in_ranges_parity(oracle):
    rng = np.random.default_rng(3)
    for _ in range(25):
        pairs = [tuple(sorted(rng.integers(0, 80, 2)))
                 for _ in range(int(rng.integers(1, 5)))]
        ref_ranges = [oracle["FrameRange"](a, b) for a, b in pairs]
        assert fr.frames_in_ranges(pairs) == \
            oracle["selected_frame_set"](ref_ranges)


def test_pick_face_and_crop_parity(oracle):
    rng = np.random.default_rng(7)
    for _ in range(120):
        width = int(rng.integers(64, 1920))
        height = int(rng.integers(64, 1080))
        count = int(rng.integers(0, 5))
        faces = []
        for _ in range(count):
            x = int(rng.integers(0, max(1, width - 8)))
            y = int(rng.integers(0, max(1, height - 8)))
            w = int(rng.integers(4, max(5, width - x)))
            h = int(rng.integers(4, max(5, height - y)))
            faces.append((x, y, w, h, float(rng.random())))
        ref_faces = [oracle["FaceBox"](*f) for f in faces]
        for mode in ("largest", "center"):
            mine = fr.pick_face(faces, width, height, mode)
            theirs = oracle["choose_face"](ref_faces, width, height, mode)
            if theirs is None:
                assert mine is None
                continue
            assert mine[:4] == (theirs.x, theirs.y, theirs.w, theirs.h)
            padding = float(rng.uniform(1.0, 4.0))
            assert fr.expanded_crop_box(mine, width, height, padding) == \
                oracle["expanded_square_crop"](theirs, width, height,
                                               padding)


def _write_clip(path, frames=12, size=(120, 160)):
    import cv2
    h, w = size
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"),
                             10.0, (w, h))
    rng = np.random.default_rng(0)
    for i in range(frames):
        frame = np.full((h, w, 3), 40 + i, np.uint8)
        frame[30:70, 50:90] = (90, 150, 200)          # the "face"
        frame += rng.integers(0, 5, frame.shape, dtype=np.uint8)
        writer.write(frame)
    writer.release()


def test_end_to_end_manual_box(tmp_path):
    import cv2
    clip = str(tmp_path / "clip.mp4")
    _write_clip(clip)
    out = str(tmp_path / "repair")

    result = fr.prepare(clip, "2-4,7", out, manual_box="50,30,40,40",
                        padding=1.5, feather=6)
    manifest = json.load(open(result["manifest_path"]))
    assert [e["frame"] for e in manifest["entries"]] == [2, 3, 4, 7]
    assert manifest["missed_frames"] == []
    for key in ("video", "fps", "total_frames", "width", "height",
                "ranges", "detector", "manual_box", "padding", "feather"):
        assert key in manifest
    entry = manifest["entries"][0]
    left, top, right, bottom = entry["crop_box"]
    assert right - left == bottom - top            # square crop
    assert os.path.isfile(entry["crop"]) and os.path.isfile(entry["mask"])

    # "repair": tint every crop strongly toward red
    repaired_dir = tmp_path / "repaired"
    repaired_dir.mkdir()
    for e in manifest["entries"]:
        crop = cv2.imread(e["crop"], cv2.IMREAD_COLOR)
        crop[..., 2] = 255
        cv2.imwrite(str(repaired_dir / e["repaired_name"]), crop)

    comp = fr.composite(result["manifest_path"],
                        repaired_dir=str(repaired_dir), feather=6)
    assert comp["written"] == 4 and comp["skipped"] == []
    frame_path = os.path.join(comp["out_dir"], "frame_000002.png")
    composited = cv2.imread(frame_path, cv2.IMREAD_COLOR)
    original = cv2.imread(entry["original_frame"], cv2.IMREAD_COLOR)
    cx, cy = (left + right) // 2, (top + bottom) // 2
    # mask center strongly changed, far corner untouched
    raw_delta = abs(int(composited[cy, cx, 2]) - int(original[cy, cx, 2]))
    assert raw_delta > 20
    np.testing.assert_array_equal(composited[0, -1], original[0, -1])

    # color match pulls the uniform tint back toward the original
    matched = fr.composite(result["manifest_path"],
                           repaired_dir=str(repaired_dir),
                           out_dir=str(tmp_path / "matched"), feather=6,
                           color_match=True)
    matched_frame = cv2.imread(
        os.path.join(matched["out_dir"], "frame_000002.png"),
        cv2.IMREAD_COLOR)
    matched_delta = abs(int(matched_frame[cy, cx, 2])
                        - int(original[cy, cx, 2]))
    assert matched_delta < raw_delta

    sheet = fr.contact_sheet(result["manifest_path"], columns=2)
    assert os.path.isfile(sheet["sheet_path"]) and sheet["pairs"] == 4

    video_out = str(tmp_path / "preview.mp4")
    rebuilt = fr.rebuild_video(result["manifest_path"], video_out)
    assert rebuilt["replaced"] == 4 and rebuilt["written"] == 12
    cap = cv2.VideoCapture(video_out)
    count = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    assert count == 12

    only = fr.rebuild_video(result["manifest_path"],
                            str(tmp_path / "ranges.mp4"), only_ranges=True)
    assert only["written"] == 4 and only["replaced"] == 4


def test_composite_skips_missing_crops(tmp_path):
    clip = str(tmp_path / "clip.mp4")
    _write_clip(clip, frames=6)
    result = fr.prepare(clip, "1-2", str(tmp_path / "r"),
                        manual_box="50,30,40,40")
    comp = fr.composite(result["manifest_path"],
                        repaired_dir=str(tmp_path / "empty"))
    assert comp["written"] == 0 and len(comp["skipped"]) == 2


def test_detector_selection():
    """'opencv' either runs the cascade or degrades with a clear
    RuntimeError (OpenCV 5 headless drops CascadeClassifier); unknown
    names are rejected."""
    import cv2
    frame = np.full((80, 80, 3), 128, np.uint8)
    if getattr(cv2, "CascadeClassifier", None) is not None:
        assert fr.detect_repair_faces(frame, "opencv", 0.35) == []
    else:
        with pytest.raises(RuntimeError, match="CascadeClassifier"):
            fr.detect_repair_faces(frame, "opencv", 0.35)
    with pytest.raises(ValueError):
        fr.detect_repair_faces(frame, "mediapipe", 0.35)
