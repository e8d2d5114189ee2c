"""Face Fix job engine: geometry/tracking units + end-to-end on a
synthetic clip with an injected detector (the reference's detector is an
external DNN asset; the engine is detector-pluggable by design)."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from vrgdg_tpu.jobs import face_fix as ff


# --------------------------------------------------------------------------
# unit tests: geometry / tracking / strength
# --------------------------------------------------------------------------

def test_distance_repair_strength_presets():
    # full strength below the near edge, zero above the far edge, linear in
    # between (VRGDG_FaceFix.py:160-179)
    assert ff.distance_repair_strength(5.0, "far", 9.0) == 1.0
    assert ff.distance_repair_strength(10.0, "far", 9.0) == 0.0
    assert ff.distance_repair_strength(8.0, "far", 9.0) == pytest.approx(0.5)
    assert ff.distance_repair_strength(50.0, "all", 9.0) == 1.0
    # custom: fade over the 2% below the threshold
    assert ff.distance_repair_strength(11.0, "custom", 12.0) == \
        pytest.approx(0.5)
    assert ff.distance_repair_strength(3.0, "very_far", 9.0) == 1.0
    assert ff.distance_repair_strength(6.5, "very_far", 9.0) == 0.0


def test_smooth_box_alpha():
    prev = (10.0, 10.0, 20.0, 20.0)
    cur = (20.0, 20.0, 40.0, 40.0, 0.9)
    out = ff.smooth_box(prev, cur)
    assert out == pytest.approx((16.5, 16.5, 33.0, 33.0))
    assert ff.smooth_box(None, cur) == (20.0, 20.0, 40.0, 40.0)


def test_select_tracked_prefers_track_continuity():
    prev = (100.0, 100.0, 40.0, 40.0)
    near = (105.0, 102.0, 40.0, 40.0, 0.5)
    far_but_confident = (500.0, 400.0, 40.0, 40.0, 0.99)
    chosen = ff.select_tracked([near, far_but_confident], prev, 640, 480, 4)
    assert chosen == near
    # without a previous box, highest confidence wins
    chosen = ff.select_tracked([near, far_but_confident], None, 640, 480, 4)
    assert chosen == far_but_confident
    # minimum size filter
    tiny = (105.0, 102.0, 3.0, 3.0, 0.9)
    assert ff.select_tracked([tiny], prev, 640, 480, 4) is None


def test_square_crop_box_shifts_in_bounds():
    box = ff.square_crop_box((0.0, 0.0, 50.0, 30.0), 640, 480, 0.1)
    left, top, right, bottom = box
    assert left >= 0 and top >= 0 and right <= 640 and bottom <= 480
    assert (right - left) == (bottom - top)  # square
    # side capped at the frame's short edge, kept square and in-bounds
    box = ff.square_crop_box((0.0, 0.0, 700.0, 700.0), 640, 480, 0.5)
    left, top, right, bottom = box
    assert (right - left) == (bottom - top) == 480
    assert left >= 0 and top >= 0 and right <= 640 and bottom <= 480


def test_safe_ltx_indices():
    # 8n+1 positions are forbidden; nearest free index wins
    assert ff.safe_ltx_indices([0, 1, 9], 32) == [0, 2, 8]
    assert ff.safe_ltx_indices([], 10) == []
    assert ff.safe_ltx_indices([5], 0) == []


def test_face_fix_anchor_indices():
    indices = ff.face_fix_anchor_indices(40, 16)
    assert 0 in indices
    # the forced last frame 39 is legal (39 % 8 == 7)
    assert 39 in indices
    assert all(i % 8 != 1 for i in indices)


def test_initial_regions_tiling():
    assert len(ff.initial_regions(320, 240)) == 1
    regions = ff.initial_regions(640, 480)
    assert len(regions) == 5
    assert regions[0] == (0, 0, 640, 480)
    tw, th = round(640 * 0.6), round(480 * 0.7)
    assert regions[1] == (0, 0, tw, th)


# --------------------------------------------------------------------------
# end-to-end on a synthetic clip
# --------------------------------------------------------------------------

FRAMES = 20
W, H = 320, 240
FACE_W = 16  # 5% of 320 -> inside the "far" full-strength band


def _face_box(i):
    return (40 + 2 * i, 60 + i, FACE_W, FACE_W)


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    folder = tmp_path_factory.mktemp("facefix")
    path = str(folder / "scene.mp4")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10.0,
                             (W, H))
    for i in range(FRAMES):
        frame = np.full((H, W, 3), 40, np.uint8)
        x, y, w, h = _face_box(i)
        frame[y:y + h, x:x + w] = 200  # bright square "face"
        writer.write(frame)
    writer.release()
    return {"path": path, "folder": str(folder)}


def synthetic_detector(frame, region):
    """Find the bright square in the region — a stand-in for cv2.dnn."""
    left, top, right, bottom = region
    patch = frame[top:bottom, left:right]
    mask = patch[..., 0] > 150
    if not mask.any():
        return []
    ys, xs = np.nonzero(mask)
    x0, x1 = xs.min(), xs.max() + 1
    y0, y1 = ys.min(), ys.max() + 1
    return [(left + float(x0), top + float(y0), float(x1 - x0),
             float(y1 - y0), 0.95)]


@pytest.fixture(scope="module")
def prepared(scene):
    return ff.prepare_face_fix({
        "video_path": scene["path"],
        "project_folder": scene["folder"],
        "whole_scene": True,
        "repair_distance": "far",
        "rotation_assist": "off",
        "minimum_face_pixels": 8,
        "anchor_interval": 8,
    }, detector=synthetic_detector)


def test_prepare_manifest(prepared):
    assert prepared["frame_count"] == FRAMES
    assert prepared["face_run_count"] == 1
    assert prepared["skipped_frames"] == 0
    run = prepared["runs"][0]
    assert run["frame_count"] == FRAMES
    assert os.path.isfile(run["crop_video_path"])
    assert all(i % 8 != 1 for i in run["anchor_indices"])
    with open(prepared["manifest_path"], "r", encoding="utf-8") as handle:
        manifest = json.load(handle)
    entries = manifest["entries"]
    assert len(entries) == FRAMES
    for entry in entries:
        assert entry["detected"]
        assert entry["composite_strength"] == 1.0  # 5% face, "far" preset
        assert os.path.isfile(entry["crop_path"])
        crop = cv2.imread(entry["crop_path"])
        assert crop.shape == (512, 512, 3)


def test_estimate_anchors(scene):
    result = ff.estimate_anchors({"video_path": scene["path"],
                                  "whole_scene": True,
                                  "anchor_interval": 8})
    assert result["frame_count"] == FRAMES
    assert result["anchor_count"] >= 2
    assert all(i % 8 != 1 for i in result["anchor_indices"])


def test_accept_anchor_and_ltx_and_finalize(prepared, scene):
    manifest_path = prepared["manifest_path"]
    run = prepared["runs"][0]

    # enhance anchors: brighten the crop so repairs are detectable
    for anchor in run["anchors"]:
        src = cv2.imread(anchor["source_path"])
        enhanced = np.clip(src.astype(np.int32) + 40, 0, 255).astype(np.uint8)
        fake = anchor["source_path"] + ".enh.png"
        cv2.imwrite(fake, enhanced)
        result = ff.accept_enhanced_anchor({
            "manifest_path": manifest_path, "run_index": 0,
            "order": anchor["order"], "image": fake})
        assert result["enhanced_path"] == anchor["enhanced_path"]
    inputs = ff.build_ltx_inputs({"manifest_path": manifest_path,
                                  "run_index": 0})
    assert inputs["frame_count"] == FRAMES
    assert inputs["anchor_count"] == len(run["anchors"])
    assert os.path.isdir(inputs["enhanced_anchors_folder"])

    # fake LTX output: 3 frames short (within the +/-7 tolerance), each a
    # brightened copy of the crop
    with open(manifest_path, "r", encoding="utf-8") as handle:
        manifest = json.load(handle)
    entries = manifest["entries"]
    ltx_dir = os.path.join(prepared["job_folder"], "fake_ltx")
    os.makedirs(ltx_dir, exist_ok=True)
    images = []
    for entry in entries[:FRAMES - 3]:
        crop = cv2.imread(entry["crop_path"])
        bright = np.clip(crop.astype(np.int32) + 50, 0, 255).astype(np.uint8)
        path = os.path.join(ltx_dir, f"ltx_{entry['index']:06d}.png")
        cv2.imwrite(path, bright)
        images.append(path)
    result = ff.accept_ltx_frames({"manifest_path": manifest_path,
                                   "run_index": 0, "images": images})
    assert result["ltx_frame_count"] == FRAMES - 3
    assert result["preserved_tail_frames"] == 3

    final = ff.finalize_face_fix({"manifest_path": manifest_path,
                                  "feather": 6, "color_match": 0.5})
    assert os.path.isfile(final["output_video_path"])
    assert final["frames_repaired"] == FRAMES - 3
    assert final["frames_skipped"] == 3

    # output: same frame count/dims; face regions brightened, background
    # untouched
    capture = cv2.VideoCapture(final["output_video_path"])
    out_frames = []
    while True:
        ok, frame = capture.read()
        if not ok:
            break
        out_frames.append(frame)
    capture.release()
    assert len(out_frames) == FRAMES
    assert out_frames[0].shape == (H, W, 3)
    x, y, w, h = _face_box(0)
    face_mean = out_frames[0][y:y + h, x:x + w].mean()
    assert face_mean > 205, face_mean  # repaired face is brighter than 200
    corner_mean = out_frames[0][:20, -40:].mean()
    assert abs(corner_mean - 40) < 8, corner_mean  # background preserved


def test_accept_ltx_rejects_large_delta(prepared):
    with pytest.raises(ValueError, match="temporal-length"):
        ff.accept_ltx_frames({"manifest_path": prepared["manifest_path"],
                              "run_index": 0, "images": [None] * (FRAMES - 8)})


def test_manifest_path_guard(tmp_path):
    bogus = tmp_path / "manifest.json"
    bogus.write_text("{}")
    with pytest.raises(ValueError, match="not inside a Face Fix job"):
        ff.accept_enhanced_crop({"manifest_path": str(bogus), "index": 0,
                                 "image": str(bogus)})


def test_rotation_assist_maps_back_to_frame_coords():
    """Light rotation assist: detections from rotated scans must map back
    near the upright box and dedup to one candidate
    (VRGDG_FaceFix.py:116-157)."""
    frame = np.full((480, 640, 3), 30, np.uint8)
    frame[200:240, 300:340] = 220  # 40px bright square
    found = ff.detect_with_rotation(synthetic_detector, frame, 0.5,
                                    ff.initial_regions(640, 480), "light")
    assert len(found) == 1  # rotated duplicates deduped at IoU 0.35
    x, y, w, h, score = found[0]
    assert abs(x - 300) < 8 and abs(y - 200) < 8
    assert abs(w - 40) < 16 and abs(h - 16 - 24) < 40  # box inflates a bit
