"""Default (YuNet) face detector integration: load_default_detector ->
detect -> full prepare/finalize job on real pixels.

Gated on the vendored Apache-2.0 YuNet model (``assets/
face_detection_yunet_2023mar.onnx`` — the same asset the reference
ships, ``/root/reference/assets``); every other face-fix test uses
synthetic detector callables, this one exercises the cv2.dnn path.
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from vrgdg_tpu.jobs import face_fix as ff

pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(ff.DEFAULT_ASSETS_DIR,
                                    "face_detection_yunet_2023mar.onnx")),
    reason="YuNet asset not present")


def draw_face(canvas, center, axes=(110, 150)):
    """Crude but YuNet-detectable cartoon face (BGR)."""
    cx, cy = center
    ax, ay = axes
    cv2.ellipse(canvas, (cx, cy), (ax, ay), 0, 0, 360, (140, 170, 205), -1)
    eye_y = cy - int(0.27 * ay)
    dx = int(0.41 * ax)
    for ex in (cx - dx, cx + dx):
        cv2.ellipse(canvas, (ex, eye_y), (int(0.2 * ax), int(0.09 * ay)),
                    0, 0, 360, (255, 255, 255), -1)
        cv2.circle(canvas, (ex, eye_y), max(2, int(0.07 * ax)),
                   (40, 30, 30), -1)
    cv2.ellipse(canvas, (cx, cy + int(0.1 * ay)),
                (max(2, int(0.11 * ax)), int(0.2 * ay)), 0, 0, 360,
                (120, 150, 185), -1)
    cv2.ellipse(canvas, (cx, cy + int(0.47 * ay)),
                (int(0.41 * ax), int(0.12 * ay)), 0, 0, 180,
                (60, 60, 160), 6)
    return canvas


@pytest.fixture(scope="module")
def face_frame():
    frame = np.full((480, 640, 3), 60, np.uint8)
    return draw_face(frame, (320, 240))


def test_default_detector_loads_and_detects(face_frame):
    detector = ff.load_default_detector()
    found = ff.detect_with_rotation(
        detector, face_frame, 0.3,
        ff.initial_regions(640, 480), rotation_assist="off")
    assert found, "YuNet did not detect the synthetic face"
    x, y, w, h, score = max(found, key=lambda d: d[4])
    assert score > 0.3
    # detection overlaps the known face ellipse bounding box
    iou = ff.box_iou((x, y, w, h), (210, 90, 220, 300))
    assert iou > 0.3


def test_default_detector_end_to_end_job(face_frame, tmp_path):
    """prepare -> estimate with the real detector on a synthetic clip."""
    video = str(tmp_path / "face.mp4")
    writer = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 8.0,
                             (640, 480))
    for i in range(12):
        frame = np.full((480, 640, 3), 60, np.uint8)
        draw_face(frame, (320 + 3 * i, 240))  # slow pan
        writer.write(frame)
    writer.release()

    result = ff.prepare_face_fix({
        "video_path": video,
        "project_folder": str(tmp_path / "job"),
        "confidence": 0.3,
        "repair_distance": "all",
        "whole_scene": True,
        "rotation_assist": "off",
    })
    assert result["face_run_count"] >= 1
    assert os.path.isfile(result["manifest_path"])
    import json

    with open(result["manifest_path"]) as fh:
        manifest = json.load(fh)
    entries = [e for e in manifest["entries"] if "face_box" in e]
    assert len(entries) >= 8
    assert all(os.path.isfile(e["crop_path"]) for e in entries)
    # tracked boxes move with the pan (monotonic-ish drift right)
    xs = [e["face_box"][0] for e in entries]
    assert xs[-1] > xs[0]
